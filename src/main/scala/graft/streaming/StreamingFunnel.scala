package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Typed event row for the funnel (TimestampType µs). */
final case class FunnelEvent(user_id: Long, event_type: String,
    ts: java.sql.Timestamp, event_id: Long)

/** Per-user funnel progress: earliest valid stage timestamps (view →
  * click → purchase with 24 h step deadlines), null until reached.
  */
final case class FunnelProgress(user_id: Long, t1: Option[java.sql.Timestamp],
    t2: Option[java.sql.Timestamp], t3: Option[java.sql.Timestamp])

/** Streaming form of q_funnel (SURVEY.md §2.2) — conversion tracking
  * at the stream front door instead of a nightly batch recompute.
  *
  * q_funnel's batch semantics are three layered RUNNING MINIMUMS over
  * each user's (ts, event_id)-ordered history: t1 = min view ts so
  * far, t2 = min click ts that was within (t1, t1+24h] using the t1
  * known AT that click's row, t3 likewise over t2. Because each
  * stage's validity is evaluated against the state as of the event's
  * position, the whole window computation folds into THREE TIMESTAMPS
  * of per-user state — `mapGroupsWithState` carries exactly that, so
  * streaming state is O(active users), not O(events) (and not
  * O(open sessions) like session_window).
  *
  * Events inside one trigger are sorted by (ts, event_id) before
  * folding (the StatefulStats rule); cross-trigger order is the
  * stream's arrival order, so the batch≡stream equivalence
  * (StreamingFunnelSpec) holds for in-event-time-order feeds — a
  * late-arriving view that would retroactively re-anchor t1 is a
  * REPLAY problem in any engine and belongs to the batch recompute
  * path, which shares the fold (same code, batch Dataset).
  */
object StreamingFunnel {

  private val dayUs = 86400000000L

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  def progress(events: Dataset[FunnelEvent]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
          var (t1, t2, t3) = state.getOption
            .map(p => (p.t1, p.t2, p.t3)).getOrElse((None, None, None))
          evs.foreach { e =>
            val u = micros(e.ts)
            e.event_type match {
              case "view" if t1.forall(micros(_) > u) => t1 = Some(e.ts)
              case "click" if t1.exists(v => u > micros(v) && u <= micros(v) + dayUs) &&
                  t2.forall(micros(_) > u) => t2 = Some(e.ts)
              case "purchase" if t2.exists(c => u > micros(c) && u <= micros(c) + dayUs) &&
                  t3.forall(micros(_) > u) => t3 = Some(e.ts)
              case _ => ()
            }
          }
          val out = FunnelProgress(uid, t1, t2, t3)
          state.update(out)
          out
      }
  }

  /** Streaming form: update-mode sink required (one updated row per
    * key per trigger).
    */
  val outputMode: OutputMode = OutputMode.Update()
}
