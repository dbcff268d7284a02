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
  * streaming state is O(users seen inside the horizon), not
  * O(events) (and not O(open sessions) like session_window).
  *
  * State is BOUNDED by an event-time timeout: each update arms a
  * timer at (max event ts seen) + `horizonHours`; when the watermark
  * passes it, the user's state is evicted (the final row is emitted
  * once more — an idempotent upsert under the update-mode sink). A
  * funnel whose deadlines have all lapsed can never change again
  * (stages only take the EARLIEST valid timestamp, and an in-order
  * feed delivers only later ones), so eviction is semantics-free for
  * any user whose events span less than the horizon; a user
  * reappearing after eviction starts a fresh funnel measurement —
  * the documented horizon contract, in exchange for state that is
  * O(users active inside one horizon) instead of O(users ever seen).
  * Streaming callers must set `withWatermark` on `ts` (Spark rejects
  * an event-time timeout without one — loud, not silent); the batch
  * form runs the identical fold with timers disabled (a batch group
  * sees its whole history at once — nothing to evict).
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

  /** Eviction horizon: 48 h = the 2×24 h deadline span after a user's
    * last event, past which no in-order event can alter their funnel.
    */
  val DefaultHorizonHours = 48

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  def progress(events: Dataset[FunnelEvent],
      horizonHours: Int = DefaultHorizonHours): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    // captured OUTSIDE the closure: the fold must not touch the
    // Dataset inside an executor, and batch mode must never arm
    // timers (no watermark exists to fire them)
    val streaming = events.isStreaming
    val horizonMs = horizonHours * 3600000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](
          GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            // horizon passed: emit the final row once more (update-
            // mode upsert, idempotent) and free the state
            val out = state.get
            state.remove()
            out
          } else {
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
            if (streaming) {
              // arm (or push back) the eviction timer; clamp above the
              // current watermark — a group fed only late data would
              // otherwise compute a timer the store must reject
              val maxTs = evs.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(maxTs + horizonMs, state.getCurrentWatermarkMs + 1))
            }
            out
          }
      }
  }

  /** Streaming form: update-mode sink required (one updated row per
    * key per trigger).
    */
  val outputMode: OutputMode = OutputMode.Update()
}
