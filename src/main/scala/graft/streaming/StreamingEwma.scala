package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Typed event row for the streaming EWMA (TimestampType µs;
  * event_id breaks same-timestamp ties exactly like the batch
  * entry's window ORDER BY).
  */
final case class EwmaEvent(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, value: Double)

/** Emitted row — the streaming form of one q_ewma output row (the
  * batch entry formats last_ts as a string for the oracle; the
  * stream keeps the timestamp).
  */
final case class EwmaRow(user_id: Long, n_events: Long,
    last_ts: java.sql.Timestamp, ewma_cents: Long, avg_cents: Long,
    trending: Int)

private final case class EwmaState(n_events: Long, sum_cents: Long,
    last_ts: java.sql.Timestamp, last_event_id: Long,
    window: Seq[Long])

/** q_ewma's streaming twin (SURVEY.md §2.7): the per-user decayed
  * trend maintained INCREMENTALLY — the live form of the batch
  * entry's "latest ewma vs lifetime average". The decay-1/2,
  * 8-event bounded window is exactly what makes this streamable:
  * per-user state is eight cents values plus three counters (a few
  * dozen bytes), not the event history an unbounded decay would
  * need for exact replay.
  *
  * Same state contract as StatefulStats: event-time timeout evicts
  * users idle past the horizon (state is O(users active within one
  * horizon), never O(users ever seen)); events inside a trigger are
  * sorted by the tie-safe (ts, event_id) key before folding; the
  * batch form runs the identical fold with timers disabled, which
  * is how the spec pins batch ≡ stream ≡ the oracled q_ewma entry.
  */
object StreamingEwma {

  /** Frame bound shared with the batch entry: 8 events, weights
    * 2^(7-d) by distance d from the newest.
    */
  val WindowLen = 8

  val DefaultHorizonDays = 30

  /** EWMA of an oldest→newest window of ≤8 cents values — the same
    * num-div-den integer arithmetic as the batch entry's lag fold.
    */
  def ewmaOf(window: Seq[Long]): Long = {
    val k = window.length
    require(k >= 1 && k <= WindowLen, s"window of $k")
    var num = 0L
    var den = 0L
    var d = 0
    while (d < k) {
      val w = 1L << (7 - d)
      num += window(k - 1 - d) * w
      den += w
      d += 1
    }
    num / den
  }

  def runningEwma(events: Dataset[EwmaEvent],
      horizonDays: Int = DefaultHorizonDays): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val horizonMs = horizonDays * 86400000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            row(uid, s)
          } else {
            // in-trigger order is undefined; cross-trigger order is
            // the stream's time order (StatefulStats' premise)
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            val prev = state.getOption
            var n = prev.map(_.n_events).getOrElse(0L)
            var sum = prev.map(_.sum_cents).getOrElse(0L)
            var win = prev.map(_.window).getOrElse(Seq.empty[Long])
            var last = prev.map(_.last_ts).orNull
            var lastId = prev.map(_.last_event_id).getOrElse(0L)
            evs.foreach { e =>
              val cents = BigDecimal(e.value * 100)
                .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
              n += 1
              sum += cents
              win = (win :+ cents).takeRight(WindowLen)
              last = e.ts
              lastId = e.event_id
            }
            val s = EwmaState(n, sum, last, lastId, win)
            state.update(s)
            if (streaming)
              state.setTimeoutTimestamp(
                math.max(last.getTime + horizonMs, state.getCurrentWatermarkMs + 1))
            row(uid, s)
          }
      }
  }

  private def row(uid: Long, s: EwmaState): EwmaRow = {
    val ewma = ewmaOf(s.window)
    val avg = s.sum_cents / s.n_events
    EwmaRow(uid, s.n_events, s.last_ts, ewma, avg,
      if (ewma > avg) 1 else 0)
  }

  /** Streaming form needs an update-mode sink. */
  val outputMode: OutputMode = OutputMode.Update()
}
