package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Typed event row for the stateful operators (TimestampType µs). */
final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Per-user running state: event count, exact cents total, last event
  * time, and gap-based session count (30 min timeout, same semantics
  * as EventStreams.sessionize).
  */
final case class UserStats(user_id: Long, n_events: Long, value_cents: Long,
    last_ts: java.sql.Timestamp, n_sessions: Long)

/** Custom keyed state via `mapGroupsWithState` (SURVEY.md §2.7) — the
  * escape hatch for stream logic the built-in operators can't express
  * (here: a running session COUNTER that never stores per-session
  * state, where session_window materializes every open session).
  *
  * State is one tiny UserStats per key — O(active users), independent
  * of stream length. The same function runs in batch (each group seen
  * once, no prior state), which is how the DuckDB oracle checks it.
  */
object StatefulStats {

  private val gapMs = 30L * 60 * 1000

  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          // events inside one trigger arrive unordered; sort before
          // folding (cross-trigger order is the stream's time order)
          val evs = it.toArray.sortBy(_.ts.getTime)
          val prev = state.getOption
          var n = prev.map(_.n_events).getOrElse(0L)
          var cents = prev.map(_.value_cents).getOrElse(0L)
          var last = prev.map(_.last_ts).orNull
          var sessions = prev.map(_.n_sessions).getOrElse(0L)
          evs.foreach { e =>
            if (last == null || e.ts.getTime - last.getTime >= gapMs) sessions += 1
            n += 1
            // HALF_UP = away-from-zero at exact halves — the semantics
            // of round() in both the DuckDB oracle and Spark's round()
            // (java Math.round rounds half toward +inf, which diverges
            // on negative values landing exactly on a half-cent)
            cents += BigDecimal(e.value * 100)
              .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
            last = e.ts
          }
          val out = UserStats(uid, n, cents, last, sessions)
          state.update(out)
          out
      }
  }

  /** Streaming form: update-mode sink required (one updated row per
    * key per trigger).
    */
  val outputMode: OutputMode = OutputMode.Update()
}
