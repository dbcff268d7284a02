package graft.operators

import graft.SparkSpec

/** q_markov: planted event paths with hand-computed transition counts —
  * session-gap resets, `_start` pseudo-state, tie-safe ordering — plus
  * the Σn = |events| conservation property and the single-user-shuffle
  * plan shape.
  */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000000L // one minute in nanos

  private def write(dir: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")

  test("markov: gap resets to _start, transitions counted per (src,dst)") {
    val rows = Seq(
      // user 1: view→click→purchase inside one session, then a 31-min
      // gap opens a NEW session whose first event restarts at _start
      (101L, 1 * M, 1L, "view", 0.0, "{}"),
      (102L, 2 * M, 1L, "click", 0.0, "{}"),
      (103L, 3 * M, 1L, "purchase", 0.0, "{}"),
      (104L, 34 * M, 1L, "view", 0.0, "{}"),
      (105L, 35 * M, 1L, "click", 0.0, "{}"),
      // user 2: two events at the SAME ts — event_id breaks the tie,
      // so 201 precedes 202 deterministically
      (201L, 1 * M, 2L, "view", 0.0, "{}"),
      (202L, 1 * M, 2L, "view", 0.0, "{}"),
      // user 3: single event — one _start transition, nothing else
      (301L, 1 * M, 3L, "purchase", 0.0, "{}")
    )
    val dir = tmpDir("markov_fixture")
    write(dir, rows)
    val out = Extended.qMarkov(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("_start", "view") -> 3L,      // u1 session 1+2, u2 first view
      ("_start", "purchase") -> 1L,  // u3
      ("view", "click") -> 2L,       // u1 both sessions
      ("click", "purchase") -> 1L,   // u1 session 1
      ("view", "view") -> 1L))       // u2 tie pair
    // conservation: every event is the dst of exactly one transition
    assert(out.values.sum === rows.size.toLong)
  }

  test("markov: exactly a 30-minute gap does NOT reset (boundary is strict >)") {
    val rows = Seq(
      (101L, 0 * M, 1L, "view", 0.0, "{}"),
      (102L, 30 * M, 1L, "click", 0.0, "{}")
    )
    val dir = tmpDir("markov_fixture")
    write(dir, rows)
    val out = Extended.qMarkov(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("_start", "view") -> 1L, ("view", "click") -> 1L))
  }

  test("markov: both lags share a single user_id shuffle") {
    val dir = tmpDir("markov_fixture")
    val plan = Extended.qMarkov(spark, dir).queryExecution.executedPlan.toString
    val userExchanges = plan.linesIterator
      .count(_.trim.matches(""".*Exchange hashpartitioning\(user_id.*"""))
    assert(userExchanges == 1,
      s"lag(type) and lag(ts) must share one user_id window shuffle, got $userExchanges:\n$plan")
  }
}
