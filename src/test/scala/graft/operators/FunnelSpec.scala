package graft.operators

import graft.SparkSpec

/** q_funnel: planted event sequences with a hand-computed funnel
  * outcome — window anchoring, the 24 h step deadline, and
  * pre-anchor events that must not count.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  test("funnel: min-anchored steps, 24h deadlines, pre-view clicks ignored") {
    // ts is written as nanos longs, exactly like the driver's events
    // table arrives under nanosAsLong
    val rows = Seq(
      // user 1: full chain but purchase 25h after the click → step 3 missed
      (101L, 1 * H, 1L, "view", 0.0, "{}"),
      (102L, 2 * H, 1L, "click", 0.0, "{}"),
      (103L, 27 * H, 1L, "purchase", 0.0, "{}"),
      // user 2: click 30h after the FIRST view (a later view at 10h
      // does NOT re-anchor) → step 2 missed
      (201L, 1 * H, 2L, "view", 0.0, "{}"),
      (202L, 10 * H, 2L, "view", 0.0, "{}"),
      (203L, 31 * H, 2L, "click", 0.0, "{}"),
      // user 3: a click BEFORE any view (must not count), then the
      // full chain inside the deadlines
      (301L, 1 * H, 3L, "click", 0.0, "{}"),
      (302L, 2 * H, 3L, "view", 0.0, "{}"),
      (303L, 3 * H, 3L, "click", 0.0, "{}"),
      (304L, 4 * H, 3L, "purchase", 0.0, "{}"),
      // user 4: never views → in no step
      (401L, 1 * H, 4L, "click", 0.0, "{}")
    )
    val dir = tmpDir("funnel_fixture")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = Extended.qFunnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("funnel: one exchange — the three windows share a single user shuffle") {
    val dir = tmpDir("funnel_fixture")
    val plan = Extended.qFunnel(spark, dir).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange hashpartitioning(user_id"))
    assert(exchanges == 1,
      s"layered running-min windows must reuse one user_id shuffle, got $exchanges:\n$plan")
  }
}
