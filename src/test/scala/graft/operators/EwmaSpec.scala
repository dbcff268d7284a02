package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  // ts written as nanos longs, exactly like the driver's events table
  // arrives under nanosAsLong (FunnelSpec's recipe); hours offset from
  // 2024-01-01 00:00:00 UTC
  private val Base = 1704067200L * 1000000000L
  private val H = 3600L * 1000000000L

  private def eventsOf(rows: Seq[(Long, Long, Long, Double)]) =
    rows.map { case (eid, hours, uid, v) =>
      (eid, Base + hours * H, uid, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def runOn(df: org.apache.spark.sql.DataFrame) = {
    val dir = tmpDir("ewma_fixture")
    df.write.mode("overwrite").parquet(dir + "/events.parquet")
    Extended.qEwma(spark, dir)
      .as[(Long, Long, String, Long, Long, Int)].collect().toSeq
  }

  test("planted series: hand-computed decay weights, average, trending flag") {
    // user 1: cents 100, 200, 400 in time order. Latest frame (k=3):
    // num = 128·400 + 64·200 + 32·100 = 67200; den = 128+64+32 = 224
    // ewma = 300; avg = 700 div 3 = 233; rising series ⇒ trending
    // user 2: the mirror-image falling series ⇒ not trending
    val out = runOn(eventsOf(Seq(
      (1L, 10L, 1L, 1.00),
      (2L, 11L, 1L, 2.00),
      (3L, 12L, 1L, 4.00),
      (4L, 10L, 2L, 4.00),
      (5L, 11L, 2L, 2.00),
      (6L, 12L, 2L, 1.00))))
    assert(out === Seq(
      (1L, 3L, "2024-01-01 12:00:00", 300L, 233L, 1),
      (2L, 3L, "2024-01-01 12:00:00", 171L, 233L, 0)))
  }

  test("constant series: ewma equals the value exactly, even past the frame bound") {
    // 12 identical events (> the 8-event frame): every weighting of a
    // constant is that constant — and the 9th+ events exercise the
    // frame truncation path
    val rows = (1 to 12).map(i => (i.toLong, (9 + i).toLong, 7L, 2.50))
    val out = runOn(eventsOf(rows))
    assert(out === Seq((7L, 12L, "2024-01-01 21:00:00", 250L, 250L, 0)))
  }

  test("tie-safe ordering: same-timestamp events order by event_id") {
    // two events at the identical timestamp: event_id decides which
    // is "latest", deterministically in both engines
    val out = runOn(eventsOf(Seq(
      (10L, 10L, 3L, 1.00),
      (11L, 10L, 3L, 3.00))))
    // latest = event_id 11: num = 128·300 + 64·100 = 44800, den = 192
    assert(out === Seq((3L, 2L, "2024-01-01 10:00:00", 233L, 200L, 1)))
  }

  test("plan: one hash exchange — lags, frame and rollup share the user partitioning") {
    val plan = Extended.qEwma(spark, sf0).queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("entry on the test corpus: one row per user, flags consistent") {
    val out = Extended.qEwma(spark, sf0)
      .as[(Long, Long, String, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length === out.length)
    out.foreach { case (u, n, _, ewma, avg, tr) =>
      assert(n >= 1 && ewma >= 0 && avg >= 0)
      assert(tr === (if (ewma > avg) 1 else 0), s"user $u flag inconsistent")
    }
  }
}
