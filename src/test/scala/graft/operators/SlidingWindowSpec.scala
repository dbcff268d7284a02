package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** q_sliding_window: the hopping-window expansion invariants that the
  * row-hash oracle can't state directly — every event is covered by
  * exactly dur/slide windows, so the sliding rollup is a constant
  * multiple of the direct aggregate.
  */
class SlidingWindowSpec extends SparkSpec {

  test("each event is covered by exactly dur/slide = 4 sliding windows") {
    val res = Relational.qSlidingWindow(spark, sf0)
    val ev = GraftSession.table(spark, sf0, "events")
    val nEvents = ev.count()
    assert(res.agg(sum(col("n"))).head().getLong(0) === 4 * nEvents)
    val cents = res.agg(sum(col("value_cents"))).head().getLong(0)
    val direct = ev.agg(sum(round(col("value") * 100)).cast("long"))
      .head().getLong(0)
    assert(cents === 4 * direct)
  }

  test("window starts are slide-aligned and dur-cover their events") {
    val res = Relational.qSlidingWindow(spark, sf0)
    val misaligned = res
      .withColumn("sec", unix_timestamp(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .filter(col("sec") % 900 =!= 0)
    assert(misaligned.count() === 0)
  }

  test("histogram: conserves rows, buckets in range, widths uniform") {
    val out = Relational.qHistogram(spark, sf0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nEvents = GraftSession.table(spark, sf0, "events").count()
    assert(out.map(_._5).sum === nEvents, "every event lands in exactly one bucket")
    assert(out.forall(b => b._2 >= 0 && b._2 < Relational.HistBuckets))
    val widths = out.map(b => b._4 - b._3 + 1).distinct
    assert(widths.length === 1, s"equi-width buckets, got widths $widths")
  }
}
