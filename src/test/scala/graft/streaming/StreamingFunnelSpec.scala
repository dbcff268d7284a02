package graft.streaming

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** StreamingFunnel: the keyed-state fold converges to q_funnel's
  * batch window semantics — per-user stage timestamps equal across
  * both forms, including when the stream is split across triggers
  * (state carries), plus a planted sequence exercising deadlines.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  // batch reference: q_funnel's staged per-user (t1, t2, t3) — the
  // same layered running-min windows the entry aggregates into counts
  private def batchStages = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val day = expr("INTERVAL 24 HOURS")
    GraftSession.table(spark, sf0, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1") && col("ts") <= col("t1") + day, col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2") && col("ts") <= col("t2") + day, col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
  }

  test("streaming funnel converges to the batch window form across triggers") {
    // stage the events parquet as TWO time-ordered files so the file
    // source runs (at least) two triggers and state must carry over
    val dir = tmpDir(s"funnel_stream_${System.nanoTime()}")
    // normalized ts (TimestampType); split on the median microsecond
    val ev = GraftSession.table(spark, sf0, "events")
    val cut = ev.agg(expr("percentile(unix_micros(ts), 0.5D)")).head().getDouble(0)
    ev.filter(unix_micros(col("ts")) <= cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/f0")
    ev.filter(unix_micros(col("ts")) > cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/f1")
    val staged = new java.io.File(dir)
    Seq("f0", "f1").zipWithIndex.foreach { case (f, i) =>
      val part = new java.io.File(staged, f).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(dir, s"part$i.parquet")
      java.nio.file.Files.copy(part.toPath, dest)
      // the file source orders by mtime: pin it so the early-time file
      // is trigger 1 (coarse-mtime filesystems would otherwise race)
      dest.toFile.setLastModified(System.currentTimeMillis() - 60000L * (2 - i))
    }
    val schema = spark.read.parquet(s"$dir/part0.parquet").schema
    // watermark: required by the event-time eviction timer; the huge
    // delay keeps it below every armed timer so THIS test exercises
    // pure fold equivalence (eviction has its own planted spec)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/part*.parquet")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withWatermark("ts", "3650 days")
      .as[FunnelEvent]
    val q = StreamingFunnel.progress(stream)
      .writeStream.outputMode(StreamingFunnel.outputMode)
      .format("memory").queryName("funnel").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = most-complete progress (stages only fill)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val got = spark.table("funnel")
      .withColumn("self", (when(col("t1").isNotNull, 100).otherwise(0)) +
        (when(col("t2").isNotNull, 10).otherwise(0)) +
        (when(col("t3").isNotNull, 1).otherwise(0)))
      .withColumn("best", max(col("self")).over(w))
      .filter(col("self") === col("best"))
      .select("user_id", "t1", "t2", "t3").distinct()
    val want = batchStages
    assert(got.count() === want.count(), "one final row per user")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0,
      "streaming per-user stage timestamps must equal the batch window form")
  }

  test("state evicts past the horizon: a reappearing user starts a fresh funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // hour 1, not 0: an epoch-0 event is not later than the INITIAL
    // watermark (0) and the late-data filter would drop it
    def t(h: Long) = new java.sql.Timestamp((h + 1) * 3600000L)
    val mem = MemoryStream[FunnelEvent]
    val stream = mem.toDS().withWatermark("ts", "0 seconds")
    val q = StreamingFunnel.progress(stream, horizonHours = 48)
      .writeStream.outputMode(StreamingFunnel.outputMode)
      .format("memory").queryName("funnel_evict").start()
    try {
      // trigger 1: user 1 anchors t1 at hour 0
      mem.addData(FunnelEvent(1L, "view", t(0), 1L))
      q.processAllAvailable()
      // trigger 2 advances the watermark to hour 1000, far past user
      // 1's hour-48 timer; trigger 3 lets the timeout fire (timers
      // fire in the batch AFTER the watermark moves past them)
      mem.addData(FunnelEvent(2L, "view", t(1000), 2L))
      q.processAllAvailable()
      mem.addData(FunnelEvent(2L, "click", t(1001), 3L))
      q.processAllAvailable()
      // user 1 reappears: state was evicted, so this view RE-ANCHORS
      // t1 (earliest-wins state would have kept hour 0)
      mem.addData(FunnelEvent(1L, "view", t(2000), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_evict").filter(col("user_id") === 1L)
      .select(col("t1")).collect().map(_.getTimestamp(0)).toSeq
    assert(rows.contains(t(0)), "pre-eviction row carries the original anchor")
    assert(rows.contains(t(2000)),
      "post-eviction row must re-anchor — state really was removed")
    // in-horizon user 2 is untouched by user 1's eviction: the click
    // within the deadline still converts on carried state
    val u2 = spark.table("funnel_evict").filter(col("user_id") === 2L)
      .filter(col("t2").isNotNull).select(col("t1"), col("t2")).distinct().collect()
    assert(u2.length === 1 && u2.head.getTimestamp(0) === t(1000) &&
      u2.head.getTimestamp(1) === t(1001),
      "in-horizon cross-trigger state must still carry")
  }

  test("planted sequence: deadlines and min-anchoring behave") {
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val evs = Seq(
      // user 1: clean view -> click -> purchase inside deadlines
      FunnelEvent(1L, "view", t(0), 1L),
      FunnelEvent(1L, "click", t(10), 2L),
      FunnelEvent(1L, "purchase", t(20), 3L),
      // user 2: click arrives 25 h after the view — dead
      FunnelEvent(2L, "view", t(0), 4L),
      FunnelEvent(2L, "click", t(25 * 60), 5L),
      // user 3: purchase before any click — not counted
      FunnelEvent(3L, "view", t(0), 6L),
      FunnelEvent(3L, "purchase", t(5), 7L)).toDS()
    val out = StreamingFunnel.progress(evs)
      .collect().map(p => p.user_id -> p).toMap
    assert(out(1L).t3.contains(t(20)))
    assert(out(2L).t2.isEmpty, "expired click must not convert")
    assert(out(3L).t2.isEmpty && out(3L).t3.isEmpty)
  }
}
