package graft.streaming

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming semantics driven synchronously: the events parquet is
  * replayed through readStream into a memory sink, and results are
  * compared with the same operator applied in batch mode.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def batchEvents: DataFrame = GraftSession.table(spark, sf0, "events")

  // the file stream source wants a directory — stage the events table
  // into a fresh per-test dir with ts already normalized to
  // TimestampType (so the streamed schema is canonical regardless of
  // the fixture's physical form; tests may append flush files, so
  // staging is never shared)
  private def stageStream(name: String): String = {
    val dir = tmpDir(s"events_stream_$name")
    batchEvents.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents(streamDir: String): DataFrame = {
    // streaming source needs an explicit schema; staging already
    // normalized ts, so the batch schema is reused as-is
    val schema = spark.read.parquet(streamDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }

  /** Append-mode window aggs only emit windows the watermark has
    * closed, so after draining the real data we feed one sentinel
    * event far in the future; every real window finalizes and is
    * emitted. Callers filter out the sentinel (event_id/user_id -1).
    */
  private def runWithFlush(df: DataFrame, name: String, streamDir: String): DataFrame = {
    val q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val maxTs = spark.read.parquet(streamDir).agg(max("ts")).head().getTimestamp(0)
      val flushTs = new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
      Seq((-1L, flushTs, -1L, "flush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(streamDir)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  test("streaming windowed agg matches batch computation") {
    val dir = stageStream("win")
    val streamed = runWithFlush(
      EventStreams.windowedAgg(streamEvents(dir)), "win_agg", dir)
      .filter($"event_type" =!= "flush")
    val batch = EventStreams.windowedAgg(batchEvents)
    val s = streamed.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long, Long)].collect()
    val b = batch.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long, Long)].collect()
    assert(s.nonEmpty)
    assert(s.toSeq === b.toSeq)
  }

  test("streaming sliding-window agg matches batch computation") {
    val dir = stageStream("slide")
    val streamed = runWithFlush(
      EventStreams.windowedAgg(streamEvents(dir), slide = Some("15 minutes")),
      "slide_agg", dir)
      .filter($"event_type" =!= "flush")
    val batch = EventStreams.windowedAgg(batchEvents, slide = Some("15 minutes"))
    val s = streamed.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long, Long)].collect()
    val b = batch.orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long, Long)].collect()
    assert(s.nonEmpty)
    assert(s.toSeq === b.toSeq)
    // hopping expansion: 4x the event mass of the tumbling rollup
    val evN = batchEvents.count()
    assert(b.map(_._3).sum === 4 * evN)
  }

  test("streaming dedup drops replayed event ids") {
    val dir = stageStream("dedup")
    val ev = streamEvents(dir)
    val doubled = ev.union(ev) // replay everything twice
    val deduped = runToMemory(
      EventStreams.dedupEvents(doubled), "dedup", "append")
    assert(deduped.count() === batchEvents.count())
    assert(deduped.groupBy("event_id").count().filter($"count" > 1).count() === 0)
  }

  test("stream-stream interval join matches the batch range join") {
    import org.apache.spark.sql.functions.col
    val dir = stageStream("ssjoin")
    def split(df: DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts")))
    val (sp, sc) = split(streamEvents(dir))
    val streamed = runToMemory(
      EventStreams.clicksBeforePurchases(sp, sc), "ssjoin", "append")
    val (bp, bc) = split(batchEvents)
    val batchPairs = graft.operators.RangeJoin.trailingWindowJoin(
      bp, bc.withColumnRenamed("c_user_id", "user_id"), "user_id",
      "p_ts", "c_ts", windowSec = 1800L)
    assert(streamed.count() > 0)
    assert(streamed.count() === batchPairs.count())
    // content, not just cardinality: the (event_id, c_ts) pair sets
    // must match in both directions (a join pairing the wrong clicks
    // with the right counts would otherwise pass)
    val sPairs = streamed.select(col("event_id"), col("c_ts"))
    val bPairs = batchPairs.select(col("event_id"), col("c_ts"))
    assert(sPairs.except(bPairs).count() === 0)
    assert(bPairs.except(sPairs).count() === 0)
  }

  test("stateful running user stats: streaming updates converge to batch fold") {
    import org.apache.spark.sql.functions.{col, max, round, sum, count, lit}
    val dir = stageStream("stateful")
    // huge watermark delay: the eviction timer (required watermark)
    // never fires here, so this test stays pure fold-convergence
    val ev = streamEvents(dir).select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "3650 days")
      .as[UserEvent]
    val q = StatefulStats.runningUserStats(ev)
      .writeStream.outputMode("update").format("memory").queryName("ustats").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user is the converged state
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val finalStats = spark.table("ustats")
      .withColumn("max_n", max("n_events").over(w))
      .filter($"n_events" === $"max_n")
      .select("user_id", "n_events", "value_cents", "n_sessions")
      .distinct()
    val expected = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100)).cast("long").as("value_cents"))
    assert(finalStats.count() === expected.count())
    assert(finalStats.join(expected, Seq("user_id", "n_events", "value_cents"))
      .count() === expected.count())
    // session counts agree with the session_window operator
    val sessionCounts = EventStreams.sessionize(batchEvents)
      .groupBy("user_id").count()
    assert(finalStats.join(sessionCounts,
      finalStats("user_id") === sessionCounts("user_id") &&
        finalStats("n_sessions") === sessionCounts("count")).count() === expected.count())
  }

  test("stateful stats evict past the horizon: a reappearing user restarts, a carried one doesn't") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // day 1, not 0: an epoch-0 event is not later than the INITIAL
    // watermark (0) and the late-data filter would drop it
    def t(d: Long) = new java.sql.Timestamp((d + 1) * 86400000L)
    val mem = MemoryStream[UserEvent]
    val stream = mem.toDS().withWatermark("ts", "0 seconds")
    val q = StatefulStats.runningUserStats(stream, horizonDays = 30)
      .writeStream.outputMode(StatefulStats.outputMode)
      .format("memory").queryName("ustats_evict").start()
    try {
      // day 0: user 1's only event (100 cents)
      mem.addData(UserEvent(1L, t(0), 1.0)); q.processAllAvailable()
      // day 100 advances the watermark past user 1's day-30 timer;
      // the next batch fires it and evicts user 1's state
      mem.addData(UserEvent(2L, t(100), 1.0)); q.processAllAvailable()
      mem.addData(UserEvent(2L, t(101), 1.0)); q.processAllAvailable()
      // day 200: user 1 reappears (200 cents) on a fresh slate
      mem.addData(UserEvent(1L, t(200), 2.0)); q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("ustats_evict").filter($"user_id" === 1L)
      .select("n_events", "value_cents").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u1.contains((1L, 100L)), "pre-eviction running stats emitted")
    assert(u1.contains((1L, 200L)),
      "post-eviction stats restart from zero — state really was removed")
    assert(!u1.exists(_._1 == 2L),
      "an evicted user must NOT accumulate across the horizon")
    // user 2 stays in-horizon across triggers: state carries to n=2
    val u2 = spark.table("ustats_evict").filter($"user_id" === 2L)
      .agg(max($"n_events")).head().getLong(0)
    assert(u2 === 2L, "in-horizon cross-trigger state must still carry")
  }

  test("exactly-once sink: crash-replay of a batch leaves the output unchanged") {
    val dir = stageStream("eos")
    val stamp = System.nanoTime()
    val out = tmpDir(s"eos_out_$stamp")
    val chk = tmpDir(s"eos_chk_$stamp")
    val ev = streamEvents(dir).select(col("event_id"), col("user_id"), col("value"))
    val q = ExactlyOnceSink.start(ev, out, chk)
    try q.processAllAvailable() finally q.stop()
    val table = spark.read.parquet(out)
    assert(table.count() === batchEvents.count())
    val before = table.orderBy("event_id")
      .select("event_id", "user_id", "value").collect().toSeq
    // crash-replay: re-deliver batch 0's rows with the SAME batchId
    // (foreachBatch's at-least-once contract). Materialize first —
    // overwrite deletes the directory being read otherwise.
    val batchDir = s"$out/batch_id=0"
    val replayRows = spark.read.parquet(batchDir).collect().toIndexedSeq
    val replayDf = spark.createDataFrame(
      spark.sparkContext.parallelize(replayRows),
      spark.read.parquet(batchDir).schema)
    ExactlyOnceSink.writeBatch(out)(replayDf, 0L)
    val after = spark.read.parquet(out)
    assert(after.count() === batchEvents.count(), "replay must not double-count")
    assert(after.orderBy("event_id").select("event_id", "user_id", "value")
      .collect().toSeq === before, "replay must leave contents unchanged")
  }

  test("stream-static enrichment matches the batch broadcast join") {
    val dir = stageStream("enrich")
    val dim = batchEvents.select($"user_id").distinct()
      .withColumn("cohort", ($"user_id" % 7).cast("long"))
    val streamed = runToMemory(
      EventStreams.enrichEvents(streamEvents(dir), dim, "user_id"), "enrich", "append")
    val batch = EventStreams.enrichEvents(batchEvents, dim, "user_id")
    assert(streamed.count() === batch.count())
    val s = streamed.select($"event_id", $"cohort")
    val b = batch.select($"event_id", $"cohort")
    assert(s.except(b).count() === 0 && b.except(s).count() === 0)
  }

  test("exactly-once sink: checkpoint restart processes only new data") {
    val dir = stageStream("eos_restart")
    val stamp = System.nanoTime()
    val out = tmpDir(s"eos_r_out_$stamp")
    val chk = tmpDir(s"eos_r_chk_$stamp")
    def run(): Unit = {
      val ev = streamEvents(dir).select(col("event_id"), col("user_id"), col("value"))
      val q = ExactlyOnceSink.start(ev, out, chk)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val n1 = spark.read.parquet(out).count()
    assert(n1 === batchEvents.count())
    // new data lands while the query is DOWN; restart from checkpoint
    Seq((-7L, 1L, -7L, "late", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir)
    run()
    val after = spark.read.parquet(out)
    assert(after.count() === n1 + 1, "restart must process exactly the new rows")
    assert(after.groupBy("event_id").count().filter($"count" > 1).count() === 0,
      "no event reprocessed after checkpoint recovery")
  }

  test("sessionization produces bounded per-user sessions") {
    val dir = stageStream("sess")
    val sessions = runWithFlush(
      EventStreams.sessionize(streamEvents(dir)), "sess", dir)
      .filter($"user_id" =!= -1L)
    assert(sessions.count() > 0)
    val bad = sessions.filter($"session_end" < $"session_start").count()
    assert(bad === 0)
    // every event lands in some session: totals add up
    val nEvents = sessions.agg(sum($"n_events")).head().getLong(0)
    assert(nEvents === batchEvents.count())
  }
}
