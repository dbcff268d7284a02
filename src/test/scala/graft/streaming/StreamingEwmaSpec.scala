package graft.streaming

import graft.SparkSpec
import graft.operators.Extended
import org.apache.spark.sql.functions._

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def corpusEvents =
    graft.GraftSession.table(spark, sf0, "events")
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[EwmaEvent]

  test("batch fold equals the oracled q_ewma entry on the test corpus") {
    val fold = StreamingEwma.runningEwma(corpusEvents)
      .select($"user_id", $"n_events",
        date_format($"last_ts", "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        $"ewma_cents", $"avg_cents", $"trending")
      .as[(Long, Long, String, Long, Long, Int)].collect().sortBy(_._1).toSeq
    val entry = Extended.qEwma(spark, sf0)
      .as[(Long, Long, String, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(fold === entry, "stateful fold must reproduce the batch entry exactly")
  }

  test("stream across split triggers equals the batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(h: Long) = new java.sql.Timestamp(86400000L + h * 3600000L)
    val evs = Seq(
      EwmaEvent(1L, t(0), 1L, 1.00), EwmaEvent(2L, t(0), 4L, 4.00),
      EwmaEvent(1L, t(1), 2L, 2.00), EwmaEvent(2L, t(1), 5L, 2.00),
      EwmaEvent(1L, t(2), 3L, 4.00), EwmaEvent(2L, t(2), 6L, 1.00))
    val mem = MemoryStream[EwmaEvent]
    val q = StreamingEwma.runningEwma(
        mem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode(StreamingEwma.outputMode)
      .format("memory").queryName("sewma").start()
    try {
      // split mid-window by TIME (a user-wise split would land user
      // 2's earlier events behind the advanced watermark): both
      // users' windows span the trigger boundary
      mem.addData(evs.take(4): _*); q.processAllAvailable()
      mem.addData(evs.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val finalRows = spark.table("sewma")
      .withColumn("mx", max($"n_events").over(w))
      .filter($"n_events" === $"mx")
      .select($"user_id", $"n_events", $"ewma_cents", $"avg_cents", $"trending")
      .distinct()
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    val batch = StreamingEwma.runningEwma(evs.toDS())
      .select($"user_id", $"n_events", $"ewma_cents", $"avg_cents", $"trending")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(finalRows === batch)
    // and the planted values match the hand computation from EwmaSpec:
    // rising 100,200,400 → ewma 300 > avg 233; falling mirror → 171
    assert(batch === Seq((1L, 3L, 300L, 233L, 1), (2L, 3L, 171L, 233L, 0)))
  }

  test("state evicts past the horizon: a reappearing user restarts the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(d: Long) = new java.sql.Timestamp((d + 1) * 86400000L)
    val mem = MemoryStream[EwmaEvent]
    val q = StreamingEwma.runningEwma(
        mem.toDS().withWatermark("ts", "0 seconds"), horizonDays = 30)
      .writeStream.outputMode(StreamingEwma.outputMode)
      .format("memory").queryName("sewma_evict").start()
    try {
      mem.addData(EwmaEvent(1L, t(0), 1L, 1.00)); q.processAllAvailable()
      // watermark jumps past user 1's day-30 timer; next batch evicts
      mem.addData(EwmaEvent(2L, t(100), 2L, 1.00)); q.processAllAvailable()
      mem.addData(EwmaEvent(2L, t(101), 3L, 1.00)); q.processAllAvailable()
      // user 1 reappears on a fresh slate: ewma restarts at the new
      // value, n_events restarts at 1
      mem.addData(EwmaEvent(1L, t(200), 4L, 2.00)); q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("sewma_evict").filter($"user_id" === 1L)
      .select($"n_events", $"ewma_cents")
      .as[(Long, Long)].collect().toSet
    assert(u1.contains((1L, 100L)), "pre-eviction row")
    assert(u1.contains((1L, 200L)), "post-eviction restart must not blend 100")
    assert(!u1.contains((2L, 150L)), "blended window would mean no eviction")
  }
}
