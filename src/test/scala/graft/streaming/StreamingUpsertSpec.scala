package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("k", "payload", "version", "is_delete")

  private def snapKeys(out: String): Set[Long] =
    StreamingUpsert.latestSnapshot(spark, out).get
      .select("k").as[Long].collect().toSet

  private def freshDir(name: String): String = {
    val d = new java.io.File(tmpDir(name))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(d); d.mkdirs()
    d.getAbsolutePath
  }

  test("per-batch merge folds inserts/updates/deletes and crash-replay is idempotent") {
    val out = freshDir("stream_upsert") + "/table"
    val merge = StreamingUpsert.mergeBatch(out, "k", "version", "is_delete") _
    merge(changes((1L to 5L).map(k => (k, s"p$k", 1L, false))), 0L)
    assert(StreamingUpsert.versions(spark, out) == Seq(0L))
    assert(snapKeys(out) == Set(1L, 2L, 3L, 4L, 5L))
    val b1 = changes(Seq((2L, "p2-new", 2L, false), (3L, "gone", 2L, true),
      (6L, "p6", 2L, false)))
    merge(b1, 1L)
    assert(StreamingUpsert.versions(spark, out) == Seq(0L, 1L))
    assert(snapKeys(out) == Set(1L, 2L, 4L, 5L, 6L))
    val snap = StreamingUpsert.latestSnapshot(spark, out).get
    assert(snap.filter($"k" === 2L).select("payload").as[String].head() == "p2-new")
    // crash-replay: foreachBatch re-delivers batch 1 with the same id;
    // the merge must re-read snap_v=0 (not its own output) and land
    // the identical snapshot
    val before = snap.orderBy("k").collect().toSeq
    merge(b1, 1L)
    val after = StreamingUpsert.latestSnapshot(spark, out).get.orderBy("k").collect().toSeq
    assert(after == before, "replaying a batch must not change the table")
    assert(StreamingUpsert.versions(spark, out) == Seq(0L, 1L))
  }

  test("change stream through foreachBatch lands the same snapshot as a batch merge") {
    val base = freshDir("stream_upsert_live")
    val feed = base + "/feed"
    val out = base + "/table"
    val b0 = changes((1L to 4L).map(k => (k, s"p$k", 1L, false)))
    b0.coalesce(1).write.mode("overwrite").parquet(feed)
    val stream = spark.readStream.schema(b0.schema).parquet(feed)
    val q = StreamingUpsert.start(stream, out, base + "/ckpt", "k", "version", "is_delete")
    try {
      q.processAllAvailable()
      // second file = second micro-batch
      changes(Seq((1L, "dead", 2L, true), (5L, "p5", 2L, false)))
        .coalesce(1).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    assert(snapKeys(out) == Set(2L, 3L, 4L, 5L))
  }
}
