package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream dedup: corpus dups dropped, in-stream dups collapse to first, fresh kept") {
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = StreamingDedup.fingerprintIndex(corpus, "text")
    // incoming stream: one corpus dup (normalizes identically), two
    // in-stream dups of each other, two fresh docs
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val dir = tmpDir("sdedup_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq(
      (10L, ts(1), "  alpha   beta gamma "), // dup of corpus doc 1 (normalized)
      (11L, ts(2), "fresh one"),
      (12L, ts(3), "burst doc"),
      (13L, ts(4), "burst doc"), // in-stream dup of 12
      (14L, ts(5), "fresh two")
    ).toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingDedup.dedupAgainstCorpus(stream, idx, "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sdedup").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("sdedup").select($"doc_id").as[Long].collect().toSet
    // 10 dropped (corpus), exactly one of {12,13} kept, 11/14 kept
    assert(!kept.contains(10L), "corpus duplicate must be dropped")
    assert(kept.contains(11L) && kept.contains(14L))
    assert(kept.intersect(Set(12L, 13L)).size == 1,
      s"in-stream burst must collapse to one row, kept=$kept")
  }
}
