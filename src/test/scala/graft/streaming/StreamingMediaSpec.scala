package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, IncrementalMedia}
import org.apache.spark.sql.functions._

class StreamingMediaSpec extends SparkSpec {
  import spark.implicits._

  test("stream media: near-dup re-upload flagged with its batch hamming, fresh asset clean") {
    // corpus: three assets with distinct texts
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about sparkling engines and rows"),
      (3L, "a third asset whose text shares nothing with the arriving ones"))
      .toDF("media_id", "text")
    val hashed = Dedup.phashChar(corpus, "media_id", "text", k = 4)
    IncrementalMedia.buildPhashIndex(hashed, prefix = "smedia", buckets = 4)
    IncrementalMedia.refreshHotBuckets(spark, prefix = "smedia")

    val t0 = java.sql.Timestamp.valueOf("2026-04-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val dir = tmpDir("smedia_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    val arrivals = Seq(
      // re-upload of asset 1 re-serialized with whitespace churn —
      // normText collapses it, so the pHash lands at Hamming 0 (the
      // re-crawl case the gate exists for)
      (10L, ts(1), "  the  quick brown fox jumps  over the lazy dog again and again "),
      // fresh text: hashes far from every corpus asset
      (11L, ts(2), "unrelated arrival carrying entirely novel vocabulary tokens"))
    // the stream is keyed asset_id while the index is keyed media_id —
    // streamIdCol names the stream side independently (r12 advisory)
    arrivals.toDF("asset_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingMedia.flagAgainstCorpus(
      stream, IncrementalMedia.servableIndex(spark, "smedia"), "ts",
      streamIdCol = "asset_id")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("smedia").start()
    try q.processAllAvailable() finally q.stop()
    val flags = spark.table("smedia")
      .select($"arriving_id", $"corpus_id", $"hamming".cast("long"))
      .as[(Long, Long, Long)].collect().toSet

    // batch truth: hexHashPairs over corpus + arrivals, restricted to
    // pairs involving an arrival (ids ≥ 10)
    val arrHashed = Dedup.phashChar(
      arrivals.map { case (id, _, text) => (id, text) }.toDF("media_id", "text"),
      "media_id", "text", k = 4)
    val truth = Dedup.hexHashPairs(hashed.unionByName(arrHashed),
        "media_id", "phash", maxHamming = 3)
      .filter($"id_b" >= 10L)
      .select($"id_b", $"id_a", $"hamming".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(flags === truth, s"stream $flags != batch truth $truth")
    assert(flags.exists(_._1 == 10L), "the planted re-upload must be flagged")
    assert(!flags.exists(_._1 == 11L), "the fresh arrival must stay clean")
  }

  test("hot buckets excluded: a degenerate all-zero-hash arrival cannot fan out") {
    // trivial assets (too short to shingle) hash to the all-zero
    // pHash; with enough of them the (band, 0) buckets are hot and
    // the maintained exclusion keeps a trivial arrival from pairing
    // with every one of them at hamming 0
    val corpus = (1 to 6).map(i => (i.toLong, "ab")).toDF("media_id", "text")
    val hashed = Dedup.phashChar(corpus, "media_id", "text", k = 4)
    IncrementalMedia.buildPhashIndex(hashed, prefix = "smedia2", buckets = 4)
    IncrementalMedia.refreshHotBuckets(spark, prefix = "smedia2", maxBucket = 4)
    val t0 = java.sql.Timestamp.valueOf("2026-05-01 00:00:00")
    val dir = tmpDir("smedia2_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq((20L, t0, "cd"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingMedia.flagAgainstCorpus(
      stream, IncrementalMedia.servableIndex(spark, "smedia2"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("smedia2").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("smedia2").isEmpty,
      "a degenerate-bucket arrival must not pair with the whole bucket")
  }
}
