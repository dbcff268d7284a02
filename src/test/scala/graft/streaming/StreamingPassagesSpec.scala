package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalPassages
import org.apache.spark.sql.functions._

class StreamingPassagesSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("stream passages: copied passage flagged with its batch count, fresh doc clean") {
    // corpus: doc 1 carries a 12-token passage (5 rolling windows),
    // doc 2 is unrelated
    val P = toks("p", 12)
    val corpus = Seq(
      (1L, s"$P ${toks("ua", 8)}"),
      (2L, s"${toks("q", 10)} ${toks("ub", 8)}")).toDF("doc_id", "text")
    val corpusWins = IncrementalPassages.windowHashes(corpus)
    IncrementalPassages.buildWindowIndex(corpusWins, prefix = "spass", buckets = 4)
    IncrementalPassages.refreshHotWindows(spark, prefix = "spass")

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val dir = tmpDir("spass_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq(
      (10L, ts(1), s"$P ${toks("uc", 8)}"), // copies P: shares exactly its 5 windows
      (11L, ts(2), s"${toks("z", 20)}"))    // fresh: shares nothing
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val out = StreamingPassages.flagAgainstCorpus(
      stream, IncrementalPassages.servableIndex(spark, "spass"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("spass").start()
    try {
      q.processAllAvailable()
      // append-mode aggregation emits once the watermark passes the
      // window — advance it with a flush doc and drain again
      Seq((-1L, ts(24 * 3600), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val flags = spark.table("spass")
      .select($"doc_id", $"corpus_doc", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
    // exactly the copied passage, against exactly its source doc,
    // with exactly the 5-window count the batch kernel would report
    assert(flags === Set((10L, 1L, 5L)), s"unexpected flags: $flags")
  }

  test("hot windows excluded: a boilerplate passage cannot flag arriving docs") {
    // 5 corpus docs share a boilerplate passage W (license-header
    // shape); at cap 3 its windows are hot and the maintained
    // exclusion keeps them out of the servable index — an arriving
    // doc built ONLY from W must come out clean instead of fanning
    // out to all 5 docs
    val W = toks("w", 12)
    val corpus = (1 to 5).map(i => (i.toLong, s"$W ${toks(s"u$i", 8)}"))
      .toDF("doc_id", "text")
    IncrementalPassages.buildWindowIndex(
      IncrementalPassages.windowHashes(corpus), prefix = "spass3", buckets = 4)
    IncrementalPassages.refreshHotWindows(spark, prefix = "spass3", cap = 3)
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
    val dir = tmpDir("spass3_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq((30L, t0, s"$W ${toks("uz", 8)}"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingPassages.flagAgainstCorpus(
      stream, IncrementalPassages.servableIndex(spark, "spass3"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("spass3").start()
    try {
      q.processAllAvailable()
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("spass3").isEmpty,
      "boilerplate-only doc must not be flagged against any corpus doc")
  }

  test("stream ≡ batch: shared-window counts match the batch kernel on identical data") {
    val P = toks("pp", 12)
    val Q = toks("qq", 10)
    val corpus = Seq(
      (1L, s"$P ${toks("ud", 8)} $Q"),
      (2L, s"$Q ${toks("ue", 8)}")).toDF("doc_id", "text")
    val corpusWins = IncrementalPassages.windowHashes(corpus)
    IncrementalPassages.buildWindowIndex(corpusWins, prefix = "spass2", buckets = 4)
    IncrementalPassages.refreshHotWindows(spark, prefix = "spass2")

    val arrivals = Seq(
      (20L, s"$P ${toks("uf", 8)}"),
      (21L, s"$Q ${toks("ug", 8)} $P"))
    // batch truth: the arriving docs' windows joined to the same index
    val batchTruth = IncrementalPassages
      .windowHashes(arrivals.toDF("doc_id", "text"))
      .join(IncrementalPassages.servableIndex(spark, "spass2")
        .select(col("h"), col("doc_id").as("corpus_doc")), "h")
      .groupBy(col("doc_id"), col("corpus_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .as[(Long, Long, Long)].collect().toSet

    val t0 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    val dir = tmpDir("spass2_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    arrivals.zipWithIndex.map { case ((id, text), i) =>
      (id, new java.sql.Timestamp(t0.getTime + i * 1000L), text)
    }.toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingPassages.flagAgainstCorpus(
      stream, IncrementalPassages.servableIndex(spark, "spass2"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("spass2").start()
    try {
      q.processAllAvailable()
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("spass2")
      .select($"doc_id", $"corpus_doc", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batchTruth, s"stream $streamed != batch $batchTruth")
    assert(batchTruth.nonEmpty, "fixture must exercise the gate")
  }
}
