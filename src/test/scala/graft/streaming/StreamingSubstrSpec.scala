package graft.streaming

import graft.SparkSpec
import graft.operators.{ExactSubstr, IncrementalExactSubstr}
import org.apache.spark.sql.functions._

class StreamingSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("stream substr: verbatim copy flagged with its TRUE length, fresh doc clean") {
    // corpus: doc 1 carries a 20-token passage P; doc 2 is unrelated
    val P = toks("p", 20)
    val corpus = Seq(
      (1L, s"$P ${toks("ua", 8)}"),
      (2L, s"${toks("q", 12)} ${toks("ub", 8)}"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFunctions.wsTokens($"text").as("tk"))
    IncrementalExactSubstr.buildIndexes(
      ExactSubstr.windowPositions(corpus), prefix = "ssub1", buckets = 4)
    IncrementalExactSubstr.refreshHotWindows(spark, prefix = "ssub1")

    val t0 = java.sql.Timestamp.valueOf("2026-06-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val dir = tmpDir("ssub1_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    val arrivals = Seq(
      (10L, ts(1), s"${toks("x", 3)} $P ${toks("y", 3)}"), // copies P verbatim
      (11L, ts(2), toks("z", 30)))                          // fresh
    arrivals.toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingSubstr.flagAgainstCorpus(
      stream, IncrementalExactSubstr.servableIndex(spark, "ssub1"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ssub1").start()
    try {
      q.processAllAvailable()
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val flags = spark.table("ssub1")
      .select($"arriving_id", $"corpus_doc", $"len_tok")
      .as[(Long, Long, Long)].collect().toSet
    // exactly the copy, against exactly its source, with the TRUE
    // 20-token extent — not the window width
    assert(flags === Set((10L, 1L, 20L)), s"unexpected flags: $flags")
  }

  test("stream ≡ batch: longest-run lengths match the batch kernel on identical data") {
    val P = toks("pp", 14)
    val R = toks("rr", 11)
    val corpus = Seq(
      (1L, s"$P ${toks("uc", 8)} $R"),
      (2L, s"$R ${toks("ud", 8)}"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFunctions.wsTokens($"text").as("tk"))
    IncrementalExactSubstr.buildIndexes(
      ExactSubstr.windowPositions(corpus), prefix = "ssub2", buckets = 4)
    IncrementalExactSubstr.refreshHotWindows(spark, prefix = "ssub2")
    val arrivals = Seq(
      (20L, s"$P ${toks("ue", 8)}"),         // P only → (20,1,14)
      (21L, s"$R ${toks("uf", 8)} $P"))      // R and P → longest per pair
    // batch truth: the family kernel + per-pair longest
    val arrToks = arrivals.toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFunctions.wsTokens($"text").as("tk"))
    val sv = IncrementalExactSubstr.servableIndex(spark, "ssub2")
    val truth = ExactSubstr.runsFromMatches(
        ExactSubstr.windowPositions(arrToks)
          .select($"h", $"doc_id".as("doc_a"), $"pos".as("pa"))
          .join(sv.select($"h", $"doc_id".as("doc_b"), $"pos".as("pb")), "h")
          .select($"doc_a", $"doc_b", $"pa", $"pb"), minTok = 10)
      .groupBy($"doc_a", $"doc_b").agg(max($"len_tok").as("len_tok"))
      .as[(Long, Long, Long)].collect().toSet

    val t0 = java.sql.Timestamp.valueOf("2026-07-01 00:00:00")
    val dir = tmpDir("ssub2_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    arrivals.zipWithIndex.map { case ((id, text), i) =>
      (id, new java.sql.Timestamp(t0.getTime + i * 1000L), text)
    }.toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingSubstr.flagAgainstCorpus(stream, sv, "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ssub2").start()
    try {
      q.processAllAvailable()
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val flags = spark.table("ssub2")
      .select($"arriving_id", $"corpus_doc", $"len_tok")
      .as[(Long, Long, Long)].collect().toSet
    assert(flags === truth, s"stream $flags != batch truth $truth")
    assert(truth.exists(t => t._1 == 21L && t._3 == 14L),
      "doc 21's longest (P, 14 tokens) must win over R")
  }

  test("hot windows excluded: a boilerplate-built arrival cannot flag or fan out") {
    val W = toks("w", 16)
    val corpus = (1 to 5).map(i => (i.toLong, s"$W ${toks(s"u$i", 8)}"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFunctions.wsTokens($"text").as("tk"))
    IncrementalExactSubstr.buildIndexes(
      ExactSubstr.windowPositions(corpus), prefix = "ssub3", buckets = 4)
    IncrementalExactSubstr.refreshHotWindows(spark, prefix = "ssub3", cap = 3)
    val t0 = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    val dir = tmpDir("ssub3_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq((30L, t0, s"$W ${toks("uz", 8)}"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingSubstr.flagAgainstCorpus(
      stream, IncrementalExactSubstr.servableIndex(spark, "ssub3"), "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ssub3").start()
    try {
      q.processAllAvailable()
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("ssub3").isEmpty,
      "boilerplate-only arrival must not be flagged against any corpus doc")
  }
}
