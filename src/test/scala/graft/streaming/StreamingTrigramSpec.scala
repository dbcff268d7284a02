package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingTrigramSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def runGate(dir: String, queryName: String,
      panel: org.apache.spark.sql.DataFrame,
      hot: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingTrigram.flagAgainstPanel(stream, panel, hot, "ts")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    try {
      q.processAllAvailable()
      val t0 = spark.read.parquet(dir).select(max($"ts")).head().getTimestamp(0)
      Seq((-1L, new java.sql.Timestamp(t0.getTime + 24 * 3600 * 1000L), "flush"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(queryName)
      .select($"doc_id", $"bench_id", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("stream trigram gate: benchmark copy flagged with its shared count, fresh doc clean") {
    val benchText = toks("b", 10)
    val bench = Seq((50L, benchText)).toDF("doc_id", "text")
    val panel = StreamingTrigram.panelIndex(bench)
    val hot = Seq.empty[Long].toDF("h")
    val t0 = java.sql.Timestamp.valueOf("2026-09-01 00:00:00")
    val dir = tmpDir("strig1_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq(
      (10L, t0, benchText),                                  // verbatim copy: 8 shared trigrams
      (11L, new java.sql.Timestamp(t0.getTime + 1000), toks("z", 12)))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val flags = runGate(dir, "strig1", panel, hot)
    // 10 tokens → 8 distinct trigrams, all shared
    assert(flags === Set((10L, 50L, 8L)), s"unexpected: $flags")
  }

  test("hot trigrams excluded: a boilerplate-built arrival cannot flag") {
    // the license-header case: W's trigrams sit in > cap corpus docs
    // AND in a panel doc; the maintained hot exclusion must keep an
    // arrival made of W from flagging against the panel
    val W = toks("w", 10)
    val corpus = (1 to 5).map(i => (i.toLong, s"$W ${toks(s"u$i", 4)}"))
      .toDF("doc_id", "text")
    val hot = graft.operators.PipelineQueries.triShingles(corpus, "doc_id")
      .distinct().groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" > 3).select($"h")
    val panel = StreamingTrigram.panelIndex(
      Seq((100L, s"$W ${toks("p", 4)}")).toDF("doc_id", "text"))
    val t0 = java.sql.Timestamp.valueOf("2026-09-02 00:00:00")
    val dir = tmpDir("strig2_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq((30L, t0, W)).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(dir)
    val flags = runGate(dir, "strig2", panel, hot)
    assert(flags.isEmpty,
      s"boilerplate-only arrival must not flag against the panel: $flags")
  }

  test("stream ≡ batch: shared counts match the d8 kernel on identical data") {
    val B1 = toks("m", 9)   // 7 trigrams
    val B2 = toks("n", 6)   // 4 trigrams
    val bench = Seq((50L, B1), (100L, B2)).toDF("doc_id", "text")
    val panel = StreamingTrigram.panelIndex(bench)
    val hot = Seq.empty[Long].toDF("h")
    val arrivals = Seq(
      (20L, s"$B1 ${toks("x", 3)}"),   // shares B1's trigrams + 2 junction? no: junction trigrams mix m/x → unshared
      (21L, s"${toks("y", 3)} $B2 $B1"))
    // batch truth: distinct arrival trigrams ⋈ panel, counted
    val truth = graft.operators.PipelineQueries.triShingles(
        arrivals.toDF("doc_id", "text"), "doc_id").distinct()
      .join(panel, "h")
      .groupBy($"doc_id", $"bench_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val t0 = java.sql.Timestamp.valueOf("2026-09-03 00:00:00")
    val dir = tmpDir("strig3_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    arrivals.zipWithIndex.map { case ((id, text), i) =>
      (id, new java.sql.Timestamp(t0.getTime + i * 1000L), text)
    }.toDF("doc_id", "ts", "text").write.mode("append").parquet(dir)
    val flags = runGate(dir, "strig3", panel, hot)
    assert(flags === truth, s"stream $flags != batch truth $truth")
    assert(truth.exists(t => t._1 == 21L && t._2 == 50L) &&
      truth.exists(t => t._1 == 21L && t._2 == 100L),
      "doc 21 must flag against BOTH panel docs")
  }
}
