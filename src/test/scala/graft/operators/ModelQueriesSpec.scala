package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** t13 model scoring / t14 bigram LM / p6 mixture plan: planted
  * inputs with hand-computed expectations, plus the plan-shape
  * guards that make the 100 TB claims checkable (t13 scoring must
  * stay a shuffle-free narrow map).
  */
class ModelQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** The classifier's weight formula, replayed independently on the
    * JVM (MessageDigest md5, not Spark's): w(token) =
    * ((bucket·2654435761 + 97) mod 2001) − 1000 with bucket =
    * first-15-hex-chars-of-md5 mod 1024.
    */
  private def refWeight(token: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    val bucket = java.lang.Long.parseLong(hex, 16) % 1024L
    (bucket * 2654435761L + 97L) % 2001L - 1000L
  }

  test("t13: logits equal an independent JVM replay of the weight formula") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),        // repeated token: tf-weighted sum
      (3L, "  "),                 // whitespace-only: 0 tokens, logit 0
      (4L, "Mixed CASE Tokens")   // lowercased before hashing
    ).toDF("doc_id", "text")
    val got = ModelQueries.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def expected(s: String): (Long, Long) = {
      val toks = s.toLowerCase.trim.split(" +").filter(_.nonEmpty)
      (toks.length.toLong, toks.map(refWeight).sum)
    }
    assert(got(1L) === expected("the quick brown fox"))
    assert(got(2L) === expected("the the the"))
    assert(got(2L)._2 === 3 * refWeight("the"))
    assert(got(3L) === ((0L, 0L)))
    assert(got(4L) === expected("Mixed CASE Tokens"))
  }

  test("t13: scoring is a pure narrow map — no exchange, no generate") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = ModelQueries.scoreDocs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"model inference must not shuffle:\n$plan")
    assert(!plan.contains("Generate"),
      s"the token fold must not explode (aggregate() folds in place):\n$plan")
  }

  test("t14: planted corpus matches hand-computed bigram conditionals") {
    // corpus: c("a b")=2, c("a c")=1, prefix c(a ·)=3
    val docs = Seq(
      (1L, "a b", "s"), (2L, "a b", "s"), (3L, "a c", "s"),
      (4L, "solo", "s") // single token: no bigrams, dropped
    ).toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(tmpDir("t14") + "/documents.parquet")
    val out = ModelQueries.t14BigramLm(spark, tmpDir("t14"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def lp(cbi: Long, cpre: Long): Double =
      BigDecimal(math.log(cbi.toDouble) - math.log(cpre.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((1L, lp(2, 3))))
    assert(out(2L) === ((1L, lp(2, 3))))
    assert(out(3L) === ((1L, lp(1, 3))))
  }

  test("t13: the scorer runs unchanged on a stream (narrow map, no state)") {
    // model scoring at the ingestion front door: because scoreDocs is
    // a stateless narrow map, the SAME code path serves batch and
    // streaming — no watermark, no state store, nothing to rewrite
    val dir = tmpDir("t13_stream")
    new java.io.File(dir).listFiles().foreach(_.delete())
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum dolor"))
      .toDF("doc_id", "text")
    docs.write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = ModelQueries.scoreDocs(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("t13_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t13_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = ModelQueries.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("p6: scarce source upsamples exactly, cap binds on a tiny one") {
    def doc(src: String, n: Int): (String, String) = (src, Seq.fill(n)("w").mkString(" "))
    // big: 9000 tokens, small: 1000, tiny: 100 → tot 10100, k=3,
    // tgt = (10100/2)/3 = 1683; epochs_micro = min(4e6, tgt*1e6/n_tok)
    val docs = (Seq.fill(9)(doc("big", 1000)) ++ Seq.fill(2)(doc("small", 500)) :+
      doc("tiny", 100)).toDF("source", "text")
    val rows = PipelineQueries.mixturePlan(docs).orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("big", 9L, 9000L, 1683L, 1683L * 1000000L / 9000L),
      ("small", 2L, 1000L, 1683L, 1683L * 1000000L / 1000L),
      ("tiny", 1L, 100L, 1683L, 4000000L)))
  }

  test("t22: a deterministic collocation tops PMI over diffuse co-occurrences") {
    // "san francisco": the words appear ONLY together; "the" pairs
    // with many different words — PMI must rank the exclusive pair
    // first even though "the"-bigrams are more frequent
    val dir = tmpDir(s"t22_plant_${System.nanoTime()}")
    val docs = (0 until 10).map { i =>
      (i.toLong, "san francisco " * 5 + s"the w$i " * 10)
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val top = ModelQueries.t22Pmi(spark, dir)
      .select(col("pre"), col("w")).collect().map(r => (r.getString(0), r.getString(1)))
    // the x5 repetition makes (francisco, san) exclusive too (circular
    // wrap), with the SAME PMI — both must lead, ahead of every diffuse
    // "the"-pair
    assert(top.take(2).toSet === Set(("san", "francisco"), ("francisco", "san")),
      s"exclusive pairs must top PMI, got ${top.take(2).toSeq}")
  }

  test("t21: Kneser-Ney probabilities match the hand-computed plant") {
    // corpus: "a b a b" + "a b c" →
    //   bigram types (a,b):3 (b,a):1 (b,c):1; prefixes a:(3,1) b:(2,2);
    //   continuations b:1 a:1 c:1; 3 types total
    val dir = tmpDir(s"t21_plant_${System.nanoTime()}")
    Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val pAB = (3 - 0.75) / 3 + (0.75 * 1 / 3) * (1.0 / 3) // 0.8333…
    val pBA = (1 - 0.75) / 2 + (0.75 * 2 / 2) * (1.0 / 3) // 0.375
    val exp1 = (2 * math.log(pAB) + math.log(pBA)) / 3
    val exp2 = (math.log(pAB) + math.log(pBA)) / 2
    val out = ModelQueries.t21KneserNey(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 2L)
    assert(math.abs(out(1L)._2 - exp1) < 2e-6, s"doc1 ${out(1L)._2} vs $exp1")
    assert(math.abs(out(2L)._2 - exp2) < 2e-6, s"doc2 ${out(2L)._2} vs $exp2")
    // KN's defining property on this plant: "b" appears often but only
    // after "a" — the interpolated mass it receives (continuation
    // count 1) equals rare "c"'s, NOT its raw frequency share
    assert(pBA === (1 - 0.75) / 2 + (0.75 * 2 / 2) * (1.0 / 3))
  }
}
