package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_benford (first-digit profile), t25_lexical_diversity, t24_bm25,
  * p11_group_sample — planted fixtures with hand-computed answers
  * plus plan-shape and corpus invariants.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(name: String, rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir(name)
    rows.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    dir
  }

  // -------------------------------------------------------------- benford

  test("benford: planted digits — counts, integer shares, expectation table") {
    val dir = tmpDir("benford_fixture")
    Seq(1.00, 1.50, 2.00, 0.95).toDF("l_extendedprice")
      .write.mode("overwrite").parquet(dir + "/lineitem.parquet")
    // cents 100, 150, 200, 95 -> first digits 1,1,2,9
    val out = Extended.qBenford(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 500000L, 301029L, 198971L),
      (2L, 1L, 250000L, 176091L, 73909L),
      (9L, 1L, 250000L, 45757L, 204243L)))
  }

  test("benford: expectation constants are the floor-micro of log10(1+1/d)") {
    assert(Extended.benfordMicro.map(_._2) ===
      Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L))
    // a valid probability distribution up to flooring
    val s = Extended.benfordMicro.map(_._2).sum
    assert(s > 999990L && s <= 1000000L)
  }

  test("benford: corpus — digits in range, shares sum to ≤ 1e6") {
    val out = Extended.qBenford(spark, sf0)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (d, n, share, exp, delta) =>
      assert(d >= 1 && d <= 9 && n >= 1)
      assert(delta === math.abs(share - exp))
    }
    assert(out.map(_._3).sum <= 1000000L)
  }

  // ------------------------------------------------- lexical diversity

  test("lexical diversity: hand-computed TTR and Simpson per source") {
    val dir = writeDocs("lexdiv_fixture", Seq(
      (1L, "a a b", "A"),         // A: N=3, V=2, rep=2·1=2
      (2L, "x x", "B"), (3L, "x x", "B"))) // B: N=4, V=1, rep=4·3=12
    val out = CorpusQueries.t25LexicalDiversity(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("A", 3L, 2L, 666666L, 333333L),
      ("B", 4L, 1L, 250000L, 1000000L)))
  }

  test("lexical diversity: corpus — bounds and monotone sanity") {
    val out = CorpusQueries.t25LexicalDiversity(spark, sf0)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (s, n, v, ttr, simpson) =>
      assert(v >= 1 && v <= n, s)
      assert(ttr >= 0 && ttr <= 1000000L, s)
      assert(simpson >= 0 && simpson <= 1000000L, s)
    }
  }

  // -------------------------------------------------------------- bm25

  test("bm25: hand-computed scores on a three-doc corpus") {
    val dir = writeDocs("bm25_fixture", Seq(
      (1L, "table table chair", "A"),
      (2L, "spark", "A"),
      (3L, "chair bed", "A")))
    val out = PipelineQueries.t24Bm25(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // N=3, Σdl=6; idf(df=1) = ln(2.5/1.5 + 1)
    val idf = math.log(2.5 / 1.5 + 1.0)
    def score(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * 3.0 / 6.0))
      math.rint(raw * 1e6) / 1e6
    }
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 1L), (2L, 1L)))
    assert(math.abs(out(0)._3 - score(2, 3)) < 1e-9)  // doc1: tf(table)=2, dl=3
    assert(math.abs(out(1)._3 - score(1, 1)) < 1e-9)  // doc2: tf(spark)=1, dl=1
  }

  test("bm25: longer doc with equal tf scores LOWER (length normalization)") {
    val dir = writeDocs("bm25_len", Seq(
      (1L, "table a b c d e f g", "A"),
      (2L, "table a", "A")))
    val out = PipelineQueries.t24Bm25(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length === 2)
    assert(out(1)._3 > out(0)._3, "short doc must outrank long at equal tf")
  }

  test("bm25: corpus — scores positive, hits bounded by query size") {
    val out = PipelineQueries.t24Bm25(spark, sf0)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, hits, s) =>
      assert(hits >= 1 && hits <= PipelineQueries.Bm25Terms.length, s"doc $id")
      assert(s > 0.0, s"doc $id non-positive score")
    }
  }

  // ------------------------------------------------------ group sample

  test("group sample: exactly k per big group, whole group when smaller") {
    val rows = (1L to 30L).map(i => (i, s"doc $i", "big")) ++
      Seq((100L, "x", "small"), (101L, "y", "small"), (102L, "z", "small"))
    val dir = writeDocs("gsample_fixture", rows)
    val out = PipelineQueries.p11GroupSample(spark, dir)
      .as[(Long, String, Long)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc("big").length === PipelineQueries.GroupSampleK)
    assert(bySrc("small").length === 3)
    bySrc.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq, "ranks contiguous")
    }
  }

  test("group sample: selection is partitioning-invariant (hash-keyed, not positional)") {
    val rows = (1L to 40L).map(i => (i, s"doc $i", if (i % 2 == 0) "e" else "o"))
    val dir = writeDocs("gsample_det", rows)
    val a = PipelineQueries.p11GroupSample(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    // rewrite the same corpus with a different physical layout
    val dir2 = tmpDir("gsample_det2")
    spark.read.parquet(dir + "/documents.parquet").repartition(7)
      .write.mode("overwrite").parquet(dir2 + "/documents.parquet")
    val b = PipelineQueries.p11GroupSample(spark, dir2)
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
  }

  test("group sample plan: rank filter is a two-phase WindowGroupLimit") {
    val plan = PipelineQueries.p11GroupSample(spark, sf0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected per-partition top-k pushdown, plan:\n$plan")
  }
}
