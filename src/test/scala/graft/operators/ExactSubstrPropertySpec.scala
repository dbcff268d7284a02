package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property-based hardening for the exact-substring family (the r12
  * minhash-family discipline applied to the newest kernel): the
  * whole windows → hot cap → diagonal-chaining pipeline must match a
  * plain-JVM oracle built from the same md5-60-bit constants on
  * ARBITRARY low-alphabet token arrays (a tiny alphabet forces dense
  * window collisions, hot-cap crossings, and multi-run diagonals the
  * planted fixtures cannot enumerate), and the incremental merge
  * must equal the full recompute on RANDOM corpus/batch splits of
  * the same adversarial inputs.
  */
class ExactSubstrPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = ExactSubstr.Width

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Plain-JVM maximal repeats from the same constants. */
  private def jvmRepeats(docs: Seq[(Long, Seq[String])], cap: Int,
      minTok: Int): Set[(Long, Long, Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, tk) =>
      if (tk.size >= W)
        (0 to tk.size - W).map(i =>
          (id, (i + 1).toLong, h60(tk.slice(i, i + W).mkString(" "))))
      else Nil
    }
    val hot = wins.map(w => (w._3, w._1)).distinct
      .groupBy(_._1).collect { case (h, g) if g.size > cap => h }.toSet
    val byH = wins.filterNot(w => hot(w._3)).groupBy(_._3)
    val ms = byH.values.flatMap(g =>
      for (a <- g; b <- g if a._1 < b._1) yield (a._1, b._1, a._2, b._2)).toSeq
    ms.groupBy(m => (m._1, m._2, m._3 - m._4)).toSeq.flatMap {
      case ((da, db, diag), g) =>
        val pas = g.map(_._3).distinct.sorted
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = pas.head; var prev = pas.head; var n = 1L
        pas.tail.foreach { p =>
          if (p == prev + 1) n += 1
          else { runs += ((start, n)); start = p; n = 1 }
          prev = p
        }
        runs += ((start, n))
        runs.collect { case (st, k) if k + W - 1 >= minTok =>
          (da, db, st, st - diag, k + W - 1) }
    }.toSet
  }

  // dense-collision corpus: 2-token alphabet ⇒ ≤ 256 distinct
  // windows, so random docs share windows, cross the cap, and chain
  // multi-run diagonals by construction
  private val docGen: Gen[Seq[String]] =
    Gen.choose(0, 45).flatMap(n => Gen.listOfN(n, Gen.oneOf("x", "y")))

  private def sample(nDocs: Int): Seq[(Long, Seq[String])] =
    Gen.listOfN(nDocs, docGen).sample.get.zipWithIndex
      .map { case (tk, i) => (i.toLong, tk) }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_a", $"doc_b", $"a_start", $"b_start", $"len_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("maximalRepeats ≡ JVM oracle on dense random token arrays (3 worlds)") {
    (1 to 3).foreach { _ =>
      val docs = sample(14)
      val got = rows(ExactSubstr.maximalRepeats(
        docs.toDF("doc_id", "tk"), cap = 3, minTok = 10))
      val want = jvmRepeats(docs, cap = 3, minTok = 10)
      assert(got === want,
        s"kernel diverged: spark-only ${got -- want}, jvm-only ${want -- got}")
    }
  }

  test("mergeBatch ≡ full recompute on random corpus/batch splits") {
    (1 to 3).foreach { round =>
      val docs = sample(14)
      val (corpus, batch) = docs.partition(_._1 % 3 != 0)
      if (corpus.nonEmpty && batch.nonEmpty) {
        val prefix = s"ixsprop$round"
        val corpusDf = corpus.toDF("doc_id", "tk")
        IncrementalExactSubstr.buildIndexes(
          ExactSubstr.windowPositions(corpusDf), prefix = prefix, buckets = 4)
        val oldRepeats = ExactSubstr.maximalRepeats(corpusDf, cap = 3)
        val merged = rows(IncrementalExactSubstr.mergeBatch(spark,
          ExactSubstr.windowPositions(batch.toDF("doc_id", "tk")),
          oldRepeats, prefix = prefix, cap = 3))
        val want = jvmRepeats(docs, cap = 3, minTok = 10)
        assert(merged === want,
          s"merge diverged: spark-only ${merged -- want}, jvm-only ${want -- merged}")
      }
    }
  }
}
