package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-finding behavior on planted duplicates — the synthetic corpus
  * has none, so the oracle queries only pin signatures; these specs
  * pin detection.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // genuinely distinct docs: per-doc token draws from a 5000-word
  // synthetic vocabulary, so cross-doc shingle overlap is negligible
  private def base: Seq[(Long, String)] =
    (0L until 40L).map { i =>
      val toks = (0 until 60).map(j => s"w${(i * 611 + j * 97 + (i * j) % 13) % 5000}")
      i -> toks.mkString(" ")
    }

  /** 40 distinct docs + exact copy of #3 + near-copy of #5 (one word
    * changed) + unrelated doc.
    */
  private lazy val docs: DataFrame = {
    val nearCopy = base(5)._2.split(" ").updated(30, "zzzqqq").mkString(" ")
    val extra = Seq(
      100L -> base(3)._2,
      101L -> nearCopy,
      102L -> "completely unrelated text that matches nothing else here")
    (base ++ extra).toDF("doc_id", "text")
  }

  test("exact dedup groups exact copies only") {
    val groups = Dedup.exact(docs, "doc_id", "text")
    val dup = groups.filter($"n_copies" > 1).collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Seq[Long]]("ids") === Seq(3L, 100L))
    assert(groups.count() === 42) // 43 docs, one merged pair
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 100L)), "exact copy must share all bands")
    assert(pairs.contains((5L, 101L)), "near copy should share >=1 band")
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L), "unrelated doc")
  }

  test("xxhash64 production family finds the same planted duplicates as md5") {
    import graft.functions.HashFunctions
    val md5Pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val xxPairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        baseHash = HashFunctions.minhashBaseXx)
      .as[(Long, Long)].collect().toSet
    assert(xxPairs.contains((3L, 100L)), "exact copy must share all bands")
    assert(xxPairs.contains((5L, 101L)), "near copy should share >=1 band")
    assert(!xxPairs.exists(p => p._1 == 102L || p._2 == 102L), "unrelated doc")
    // both families agree on the planted set (chance collisions may
    // differ — that's the nature of distinct hash families)
    assert(md5Pairs.intersect(xxPairs).contains((3L, 100L)))
  }

  test("jaccard verification separates near-dup from chance collisions") {
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
    val verified = Dedup.jaccardVerify(docs, cand, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    val byPair = verified.map(v => (v._1, v._2) -> v._3).toMap
    assert(byPair((3L, 100L)) === 1.0)
    assert(byPair((5L, 101L)) > 0.8 && byPair((5L, 101L)) < 1.0)
  }

  test("containment flags a short doc embedded in a long one that jaccard misses") {
    val short = "the quick brown fox jumps over the lazy dog again and again"
    val long = short + " " + Seq.tabulate(40)(i => s"filler$i word$i").mkString(" ")
    val embedded = Seq((1L, short), (2L, long), (3L, "entirely different content here"))
      .toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val cont = Dedup.containmentVerify(embedded, cand, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(v => (v._1, v._2) -> v._3).toMap
    // short is a PREFIX of long: every shingle of A is in B → exactly 1.0
    assert(cont((1L, 2L)) === 1.0)
    assert(cont((1L, 3L)) < 0.2)
    // the same pair under jaccard is diluted below any workable
    // threshold by the union denominator — the case d15 exists for
    val jac = Dedup.jaccardVerify(embedded, cand, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(v => (v._1, v._2) -> v._3).toMap
    assert(jac((1L, 2L)) < 0.5)
  }

  test("simhash pairs: near-identical docs within hamming radius (both weightings)") {
    for (weighted <- Seq(false, true)) {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
          weighted = weighted)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((3L, 100L)), s"identical docs have hamming 0 (weighted=$weighted)")
      assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L), s"weighted=$weighted")
    }
  }

  test("simhash of identical text is identical; different text differs") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(sh(3L) === sh(100L))
    assert(sh(3L) !== sh(102L))
    assert(sh.values.forall(_.matches("[0-9a-f]{16}")))
  }

  test("weighted simhash: a dominant token drives the hash; unweighted ignores frequency") {
    val df = Seq(
      (1L, (Seq.fill(30)("spam") :+ "zzz").mkString(" ")),
      (2L, "spam")).toDF("doc_id", "text")
    val weighted = Dedup.simhashWeighted(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // 30 'spam' votes outvote one 'zzz' on every bit → identical hash
    assert(weighted(1L) === weighted(2L))
    val unweighted = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // distinct-token form sees {spam, zzz}: ties broken by the second
    // token, so it differs from pure 'spam' with near-certainty
    assert(unweighted(1L) !== unweighted(2L))
  }

  test("winnowing fingerprints overlap heavily for near-dups") {
    import graft.functions.TextFunctions
    val fp = docs.select($"doc_id",
      TextFunctions.winnowing($"text").as("fp")).as[(Long, Seq[Long])].collect().toMap
    val a = fp(5L).toSet; val b = fp(101L).toSet
    val overlap = a.intersect(b).size.toDouble / a.union(b).size
    assert(overlap > 0.7, s"winnowing overlap $overlap")
    val u = fp(102L).toSet
    assert(a.intersect(u).isEmpty)
  }
}
