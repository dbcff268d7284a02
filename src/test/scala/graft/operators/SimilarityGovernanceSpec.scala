package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-occupancy governance for the SRP/cosine-LSH family (r16):
  * count-derived hash width (`Similarity.chooseNBits`) plus the
  * oversized-home-bucket drop — the minhash `maxBucket` discipline
  * applied to the vector side, closing the fixed-nBits quadratic
  * within-bucket growth the r15 sweep measured (s11 45× for 10×).
  *
  * The planted-pair tests pin the cap's CONTRACT: degenerate mass
  * (template/duplicated directions, the only thing that crosses the
  * cap) is excluded, while a true near-dup pair living in an
  * ordinary-occupancy bucket is never dropped.
  */
class SimilarityGovernanceSpec extends SparkSpec {
  import spark.implicits._

  // splitmix-style component mix: near-orthogonal background vectors
  // (a sin(seed·64+j) ladder puts every vector on one phase circle —
  // all near-dups of each other, the opposite of background)
  private def hashVec(seed: Long): Seq[Float] =
    (0 until 64).map { j =>
      val x = seed * 6364136223846793005L + j * 1442695040888963407L
      val m = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      (((m >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat
    }

  // 700 background vectors + 300 copies of ONE degenerate direction
  // (all in the same home bucket — over the 128 cap) + a planted
  // near-dup pair on an ordinary direction
  private val plantedBase = hashVec(777777L)
  private val plantedNear = plantedBase.zipWithIndex.map {
    case (x, j) => if (j == 0) x + 0.001f else x
  }
  private lazy val corpus = {
    val bg = (0L until 700L).map(i => (i, hashVec(i)))
    val deg = (5000L until 5300L).map(i => (i, hashVec(999999L)))
    val planted = Seq((9001L, plantedBase), (9002L, plantedNear))
    (bg ++ deg ++ planted).toDF("vec_id", "embedding")
  }
  private def isDeg(id: Long) = id >= 5000L && id < 5300L

  test("chooseNBits tracks corpus size at the target occupancy") {
    // 2^nBits must cover ceil(n/occ) buckets, clamped
    assert(Similarity.chooseNBits(500) === 5)
    assert(Similarity.chooseNBits(2000) === 7)
    assert(Similarity.chooseNBits(20000) === 11)
    assert(Similarity.chooseNBits(1) === 4, "minBits clamp")
    assert(Similarity.chooseNBits(16) === 4, "one bucket suffices → minBits")
    assert(Similarity.chooseNBits(10000000) === 16, "maxBits clamp")
    // exact power boundary: 4112 = 257 buckets needed → 9 bits (512)
    assert(Similarity.chooseNBits(4112) === 9)
    (1L to 100000L by 997L).foreach { n =>
      val b = Similarity.chooseNBits(n)
      val buckets = 1L << b
      assert(b >= 4 && b <= 16)
      if (b > 4 && b < 16) {
        assert(buckets * 16 >= n, s"n=$n: 2^$b buckets under-cover")
        assert((buckets / 2) * 16 < n, s"n=$n: $b bits is one more than needed")
      }
    }
  }

  test("column-side width derivation agrees with chooseNBits") {
    val b = Similarity.governedBuckets(corpus, "vec_id", "embedding",
      targetOccupancy = 16, minBits = 4, maxBits = 16, dims = 64)
    val want = Similarity.chooseNBits(corpus.count())
    val lens = b.select(length(col("bucket"))).distinct().as[Int].collect()
    assert(lens.toSeq === Seq(want))
  }

  test("governed pairs: planted near-dup survives, degenerate bucket dropped") {
    for (multiProbe <- Seq(true, false)) {
      val pairs = Similarity.governedCosinePairs(corpus, "vec_id", "embedding",
          0.9, multiProbe = multiProbe)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((9001L, 9002L)),
        s"multiProbe=$multiProbe: the cap must never drop a true near-dup " +
          "in an ordinary bucket")
      assert(!pairs.exists(p => isDeg(p._1) && isDeg(p._2)),
        s"multiProbe=$multiProbe: degenerate-bucket pairs must be capped " +
          "(44,850 template pairs otherwise)")
    }
  }

  test("governed knn: planted pair mutual top-1, lists well-formed, capped queries still probe") {
    val graph = Similarity.governedKnn(corpus, corpus, "vec_id", "embedding", k = 3)
      .select($"qid", $"rank".cast("long"), $"nid").as[(Long, Long, Long)]
      .collect()
    val top1 = graph.filter(_._2 == 1L).map(g => g._1 -> g._3).toMap
    assert(top1(9001L) === 9002L && top1(9002L) === 9001L)
    graph.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length), s"ranks of $q")
      assert(!rows.exists(_._3 == q), s"self edge at $q")
    }
    // no degenerate vector serves as a CANDIDATE (its bucket is
    // dropped from the index side)...
    assert(!graph.exists(g => isDeg(g._3)))
    // ...but degenerate-bucket QUERIES still probe their Hamming-1
    // neighborhood (the query side is never capped)
    assert(graph.exists(g => isDeg(g._1)),
      "queries living in a dropped bucket must still get neighbors")
  }
}
