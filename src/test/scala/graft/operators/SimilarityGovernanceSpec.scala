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
    // r17: the default ceiling is 24 bits — 10M vectors (where the
    // r16 16-bit default had long saturated) now gets a genuine
    // occupancy-16 width; the clamp engages ~268M vectors
    assert(Similarity.chooseNBits(10000000) === 20, "past the old 16-bit ceiling")
    assert(Similarity.chooseNBits(10000000, maxBits = 16) === 16,
      "the r16 ceiling, for the saturation bench arm")
    assert(Similarity.chooseNBits(300000000) === 24, "maxBits clamp (24)")
    assert(Similarity.chooseNBits(1L << 40) === 24, "clamp holds at any n")
    // exact power boundary: 4112 = 257 buckets needed → 9 bits (512)
    assert(Similarity.chooseNBits(4112) === 9)
    (1L to 100000L by 997L).foreach { n =>
      val b = Similarity.chooseNBits(n)
      val buckets = 1L << b
      assert(b >= 4 && b <= 24)
      if (b > 4 && b < 24) {
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

  test("governed serving index: width stamped, degenerate buckets dropped at build") {
    val idx = Similarity.srpIndexGoverned(corpus, "vec_id", "embedding")
    val want = Similarity.chooseNBits(corpus.count())
    val widths = idx.select($"nbits").distinct().as[Int].collect()
    assert(widths.toSeq === Seq(want),
      "the artifact must carry exactly the count-derived width")
    val lens = idx.select(length($"bucket")).distinct().as[Int].collect()
    assert(lens.toSeq === Seq(want), "bucket ids truncated to the width")
    assert(idx.filter($"nid" >= 5000L && $"nid" < 5300L).count() === 0L,
      "the 300-copy template direction must be dropped at build time")
    val occ = idx.groupBy($"bucket").count().agg(max($"count")).as[Long].head()
    assert(occ <= 128L, s"home-bucket occupancy $occ above the cap survived")
  }

  test("serving from the governed index ≡ the in-plan governed knn") {
    val q = corpus.filter($"vec_id" < 50L || $"vec_id" >= 9000L)
    val served = Similarity.governedKnnFromIndex(
        Similarity.srpIndexGoverned(corpus, "vec_id", "embedding"),
        q, "vec_id", "embedding", k = 3)
      .select($"qid", $"rank".cast("long"), $"nid").as[(Long, Long, Long)]
      .collect().toSet
    val inPlan = Similarity.governedKnn(corpus, q, "vec_id", "embedding", k = 3)
      .select($"qid", $"rank".cast("long"), $"nid").as[(Long, Long, Long)]
      .collect().toSet
    assert(served === inPlan,
      "the artifact-served path must reproduce the in-plan kernel row-for-row")
    assert(served.exists(g => g._1 == 9001L && g._2 == 1L && g._3 == 9002L),
      "planted near-dup is the served top-1")
  }

  test("governed learn rate: full corpus below base, bounded power-of-two sample above") {
    import IvfIndex.governedLearnRate
    assert(governedLearnRate(0) === 1.0)
    assert(governedLearnRate(32767) === 1.0, "below base: learn on everything")
    assert(governedLearnRate(32768) === 0.5)
    assert(governedLearnRate(65535) === 0.5)
    assert(governedLearnRate(200000) === 0.125, "the sf10 embeddings point")
    assert(governedLearnRate(2000000) === 1.0 / 64)
    // expected sample size stays in [base/2, base) up to the rate
    // clamp (2^-24, reached at n = 2^39 ≈ 5.5e11 vectors)
    (32768L until (1L << 39) by ((1L << 39) / 97)).foreach { n =>
      val s = n * governedLearnRate(n)
      assert(s >= 16384.0 - 1 && s < 32768.0,
        s"n=$n: expected learning-set size $s outside [base/2, base)")
    }
    assert(governedLearnRate(1L << 45) === 1.0 / (1 << 24), "clamp floor")
    // every governed rate is an exact power of two, so the hex
    // threshold both engines compare against is exact
    Seq(32768L, 100000L, 1 << 22, 1L << 33).foreach { n =>
      val r = governedLearnRate(n)
      val bits = math.round(math.log(1 / r) / math.log(2)).toInt
      assert(r === 1.0 / (1L << bits))
      assert(Sampling.hexThreshold(r) ===
        f"${(4294967296L >> bits)}%08x", s"inexact threshold at n=$n")
    }
  }

  test("k-aware base keeps the adaptive cell count seedable at any scale") {
    import IvfIndex.{governedLearnBase, governedLearnRate}
    // a FIXED base caps seedable centroids at ~32k — an adaptive
    // k = n/512 outgrows it past n ≈ 16.7M and cell count would stop
    // growing (the within-cell bound reverts to quadratic); the
    // k-aware base keeps the sample in [16·k, 32·k) instead
    Seq(524288L, 8388608L, 16777216L, 1L << 28, 1L << 32).foreach { n =>
      val k = SemanticDedup.adaptiveK(n)
      val s = n * governedLearnRate(n, governedLearnBase(k))
      assert(s >= 16.0 * k - 1, s"n=$n k=$k: sample $s under 16 points/cell")
      assert(s < math.max(32768.0, 32.0 * k) + 1,
        s"n=$n k=$k: sample $s past the base bound")
    }
    assert(governedLearnBase(16) === 32768L,
      "fixed small k: the base (and every existing result) is unchanged")
    assert(governedLearnBase(4096) === 131072L)
  }

  test("dropped-mass census: degenerate template mass counted, nothing else") {
    val out = Similarity.governedDroppedCensus(corpus, "vec_id", "embedding")
      .as[(Long, Long, Long, Int, Double)].head()
    val (nTotal, nDropped, bucketsDropped, nbits, frac) = out
    assert(nTotal === corpus.count())
    // the 300-copy template direction plus the handful of background
    // vectors that happen to share its home bucket at this width —
    // the census counts every occupant of a dropped bucket, exactly
    // what the kernels exclude
    assert(nDropped >= 300L && nDropped <= 330L,
      s"dropped mass $nDropped should be the template bucket's occupants")
    assert(bucketsDropped === 1L)
    assert(nbits === Similarity.chooseNBits(nTotal))
    assert(math.abs(frac - nDropped.toDouble / nTotal) < 1e-12)
  }

  test("serving width integrity: mixed-width index fails loudly, empty serves empty") {
    val q = corpus.filter($"vec_id" < 4L)
    def chainHas(t: Throwable, needle: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains(needle)))
    // mixed widths — two concatenated corpus versions: the one state
    // the old limit(1) read served at an ARBITRARY width (r16 ADVICE)
    val idx = Similarity.srpIndexGoverned(corpus, "vec_id", "embedding")
    val mixed = idx.unionByName(idx.withColumn("nbits", $"nbits" + 1))
    val e = intercept[Exception] {
      Similarity.governedKnnFromIndex(mixed, q, "vec_id", "embedding", k = 3)
        .collect()
    }
    assert(chainHas(e, "exactly one nbits"),
      s"mixed-width index must fail the width check, got: ${e.getMessage}")
    // an EMPTY index serves the EMPTY result, never an
    // arbitrary-width answer — BOTH empties: the statically-empty
    // plan (optimizer collapses it; AQE skips the probe side), and
    // the RUNTIME-empty artifact (every bucket over the cap at
    // build — a global agg still produces one row there, so the
    // check must pass size 0 through as a null width, not assert)
    val emptyStatic = Similarity.srpIndexGoverned(corpus, "vec_id", "embedding")
      .filter(lit(false))
    assert(Similarity.governedKnnFromIndex(emptyStatic, q, "vec_id",
      "embedding", k = 3).collect().isEmpty)
    // degenerate-only corpus: 300 copies of one direction → one home
    // bucket over the 128 cap → the built index is empty at RUNTIME
    val degOnly = (5000L until 5300L).map(i => (i, hashVec(999999L)))
      .toDF("vec_id", "embedding")
    val emptyRuntime = Similarity.srpIndexGoverned(degOnly, "vec_id", "embedding")
    assert(emptyRuntime.count() === 0L, "fixture must drop every bucket")
    assert(Similarity.governedKnnFromIndex(emptyRuntime,
      degOnly.limit(3), "vec_id", "embedding", k = 3).collect().isEmpty)
    // and the O(1) unchecked read (width validated at load time)
    // serves identically on a healthy index
    val ok = Similarity.governedKnnFromIndex(idx, q, "vec_id", "embedding",
      k = 3, checkWidth = false).collect()
    val okChecked = Similarity.governedKnnFromIndex(idx, q, "vec_id",
      "embedding", k = 3).collect()
    assert(ok.toSet === okChecked.toSet)
  }

  test("governed cross pairs ≡ pinned-width kernel at the derived width") {
    // the dynamic-width Hamming-≤2 probe HOFs against the literal
    // per-position expansion: same corpus count → same width → the
    // two kernels must agree pair-for-pair (this is also the batch ⇄
    // streaming-gate contract: the gate pins the width the batch
    // kernel derives)
    val panel = corpus.filter($"vec_id" % 10 === 0)
    val w = Similarity.chooseNBits(corpus.count())
    val governed = Similarity.governedCrossPairs(corpus, panel,
        "vec_id", "embedding", 0.9)
      .select($"corpus_id", $"bench_id").as[(Long, Long)].collect().toSet
    val pinned = Similarity.multiProbeCrossPairs(corpus, panel,
        "vec_id", "embedding", 0.9, nBits = w)
      .select($"corpus_id", $"bench_id").as[(Long, Long)].collect().toSet
    assert(governed === pinned,
      s"only-governed=${governed -- pinned} only-pinned=${pinned -- governed}")
    assert(governed.nonEmpty,
      "fixture must exercise the kernel non-vacuously (template collisions)")
  }

  test("sampled learning: small-base governed override ≡ the explicit rate") {
    // the j ≥ 1 branch at driver scale (r16 ADVICE — the branch CI
    // never ran): base 64 forces a genuine hash-sampled Lloyd, which
    // must equal learnCentroids at the identical explicit rate
    val n = corpus.count()
    val rate = IvfIndex.governedLearnRate(n, 64L)
    assert(rate < 1.0, "fixture must actually sample")
    val gov = IvfIndex.learnCentroids(corpus, "vec_id", "embedding",
      k = 8, iters = 2, sampleRate = -1.0, learnBase = 64L)
    val explicit = IvfIndex.learnCentroids(corpus, "vec_id", "embedding",
      k = 8, iters = 2, sampleRate = rate)
    assert(gov === explicit)
    // and the PRODUCTION default (k-aware base) is untouched by the
    // override plumbing: below the base, the full corpus learns
    val full = IvfIndex.learnCentroids(corpus, "vec_id", "embedding",
      k = 8, iters = 2, sampleRate = -1.0)
    val unsampled = IvfIndex.learnCentroids(corpus, "vec_id", "embedding",
      k = 8, iters = 2, sampleRate = 1.0)
    assert(full === unsampled)
  }

  test("MIPS norm-concentration limit: wide widths empty the probes, the occupancy knob restores them") {
    // the 2M-vector sweep's s10 finding as a driver-scale spec: a
    // norm-CONCENTRATED corpus (similar norms ≪ the max) parks every
    // augmented corpus vector near the pole while queries bucket at
    // the equator — at a WIDE width the Hamming-≤1 probe set goes
    // empty; the documented mitigation (raise targetOccupancy →
    // fewer, fuller buckets) must actually restore serving
    val dirs = (0L until 999L).map(i => (i, hashVec(i).map(_ * 0.5f)))
    val big = Seq((2000L, hashVec(4L).map(_ * 2.0f))) // the max-norm outlier
    val c = (dirs ++ big).toDF("vec_id", "embedding")
    val q = c.filter($"vec_id" < 4L)
    // force the wide-width regime (minBits floor plays the role the
    // corpus count plays at 10⁶+ vectors — same bucketing math)
    val wide = Similarity.mipsIndexGoverned(c, "vec_id", "embedding",
      minBits = 20)
    assert(Similarity.governedMipsFromIndex(wide, q, "vec_id", "embedding",
      k = 3).collect().isEmpty,
      "the pole/equator gap must empty wide-width probes on this corpus")
    // the knob: higher target occupancy → narrower width → recall back
    val occ = Similarity.mipsIndexGoverned(c, "vec_id", "embedding",
      targetOccupancy = 256)
    val res = Similarity.governedMipsFromIndex(occ, q, "vec_id", "embedding",
        k = 3).select($"qid", $"rank".cast("long"), $"nid")
      .as[(Long, Long, Long)].collect()
    assert(res.nonEmpty, "the occupancy knob must restore serving")
    res.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length),
        s"ranks of $qid")
    }
  }

  test("governed MIPS index: norm ordering preserved, width stamped") {
    // collinear plants: cosine ties at 1.0, the inner product must
    // order by norm THROUGH the governed artifact path
    val dirV = (0 until 64).map(i => math.sin(i * 1.3).toFloat)
    def scaled(s: Float) = dirV.map(_ * s)
    val plants = Seq((9101L, scaled(1f)), (9102L, scaled(2f)), (9103L, scaled(3f)))
    val c = ((0L until 700L).map(i => (i, hashVec(i))) ++ plants)
      .toDF("vec_id", "embedding")
    val idx = Similarity.mipsIndexGoverned(c, "vec_id", "embedding")
    val widths = idx.select($"nbits").distinct().as[Int].collect()
    assert(widths.toSeq === Seq(Similarity.chooseNBits(c.count())))
    val query = Seq((9999L, scaled(1f))).toDF("vec_id", "embedding")
    val res = Similarity.governedMipsFromIndex(idx, query,
        "vec_id", "embedding", k = 3)
      .orderBy($"rank").select($"nid", $"ip").as[(Long, Double)].collect()
    // the max-norm plant shares the query's augmented bucket exactly
    // ([x/M ; 0] and [q ; 0] are positively proportional) and its
    // inner product dwarfs any background candidate — MIPS's whole
    // point is surfacing the BIG collinear vector first. (The smaller
    // plants live in other buckets by construction: the augmentation
    // separates norms — that is the reduction working, not a miss.)
    assert(res.head._1 === 9103L,
      s"governed MIPS top-1 must be the max-norm plant, got ${res.toSeq}")
    assert(res.map(_._2).toSeq === res.map(_._2).sortBy(-_).toSeq,
      "served inner products must descend with rank")
  }
}
