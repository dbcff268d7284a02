package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the governed SRP k-NN kernel
  * (SURVEY.md §8 — companion to PrefixScalingBench/GraphScalingBench):
  * the r15 sweep measured the FIXED-8-bit k-NN graph at 45× wall for
  * 10× vectors — per-bucket occupancy ~N/256, so within-bucket
  * candidate pairs grow quadratically. `Similarity.governedKnn`
  * derives the hash width from the corpus count (occupancy pinned at
  * the target) and drops degenerate oversized buckets, so candidate
  * volume is ~(nbits+2)·N·occupancy — linear in N times a log-width
  * factor. This bench MEASURES both kernels on the same frames:
  *
  *   - corpus = deterministic pseudo-random vectors (95%) plus one
  *     DUPLICATED template direction (5% of rows — the degenerate
  *     mass a fixed-width kernel reranks quadratically);
  *   - governed at 1×/2×/4×/8×: growth per doubling must stay ≈2×
  *     (linear · log-width);
  *   - ungoverned fixed-8-bit at 1×/2×/4× only (its 8× point is the
  *     measured quadratic blow-up this kernel exists to avoid —
  *     capped for bench wall time, growth already evident at 4×);
  *   - the artifact-SERVED path (r16): build the governed index once,
  *     probe a fixed 64-query panel — serve wall must stay ~flat at
  *     1×→8× corpus (occupancy is cap-bounded by the build-time
  *     width, so per-query work does not grow with N).
  *
  * Output-row counts are reported alongside wall so a growth claim
  * can never hide behind emptier results.
  */
object SimilarityScalingBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val scratch = "/root/repo/target/scratch/simscale"
    val baseN = 25000L

    def time(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val out = f
        ((System.nanoTime() - t0) / 1e9, out)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }

    // deterministic pseudo-random background (xxhash64-mixed — near-
    // orthogonal) + a 5% duplicated template direction (ids offset
    // into their own range)
    def gen(n: Long): DataFrame = {
      val bg = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), " +
          "j -> pmod(xxhash64(id, j), 100000) / 100000.0 - 0.5)")
          .as("embedding"))
      val deg = spark.range(n / 20).select(
        (col("id") + 2000000000L).as("vec_id"),
        expr("transform(sequence(0, 63), " +
          "j -> pmod(xxhash64(-7, j), 100000) / 100000.0 - 0.5)")
          .as("embedding"))
      bg.unionByName(deg)
    }

    def staged(mult: Int): DataFrame = {
      val path = s"$scratch/v_$mult"
      gen(baseN * mult).write.mode("overwrite").parquet(path)
      val df = spark.read.parquet(path)
      df.count()
      df
    }

    // SPARK_GRAFT_SAT_ONLY=1: skip the standard arms (the saturation
    // arm below is a multi-minute one-off; re-running the 8-point
    // sweep around it would triple the wall for no new number).
    // satOnly IMPLIES the saturation arm (r17 ADVICE: SAT_ONLY
    // without SAT used to skip every arm and exit having measured
    // nothing, silently).
    val satOnly = sys.env.get("SPARK_GRAFT_SAT_ONLY").exists(_ != "0")
    val satArm = satOnly || sys.env.get("SPARK_GRAFT_SAT").exists(_ != "0")
    if (!satOnly) {
    val gRows = Seq(1, 2, 4, 8).map { mult =>
      val df = staged(mult)
      val n = df.count()
      val nbits = operators.Similarity.chooseNBits(n)
      val (s, out) = time(
        operators.Similarity.governedKnn(df, df, "vec_id", "embedding", k = 3)
          .count())
      println(f"[simscale] governed   mult=$mult%2d vectors=$n%8d " +
        f"nbits=$nbits%2d wall=$s%7.2fs rows=$out%9d")
      (mult, s)
    }
    val fRows = Seq(1, 2, 4).map { mult =>
      val df = staged(mult)
      val n = df.count()
      val (s, out) = time(
        operators.Similarity.bucketedKnn(df, df, "vec_id", "embedding",
          k = 3, nBits = 8).count())
      println(f"[simscale] fixed8bit  mult=$mult%2d vectors=$n%8d " +
        f"nbits= 8 wall=$s%7.2fs rows=$out%9d")
      (mult, s)
    }
    // the artifact-SERVED path (s2's shape, r16): the governed index
    // is built once per corpus version; what a serving tier pays per
    // query run is the PROBE of a fixed panel against the standing
    // bucket table. With occupancy pinned by the build-time width,
    // serve wall should stay ~flat while the corpus grows 8×.
    val sRows = Seq(1, 2, 4, 8).map { mult =>
      val df = staged(mult)
      val n = df.count()
      val idxPath = s"$scratch/idx_$mult"
      val tb = System.nanoTime()
      operators.Similarity.srpIndexGoverned(df, "vec_id", "embedding")
        .write.mode("overwrite").parquet(idxPath)
      val build = (System.nanoTime() - tb) / 1e9
      val idx = spark.read.parquet(idxPath)
      val panel = df.filter(col("vec_id") < 64)
      val (serve, out) = time(
        operators.Similarity.governedKnnFromIndex(idx, panel,
          "vec_id", "embedding", k = 5).count())
      println(f"[simscale] served     mult=$mult%2d vectors=$n%8d " +
        f"build=$build%7.2fs serve=$serve%7.2fs rows=$out%6d")
      (mult, serve)
    }
    val gSteps = gRows.zip(gRows.tail).map { case ((pm, a), (m, b)) =>
      f"${b / a}%.2f× at $pm×→$m×"
    }
    println(s"[simscale] governed growth per 2×: ${gSteps.mkString(", ")} " +
      s"(target ≤ ~2×, linear·log)")
    println(f"[simscale] fixed-8-bit 1×→4× growth: " +
      f"${fRows.last._2 / fRows.head._2}%.1f× (quadratic within-bucket — " +
      "the r15 sweep's 45×-at-10× shape)")
    println(f"[simscale] served-panel growth 1×→8×: " +
      f"${sRows.last._2 / sRows.head._2}%.2f× for 8× corpus " +
      "(bounded occupancy — per-query work is cap-bounded, not N-bounded)")
    }

    // ---------------------------------------------------------------
    // Saturation arm (r17, SPARK_GRAFT_SAT=1): the width-ceiling
    // contract MEASURED past the old 16-bit saturation point. At
    // SPARK_GRAFT_SATN vectors (default 10M — avg 16-bit occupancy
    // 152 > the 128 cap), the r16 maxBits=16 arm's dropped-mass
    // census explodes (most of the corpus silently excluded from
    // pair reporting) while the shipped 24-bit width keeps occupancy
    // at the target and drops only the planted degenerate mass;
    // governed wall stays ~linear (quarter-scale point printed
    // alongside). Single-pass timings — a multi-minute one-off
    // measurement, not a medians sweep.
    // ---------------------------------------------------------------
    if (satArm) {
      val satN = sys.env.get("SPARK_GRAFT_SATN").map(_.toLong)
        .getOrElse(10000000L)
      def once(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = f
        ((System.nanoTime() - t0) / 1e9, out)
      }
      for (n <- Seq(satN / 4, satN)) {
        val path = s"$scratch/sat_$n"
        gen(n).write.mode("overwrite").parquet(path)
        val df = spark.read.parquet(path)
        df.count()
        for (mb <- Seq(24, 16)) {
          val census = operators.Similarity.governedDroppedCensus(
              df, "vec_id", "embedding", maxBits = mb)
            .head()
          val (nTot, nDrop, nbits) = (census.getLong(0), census.getLong(1),
            census.getInt(3))
          val (s, pairs) = once(operators.Similarity.governedCosinePairs(
            df, "vec_id", "embedding", 0.42, multiProbe = false,
            maxBits = mb).count())
          println(f"[simscale] sat maxBits=$mb%2d vectors=$nTot%9d " +
            f"nbits=$nbits%2d dropped=$nDrop%9d " +
            f"(${100.0 * nDrop / nTot}%5.1f%%) pairs_wall=$s%7.1fs " +
            f"pairs=$pairs%9d")
        }
        // the PAST-268M handoff arm (r18, r17 judge stretch #7): the
        // same pair semantics routed through LEARNED two-level cells
        // — the bucketing whose cell count grows with the corpus at a
        // pinned target size, i.e. what replaces the SRP pair kernels
        // past occ·2^maxBits. Cell count ~ n/512 split kc×kf; wall
        // and pair count print NEXT TO the governed kernel's so the
        // handoff is a measured continuation, not a doc claim.
        {
          val cells = math.max(16L, n / 512L).toInt
          val kc = math.min(64, math.max(1, math.sqrt(cells.toDouble).toInt))
          val kf = (cells + kc - 1) / kc
          val tm = System.nanoTime()
          val model = operators.HierarchicalIvf.learn(df, "vec_id",
            "embedding", kCoarse = kc, kFinePerCell = kf, iters = 2)
          val learnS = (System.nanoTime() - tm) / 1e9
          val (s, pairs) = once(operators.HierarchicalIvf.cellCosinePairs(
            df, "vec_id", "embedding", 0.42, model).count())
          println(f"[simscale] sat hier-cells vectors=$n%9d " +
            f"cells=${model.fineCount}%6d (kc=$kc kf=$kf) " +
            f"learn=$learnS%6.1fs pairs_wall=$s%7.1fs pairs=$pairs%9d")
        }
      }
    }
    spark.stop()
  }
}
