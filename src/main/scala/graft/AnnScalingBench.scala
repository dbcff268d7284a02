package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the ANN/IVF path (SURVEY.md §8h —
  * companion to DedupScalingBench): full IVF pipeline — deterministic
  * sampled k-means with corpus-DERIVED k = max(16, ceil(n/512)),
  * full-corpus cell assignment, nprobe top-k search for a fixed
  * 64-query set — on 1×–16× the sf0.1 embeddings table.
  *
  * Replication: ids remapped into disjoint ranges; each copy's
  * vectors shifted by a small copy-specific deterministic offset per
  * dimension, so copies occupy nearby-but-distinct regions (naive
  * exact replication would hand k-means degenerate coincident points
  * and measure a pathology). The pipeline's work model: centroid
  * learning is sample-bounded, assignment is one pass × k-term argmin
  * (broadcast centroid table once k is large), search probes
  * nprobe/k of the corpus — so runtime should grow near-linearly
  * while derived k grows with n.
  */
object AnnScalingBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = "/root/repo/target/scratch/annscale"
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    base.count() // warm IO/codegen

    val results = Seq(1, 2, 4, 8, 16).map { copies =>
      val perCopy = (0 until copies).map { c =>
        base.withColumn("vec_id", col("vec_id") + lit(c.toLong * 10000000L))
          .withColumn("embedding",
            transform(col("embedding"), (x, i) =>
              x + lit(c * 0.37f) * cos(i.cast("double") + lit(c)).cast("float")))
      }
      val path = s"$scratch/emb_$copies"
      perCopy.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
      val vecs = spark.read.parquet(path)
      val n = vecs.count()
      val k = math.max(16, math.ceil(n / 512.0).toInt)

      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val cents = IvfIndex.learnCentroids(vecs, "vec_id", "embedding",
          k = k, iters = 2, dims = 64,
          // negative = the SHIPPED learning-set governance (r16,
          // k-aware base)
          sampleRate = -1.0)
        val res = IvfIndex.ivfKnn(vecs, vecs.filter(col("vec_id") < 64),
          "vec_id", "embedding", k = 5, cents, nprobe = 2)
        res.count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(1)
      println(f"[annscale] copies=$copies%2d vecs=$n%7d k=$k%4d " +
        f"pipeline=$med%6.2fs vecs_per_s=${n / med}%9.0f")
      (copies, n, k, med)
    }
    println("[annscale] copies | vecs | k | pipeline s | vecs/s")
    results.foreach { case (c, n, k, t) =>
      println(f"[annscale] $c%6d | $n%6d | $k%4d | $t%10.2f | ${n / t}%7.0f")
    }

    // ---------------------------------------------------------------
    // Hierarchical (two-level) arm, r17 — the escape hatch past flat
    // assignment's per-row k-FLOP cost: at a k where the flat
    // NearestCell loop measurably degrades, assign the SAME fine
    // cells via coarse-route + routed argmin (kc + kf terms per row
    // instead of kc·kf). Two-level routing is approximate (nearest-
    // in-nearest-coarse ≠ global nearest) — the agreement fraction is
    // printed next to the walls so the trade is never silent.
    // ---------------------------------------------------------------
    val hn = sys.env.get("SPARK_GRAFT_HIERN").map(_.toLong).getOrElse(262144L)
    // CLUSTERED fixture (512 direction clusters + 20% jitter): real
    // embedding corpora cluster — that structure is what the coarse
    // router exploits. Uniform-random vectors are the k-means
    // pathology (no structure to route; a first cut of this arm
    // measured 48% agreement on them — a statement about the data,
    // not the index).
    val hv = spark.range(hn).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "j -> CAST(0.8 * sin((pmod(id, 512) * 64 + j) * 1.7) + " +
        "0.2 * (pmod(xxhash64(id, j), 100000) / 100000.0 - 0.5) AS FLOAT))")
        .as("embedding"))
    val hPath = s"$scratch/hier_$hn"
    hv.write.mode("overwrite").parquet(hPath)
    val hdf = spark.read.parquet(hPath)
    hdf.count()
    val tL = System.nanoTime()
    val model = operators.HierarchicalIvf.learn(hdf, "vec_id", "embedding",
      kCoarse = 64, kFinePerCell = 64, iters = 2)
    val learnS = (System.nanoTime() - tL) / 1e9
    val kTot = model.fineCount
    val hbase = hdf.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    def med3(f: => Long): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    val flatT = med3(hbase.select(col("vec_id"),
      graft.functions.NearestCell(col("v"), model.flatFine).as("cid"))
      .agg(org.apache.spark.sql.functions.sum(col("cid"))).head().getLong(0))
    val hierT = med3(operators.HierarchicalIvf
      .assignCells(hbase, "vec_id", "v", model)
      .agg(org.apache.spark.sql.functions.sum(col("cid"))).head().getLong(0))
    val agree = {
      val h = operators.HierarchicalIvf.assignCells(hbase, "vec_id", "v", model)
        .select(col("vec_id"), col("cid").as("hcid"))
      val f = hbase.select(col("vec_id"),
        graft.functions.NearestCell(col("v"), model.flatFine).as("fcid"))
      val tot = h.join(f, "vec_id")
      tot.filter(col("hcid") === col("fcid")).count().toDouble / hn
    }
    println(f"[annscale] hier: n=$hn%8d cells=$kTot%5d (64×64) " +
      f"learn=$learnS%6.1fs flat_assign=$flatT%7.2fs " +
      f"two_level_assign=$hierT%6.2fs speedup=${flatT / hierT}%5.1f× " +
      f"agreement=${agree * 100}%5.1f%%")
    spark.stop()
  }
}
