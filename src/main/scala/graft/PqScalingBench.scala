package graft

import graft.operators.{IvfIndex, ProductQuantizer, SemanticDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the composed PQ serving index
  * (SURVEY.md §8i — companion to AnnScalingBench): the s8 pipeline
  * split into its three production stages, each with its own scale
  * model, on 1×–64× the sf0.1 embeddings table (the 64× point crosses
  * the 32,768-vector learning-governance base, so the learn stage's
  * flattening is measured, not asserted):
  *
  *   1. LEARN — IVF centroids (corpus-derived k = max(16,
  *      ceil(n/512))) + m=4 PQ codebooks (FIXED k=16 per subspace:
  *      codebook size is a property of the code width, not the
  *      corpus), both on a bounded hash-sample — learning cost must
  *      flatten as n grows past the sample size.
  *   2. BUILD — the one data-proportional pass: encode every vector
  *      to (cell, 4 codes) and WRITE the coded table (the index a
  *      serving tier reads); a narrow map, so docs/s should hold
  *      flat past the job floor.
  *   3. SEARCH — the fixed 64-query set probes 2 of k cells of the
  *      CODED table and reranks by ADC; with cell size pinned by the
  *      derived k, per-query work should stay roughly constant as
  *      the corpus grows.
  *
  * Replication matches AnnScalingBench: ids remapped into disjoint
  * ranges, vectors shifted by a copy-specific deterministic offset so
  * k-means sees nearby-but-distinct regions.
  */
object PqScalingBench {

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

    val scratch = "/root/repo/target/scratch/pqscale"
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    base.count() // warm IO/codegen

    def toD(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.functions.VectorFunctions.toDouble(c)

    // 64× = 128k vectors: past the 32,768-vector governance base, so
    // the run SHOWS the learning-set bound engaging (rate 1/4 there;
    // 1.0 at every smaller point)
    val results = Seq(1, 4, 16, 64).map { copies =>
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
      val k = SemanticDedup.adaptiveK(n)
      // the SHIPPED learning-set governance (r16, k-aware base) —
      // the bench measures the discipline the entries actually run,
      // not a bench-local rate (negative = resolve inside the learner)
      val sr = -1.0

      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val cents = IvfIndex.learnCentroids(vecs, "vec_id", "embedding",
          k = k, iters = 2, dims = 64, sampleRate = sr)
        val books = ProductQuantizer.learnCodebooks(vecs, "vec_id", "embedding",
          m = 4, dims = 64, k = 16, iters = 2, sampleRate = sr)
        val t1 = System.nanoTime()
        val codedPath = s"$scratch/coded_$copies"
        ProductQuantizer.encode(
            vecs.withColumn("cid",
              IvfIndex.nearestCid(toD(col("embedding")), cents)),
            "vec_id", "embedding", books, dims = 64, keep = Seq("cid"))
          .write.mode("overwrite").parquet(codedPath)
        val t2 = System.nanoTime()
        val coded = spark.read.parquet(codedPath)
          .withColumnRenamed("vec_id", "nid")
        val q = vecs.select(col("vec_id").as("qid"), toD(col("embedding")).as("qv"))
          .filter(col("qid") < 64)
          .withColumn("cid", explode(IvfIndex.probeCids(col("qv"), cents, 2)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
        coded.join(broadcast(q), Seq("cid"))
          .filter(col("nid") =!= col("qid"))
          .withColumn("dist", ProductQuantizer.adcDist2(col("qv"), books,
            (1 to 4).map(j => col(s"code_$j")), dims = 64))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def med(f: ((Double, Double, Double)) => Double) = runs.map(f).sorted.apply(1)
      val (tl, te, ts) = (med(_._1), med(_._2), med(_._3))
      println(f"[pqscale] copies=$copies%2d vecs=$n%7d k=$k%4d " +
        f"learn=$tl%6.2fs build=$te%6.2fs search=$ts%6.2fs " +
        f"build_vecs_per_s=${n / te}%9.0f")
      (copies, n, k, tl, te, ts)
    }
    println("[pqscale] copies | vecs | k | learn s | build s | search s | build vecs/s")
    results.foreach { case (c, n, k, tl, te, ts) =>
      println(f"[pqscale] $c%6d | $n%6d | $k%4d | $tl%7.2f | $te%7.2f | $ts%8.2f | ${n / te}%7.0f")
    }
    spark.stop()
  }
}
