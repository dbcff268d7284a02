package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.4).
  *
  * `df` holds (idCol, vecCol: array<float>). Vectors are cast to
  * double once; all math is expression folds (VectorFunctions).
  */
object Similarity {

  /** Brute-force cosine top-k for a query set.
    *
    * Scale design: the query side is broadcast (queries ≪ corpus by
    * assumption), so the corpus streams map-side with NO shuffle of
    * the corpus; the only shuffle is the per-query top-k window over
    * corpus×queries rows. For very large corpora the window is
    * replaced by the bucketed path below.
    */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Exact cosine near-dup pairs above a threshold — the all-pairs
    * verification KERNEL. Deliberately quadratic: call it only on a
    * bucketed/bounded candidate set (multiProbeCosinePairs /
    * bucketedCosinePairs are the shipped query shapes); as a
    * standalone whole-corpus query this is a cross join that dies at
    * scale.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), toDouble(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), toDouble(col(vecCol)).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** The Hamming-≤1 probe set of an SRP bucket id: the bucket itself
    * plus each one-bit flip.
    */
  private def probeSet(bucket: Column, nBits: Int): Column =
    array_distinct(array(
      (Seq(bucket) ++ (0 until nBits).map { i =>
        concat(bucket.substr(lit(1), lit(i)),
          when(bucket.substr(i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
          bucket.substr(lit(i + 2), lit(nBits - i - 1)))
      }): _*))

  /** Multi-probe SRP near-dup pairs: exact cosine verification over
    * candidates whose SRP buckets are within Hamming distance 1 —
    * the scale-shaped form of whole-corpus `cosinePairs`, with higher
    * recall than single-bucket `bucketedCosinePairs`.
    *
    * One side keeps its HOME bucket; the other explodes into the
    * nBits+1 probe buckets. A pair within Hamming ≤ 1 matches on
    * exactly one probe row (the probe equal to the home bucket), so
    * every candidate arises once — no distinct pass. Shuffle
    * cardinality is (nBits+2)·N on the bucket key; pairwise work runs
    * only inside matched buckets. Never O(n²).
    */
  def multiProbeCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8, dims: Int = 64): DataFrame = {
    val b = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", srpBucket(col("v"), nBits, dims))
    val home = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val probes = b.select(col("id").as("id_b"), col("v").as("vb"),
      explode(probeSet(col("bucket"), nBits)).as("bucket"))
    home.join(probes, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SRP-bucketed near-dup pairs — the 100 TB form of `cosinePairs`:
    * candidates are pairs sharing an LSH bucket (one shuffle on the
    * bucket id), exact cosine verifies only inside buckets. Recall
    * trades against `nBits`; the deterministic planes make the whole
    * pipeline reproducible and SQL-replayable (d6 oracle).
    */
  def bucketedCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8, dims: Int = 64): DataFrame = {
    val b = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", srpBucket(col("v"), nBits, dims))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    // each vector lives in exactly one bucket → every pair arises once
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Bucketed ANN top-k (sign-random-projection LSH): corpus and
    * queries hash to `nBits`-bit buckets; exact rerank runs only
    * inside matching buckets. One shuffle on the bucket id — the
    * 100 TB path. Multi-probe: each query also probes the buckets at
    * Hamming distance 1 (flip one bit), trading `nBits`× candidate
    * volume for recall.
    */
  def bucketedKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 8, multiProbe: Boolean = true,
      dims: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), nBits, dims))
    val q0 = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), nBits, dims))
    val q =
      if (!multiProbe) q0
      else q0.select(col("qid"), col("qv"),
        explode(probeSet(col("bucket"), nBits)).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    c.join(q, Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }
}
