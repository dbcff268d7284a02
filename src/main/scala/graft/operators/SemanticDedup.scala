package graft.operators

import graft.functions.VectorFunctions.{cosine, toDouble}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup census — semantic dedup via learned k-means cells
  * (SURVEY.md §2.3 d13). SRP buckets (d5/d6) group by RANDOM
  * projections; SemDeDup groups by the corpus' own k-means cells, so
  * near-dups land together because they are semantically close, not
  * because a random hyperplane happened to agree.
  *
  * Per cell: exact pairwise cosine; a vector is DROPPED when a
  * lower-id neighbor above the threshold exists (deterministic,
  * order-free keep rule). Emits the per-cell census (sizes, dup
  * pairs, drops, max similarity) — non-vacuous on every cell even
  * when a corpus has few near-dups.
  *
  * Scale: the cell count k is DERIVED from the corpus size —
  * k = max(16, ceil(n / targetCellSize)) — so expected cell size
  * stays bounded as the corpus grows and the within-cell pairwise
  * work is N·cellSize, never N²/constant (a fixed k makes it
  * quadratic: N²/k). The derivation costs ONE count; centroid
  * learning is 2 distributed agg passes over the GOVERNED learning
  * sample (`IvfIndex.governedLearnRate` — the full corpus below
  * 32,768 vectors, a bounded power-of-two hash-sample above, so
  * Lloyd's cost stops growing with the corpus); assignment is a
  * narrow map at any k (centroid literals small, the codegen'd
  * NearestCell loop large); the only shuffle is the cell-id
  * self-join. The whole pipeline (count→k, seeding, Lloyd,
  * assignment, census) is deterministic and replays in the DuckDB
  * oracle (LlmQueries.d13SemanticDedupSql derives the same k in SQL).
  *
  * Pipeline order: EXACT duplicates always share a cell whatever k
  * (identical vectors tie to the same centroid), so SemDeDup assumes
  * exact dedup (d1) ran first — the standard curation order; its own
  * job is the NEAR-duplicates exact hashing cannot see. A corpus of
  * a million identical vectors is d1's problem, not a cell-split
  * problem.
  */
object SemanticDedup {

  /** Target expected cell size. 512 keeps per-cell pairwise work at
    * ~131k cosine ops per cell — small enough that a cell is one
    * task. Assignment switches representation with k (IvfIndex
    * .LiteralKMax): compiled centroid literals for small k, a
    * codegen’d reference-object argmin (functions.NearestCell) for
    * large k — same argmin either way.
    * The design ceiling is a centroid set too big to broadcast
    * (~10⁶ cells ≈ 5·10⁸ vectors at this cell size); beyond that a
    * corpus shards or a hierarchical (two-level) index takes over.
    */
  val DefaultTargetCellSize = 512L

  /** k = max(16, ceil(n / targetCellSize)) — the floor keeps tiny
    * corpora from degenerating to one cell; clamped to Int range so
    * an extreme n cannot wrap the conversion.
    */
  def adaptiveK(n: Long, targetCellSize: Long = DefaultTargetCellSize): Int = {
    require(targetCellSize > 0, "targetCellSize must be positive")
    math.min(Int.MaxValue.toLong,
      math.max(16L, (n + targetCellSize - 1) / targetCellSize)).toInt
  }

  /** Per-cell dedup census over `(idCol, vecCol)` rows: one row per
    * learned cell — (cid, n_vecs, n_dup_pairs, n_dropped, max_cos6).
    * `max_cos6` is −1.0 for singleton cells (a cross-engine NULL
    * would stringify differently in the compare harness).
    *
    * `learn` (k → centroids) lets a caller route through a
    * materialized index artifact (the d13 entry shares
    * CentroidArtifact with s3/s6 so one corpus learns its cells
    * once); the default learns in place with the same deterministic
    * recipe — identical centroids either way.
    */
  def census(e: DataFrame, idCol: String, vecCol: String, tau: Double,
      targetCellSize: Long = DefaultTargetCellSize,
      learn: Option[Int => Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val n = e.count()
    val k = adaptiveK(n, targetCellSize)
    // learning-set governance at the k-AWARE base (the adaptive k
    // must stay seedable from the sample); the count is already paid
    // for adaptiveK, so the rate is resolved here, not re-counted
    val cents = learn.map(_(k))
      .getOrElse(IvfIndex.learnCentroids(e, idCol, vecCol, k = k, iters = 2,
        sampleRate =
          IvfIndex.governedLearnRate(n, IvfIndex.governedLearnBase(k))))
    val vecs = e.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
    // one codegen'd NearestCell argmin at any k (zero shuffle; r20 —
    // the literal-vs-NearestCell switch collapsed, identical
    // assignment either way so the oracle replay holds)
    val v = vecs.withColumn("cid", IvfIndex.nearestCid(col("v"), cents))
    val a = v.select(col("cid"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = v.select(col("cid"), col("vec_id").as("id_b"), col("v").as("vb"))
    val pairs = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
    val stats = pairs.groupBy(col("cid")).agg(
      sum(when(col("sim") > tau, 1L).otherwise(0L)).as("n_dup_pairs"),
      countDistinct(when(col("sim") > tau, col("id_b"))).as("n_dropped"),
      round(max(col("sim")), 6).as("max_cos6"))
    v.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .join(stats, Seq("cid"), "left")
      // cast cid long (the oracle's row_number seeds are BIGINT)
      .select(col("cid").cast("long").as("cid"), col("n_vecs"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("max_cos6"), lit(-1.0)).as("max_cos6"))
      .orderBy(col("cid"))
  }
}
