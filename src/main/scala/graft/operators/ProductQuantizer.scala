package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ): compress each vector into m small
  * codes by splitting it into m contiguous subvectors and learning
  * an independent k-means codebook per subspace (SURVEY.md §2.4 s7).
  * PQ is THE storage layout for serving-scale vector search: m bytes
  * per vector (k ≤ 256) instead of 4·dims — a 100 TB float32
  * embedding table becomes ~1.5 TB of codes that fit the serving
  * tier, with distance computed against reconstructed (or
  * ADC-tabled) centroids. It sits between s4's scalar int8 census
  * (4× compression, no learning) and s3's IVF (cell routing, no
  * compression): IVF prunes WHERE to look, PQ shrinks WHAT is
  * stored.
  *
  * Learning reuses `IvfIndex.learnCentroids` per subspace — the
  * deterministic md5 seeding, sequential-Σ(v−c)² assignment, and
  * 6-decimal centroid rounding that make the learned index
  * engine-portable (the DuckDB oracle replays all m learnings from
  * first principles over sliced lists). m learnings = m × (one
  * small seed collect + `iters` distributed agg passes), each over
  * dims/m-sized slices, so total learning work ≈ one IVF learning;
  * at corpus scale learning runs on a deterministic hash-sample
  * (`sampleRate`) while encoding is the one full pass.
  *
  * Encoding is a pure narrow map: m literal-codebook argmins
  * (codegen'd — k ≤ LiteralKMax per subspace by construction) plus
  * a sequential reconstruction-error fold; no shuffle, no join,
  * embarrassingly parallel.
  */
object ProductQuantizer {

  /** One codebook per subspace: index j quantizes 1-based slice
    * [j·(dims/m)+1, (j+1)·(dims/m)] of the vector.
    */
  def learnCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, dims: Int, k: Int = 16, iters: Int = 2,
      sampleRate: Double = 1.0): Seq[Seq[(Int, Seq[Double])]] = {
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    require(k <= IvfIndex.LiteralKMax,
      s"PQ codebooks are literal-compiled; k=$k exceeds ${IvfIndex.LiteralKMax}")
    val sub = dims / m
    // governed rate resolved ONCE (one count) and shared by all m
    // sub-learnings — the subspaces slice the same rows; k-aware base
    // (a no-op at the PQ-code-width k=16, kept for rule uniformity)
    val rate =
      if (sampleRate < 0)
        IvfIndex.governedLearnRate(df.count(), IvfIndex.governedLearnBase(k))
      else sampleRate
    (0 until m).map { j =>
      val sliced = df.select(col(idCol),
        slice(toDouble(col(vecCol)), j * sub + 1, sub).as("subv"))
      IvfIndex.learnCentroids(sliced, idCol, "subv",
        k = k, iters = iters, dims = sub, sampleRate = rate)
    }
  }

  /** Squared reconstruction error of one subspace against its chosen
    * centroid, accumulated strictly left-to-right (oracle parity) —
    * the codegen'd [[graft.functions.CentroidErr2]] loop, spec-pinned
    * bit-identical to the literal when-chain + zip_with form it
    * replaces (r20: that form embedded k×sub literal doubles per use
    * and ran its zip_with interpreted twice per row per reference).
    */
  private def subErr2(subv: Column, cents: Seq[(Int, Seq[Double])], code: Column): Column =
    graft.functions.CentroidErr2(subv, code, cents)

  /** Encode every vector: (id, [keep...], code_1..code_m, mse6) where
    * code_j is the nearest centroid id in subspace j and mse6 the
    * 6-decimal whole-vector reconstruction MSE. Narrow map — zero
    * shuffles. `keep` carries extra input columns (e.g. an IVF cell
    * id) through to the coded table — the serving layout stores codes
    * NEXT TO their routing key, not joined onto it later.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      books: Seq[Seq[(Int, Seq[Double])]], dims: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val m = books.size
    val sub = dims / m
    val withSubs = (0 until m).foldLeft(
        df.select(col(idCol) +: keep.map(col) :+ toDouble(col(vecCol)).as("v"): _*)) {
      case (acc, j) =>
        val subv = slice(col("v"), j * sub + 1, sub)
        acc.withColumn(s"code_${j + 1}",
            IvfIndex.nearestCid(subv, books(j)).cast("long"))
          .withColumn(s"err2_${j + 1}",
            subErr2(subv, books(j), col(s"code_${j + 1}")))
    }
    val totErr = (1 to m).map(j => col(s"err2_$j")).reduce(_ + _)
    withSubs
      .withColumn("mse6", round(totErr / lit(dims.toDouble), 6))
      .select(col(idCol) +: keep.map(col) ++:
        (1 to m).map(j => col(s"code_$j")) :+ col("mse6"): _*)
  }

  /** Asymmetric distance (ADC): squared L2 between a full QUERY
    * vector and a corpus vector's PQ RECONSTRUCTION, computed from
    * the corpus side's m codes alone — Σ_j Σ_i (q_i − c_i)² against
    * the codebook centroid each code selects. This is the distance a
    * PQ serving index actually evaluates: the corpus floats are gone
    * (m bytes remain), only queries stay full-precision. Same
    * left-to-right fold as `subErr2`, so ADC(v, codes(v)) equals v's
    * own reconstruction error exactly (spec-pinned), and the whole
    * expression is a codegen'd narrow map.
    */
  def adcDist2(qv: Column, books: Seq[Seq[(Int, Seq[Double])]],
      codes: Seq[Column], dims: Int): Column = {
    require(codes.size == books.size, "one code column per codebook")
    val sub = dims / books.size
    books.indices.map { j =>
      subErr2(slice(qv, j * sub + 1, sub), books(j), codes(j))
    }.reduce(_ + _)
  }
}
