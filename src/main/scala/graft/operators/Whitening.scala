package graft.operators

import graft.functions.ArrayDotProduct
import graft.functions.VectorFunctions.toDouble
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZCA whitening for embedding columns (SURVEY.md §2.4 s5): the
  * standard preprocessing in front of semantic dedup / ANN —
  * decorrelates dimensions and equalizes their variance, so cosine /
  * L2 distances stop being dominated by a few high-variance axes.
  *
  * Three stages, each in its scale lane:
  *   1. moments: ONE distributed aggregation pass (q_profile's
  *      design) — each row fans out its d(d+1)/2 upper-triangle
  *      second-moment terms plus d first-moment terms in-partition
  *      (Generate), and the map-side partial aggregation collapses
  *      them BEFORE the shuffle, which therefore carries
  *      O(partitions · d²) rows, never O(n · d²).
  *   2. eigendecomposition: on the DRIVER — the d×d covariance
  *      (64×64 here) is a few KB; cyclic Jacobi is exact-enough,
  *      deterministic, and dependency-free. Driver state is O(d²),
  *      bounded by design like IvfIndex's centroid literals.
  *   3. whitening map: y = W·(x − μ) with W = Q Λ^(−1/2) Qᵀ
  *      broadcast as LITERALS into a pure narrow map — d codegen'd
  *      `ArrayDotProduct`s per row, no shuffle, no join; the same
  *      shape (and scale argument) as t13's classifier scoring.
  *
  * No DuckDB oracle (SQL has no eigendecomposition); the spec checks
  * the mathematical contract instead: whitened data has ~zero mean
  * and ~identity covariance, and W is invariant under
  * repartitioning (the moment pass is exact integer-free float
  * summation only at the final combine — tolerance-checked).
  */
object Whitening {

  /** Hard bound on `dims`. TWO quadratic costs meet here: the moment
    * pass fans each row out to d(d+1)/2+d+1 structs in-partition
    * (2,145 at d=64 — cheap; ~525k at d=1024 — a 500× per-row blowup
    * the map-side combine only absorbs AFTER materializing), and the
    * driver-side cyclic Jacobi sweep is exact-enough only in the
    * well-conditioned d ≤ ~100 regime its Scaladoc documents. Both
    * ceilings land at the same order, so one loud guard covers them;
    * past it the moment pass needs restructuring (per-partition
    * outer-product fold) AND a different eigensolver — a different
    * operator, not a bigger knob.
    */
  val MaxDims = 128

  /** (mean, covariance) of an array<float/double> column, one
    * aggregation pass. Collects d + d(d+1)/2 + 1 small rows.
    *
    * PRECONDITION: every vector has exactly `dims` elements —
    * `getItem` past a short array is null and `sum` would silently
    * skip it, deflating that dimension's moments (the whitening map
    * itself fails loudly on mismatched lengths via ArrayDotProduct).
    */
  def moments(vecs: DataFrame, vecCol: String, dims: Int): (Array[Double], Array[Array[Double]]) = {
    require(dims <= MaxDims,
      s"dims=$dims exceeds Whitening.MaxDims=$MaxDims: the per-row " +
        "moment fan-out is d(d+1)/2 structs and the Jacobi sweep is " +
        "specified for d <= ~100 — restructure before raising this")
    // let-bind the cast vector: the d(d+1)/2+d terms below reference
    // it ~2·d² times, and an inlined array cast per reference blows
    // the generated method past Janino's ceiling (r20: the native
    // toDouble cast is "cheap" to CollapseProject, so a Project
    // boundary would not survive the optimizer; the lambda variable
    // does)
    val terms = graft.functions.ExprLet.bindOnce(toDouble(col(vecCol))) { v =>
      // fan-out per row: (-1,-1,1) count, (i,-1,x_i) sums, (i,j,x_i·x_j) products
      array(
        (Seq(struct(lit(-1).as("i"), lit(-1).as("j"), lit(1.0).as("p"))) ++
          (0 until dims).map(i =>
            struct(lit(i).as("i"), lit(-1).as("j"), v.getItem(i).as("p"))) ++
          (for (i <- 0 until dims; j <- i until dims) yield
            struct(lit(i).as("i"), lit(j).as("j"),
              (v.getItem(i) * v.getItem(j)).as("p")))): _*)
    }
    val rows = vecs.select(explode(terms).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("s"))
      .collect()
    val byKey = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = byKey((-1, -1))
    val mean = Array.tabulate(dims)(i => byKey((i, -1)) / n)
    val cov = Array.ofDim[Double](dims, dims)
    for (i <- 0 until dims; j <- i until dims) {
      val c = byKey((i, j)) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    (mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors as rows). Deterministic
    * sweep order; converges quadratically — `sweeps` = 12 drives
    * off-diagonal mass below 1e-12 for well-conditioned d ≤ 100.
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val q = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until d - 1; r <- p + 1 until d) {
      val apr = a(p)(r)
      if (math.abs(apr) > 1e-300) {
        val theta = (a(r)(r) - a(p)(p)) / (2.0 * apr)
        // sign(0) must count as +1: theta = 0 needs the full 45°
        // rotation (t = 1), not the identity signum(0) would give
        val sgn = if (theta >= 0.0) 1.0 else -1.0
        val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akr = a(k)(r)
          a(k)(p) = c * akp - s * akr
          a(k)(r) = s * akp + c * akr
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val ark = a(r)(k)
          a(p)(k) = c * apk - s * ark
          a(r)(k) = s * apk + c * ark
        }
        for (k <- 0 until d) {
          val qkp = q(k)(p); val qkr = q(k)(r)
          q(k)(p) = c * qkp - s * qkr
          q(k)(r) = s * qkp + c * qkr
        }
      }
    }
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d, d)((i, j) => q(j)(i)))
  }

  /** The ZCA whitening matrix W = Q Λ^(−1/2) Qᵀ (eps-regularized). */
  def zcaMatrix(cov: Array[Array[Double]], eps: Double = 1e-8): Array[Array[Double]] = {
    val d = cov.length
    val (evals, evecs) = jacobiEigen(cov) // evecs(k) = k-th eigenvector
    val inv = evals.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < d) { acc += evecs(k)(i) * inv(k) * evecs(k)(j); k += 1 }
      acc
    }
  }

  /** Whiten `vecCol` with broadcast literals: one codegen'd dot
    * product per output dimension, shuffle-free.
    */
  def whiten(vecs: DataFrame, vecCol: String, mean: Array[Double],
      w: Array[Array[Double]]): DataFrame = {
    // materialize the centered vector ONCE (an expression referenced
    // by all d dot products would be re-evaluated per reference)
    val centered = zip_with(toDouble(col(vecCol)),
      array(mean.map(lit).toSeq: _*), (x, m) => x - m)
    val out = array(w.map(row =>
      ArrayDotProduct(col("__centered"), array(row.map(lit).toSeq: _*))).toSeq: _*)
    vecs.withColumn("__centered", centered)
      .withColumn(vecCol, out)
      .drop("__centered")
  }

  /** End-to-end: fit moments on `vecs`, whiten the same frame. */
  def fitWhiten(vecs: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val (mean, cov) = moments(vecs, vecCol, dims)
    whiten(vecs, vecCol, mean, zcaMatrix(cov))
  }
}
