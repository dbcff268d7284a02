package graft.operators

import graft.SparkSpec

/** s5_pca_whiten: the mathematical contract (no SQL oracle can
  * replay an eigendecomposition) — whitened data has ~zero mean and
  * ~identity covariance, the fit is partitioning-invariant, and the
  * Jacobi kernel is exact on a known matrix.
  */
class WhiteningSpec extends SparkSpec {

  private def embeddings = graft.GraftSession.table(spark, sf0, "embeddings")

  test("dims past MaxDims are rejected loudly, not fanned out quadratically") {
    val boom = intercept[IllegalArgumentException] {
      Whitening.moments(embeddings, "embedding", Whitening.MaxDims + 1)
    }
    assert(boom.getMessage.contains("MaxDims"),
      s"guard must name the bound, got: ${boom.getMessage}")
  }

  test("jacobi eigendecomposition recovers a known 2x2 spectrum") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0)) // eigenvalues 3, 1
    val (evals, evecs) = Whitening.jacobiEigen(m)
    assert(evals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvectors reconstruct m: sum_k l_k v_k v_k^T
    for (i <- 0 until 2; j <- 0 until 2) {
      val r = (0 until 2).map(k => evals(k) * evecs(k)(i) * evecs(k)(j)).sum
      assert(math.abs(r - m(i)(j)) < 1e-12)
    }
  }

  test("whitened embeddings have ~zero mean and ~identity covariance") {
    val whitened = Whitening.fitWhiten(embeddings, "embedding", 64)
    val (mean, cov) = Whitening.moments(whitened, "embedding", 64)
    assert(mean.forall(m => math.abs(m) < 1e-9), s"max |mean| = ${mean.map(math.abs).max}")
    val offDiag = (for (i <- 0 until 64; j <- 0 until 64 if i != j)
      yield math.abs(cov(i)(j))).max
    val diagErr = (0 until 64).map(i => math.abs(cov(i)(i) - 1.0)).max
    // eps-regularization and float inputs leave ~1e-4 slack
    assert(diagErr < 1e-3, s"max |cov_ii - 1| = $diagErr")
    assert(offDiag < 1e-3, s"max |cov_ij| = $offDiag")
  }

  test("the fitted whitening matrix is partitioning-invariant") {
    val a = Whitening.moments(embeddings.repartition(3), "embedding", 64)
    val b = Whitening.moments(embeddings.repartition(7), "embedding", 64)
    val wa = Whitening.zcaMatrix(a._2)
    val wb = Whitening.zcaMatrix(b._2)
    val maxDiff = (for (i <- 0 until 64; j <- 0 until 64)
      yield math.abs(wa(i)(j) - wb(i)(j))).max
    assert(maxDiff < 1e-8, s"partitioning changed W by $maxDiff")
  }
}
