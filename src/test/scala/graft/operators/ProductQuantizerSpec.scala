package graft.operators

import graft.{GraftSession, SparkSpec}

/** ProductQuantizer: the encode kernel replayed independently on the
  * driver (codes AND reconstruction error), learning invariance under
  * repartitioning, and the narrow-map plan contract.
  */
class ProductQuantizerSpec extends SparkSpec {

  private def embeddings = GraftSession.table(spark, sf0, "embeddings")

  private val m = 4
  private val sub = 16

  test("encode codes and MSE match an independent driver-side replay") {
    val e = embeddings
    val books = ProductQuantizer.learnCodebooks(e, "vec_id", "embedding",
      m = m, dims = 64, k = 16, iters = 2)
    val enc = ProductQuantizer.encode(e, "vec_id", "embedding", books, dims = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    val vecs = e.select("vec_id", "embedding").collect()
    assert(vecs.length === enc.size)
    vecs.take(64).foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      var total = 0.0
      (0 until m).foreach { j =>
        val subv = v.slice(j * sub, (j + 1) * sub)
        // same arithmetic, same order: strictly-left-to-right Σ(x−c)²,
        // ties to the smaller cid
        var bestCid = -1; var bestD = Double.MaxValue
        books(j).foreach { case (cid, c) =>
          var d = 0.0
          var i = 0
          while (i < sub) { val x = subv(i) - c(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; bestCid = cid }
        }
        assert(enc(id).getLong(1 + j) === bestCid.toLong,
          s"code_${j + 1} of vec $id must match the replayed argmin")
        total += bestD
      }
      assert(math.abs(enc(id).getDouble(1 + m) - total / 64.0) < 1e-6,
        s"mse6 of vec $id must match the replayed reconstruction error")
    }
  }

  test("codebook learning is partitioning-invariant (6-decimal centroid rounding)") {
    val e = embeddings
    val a = ProductQuantizer.learnCodebooks(e, "vec_id", "embedding",
      m = m, dims = 64, k = 8, iters = 2)
    val b = ProductQuantizer.learnCodebooks(e.repartition(7), "vec_id", "embedding",
      m = m, dims = 64, k = 8, iters = 2)
    assert(a === b,
      "local[4] and any other partitioning must learn identical codebooks")
  }

  test("encode is a pure narrow map: zero exchanges in the plan") {
    val e = embeddings
    val books = ProductQuantizer.learnCodebooks(e, "vec_id", "embedding",
      m = m, dims = 64, k = 8, iters = 1)
    val plan = ProductQuantizer.encode(e, "vec_id", "embedding", books, dims = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PQ encoding must not shuffle:\n$plan")
  }

  test("ADC of a vector against its own codes equals its reconstruction error") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.toDouble
    val e = embeddings
    val books = ProductQuantizer.learnCodebooks(e, "vec_id", "embedding",
      m = m, dims = 64, k = 16, iters = 2)
    val enc = ProductQuantizer.encode(e, "vec_id", "embedding", books, dims = 64)
    // same fold, same order: adc(v, codes(v)) must equal mse6·64
    // before rounding — compare through the same 6-decimal rounding
    val joined = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .join(enc, "vec_id")
      .withColumn("adc6", round(ProductQuantizer.adcDist2(col("v"), books,
        (1 to m).map(j => col(s"code_$j")), dims = 64) / 64.0, 6))
    assert(joined.filter(col("adc6") =!= col("mse6")).count() === 0,
      "asymmetric distance to self must be the reconstruction error exactly")
  }

  test("the composed s8 serving plan joins on cell id — no cartesian, no nested loop") {
    val plan = LlmQueries.s8IvfPq(spark, sf0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"probed-cell candidate generation must stay an equi-join:\n$plan")
  }

  test("misconfigured subspaces fail loudly") {
    val e = embeddings
    intercept[IllegalArgumentException] {
      ProductQuantizer.learnCodebooks(e, "vec_id", "embedding", m = 5, dims = 64)
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.learnCodebooks(e, "vec_id", "embedding", m = 4, dims = 64,
        k = IvfIndex.LiteralKMax + 1)
    }
  }
}
