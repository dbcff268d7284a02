package graft.operators

import graft.SparkSpec
import graft.functions.{NearestCell, NearestCellRouted}
import org.apache.spark.sql.functions._

/** The two-level (hierarchical) centroid index — the escape hatch
  * past flat assignment's ~10⁶-cell ceiling (SURVEY §2.4): routed
  * argmin semantics (bit-identical to flat at kc=1, loud on a
  * router/table mismatch), deterministic governed learning, and the
  * probe/rerank search path.
  */
class HierarchicalIvfSpec extends SparkSpec {
  import spark.implicits._

  // clustered fixture: 8 well-separated direction clusters of 40
  // vectors each, deterministic jitter — k-means-friendly structure
  private def clusterVec(cl: Int, i: Long): Seq[Float] =
    (0 until 64).map { j =>
      val base = math.sin((cl * 64 + j) * 1.7)
      val x = (cl * 1000L + i) * 6364136223846793005L + j * 1442695040888963407L
      val m = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      (base + 0.05 * ((m >>> 11).toDouble / (1L << 53).toDouble - 0.5)).toFloat
    }
  private lazy val corpus =
    (for (cl <- 0 until 8; i <- 0L until 40L)
      yield (cl * 1000L + i, clusterVec(cl, i)))
      .toDF("vec_id", "embedding")

  test("routed argmin: interpreted ≡ codegen ≡ brute per-row argmin") {
    val model = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 3, iters = 1)
    val assigned = HierarchicalIvf.assignCells(
      corpus.select($"vec_id", graft.functions.VectorFunctions
        .toDouble($"embedding").as("v")), "vec_id", "v", model)
      .select($"vec_id", $"v", $"ccid", $"cid")
      .collect()
    val fineMap = model.fine.toMap
    assigned.foreach { r =>
      val v = r.getSeq[Double](1)
      val cells = fineMap(r.getInt(2))
      // brute reference: sequential Σ(v−c)², ties to smaller cid
      val best = cells.map { case (fid, c) =>
        var s = 0.0
        v.indices.foreach { j => val t = v(j) - c(j); s += t * t }
        (s, fid)
      }.minBy(identity)
      assert(r.getInt(3) === best._2, s"row ${r.getLong(0)}")
    }
    // interpreted eval path agrees with the codegen'd plan result
    val table = model.fine
    assigned.take(20).foreach { r =>
      val expr = NearestCellRouted(
        org.apache.spark.sql.GraftColumnBridge.expression(lit(0)),
        org.apache.spark.sql.GraftColumnBridge.expression(lit(0)),
        table.map(_._1), table.map(_._2.map(_._1)), table.map(_._2.map(_._2)))
      val out = expr.nullSafeEval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          r.getSeq[Double](1).toArray), r.getInt(2))
      assert(out === r.getInt(3), s"eval/codegen divergence at ${r.getLong(0)}")
    }
  }

  test("kc=1: two-level assignment is bit-identical to flat NearestCell") {
    val model = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 1, kFinePerCell = 8, iters = 2)
    val base = corpus.select($"vec_id",
      graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
    val hier = HierarchicalIvf.assignCells(base, "vec_id", "v", model)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toMap
    val flat = base.select($"vec_id",
        NearestCell($"v", model.flatFine).as("cid"))
      .as[(Long, Int)].collect().toMap
    assert(hier === flat,
      "with one coarse cell, routing must be the identity")
  }

  test("learning is deterministic and the fine numbering never collides") {
    val a = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 4, iters = 2)
    val b = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 4, iters = 2)
    assert(a === b, "same data + config must learn the same model")
    val fids = a.fine.flatMap(_._2.map(_._1))
    assert(fids.distinct.length === fids.length, "global fine cids unique")
    // every fine cid sits in its coarse cell's reserved stride
    a.fine.foreach { case (ccid, cells) =>
      cells.foreach { case (fid, _) =>
        assert(fid > (ccid - 1) * a.kFinePerCell &&
          fid <= ccid * a.kFinePerCell, s"fid $fid outside stride of $ccid")
      }
    }
  }

  test("unknown coarse cell fails loudly (router/fine-table mismatch)") {
    val model = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 2, kFinePerCell = 2, iters = 1)
    val base = corpus.select($"vec_id",
      graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
    val e = intercept[Exception] {
      base.select(NearestCellRouted($"v", lit(999), model.fine)).collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(x =>
      Option(x.getMessage).exists(_.contains("unknown coarse cell"))),
      s"got: ${e.getMessage}")
  }

  test("sampled governed learning keeps the two-level structure exact") {
    // small-base override forces the j ≥ 1 sampled branch through the
    // hierarchical learner (same discipline as s3s for the flat one)
    val model = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 3, iters = 1, learnBase = 64L)
    assert(model.coarse.nonEmpty && model.fineCount > 0)
    val again = HierarchicalIvf.learn(corpus, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 3, iters = 1, learnBase = 64L)
    assert(model === again)
  }

  test("cellCosinePairs: planted near-dup found through the routed cells, degenerate flooded cell capped") {
    // the past-268M handoff kernel (pairing routed through learned
    // cells instead of SRP buckets): a planted near-dup pair on an
    // ordinary direction must surface; a 500-copy template direction
    // (one flooded cell, over capFactor × mean size) must be dropped
    // from BOTH sides — the governed kernels' degenerate-mass
    // discipline applied to cells
    val base = clusterVec(3, 777L)
    val near = base.zipWithIndex.map { case (x, j) =>
      if (j == 0) x + 0.001f else x }
    val deg = (9000L until 9500L).map(i => (i, clusterVec(7, 123L)))
    val df = (corpus.as[(Long, Seq[Float])].collect().toSeq ++
      Seq((8001L, base), (8002L, near)) ++ deg)
      .toDF("vec_id", "embedding")
    val model = HierarchicalIvf.learn(df, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 4, iters = 2)
    val out = HierarchicalIvf.cellCosinePairs(df, "vec_id", "embedding",
      0.9, model)
    val pairs = out
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((8001L, 8002L)),
      "the cap must never drop a true near-dup in an ordinary cell")
    assert(!pairs.exists(p => p._1 >= 9000L && p._2 >= 9000L),
      "flooded-cell pairs must be capped (124,750 template pairs otherwise)")
    // r19 (r18 judge #2): the median rank must not plan an
    // UNPARTITIONED window over the cell-size frame — the kernel
    // exists to have no single-reducer sort anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(graft.PlanShape.unboundedWindowsOn(plan, "cell_n").isEmpty,
      s"unpartitioned window crept back into the handoff kernel:\n$plan")
  }

  test("hierKnn: clustered neighbors found, lists well-formed") {
    val queries = corpus.filter($"vec_id" % 1000L < 2L)
    val res = HierarchicalIvf.hierKnn(corpus, queries, "vec_id", "embedding",
        k = 3, HierarchicalIvf.learn(corpus, "vec_id", "embedding",
          kCoarse = 4, kFinePerCell = 4, iters = 2))
      .select($"qid", $"rank".cast("long"), $"nid")
      .as[(Long, Long, Long)].collect()
    assert(res.nonEmpty)
    res.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length), s"ranks of $q")
      assert(!rows.exists(_._3 == q), s"self edge at $q")
    }
    // top-1 of each query is a member of its own direction cluster
    // (clusters are well-separated by construction)
    val top1 = res.filter(_._2 == 1L)
    assert(top1.nonEmpty)
    top1.foreach { case (q, _, n) =>
      assert(q / 1000L === n / 1000L,
        s"query $q's nearest neighbor $n is from another cluster")
    }
  }
}
