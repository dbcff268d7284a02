package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The vector index's forward + reverse lifecycle (r16): persisted
  * IVF cell lists with append (zero-relearn, replay-idempotent),
  * retract (tombstoned — dead vectors stop being served as
  * neighbors), resurrection, and compaction. Closes the r15 gap where
  * a takedown left dead vectors in cell lists until a full rebuild.
  */
class IncrementalIvfSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.GraftSession.table(spark, sf0, "embeddings")

  private lazy val cents =
    IvfIndex.learnCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)

  // a deterministic "new vectors" batch: negated sample, offset ids
  // (s6's convention — the cosine-opposite region)
  private def batch: DataFrame =
    emb.filter($"vec_id" % 10 === 3)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => -x).as("embedding"))

  private def served(prefix: String): Set[Long] =
    IncrementalIvf.servedCells(spark, prefix)
      .select($"vec_id").as[Long].collect().toSet

  test("append∘retract round-trips; retract∘append ≡ rebuild") {
    val prefix = "ivfspec_a"
    IncrementalIvf.buildIndex(emb, "vec_id", "embedding", cents, prefix)
    val base = served(prefix)
    IncrementalIvf.appendBatch(spark, batch, "vec_id", "embedding", cents, prefix)
    val withBatch = served(prefix)
    // rebuild-from-scratch over corpus ∪ batch must equal the append
    val rebuilt = "ivfspec_rebuild"
    IncrementalIvf.buildIndex(
      emb.select($"vec_id", $"embedding")
        .unionByName(batch.select($"vec_id", $"embedding")),
      "vec_id", "embedding", cents, rebuilt)
    assert(withBatch === served(rebuilt))
    // cell assignments agree row-for-row, not just id sets
    val a = IncrementalIvf.servedCells(spark, prefix)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toSet
    val b = IncrementalIvf.servedCells(spark, rebuilt)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toSet
    assert(a === b)
    // retract the batch → back to the original index
    IncrementalIvf.retractBatch(spark, batch.select($"vec_id"), prefix)
    assert(served(prefix) === base)
    // re-append resurrects WITHOUT duplicate rows (absentOnly + flip)
    IncrementalIvf.appendBatch(spark, batch, "vec_id", "embedding", cents, prefix)
    assert(served(prefix) === withBatch)
    val dupes = IncrementalIvf.servedCells(spark, prefix)
      .groupBy($"vec_id").count().filter($"count" > 1).count()
    assert(dupes === 0L)
  }

  test("a replayed appendBatch is idempotent") {
    val prefix = "ivfspec_b"
    IncrementalIvf.buildIndex(emb, "vec_id", "embedding", cents, prefix)
    IncrementalIvf.appendBatch(spark, batch, "vec_id", "embedding", cents, prefix)
    val once = served(prefix)
    IncrementalIvf.appendBatch(spark, batch, "vec_id", "embedding", cents, prefix)
    assert(served(prefix) === once)
    assert(IncrementalIvf.servedCells(spark, prefix).count() === once.size.toLong)
  }

  test("retracted vectors stop being served as neighbors; others unchanged") {
    val prefix = "ivfspec_c"
    IncrementalIvf.buildIndex(emb, "vec_id", "embedding", cents, prefix)
    val queries = emb.filter($"vec_id" < 8)
    val pre = IncrementalIvf.knnFromIndex(spark, queries, "vec_id",
        "embedding", k = 5, cents, nprobe = 2, prefix = prefix)
      .select($"qid", $"nid").as[(Long, Long)].collect()
    // take down every neighbor the first query currently sees
    val deadIds = pre.filter(_._1 == 0L).map(_._2).toSet
    assert(deadIds.nonEmpty)
    IncrementalIvf.retractBatch(spark,
      deadIds.toSeq.toDF("vec_id"), prefix)
    val post = IncrementalIvf.knnFromIndex(spark, queries, "vec_id",
        "embedding", k = 5, cents, nprobe = 2, prefix = prefix)
      .select($"qid", $"nid").as[(Long, Long)].collect()
    assert(!post.exists(p => deadIds.contains(p._2)),
      "tombstoned vectors must never be served as neighbors")
    // queries whose neighborhood never contained a dead vector are
    // untouched
    val preOk = pre.filter(p => !deadIds.contains(p._2) &&
      pre.filter(_._1 == p._1).forall(q => !deadIds.contains(q._2))).toSet
    assert(preOk.subsetOf(post.toSet))
  }

  test("compact folds the dead set into the physical lists") {
    val prefix = "ivfspec_d"
    IncrementalIvf.buildIndex(emb, "vec_id", "embedding", cents, prefix)
    IncrementalIvf.retractBatch(spark,
      emb.filter($"vec_id" % 7 === 0).select($"vec_id"), prefix)
    val before = served(prefix)
    IncrementalIvf.compact(spark, prefix)
    assert(!spark.catalog.tableExists(s"${prefix}_gone"))
    assert(spark.table(s"${prefix}_cells").select($"vec_id")
      .as[Long].collect().toSet === before)
    assert(served(prefix) === before)
  }
}
