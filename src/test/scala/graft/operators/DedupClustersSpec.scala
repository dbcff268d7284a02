package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {

  test("planted components: chain, triangle, pair get min-id labels") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle (cycle)
      (21L, 20L) // pair, given in "reversed" order
    ).toDF("a", "b")
    val cc = DedupClusters.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("empty edge set yields an empty result, not a crash") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(DedupClusters.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("retention keeps the longest member per planted cluster, singletons excluded") {
    import spark.implicits._
    val dir = tmpDir("d14_fixture")
    val shared = (1 to 40).map(i => s"common$i").mkString(" ")
    Seq(
      // near-dup cluster, same source, ids within the gap window:
      // 11 is the longest and must be kept over the smaller id 10
      (10L, s"$shared tail", "en", "s0", 100L),
      (11L, s"$shared tail plus extra words here", "en", "s0", 130L),
      (12L, s"$shared tai", "en", "s0", 99L),
      // unrelated singleton — must NOT appear in the report
      (400L, "completely different content entirely", "en", "s0", 37L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = LlmQueries.d14Retention(spark, dir).collect()
    assert(out.length == 1, s"exactly one multi-member cluster, got ${out.length}")
    val r = out.head
    assert(r.getLong(0) == 10L) // cluster labeled by min id
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 11L, "longest member wins, not the smallest id")
    assert(r.getLong(3) == 130L)
  }

  test("pointer jumping: a 200-node chain converges in O(log n) rounds") {
    import spark.implicits._
    // worst case for plain propagation (diameter 199, would need 199
    // rounds and trip the maxRounds valve); jumping needs ~log2
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DedupClusters.connectedComponents(edges, "a", "b", maxRounds = 20)
      .as[(Long, Long)].collect()
    assert(cc.length == 200 && cc.forall(_._2 == 0L))
  }

  test("property: random graphs agree with an in-memory union-find reference") {
    import spark.implicits._
    val seeds = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + seeds.nextInt(40)
      val m = 20 + seeds.nextInt(60)
      val edges = Seq.fill(m)((seeds.nextInt(n).toLong, seeds.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: classic union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // union-find roots are not necessarily component minima — reduce
      val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
      val expected = nodes.map(x => x -> minOfRoot(find(x))).toMap
      val got = DedupClusters.connectedComponents(
        edges.toDF("a", "b"), "a", "b").as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial (n=$n, m=${edges.size})")
    }
  }

  test("d9 entry: one representative per cluster, labels are cluster minima") {
    import spark.implicits._
    val df = LlmQueries.d9DedupClusters(spark, sf0).cache()
    val n = df.count()
    assert(n > 0, "cluster entry must be non-vacuous on the test corpus")
    // exactly one is_rep per cluster_id, and it is the min doc_id
    val byCluster = df.groupBy($"cluster_id")
      .agg(sum($"is_rep").as("reps"), min($"doc_id").as("mn"))
    assert(byCluster.filter($"reps" =!= 1L).count() == 0)
    assert(byCluster.filter($"cluster_id" =!= $"mn").count() == 0)
    // every member's cluster_id is itself a member doc_id (label = a node)
    val ids = df.select($"doc_id").as[Long].collect().toSet
    val labels = df.select($"cluster_id").as[Long].collect().toSet
    assert(labels.subsetOf(ids))
    df.unpersist()
  }

  test("mergeBatch: incremental fold equals full recompute; bridges merge, fresh nodes join") {
    import spark.implicits._
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L))
    val labels = DedupClusters.connectedComponents(
      oldEdges.toDF("a", "b"), "a", "b")
    // batch: bridges {1,2,3}-{10,11}, a fresh pair {20,21}, and a
    // link from a fresh node into an old cluster {31,32}
    val batch = Seq((3L, 10L), (20L, 21L), (31L, 32L)).toDF("a", "b")
    val merged = DedupClusters.mergeBatch(labels, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    val full = DedupClusters.connectedComponents(
      (oldEdges ++ Seq((3L, 10L), (20L, 21L), (31L, 32L))).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(merged === full, "incremental fold must equal full recompute")
    assert(merged(11L) === 1L && merged(32L) === 30L && merged(21L) === 20L)
    // untouched singleton-star clusters keep their labels
    assert(merged.filter(_._2 == 1L).keySet === Set(1L, 2L, 3L, 10L, 11L))
  }

  test("retractBatch: removal splits a component; untouched labels pass through") {
    import spark.implicits._
    // chain 1-2-3-4-5 (cluster 1), pair 10-11 (cluster 10), pair
    // 20-21 untouched
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L))
    val labels = DedupClusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
    // remove node 3 (splits the chain) and node 10 (strips the pair's
    // min id; 11 is left edge-less and drops out, matching CC's
    // nodes-from-edges domain)
    val removed = Seq(3L, 10L).toDF("doc_id")
    val remaining = edges.filterNot { case (a, b) =>
      Set(a, b).exists(Set(3L, 10L)) }.toDF("a", "b")
    val out = DedupClusters.retractBatch(labels, removed, remaining, "a", "b")
      .as[(Long, Long)].collect().toMap
    val full = DedupClusters.connectedComponents(remaining, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out === full, "bounded retract must equal full recompute")
    assert(out === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      20L -> 20L, 21L -> 20L))
  }

  test("retract∘merge composition: removal + restored edges ≡ one recompute") {
    import spark.implicits._
    // the pair-family shape: retracting docs deletes their edges AND
    // un-crosses a cap, restoring a suppressed edge between survivors
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val labels = DedupClusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
    val removed = Seq(2L).toDF("doc_id")
    val remaining = Seq((10L, 11L)).toDF("a", "b")
    val restored = Seq((1L, 3L)).toDF("a", "b") // an un-crossed cap's gift
    val out = DedupClusters.mergeBatch(
      DedupClusters.retractBatch(labels, removed, remaining, "a", "b"),
      restored, "a", "b").as[(Long, Long)].collect().toMap
    val full = DedupClusters.connectedComponents(
      Seq((10L, 11L), (1L, 3L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out === full)
    assert(out === Map(1L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("d16 soft-dedup weights: 1/n per planted cluster member, singletons keep 1e6") {
    import spark.implicits._
    val dir = tmpDir("d16_fixture")
    val shared = (1 to 40).map(i => s"common$i").mkString(" ")
    Seq(
      // near-dup cluster of 3 (same fixture shape as the d14 test)
      (10L, s"$shared tail", "en", "s0", 100L),
      (11L, s"$shared tail plus extra words here", "en", "s0", 130L),
      (12L, s"$shared tai", "en", "s0", 99L),
      // unrelated singleton — keeps full weight
      (400L, "completely different content entirely", "en", "s0", 37L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = LlmQueries.d16ClusterWeights(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L, 400L),
      "every doc appears exactly once — soft dedup drops nothing")
    // the 3-member cluster: label = min id, weight = floor(1e6/3)
    out.filter(_._1 <= 12L).foreach { case (_, cid, n, w) =>
      assert(cid == 10L && n == 3L && w == 333333L)
    }
    assert(out.last == ((400L, 400L, 1L, 1000000L)))
  }

  test("d16 reads the cluster artifact — no pair re-verification in its plan") {
    // materialize once (shared with the other artifact tests)
    assert(LlmQueries.documentClusters(spark, sf0).count() > 0)
    val plan = LlmQueries.d16ClusterWeights(spark, sf0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("scratch/clusters"), "weights must join the artifact")
    assert(!plan.contains("array_intersect") && !plan.contains("collect_set"),
      "weights must not re-verify candidate pairs")
  }

  test("cluster artifact: computed once per corpus, d14 reads it instead of re-running d9") {
    // first lookup materializes the artifact
    assert(LlmQueries.documentClusters(spark, sf0).count() > 0)
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val again = LlmQueries.documentClusters(spark, sf0)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    // the reader may run ONE footer-listing job for the multi-file
    // artifact; the dozens-of-jobs dedup pipeline must not re-run
    assert(after - before <= 1,
      s"second lookup must be a cache hit, ran ${after - before} jobs")
    // the reused frame is a plain scan of the clustered parquet artifact
    val scanPlan = again.queryExecution.executedPlan.toString
    assert(scanPlan.contains("scratch/clusters"), scanPlan)
    // d14's composed plan reads the artifact too: no jaccard kernel
    // (array_intersect) and no shingle aggregation anywhere in it
    val d14Plan = LlmQueries.d14Retention(spark, sf0)
      .queryExecution.executedPlan.toString
    assert(d14Plan.contains("scratch/clusters"), "retention must join the artifact")
    assert(!d14Plan.contains("array_intersect") && !d14Plan.contains("collect_set"),
      "retention must not re-verify candidate pairs")
  }
}
