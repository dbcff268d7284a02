package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** KCore.peel: planted graphs with hand-computed cores (clique
  * survives, chain cascades away round by round), and the fixed-round
  * entry's fixpoint claim (one more round is a no-op).
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: Seq[(Long, Long)]) =
    (edges.toDF("src", "dst"),
      edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("node"))

  test("kcore: 4-clique survives k=3, pendant chain peels away in cascade") {
    // 4-clique {1,2,3,4} + chain 4-5-6-7: every chain node has degree
    // <= 2 inside any alive set, so the chain cascades off end-first;
    // clique nodes keep degree 3 among themselves forever
    val (edges, nodes) = g(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)))
    val out = KCore.peel(nodes, edges, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "exactly the clique survives, each seeing 3 in-core neighbors")
    // one round peels only the frontier: after round 1 node 7 (deg 1)
    // is gone but 5 and 6 (deg 2 at round 1) linger until later rounds
    val r1 = KCore.peel(nodes, edges, k = 2, rounds = 4)
      .collect().map(_.getLong(0)).toSet
    assert(r1 === Set(1L, 2L, 3L, 4L), "k=2 also strips the open chain")
  }

  test("kcore: duplicate and reversed edges count once; self-loops ignored") {
    val (edges, nodes) = g(Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), // one real edge
      (1L, 3L), (2L, 3L)))                    // triangle closes
    val out = KCore.peel(nodes, edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: peel round plans as equi-joins — no cartesian, no nested-loop") {
    val (edges, nodes) = g(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    // r20: the returned core frame is a projection of the last round's
    // CUT, so the round plans no longer appear in the final frame's
    // plan — capture them at the cuts (every per-round join/agg plan)
    // and assert over round plans + final plan together.
    spark.conf.set(Checkpoints.CapturePlansKey, "true")
    Checkpoints.clearCapturedPlans()
    val finalPlan =
      try KCore.peel(nodes, edges, k = 2, rounds = 1)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset(Checkpoints.CapturePlansKey)
    val all = (Checkpoints.capturedPlans :+ finalPlan).mkString("\n===\n")
    assert(!all.contains("CartesianProduct") &&
      !all.contains("BroadcastNestedLoopJoin"),
      s"alive-set probes must stay equi-joins:\n$all")
    assert(all.contains("HashAggregate"), "degree count must partial-agg")
  }

  test("kcore: deep cascade past the round cap flags converged=false; enough rounds converge early") {
    // path 1-2-...-20 with k=2: both ends peel each round, so the
    // whole chain needs ~10 rounds to clear — exactly the link-farm
    // tendril shape that silently defeats a fixed-round peel
    val (edges, nodes) = g((1L until 20L).map(i => (i, i + 1)))
    val capped = KCore.peelDetailed(nodes, edges, k = 2, maxRounds = 3)
    assert(!capped.converged, "3 rounds cannot drain a 10-deep cascade")
    assert(capped.roundsRun === 3)
    assert(capped.core.count() > 0,
      "the truncated result LOOKS like a core — which is why the flag must be loud")
    val full = KCore.peelDetailed(nodes, edges, k = 2, maxRounds = 30)
    assert(full.converged, "a generous cap must reach the fixpoint")
    assert(full.roundsRun < 30, "and exit early once |alive| stabilizes")
    assert(full.core.count() === 0, "an open chain has no 2-core")
    // convergence exits as soon as alive stabilizes: a clique needs
    // round 1 (no peel) + round 2 (count unchanged) only
    val (ce, cn) = g(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val clique = KCore.peelDetailed(cn, ce, k = 2, maxRounds = 10)
    assert(clique.converged && clique.roundsRun === 1,
      "alive_1 == alive_0 is detectable in the first round")
    assert(clique.core.count() === 3)
  }

  test("kcore entry: the fixed round count reaches the fixpoint (one more is a no-op)") {
    val sf = sf0
    val docs = GraftSession.table(spark, sf, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    def run(rounds: Int) = {
      val edges = nodes.select(col("node").as("src"),
          pmod(col("node") * col("node") + 13, lit(n)).as("dst"))
        .unionByName(nodes.select(col("node").as("src"),
          pmod(col("node"), lit(97L)).as("dst")))
        .unionByName(nodes.filter(pmod(col("node"), lit(3L)) === 0)
          .select(col("node").as("src"),
            pmod(col("node") * 5 + 41, lit(n)).as("dst")))
      KCore.peel(nodes, edges, CorpusQueries.KCoreK, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val atEntry = run(CorpusQueries.KCoreRounds)
    val onePast = run(CorpusQueries.KCoreRounds + 1)
    assert(atEntry === onePast,
      s"round ${CorpusQueries.KCoreRounds} must be the fixpoint on the test corpus")
    assert(atEntry.nonEmpty && atEntry.size < n,
      "entry must be non-vacuous: some nodes survive, some peel")
  }
}
