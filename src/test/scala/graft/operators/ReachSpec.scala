package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reach.distances: hand-computed BFS distances on planted graphs
  * (multi-source min, unreachable nodes absent, cycles harmless),
  * brute-force equivalence on a pseudo-random graph, the fixpoint
  * property (extra rounds are no-ops once the frontier stops
  * growing), and the equi-join plan claim.
  */
class ReachSpec extends SparkSpec {
  import spark.implicits._

  private def dists(seeds: Seq[Long], edges: Seq[(Long, Long)], rounds: Int) =
    Reach.distances(
      seeds.toDF("node").withColumn("dist", lit(0L)),
      edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfs: hop distances, multi-source min, unreachable absent") {
    // 1 -> 2 -> 3 -> 4, seed {1, 3}: node 4 is 1 hop from seed 3,
    // not 3 hops from seed 1; node 9 (edge 9 -> 1) is unreachable
    // (edges are directed)
    val out = dists(Seq(1L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 1L)), 4)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("bfs: cycles do not inflate distances") {
    // triangle 1 -> 2 -> 3 -> 1, seed 1: repeated relaxation around the
    // cycle must never lower 1's own distance below 0 or raise others
    val out = dists(Seq(1L), Seq((1L, 2L), (2L, 3L), (3L, 1L)), 6)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfs: matches in-memory reference on a pseudo-random graph") {
    val n = 60
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i * i + 13) % n).toLong), (i.toLong, ((i * 5 + 7) % n).toLong))
    }.filter { case (a, b) => a != b }
    val seeds = Seq(0L, 31L)
    val rounds = 5
    // driver-side BFS reference
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var ref = seeds.map(_ -> 0L).toMap
    for (r <- 1 to rounds) {
      val frontier = ref.filter(_._2 == r - 1).keys
      val next = frontier.flatMap(adj.getOrElse(_, Nil))
        .filterNot(ref.contains).map(_ -> r.toLong).toMap
      ref = ref ++ next
    }
    assert(dists(seeds, edges, rounds) === ref)
  }

  test("bfs: once the frontier stops growing, extra rounds are no-ops") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(dists(Seq(1L), edges, 2) === dists(Seq(1L), edges, 4))
  }

  test("bfs plan: relaxation rounds stay equi-joins") {
    val seeds = Seq(1L).toDF("node").withColumn("dist", lit(0L))
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val plan = Reach.distances(seeds, edges, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"frontier relaxation must stay an equi-join:\n$plan")
    assert(plan.contains("HashAggregate"), "min-relaxation must partial-agg")
  }
}
