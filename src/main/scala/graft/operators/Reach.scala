package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance by fixed-round min-relaxation — the
  * frontier-traversal leg of the graph family (PageRank: numeric
  * fixpoint, KCore: filter fixpoint, triangles: motif). Crawl-depth
  * labeling, link-distance-from-seeds scoring, and reachability
  * filters are all this operator.
  *
  * Round r: dist_r = min(dist_{r-1}, min over edges u→v of
  * dist_{r-1}(u)+1) — one edge equi-join (shuffled on the node key)
  * + union + one partial-agg min per round. Relaxation is monotone,
  * so after r rounds every distance ≤ r is exact and extra rounds
  * are no-ops on them (ReachSpec's fixpoint check). The distance
  * frame is lineage-cut per round (the d9 rule) and only grows to
  * the reachable set, never the corpus; AQE broadcasts the frontier
  * side while it is small.
  */
object Reach {

  /** `seeds`: (node, dist) starting distances (normally 0). `edges`:
    * directed (src, dst). Returns (node, dist) over the set reachable
    * within `rounds` hops of a seed.
    */
  def distances(seeds: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var dist = seeds.select(col("node"), col("dist").cast("long").as("dist"))
    for (r <- 1 to rounds) {
      val relaxed = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      val merged = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      // cut only frames that feed ANOTHER round (KCore's rule): the
      // final result keeps its one-join lineage for the consumer
      dist = if (r == rounds) merged else Checkpoints.cut(merged)
    }
    dist
  }
}
