package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by parallel peeling — the iterative-FILTER
  * fixpoint next to PageRank's numeric and DedupClusters' label
  * fixpoints. The k-core (maximal subgraph where every node keeps
  * ≥ k neighbors inside it) is the classic crawl-graph density
  * filter: link farms and isolated tendrils peel away, genuinely
  * interlinked cores survive.
  *
  * Round r: degree of each node counted WITHIN alive_{r-1} (both
  * endpoints alive), then alive_r = {v : deg_r(v) ≥ k}. Rounds are
  * FIXED (PageRank's rule — an engine-portable, data-independent
  * plan; on the test corpora the peel converges well inside the
  * default, making the answer the true k-core).
  *
  * Scale shape: each round is two equi-joins of the edge table
  * against the alive set plus one partial-agg degree count — all
  * shuffles keyed on node ids, nothing quadratic, and the alive set
  * only shrinks (AQE switches the probe joins to broadcast as it
  * collapses). The undirected edge table is deduplicated ONCE and
  * lineage-cut; each round's alive frame is cut too (the d9 rule:
  * O(rounds) join lineage would otherwise stack into one plan).
  */
object KCore {

  /** Peel `rounds` times; returns (node, core_deg) for the nodes
    * alive after the last round, with their degree inside the
    * previous alive set (the degree the surviving filter saw).
    *
    * `edges` is directed (src, dst); self-loops are dropped and each
    * edge contributes both directions, deduplicated.
    */
  def peel(nodes: DataFrame, edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.filter(col("src") =!= col("dst"))
    val und = Checkpoints.cut(
      e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(), eager = true)
    var alive = nodes.select(col("node"))
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      deg = und
        .join(alive.select(col("node").as("src")), "src")
        .join(alive.select(col("node").as("dst")), "dst")
        .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      alive = Checkpoints.cut(
        deg.filter(col("core_deg") >= k).select(col("src").as("node")),
        eager = true)
    }
    deg.filter(col("core_deg") >= k)
      .select(col("src").as("node"), col("core_deg"))
  }
}
