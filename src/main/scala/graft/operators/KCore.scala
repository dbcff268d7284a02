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
  * CAPPED (`maxRounds` — an engine-portable, data-independent plan
  * bound) but the peel detects its own fixpoint: alive only ever
  * shrinks (alive_r ⊆ alive_{r-1} by construction), so one tiny
  * per-round count comparing \|alive_r\| to \|alive_{r-1}\| decides
  * set equality exactly — the d9 changed-count rule. On convergence
  * the loop exits early (identical output: a converged round is
  * idempotent); if the cap is hit first, `PeelResult.converged` is
  * false and a warning is logged — a deep peeling cascade (each
  * round stripping a thin layer, precisely what link-farm tendrils
  * look like) otherwise returns a subgraph that LOOKS like a k-core
  * but still contains under-degree nodes.
  *
  * Scale shape: each round is two equi-joins of the edge table
  * against the alive set plus one partial-agg degree count — all
  * shuffles keyed on node ids, nothing quadratic, and the alive set
  * only shrinks (AQE switches the probe joins to broadcast as it
  * collapses). The undirected edge table is deduplicated ONCE and
  * lineage-cut; each round's alive frame is cut too (the d9 rule:
  * O(rounds) join lineage would otherwise stack into one plan). The
  * convergence count rides the already-materialized cut frame, so
  * it costs one count job per round, never a recompute.
  */
object KCore {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Peel outcome: the surviving core (node, core_deg), whether the
    * peel reached its fixpoint inside the round cap, and how many
    * rounds actually ran.
    */
  final case class PeelResult(core: DataFrame, converged: Boolean, roundsRun: Int)

  /** Peel to the fixpoint or `maxRounds`, whichever comes first;
    * `core` holds (node, core_deg) for the nodes alive after the last
    * round, with their degree inside the previous alive set (the
    * degree the surviving filter saw).
    *
    * `edges` is directed (src, dst); self-loops are dropped and each
    * edge contributes both directions, deduplicated.
    */
  def peelDetailed(nodes: DataFrame, edges: DataFrame, k: Int,
      maxRounds: Int): PeelResult = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges.filter(col("src") =!= col("dst"))
    val und = Checkpoints.cut(
      e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(), eager = true)
    var alive = nodes.select(col("node"))
    // |alive_0|: alive shrinks monotonically, so count equality across
    // consecutive rounds IS set equality — the fixpoint test
    var prev = alive.count()
    // The per-round cut carries (src, core_deg) — the SURVIVORS, not
    // just their ids (r20): the final core frame is then a projection
    // of the already-materialized last round instead of a recompute of
    // its whole join chain (the old 1-column alive cut forced the
    // caller's action to re-run round r's two joins + degree agg end
    // to end). The alive set and the convergence count are both
    // block-served projections of the same cut.
    var surv: DataFrame = null
    var converged = false
    var r = 0
    while (r < maxRounds && !converged) {
      // dst-probe first, src-probe second: the last join keys the
      // stream on src, which is exactly the degree agg's clustering —
      // at real shuffle sizes the agg reuses that exchange instead of
      // adding its own (locally AQE broadcasts both probes and the
      // order is neutral). Inner joins commute; rows are identical.
      val deg = und
        .join(alive.select(col("node").as("dst")), "dst")
        .join(alive.select(col("node").as("src")), "src")
        .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      surv = Checkpoints.cut(deg.filter(col("core_deg") >= k), eager = true)
      alive = surv.select(col("src").as("node"))
      val c = alive.count()
      converged = c == prev
      prev = c
      r += 1
    }
    if (!converged)
      log.warn(s"k-core peel hit the $maxRounds-round cap without " +
        s"converging (|alive| still shrinking at $prev) — the result " +
        "contains un-peeled under-degree nodes; raise maxRounds")
    PeelResult(
      surv.select(col("src").as("node"), col("core_deg")),
      converged, r)
  }

  /** The core frame alone (fixed-cap form the oracled entry uses). */
  def peel(nodes: DataFrame, edges: DataFrame, k: Int, rounds: Int): DataFrame =
    peelDetailed(nodes, edges, k, rounds).core
}
