package graft.operators

import graft.GraftSession.table
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 corpus-preparation operators (SURVEY.md §2.5/§2.3):
  * token-window chunking, corpus-unigram LM quality scoring, and
  * URL-canonicalization dedup. Same design rules as PipelineQueries:
  * pure Column algebra or equi-join shapes, DuckDB oracles with
  * drift-free math (SURVEY.md §5).
  */
object CorpusQueries {

  // ---------------------------------------------------------------
  // t11: token-window chunking
  // ---------------------------------------------------------------

  /** Chunk size / stride in tokens. 64/48 = 16-token overlap: the
    * shape every context-bounded training/embedding pipeline uses so
    * no boundary-spanning passage is lost to a hard cut.
    */
  val ChunkSize = 64
  val ChunkStride = 48

  /** §2.5 t11: split each document's token sequence into fixed-size
    * overlapping windows and emit (doc_id, chunk_idx, token count,
    * content hash) per chunk.
    *
    * Shape: tokenize (narrow) → posexplode over the stride start
    * positions (Generate — the fan-out is the OUTPUT size, there is
    * no join and no shuffle until the final sort). `slice` on the
    * carried token array is O(chunk) per output row; at 100 TB the
    * operator is embarrassingly parallel and shuffle-free — output
    * rows ≈ input tokens / stride.
    */
  def t11Chunk(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val toks = docs
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") > 0)
    toks
      .select(col("doc_id"), col("toks"),
        // last start = greatest multiple of the stride <= n_tok - 1;
        // n_tok >= 1 here so the subtraction form never goes negative
        posexplode(sequence(lit(0),
          (col("n_tok") - 1) - pmod(col("n_tok") - 1, lit(ChunkStride)),
          lit(ChunkStride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tok"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val t11ChunkSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x != '') AS toks
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, toks, len(toks) AS n_tok FROM d WHERE len(toks) > 0
      |), s AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(0, ((n_tok - 1) // $ChunkStride) * $ChunkStride, $ChunkStride)) AS start
      |  FROM n
      |)
      |SELECT doc_id, CAST(start // $ChunkStride AS INT) AS chunk_idx,
      |  CAST(len(list_slice(toks, start + 1, start + $ChunkSize)) AS BIGINT) AS n_chunk_tok,
      |  md5(array_to_string(list_slice(toks, start + 1, start + $ChunkSize), ' ')) AS chunk_hash
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------
  // t12: corpus-unigram LM score
  // ---------------------------------------------------------------

  /** §2.5 t12: corpus-unigram log-likelihood per document — the
    * CCNet-style "how typical is this doc under the corpus' own token
    * distribution" quality signal. HIGH avg_logcnt = made of very
    * common tokens (template/boilerplate); LOW = rare-token soup
    * (garbled text, wrong language). t2/t8/t10 score each doc in
    * isolation; this is the cross-doc statistic. The true avg log
    * p(token) is avg_logcnt − ln N (N = corpus tokens), a constant
    * shift that changes no per-doc comparison, so the constant is
    * deliberately dropped: keeping it would cost a second full agg
    * branch over the corpus just to compute one scalar.
    *
    * Shape — ONE corpus scan: (doc, term) partial-agg shuffle for tf,
    * then corpus term counts as a WINDOW sum over the term key
    * (instead of a separate groupBy branch + join, which re-scans the
    * corpus: column pruning makes the branch subtrees unequal, so
    * ReuseExchange cannot deduplicate them — measured 3 scans), then
    * the doc-key fold. Nothing quadratic, no vocabulary broadcast.
    * ln on integer inputs is IEEE-identical across engines; the
    * summation-order drift is absorbed by 6dp rounding (SURVEY §5,
    * precedent t7/t10).
    */
  def t12UnigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val occ = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
    val tf = occ.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    tf.withColumn("cnt", sum(col("tf")).over(wTerm))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tok"),
        round(sum(col("tf").cast("double") * log(col("cnt").cast("double"))) /
          sum(col("tf")), 6).as("avg_logcnt"))
      .orderBy(col("doc_id"))
  }

  val t12UnigramLogprobSql: String =
    """WITH occ AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x != '')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY 1, 2
      |), wc AS (
      |  SELECT doc_id, tf, sum(tf) OVER (PARTITION BY term) AS cnt FROM tf
      |)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
      |  round(sum(tf * ln(cnt)) / sum(tf), 6) AS avg_logcnt
      |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // t15: per-source vocabulary drift (KL from the corpus mixture)
  // ---------------------------------------------------------------

  /** §2.5 t15: distributional drift per source — KL(source ‖ corpus)
    * over unigram distributions, the corpus-monitoring statistic that
    * flags a domain whose language shifted relative to the mixture
    * (scraper regressions, a source turning into boilerplate, a
    * license change swapping content). t12 scores each DOC under the
    * corpus; this scores each SOURCE's whole distribution, so it
    * catches drift no per-doc filter sees.
    *
    * Shape: one (source, term) partial-agg shuffle builds the tf
    * table, which is lineage-CUT (Checkpoints.cut — the d9 artifact
    * rule applied in-plan): three consumers branch off it (term
    * totals, source census, corpus total) and column pruning makes
    * their subtrees non-identical, so without the cut ReuseExchange
    * recomputes the corpus tokenize 3× (t12's documented limitation —
    * acceptable for its two branches, not for the heaviest scan ×3).
    * Corpus term totals via a term-partition window over the cut
    * frame (vocabulary SHUFFLES, never broadcast — t12's rule);
    * per-source token totals reduce to a source-cardinality census
    * that joins back broadcast, and the corpus total is a 1-row
    * broadcast (t7's rule). Final rollup is a source-key partial agg.
    *
    * Oracle parity: every ln argument is one IEEE division of
    * exactly-representable integer products (c_st·N_c ≤ ~1e12 ≪ 2^53),
    * weights are int-ratio doubles, and the per-source sum is rounded
    * to 6dp to absorb summation-order drift (SURVEY §5, t10/t12
    * precedent).
    */
  def t15VocabDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val occ = docs.select(col("source"), explode(wsTokens(col("text"))).as("term"))
    val tf = Checkpoints.cut(
      occ.groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st")))
    val srcTot = tf.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val corpusTot = srcTot.agg(sum(col("n_s")).as("n_c"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    tf.withColumn("c_ct", sum(col("c_st")).over(wTerm))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(corpusTot))
      .groupBy(col("source"))
      .agg(max(col("n_s")).cast("long").as("n_tok"),
        count(lit(1)).cast("long").as("vocab"),
        round(sum(col("c_st").cast("double") / col("n_s") *
          log((col("c_st") * col("n_c")).cast("double") /
            (col("n_s") * col("c_ct")).cast("double"))), 6).as("kl_nats"))
      .orderBy(col("source"))
  }

  val t15VocabDriftSql: String =
    """WITH occ AS (
      |  SELECT source,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x != '')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT source, term, count(*) AS c_st FROM occ GROUP BY 1, 2
      |), st AS (
      |  SELECT source, sum(c_st) AS n_s FROM tf GROUP BY 1
      |), tot AS (
      |  SELECT sum(n_s) AS n_c FROM st
      |), tt AS (
      |  SELECT source, term, c_st,
      |    sum(c_st) OVER (PARTITION BY term) AS c_ct
      |  FROM tf
      |)
      |SELECT t.source, CAST(max(s.n_s) AS BIGINT) AS n_tok,
      |  CAST(count(*) AS BIGINT) AS vocab,
      |  round(sum(CAST(t.c_st AS DOUBLE) / s.n_s *
      |    ln(CAST(t.c_st * c.n_c AS DOUBLE) /
      |       CAST(s.n_s * t.c_ct AS DOUBLE))), 6) AS kl_nats
      |FROM tt t JOIN st s USING (source) CROSS JOIN tot c
      |GROUP BY t.source ORDER BY t.source""".stripMargin

  // ---------------------------------------------------------------
  // q_pagerank: crawl-authority scoring
  // ---------------------------------------------------------------

  /** §2.2 q_pagerank: fixed-iteration PageRank over a deterministic
    * doc_id-derived link graph (the corpus ships no link column, so
    * the entry plants one — t6/d12's recipe). The maps must NOT be
    * bijections mod N (a linear a·x+b with gcd(a,N)=1 gives every
    * node in-degree exactly 1 → uniform ranks, a vacuous entry):
    * node² spreads in-degree unevenly, node mod 97 concentrates
    * authority on 97 hubs, and every third node gets a THIRD
    * out-edge so the graph is IRREGULAR (out-degree 2 or 3) and the
    * entry exercises the general per-node-degree form
    * (`PageRank.ranksByDegree`). The oracle unrolls the same 5
    * iterations as chained CTEs with the same degree table.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    PageRank.ranksByDegree(nodes, plantedEdges(nodes, n)).orderBy(col("node"))
  }

  /** The deterministic doc_id-derived link graph shared by
    * q_pagerank and q_triangles (see qPagerank's Scaladoc for why
    * the maps are deliberately non-bijective and irregular).
    */
  private def plantedEdges(nodes: DataFrame, n: Long): DataFrame =
    nodes.select(col("node").as("src"),
        pmod(col("node") * col("node") + 13, lit(n)).as("dst"))
      .unionByName(nodes.select(col("node").as("src"),
        pmod(col("node"), lit(97L)).as("dst")))
      .unionByName(nodes.filter(pmod(col("node"), lit(3L)) === 0)
        .select(col("node").as("src"),
          pmod(col("node") * 5 + 41, lit(n)).as("dst")))

  val qPagerankSql: String = {
    // integer micro-units: per-src contribution = round(u/deg) — one
    // IEEE division of exact ints, identical in any engine — and the
    // per-dst sum is exact (see PageRank Scaladoc)
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.node,
         |    CAST(round(150000 + 0.85 * coalesce(sum(t.c), 0)) AS BIGINT) AS u
         |  FROM nodes n
         |  LEFT JOIN (SELECT e.dst, CAST(round(r.u / d.d) AS BIGINT) AS c
         |             FROM edges e
         |             JOIN deg d ON d.src = e.src
         |             JOIN $prev r ON r.node = e.src) t ON t.dst = n.node
         |  GROUP BY n.node)""".stripMargin
    s"""WITH c AS (SELECT count(*) AS cnt FROM documents),
      |nodes AS (SELECT doc_id AS node FROM documents),
      |edges AS (
      |  SELECT node AS src, (node * node + 13) % cnt AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, node % 97 AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, (node * 5 + 41) % cnt AS dst
      |  FROM nodes CROSS JOIN c WHERE node % 3 = 0),
      |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS u FROM nodes),
      |${iter("r0", "r1")},
      |${iter("r1", "r2")},
      |${iter("r2", "r3")},
      |${iter("r3", "r4")},
      |${iter("r4", "r5")}
      |SELECT node, u / 1000000.0 AS rank6 FROM r5 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------
  // q_kcore: k-core peeling
  // ---------------------------------------------------------------

  /** Core threshold / peel rounds for the q_kcore entry. k = 3 keeps
    * the planted graph non-vacuous at every SF (hub-adjacent nodes
    * survive, tendrils peel); 6 fixed rounds reach the fixpoint on
    * the test corpora (KCoreSpec asserts a 7th round is a no-op).
    */
  val KCoreK = 3
  val KCoreRounds = 6

  /** §2.2 q_kcore: k-core decomposition of the planted link graph
    * (`operators.KCore`) — the density filter that peels link farms
    * and tendrils while keeping genuinely interlinked cores; the
    * iterative-FILTER fixpoint completing the graph family (PageRank:
    * numeric, d9 components: label, triangles: motif). Fixed-round
    * peel (PageRank's rule), so the oracle unrolls the same rounds as
    * chained CTEs over the same undirected edge table.
    */
  def qKcore(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    KCore.peel(nodes, plantedEdges(nodes, n), k = KCoreK, rounds = KCoreRounds)
      .orderBy(col("node"))
  }

  val qKcoreSql: String = {
    def round(prev: String, d: String, out: String): String =
      s"""$d AS (
         |  SELECT e.src AS node, count(*) AS d
         |  FROM und e
         |  JOIN $prev x ON x.node = e.src
         |  JOIN $prev y ON y.node = e.dst
         |  GROUP BY 1),
         |$out AS (SELECT node FROM $d WHERE d >= $KCoreK)""".stripMargin
    s"""WITH c AS (SELECT count(*) AS cnt FROM documents),
      |nodes AS (SELECT doc_id AS node FROM documents),
      |edges AS (
      |  SELECT node AS src, (node * node + 13) % cnt AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, node % 97 AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, (node * 5 + 41) % cnt AS dst
      |  FROM nodes CROSS JOIN c WHERE node % 3 = 0),
      |und AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM edges WHERE src != dst
      |    UNION ALL
      |    SELECT dst AS src, src AS dst FROM edges WHERE src != dst)),
      |a0 AS (SELECT node FROM nodes),
      |${round("a0", "d1", "a1")},
      |${round("a1", "d2", "a2")},
      |${round("a2", "d3", "a3")},
      |${round("a3", "d4", "a4")},
      |${round("a4", "d5", "a5")},
      |${round("a5", "d6", "a6")}
      |SELECT node, CAST(d AS BIGINT) AS core_deg
      |FROM d6 WHERE d >= $KCoreK ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------
  // q_triangles: degree-oriented triangle counting
  // ---------------------------------------------------------------

  /** §2.2 q_triangles: per-node triangle counts over the planted
    * link graph (crawl-graph motif analysis — triangle density is
    * the classic community/spam signal next to PageRank's
    * authority). Algorithm: canonicalize to undirected distinct
    * edges (self-loops dropped) → compute degrees → ORIENT each edge
    * from its lower-(degree, id) endpoint to the higher one → join
    * oriented out-edges on their source to enumerate wedges → close
    * each wedge against the oriented edge between its endpoints.
    *
    * The orientation is the point at scale: out-degree in the
    * oriented graph is O(√m), so the wedge self-join materializes
    * Σ outdeg² = O(m^1.5) rows instead of Σ deg² — a hub with a
    * million followers contributes NOTHING to the wedge fan-out
    * (all its edges point INTO it), which is what makes triangle
    * counting survive power-law graphs. Every step is an equi-join
    * or partial agg; each triangle is produced exactly once (its
    * lowest-ordered vertex is the unique wedge center whose closing
    * edge is oriented forward). The oracle replays the identical
    * orientation in SQL.
    */
  def qTriangles(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    // lineage-cut the two multi-consumer frames (t15's rule — the
    // repo's other graph kernels already do this): `und` feeds deg's
    // two union legs AND orient's join input, `orient` feeds both
    // wedge self-join sides AND the closing tri join — uncut, the
    // edge-derivation subtree replicated 270 parquet-scan nodes into
    // the initial plan (r19 measured, plans/r19/q_triangles_before:
    // 270 scans/256 HashAggregates → after: 0/4; isolated sf0.1
    // median 2.66 → 1.41 s with the cuts alone, 0.70 with the
    // session relation memo on top)
    val und = Checkpoints.cut(plantedEdges(nodes, n)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct())
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val orient = Checkpoints.cut(und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v")))
    val e1 = orient.select(col("u"), col("v").as("y"))
    val e2 = orient.select(col("u"), col("v").as("z"))
    val wedges = e1.join(e2, "u").filter(col("y") =!= col("z"))
    val tri = wedges.join(
      orient.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
    tri.select(col("u").as("node"))
      .unionByName(tri.select(col("y").as("node")))
      .unionByName(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("node"))
  }

  val qTrianglesSql: String =
    """WITH c AS (SELECT count(*) AS cnt FROM documents),
      |nodes AS (SELECT doc_id AS node FROM documents),
      |edges AS (
      |  SELECT node AS src, (node * node + 13) % cnt AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, node % 97 AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, (node * 5 + 41) % cnt AS dst
      |  FROM nodes CROSS JOIN c WHERE node % 3 = 0),
      |und AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM edges WHERE src != dst),
      |deg AS (
      |  SELECT node, count(*) AS d FROM
      |    (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
      |  GROUP BY node),
      |orient AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS u,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS v
      |  FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
      |tri AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM orient e1
      |  JOIN orient e2 ON e2.u = e1.u AND e1.v != e2.v
      |  JOIN orient e3 ON e3.u = e1.v AND e3.v = e2.v)
      |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM
      |  (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      |GROUP BY node ORDER BY node""".stripMargin

  // ---------------------------------------------------------------
  // q_reach: multi-source BFS distance
  // ---------------------------------------------------------------

  /** Fixed relaxation rounds for q_reach: hop distances are exact for
    * every node within 4 hops of a seed (the frontier the entry
    * reports). Fixed rounds = engine-portable plan (PageRank/KCore's
    * rule); ReachSpec asserts a 5th round leaves every already-known
    * distance unchanged (min-relaxation is monotone).
    */
  val ReachRounds = 4

  /** §2.2 q_reach: multi-source BFS hop distance over the planted
    * link graph (`operators.Reach`) — seeds (every 250th node: a
    * count that scales with the corpus) relax their distance along
    * DIRECTED edges for a fixed number of rounds (PageRank/KCore's
    * engine-portable-plan rule). Reachability/distance is the fourth
    * leg of the graph family: PageRank (numeric fixpoint), k-core
    * (filter fixpoint), triangles (motif), BFS (frontier traversal —
    * crawl-depth and link-distance labeling). The oracle unrolls the
    * identical rounds as chained CTEs.
    */
  def qReach(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    val edges = Checkpoints.cut(
      plantedEdges(nodes, n).filter(col("src") =!= col("dst")).distinct())
    val seeds = nodes.filter(pmod(col("node"), lit(250L)) === 0)
      .select(col("node"), lit(0L).as("dist"))
    Reach.distances(seeds, edges, ReachRounds).orderBy(col("node"))
  }

  val qReachSql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, r.dist + 1 AS dist
         |    FROM $prev r JOIN edges e ON e.src = r.node)
         |  GROUP BY node)""".stripMargin
    s"""WITH c AS (SELECT count(*) AS cnt FROM documents),
      |nodes AS (SELECT doc_id AS node FROM documents),
      |raw AS (
      |  SELECT node AS src, (node * node + 13) % cnt AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, node % 97 AS dst FROM nodes CROSS JOIN c
      |  UNION ALL
      |  SELECT node AS src, (node * 5 + 41) % cnt AS dst
      |  FROM nodes CROSS JOIN c WHERE node % 3 = 0),
      |edges AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
      |r0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 250 = 0),
      |${round("r0", "r1")},
      |${round("r1", "r2")},
      |${round("r2", "r3")},
      |${round("r3", "r4")}
      |SELECT node, CAST(dist AS BIGINT) AS dist FROM r4 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------
  // d12: URL-canonicalization dedup
  // ---------------------------------------------------------------

  /** Canonicalize a URL column: lowercase, strip scheme / www. /
    * fragment / query / port / trailing slash. Every pattern is
    * anchored or appears at most once in a URL, so Spark's
    * replace-all and DuckDB's replace-first agree; no backreferences
    * (replacement syntax differs between engines). Narrow map.
    */
  def canonicalUrl(c: Column): Column = {
    val steps = Seq(
      "^https?://" -> "", // scheme
      "^www\\." -> "", // www prefix
      "#.*$" -> "", // fragment
      "\\?.*$" -> "", // query string
      ":[0-9]+" -> "", // port (colon appears only there in a URL authority)
      "/$" -> "") // trailing slash
    steps.foldLeft(lower(c)) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
  }

  /** The same chain as DuckDB SQL over a column expression. */
  def canonicalUrlSql(inner: String): String =
    Seq("'^https?://'", "'^www\\.'", "'#.*$'", "'\\?.*$'", "':[0-9]+'", "'/$'")
      .foldLeft(s"lower($inner)")((acc, pat) => s"regexp_replace($acc, $pat, '')")

  /** §2.3 d12: URL dedup — crawl snapshots hold the same page under
    * scheme/case/www/port/query/fragment variants; doc-text dedup
    * (d1) catches them only when the page bytes are identical, URL
    * canonicalization catches the re-crawls regardless. The corpus
    * has no URL column, so the entry PLANTS deterministic
    * doc_id-derived URLs covering all variant classes (same recipe
    * both sides, like t6's planted PII), then groups by canonical
    * form: one narrow map + ONE hash shuffle, d1's exact shape.
    */
  def d12UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val u = pmod(col("doc_id"), lit(150L)).cast("string") // page id: ~N/150 docs share one page
    val dom = pmod(pmod(col("doc_id"), lit(150L)), lit(7L)).cast("string") // 7 synthetic domains
    val v = pmod(expr("doc_id div 150"), lit(4L)) // variant class per re-crawl
    val base = concat(lit("example"), dom, lit(".com/p/"), u)
    val raw = when(v === 0, concat(lit("https://"), base))
      .when(v === 1, concat(lit("http://www."), base, lit("/")))
      .when(v === 2, upper(concat(lit("https://"), base, lit("?utm_source=feed"))))
      .otherwise(concat(lit("https://example"), dom, lit(".com:443/p/"), u, lit("#top")))
    docs.select(col("doc_id"), raw.as("url"))
      .groupBy(canonicalUrl(col("url")).as("canonical"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("rep_doc"),
        countDistinct(col("url")).as("n_forms"))
      .orderBy(col("canonical"))
  }

  val d12UrlDedupSql: String = {
    val canon = canonicalUrlSql("url")
    """WITH planted AS (
      |  SELECT doc_id,
      |    CASE (doc_id // 150) % 4
      |      WHEN 0 THEN 'https://example' || (doc_id % 150) % 7 || '.com/p/' || doc_id % 150
      |      WHEN 1 THEN 'http://www.example' || (doc_id % 150) % 7 || '.com/p/' || doc_id % 150 || '/'
      |      WHEN 2 THEN upper('https://example' || (doc_id % 150) % 7 || '.com/p/' || doc_id % 150 || '?utm_source=feed')
      |      ELSE 'https://example' || (doc_id % 150) % 7 || '.com:443/p/' || doc_id % 150 || '#top'
      |    END AS url
      |  FROM documents
      |)
      |SELECT CANON AS canonical, count(*) AS n_docs,
      |  min(doc_id) AS rep_doc, CAST(count(DISTINCT url) AS BIGINT) AS n_forms
      |FROM planted GROUP BY 1 ORDER BY canonical""".stripMargin
      .replace("CANON", canon)
  }

  // ---------------------------------------------------------------
  // t23: vocabulary growth curve (Heaps' law monitor)
  // ---------------------------------------------------------------

  /** Number of growth checkpoints for t23 — FIXED, so the cumulative
    * window runs over ≤ 20 rows whatever the corpus size (a
    * fixed-stride curve would grow the checkpoint table with the
    * corpus and turn the cumulative into an unbounded global window).
    */
  val GrowthBuckets = 20L

  /** §2.5 t23: vocabulary growth curve — cumulative distinct-term
    * count (and cumulative tokens) at 20 evenly-spaced corpus
    * checkpoints, in ingestion (doc_id) order: the Heaps'-law
    * monitor. A healthy diverse corpus keeps minting new vocabulary
    * (V ∝ N^β, β≈0.5); a curve that flattens early says the tail of
    * the crawl is boilerplate/duplication — the earliest cheap signal
    * that more data is not more information.
    *
    * Shape: "vocabulary at checkpoint k" needs no distinct-count per
    * prefix (which would be 20 corpus scans): a term is new at the
    * checkpoint of its FIRST occurrence, so one (term → min doc_id)
    * partial-agg shuffle + a 20-row bucket census + a ≤20-row
    * cumulative window gives every checkpoint at once. Token totals
    * ride the same bucket key from a per-doc census. The stride
    * derives from max(doc_id) via one 1-row broadcast — everything
    * else is integer arithmetic.
    */
  def t23VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val occ = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
    val maxd = docs.agg(max(col("doc_id")).as("maxd"))
    // stride s = ceil((maxd+1)/buckets); bucket = doc_id div s ∈ [0, 20)
    // ONE tokenize pass (r19): bucket each occurrence row up front and
    // partial-agg to the (bucket, term) frame — ≤ 20 rows per term —
    // then derive BOTH branches from that cut frame instead of
    // re-evaluating the explode subtree per branch (Spark does not CSE
    // across join/agg consumers; t7's window-dfreq rule, same family).
    //   new_terms(b): a term is new in its MINIMUM bucket — bucket =
    //     doc_id div s is monotone in doc_id (ids nonnegative, s ≥ 1),
    //     so min(bucket) == bucket(min(doc_id)), the previous form.
    //   bucket_toks(b): per-bucket token count = Σ per-(b, term) tfs
    //     (the previous per-doc census summed the same occurrence rows).
    val g = Checkpoints.cut(occ
      .crossJoin(broadcast(maxd))
      .select(expr(s"doc_id div (((maxd + 1) + ${GrowthBuckets - 1}) div $GrowthBuckets)").as("b"),
        col("term"))
      .groupBy(col("b"), col("term")).agg(count(lit(1)).as("tf")))
    val first = g.groupBy(col("term")).agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("new_terms"))
    val toks = g.groupBy(col("b")).agg(sum(col("tf")).as("bucket_toks"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.join(first, Seq("b"), "left")
      .withColumn("cum_tokens", sum(col("bucket_toks")).over(w).cast("long"))
      .withColumn("cum_vocab",
        sum(coalesce(col("new_terms"), lit(0L))).over(w).cast("long"))
      .select(col("b").cast("long").as("checkpoint"), col("cum_tokens"),
        col("cum_vocab"))
      .orderBy(col("checkpoint"))
  }

  val t23VocabGrowthSql: String =
    s"""WITH occ AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x != '')) AS term
      |  FROM documents
      |), m AS (
      |  SELECT ((max(doc_id) + 1) + ${GrowthBuckets - 1}) // $GrowthBuckets AS s
      |  FROM documents
      |), first AS (
      |  SELECT fd // s AS b, count(*) AS new_terms
      |  FROM (SELECT term, min(doc_id) AS fd FROM occ GROUP BY term) f
      |    CROSS JOIN m
      |  GROUP BY fd // s
      |), toks AS (
      |  SELECT doc_id // s AS b, sum(n_tok) AS bucket_toks
      |  FROM (SELECT doc_id, count(*) AS n_tok FROM occ GROUP BY doc_id) t
      |    CROSS JOIN m
      |  GROUP BY doc_id // s
      |)
      |SELECT CAST(b AS BIGINT) AS checkpoint,
      |  CAST(sum(bucket_toks) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
      |  CAST(sum(coalesce(new_terms, 0)) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
      |FROM toks LEFT JOIN first USING (b)
      |ORDER BY checkpoint""".stripMargin

  // ---------------------------------------------------------------
  // t25: lexical diversity per source (TTR + Simpson repeat index)
  // ---------------------------------------------------------------

  /** §2.5 t25: per-source lexical diversity — type-token ratio and
    * the Simpson repeat index Σ tf·(tf−1) / (N·(N−1)) (the
    * probability two random tokens are the SAME type; high ⇒
    * template/boilerplate sources, low ⇒ diverse prose). The corpus-
    * curation dashboard stat for spotting degenerate sources that
    * per-DOC repetition filters (t8) miss because the repetition is
    * ACROSS documents.
    *
    * Both ratios are exact integer micro-units: V·10⁶ // N and
    * Σtf(tf−1)·10⁶ // N(N−1) — no float summation anywhere, with the
    * tf(tf−1) products, their sum, and the ×10⁶ micro-scalings in
    * decimal(38,0) (`DecimalMath`): Σtf(tf−1) crosses 2⁶³ at a
    * single term with tf ≈ 3×10⁹ per source — plausible precisely
    * for the cross-document boilerplate this metric exists to flag —
    * where int64 wraps silently while DuckDB promotes to HUGEINT.
    * Decimal is exact while Σtf(tf−1)·10⁶ < 10³⁸, i.e. Σtf² ≲ 10³²
    * — ~10¹⁶ tokens/source in the worst (single-term) case; beyond
    * that Spark yields NULL rather than a wrong value.
    *
    * Shape: one (source, term) partial-agg shuffle (map-side combine
    * collapses the token stream), then a source-key rollup —
    * shuffle volume O(source·vocab), never O(tokens). No collects;
    * sources are the natural unit of parallelism at corpus scale.
    */
  def t25LexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DecimalMath.{dec, microRatio}
    table(spark, dir, "documents")
      .select(col("source"), explode(wsTokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(dec(col("tf")) * (col("tf") - 1)).as("rep_pairs"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        microRatio(col("n_types"), col("n_tokens")).as("ttr_micro"),
        microRatio(col("rep_pairs"),
          dec(col("n_tokens")) * (col("n_tokens") - 1)).as("simpson_micro"))
      .orderBy(col("source"))
  }

  val t25LexicalDiversitySql: String =
    """WITH occ AS (
      |  SELECT source,
      |    unnest(list_filter(string_split_regex(lower(trim(text)), ' +'),
      |           x -> x != '')) AS term
      |  FROM documents),
      |g AS (
      |  SELECT source, term, count(*) AS tf FROM occ GROUP BY 1, 2),
      |s AS (
      |  SELECT source, sum(tf) AS n_tokens, count(*) AS n_types,
      |    sum(tf * (tf - 1)) AS rep_pairs
      |  FROM g GROUP BY 1)
      |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_types AS BIGINT) AS n_types,
      |  CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_micro,
      |  CAST(rep_pairs * 1000000 // (n_tokens * (n_tokens - 1)) AS BIGINT)
      |    AS simpson_micro
      |FROM s ORDER BY source""".stripMargin
}
