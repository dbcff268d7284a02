package graft.operators

import graft.GraftSession.table
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 widening of the operator inventory (SURVEY.md §2.2/§2.5/
  * §2.8 additions): set operations, cube/grouping sets, exact
  * percentiles, bucketed range join, JSON extraction, explode/word
  * count, regex extraction, sequence packing, stratified sampling.
  *
  * Same oracle-parity rules as everywhere else (SURVEY.md §5):
  * drift-free measures, identical aliases both sides, events.ts
  * truncated ns→µs on the DuckDB side to mirror the Spark scan.
  */
object Extended {

  private val evMicros =
    "SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events"

  /** INTERSECT / EXCEPT with SQL set semantics (distinct): part keys
    * seen on heavy lineitems vs. large-size catalog parts. Both are
    * shuffles on the full row — Catalyst plans them as aggregates.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").filter(col("l_quantity") >= 49)
      .select(col("l_partkey").as("key"))
    val pt = table(spark, dir, "part").filter(col("p_size") >= 25)
      .select(col("p_partkey").as("key"))
    li.intersect(pt).withColumn("tag", lit("both"))
      .unionByName(li.except(pt).withColumn("tag", lit("li_only")))
      .unionByName(pt.except(li).withColumn("tag", lit("part_only")))
      .orderBy(col("tag"), col("key"))
  }

  val qSetOpsSql: String =
    """WITH li AS (SELECT l_partkey AS key FROM lineitem WHERE l_quantity >= 49),
      |     pt AS (SELECT p_partkey AS key FROM part WHERE p_size >= 25)
      |SELECT key, 'both' AS tag FROM (SELECT * FROM li INTERSECT SELECT * FROM pt)
      |UNION ALL
      |SELECT key, 'li_only' AS tag FROM (SELECT * FROM li EXCEPT SELECT * FROM pt)
      |UNION ALL
      |SELECT key, 'part_only' AS tag FROM (SELECT * FROM pt EXCEPT SELECT * FROM li)
      |ORDER BY tag, key""".stripMargin

  /** CUBE over (event_type, user_id mod 10) with grouping indicators —
    * all four aggregation levels in one shuffle.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("user_mod", col("user_id") % 10)
      .cube(col("event_type"), col("user_mod"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("user_mod")).cast("long").as("g_mod"))
      .orderBy(col("event_type").asc_nulls_first, col("user_mod").asc_nulls_first)

  val qCubeSql: String =
    """SELECT event_type, user_mod, count(*) AS n,
      |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents,
      |  CAST(grouping(event_type) AS BIGINT) AS g_type,
      |  CAST(grouping(user_mod) AS BIGINT) AS g_mod
      |FROM (SELECT event_type, user_id % 10 AS user_mod, value FROM events)
      |GROUP BY CUBE (event_type, user_mod)
      |ORDER BY event_type ASC NULLS FIRST, user_mod ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS via the engine's SQL entry (distinct from
    * rollup/cube: an arbitrary, non-hierarchical set list).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(
      """SELECT event_type, user_mod, count(*) AS n
        |FROM (SELECT event_type, user_id % 10 AS user_mod FROM events)
        |GROUP BY GROUPING SETS ((event_type), (user_mod), ())
        |ORDER BY event_type ASC NULLS FIRST, user_mod ASC NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT event_type, user_mod, count(*) AS n
      |FROM (SELECT event_type, user_id % 10 AS user_mod FROM events)
      |GROUP BY GROUPING SETS ((event_type), (user_mod), ())
      |ORDER BY event_type ASC NULLS FIRST, user_mod ASC NULLS FIRST""".stripMargin

  /** Time-based sliding window aggregation: RANGE frames bounded by an
    * INTERVAL over event time — "activity in the trailing 30 minutes"
    * per row without a self-join. Same single (user, ts-sorted)
    * shuffle as any analytic window; the frame bound does the range
    * scan incrementally. Expressed via spark.sql (the DataFrame
    * rangeBetween API takes only numeric offsets; SQL takes
    * intervals).
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events").createOrReplaceTempView("events_wr")
    spark.sql(
      """SELECT event_id,
        |  count(*) OVER w AS n_30m,
        |  CAST(sum(round(value * 100)) OVER w AS BIGINT) AS cents_30m
        |FROM events_wr WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  val qWindowRangeSql: String =
    """WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events)
      |SELECT event_id,
      |  count(*) OVER w AS n_30m,
      |  CAST(sum(round(value * 100)) OVER w AS BIGINT) AS cents_30m
      |FROM ev WHERE user_id <= 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** NULL semantics in one oracled snapshot: standard equality joins
    * drop null keys (every null-key probe is unmatched), `count(col)`
    * skips nulls while `count(*)` does not, and distinct counts
    * ignore nulls. The build side is DISTINCT non-null keys, so there
    * is no null-key fanout anywhere — the null-safe `<=>` join that
    * WOULD match nulls to each other is exactly the hot-key explosion
    * a 100 TB plan must avoid (nulls cluster on one reducer), and is
    * deliberately absent.
    */
  def qNullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_custkey")).as("ck"))
    val m = table(spark, dir, "customer")
      .filter(col("c_custkey") % 5 =!= 0)
      .select(col("c_custkey").as("mk")).distinct()
    o.join(m, col("ck") === col("mk"), "left")
      .groupBy(when(col("ck").isNull, lit("null_key")).otherwise(lit("keyed")).as("side"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("ck")).as("n_nonnull"),
        countDistinct(col("ck")).as("n_distinct"),
        sum(when(col("mk").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .orderBy(col("side"))
  }

  val qNullSemanticsSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS ck
      |  FROM orders WHERE o_orderkey <= 2000
      |), m AS (
      |  SELECT DISTINCT c_custkey AS mk FROM customer WHERE c_custkey % 5 != 0
      |)
      |SELECT CASE WHEN ck IS NULL THEN 'null_key' ELSE 'keyed' END AS side,
      |  count(*) AS n_rows,
      |  count(ck) AS n_nonnull,
      |  CAST(count(DISTINCT ck) AS BIGINT) AS n_distinct,
      |  CAST(sum(CASE WHEN mk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      |FROM o LEFT JOIN m ON o.ck = m.mk
      |GROUP BY 1 ORDER BY side""".stripMargin

  /** Statistical aggregates (correlation, population covariance /
    * stddev / variance) per group — population definitions are
    * identical across engines (sample-corrected skewness/kurtosis are
    * NOT, and are deliberately absent); 6-decimal rounding absorbs
    * summation-order float drift (relative error ~1e-14 at this
    * cardinality, far inside the rounding).
    */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 6).as("covar_qp"),
        round(stddev_pop(col("l_quantity")), 6).as("sd_q"),
        round(var_pop(col("l_quantity")), 6).as("var_q"))
      .orderBy(col("l_returnflag"))

  val qStatsAggSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_pop(l_quantity, l_extendedprice), 6) AS covar_qp,
      |  round(stddev_pop(l_quantity), 6) AS sd_q,
      |  round(var_pop(l_quantity), 6) AS var_q
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact percentiles (linear interpolation) per group. Quantities
    * are integer-valued doubles and the probe points are binary
    * fractions (k/4), so the interpolated values are exact in IEEE
    * doubles — drift-free across engines (SURVEY.md §5).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("ps"),
        min(col("l_quantity")).cast("long").as("q_min"),
        max(col("l_quantity")).cast("long").as("q_max"))
      .select(col("l_returnflag"), col("n"),
        element_at(col("ps"), 1).as("p25"),
        element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"),
        col("q_min"), col("q_max"))
      .orderBy(col("l_returnflag"))

  val qPercentilesSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  CAST(min(l_quantity) AS BIGINT) AS q_min,
      |  CAST(max(l_quantity) AS BIGINT) AS q_max
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bucketed trailing-window range join (operators.RangeJoin): clicks
    * in the 30 minutes before each purchase, per user. The oracle is a
    * plain (quadratic) SQL range join — an independent implementation.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    RangeJoin.trailingWindowCount(purchases, clicks, "user_id",
        "p_ts", "c_ts", windowSec = 1800L, countAlias = "n_clicks")
      .select(col("event_id"), col("user_id"), col("n_clicks"))
      .orderBy(col("event_id"))
  }

  val qRangeJoinSql: String =
    s"""WITH ev AS ($evMicros)
      |SELECT p.event_id, p.user_id, count(c.ts) AS n_clicks
      |FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts FROM ev WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
      |GROUP BY p.event_id, p.user_id
      |ORDER BY p.event_id""".stripMargin

  /** JSON property extraction (events.props is a JSON object) +
    * aggregation over the extracted field — get_json_object is
    * codegen'd, no UDF.
    */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("n_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val qJsonPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Explode → word count → global top-20: the canonical shuffle-heavy
    * text aggregation (Generate → partial agg → final agg → top-N).
    */
  def qExplodeWords(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(wsTokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  val qExplodeWordsSql: String =
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x != '')) AS word
      |  FROM documents
      |) GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** Regex extraction + occurrence counting over documents (filtered
    * to matching rows so no-match semantics can't diverge).
    */
  def qRegexExtract(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .filter(col("text").rlike("qu[a-z]+"))
      .select(col("doc_id"),
        regexp_extract(col("text"), "(qu[a-z]+)", 1).as("first_qu"),
        regexp_count(col("text"), lit("table")).cast("long").as("n_table"))
      .orderBy(col("doc_id"))

  val qRegexExtractSql: String =
    """SELECT doc_id,
      |  regexp_extract(text, '(qu[a-z]+)', 1) AS first_qu,
      |  len(regexp_extract_all(text, 'table')) AS n_table
      |FROM documents
      |WHERE regexp_matches(text, 'qu[a-z]+')
      |ORDER BY doc_id""".stripMargin

  /** §2.8 t5: sequence packing (operators.Packing) — 2048-token packs
    * per source shard, summarized per pack.
    */
  def t5Packing(spark: SparkSession, dir: String): DataFrame =
    Packing.assignPacks(
        table(spark, dir, "documents")
          .select(col("source"), col("doc_id"), col("text")),
        "source", "doc_id", bpeTokenCount(col("text")), budget = 2048L)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(bpeTokenCount(col("text"))).cast("long").as("tok_total"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"), col("pack_id"))

  val t5PackingSql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tok
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, n_tok,
      |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS tok_before
      |  FROM d
      |)
      |SELECT source, CAST(tok_before // 2048 AS BIGINT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_total,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM c GROUP BY source, tok_before // 2048
      |ORDER BY source, pack_id""".stripMargin

  /** Analytic-window breadth: lag/lead deltas, ntile quartiles,
    * first/last values per supplier timeline.
    */
  def qWindow2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    table(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") - lag(col("l_quantity"), 1).over(w)).cast("long").as("qty_delta"),
        lead(col("l_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        first(col("l_orderkey")).over(w).as("first_order"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val qWindow2Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(l_quantity - lag(l_quantity, 1) OVER w AS BIGINT) AS qty_delta,
      |  lead(l_orderkey, 1) OVER w AS next_order,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  first_value(l_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order
      |FROM lineitem
      |WHERE l_suppkey <= 10
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** §2.3 d7: edit-distance near-dup verification (levenshtein over a
    * deterministic candidate set — both engines implement the standard
    * DP distance). Candidates: same source, id gap ≤ 60. Distance runs
    * on the 200-char PREFIX: levenshtein is O(len²) per pair, so full
    * documents are quadratic-in-length blowup at scale — prefix
    * distance is the standard practical kernel (near-dups disagree
    * early), and it bounds per-pair cost to a constant.
    */
  def d7EditDist(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        substring(col("text"), 1, 200).as("t"))
    // Candidates via the gap-block equi-join (CandidatePairs): hot
    // sources never enumerate all their pairs. Compute-bound fan-out
    // (same reason as Dedup.shingleRows): a small corpus file is ONE
    // split and the exploded side broadcasts, so without an explicit
    // spread the whole DP-distance stage streams on 1 core (measured
    // 4.4s vs 0.6s at sf0.1). At 100 TB the input arrives in
    // thousands of splits and the join shuffles both sides anyway —
    // the repartition is the small-file measure, one reused shuffle.
    // The levenshtein threshold rides as the LAST join conjunct (see
    // idGapJoin doc) so it runs only on candidates that already
    // passed the cheap id checks.
    CandidatePairs.idGapJoin(
        docs.repartition(spark.sparkContext.defaultParallelism),
        "doc_id", "source", 60, Seq("t"),
        lastConjunct = levenshtein(col("t_a"), col("t_b")) <= 145)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("t_a"), col("t_b")).cast("long").as("edit_dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val d7EditDistSql: String =
    """WITH d AS (SELECT doc_id, source, substr(text, 1, 200) AS t FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist
      |FROM d a JOIN d b
      |  ON a.source = b.source AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 60
      |WHERE levenshtein(a.t, b.t) <= 145
      |ORDER BY id_a, id_b""".stripMargin

  /** §2.8 q_profile: one-pass column profiling (row count, null count,
    * exact distinct count, min/max) — the data-quality census every
    * ingestion run needs. ONE distributed aggregation pass over the
    * scan (all stats partial-agg map-side); the single stat row is
    * reshaped to per-column rows with `stack` (no extra scan).
    * Profiled columns avoid raw doubles (SURVEY.md §5): dates/strings
    * cast to identical text on both engines.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    profile(table(spark, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"))

  /** Census over `cols`. Two Expand-free passes:
    *   1. one plain agg for n_rows / nulls / min / max (all partial
    *      map-side, no distinct involved);
    *   2. exact distincts via melt: stack to (column, value) rows and
    *      `groupBy(column).agg(countDistinct(value))` — a SINGLE
    *      distinct aggregate per group plans as a two-phase agg with
    *      NO Expand, so the scan is never multiplied ×(cols+1) the
    *      way a one-pass multi-countDistinct is.
    * `approx = true` collapses back to one pass with HLL++
    * `approx_count_distinct` — the form a 100 TB census actually runs
    * (accuracy-bound spec'd in SketchSpec).
    */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        // min/max on the NATIVE type, cast the result to string: a string
        // cast first would give lexicographic extremes on numeric columns
        // (max over 1..15000 = "9999")
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max")) ++
        (if (approx) Seq(approx_count_distinct(col(c)).as(s"${c}_nd")) else Nil)
    }
    val stackedCols = (c: String) =>
      s"'$c', ${c}_nn, ${c}_min, ${c}_max" + (if (approx) s", ${c}_nd" else "")
    val outCols = "column, n_null, min_s, max_s" + (if (approx) ", n_distinct" else "")
    val stats = df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, ${cols.map(stackedCols).mkString(", ")}) AS ($outCols)")
    val profiled =
      if (approx) stats
      else {
        val melted = df.selectExpr(
          s"stack(${cols.size}, ${cols.map(c => s"'$c', cast($c as string)").mkString(", ")}) " +
            "AS (column, value)")
        val nd = melted.groupBy(col("column"))
          .agg(countDistinct(col("value")).as("n_distinct"))
        // LEFT join: on an empty input the melt produces no groups, but the
        // census must still report one row per column (n_distinct = 0)
        stats.join(nd, Seq("column"), "left")
          .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
      }
    profiled
      .select(col("column"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy(col("column"))
  }

  val qProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
    cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  min($c)::VARCHAR AS min_s, max($c)::VARCHAR AS max_s
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** Wide→long reshaping via the native unpivot (melt) operator, then
    * per-measure aggregation. Unpivot is a narrow map (each row emits
    * one row per measure column — no shuffle); the only exchange is
    * the final agg.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem").select(
      col("l_suppkey"),
      round(col("l_quantity")).cast("long").as("quantity"),
      round(col("l_extendedprice")).cast("long").as("extendedprice"),
      round(col("l_tax") * 100).cast("long").as("tax_pct"))
    li.unpivot(Array(col("l_suppkey")),
        Array(col("quantity"), col("extendedprice"), col("tax_pct")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .orderBy(col("measure"))
  }

  val qUnpivotSql: String =
    """SELECT measure, count(*) AS n, CAST(sum(value) AS BIGINT) AS total
      |FROM (
      |  UNPIVOT (SELECT l_suppkey,
      |             CAST(round(l_quantity) AS BIGINT) AS quantity,
      |             CAST(round(l_extendedprice) AS BIGINT) AS extendedprice,
      |             CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
      |           FROM lineitem)
      |  ON quantity, extendedprice, tax_pct
      |  INTO NAME measure VALUE value)
      |GROUP BY measure ORDER BY measure""".stripMargin

  /** Calendar extraction + aggregation (year/month/quarter rollup of
    * order totals).
    */
  def qDatetime(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice"))).cast("long").as("sum_total"))
      .orderBy(col("y"), col("q"), col("m"))

  val qDatetimeSql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS y,
      |  CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
      |  CAST(extract(month FROM o_orderdate) AS INT) AS m,
      |  count(*) AS n,
      |  CAST(sum(round(o_totalprice)) AS BIGINT) AS sum_total
      |FROM orders GROUP BY 1, 2, 3 ORDER BY y, q, m""".stripMargin

  /** Salted skew join (operators.SkewJoin): lineitem⋈supplier forced
    * through a shuffled hash join on (key, salt). The oracle is the
    * plain unsalted SQL join — identical results prove salt
    * invariance.
    */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    // shuffle_hash hint: a broadcast join would make salting a no-op
    // (nothing shuffles); the demo is the shuffled form
    val supp = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).hint("shuffle_hash")
    SkewJoin.saltedJoin(li, supp, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("long").as("revenue"))
      .orderBy(col("s_nationkey"))
  }

  val qSkewJoinSql: String =
    """SELECT s_nationkey, count(*) AS n,
      |  CAST(sum(round(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** §2.8 p3: stratified hash sampling — per-language keep rates
    * (corpus mixture reweighting), deterministic by md5(doc_id).
    */
  def p3Stratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(table(spark, dir, "documents"),
        "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.25), defaultRate = 0.1)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val p3StratifiedSql: String = {
    val (en, zh, dflt) = (Sampling.hexThreshold(0.5),
      Sampling.hexThreshold(0.25), Sampling.hexThreshold(0.1))
    s"""SELECT doc_id, lang FROM documents
      |WHERE substr(md5(doc_id::VARCHAR), 1, 8) <
      |  CASE lang WHEN 'en' THEN '$en' WHEN 'zh' THEN '$zh' ELSE '$dflt' END
      |ORDER BY doc_id""".stripMargin
  }

  /** §2.2 q_interval_join: two-sided interval-overlap self-join
    * (`operators.IntervalJoin`) — q_range_join pairs a POINT with a
    * trailing window; here BOTH rows carry an interval (overlapping
    * fulfillment windows per customer). Intervals derived
    * deterministically from orders: start = order day, span =
    * orderkey mod 14 days. The oracle is the plain quadratic
    * same-key overlap join — bucket-explosion invariance, like
    * q_skew_join's salt invariance.
    */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val iv = o.select(col("o_orderkey").as("id"), col("o_custkey").as("k"),
      datediff(to_date(col("o_orderdate")), lit("1992-01-01")).as("s"))
      .withColumn("e", col("s") + pmod(col("id"), lit(14L)))
    IntervalJoin.overlapPairs(iv, "id", "k", "s", "e", bucketWidth = 14L)
      .groupBy(col("key").as("o_custkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("overlap_len")).cast("long").as("sum_overlap"))
      .select(col("o_custkey"), col("n_pairs"), col("sum_overlap"))
      .orderBy(col("o_custkey"))
  }

  val qIntervalJoinSql: String =
    """WITH iv AS (
      |  SELECT o_orderkey AS id, o_custkey AS k,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS s,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      |      + o_orderkey % 14 AS e
      |  FROM orders)
      |SELECT a.k AS o_custkey, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s) + 1) AS BIGINT) AS sum_overlap
      |FROM iv a JOIN iv b
      |  ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
      |GROUP BY a.k ORDER BY o_custkey""".stripMargin

  /** §2.2 q_resample_ffill: time-series resampling onto a regular
    * hourly grid with forward-fill — the gap-filling step every
    * metrics/feature pipeline runs before joining event streams to a
    * fixed cadence (sensor readings, account balances, model-serving
    * stats). Each user's grid spans their own [first, last] event
    * hour; empty hours carry the last observed value forward.
    *
    * Shape: hourly partial-agg shuffle on (user, hour); per-user
    * bounds partial-agg; `sequence` + explode builds the grid with NO
    * generator table (fan-out ∝ output rows, t11's pattern); LEFT
    * join back on (user, hour); the forward-fill is
    * `last(ignoreNulls)` over an incremental ROWS frame on the SAME
    * user key — every shuffle is keyed, nothing global, grid size is
    * users × hours (output-bound, not input-bound).
    */
  def qResampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events").filter(col("user_id") < 100)
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_obs"),
        sum(round(col("value") * 100)).cast("long").as("cents"))
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("filled_cents"))
      .orderBy(col("user_id"), col("h"))
  }

  val qResampleFfillSql: String =
    """WITH ev AS (
      |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
      |  FROM events WHERE user_id < 100),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS n_obs,
      |    CAST(sum(round(value * 100)) AS BIGINT) AS cents
      |  FROM ev GROUP BY 1, 2),
      |bounds AS (
      |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
      |    date_trunc('hour', max(ts)) AS h1
      |  FROM ev GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM bounds)
      |SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS h,
      |  coalesce(n_obs, 0) AS n_obs,
      |  last_value(cents IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |FROM grid g LEFT JOIN hourly USING (user_id, h)
      |ORDER BY user_id, h""".stripMargin

  /** §2.2 q_variant: semi-structured data through the VARIANT type —
    * `parse_json` once into the binary variant encoding, then typed
    * `variant_get` extraction (the engine-native path for schema-on-
    * read JSON: parse cost paid once, extraction is a codegen'd
    * binary probe, not a per-access string re-parse like
    * `get_json_object` in q_json_props). The oracle extracts the same
    * typed field with DuckDB's JSON operators.
    */
  def qVariant(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(col("event_type"),
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val qVariantSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_k,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** §2.2 q_collect: ordered list aggregation — collect per-group
    * values into a deterministic delimited string (the "roll the
    * group up into one cell" report shape). Spark's collect_list has
    * no ordering contract, so the canonical form is collect → sort →
    * join, which equals DuckDB's string_agg(... ORDER BY). Grouped
    * state is the group's values (bounded by the dimension's fanout —
    * a rollup over a bounded dim, not a corpus-wide collect).
    */
  def qCollect(spark: SparkSession, dir: String): DataFrame = {
    val s = table(spark, dir, "supplier")
    val n = table(spark, dir, "nation")
    s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), "|").as("suppliers"))
      .orderBy(col("n_name"))
  }

  val qCollectSql: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  string_agg(s_name, '|' ORDER BY s_name) AS suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** §2.2 q_sequence_gaps: islands-and-gaps — find the missing runs
    * in a key sequence (dropped batches in an ingest ledger, holes in
    * an id space after deletes). lineitem covers only ~98% of the
    * order-key range, so the gaps are real. Delegates to the
    * SequenceGaps operator (see its Scaladoc for the scale shape:
    * one range-partition shuffle, per-partition sorted scan, fully
    * lazy distributed boundary fix-up — no Window, no global Sort
    * over the keys, no driver collect; SequenceGapsSpec pins both
    * the plan shape and adversarial boundary cases).
    */
  def qSequenceGaps(spark: SparkSession, dir: String): DataFrame =
    SequenceGaps.gaps(table(spark, dir, "lineitem"), "l_orderkey",
      spark.sessionState.conf.numShufflePartitions)

  val qSequenceGapsSql: String =
    """WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
      |n AS (SELECT k, lead(k) OVER (ORDER BY k) AS next_k FROM keys)
      |SELECT k + 1 AS gap_start, next_k - 1 AS gap_end,
      |  next_k - k - 1 AS gap_len
      |FROM n WHERE next_k - k > 1 ORDER BY gap_start""".stripMargin

  /** §2.2 q_first_touch: first/last-touch attribution via min_by /
    * max_by — ONE partial-agg pass instead of the two window sorts
    * the rank-and-filter form costs (and nothing materializes a
    * per-user ordering). Ties broken by a lexicographic
    * (epoch-µs, event_id) composite key, identical in both engines
    * (DuckDB's arg_min/arg_max take no composite ordering operand, so
    * the key is encoded as a zero-padded string).
    */
  def qFirstTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val key = concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lit("-"), lpad(col("event_id").cast("string"), 10, "0"))
    ev.select(col("user_id"), col("event_type"), key.as("ord"))
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"), col("ord")).as("first_type"),
        max_by(col("event_type"), col("ord")).as("last_type"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val qFirstTouchSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
      |      lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
      |  FROM events)
      |SELECT user_id, arg_min(event_type, ord) AS first_type,
      |  arg_max(event_type, ord) AS last_type,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** §2.2 q_funnel: ordered conversion funnel over the events table —
    * view → click (within 24 h of the first view) → purchase (within
    * 24 h of that click), the product-analytics staple. Matching
    * rule, fully deterministic: anchor at the user's FIRST view;
    * each later step is the first qualifying event after the
    * previous step's match (min-anchored sequential matching — a
    * defined funnel semantics both engines replay exactly).
    *
    * Shape: three layered running-min window columns over the SAME
    * (user_id; ts, event_id) window — ONE hash shuffle and ONE sort,
    * the two later Window operators reuse the partition ordering —
    * then a per-user partial agg and a 3-row rollup. Nothing
    * corpus-wide: state per user is three timestamps. The tie-safe
    * (ts, event_id) ordering makes running-min frames identical
    * across engines; events carry no sub-microsecond components
    * (verified), so micro-truncated Spark timestamps compare like
    * DuckDB's nanos.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val day = expr("INTERVAL 24 HOURS")
    val staged = ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("ts") > col("t1") && col("ts") <= col("t1") + day, col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2") && col("ts") <= col("t2") + day, col("ts"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .agg(count(col("t1")).as("u1"), count(col("t2")).as("u2"),
        count(col("t3")).as("u3"))
      .select(expr(
        "stack(3, '1_view', u1, '2_click', u2, '3_purchase', u3) AS (step, users)"))
      .orderBy(col("step"))
  }

  val qFunnelSql: String =
    """WITH w1 AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1
      |  FROM events
      |), w2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
      |                      AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t2
      |  FROM w1
      |), w3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
      |                      AND ts <= t2 + INTERVAL 24 HOUR THEN ts END) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t3
      |  FROM w2
      |), per AS (
      |  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      |  FROM w3 GROUP BY user_id
      |)
      |SELECT '1_view' AS step, count(t1) AS users FROM per
      |UNION ALL SELECT '2_click', count(t2) FROM per
      |UNION ALL SELECT '3_purchase', count(t3) FROM per
      |ORDER BY step""".stripMargin

  /** §2.2 q_cohorts: weekly cohort retention — users grouped by
    * first-activity day, activity counted per whole-week offset (the
    * retention matrix next to q_funnel's conversion and
    * q_sessionize's engagement). One user-partition window for the
    * cohort anchor (single shuffle), then a partial-agg rollup on
    * (cohort, offset); count(DISTINCT user) is exact in both
    * engines, day arithmetic is integer; the cohort key is emitted as
    * a yyyy-MM-dd STRING (date columns stringify differently across
    * engine→pandas paths).
    */
  def qCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    ev.withColumn("cohort", min(col("d")).over(w))
      .withColumn("week_offset", expr("datediff(d, cohort) div 7"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val qCohortsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
      |), c AS (
      |  SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort FROM e
      |)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
      |  CAST((d - cohort) // 7 AS BIGINT) AS week_offset,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM c GROUP BY 1, 2
      |ORDER BY cohort, week_offset""".stripMargin

  /** §2.2 q_markov: session-path transition counts — the Markov-chain
    * view of user navigation (which step follows which), the
    * path-analysis staple next to q_funnel's fixed sequence and
    * q_sessionize's boundaries. Each user's events are ordered by the
    * tie-safe (ts, event_id) key; a transition (src → dst) is emitted
    * for every event whose predecessor lies within the same 30-minute
    * session gap, and session-opening events transition from the
    * `_start` pseudo-state — so Σn = |events| exactly (a built-in
    * conservation check).
    *
    * Shape: ONE (user_id) window shuffle (lag of type and ts over the
    * same window — one sort, both lags share it), then a partial-agg
    * rollup on (src, dst) whose output is bounded by |event types|²,
    * never by rows. Gap arithmetic in integer microseconds (events
    * carry no sub-microsecond parts — q_funnel's verified premise), so
    * both engines compare identical integers.
    */
  def qMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("src",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, lit("_start"))
          .otherwise(col("prev_type")))
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("src"), col("dst"))
  }

  val qMarkovSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |    epoch_us(ts) - epoch_us(lag(ts) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      |  FROM events)
      |SELECT CASE WHEN gap_us IS NULL OR gap_us > 1800000000
      |            THEN '_start' ELSE prev_type END AS src,
      |  event_type AS dst, CAST(count(*) AS BIGINT) AS n
      |FROM o GROUP BY 1, 2
      |ORDER BY src, dst""".stripMargin

  /** §2.2 q_ewma: exponentially-weighted moving average per user —
    * the time-DECAYED trend next to the equal-weight rolling windows
    * of q_window2 (engagement trend, spend velocity, crawl-freshness
    * scoring: recent activity must dominate). Decay 1/2 per step over
    * the last ≤8 events; the 2^-8 tail that a bounded frame truncates
    * is < 1/255 of the weight mass, so the cutoff is principled, and
    * it is what makes the operator engine-portable: weights are exact
    * powers of two, the average is one integer division
    * (num·den > 0 ⇒ Spark `div` ≡ DuckDB `//`), and no recursive
    * state survives across rows. Output: each user's LATEST ewma next
    * to their lifetime average and a trending flag (ewma > avg —
    * rising spenders).
    *
    * Shape: ONE (user_id) hash shuffle; all 8 lags share a single
    * Window sort (same spec), and the final per-user rollup reuses
    * the partitioning (t5's rule). The latest row is picked by a
    * lexicographic struct-max over the tie-safe (ts, event_id) key
    * inside that rollup — no second descending sort, no
    * WindowGroupLimit, no join back.
    */
  /** §2.2 q_dwell: per-user inter-event gap profile — gap count, the
    * EXACT lower median gap, and the max gap, in whole seconds. The
    * dwell/cadence statistic behind engagement scoring and session-
    * timeout tuning (q_sessionize's 30 min gap is exactly the knob
    * this measures). Exact median, not approx_percentile: rank the
    * gaps per user and take row ⌈n/2⌉ — deterministic, integer, and
    * (unlike a sketch) oracle-replayable.
    *
    * Shape: ONE user-key shuffle; the lag, the rank, the count and
    * the max are window passes over the same partitioning, and the
    * median row is a filter — no second shuffle, no join back. The
    * per-user sort is partition-local and user-sized (the p7/Packing
    * rule: per-key sorts stay executor-sized).
    */
  def qDwell(spark: SparkSession, dir: String): DataFrame = {
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("gap_s"), col("ts"), col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(wSeq))
      .filter(col("prev").isNotNull)
      .withColumn("gap_s",
        expr("(unix_micros(ts) - unix_micros(prev)) div 1000000"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("max_gap", max(col("gap_s")).over(wAll))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("user_id"), col("n").cast("long").as("n_gaps"),
        col("gap_s").cast("long").as("median_gap_s"),
        col("max_gap").cast("long").as("max_gap_s"))
      .orderBy(col("user_id"))
  }

  val qDwellSql: String =
    """WITH ev AS (
      |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, event_id,
      |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
      |       ORDER BY ts, event_id))) // 1000000 AS gap_s
      |  FROM ev
      |), gg AS (SELECT * FROM g WHERE gap_s IS NOT NULL),
      |r AS (
      |  SELECT user_id, gap_s, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY gap_s, ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n,
      |    max(gap_s) OVER (PARTITION BY user_id) AS max_gap
      |  FROM gg
      |)
      |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
      |  CAST(gap_s AS BIGINT) AS median_gap_s,
      |  CAST(max_gap AS BIGINT) AS max_gap_s
      |FROM r WHERE rn = (n + 1) // 2 ORDER BY user_id""".stripMargin

  /** §2.2 q_cusum: per-user CHANGEPOINT detection — the ts where the
    * cumulative deviation from the user's own mean peaks (the CUSUM
    * statistic): the standard "did this key's behavior shift, and
    * when" monitor (spend-level change, scraper output shift, sensor
    * drift). For row i of n with prefix sum cum_i and total T, the
    * deviation |cum_i − (i/n)·T| is kept INTEGER as |n·cum_i − i·T|
    * (cents-exact values, scaled by n) — no floating point anywhere,
    * so the argmax is drift-free by construction.
    *
    * Shape: ONE user-key shuffle; the running sum, the per-user
    * totals and the argmax pick are three window passes over the
    * SAME partitioning (Spark plans one Exchange + sorts); the
    * argmax is a lexicographic struct-max in the per-user rollup —
    * no second shuffle, no join back (q_ewma's rule). n·cum and i·T
    * stay under 2^63 for cents×rows per key < 9·10^18 — a per-KEY
    * bound (row count of one user), not a corpus bound.
    */
  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("i", count(lit(1)).over(wRun))
      .withColumn("cum", sum(col("cents")).over(wRun))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("t", sum(col("cents")).over(wAll))
      .withColumn("dev", abs(col("n") * col("cum") - col("i") * col("t")))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        max(struct(col("dev"), col("ts"), col("event_id"))).as("best"))
      .select(col("user_id"), col("n_events"),
        date_format(col("best.ts"), "yyyy-MM-dd HH:mm:ss").as("cp_ts"),
        col("best.dev").as("dev_max"))
      .orderBy(col("user_id"))
  }

  // struct-max picks (dev, ts, event_id) lexicographically: max dev,
  // ties broken toward the LATEST (ts, event_id) — mirrored by the
  // oracle's arg-max ORDER BY. Deterministic because keys are unique.
  val qCusumSql: String =
    """WITH ev AS (
      |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT user_id, ts, event_id, cents,
      |    row_number() OVER w AS i,
      |    sum(cents) OVER w AS cum,
      |    count(*) OVER (PARTITION BY user_id) AS n,
      |    sum(cents) OVER (PARTITION BY user_id) AS t
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), d AS (
      |  SELECT user_id, ts, event_id, n, abs(n * cum - i * t) AS dev,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY abs(n * cum - i * t) DESC, ts DESC, event_id DESC) AS rk
      |  FROM r
      |)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS cp_ts,
      |  CAST(dev AS BIGINT) AS dev_max
      |FROM d WHERE rk = 1 ORDER BY user_id""".stripMargin

  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val num = (1 to 7).map(j =>
        coalesce(lag(col("cents"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
      .foldLeft(col("cents") * lit(128L))(_ + _)
    val den = (1 to 7).map(j =>
        when(lag(col("event_id"), j).over(w).isNotNull, lit(1L << (7 - j)))
          .otherwise(lit(0L)))
      .foldLeft(lit(128L))(_ + _)
    ev.withColumn("num", num).withColumn("den", den)
      .withColumn("ewma_cents", expr("num div den"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("cents")).cast("long").as("sum_cents"),
        max(struct(col("ts"), col("event_id"), col("ewma_cents"))).as("last"))
      .select(col("user_id"), col("n_events"),
        date_format(col("last.ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("last.ewma_cents").as("ewma_cents"),
        expr("sum_cents div n_events").as("avg_cents"))
      .withColumn("trending",
        when(col("ewma_cents") > col("avg_cents"), 1).otherwise(0))
      .orderBy(col("user_id"))
  }

  val qEwmaSql: String = {
    val num = (1 to 7).map(j =>
      s"${1L << (7 - j)} * coalesce(lag(cents, $j) OVER w, 0)")
      .mkString("128 * cents + ", " + ", "")
    val den = (1 to 7).map(j =>
      s"CASE WHEN lag(event_id, $j) OVER w IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END")
      .mkString("128 + ", " + ", "")
    s"""WITH ev AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), f AS (
      |  SELECT user_id, ts, event_id, cents,
      |    $num AS num,
      |    $den AS den
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), e AS (
      |  SELECT user_id, ts, cents, CAST(num // den AS BIGINT) AS ewma_cents,
      |    row_number() OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events,
      |    CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS sum_cents
      |  FROM f
      |)
      |SELECT user_id, n_events,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
      |  ewma_cents, sum_cents // n_events AS avg_cents,
      |  CASE WHEN ewma_cents > sum_cents // n_events THEN 1 ELSE 0 END AS trending
      |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin
  }

  /** §2.2 q_hierarchy: recursive CTE — iterative graph/tree traversal
    * in the SQL surface (org charts, category trees, BOM explosions;
    * the capability d9's connected components hand-rolls, exposed
    * declaratively). Customer keys form an implicit binary tree
    * (parent = k div 2, root = 1: contiguous keys make every parent a
    * real node); the query BFS-walks it from the root, tagging each
    * node with its depth, and rolls up per level.
    *
    * Scale shape: each recursion step is ONE equi-join of the current
    * frontier against the node table (shuffle on the parent key);
    * total rows produced across all steps = N, step count = tree
    * depth (log N balanced). This is exactly d9's propagation loop,
    * planned by the engine instead of by hand — iteration count
    * bounded by `spark.sql.cteRecursionLevelLimit`. The DuckDB oracle
    * runs the identical recursion (`//` is its integer division).
    *
    * Keys start at 0, whose parent is itself (0 div 2 = 0) — the
    * `c_custkey > r.k` guard cuts that self-loop (children always
    * have larger keys) so the recursion terminates.
    */
  def qHierarchy(spark: SparkSession, dir: String): DataFrame = {
    // The same fixpoint as the oracle's WITH RECURSIVE, executed as an
    // explicit frontier loop (r19: Spark's recursive-CTE executor
    // re-plans and re-acts per iteration — probe-measured ~2.8 s of
    // driver wall against ~0.6 s of job wall at sf0.1's ~14 levels).
    // Identical semantics level by level: frontier d+1 = customers
    // whose parent key (c_custkey DIV 2) sits in frontier d with
    // c_custkey > parent — each key has ONE parent (k div 2), so
    // every node is reached at most once. The level COUNT is bounded
    // in closed form instead of a per-level count job: a node at
    // depth d ≥ 1 has k ≥ 2^(d−1) (level 1 = {1}, the only k with
    // k div 2 = 0 < k; a child of p is 2p or 2p+1 ≥ 2p — induction),
    // so no level past floor(log2(maxKey)) + 1 is nonempty and
    // running exactly that many levels is the SAME union (empty
    // levels add no rows). One max() job, then the whole loop is
    // plan construction — each level lineage-cut (lazy), the single
    // final action materializes the chained broadcast joins
    // stage by stage. Isolated sf0.1 median 3.49 → 1.97 s.
    val customer = table(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("k"))
    val seed = spark.range(1).select(lit(0L).as("k"), lit(0).as("depth"))
    val maxK = Option(customer.agg(max(col("k"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val maxDepth =
      if (maxK < 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxK)
    var frontier = seed
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](seed)
    // Broadcast only while the level is PROVABLY small: the same
    // closed form that bounds the loop bounds each level's size —
    // level d holds keys in [2^(d−1), 2^d), so at most 2^(d−1) rows.
    // At d ≤ 20 that is ≤ 2^19 ≈ 524k one-long rows (a few MB framed),
    // safely inside the broadcast wall; DEEPER levels approach half
    // the table (the deepest IS ~half of it), where a forced broadcast
    // hint would drive the build past Spark's 8 GB/512M-row cap or the
    // driver heap at 100 TB — there the hint is dropped and AQE picks
    // the strategy from the materialized cut's runtime stats (r20,
    // VERDICT r19 weak item). At sf ≤ 1 every level sits under the
    // bound, so the local plan is unchanged.
    val broadcastableDepth = 20
    for (depth <- 1 to maxDepth) {
      val pk = frontier.select(col("k").as("pk"))
      val probe = if (depth <= broadcastableDepth) broadcast(pk) else pk
      val next = Checkpoints.cut(customer
        .join(probe,
          expr("k div 2") === col("pk") && col("k") > col("pk"))
        .select(col("k"), lit(depth).as("depth")))
      levels += next
      frontier = next
    }
    levels.reduce(_.unionByName(_))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy(col("depth"))
  }

  val qHierarchySql: String =
    """WITH RECURSIVE reach(k, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS k, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey, r.depth + 1
      |  FROM reach r JOIN customer c
      |    ON c.c_custkey // 2 = r.k AND c.c_custkey > r.k
      |)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM reach GROUP BY depth ORDER BY depth""".stripMargin

  /** §2.2 q_interval_merge: coalesce overlapping/touching per-key
    * intervals into maximal islands (`operators.IntervalMerge`) —
    * q_interval_join's complement (that PAIRS overlapping windows;
    * this COLLAPSES them): merging user activity windows, maintenance
    * blackouts, retry storms into continuous spans is the other half
    * of interval analytics. Uses the same orders-derived intervals as
    * q_interval_join so the two entries describe one dataset from
    * both sides. See IntervalMerge's Scaladoc for the islands
    * construction and the one-exchange plan argument.
    */
  def qIntervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val iv = table(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_custkey").as("k"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).as("s"))
      .withColumn("e", col("s") + pmod(col("id"), lit(14L)))
    IntervalMerge.islands(iv, "k", "id", "s", "e")
      .select(col("k").as("o_custkey"), col("m_start"), col("m_end"),
        col("n_merged"))
      .orderBy(col("o_custkey"), col("m_start"))
  }

  val qIntervalMergeSql: String =
    """WITH iv AS (
      |  SELECT o_orderkey AS id, o_custkey AS k,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS s,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      |      + o_orderkey % 14 AS e
      |  FROM orders),
      |w AS (
      |  SELECT *, max(e) OVER (PARTITION BY k ORDER BY s, id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      |  FROM iv),
      |f AS (
      |  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
      |                 THEN 1 ELSE 0 END AS opens
      |  FROM w),
      |g AS (
      |  SELECT *, sum(opens) OVER (PARTITION BY k ORDER BY s, id) AS island
      |  FROM f)
      |SELECT k AS o_custkey, CAST(min(s) AS BIGINT) AS m_start,
      |  CAST(max(e) AS BIGINT) AS m_end, CAST(count(*) AS BIGINT) AS n_merged
      |FROM g GROUP BY k, island
      |ORDER BY o_custkey, m_start""".stripMargin

  // ---------------------------------------------------------------
  // q_streaks: gaps-and-islands — longest consecutive-active-day run
  // ---------------------------------------------------------------

  /** §2.2 q_streaks: the gaps-and-islands idiom (the complement of
    * q_interval_merge's overlap islands): per user, the longest run
    * of CONSECUTIVE active calendar days, plus streak census. The
    * day − row_number() trick makes each maximal consecutive run a
    * constant group key — one distinct, one user-partition window,
    * one bounded rollup; no self-join, no recursion.
    *
    * Tie-break: equal-length streaks resolve to the EARLIEST start,
    * via a lexicographic struct-max on (len, −startDay) — mirrored by
    * the oracle's `ORDER BY len DESC, start ASC` arg-max.
    *
    * Scale: ONE user_id exchange for the whole query. A `.distinct()`
    * on (user_id, d) would hash-partition on BOTH columns — which
    * does not satisfy the window's user_id-only clustering, forcing a
    * second exchange (and the (user_id, grp) rollup a third) — so the
    * day dedup is instead a user_id-keyed `collect_set` (map-side
    * combine collapses repeat days before the shuffle; per-user sets
    * are calendar-bounded, ≤ days in the retention window, so they
    * can never skew past a few thousand elements regardless of corpus
    * size). The explode preserves the user_id partitioning, and both
    * downstream rollups group on supersets of user_id, so the window
    * sort and the aggregations all reuse that single exchange
    * (plan-spec-pinned).
    */
  def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("d"))
    val epoch = to_date(lit("1992-01-01"))
    // null-day semantics are EXPLICIT on both engine sides: a null
    // timestamp has no calendar day, so it contributes no streak row
    // (collect_set would drop it silently on the Spark side only —
    // the filter keeps the oracle honest if nulls ever appear)
    table(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy(col("user_id")).agg(collect_set(col("d")).as("days"))
      .select(col("user_id"), explode(col("days")).as("d"))
      .withColumn("grp", datediff(col("d"), epoch) - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).cast("long").as("n_active_days"),
        count(lit(1)).cast("long").as("n_streaks"),
        max(struct(col("len"),
          (lit(0L) - datediff(col("start"), epoch)).as("neg_start"),
          col("start"))).as("best"))
      .select(col("user_id"), col("n_active_days"), col("n_streaks"),
        col("best.len").cast("long").as("best_len"),
        date_format(col("best.start"), "yyyy-MM-dd").as("best_start"))
      .orderBy(col("user_id"))
  }

  val qStreaksSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d
      |  FROM events WHERE ts IS NOT NULL),
      |r AS (
      |  SELECT user_id, d,
      |    date_diff('day', DATE '1992-01-01', d)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM ev),
      |s AS (
      |  SELECT user_id, grp, count(*) AS len, min(d) AS start
      |  FROM r GROUP BY 1, 2),
      |b AS (
      |  SELECT user_id, len, start,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY len DESC, start ASC) AS rk,
      |    sum(len) OVER (PARTITION BY user_id) AS tot,
      |    count(*) OVER (PARTITION BY user_id) AS ns
      |  FROM s)
      |SELECT user_id, CAST(tot AS BIGINT) AS n_active_days,
      |  CAST(ns AS BIGINT) AS n_streaks, CAST(len AS BIGINT) AS best_len,
      |  strftime(start, '%Y-%m-%d') AS best_start
      |FROM b WHERE rk = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // q_scd2: slowly-changing-dimension type 2 from a change stream
  // ---------------------------------------------------------------

  /** §2.2 q_scd2: SCD Type-2 dimension build — the warehouse-standard
    * history table. Each user's event_type stream is read as a state
    * signal; consecutive repeats collapse (only CHANGES open a new
    * version) and each version carries a [valid_from, valid_to)
    * interval, the open row flagged `is_current` with the
    * conventional 9999-12-31 sentinel.
    *
    * Shape: one user-partition window for the change filter (lag),
    * then lead/row_number over the SAME partitioning on the filtered
    * frame — the filter preserves the hash partitioning so Catalyst
    * reuses the exchange (one shuffle, two sorts). No join back: the
    * validity interval comes from lead(), not a self-join on
    * version±1.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        when(col("valid_to_ts").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val qScd2Sql: String =
    """WITH ev AS (
      |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |    event_id, event_type AS state
      |  FROM events),
      |c AS (
      |  SELECT *, lag(state) OVER w AS prev
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT user_id, ts, event_id, state
      |  FROM c WHERE prev IS NULL OR prev != state),
      |v AS (
      |  SELECT user_id, ts, state, row_number() OVER w AS version,
      |    lead(ts) OVER w AS valid_to_ts
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(version AS BIGINT) AS version, state,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  coalesce(strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S'),
      |           '9999-12-31 00:00:00') AS valid_to,
      |  CAST(CASE WHEN valid_to_ts IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------
  // q_paths: top-k sequential event-type trigrams (path mining)
  // ---------------------------------------------------------------

  /** §2.2 q_paths: sequential pattern mining — the top-20 3-step
    * event-type paths across all user timelines (the "common journeys"
    * complement of q_funnel's fixed pattern and q_markov's 1-step
    * transition matrix). Paths come from two lead() taps on one
    * user-partition window — no per-user collect_list, no explode of
    * whole timelines.
    *
    * Scale: window shuffle on user_id (calendar-bounded partitions),
    * then a partial-agg count on the trigram string whose key space
    * is |event_type|³ — tiny, so the final agg is a handful of rows
    * and the top-20 is a TakeOrdered, never a global sort.
    */
  def qPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val qPathsSql: String =
    """WITH ev AS (
      |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |    event_id, event_type
      |  FROM events),
      |t AS (
      |  SELECT event_type, lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM t WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q_benford: first-significant-digit data-quality profile
  // ---------------------------------------------------------------

  /** Benford expectation log10(1 + 1/d) in integer micro-units,
    * computed once here and inlined as literals on BOTH engine sides
    * so no runtime log10 can drift between JVMs.
    */
  val benfordMicro: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** §2.8 q_benford: first-significant-digit distribution of
    * lineitem extended prices vs the Benford expectation — the
    * classic fabricated-data / ingestion-bug screen a data-quality
    * profiler runs over every numeric column. The leading significant
    * digit is scale-invariant, so it is read off the exact
    * cents-integer string (no float log10 at runtime on either
    * engine; the expectation table is precomputed micro-integers).
    *
    * Shape: one narrow map + one 9-key partial agg; the total joins
    * back as a 1-row broadcast cross join. Integer-exact end to end.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val expected = benfordMicro.foldLeft(lit(0L)) { case (acc, (d, m)) =>
      when(col("digit") === d, lit(m)).otherwise(acc)
    }
    val digits = table(spark, dir, "lineitem")
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("share_micro"),
        expected.as("benford_micro"))
      .withColumn("delta_micro",
        abs(col("share_micro") - col("benford_micro")))
      .orderBy(col("digit"))
  }

  val qBenfordSql: String = {
    val cases = benfordMicro
      .map { case (d, m) => s"WHEN $d THEN $m" }.mkString(" ")
    s"""WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem),
      |g AS (
      |  SELECT digit, count(*) AS n FROM d WHERE digit >= 1 GROUP BY 1),
      |tot AS (SELECT sum(n) AS total FROM g)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // total AS BIGINT) AS share_micro,
      |  CAST(CASE digit $cases END AS BIGINT) AS benford_micro,
      |  CAST(abs(n * 1000000 // total - CASE digit $cases END) AS BIGINT)
      |    AS delta_micro
      |FROM g CROSS JOIN tot ORDER BY digit""".stripMargin
  }
}
