package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core of the engine (SURVEY.md §2.2).
  *
  * Oracle-parity rules (SURVEY.md §5): every measure is drift-free —
  * integer-valued doubles (`sum(round(x))` summed exactly in IEEE
  * doubles below 2^53), exact counts, or strings — so DuckDB and Spark
  * hash-match bit-for-bit regardless of partitioning or scale.
  *
  * Scale notes: filters/projections stay in Column algebra so Catalyst
  * pushes them into the parquet scan; dimension joins use explicit
  * `broadcast()`; aggregations get map-side partial aggregation for
  * free from whole-stage codegen HashAggregate.
  */
object Relational {

  /** TPC-H Q1 flavor: scan → pushed filter → hash agg, exact measures. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice"))).cast("long").as("sum_base"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("long").as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(round(l_extendedprice)) AS BIGINT) AS sum_base,
      |  CAST(sum(round(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS sum_disc_price,
      |  count(*) AS n_rows,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 flavor: 3-way join on the fact's natural keys + top-N.
    * customer and orders shuffle on the join keys once; AQE handles
    * any skew. Top-N is a global sort of the (small) aggregated set.
    */
  def q3JoinTopn(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit("1996-03-15")))
    cust
      .join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("long").as("revenue"))
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinTopnSql: String =
    """SELECT l_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  CAST(sum(round(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 flavor: star join — every dimension is broadcast, the
    * lineitem fact is never shuffled for the dim joins (only for the
    * final small groupBy). At 100 TB the fact side streams through
    * broadcast-hash-joins map-side.
    */
  def q5BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = table(spark, dir, "region")
    val nation = table(spark, dir, "nation")
    val supp = table(spark, dir, "supplier")
    val li = table(spark, dir, "lineitem")
    li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("long").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5BroadcastJoinSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(round(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Window functions: rank + running sum per supplier. Single shuffle
    * on the partition key; sort within partitions is codegen'd.
    */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.filter(col("l_suppkey") <= 20)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("running_qty"))
      .filter(col("rn") <= 5)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val qWindowSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    row_number() OVER w AS rn,
      |    CAST(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
      |  FROM lineitem
      |  WHERE l_suppkey <= 20
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |) WHERE rn <= 5
      |ORDER BY l_suppkey, rn""".stripMargin

  /** Left-semi + left-anti composed: customers that have orders (semi)
    * but none above a price threshold (anti). Semi/anti joins shuffle
    * only keys and never duplicate the left side.
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
    val ord = table(spark, dir, "orders")
    val big = ord.filter(col("o_totalprice") > 400000.0)
    cust
      .join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
      .limit(100)
  }

  val qSemiAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey
      |LIMIT 100""".stripMargin

  /** Distinct + union + sort: partKeys seen in lineitem vs. catalog. */
  def qDistinctUnion(spark: SparkSession, dir: String): DataFrame = {
    val liParts = table(spark, dir, "lineitem")
      .select(col("l_partkey").as("key")).distinct()
      .withColumn("src", lit("lineitem"))
    val catParts = table(spark, dir, "part")
      .filter(col("p_size") >= 48)
      .select(col("p_partkey").as("key")).distinct()
      .withColumn("src", lit("part"))
    liParts.filter(col("key") <= 200).union(catParts)
      .groupBy(col("key")).agg(count(lit(1)).as("n_src"),
        max(col("src")).as("max_src"))
      .orderBy(col("key"))
  }

  val qDistinctUnionSql: String =
    """SELECT key, count(*) AS n_src, max(src) AS max_src FROM (
      |  SELECT DISTINCT l_partkey AS key, 'lineitem' AS src FROM lineitem WHERE l_partkey <= 200
      |  UNION ALL
      |  SELECT DISTINCT p_partkey AS key, 'part' AS src FROM part WHERE p_size >= 48
      |) GROUP BY key ORDER BY key""".stripMargin

  /** Hourly rollup of the events stream table (batch form). */
  def qEventsBucket(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))
  }

  // Spark reads events.ts as TIMESTAMP(NANOS) truncated to µs
  // (GraftSession.table); the oracle truncates identically so sub-µs
  // timestamps can never silently diverge between the engines.
  val qEventsBucketSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  count(*) AS n,
      |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents,
      |  count(DISTINCT user_id) AS n_users
      |FROM (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events)
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** Histogram bucket count for q_histogram. */
  val HistBuckets = 20L

  /** §2.2 q_histogram: equi-width value histograms per event type —
    * the distribution-SHAPE profile q_profile's scalar stats can't
    * show (bimodality, truncation, heaping): the standard first look
    * at any numeric column before choosing filters or outlier rules.
    *
    * Integer-exact by construction: bucketing runs on CENTS with an
    * integer stride ⌈(max−min+1)/buckets⌉, so bucket boundaries are
    * exact longs — no float boundary can disagree between engines.
    * Shape: one 1-row global min/max broadcast-crossed into the scan,
    * then ONE (type, bucket) partial-agg shuffle; output bounded by
    * types × buckets.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val mm = ev.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    ev.crossJoin(broadcast(mm))
      .withColumn("w", expr(s"((hi - lo + 1) + ${HistBuckets - 1}) div $HistBuckets"))
      .withColumn("bucket", expr("(cents - lo) div w"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("lo") + col("bucket") * col("w")).as("lo_cents"),
        min(col("lo") + (col("bucket") + 1) * col("w") - 1).as("hi_cents"))
      .select(col("event_type"), col("bucket").cast("long").as("bucket"),
        col("lo_cents").cast("long").as("lo_cents"),
        col("hi_cents").cast("long").as("hi_cents"), col("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val qHistogramSql: String =
    s"""WITH ev AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
      |), mm AS (
      |  SELECT min(cents) AS lo, max(cents) AS hi,
      |    ((max(cents) - min(cents) + 1) + ${HistBuckets - 1}) // $HistBuckets AS w
      |  FROM ev
      |)
      |SELECT event_type, CAST((cents - lo) // w AS BIGINT) AS bucket,
      |  CAST(min(lo + ((cents - lo) // w) * w) AS BIGINT) AS lo_cents,
      |  CAST(min(lo + ((cents - lo) // w + 1) * w - 1) AS BIGINT) AS hi_cents,
      |  count(*) AS n
      |FROM ev CROSS JOIN mm
      |GROUP BY event_type, (cents - lo) // w
      |ORDER BY event_type, bucket""".stripMargin

  /** §2.2 q_sliding_window: HOPPING-window rollup — 1 h windows
    * sliding every 15 min, the overlapping-window shape behind every
    * rate monitor and rolling SLA dashboard (q_events_bucket is its
    * tumbling special case). Spark's `window(ts, dur, slide)`
    * generates the ⌈dur/slide⌉ = 4 covering windows per event as a
    * NARROW expansion (an Expand/generator inside the scan stage —
    * no pre-shuffle blowup materialized), then one (window,
    * event_type) partial-agg shuffle; at 100 TB the cost is the same
    * single agg shuffle as the tumbling form, ×4 partial-agg input
    * rows that map-side combine collapses before the wire.
    *
    * Oracle parity: window starts are epoch-aligned in both engines
    * (start ≡ 0 mod 900 s, the slide), so the oracle regenerates the
    * 4 covering starts per event with integer second arithmetic —
    * identical bucketing by construction. Measures follow the
    * cents-exact rule; window bounds are emitted as formatted strings
    * (qEventsBucket precedent).
    */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val qSlidingWindowSql: String =
    """WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events),
      |e AS (
      |  SELECT event_type, value,
      |    make_timestamp(((epoch_us(ts) // 1000000 // 900 - i) * 900) * 1000000) AS ws
      |  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
      |)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
      |FROM e GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Correlated + uncorrelated scalar subqueries, via the engine's SQL
    * entry: Catalyst rewrites both into joins (correlated → left
    * outer aggregate join; uncorrelated → scalar broadcast), so the
    * declarative form costs two shuffles, not a per-row probe.
    * Exact integer-valued max keeps the equality drift-free.
    */
  /** §2.2 q_lateral: correlated LATERAL subquery — per-nation top-2
    * customers by balance. Catalyst decorrelates the lateral
    * ORDER BY + LIMIT into a GLOBAL sort of the inner table feeding
    * an order-less per-key row_number; the session's WindowOrderLift
    * rule (GraftExtensions) lifts that sort into the window's ORDER
    * BY, so the executed plan is the same two-phase WindowGroupLimit
    * shape as q_topn_group's explicit window form — users write the
    * natural LATERAL spelling and pay one hash shuffle, no global
    * sort (PlanSpec pins it). Balance rounded to cents-exact long;
    * ties broken by key.
    */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.table(spark, dir, "nation").createOrReplaceTempView("nation")
    graft.GraftSession.table(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """SELECT n_name, c.c_name, c.bal
        |FROM nation n,
        |  LATERAL (SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |           FROM customer
        |           WHERE c_nationkey = n.n_nationkey
        |           ORDER BY bal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, bal DESC, c_name""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT n_name, c.c_name, c.bal
      |FROM nation n,
      |  LATERAL (SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |           FROM customer
      |           WHERE c_nationkey = n.n_nationkey
      |           ORDER BY bal DESC, c_custkey LIMIT 2) c
      |ORDER BY n_name, bal DESC, c_name""".stripMargin

  def qScalarSubq(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.table(spark, dir, "supplier").createOrReplaceTempView("supplier")
    graft.GraftSession.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE (SELECT max(l_quantity) FROM lineitem WHERE l_suppkey = s_suppkey)
        |    = (SELECT max(l_quantity) FROM lineitem)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val qScalarSubqSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE (SELECT max(l_quantity) FROM lineitem WHERE l_suppkey = s_suppkey)
      |    = (SELECT max(l_quantity) FROM lineitem)
      |ORDER BY s_suppkey""".stripMargin

  /** Grouping sets: subtotals + grand total via rollup. Spark emits
    * NULL for the rolled-up level exactly like SQL ROLLUP.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .orderBy(col("event_type").asc_nulls_first)

  val qRollupSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
      |FROM events GROUP BY ROLLUP(event_type)
      |ORDER BY event_type ASC NULLS FIRST""".stripMargin

  /** Pivot: event counts per user fanned into one column per type. */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .filter(col("user_id") <= 50)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  val qPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events WHERE user_id <= 50
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** As-of join: each purchase event picks up the latest prior click
    * of the same user (AsofJoin operator; oracle = DuckDB's native
    * ASOF JOIN — an independent implementation of the semantics).
    */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsofJoin.asof(purchases, clicks, "user_id", "ts", Seq("ts", "value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"),
        round(col("asof_value") * 100).cast("long").as("click_cents"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a tolerance bound (pandas merge_asof semantics):
    * clicks older than 30 minutes before the purchase do not enrich
    * it. Same single-shuffle plan as q_asof plus one filter.
    */
  def qAsofTol(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsofJoin.asof(purchases, clicks, "user_id", "ts", Seq("ts", "value"),
        toleranceSec = Some(1800L))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"),
        round(col("asof_value") * 100).cast("long").as("click_cents"))
      .orderBy(col("event_id"))
  }

  // the MATERIALIZED CTE stops DuckDB pushing the tolerance filter
  // into the ASOF condition (its binder allows one inequality there)
  val qAsofTolSql: String =
    """WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events),
      |j AS MATERIALIZED (
      |  SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS cts, c.value
      |  FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') p
      |  ASOF JOIN (SELECT user_id, ts, value FROM ev WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND p.ts >= c.ts
      |)
      |SELECT event_id, user_id,
      |  strftime(pts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |  strftime(cts, '%Y-%m-%d %H:%M:%S') AS c_ts,
      |  CAST(round(value * 100) AS BIGINT) AS click_cents
      |FROM j WHERE cts >= pts - INTERVAL '30 minutes'
      |ORDER BY event_id""".stripMargin

  // events wrapped in the same nanos→µs truncation Spark applies at
  // the scan (see qEventsBucketSql note) — the >= tie decisions of an
  // as-of join are exactly where sub-µs drift would bite.
  val qAsofSql: String =
    """WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts,
      |  CAST(round(c.value * 100) AS BIGINT) AS click_cents
      |FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts, value FROM ev WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** FORWARD as-of: each purchase enriched with the NEXT click at or
    * after it ("what happened next") — same single-shuffle tagged-union
    * plan, mirrored frame. Oracle: DuckDB ASOF with the inequality
    * flipped (`p.ts <= c.ts` picks the smallest qualifying c.ts).
    */
  def qAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsofJoin.asofForward(purchases, clicks, "user_id", "ts", Seq("ts", "value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"),
        round(col("asof_value") * 100).cast("long").as("click_cents"))
      .orderBy(col("event_id"))
  }

  val qAsofFwdSql: String =
    """WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts,
      |  CAST(round(c.value * 100) AS BIGINT) AS click_cents
      |FROM (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT user_id, ts, value FROM ev WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts <= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Top-N per group via window: biggest event per user. */
  def qTopnGroup(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    ev.select(col("user_id"), col("event_id"), col("event_type"),
        row_number().over(w).as("rk"))
      .filter(col("rk") === 1)
      .drop("rk")
      .filter(col("user_id") <= 100)
      .orderBy(col("user_id"))
  }

  val qTopnGroupSql: String =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
      |  FROM events
      |) WHERE rk = 1 AND user_id <= 100
      |ORDER BY user_id""".stripMargin
}
