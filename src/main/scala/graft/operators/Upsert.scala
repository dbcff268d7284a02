package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed changeset application — Delta-style MERGE collapsed to
  * latest-wins (SURVEY.md §2.8 `q_upsert`).
  *
  * A training-data pipeline maintains snapshots that incremental
  * crawls/refreshes update: new docs arrive, existing docs are
  * re-fetched (upsert), withdrawn docs are tombstoned (delete).
  * `applyChangeset` produces the next snapshot from the previous one
  * plus a change batch: per key the highest-version row wins, and a
  * winning delete tombstone removes the key entirely.
  *
  * Scale shape: `unionByName` is shuffle-free; the per-key
  * latest-wins window is ONE hash shuffle on the merge key (the same
  * shuffle a MERGE join would pay), and row_number's WindowGroupLimit
  * keeps per-key state at one row. No broadcast needed on either
  * side, so both snapshot and changeset can be arbitrarily large.
  * Version ties are the caller's contract (a change feed has a total
  * per-key order: batch id, LSN, commit ts).
  */
object Upsert {

  /** Next snapshot = latest-wins merge of `snapshot` ∪ `changes`.
    * Both inputs must share the schema, including `versionCol`
    * (snapshot rows carry the version they were written at) and a
    * boolean `deleteCol` tombstone flag.
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, deleteCol: String): DataFrame = {
    val required = Seq(keyCol, versionCol, deleteCol)
    require(required.forall(snapshot.columns.contains),
      s"snapshot is missing one of $required (has ${snapshot.columns.mkString(",")})")
    require(snapshot.columns.toSet == changes.columns.toSet,
      s"snapshot/changes schemas differ: ${snapshot.columns.toSet.diff(changes.columns.toSet)} vs ${changes.columns.toSet.diff(snapshot.columns.toSet)}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)
    snapshot.unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deleteCol))
      .drop("__rn")
  }

  /** q_upsert entry: orders as the version-0 snapshot; a derived
    * change batch (version 1) re-prices every 7th key (+1000) and
    * tombstones the ones divisible by 21. The rollup by
    * (version, status) is sensitive to every failure mode: a missed
    * delete inflates n, a lost update shifts rows to version 0, a
    * wrong winner corrupts total_price.
    */
  def qUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = table(spark, dir, "orders")
    def shape(df: DataFrame, version: Int, bumped: Boolean, del: org.apache.spark.sql.Column) =
      df.select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        (round(col("o_totalprice")).cast("long") + (if (bumped) 1000L else 0L)).as("price_l"),
        lit(version).as("version"), del.as("is_delete"))
    val snapshot = shape(orders, 0, bumped = false, lit(false))
    val changes = shape(orders.filter(col("o_orderkey") % 7 === 0), 1,
      bumped = true, col("o_orderkey") % 3 === 0)
    applyChangeset(snapshot, changes, "k", "version", "is_delete")
      .groupBy(col("version"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("price_l")).as("total_price"))
      .orderBy(col("version"), col("status"))
  }

  /** §2.2 q_snapshot_diff: reconcile two snapshot versions — the audit
    * counterpart of `applyChangeset` (what changed between corpus
    * builds?). FULL OUTER join on the key classifies every key as
    * unchanged / changed / added / removed; the rollup is the diff
    * report. One shuffle on the key each side; no broadcast needed.
    * The "next" snapshot is derived deterministically (drop every 13th
    * key, re-price every 7th, add fresh keys from every 11th) so all
    * four classes are non-vacuous.
    */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = table(spark, dir, "orders")
    val prev = orders.select(col("o_orderkey").as("k"),
      round(col("o_totalprice")).cast("long").as("price_l"))
    val next = orders.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"),
        (round(col("o_totalprice")).cast("long") +
          when(col("o_orderkey") % 7 === 0, 1000L).otherwise(0L)).as("price_l"))
      .unionByName(orders.filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + 500000000L).as("k"),
          round(col("o_totalprice")).cast("long").as("price_l")))
    val a = prev.withColumnsRenamed(Map("price_l" -> "p_prev"))
    val b = next.withColumnsRenamed(Map("price_l" -> "p_next"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("p_prev").isNull, "added")
          .when(col("p_next").isNull, "removed")
          .when(col("p_prev") === col("p_next"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
      .orderBy(col("status"))
  }

  val qSnapshotDiffSql: String =
    """WITH prev AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p_prev
      |  FROM orders
      |), next AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice) AS BIGINT) +
      |      CASE WHEN o_orderkey % 7 = 0 THEN 1000 ELSE 0 END AS p_next
      |  FROM orders WHERE o_orderkey % 13 != 0
      |  UNION ALL
      |  SELECT o_orderkey + 500000000 AS k, CAST(round(o_totalprice) AS BIGINT) AS p_next
      |  FROM orders WHERE o_orderkey % 11 = 0
      |), d AS (
      |  SELECT coalesce(prev.k, next.k) AS k,
      |    CASE WHEN p_prev IS NULL THEN 'added'
      |         WHEN p_next IS NULL THEN 'removed'
      |         WHEN p_prev = p_next THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM prev FULL OUTER JOIN next ON prev.k = next.k
      |)
      |SELECT status, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  val qUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(round(o_totalprice) AS BIGINT) AS price_l,
      |    0 AS version, false AS is_delete
      |  FROM orders
      |), delta AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(round(o_totalprice) AS BIGINT) + 1000 AS price_l,
      |    1 AS version, o_orderkey % 3 = 0 AS is_delete
      |  FROM orders WHERE o_orderkey % 7 = 0
      |), u AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM delta
      |), m AS (
      |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
      |  FROM u
      |)
      |SELECT version, status, count(*) AS n, CAST(sum(price_l) AS BIGINT) AS total_price
      |FROM m WHERE rn = 1 AND NOT is_delete
      |GROUP BY version, status ORDER BY version, status""".stripMargin
}
