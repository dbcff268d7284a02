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
