package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables: pre-shuffle data ONCE at write time so that every
  * subsequent equi-join/aggregation on the bucket key runs with NO
  * exchange (SURVEY.md §4). At 100 TB this converts the nightly
  * fact⋈fact join from the dominant shuffle into a zip of co-located
  * buckets — the write-time shuffle is paid once, not per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted parquet table registered in the
    * session catalog (bucket metadata lives in the catalog, which is
    * why this is `saveAsTable`, not a path write).
    */
  /** True-overwrite preparation for a managed table: drop the catalog
    * entry AND its managed location — a stale location from a prior
    * session otherwise fails the next write with
    * LOCATION_ALREADY_EXISTS. Hadoop FileSystem, not java.io.File:
    * the warehouse is hdfs://-or-s3a://-addressable on a real cluster
    * and a local-only delete would silently no-op there, resurfacing
    * the stale-location failure at scale. The name is interpolated
    * into SQL and into a filesystem path — restrict it to identifier
    * chars and lowercase it, matching the catalog's lowercased
    * managed-location directory. Returns the normalized name. ONE
    * owner for this discipline (bucketed tables here, the df-stats
    * totals table) so the next stale-location fix lands everywhere.
    */
  def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
      table: String): String = {
    require(table.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"invalid table name: '$table' (expected [A-Za-z][A-Za-z0-9_]*)")
    val t = table.toLowerCase(java.util.Locale.ROOT)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")), t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    t
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val t = dropTableAndLocation(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(t)
  }

  /** Append rows to an EXISTING bucketed table under the same layout
    * (Spark writes new per-bucket files; the catalog's bucket spec
    * keeps reads exchange-free). Same name validation as the write —
    * one owner for the bucketing convention.
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(table.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"invalid table name: '$table' (expected [A-Za-z][A-Za-z0-9_]*)")
    df.write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table.toLowerCase(java.util.Locale.ROOT))
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when both sides were written with the same bucket count.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Keys of `table` whose row count exceeds `cap` — the hot-key
    * census over a bucketed table's own key, exchange-free (the
    * bucket layout satisfies the grouping). The shared kernel behind
    * the maintained `_hot` exclusions (IncrementalPassages /
    * IncrementalMedia).
    */
  def overCapKeys(spark: org.apache.spark.sql.SparkSession,
      table: String, key: String, cap: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table(table).groupBy(col(key))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap).select(col(key))
  }

  /** `table` minus a maintained hot-key table — the servable form a
    * probing consumer reads (broadcast anti-join; the hot table is
    * tiny by construction).
    */
  def minusHot(spark: org.apache.spark.sql.SparkSession,
      table: String, hotTable: String, key: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    spark.table(table).join(broadcast(spark.table(hotTable)), Seq(key), "left_anti")
  }

  /** `rows` minus those whose `idCol` is already present in `table` —
    * the replay-idempotency probe every incremental family's append
    * runs (ExactSubstr, Trigram, DfStats): presence is checked against
    * THIS table (a crash between two appends must heal exactly the
    * lagging one), via a broadcast semi-probe of the bucketed table
    * (corpus side unshuffled, output ≤ the batch) broadcast back as
    * the exclusion. ONE owner so the discipline cannot drift between
    * families.
    */
  def absentOnly(rows: DataFrame, table: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val spark = rows.sparkSession
    val ids = rows.select(col(idCol)).distinct()
    val present = spark.table(table)
      .join(broadcast(ids), Seq(idCol), "left_semi")
      .select(col(idCol)).distinct()
    rows.join(broadcast(present), Seq(idCol), "left_anti")
  }
}
