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
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    // The name is interpolated into SQL and into a filesystem path
    // below — restrict it to identifier chars (no separators, quotes,
    // dots) and lowercase it, matching the catalog's lowercased
    // managed-location directory.
    require(table.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"invalid table name: '$table' (expected [A-Za-z][A-Za-z0-9_]*)")
    val t = table.toLowerCase(java.util.Locale.ROOT)
    val spark = df.sparkSession
    // true overwrite: drop catalog entry AND its managed location — a
    // stale location from a prior session otherwise fails the write
    // with LOCATION_ALREADY_EXISTS. Hadoop FileSystem, not
    // java.io.File: the warehouse is hdfs://-or-s3a://-addressable on
    // a real cluster and a local-only delete would silently no-op
    // there, resurfacing the stale-location failure at scale.
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")), t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
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
}
