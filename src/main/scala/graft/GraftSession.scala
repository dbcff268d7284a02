package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by queries, Verify, Bench and the CLI.
  *
  * Scale notes: AQE stays on (skew-join splitting, partition
  * coalescing); shuffle partitions are sized by the caller (driver
  * mains set them to the local core count — on a real cluster this
  * would be ~2-3x total cores, and AQE coalesces down).
  */
object GraftSession {

  /** Build a tuned local session (used by the CLI and specs; Verify and
    * Bench build their own per the driver contract).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events frame's `ts` to session-timezone TimestampType.
    *
    * events.ts has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark only reads as a
    * long under spark.sql.legacy.parquet.nanosAsLong) and plain
    * TIMESTAMP(MICROS) without timezone (which Spark reads as
    * TIMESTAMP_NTZ). Both become TimestampType — the session runs UTC,
    * so the NTZ cast is exact — and every operator downstream sees one
    * canonical type, like DuckDB does. A pure projection, so it works on
    * streaming frames too.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Scan one synthetic table. Plain parquet scan — Catalyst pushes
    * filters/pruning into it, so callers just compose DataFrame algebra.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
