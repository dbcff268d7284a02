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

  // Resolved-relation memo (r19 optimization): every
  // `spark.read.parquet` call re-runs ResolveDataSource — file
  // listing + footer/schema reads — at ANALYSIS time, once per
  // DataFrame construction. Probe-measured at 0.20 s of a 1.65 s
  // warm e2e_media run (half the rule-executor wall), paid by every
  // entry on every run. The memo returns the already-ANALYZED frame
  // for the same (session, path, dir-mtime) — metadata reuse only:
  // the scan itself still reads the parquet input on every action,
  // exactly like a catalog table's cached relation metadata in a
  // production session. The mtime in the key keeps overwritten spec
  // fixtures fresh (a re-written path re-resolves), and the session
  // identity keeps frames inside the session that analyzed them.
  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Long), DataFrame]

  /** Scan one synthetic table. Plain parquet scan — Catalyst pushes
    * filters/pruning into it, so callers just compose DataFrame algebra.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val mtime = new java.io.File(path).lastModified()
    tableMemo.computeIfAbsent(
      (System.identityHashCode(spark), path, mtime), _ => {
        val df = spark.read.parquet(path)
        if (name == "events") normalizeEventTs(df) else df
      })
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
