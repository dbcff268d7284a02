package graft

import graft.sources.{ConvertOptions, CsvToParquet}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bench: CSV→Parquet conversion throughput vs input-split count
  * (SURVEY.md §8f). The 100 TB claim for the converter rests on CSV
  * being SPLITTABLE — this measures that the same `convert` call
  * actually scales as the input is carved into more splits, which a
  * single-number measurement at one split cannot show.
  *
  * Method: replicate sf0.1 lineitem ~20× into a multi-file CSV
  * dataset (~0.8 GB), write its inferred schema to a schema file
  * (schema resolution priced OUT of the timed runs — split scaling
  * is about the read+write path), then time `convert` with
  * `spark.sql.files.maxPartitionBytes` sized to yield 1/2/4/8/16/32
  * splits. Run manually: `sbt "runMain graft.ConvertScalingBench"`.
  */
object ConvertScalingBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = "/root/repo/target/scratch/convscale"
    val csvDir = s"$scratch/csv"
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val copies = 20
    // distinct keys per copy so the dataset is a plausible 12M-row ledger
    val big = li.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * 100000000L)
      .drop("copy")
    big.repartition(40).write.mode("overwrite").option("header", "true").csv(csvDir)
    val nRows = spark.read.option("header", "true").csv(csvDir).count()
    val bytes = new java.io.File(csvDir).listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.length).sum
    println(s"input: $nRows rows, ${bytes / (1 << 20)} MiB CSV")

    // schema file once — conversion runs read it instead of re-inferring
    val schemaJson = CsvToParquet.convert(spark, csvDir, s"$scratch/probe",
      ConvertOptions(maxReadRecords = Some(1000), dry = true)).schemaJson
    val schemaFile = s"$scratch/schema.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(schemaFile), schemaJson)

    println(f"${"splits"}%8s ${"actual"}%8s ${"sec"}%8s ${"Mrows/s"}%8s")
    for (splits <- Seq(1, 2, 4, 8, 16, 32)) {
      // split size = total/splits: openCost=0 so packing is driven by
      // the cap alone, and minPartitionNum (defaults to the core
      // count) must agree or it silently re-splits finer
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      spark.conf.set("spark.sql.files.minPartitionNum", splits.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        math.max(1L << 20, bytes / splits + (1 << 20)).toString)
      val schema = CsvToParquet.resolveSchema(spark, csvDir,
        ConvertOptions(schemaFile = Some(schemaFile)))
      val actual = CsvToParquet.readTyped(spark, csvDir, schema.toSpark,
        header = true, delimiter = ',').rdd.getNumPartitions
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        CsvToParquet.convert(spark, csvDir, s"$scratch/out",
          ConvertOptions(schemaFile = Some(schemaFile)))
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(1)
      println(f"$splits%8d $actual%8d $med%8.2f ${nRows / med / 1e6}%8.2f")
    }
    spark.stop()
  }
}
