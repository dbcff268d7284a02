package graft.sources

import org.apache.spark.sql.SparkSession

/** Split-planning fan-out for the conversion family's text legs (r20,
  * guide §6 / VERDICT r19 item 3 — the avro `split.maxsize` fix
  * generalized to the file-source scans).
  *
  * Spark sizes file splits as
  *
  *   maxSplitBytes = min(maxPartitionBytes,
  *                       max(openCostInBytes,
  *                           (totalBytes + nFiles·openCost) / minPartitionNum))
  *
  * so for a SMALL input the 4 MB `openCostInBytes` floor is what pins
  * the scan to a handful of tasks (a ~25 MB scratch CSV reads as ~7
  * splits on local[32]); for a LARGE input `bytesPerCore` exceeds the
  * floor and the floor is irrelevant. Lowering the floor inside a
  * bounded scope therefore fans small line-splittable inputs
  * (CSV/JSONL) out toward `defaultParallelism` scan tasks with NO
  * exchange anywhere (split planning, not a shuffle — this is NOT the
  * r19 batch-3 repartition dead end), and is the IDENTITY at
  * production sizes: bytesPerCore ≥ 128 MB keeps maxSplitBytes at
  * `maxPartitionBytes` exactly as before. The 1 MB floor also keeps
  * truly tiny inputs (a 2 KB region CSV) at one task instead of
  * absurd sub-kilobyte splits.
  *
  * Scoped + restored around the EAGER conversion jobs only (schema
  * inference's vote scan, the typed CSV→parquet write, the JSONL
  * read): nothing else in the session observes the conf.
  */
object SplitPlanning {

  private val OpenCostKey = "spark.sql.files.openCostInBytes"
  private val SmallFloor = (1L << 20).toString // 1 MB

  /** Run `body` with the file-split floor lowered to 1 MB, restoring
    * the previous conf value (or unsetting) afterwards.
    */
  def withSmallSplitFloor[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(OpenCostKey)
    spark.conf.set(OpenCostKey, SmallFloor)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(OpenCostKey, v)
      case None => spark.conf.unset(OpenCostKey)
    }
  }
}
