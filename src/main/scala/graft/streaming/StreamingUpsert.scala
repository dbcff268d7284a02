package graft.streaming

import graft.operators.Upsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming keyed MERGE: maintain a latest-wins snapshot table from
  * a change stream (SURVEY.md §2.7 stream-upsert).
  *
  * Each micro-batch of changes (rows carrying key, version, delete
  * tombstone) is merged into the previous snapshot with
  * `Upsert.applyChangeset` and the result is written as a NEW
  * versioned snapshot directory `snap_v=<batchId>`. Readers read the
  * highest complete version — a plain parquet read, no lock.
  *
  * Exactly-once: foreachBatch can replay the last batch with the
  * same batchId after a crash. The merge input is always "the latest
  * snapshot with version < batchId", so a replay re-reads the SAME
  * predecessor it read the first time and deterministically rewrites
  * `snap_v=<batchId>` (staging + swap, like ExactlyOnceSink) — the
  * final state is identical whether the batch ran once or five
  * times. Old versions are retained (time travel / audit) and can be
  * GC'd by dropping directories below a version floor.
  *
  * Scale: the merge is ONE key shuffle over snapshot ∪ batch
  * (Upsert's shape); the snapshot rewrite is the unavoidable cost of
  * compacted state on plain parquet — a metadata/table format would
  * turn it into a log append, but the operator semantics (and this
  * API) stay the same.
  */
object StreamingUpsert {

  private val SnapPrefix = "snap_v="

  /** Versions present under `out` (complete snapshots only). */
  def versions(spark: org.apache.spark.sql.SparkSession, out: String): Seq[Long] = {
    val p = new Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(SnapPrefix))
      .map(_.getPath.getName.stripPrefix(SnapPrefix).toLong)
      .sorted
  }

  /** Latest complete snapshot as a DataFrame (empty-schema None when
    * nothing has committed yet).
    */
  def latestSnapshot(spark: org.apache.spark.sql.SparkSession,
      out: String): Option[DataFrame] =
    versions(spark, out).lastOption
      .map(v => spark.read.parquet(s"$out/$SnapPrefix$v"))

  /** The idempotent per-batch merge — also callable directly to
    * simulate crash-replay in tests.
    */
  def mergeBatch(out: String, keyCol: String, versionCol: String,
      deleteCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // predecessor = latest version STRICTLY below this batch: a
    // replayed batch ignores its own (possibly half-written) output
    val prev = versions(spark, out).filter(_ < batchId).lastOption
      .map(v => spark.read.parquet(s"$out/$SnapPrefix$v"))
    val next = prev match {
      case Some(snapshot) =>
        Upsert.applyChangeset(snapshot, batch.select(snapshot.columns.map(
          org.apache.spark.sql.functions.col): _*), keyCol, versionCol, deleteCol)
      case None =>
        Upsert.applyChangeset(batch.limit(0), batch, keyCol, versionCol, deleteCol)
    }
    val staging = new Path(s"$out/_staging_$SnapPrefix$batchId")
    val dest = new Path(s"$out/$SnapPrefix$batchId")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    next.write.mode("overwrite").parquet(staging.toString)
    fs.delete(dest, true)
    if (!fs.rename(staging, dest))
      throw new java.io.IOException(s"rename $staging -> $dest failed")
  }

  /** Attach to a change stream. */
  def start(changes: DataFrame, out: String, checkpoint: String, keyCol: String,
      versionCol: String, deleteCol: String): StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(mergeBatch(out, keyCol, versionCol, deleteCol) _)
      .start()
}
