package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet sink for foreachBatch pipelines
  * (SURVEY.md §2.7).
  *
  * Structured Streaming's foreachBatch is at-least-once: after a
  * crash, the LAST batch can be re-delivered with the SAME batchId.
  * Idempotence by batchId turns that into exactly-once: every batch
  * lands in its own `batch_id=<id>` partition directory, so a
  * replayed batch rewrites identical bytes over itself and the table
  * never double-counts. Readers see one partitioned parquet table
  * (`spark.read.parquet(out)`) with `batch_id` as an ordinary
  * partition column — prunable, and droppable at read time.
  *
  * Replay visibility: the batch is first written to a staging
  * directory (`_staging_batch_id=<id>` — the leading underscore hides
  * it from Spark/parquet readers), then swapped in with
  * delete + rename. A replay therefore exposes concurrent readers to
  * a missing-partition window of only two filesystem metadata ops —
  * NOT the full rewrite duration — but the swap is not atomic:
  * exactly-once refers to the FINAL state, not to read isolation
  * during a replay (true isolation needs a manifest/metadata layer,
  * which plain parquet directories don't have).
  *
  * Scale notes: the write inherits the micro-batch's partitioning
  * (no extra shuffle); within one batch directory parquet commit is
  * rename-based, so a crash mid-write leaves only the hidden staging
  * dir, which the next replay overwrites.
  */
object ExactlyOnceSink {

  /** The idempotent batch writer — also callable directly to simulate
    * a crash-replay in tests.
    */
  def writeBatch(out: String)(batch: DataFrame, batchId: Long): Unit = {
    val staging = new Path(s"$out/_staging_batch_id=$batchId")
    val dest = new Path(s"$out/batch_id=$batchId")
    val fs = dest.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    batch.write.mode("overwrite").parquet(staging.toString)
    fs.delete(dest, true)
    if (!fs.rename(staging, dest))
      throw new java.io.IOException(s"rename $staging -> $dest failed")
  }

  /** Attach the sink to a streaming DataFrame. `checkpoint` carries
    * the offsets + batchId sequencing that replay safety relies on.
    */
  def start(df: DataFrame, out: String, checkpoint: String,
      outputMode: String = "append"): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeBatch(out) _)
      .start()
}
