package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet sink for foreachBatch pipelines
  * (SURVEY.md §2.7).
  *
  * Structured Streaming's foreachBatch is at-least-once: after a
  * crash, the LAST batch can be re-delivered with the SAME batchId.
  * Idempotence by batchId turns that into exactly-once: every batch
  * writes `mode(overwrite)` into its own `batch_id=<id>` partition
  * directory, so a replayed batch rewrites identical bytes over
  * itself and the table never double-counts. Readers see one
  * partitioned parquet table (`spark.read.parquet(out)`) with
  * `batch_id` as an ordinary partition column — prunable, and
  * droppable at read time.
  *
  * Scale notes: the write inherits the micro-batch's partitioning
  * (no extra shuffle); a concurrent reader never observes a torn
  * batch because parquet commit is rename-based per directory.
  */
object ExactlyOnceSink {

  /** The idempotent batch writer — also callable directly to simulate
    * a crash-replay in tests.
    */
  def writeBatch(out: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")

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
