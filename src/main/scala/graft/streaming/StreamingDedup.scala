package graft.streaming

import graft.functions.TextFunctions.fingerprintMd5
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming front door of the incremental-dedup pipeline
  * (SURVEY.md §2.7) — the d10 verdict logic applied at INGESTION time
  * instead of batch time.
  *
  * Two layers, both state-bounded:
  *   1. in-stream exact dedup: `dropDuplicatesWithinWatermark` on the
  *      normalized-text fingerprint — a burst of identical docs inside
  *      the watermark window keeps only the first; state is evicted
  *      with the watermark, never grows with the corpus;
  *   2. corpus dedup: stream-static LEFT ANTI join against the
  *      corpus's fingerprint index. The static side is re-resolved
  *      every micro-batch, so a growing index (e.g. appended by the
  *      very batches this stream admits) is picked up without
  *      restarting the query; the stream side never shuffles wide —
  *      the index join is the same probe d10 pays.
  *
  * Near-dup LSH probing composes the same way (bands instead of
  * fingerprints); exact-only here keeps the streaming state story
  * clean.
  */
object StreamingDedup {

  /** `corpusFp` must have a single `fp` column (md5 fingerprints of
    * the corpus's normalized texts).
    */
  def dedupAgainstCorpus(stream: DataFrame, corpusFp: DataFrame,
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    stream.withColumn("fp", fingerprintMd5(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFp, Seq("fp"), "left_anti")

  /** The corpus index the stream probes — in production a maintained
    * table, derived here.
    */
  def fingerprintIndex(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(fingerprintMd5(col(textCol)).as("fp")).distinct()
}
