package graft.streaming

import graft.operators.Similarity
import graft.functions.VectorFunctions.{cosine, srpBucket, toDouble}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming front door of the embedding-contamination check
  * (SURVEY.md §2.7) — d21's verdict logic applied at INGESTION time:
  * each arriving vector is flagged against the held-out benchmark
  * panel BEFORE it enters the training corpus, instead of by a batch
  * sweep after the fact.
  *
  * Shape mirrors StreamingDedup's two-sided split, pushed further:
  *   - the STATIC side carries all the fan-out — the panel is
  *     pre-exploded into its probe buckets at the width-scaled
  *     radius (`Similarity.panelProbeIndex`: Hamming ≤ 2 below
  *     `Similarity.RadiusWideBits`, ≤ 3 at and above — 37 rows per
  *     item at 8 bits, 470 at 14 — so a gate pinned to a wide
  *     batch-derived width keeps the batch kernel's re-widened
  *     angular net), re-resolved every micro-batch so a panel
  *     refresh (new benchmark release) is picked up without
  *     restarting the query — and carries bucket STRINGS only
  *     (r19): the query vectors re-attach by a second panel-sized
  *     broadcast join on bench_id, so the per-micro-batch broadcast
  *     never ships a 65-double vector per probe row;
  *   - the STREAM side is a narrow map (one SRP bucket per vector)
  *     plus a stream-static equi-join on the HOME bucket — no
  *     explode, no watermark, and ZERO streaming state: a
  *     stream-static inner join keeps nothing across batches, so the
  *     gate's memory footprint is the broadcast panel index alone,
  *     whatever the stream length.
  *
  * Exact cosine verifies inside matched buckets (the same verify-
  * after-candidates contract as d21), so flags have no false
  * positives at the threshold; recall is the probe radius's, same as
  * batch — spec-checked batch ≡ stream on identical data.
  */
object StreamingContamination {

  /** Flag arriving vectors within `threshold` cosine of any panel
    * item. `panelIdx` is `Similarity.panelProbeIndex(panel, ...)` —
    * (bucket, bench_id) STRINGS ONLY (r19: at radius 3 a probe row
    * carrying the 65-double query vector multiplied the per-micro-
    * batch static broadcast ~25×; the batch kernel shed that mass in
    * r18, this gate now rides the same slimmed index); `panelVecs`
    * is `Similarity.panelVectors(panel, ...)` — the panel-row-count
    * (bench_id, qv) frame that re-attaches vectors AFTER the bucket
    * match. Output: one row per (arriving vector, matched panel
    * item).
    *
    * `nBits` is REQUIRED (r17): the batch kernel (d21,
    * `Similarity.governedCrossPairs`) derives its width from the
    * corpus count, and a stream cannot re-count the corpus per
    * micro-batch — so the gate PINS the width the batch kernel
    * derived at gate-build time (`Similarity.chooseNBits(corpusCount)`).
    * A defaulted width silently diverged from the governed batch
    * report (different candidate sets, nothing failing loudly), so
    * there is no default.
    */
  def flagAgainstPanel(stream: DataFrame, panelIdx: DataFrame,
      panelVecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int, dims: Int = 64): DataFrame =
    stream
      .withColumn("cv", toDouble(col(vecCol)))
      .withColumn("bucket", srpBucket(col("cv"), nBits, dims))
      .join(broadcast(panelIdx), Seq("bucket"))
      .join(broadcast(panelVecs), Seq("bench_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
      .filter(col("sim") > threshold)
      .select(col(idCol).as("corpus_id"), col("bench_id"))

  /** Convenience: the (probe index, vector side) pair from a raw
    * panel frame — the two static frames [[flagAgainstPanel]] joins.
    * `nBits` required — same pinned-width contract.
    */
  def panelIndex(panel: DataFrame, idCol: String, vecCol: String,
      nBits: Int, dims: Int = 64): (DataFrame, DataFrame) =
    (Similarity.panelProbeIndex(panel, idCol, vecCol, nBits, dims),
      Similarity.panelVectors(panel, idCol, vecCol))
}
