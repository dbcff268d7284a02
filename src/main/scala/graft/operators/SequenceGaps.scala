package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Islands-and-gaps over a key sequence (SURVEY.md §2.2
  * q_sequence_gaps) — the missing runs in an id space (dropped
  * batches in an ingest ledger, holes after deletes).
  *
  * Scale shape (the classic distributed fix-up, replacing a global
  * ORDER-BY window that would funnel every key through one task's
  * sort): ONE range-partition shuffle of the raw keys, then a
  * per-partition sorted scan that (a) dedups consecutive equal keys —
  * range partitioning sends every copy of a key to the same
  * partition, so no separate distinct() shuffle — and (b) emits each
  * intra-partition hole as a gap row plus exactly one
  * (first_key, last_key) summary row per non-empty partition. The
  * ≤P−1 partition-boundary holes are patched from those ≤P summary
  * rows by ONE single-row collect_list aggregation + an array
  * zip_with — bounded by the partition COUNT, never the data (at
  * 100 TB with 10k partitions that is a 10k-struct array in one
  * task), with no driver collect and no Window anywhere.
  *
  * The whole operator is LAZY — nothing executes until an action,
  * so plan-only callers (explain, SQL-view wiring) pay nothing —
  * and the heavy stage's plan shape is pinned by PlanSpec (no
  * Window, no global Sort over the keys). The scan is the one
  * genuinely per-partition-imperative step in the engine: a running
  * previous-key comparison with end-of-partition emission has no
  * shuffle-free DataFrame spelling (a pid-partitioned Window would
  * re-shuffle N rows just to relabel them).
  *
  * The gap branch and the summary branch share the ONE key shuffle
  * via exchange reuse (AQE turns the second branch's exchange into a
  * ReusedExchange — PlanSpec pins it): the keys are shuffled once
  * and the narrow scan re-reads the shuffle files, which keeps the
  * operator free of caches/checkpoints — nothing is retained after
  * the action completes (an earlier design localCheckpoint'd the
  * scan output and left blocks pinned for the session's lifetime).
  */
object SequenceGaps {

  /** The heavy stage, exposed for plan inspection: range-partition
    * `keyCol` (nulls dropped — a null key is not part of the id
    * space), scan each partition in sorted order, and emit
    * tag 0 = intra-partition gap (a = gap_start, b = gap_end) and
    * tag 1 = partition summary (a = first key, b = last key).
    */
  def taggedScan(keys: DataFrame, keyCol: String, numPartitions: Int): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val ks = keys.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .repartitionByRange(numPartitions, col("k"))
      .sortWithinPartitions(col("k"))
    ks.as[Long].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        new Iterator[(Int, Int, Long, Long)] {
          private val first = it.next()
          private var prev = first
          private var pending: Option[(Int, Int, Long, Long)] = None
          private var summaryDone = false
          def hasNext: Boolean = {
            while (pending.isEmpty && it.hasNext) {
              val k = it.next()
              if (k > prev + 1) pending = Some((0, pid, prev + 1, k - 1))
              if (k != prev) prev = k
            }
            if (pending.isEmpty && !summaryDone) {
              pending = Some((1, pid, first, prev)); summaryDone = true
            }
            pending.isDefined
          }
          def next(): (Int, Int, Long, Long) = {
            val r = pending.get; pending = None; r
          }
        }
      }
    }.toDF("tag", "pid", "a", "b")
  }

  /** All gaps in the key sequence: (gap_start, gap_end, gap_len),
    * ordered by gap_start (the final sort is over the OUTPUT gap
    * rows — tiny — not the input keys).
    */
  def gaps(keys: DataFrame, keyCol: String, numPartitions: Int): DataFrame = {
    val tagged = taggedScan(keys, keyCol, numPartitions)
    val intra = tagged.filter(col("tag") === 0)
      .select(col("a").as("gap_start"), col("b").as("gap_end"))
    // boundary fix-up: sorted (pid, first, last) summaries zipped
    // against their successor; empty partitions emit no summary, so
    // consecutive array entries ARE consecutive non-empty partitions
    val cross = tagged.filter(col("tag") === 1)
      .agg(sort_array(collect_list(struct(col("pid"), col("a"), col("b")))).as("bs"))
      .select(explode(zip_with(col("bs"), slice(col("bs"), lit(2), size(col("bs"))),
        (lo, hi) => struct((lo.getField("b") + 1).as("gap_start"),
          (hi.getField("a") - 1).as("gap_end")))).as("g"))
      .select(col("g.gap_start"), col("g.gap_end"))
      // trailing zip_with pad (last summary, null) and adjacent
      // partitions with no hole both drop here
      .filter(col("gap_end").isNotNull && col("gap_end") >= col("gap_start"))
    intra.unionByName(cross)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"))
      .orderBy(col("gap_start"))
  }
}
