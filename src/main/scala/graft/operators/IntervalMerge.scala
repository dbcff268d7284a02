package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge overlapping/touching per-key intervals into maximal islands
  * (IntervalJoin's complement: that PAIRS overlapping windows, this
  * COLLAPSES them into continuous spans — activity windows, blackout
  * ranges, retry storms).
  *
  * Classic islands construction: order each key's intervals by
  * (start, id); a row OPENS a new island iff its start exceeds the
  * running max end over all PRIOR rows (touching endpoints count as
  * merged); island id = running sum of open flags; one partial agg
  * over (key, island) emits the span. Tie order within equal starts
  * cannot change membership (a tied row's end ≥ its own start, so it
  * merges with the first of the tie either way) — the result is
  * order-deterministic.
  *
  * Scale shape: ONE (key) hash shuffle. Both window frames share the
  * partitioning and sort, and the final (key, island) aggregation is
  * satisfied by the key-only partitioning (island refines key), so
  * Catalyst plans no second exchange (IntervalMergeSpec pins exactly
  * one). Per-key scan state is one running max and one counter —
  * nothing quadratic, no global sort.
  */
object IntervalMerge {

  /** Returns one row per island: (key, island, m_start, m_end,
    * n_merged), island numbered 1.. per key in span order.
    */
  def islands(df: DataFrame, keyCol: String, idCol: String,
      sCol: String, eCol: String): DataFrame = {
    val (k, id, s, e): (Column, Column, Column, Column) =
      (col(keyCol), col(idCol), col(sCol), col(eCol))
    val ord = Window.partitionBy(k).orderBy(s, id)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("prev_max_e", max(e).over(prev))
      .withColumn("opens",
        when(col("prev_max_e").isNull || s > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(ord))
      .groupBy(k, col("island"))
      .agg(min(s).cast("long").as("m_start"),
        max(e).cast("long").as("m_end"),
        count(lit(1)).as("n_merged"))
  }
}
