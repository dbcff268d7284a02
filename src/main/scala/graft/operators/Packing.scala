package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents out
  * contiguously (in a deterministic order) and chunk the token stream
  * into fixed token-budget packs — each doc's pack is the block its
  * FIRST token falls into. Deterministic, engine-portable (same
  * definition is plain window SQL), and batch-friendly: consumers read
  * whole packs as training sequences.
  *
  * Scale design: packing needs a running token total, i.e. a sorted
  * window — a GLOBAL ordering would serialize at 100 TB, so packing is
  * per `groupCol` (shard/source): the window partitions by group and
  * every group packs independently in parallel. That matches how
  * training data is actually laid out (packed within shards, shards
  * shuffled at read time).
  */
object Packing {

  /** Adds `pack_id` (0-based within each group). `tokCol` must be a
    * non-negative integral token count per row.
    */
  def assignPacks(df: DataFrame, groupCol: String, orderCol: String,
      tokCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokCol.cast("long"))
      .withColumn("pack_id",
        floor((sum(col("__tok")).over(w) - col("__tok")) / lit(budget)))
      .drop("__tok")
  }
}
