package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: lay documents out
  * contiguously (in a deterministic order) and chunk the token stream
  * into fixed token-budget packs — each doc's pack is the block its
  * FIRST token falls into. Deterministic, engine-portable (same
  * definition is plain window SQL), and batch-friendly: consumers read
  * whole packs as training sequences.
  *
  * Scale design: packing needs a running token total per `groupCol`
  * (shard/source) — a key that is LOW-cardinality and skew-guaranteed
  * for a real corpus, so a naive per-group window would funnel the
  * dominant source into one reducer's sort. The running total
  * therefore goes through `PrefixSum` (census → bounded offsets →
  * per-(group, bucket) scan): every group packs in parallel AND
  * within a hot group the scan spreads over the bucket fan-out. That
  * matches how training data is actually laid out (packed within
  * shards, shards shuffled at read time).
  */
object Packing {

  /** Adds `pack_id` (0-based within each group). `tokCol` must be a
    * non-negative integral token count per row; `orderCol` a NUMERIC
    * unique-per-group layout key (it doubles as the prefix-sum's
    * order-aligned bucket source).
    */
  def assignPacks(df: DataFrame, groupCol: String, orderCol: String,
      tokCol: Column, budget: Long): DataFrame = {
    val withTok = df.withColumn("__tok", tokCol.cast("long"))
    PrefixSum.running(withTok, Seq(groupCol), Seq(col(orderCol)),
        bucketOn = col(orderCol), value = col("__tok"), out = "__cum")
      .withColumn("pack_id",
        floor((col("__cum") - col("__tok")) / lit(budget)))
      .drop("__tok", "__cum")
  }
}
