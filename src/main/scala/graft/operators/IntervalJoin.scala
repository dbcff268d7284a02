package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General interval-OVERLAP self-join: pairs of same-key rows whose
  * [start, end] intervals intersect (SURVEY.md §2.2 q_interval_join).
  * RangeJoin is the one-sided form (point vs trailing window); this is
  * the two-sided one — both rows carry an interval (meeting conflicts,
  * session co-presence, overlapping order fulfillment windows).
  *
  * Scale design: the naive form joins on the key alone and filters the
  * overlap predicate — every same-key pair materializes first, which
  * explodes on hot keys. Instead both sides explode into the
  * fixed-width buckets their interval covers and the join runs on
  * `(key, bucket)`. Shuffle cardinality is Σ span/width per side —
  * linear in the data for bounded spans. A pair sharing several
  * buckets would surface once per shared bucket, so the join keeps
  * only the bucket containing the OVERLAP START (`floor(max(s_a,
  * s_b)/width)`): exactly one surviving bucket per true pair —
  * dedup by construction, no distinct pass.
  */
object IntervalJoin {

  /** Overlapping same-key pairs: one output row per unordered pair
    * (id_a < id_b) of `df` rows with equal `keyCol` and intersecting
    * [startCol, endCol] (integer units, inclusive bounds).
    * `bucketWidth` should be ≥ the typical span so most intervals
    * explode into 1-2 buckets.
    */
  def overlapPairs(df: DataFrame, idCol: String, keyCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bkt(c: Column): Column = floor(c / bucketWidth)
    def side(suffix: String): DataFrame =
      df.select(col(idCol).as(s"id$suffix"), col(keyCol).as(s"key$suffix"),
          col(startCol).cast("long").as(s"s$suffix"),
          col(endCol).cast("long").as(s"e$suffix"))
        .withColumn(s"bkt$suffix",
          explode(sequence(bkt(col(s"s$suffix")), bkt(col(s"e$suffix")))))
    val a = side("_a")
    val b = side("_b")
    a.join(b,
        col("key_a") === col("key_b") && col("bkt_a") === col("bkt_b") &&
          col("id_a") < col("id_b") &&
          // overlap, then keep only the overlap-start bucket (dedup)
          col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
          col("bkt_a") === bkt(greatest(col("s_a"), col("s_b"))))
      .select(col("key_a").as("key"), col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) -
          greatest(col("s_a"), col("s_b")) + 1).as("overlap_len"))
  }
}
