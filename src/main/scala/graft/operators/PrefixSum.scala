package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running prefix-sums and ranks — the scale-correct
  * replacement for `sum(...) over (partition by key order by ...)` /
  * `row_number() over (...)` windows whose partition key is a
  * LOW-CARDINALITY, skew-guaranteed column (`source`: a real corpus
  * is 50-80 % one crawl source). The naive window materializes ONE
  * fully-sorted partition per key — at 100 TB a single reducer sorts
  * billions of rows while the rest of the cluster idles (the failure
  * mode p4's doc names, which WindowGroupLimit fixes for top-k but
  * which full ranks/prefix-sums silently kept).
  *
  * The classic three-step distributed prefix-sum instead:
  *
  *   1. CENSUS — tag each row with an ORDER-ALIGNED bucket (a bounded
  *      range-bucket of a numeric expression monotone along the sort
  *      order) and partial-aggregate per-(key, bucket) subtotals: an
  *      exchange carrying ≤ |keys|·`buckets` rows, never the corpus.
  *   2. OFFSETS — a running sum across buckets WITHIN each key, over
  *      the census only: this window partitions by the raw key, but
  *      its input is the bounded census (≤ `buckets` rows per key),
  *      so no unbounded partition exists anywhere.
  *   3. SCAN — broadcast the offsets back and window only WITHIN
  *      (key, bucket): per-reducer work is a bucket, 1/`buckets` of a
  *      key, so one hot source spreads over `buckets` reducers.
  *
  * The result is EXACTLY the naive window's (bucket boundaries only
  * affect parallelism, never values): order-alignment means every row
  * of bucket b precedes every row of bucket b+1 in the sort order, so
  * offset(b) + local prefix ≡ global prefix. Oracle hashes are
  * untouched by construction.
  *
  * Cost vs the naive window: one extra pass over the input for the
  * census (a narrow partial agg — only the key/bucket/value columns
  * move) and, when `bounds` is not statically known, one more narrow
  * pass for the bucket range. Both are embarrassingly parallel; the
  * single-reducer sort they replace is not.
  */
object PrefixSum {

  /** Default bucket fan-out per key. 256 spreads the dominant crawl
    * source over 256 reducers while keeping the census ≤ 256 rows per
    * key; raise it (it is a plain argument) when one source exceeds
    * ~256 executor-sized sort partitions.
    */
  val DefaultBuckets = 256

  /** Adds `out` = the INCLUSIVE running sum of `value` over rows
    * ordered by `orderCols` within each distinct value of `part`.
    *
    * `bucketOn` must be a NUMERIC, NON-NULL, NON-NaN expression
    * monotone NON-DECREASING along `orderCols` within every part —
    * in practice the leading sort key itself (`doc_id`), or a
    * monotone image of it (`-q` for a `q DESC` ordering). Ties across
    * a bucket boundary are fine: alignment needs monotone, not
    * strictly increasing. Null/NaN raise at runtime rather than
    * silently mis-bucket: NaN's SORT position depends on the order
    * direction (Spark treats NaN as greatest — FIRST under DESC,
    * LAST under ASC) while arithmetic clamping would always land it
    * in the LAST bucket, silently corrupting every prefix in the
    * partition; a caller whose order key can be NaN must map it to
    * an explicit monotone image (below `lo` for NaN-first orderings,
    * above `hi` for NaN-last — the clamp then aligns it).
    *
    * `bounds`: static (lo, hi) covering `bucketOn`'s range when the
    * domain is known a priori (a 6dp-rounded quality score lives in
    * [0, 1]); when None, a one-row global min/max aggregate is
    * computed and broadcast (one extra narrow pass — never a driver
    * action).
    */
  def running(df: DataFrame, part: Seq[String], orderCols: Seq[Column],
      bucketOn: Column, value: Column, out: String,
      buckets: Int = DefaultBuckets,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    require(part.nonEmpty, "prefix sum needs at least one partition column")
    // fail loudly on null/NaN (see scaladoc) — a silent clamp would
    // break order alignment and corrupt every prefix in the partition
    val raw = bucketOn.cast("double")
    val b = when(raw.isNull || isnan(raw),
        raise_error(lit("PrefixSum: bucketOn is null or NaN — map it to an " +
          "explicit monotone image at the call site")).cast("double"))
      .otherwise(raw)
    val ranged = bounds match {
      case Some((lo, hi)) =>
        df.withColumn("__pslo", lit(lo)).withColumn("__pshi", lit(hi))
      case None =>
        // 1-row bounds frame, broadcast-nested-loop joined (the
        // engine's 1-row-totals crossJoin discipline) — stays lazy
        df.crossJoin(broadcast(
          df.agg(min(b).as("__pslo"), max(b).as("__pshi"))))
    }
    // clamped range bucket: floor((v-lo)/step) in double — double
    // conversion and positive-scale arithmetic are monotone, which is
    // all alignment needs (rounding may merge neighbors, never swap)
    val step = (col("__pshi") - col("__pslo")) / lit(buckets.toDouble)
    val tagged = ranged
      .withColumn("__psv", value.cast("long"))
      .withColumn("__psb",
        when(col("__pshi") <= col("__pslo"), lit(0))
          .otherwise(least(lit(buckets - 1), greatest(lit(0),
            floor((b - col("__pslo")) / step)))).cast("int"))
      .drop("__pslo", "__pshi")
    val partCols = part.map(col)
    // 1. census: partial agg → ≤ |keys|·buckets rows cross the wire
    val census = tagged.groupBy(partCols :+ col("__psb"): _*)
      .agg(sum(col("__psv")).as("__psbsum"))
    // 2. offsets: the ONLY per-key window, over the bounded census
    val wOff = Window.partitionBy(partCols: _*).orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census
      .withColumn("__psoff", coalesce(sum(col("__psbsum")).over(wOff), lit(0L)))
      .select(partCols :+ col("__psb") :+ col("__psoff"): _*)
    // 3. scan: broadcast offsets back; the heavy window partitions by
    // (key, bucket) — a hot key spreads over `buckets` reducers
    val wLoc = Window.partitionBy(partCols :+ col("__psb"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.join(broadcast(offsets), part :+ "__psb")
      .withColumn(out, col("__psoff") + sum(col("__psv")).over(wLoc))
      .drop("__psv", "__psb", "__psoff")
  }

  /** Adds `out` = the 1-based dense row rank (`row_number` over a
    * tie-free ordering) — a prefix COUNT through the same kernel.
    */
  def rank(df: DataFrame, part: Seq[String], orderCols: Seq[Column],
      bucketOn: Column, out: String,
      buckets: Int = DefaultBuckets,
      bounds: Option[(Double, Double)] = None): DataFrame =
    running(df, part, orderCols, bucketOn, lit(1L), out, buckets, bounds)
}
