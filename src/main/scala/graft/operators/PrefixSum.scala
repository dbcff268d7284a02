package graft.operators

import graft.functions.BoundarySearch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running prefix-sums and ranks — the scale-correct
  * replacement for `sum(...) over (partition by key order by ...)` /
  * `row_number() over (...)` windows whose partition key is a
  * LOW-CARDINALITY, skew-guaranteed column (`source`: a real corpus
  * is 50-80 % one crawl source). The naive window materializes ONE
  * fully-sorted partition per key — at 100 TB a single reducer sorts
  * billions of rows while the rest of the cluster idles.
  *
  * The classic three-step distributed prefix-sum:
  *
  *   1. CENSUS — tag each row with an ORDER-ALIGNED bucket and
  *      partial-aggregate per-(key, bucket) subtotals: an exchange
  *      carrying ≤ |keys|·fanout rows, never the corpus.
  *   2. OFFSETS — a running sum across buckets WITHIN each key, over
  *      the census only: this window partitions by the raw key, but
  *      its input is the bounded census, so no unbounded partition
  *      exists anywhere.
  *   3. SCAN — broadcast the offsets back and window only WITHIN
  *      (key, bucket): per-reducer work is a bucket, so one hot
  *      source spreads over the fan-out.
  *
  * Bucket boundaries are EQUI-DEPTH: a sampled quantile pass over
  * `bucketOn` (`percentile_approx` at fixed resolution
  * [[MaxBuckets]] — the same boundary-from-sample discipline as
  * Spark's RangePartitioner) broadcast as one row, with per-row
  * assignment an O(log k) codegen'd binary search
  * ([[graft.functions.BoundarySearch]]). Parallelism therefore
  * follows ROW MASS, not value range — the equi-width form
  * (`floor((v−lo)/step)`) re-concentrated a heavy-tailed `bucketOn`
  * (one 100 MB doc stretches the range so every common length lands
  * in bucket 0) back onto one reducer. Two residual skew cases are
  * handled explicitly:
  *
  *   - a SINGLE VALUE holding more than 1/fanout of the mass (a
  *     template source whose docs all score identically) occupies
  *     several consecutive identical boundaries; its rows are
  *     sub-split across that quantile span by `tieBreakOn` — safe
  *     because ties in `bucketOn` are ordered by the REMAINING sort
  *     keys, of which `tieBreakOn` must be a monotone non-null image
  *     (the unique `doc_id` tie-breaker every caller already orders
  *     by). Without `tieBreakOn` ties stay in one bucket: still
  *     exact, just unbalanced.
  *   - the FAN-OUT auto-scales with the data: the same stats pass
  *     carries `count(*)`, and the effective fan-out is
  *     `clamp(buckets, ceil(n / targetRowsPerBucket), MaxBuckets)` —
  *     a 32× ingest keeps per-bucket row mass flat instead of
  *     re-concentrating past a static knob.
  *
  * The result is EXACTLY the naive window's (bucket boundaries only
  * affect parallelism, never values): the assignment is monotone
  * non-decreasing along the sort order — strictly smaller `bucketOn`
  * can never land in a later bucket (binary search is monotone), and
  * within a heavy tie the sub-split follows `tieBreakOn`, which
  * follows the remaining order keys. Offset(b) + local prefix ≡
  * global prefix; oracle hashes are untouched by construction.
  *
  * Cost vs the naive window: one extra narrow pass over the input
  * for the quantile/count stats (never a driver action — the 1-row
  * frame is broadcast-joined) plus the census pass. Both are
  * embarrassingly parallel; the single-reducer sort they replace is
  * not. Callers with an expensive upstream should lineage-cut it
  * first (`Checkpoints.cut`): the stats, census and scan branches
  * each re-evaluate their input.
  */
object PrefixSum {

  /** Minimum bucket fan-out per key — the floor the auto-sizing never
    * goes below, so a small frame still spreads a hot key over 256
    * reducers.
    */
  val DefaultBuckets = 256

  /** Quantile-sketch resolution = the maximum fan-out the auto-sizing
    * can reach. The sketch is one `percentile_approx` agg regardless
    * of resolution; per-row assignment is O(log MaxBuckets).
    */
  val MaxBuckets = 4096

  /** Auto-sizing target: the fan-out grows past `buckets` once the
    * input exceeds `buckets × target` rows, keeping per-bucket mass
    * (≈ one reducer's sort) flat as the data scales.
    */
  val DefaultTargetRowsPerBucket: Long = 1L << 21

  /** The stats + bucket-tagging step, factored out so the shape specs
    * can inspect the `__psb` assignment directly. Adds `__psb` (int,
    * in [0, fanout)); the caller drops it.
    */
  private[graft] def taggedBuckets(df: DataFrame, bucketOn: Column,
      tieBreakOn: Option[Column], buckets: Int,
      targetRowsPerBucket: Long): DataFrame = {
    require(buckets >= 1 && buckets <= MaxBuckets,
      s"prefix-sum fan-out must be in [1, $MaxBuckets], got $buckets")
    // fail loudly on null/NaN (see scaladoc of running) — a silent
    // clamp would break order alignment and corrupt every prefix in
    // the partition (NaN sorts GREATEST in Spark: FIRST under DESC,
    // LAST under ASC — no single arithmetic image is order-correct)
    val raw = bucketOn.cast("double")
    val b = when(raw.isNull || isnan(raw),
        raise_error(lit("PrefixSum: bucketOn is null or NaN — map it to an " +
          "explicit monotone image at the call site")).cast("double"))
      .otherwise(raw)
    val probs = (1 until MaxBuckets).map(_.toDouble / MaxBuckets)
    val tieAggs = tieBreakOn.toSeq.flatMap { tc =>
      val t = tc.cast("double")
      Seq(min(t).as("__pstlo"), max(t).as("__psthi"))
    }
    val aggs = Seq(
      percentile_approx(b, typedlit(probs), lit(10000)).as("__psq"),
      count(lit(1)).as("__psn")) ++ tieAggs
    // 1-row stats frame, broadcast-nested-loop joined (the engine's
    // 1-row-totals crossJoin discipline) — stays lazy
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val fan = least(lit(MaxBuckets), greatest(lit(buckets),
      ceil(col("__psn").cast("double") / lit(targetRowsPerBucket.toDouble))
        .cast("int")))
    // fine index in [0, MaxBuckets): boundaries strictly below v,
    // plus — across the span of boundaries EQUAL to v (a single value
    // heavier than one quantile slice) — a tie sub-position. Monotone
    // along the sort order: rows below v end ≤ lower(v), rows above
    // start ≥ upper(v), and within the tie the sub-position follows
    // tieBreakOn, which follows the remaining order keys.
    val lower = BoundarySearch(col("__psq"), b, inclusive = false).cast("double")
    val upper = BoundarySearch(col("__psq"), b, inclusive = true).cast("double")
    val pos = tieBreakOn match {
      case Some(tc) =>
        val t = tc.cast("double")
        // degrades to 0 (no sub-split — exact, unbalanced) when the
        // tie range is degenerate or polluted by NaN (max = NaN)
        nanvl(when(col("__psthi") > col("__pstlo"),
          least(lit(1.0), greatest(lit(0.0),
            (coalesce(t, col("__pstlo")) - col("__pstlo")) /
              (col("__psthi") - col("__pstlo")))))
          .otherwise(lit(0.0)), lit(0.0))
      case None => lit(0.0)
    }
    val fine = lower + floor((upper - lower) * pos)
    df.crossJoin(broadcast(stats))
      .withColumn("__psb",
        floor(fine * fan.cast("double") / lit(MaxBuckets.toDouble)).cast("int"))
      .drop("__psq", "__psn", "__pstlo", "__psthi")
  }

  /** Adds `out` = the INCLUSIVE running sum of `value` over rows
    * ordered by `orderCols` within each distinct value of `part`.
    *
    * `bucketOn` must be a NUMERIC, NON-NULL, NON-NaN expression
    * monotone NON-DECREASING along `orderCols` within every part —
    * in practice the leading sort key itself (`doc_id`), or a
    * monotone image of it (`-q` for a `q DESC` ordering). Ties across
    * a bucket boundary are fine: alignment needs monotone, not
    * strictly increasing. Null/NaN raise at runtime rather than
    * silently mis-bucket; a caller whose order key can be NaN must
    * map it to an explicit monotone image (below the range for
    * NaN-first orderings, above it for NaN-last).
    *
    * `tieBreakOn`: a NUMERIC, non-null, non-NaN expression monotone
    * along the REMAINING `orderCols` among rows whose `bucketOn`
    * ties (in practice the unique trailing sort key, `doc_id`).
    * Spreads a single over-heavy value — a constant-score template
    * source — across its quantile span instead of one reducer. Omit
    * when `bucketOn` is unique per part (dense ids): results are
    * identical either way.
    *
    * `value` must be INTEGRAL (it is summed as long — a fractional
    * value would be silently truncated; Packing's token-count
    * contract, stated here because the kernel enforces only the
    * type cast).
    */
  def running(df: DataFrame, part: Seq[String], orderCols: Seq[Column],
      bucketOn: Column, value: Column, out: String,
      buckets: Int = DefaultBuckets,
      tieBreakOn: Option[Column] = None,
      targetRowsPerBucket: Long = DefaultTargetRowsPerBucket): DataFrame = {
    require(part.nonEmpty, "prefix sum needs at least one partition column")
    val tagged =
      taggedBuckets(df, bucketOn, tieBreakOn, buckets, targetRowsPerBucket)
        .withColumn("__psv", value.cast("long"))
    val partCols = part.map(col)
    // 1. census: partial agg → ≤ |keys|·fanout rows cross the wire
    val census = tagged.groupBy(partCols :+ col("__psb"): _*)
      .agg(sum(col("__psv")).as("__psbsum"))
    // 2. offsets: the ONLY per-key window, over the bounded census
    val wOff = Window.partitionBy(partCols: _*).orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census
      .withColumn("__psoff", coalesce(sum(col("__psbsum")).over(wOff), lit(0L)))
      .select(partCols :+ col("__psb") :+ col("__psoff"): _*)
    // 3. scan: broadcast offsets back; the heavy window partitions by
    // (key, bucket) — a hot key spreads over the fan-out
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
      tieBreakOn: Option[Column] = None,
      targetRowsPerBucket: Long = DefaultTargetRowsPerBucket): DataFrame =
    running(df, part, orderCols, bucketOn, lit(1L), out, buckets, tieBreakOn,
      targetRowsPerBucket)
}
