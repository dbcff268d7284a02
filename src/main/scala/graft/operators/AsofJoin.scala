package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key (SURVEY.md §2.2
  * extension; the canonical "operator Spark lacks" — DuckDB ships it
  * as ASOF JOIN, which is exactly the oracle used for `q_asof`).
  *
  * Spark-first implementation: no custom physical node needed — the
  * semantics decompose into a tagged union + one window pass:
  *   1. tag right rows 0, left rows 1 (so at equal ts the right row
  *      sorts first → inclusive `>=` semantics),
  *   2. one shuffle on the key, one sort on (ts, tag),
  *   3. `last(right_payload, ignoreNulls)` over the running window
  *      carries the most recent right row forward to each left row.
  * Cost: ONE shuffle of |L|+|R| rows — no range explosion, no
  * per-row probes; AQE handles key skew. This beats the naive
  * range-join (|L|×|R| within key) that a generic planner would pick.
  *
  * Rows with multiple right matches at the exact same timestamp pick
  * the last in (ts, tag) order — with nanosecond event times,
  * collisions are measure-zero; add a tiebreak column to `ts` if your
  * data quantizes timestamps.
  */
object AsofJoin {

  /** Inner as-of join. Output: left columns + `rightCols` (each
    * prefixed `asof_`) from the matched right row; left rows with no
    * prior right row are dropped (inner semantics, like DuckDB's
    * default ASOF JOIN).
    *
    * `toleranceSec` (pandas merge_asof semantics): a match older than
    * `left.ts − tolerance` is discarded — stale state should not
    * enrich an event from hours later. The matched right timestamp is
    * carried in the window payload anyway, so the bound is one extra
    * filter on the SAME single-shuffle plan.
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSec: Option[Long] = None): DataFrame = {
    require(!rightCols.contains("_rts"), "right column name _rts is reserved")
    require(toleranceSec.forall(_ > 0), "tolerance must be positive")
    val lPay = struct(left.columns.map(col).toIndexedSeq: _*)
    // the matched right TS rides along for the tolerance bound
    val rPay = struct(col(ts).as("_rts") +: rightCols.map(col).toIndexedSeq: _*)
    val rSchema = right.select(col(ts).as("_rts") +: rightCols.map(col): _*).schema
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"), lit(1).as("_tag"),
      lPay.as("_l"),
      lit(null).cast(rSchema).as("_r"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"), lit(0).as("_tag"),
      lit(null).cast(left.schema).as("_l"), rPay.as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinTol = toleranceSec.fold(lit(true))(t =>
      col("_m").getField("_rts") >= col("_ts") - expr(s"INTERVAL $t SECONDS"))
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_m").isNotNull && withinTol)
    val leftCols = left.columns.map(c => col("_l").getField(c).as(c))
    val matchCols = rightCols.map(c => col("_m").getField(c).as(s"asof_$c"))
    carried.select((leftCols ++ matchCols).toIndexedSeq: _*)
  }

  /** FORWARD as-of join (pandas merge_asof direction='forward'): for
    * each left row, the EARLIEST right row with `right.ts >= left.ts`
    * — "what happened next" enrichment (first click after a purchase,
    * first error after a deploy). The mirror image of `asof`: left
    * rows tag 0 so an equal-ts right row sorts inside the
    * current-row→following frame (inclusive), and `first(_,
    * ignoreNulls)` over that frame carries the next right row back.
    * Same ONE |L|+|R| shuffle; `toleranceSec` discards matches newer
    * than `left.ts + tolerance`.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], toleranceSec: Option[Long] = None): DataFrame = {
    require(!rightCols.contains("_rts"), "right column name _rts is reserved")
    require(toleranceSec.forall(_ > 0), "tolerance must be positive")
    val lPay = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPay = struct(col(ts).as("_rts") +: rightCols.map(col).toIndexedSeq: _*)
    val rSchema = right.select(col(ts).as("_rts") +: rightCols.map(col): _*).schema
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"), lit(0).as("_tag"),
      lPay.as("_l"), lit(null).cast(rSchema).as("_r"))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"), lit(1).as("_tag"),
      lit(null).cast(left.schema).as("_l"), rPay.as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withinTol = toleranceSec.fold(lit(true))(t =>
      col("_m").getField("_rts") <= col("_ts") + expr(s"INTERVAL $t SECONDS"))
    val carried = l.unionByName(r)
      .withColumn("_m", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0 && col("_m").isNotNull && withinTol)
    val leftCols = left.columns.map(c => col("_l").getField(c).as(c))
    val matchCols = rightCols.map(c => col("_m").getField(c).as(s"asof_$c"))
    carried.select((leftCols ++ matchCols).toIndexedSeq: _*)
  }
}
