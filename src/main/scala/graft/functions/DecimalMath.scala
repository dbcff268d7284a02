package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact wide-integer arithmetic for micro-unit ratio measures
  * (SURVEY.md §5 drift-free math). Spark's `sum(long)` and `div`
  * wrap silently past 2⁶³ with ANSI off, while DuckDB promotes to
  * HUGEINT — so a micro-unit scaling like `x * 1000000 div y`
  * diverges between the engines exactly on the large inputs the
  * sf0.01/sf0.1 sweeps cannot reach (the p12_gini/t25 finding).
  * Decimal(38,0) intermediates keep both engines exact to 10³⁸.
  */
object DecimalMath {

  /** Cast to decimal(38,0) — the widest exact integer Spark offers. */
  def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Exact floor(a/b) for decimal(38,0) operands with b > 0 — the
    * engine-portable twin of DuckDB's `//` on HUGEINT.
    *
    * Spark's decimal divide ROUNDS (half-up) at the result scale, so
    * `floor(a / b)` alone can land one off when the true quotient
    * sits within the rounding error of an integer. The remainder
    * check repairs it: with q0 within ±1 of the true floor (rounding
    * error < 1 always holds at scale ≥ 6), r0 = a − q0·b pins the
    * side — r0 ≥ b means q0 undershot, r0 < 0 means it overshot.
    */
  def floorDivExact(a: Column, b: Column): Column = {
    val q0 = floor(a / b)
    val r0 = a - q0 * b
    q0 + when(r0 >= b, lit(1)).otherwise(lit(0)) -
      when(r0 < 0, lit(1)).otherwise(lit(0))
  }

  /** `x · 10⁶ div y` in micro-units, exact at any int64-overflowing
    * magnitude, returned as long (callers' published column type).
    */
  def microRatio(x: Column, y: Column): Column =
    floorDivExact(dec(x) * lit(1000000L), dec(y)).cast("long")
}
