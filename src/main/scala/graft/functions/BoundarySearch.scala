package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst binary search over a SORTED `array<double>` column:
  * returns the number of elements `< v` (`inclusive = false`, the
  * lower bound) or `<= v` (`inclusive = true`, the upper bound).
  *
  * This is the per-row bucket-assignment primitive of the equi-depth
  * distributed prefix-sum (PrefixSum): every row looks its order key
  * up in the broadcast quantile-boundary array. A higher-order-
  * function formulation (`size(filter(bnds, x -> x < v))`) runs
  * interpreted and linear — O(k) lambda calls per row, outside
  * whole-stage codegen; this expression is an O(log k) primitive loop
  * inside it (the ArrayDotProduct precedent). The boundaries must be
  * sorted non-decreasing — quantiles of increasing probabilities are
  * by construction; an unsorted array would bucket nonsense, which is
  * why the expression is package-internal rather than user-facing.
  */
case class BoundarySearch(left: Expression, right: Expression, inclusive: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val e = arr.getDouble(mid)
      if (if (inclusive) e <= v else e < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val op = if (inclusive) "<=" else "<"
      s"""
        int $lo = 0;
        int $hi = $x.numElements();
        while ($lo < $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($x.getDouble($mid) $op $y) $lo = $mid + 1; else $hi = $mid;
        }
        ${ev.value} = $lo;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundarySearch =
    copy(left = newLeft, right = newRight)
}

object BoundarySearch {
  /** `boundaries` must be `array<double>` sorted non-decreasing;
    * `v` a double. Returns int: |{i : boundaries(i) < v}| (or `<= v`).
    */
  def apply(boundaries: Column, v: Column, inclusive: Boolean): Column =
    GraftColumnBridge.column(BoundarySearch(
      GraftColumnBridge.expression(boundaries),
      GraftColumnBridge.expression(v), inclusive))
}
