package graft

import graft.functions.ArrayDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions and
  * optimizer rules, via the standard extension mechanism: add
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and plain SQL can call
  * them — `SELECT array_dot(a, b)` participates in codegen exactly
  * like the Column API (`graft.functions.ArrayDotProduct`) — while
  * every query in the session gets the `LevenshteinGuard` rewrite
  * (bounded edit-distance predicates gain a free O(1) length
  * prefilter) and the `WindowOrderLift` rewrite (decorrelated
  * LATERAL top-k plans lose their global sort and gain
  * WindowGroupLimit).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "array_dot(a, b) takes two array<double> arguments")
        ArrayDotProduct(exprs.head, exprs(1))
      }))
    e.injectOptimizerRule(_ => graft.plans.LevenshteinGuard)
    e.injectOptimizerRule(_ => graft.plans.WindowOrderLift)
  }
}
