package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ⇄ Expression converters, so graft
  * can expose custom Catalyst expressions as user-facing Columns. The
  * same pattern appears in public Spark extension libraries — the
  * converters themselves are stable across the 4.x classic API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
