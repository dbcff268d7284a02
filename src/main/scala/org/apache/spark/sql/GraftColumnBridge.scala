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

  /** Build a DataFrame from already-internal rows (physical values:
    * UTF8String, epoch-day ints, micros longs) without the external
    * Row → Catalyst conversion pass `createDataFrame` pays per cell.
    * Used by the Avro conversion leg, whose container decoding already
    * produces exactly the physical encodings.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
