package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Boundary-value gate for every float-emitting entry (SURVEY §5's
  * signed-zero rule, made a spec — judge r15 #7): the t20 bug class
  * is a value whose REPR diverges between engines while its numeric
  * value agrees — IEEE −0.0 ('-0.0' vs '0.0') and NaN are the two
  * reachable cases for the repr-based hash compare. The r15 sweep
  * caught one −0.0 at sf1 that no smaller scale reached; this spec
  * fails the moment any entry's float output can produce one, at
  * spec time instead of sweep time.
  *
  * Every float column an entry publishes must be canonicalized
  * (`+ 0.0` folds −0.0 to 0.0 — identity for every other value) and
  * NaN-free. Checked over sf0.001 outputs; the per-round sweeps
  * remain the larger-scale net.
  */
class FloatBoundarySpec extends SparkSpec {

  test("no entry publishes -0.0 or NaN in a float column") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf0)
      val floatCols = df.schema.fields
        .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
        .map(_.name)
      if (floatCols.nonEmpty) {
        val aggs = floatCols.flatMap { c =>
          Seq(
            // the STRING repr is exactly what the hash compare sees —
            // only true IEEE −0.0 stringifies as "-0.0"
            sum(when(col(c).cast("string") === "-0.0", 1L)
              .otherwise(0L)).as(s"negzero__$c"),
            sum(when(isnan(col(c)), 1L).otherwise(0L)).as(s"nan__$c"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i) && row.getLong(i) > 0)
            failures += s"$name.$f=${row.getLong(i)}"
        }
      }
    }
    assert(failures.isEmpty,
      s"float boundary values reachable (add the + 0.0 canonicalization " +
        s"on BOTH engine sides): ${failures.mkString(", ")}")
  }
}
