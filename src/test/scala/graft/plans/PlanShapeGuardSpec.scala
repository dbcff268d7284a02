package graft.plans

import graft.{PlanShape, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The unbounded-window guard's census exemption must be TIGHT: only
  * a window whose IMMEDIATE input stage is an aggregate (the
  * prefix-sum's bounded offsets step) is exempt. The old
  * any-aggregate-below-in-subtree rule silently passed a naive
  * per-key window whose input merely CONTAINED an unrelated upstream
  * aggregate — e.g. raw rows joined with a per-key count — which is
  * exactly the one-reducer-per-source shape the guard exists to
  * catch.
  */
class PlanShapeGuardSpec extends SparkSpec {
  import spark.implicits._

  private def raw = (1 to 100)
    .map(i => (if (i % 10 == 0) "s2" else "hot", i.toLong, (i % 7).toLong))
    .toDF("source", "id", "tok")

  test("a naive per-key window above an unrelated aggregate is caught") {
    // raw rows join a bounded per-source census, then a full
    // per-source window runs over the JOINED (still raw-sized) rows:
    // the aggregate below the join must NOT exempt the window
    val census = raw.groupBy($"source").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"source").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val plan = raw.join(census, "source")
      .withColumn("cum", sum($"tok").over(w))
      .queryExecution.executedPlan.toString
    assert(AggPresent(plan), s"test setup must contain an aggregate:\n$plan")
    val bad = PlanShape.unboundedWindowsOn(plan, "source")
    assert(bad.nonEmpty,
      s"window over join-with-aggregate-below must be flagged:\n$plan")
  }

  test("the offsets window (aggregate as immediate input) stays exempt") {
    val census = raw.groupBy($"source", ($"id" % 4).as("__psb"))
      .agg(sum($"tok").as("s"))
    val w = Window.partitionBy($"source").orderBy($"__psb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val plan = census
      .withColumn("off", coalesce(sum($"s").over(w), lit(0L)))
      .queryExecution.executedPlan.toString
    assert(PlanShape.unboundedWindowsOn(plan, "source").isEmpty,
      s"the bounded-census offsets window must stay exempt:\n$plan")
  }

  test("a plain naive per-key window (no aggregate anywhere) is caught") {
    val w = Window.partitionBy($"source").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val plan = raw.withColumn("cum", sum($"tok").over(w))
      .queryExecution.executedPlan.toString
    assert(PlanShape.unboundedWindowsOn(plan, "source").nonEmpty)
  }

  private def AggPresent(plan: String): Boolean =
    Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate").exists(plan.contains)
}
