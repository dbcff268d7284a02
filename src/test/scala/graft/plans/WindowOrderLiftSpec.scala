package graft.plans

import graft.SparkSpec

/** WindowOrderLift: the decorrelated-LATERAL rewrite must change the
  * plan, never the answers.
  */
class WindowOrderLiftSpec extends SparkSpec {
  import spark.implicits._

  private def groups = Seq(
    ("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
    ("b", 5L, 5L), ("b", 6L, 50L),
    ("c", 7L, 7L)
  ).toDF("g", "id", "v")

  test("lateral top-k answers equal the hand-computed per-group top-k") {
    groups.createOrReplaceTempView("wol_t")
    val out = spark.sql(
      """SELECT o.g, i.id, i.v
        |FROM (SELECT DISTINCT g FROM wol_t) o,
        |  LATERAL (SELECT id, v FROM wol_t WHERE g = o.g
        |           ORDER BY v DESC, id LIMIT 2) i
        |ORDER BY o.g, i.v DESC, i.id""".stripMargin)
    // ties on v=30 break by id: (1) before (3); group c is singleton
    assert(out.as[(String, Long, Long)].collect().toSeq === Seq(
      ("a", 1L, 30L), ("a", 3L, 30L),
      ("b", 6L, 50L), ("b", 5L, 5L),
      ("c", 7L, 7L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "rewrite must enable the group limit")
    // the only global sort is the final presentation ORDER BY over g
    val globalSorts = plan.linesIterator
      .filter(l => l.contains("Sort [") && l.contains("], true")).toSeq
    assert(globalSorts.forall(_.contains("g#")),
      s"inner table must not be globally sorted, got: $globalSorts")
  }

  test("explicit window with its own ORDER BY is left untouched") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val df = groups.withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
    assert(df.select($"g", $"id").as[(String, Long)].collect().toSet ===
      Set(("a", 1L), ("b", 6L), ("c", 7L)))
  }

  test("widened Project: rewrite restores the Window subtree's exact output schema") {
    // the risk case: the pruning Project between Window and Sort does
    // NOT carry the sort key, so the rewrite must widen it — and the
    // rule runs session-wide after column pruning, where an
    // arity/position-sensitive parent (Union) or a missing pruning
    // Project above would observe the extra column. The rewritten
    // subtree's output must be attribute-for-attribute the original.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    val analyzed = groups.queryExecution.analyzed
    val Seq(g, id, v) = analyzed.output
    val sorted = Sort(Seq(SortOrder(v, Descending)), global = true, analyzed)
    val pruned = Project(Seq(g, id), sorted) // v dropped above the Sort
    val rn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(g), Nil,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), "rn")()
    val win = Window(Seq(rn), Seq(g), Nil, pruned, None)
    val rewritten = WindowOrderLift(win)
    assert(rewritten !== win, "rule must fire on the order-less row_number form")
    assert(rewritten.output === win.output,
      s"widening leaked into the subtree output: ${rewritten.output} vs ${win.output}")
    // and the global Sort is gone from the rewritten subtree
    assert(!rewritten.collect { case s: Sort if s.global => s }.exists(_ => true))
  }

  test("lateral LIMIT without ORDER BY: no sort to lift, rule is a no-op, query still runs") {
    // the analyzer rejects a USER-written row_number() with no ORDER
    // BY — only decorrelation produces the order-less form, and
    // without an inner ORDER BY there is no Sort below it to lift
    groups.createOrReplaceTempView("wol_t")
    val out = spark.sql(
      """SELECT o.g, i.id
        |FROM (SELECT DISTINCT g FROM wol_t) o,
        |  LATERAL (SELECT id FROM wol_t WHERE g = o.g LIMIT 2) i""".stripMargin)
    // which 2 rows of group a arrive is unspecified — counts are not
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
