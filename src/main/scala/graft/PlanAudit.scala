package graft

/** Dev tool: print condensed physical plans for query entries —
  * `sbt "runMain graft.PlanAudit q_range_join t5_packing"` (all
  * queries when no args). Used for the per-round explain audit
  * (SURVEY.md §6): joins, exchanges, pushed filters, codegen spans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      println(s"=== $name")
      plan.linesIterator
        .filter(l => Seq("Join", "Exchange", "PushedFilters", "Window", "Generate",
          "HashAggregate", "Sort ").exists(l.contains))
        .foreach(l => println("  " + l.trim.take(160)))
    }
    spark.stop()
  }
}
