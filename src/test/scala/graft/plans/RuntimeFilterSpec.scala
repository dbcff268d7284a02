package graft.plans

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter reaches the fact-side scan and never changes results") {
    val li = GraftSession.table(spark, sf0, "lineitem")
    val p = GraftSession.table(spark, sf0, "part").filter(col("p_size") === 1)
    def q() = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a shuffle join (broadcast already prunes build-side misses)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = q().collect()
      RuntimeFilters.enable(spark)
      try {
        val filtered = q()
        val plan = filtered.queryExecution.executedPlan.toString
        assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
          s"bloom runtime filter missing from plan:\n${plan.take(2000)}")
        // the might_contain probe must sit on the FACT side's key
        assert(plan.contains("might_contain") && plan.contains("l_partkey"),
          "runtime filter must probe the application (fact) side")
        assert(filtered.collect().toSeq == plain.toSeq,
          "a bloom prefilter may drop only rows that cannot join")
      } finally RuntimeFilters.restore(spark)
      // defaults back: same query plans WITHOUT the filter at this scale
      val defaultPlan = q().queryExecution.executedPlan.toString
      assert(!defaultPlan.contains("might_contain"),
        "default 10GB application floor must suppress injection locally")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
  }
}
