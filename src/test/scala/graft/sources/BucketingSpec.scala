package graft.sources

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed join runs with zero exchanges and matches plain join") {
    val li = GraftSession.table(spark, sf0, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = GraftSession.table(spark, sf0, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "k", 8)
    Bucketing.writeBucketed(ord, "ord_b", "k", 8)

    // force the non-broadcast path — the point is that the SMJ needs
    // no shuffle exchange because bucket layout already co-locates keys
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), "scan must use bucket layout")
      assert(joined.count() === li.join(ord, "k").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
