package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

/** Approximate sketches (HLL++ distinct counts, quantile summaries):
  * not oracle-able across engines (implementation-defined), so the
  * checks pin accuracy bounds against exact computation.
  */
class SketchSpec extends SparkSpec {

  private def events = GraftSession.table(spark, sf0, "events")

  test("approx_count_distinct within 5% of exact") {
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = GraftSession.table(spark, sf0, "lineitem")
    val row = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) <= 2.0, s"approx $approx vs exact $exact")
  }

  test("approx profile matches exact profile within HLL accuracy, no Expand in plan") {
    import spark.implicits._
    val orders = GraftSession.table(spark, sf0, "orders")
    val cols = Seq("o_orderkey", "o_orderstatus")
    val exact = Extended.profile(orders, cols)
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    val approxDf = Extended.profile(orders, cols, approx = true)
    val approx = approxDf
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      // default HLL++ rsd is 5% (one sigma) — allow 2 sigma
      assert(math.abs(a - e) / e.max(1.0) < 0.10, s"$c: approx $a vs exact $e")
    }
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx census must be a plain single-pass agg")
    // the exact path's melt + single-distinct-per-group shape is also
    // Expand-free (a one-pass multi-countDistinct would not be)
    assert(!Extended.profile(orders, cols).queryExecution.executedPlan.toString
      .contains("Expand"), "exact census must avoid the multi-distinct Expand")
  }

  test("profile: native-type min/max; one row per column on empty input") {
    import spark.implicits._
    val orders = GraftSession.table(spark, sf0, "orders")
    val prof = Extended.profile(orders, Seq("o_orderkey")).head()
    // min/max must be numeric extremes, not lexicographic string extremes
    val nat = orders.agg(min($"o_orderkey").cast("string"),
      max($"o_orderkey").cast("string")).head()
    assert(prof.getAs[String]("min_s") == nat.getString(0))
    assert(prof.getAs[String]("max_s") == nat.getString(1))
    assert(prof.getAs[String]("max_s").toLong > prof.getAs[String]("min_s").toLong)
    // empty input: the census still reports every column (n_distinct = 0),
    // not zero rows (the melt side produces no groups — left join + coalesce)
    val empty = Extended.profile(orders.filter(lit(false)),
      Seq("o_orderkey", "o_orderstatus")).collect()
    assert(empty.length == 2, s"expected 2 census rows, got ${empty.length}")
    assert(empty.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_distinct") == 0L))
  }

  test("HLL sketches MERGE: per-group sketches union to the global estimate") {
    // the property that makes sketches work distributed: build one
    // sketch per shard, union the small sketch bytes — never re-scan
    import spark.implicits._
    val perGroup = events
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = perGroup.agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0).toDouble
    val exact = events.agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged sketch estimate $merged vs exact $exact")
  }

  test("freqItems sketch surfaces every true heavy hitter") {
    import spark.implicits._
    // planted skew: 30% of rows carry key 42 over a uniform base
    val base = (1 to 7000).map(i => (i % 997).toLong)
    val skew = Seq.fill(3000)(42L)
    val df = (base ++ skew).toDF("k")
    val frequent = df.stat.freqItems(Array("k"), 0.2)
      .head().getSeq[Long](0)
    assert(frequent.contains(42L),
      s"heavy hitter must be in the sketch result: $frequent")
  }

  test("salted join equals unsalted join for any salt count") {
    val li = GraftSession.table(spark, sf0, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val supp = GraftSession.table(spark, sf0, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val plain = li.join(supp, col("l_suppkey") === col("s_suppkey")).count()
    Seq(1, 4, 16).foreach { s =>
      val salted = SkewJoin.saltedJoin(li, supp, "l_suppkey", "s_suppkey", s).count()
      assert(salted === plain, s"salts=$s")
    }
  }

  test("salted join plan: join key includes the salt column") {
    val li = GraftSession.table(spark, sf0, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val supp = GraftSession.table(spark, sf0, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).hint("shuffle_hash")
    val plan = SkewJoin.saltedJoin(li, supp, "l_suppkey", "s_suppkey", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__lsalt") && plan.contains("__rsalt"),
      "salt must be part of the join key")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"salted demo must not broadcast")
  }
}
