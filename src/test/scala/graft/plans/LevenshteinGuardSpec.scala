package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LevenshteinGuardSpec extends SparkSpec {
  import spark.implicits._

  test("rule injects a length guard before bounded levenshtein, results unchanged") {
    // through parquet so ConvertToLocalRelation can't constant-fold the
    // filter away before the rule's effect is observable
    val dir = tmpDir("levguard")
    Seq(
      ("ab", "abc"), // diff 1, lev 1 -> kept
      ("abcdef", "abcxef"), // same length, lev 1 -> kept
      ("a", "abcdefgh"), // diff 7 > 2 -> guard rejects, lev would too
      ("abcd", "wxyz") // diff 0, lev 4 > 2 -> only lev rejects
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = df.filter(levenshtein($"a", $"b") <= 2)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("abs(") && plan.contains("length("),
      s"guard missing from optimized plan:\n$plan")
    // guard precedes the levenshtein in the conjunction (short-circuit order)
    assert(plan.indexOf("abs(") < plan.indexOf("levenshtein"),
      "length guard must be the FIRST conjunct")
    assert(out.as[(String, String)].collect().toSet ==
      Set(("ab", "abc"), ("abcdef", "abcxef")))
    // null semantics unchanged: null input stays filtered out (null, not false-positive)
    val nullDir = tmpDir("levguard_null")
    Seq((null.asInstanceOf[String], "x"), ("x", "x"))
      .toDF("a", "b").write.mode("overwrite").parquet(nullDir)
    val withNull = spark.read.parquet(nullDir)
      .filter(levenshtein($"a", $"b") <= 2)
    assert(withNull.count() == 1)
  }

  test("thresholded levenshtein(a, b, t) is NOT guarded (it returns -1 past t)") {
    val dir = tmpDir("levguard_t")
    Seq(
      ("ab", "abc"), // lev 1 <= t -> returns 1, kept by <= 2
      ("a", "abcdefgh") // lev 7 > t=2 -> returns -1, ALSO kept by <= 2
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .filter(levenshtein($"a", $"b", 2) <= 2)
    // a length guard here would drop the -1 row: |1-8| = 7 > 2
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("abs("),
      s"rule must not fire on the 3-arg thresholded form:\n$plan")
    assert(out.count() == 2,
      "distance-exceeded (-1) rows satisfy <= k and must survive")
  }

  test("non-deterministic bound is NOT guarded (k would be evaluated twice)") {
    val dir = tmpDir("levguard_nd")
    Seq(("ab", "abc")).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter(levenshtein($"a", $"b") <= (rand() * 10).cast("int"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("abs("),
      s"rule must not duplicate a non-deterministic bound:\n$plan")
  }

  test("d7's join residual gets the guard (the rule reaches join conditions)") {
    val plan = graft.operators.Extended.d7EditDist(spark, sf0)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("abs(") && plan.contains("levenshtein"),
      "edit-distance join must carry the injected length guard")
  }
}
