package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DecimalMath: exact wide-integer micro-unit arithmetic — the
  * engine-parity fix for int64 wraparound in p12_gini / t25 (Spark
  * wraps silently with ANSI off; DuckDB promotes to HUGEINT).
  */
class DecimalMathSpec extends SparkSpec {
  import spark.implicits._
  import DecimalMath._

  test("floorDivExact repairs the decimal-divide rounding at exact-integer boundaries") {
    // a = q·b − 1: the scale-6 rounded quotient lands ON q (1/b is far
    // below the rounding step), so a bare floor(a/b) answers q — one
    // too high. The remainder correction must bring it back to q−1.
    val q = BigDecimal("123456789012345678901")   // ≫ 2⁶³
    val b = BigDecimal("300000007")
    val a = q * b - 1
    val out = Seq((a.toString, b.toString)).toDF("a", "b")
      .select(floorDivExact(dec(col("a")), dec(col("b"))).cast("string"))
      .as[String].head()
    assert(BigDecimal(out) === q - 1)
    // and the in-range case stays plain: a = q·b + r, 0 < r < b
    val out2 = Seq((1)).toDF("x")
      .select(floorDivExact(dec(lit("12345678901234567890123")),
        dec(lit("1000000000000"))).cast("string")).as[String].head()
    assert(out2 === "12345678901")
  }

  test("microRatio matches BigInt reference beyond the int64 wrap point") {
    // x·10⁶ overflows long for every x here; long math would wrap,
    // decimal must agree with exact BigInt floor division.
    val cases = Seq(
      (BigInt("92233720368547758080"), BigInt("7000000007")),  // 10·2⁶³ numerator
      (BigInt("31415926535897932384626433"), BigInt("27182818284590452")),
      (BigInt("9223372036854775807"), BigInt("3000000001")))   // Long.MaxValue
    val df = cases.map { case (x, y) => (x.toString, y.toString) }
      .toDF("x", "y")
      .select(microRatio(dec(col("x")), dec(col("y"))).as("r"))
    val got = df.as[Long].collect().toSeq
    val expect = cases.map { case (x, y) => ((x * 1000000) / y).toLong }
    assert(got === expect)
  }

  test("p12 gini stays exact where the old int64 path wrapped (uniform source ⇒ 0)") {
    // 65,536 uniform docs of 10,000 chars: 2·iwx·10⁶ ≈ 4.3×10¹⁹ > 2⁶³
    // — the pre-fix long arithmetic wraps negative here. The exact
    // value is computable in closed form (both floor terms coincide
    // for a uniform source), so the assert pins true-zero inequality.
    val n = 65536L
    val dir = tmpDir("gini_overflow")
    spark.range(1, n + 1)
      .select(col("id").as("doc_id"), lit("x").as("text"), lit("en").as("lang"),
        lit("U").as("source"), lit(10000L).as("n_chars"))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val row = graft.operators.PipelineQueries.p12Gini(spark, dir)
      .as[(String, Long, Long, Long)].head()
    val (_, nDocs, total, gini) = row
    assert(nDocs === n && total === n * 10000L)
    val iwx = BigInt(10000) * (BigInt(n) * (n + 1) / 2)
    val expect = (iwx * 2000000 / (BigInt(n) * total)) -
      (BigInt(n + 1) * 1000000 / BigInt(n))
    assert(gini === expect.toLong)
    assert(gini === 0L, "uniform source must profile as perfectly equal")
  }
}
