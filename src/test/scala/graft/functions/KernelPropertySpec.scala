package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based hardening for the two round-11 kernels: the
  * explode/partial-agg pHash must match the expression-fold simhash
  * on ARBITRARY strings (the corpus-wide bit-identity spec can only
  * cover text the corpus contains — unicode, repeats, and
  * whitespace-pathological inputs live here), and DecimalMath's
  * remainder-repaired floor division must equal BigInt floor
  * division across random wide operands.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  test("phashChar ≡ simhashHex fold on arbitrary strings (one batched compare)") {
    import graft.functions.HashFunctions.simhashHex
    import graft.functions.TextFunctions.charShingleSeq
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("wort", "léo", "去了", " ", "\t", "ab"))
        .map(_.mkString(" ")),
      Gen.stringOf(Gen.oneOf('a', 'b', ' ', '\n')))
    // collect one sample batch, then ONE Spark job for all rows —
    // per-sample jobs would make the property test minutes-slow
    val samples = Gen.listOfN(200, gen).sample.get.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = samples.toDF("doc_id", "text")
    val fold = df.select(col("doc_id"),
      simhashHex(charShingleSeq(col("text"), 4)).as("expect"))
    val agg = Dedup.phashChar(df, "doc_id", "text", 4)
    val joined = fold.join(agg, "doc_id")
    assert(joined.count() === samples.length.toLong)
    val mismatch = joined.filter(col("expect") =!= col("phash"))
      .collect()
    assert(mismatch.isEmpty,
      s"kernel diverged on: ${mismatch.take(3).mkString(", ")}")
  }

  test("floorDivExact ≡ BigInt floor division on random wide operands") {
    val genA = Gen.chooseNum(0L, Long.MaxValue)
      .flatMap(hi => Gen.chooseNum(0L, 999999999L).map(lo =>
        BigInt(hi) * 1000000000L + lo)) // up to ~9.2e27, past int64
    val genB = Gen.chooseNum(1L, Long.MaxValue).map(BigInt(_))
    val cases = Gen.listOfN(120, Gen.zip(genA, genB)).sample.get
      // include the adversarial boundary: a = q·b − 1 and a = q·b
      .++(Seq((BigInt("77777777777777777777") * 12345 - 1, BigInt("77777777777777777777")),
        (BigInt("77777777777777777777") * 12345, BigInt("77777777777777777777"))))
    val df = cases.map { case (a, b) => (a.toString, b.toString) }
      .toDF("a", "b")
      .select(DecimalMath.floorDivExact(
        DecimalMath.dec(col("a")), DecimalMath.dec(col("b"))).cast("string"))
    val got = df.as[String].collect().toSeq.map(BigDecimal(_).toBigInt)
    val expect = cases.map { case (a, b) => a / b }
    assert(got === expect)
  }
}
