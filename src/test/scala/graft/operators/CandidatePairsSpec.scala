package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CandidatePairsSpec extends SparkSpec {
  import spark.implicits._

  // ids deliberately include negatives, block-boundary values
  // (multiples of the gap), and duplicates-per-key density
  private lazy val rows: Seq[(Long, String)] = {
    val ids = Seq(-130L, -120L, -61L, -60L, -59L, -1L, 0L, 1L, 59L, 60L,
      61L, 119L, 120L, 121L, 180L, 240L, 300L) ++ (500L to 560L by 7)
    for (id <- ids; k <- Seq("a", "b")) yield (id * (if (k == "a") 1 else 3), k)
  }

  test("property: random full-range ids equal the naive join across gaps") {
    val rnd = new scala.util.Random(7)
    for (gap <- Seq(7L, 60L, 1000L)) {
      // mixed magnitudes: small clustered ids (true pairs) + huge ids in
      // ±2^61 (block math past 2^53, where double division would break).
      // Ids are bounded so the NAIVE reference's `id_b - id_a` cannot
      // overflow under ANSI — the bucketed join itself never can: ids
      // sharing a (key, block) are within one gap of each other
      val ids = (Seq.fill(60)(rnd.nextInt(2000).toLong) ++
        Seq.fill(20)(rnd.nextLong() >> 2) ++
        Seq(Long.MaxValue >> 2, (Long.MaxValue >> 2) - gap,
          (Long.MinValue >> 2) + gap)).distinct
      val df = ids.zipWithIndex.map { case (id, i) => (id, s"k${i % 3}") }
        .toDF("id", "k")
      val bucketed = CandidatePairs.idGapJoin(df, "id", "k", gap)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
      val naive = df.select($"k".as("ka"), $"id".as("id_a"))
        .join(df.select($"k".as("kb"), $"id".as("id_b")),
          $"ka" === $"kb" && $"id_a" < $"id_b" && $"id_b" - $"id_a" <= gap)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
      assert(bucketed.sorted === naive.sorted, s"gap=$gap")
      assert(bucketed.size === bucketed.distinct.size, s"gap=$gap: duplicate pairs")
      assert(naive.nonEmpty, s"gap=$gap: harness generated no true pairs")
    }
  }

  test("ids at the extreme ends of the long range do not overflow block math") {
    // within one gap of Long.MinValue the old (id − pmod) form threw
    // ANSI ARITHMETIC_OVERFLOW; same-key ids here are close, so the
    // naive reference's subtraction is safe to compare against
    val ids = Seq(Long.MinValue, Long.MinValue + 30, Long.MinValue + 61,
      Long.MaxValue - 61, Long.MaxValue - 30, Long.MaxValue)
    val df = ids.map((_, "k")).toDF("id", "k")
    val got = CandidatePairs.idGapJoin(df, "id", "k", 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // guard b - a >= 0: scala's subtraction wraps for cross-end pairs
    val expected = (for {
      a <- ids; b <- ids if a < b && b - a >= 0 && b - a <= 60
    } yield (a, b)).toSet
    assert(got === expected)
    assert(expected.size === 4)
  }

  test("idGapJoin equals the naive quadratic join (incl. negative and boundary ids)") {
    val df = rows.toDF("id", "k")
    val bucketed = CandidatePairs.idGapJoin(df, "id", "k", 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val a = df.select($"k".as("ka"), $"id".as("id_a"))
    val b = df.select($"k".as("kb"), $"id".as("id_b"))
    val naive = a.join(b, $"ka" === $"kb" && $"id_a" < $"id_b" &&
        $"id_b" - $"id_a" <= 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty, "harness must generate true pairs")
    // no duplicates: every pair arises exactly once
    val list = CandidatePairs.idGapJoin(df, "id", "k", 60)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(list.length === list.toSet.size)
  }

  test("payload columns ride along with _a/_b suffixes; lastConjunct filters") {
    val df = rows.toDF("id", "k").withColumn("t", concat(lit("v"), $"id"))
    val out = CandidatePairs.idGapJoin(df, "id", "k", 60, Seq("t"),
      lastConjunct = $"id_b" - $"id_a" =!= 60)
    assert(out.columns.sorted.toSeq === Seq("id_a", "id_b", "t_a", "t_b"))
    assert(out.filter($"id_b" - $"id_a" === 60).count() === 0)
    assert(out.filter($"t_a" =!= concat(lit("v"), $"id_a")).count() === 0)
  }
}
