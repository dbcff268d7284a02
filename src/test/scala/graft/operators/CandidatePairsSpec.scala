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
