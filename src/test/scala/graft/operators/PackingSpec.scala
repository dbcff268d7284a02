package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // One group, budget 100: docs of 60, 60, 90, 100, 5 tokens.
  // Offsets: 0, 60, 120, 210, 310 → packs 0, 0, 1, 2, 3.
  private val docs = Seq(
    ("g", 1L, 60L), ("g", 2L, 60L), ("g", 3L, 90L), ("g", 4L, 100L), ("g", 5L, 5L),
    ("h", 1L, 250L), ("h", 2L, 10L)) // h: offsets 0, 250 → packs 0, 2
    .toDF("src", "id", "tok")

  test("pack id = budget block of the doc's first token, per group") {
    val out = Packing.assignPacks(docs, "src", "id", col("tok"), budget = 100L)
      .select("src", "id", "pack_id").as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L), ("g", 4L, 2L), ("g", 5L, 3L),
      ("h", 1L, 0L), ("h", 2L, 2L)))
  }

  test("pack ids are dense-monotone in order and groups pack independently") {
    val out = Packing.assignPacks(docs, "src", "id", col("tok"), budget = 100L)
    val byGroup = out.select("src", "id", "pack_id").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    byGroup.values.foreach { rows =>
      val packs = rows.sortBy(_._2).map(_._3)
      assert(packs.zip(packs.drop(1)).forall { case (a, b) => a <= b })
    }
  }
}
