package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {

  test("latest-wins merge: update wins, delete removes, insert appears, rest untouched") {
    import spark.implicits._
    val snap = Seq((1L, "a", 0, false), (2L, "b", 0, false), (3L, "c", 0, false))
      .toDF("k", "v", "version", "is_delete")
    val chg = Seq((2L, "b2", 1, false), (3L, "c", 1, true), (4L, "d", 1, false))
      .toDF("k", "v", "version", "is_delete")
    val out = Upsert.applyChangeset(snap, chg, "k", "version", "is_delete")
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 4L -> "d"))
  }

  test("re-applying the same changeset is idempotent") {
    import spark.implicits._
    val snap = Seq((1L, "a", 0, false), (2L, "b", 0, false))
      .toDF("k", "v", "version", "is_delete")
    val chg = Seq((2L, "b2", 1, false), (5L, "e", 1, true))
      .toDF("k", "v", "version", "is_delete")
    val once = Upsert.applyChangeset(snap, chg, "k", "version", "is_delete")
    val twice = Upsert.applyChangeset(once, chg, "k", "version", "is_delete")
    assert(twice.orderBy($"k").collect().toSeq ==
      once.orderBy($"k").collect().toSeq)
  }
}
