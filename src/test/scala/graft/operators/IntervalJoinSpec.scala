package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String, Long, Long)]): Set[(Long, Long)] =
    (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, b._1)).toSet

  test("bucketed overlap pairs equal the brute-force set, each pair exactly once") {
    // spans larger than the bucket width, nested, adjacent, disjoint
    val rows = Seq[(Long, String, Long, Long)](
      (1L, "k1", 0L, 10L), (2L, "k1", 5L, 40L), // overlap across buckets
      (3L, "k1", 38L, 39L), // nested inside 2's tail
      (4L, "k1", 41L, 50L), // adjacent to 2 (no overlap: 41 > 40)
      (5L, "k2", 0L, 100L), (6L, "k2", 99L, 99L), // long span, point at end
      (7L, "k2", 101L, 110L), // disjoint
      (8L, "k3", 7L, 7L), (9L, "k3", 7L, 7L)) // identical points
    val df = rows.toDF("id", "key", "s", "e")
    for (width <- Seq(1L, 7L, 13L, 1000L)) {
      val got = IntervalJoin.overlapPairs(df, "id", "key", "s", "e", width)
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length,
        s"width=$width emitted a pair more than once")
      assert(got.toSet == brute(rows), s"width=$width mismatch")
    }
    // overlap_len is the inclusive intersection size
    val lens = IntervalJoin.overlapPairs(df, "id", "key", "s", "e", 7L)
      .select($"id_a", $"id_b", $"overlap_len").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(lens((1L, 2L)) == 6L) // [5,10]
    assert(lens((8L, 9L)) == 1L) // point overlap
  }

  test("property: random intervals agree with brute force across widths") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 5) {
      val n = 40 + rnd.nextInt(60)
      val rows = (1L to n).map { id =>
        val s = rnd.nextInt(200).toLong
        // mix of points, short spans, and spans far beyond any width
        val span = rnd.nextInt(3) match {
          case 0 => 0L
          case 1 => rnd.nextInt(10).toLong
          case _ => 30L + rnd.nextInt(120)
        }
        (id, s"k${rnd.nextInt(4)}", s, s + span)
      }
      val df = rows.toDF("id", "key", "s", "e")
      val expected = brute(rows)
      val width = 1L + rnd.nextInt(50)
      val got = IntervalJoin.overlapPairs(df, "id", "key", "s", "e", width)
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length,
        s"round $round width=$width: duplicate pairs")
      assert(got.toSet == expected, s"round $round width=$width mismatch")
    }
  }

  test("join runs on (key, bucket) — never the key alone") {
    val dir = tmpDir("interval_plan")
    (1L to 100L).map(i => (i, s"k${i % 3}", i * 3, i * 3 + 10))
      .toDF("id", "key", "s", "e").write.mode("overwrite").parquet(dir)
    val plan = IntervalJoin.overlapPairs(spark.read.parquet(dir),
      "id", "key", "s", "e", 16L).queryExecution.executedPlan.toString
    assert(plan.contains("bkt_a"), "bucket column must be part of the join")
    // the equi-key list of the join must mention the bucket columns
    val joinLine = plan.linesIterator.find(l =>
      l.contains("Join") && l.contains("key_a")).getOrElse("")
    assert(joinLine.contains("bkt_a") || plan.contains("hashpartitioning(key_a"),
      s"join must hash on (key, bucket):\n$joinLine")
  }
}
