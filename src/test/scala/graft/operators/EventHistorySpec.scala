package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_streaks (gaps-and-islands), q_scd2 (SCD Type-2 build), q_paths
  * (sequential trigram mining) — planted fixtures with hand-computed
  * answers plus plan-shape and corpus invariants.
  */
class EventHistorySpec extends SparkSpec {
  import spark.implicits._

  // nanos-long ts, the driver's events physical form (EwmaSpec recipe);
  // offsets in hours from 2024-01-01 00:00:00 UTC
  private val Base = 1704067200L * 1000000000L
  private val H = 3600L * 1000000000L

  private def eventsOf(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (eid, hours, uid, typ) =>
      (eid, Base + hours * H, uid, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def writeEvents(name: String, rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = tmpDir(name)
    eventsOf(rows).write.mode("overwrite").parquet(dir + "/events.parquet")
    dir
  }

  // -------------------------------------------------------------- streaks

  test("streaks: planted runs — lengths, census, earliest-start tie-break") {
    // user 1 active on days 0,1,2, 4,5  -> best streak 3 starting day 0
    // user 2 active on days 0,1, 4,5    -> two len-2 streaks, tie ->
    //                                      EARLIEST start (day 0)
    val dir = writeEvents("streaks_fixture", Seq(
      (1L, 0L, 1L, "view"), (2L, 24L, 1L, "view"), (3L, 49L, 1L, "view"),
      (4L, 96L, 1L, "view"), (5L, 121L, 1L, "view"),
      // duplicate events on one day must not inflate the day count
      (6L, 2L, 1L, "buy"),
      (7L, 0L, 2L, "view"), (8L, 25L, 2L, "view"),
      (9L, 96L, 2L, "view"), (10L, 120L, 2L, "view")))
    val out = Extended.qStreaks(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 2L, 3L, "2024-01-01"),
      (2L, 4L, 2L, 2L, "2024-01-01")))
  }

  test("streaks: corpus invariants — days conserved, best bounded by total") {
    val out = Extended.qStreaks(spark, sf0)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (u, days, streaks, best, _) =>
      assert(streaks >= 1 && best >= 1, s"user $u")
      assert(best <= days && streaks <= days, s"user $u")
    }
    // conservation: Σ n_active_days = |distinct (user, day)|
    val distinctDays = graft.GraftSession.table(spark, sf0, "events")
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(out.map(_._2).sum === distinctDays)
  }

  // -------------------------------------------------------------- scd2

  test("scd2: repeats collapse, intervals chain, one current row per user") {
    // user 1: view@0, view@1 (collapses), buy@2, view@3
    val dir = writeEvents("scd2_fixture", Seq(
      (1L, 0L, 1L, "view"), (2L, 1L, 1L, "view"),
      (3L, 2L, 1L, "buy"), (4L, 3L, 1L, "view"),
      (5L, 5L, 2L, "buy")))
    val out = Extended.qScd2(spark, dir)
      .as[(Long, Long, String, String, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00", "2024-01-01 02:00:00", 0L),
      (1L, 2L, "buy", "2024-01-01 02:00:00", "2024-01-01 03:00:00", 0L),
      (1L, 3L, "view", "2024-01-01 03:00:00", "9999-12-31 00:00:00", 1L),
      (2L, 1L, "buy", "2024-01-01 05:00:00", "9999-12-31 00:00:00", 1L)))
  }

  test("scd2: corpus invariants — versions contiguous, exactly one open row") {
    val out = Extended.qScd2(spark, sf0)
      .as[(Long, Long, String, String, String, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      assert(sorted.map(_._2) === (1L to rows.length).toSeq, s"user $u")
      assert(rows.count(_._6 == 1L) === 1, s"user $u must have one open row")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // interval chaining: each valid_to equals the next valid_from
          assert(a._5 === b._4, s"user $u chain break")
          // no consecutive repeated state survives the collapse
          assert(a._3 !== b._3, s"user $u repeat survived")
        case _ =>
      }
    }
  }

  test("streaks plan: day dedup, window, and both rollups share ONE user exchange") {
    // the collect_set dedup keys on user_id alone, so the window sort
    // and the (user_id, grp) / user_id rollups all reuse its exchange
    // — a (user_id, d) distinct would force two more
    val plan = Extended.qStreaks(spark, sf0).queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("scd2 plan: change filter and versioning share ONE user exchange") {
    val plan = Extended.qScd2(spark, sf0).queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  // -------------------------------------------------------------- paths

  test("paths: planted journeys — counts and deterministic top-k order") {
    // two users walk a>b>c>d, one walks a>b>x: trigram a>b>c appears
    // twice, b>c>d twice, a>b>x once
    val dir = writeEvents("paths_fixture", Seq(
      (1L, 0L, 1L, "a"), (2L, 1L, 1L, "b"), (3L, 2L, 1L, "c"), (4L, 3L, 1L, "d"),
      (5L, 0L, 2L, "a"), (6L, 1L, 2L, "b"), (7L, 2L, 2L, "c"), (8L, 3L, 2L, "d"),
      (9L, 0L, 3L, "a"), (10L, 1L, 3L, "b"), (11L, 2L, 3L, "x")))
    val out = Extended.qPaths(spark, dir).as[(String, Long)].collect().toSeq
    assert(out === Seq(("a>b>c", 2L), ("b>c>d", 2L), ("a>b>x", 1L)))
  }

  test("paths: trigrams never cross user boundaries") {
    // users 1 and 2 each have only 2 events — no trigram at all
    val dir = writeEvents("paths_boundary", Seq(
      (1L, 0L, 1L, "a"), (2L, 1L, 1L, "b"),
      (3L, 2L, 2L, "c"), (4L, 3L, 2L, "d")))
    assert(Extended.qPaths(spark, dir).count() === 0)
  }

  test("paths: corpus — ≤20 rows, counts conserve total trigram mass") {
    val out = Extended.qPaths(spark, sf0).as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    // with ≤ |types|³ distinct paths the top-20 may be everything;
    // every count ≥ 1 and ordering is (n desc, path asc)
    val resorted = out.sortBy { case (p, n) => (-n, p) }.toSeq
    assert(out.toSeq === resorted)
  }
}
