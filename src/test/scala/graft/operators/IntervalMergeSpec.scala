package graft.operators

import graft.SparkSpec

/** IntervalMerge.islands: hand-computed islands (overlap, touch,
  * point-interval, disjoint, cross-key isolation), order determinism
  * under adversarial input partitioning, and the one-exchange plan
  * claim from the Scaladoc.
  */
class IntervalMergeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Long)]) =
    IntervalMerge.islands(rows.toDF("k", "id", "s", "e"), "k", "id", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("islands: overlap and touch merge, gaps split, points count") {
    val out = run(Seq(
      // key a: [1,5] [3,8] overlap, [8,10] touches -> one island [1,10]
      ("a", 1L, 1L, 5L), ("a", 2L, 3L, 8L), ("a", 3L, 8L, 10L),
      // then a gap, then a point interval [12,12]
      ("a", 4L, 12L, 12L),
      // key b: same coordinates must not merge across keys
      ("b", 5L, 9L, 11L)))
    assert(out === Set(
      ("a", 1L, 10L, 3L), ("a", 12L, 12L, 1L), ("b", 9L, 11L, 1L)))
  }

  test("islands: an interval swallowed by a long predecessor cannot reopen") {
    // [1,100] then [2,3] and [50,60] inside it, then [90,110] extending:
    // the running-max construction (not adjacent-row comparison) keeps
    // them one island
    val out = run(Seq(
      ("k", 1L, 1L, 100L), ("k", 2L, 2L, 3L),
      ("k", 3L, 50L, 60L), ("k", 4L, 90L, 110L)))
    assert(out === Set(("k", 1L, 110L, 4L)))
  }

  test("islands: result is invariant under input partitioning and tie order") {
    val rows = Seq(
      ("k", 1L, 5L, 9L), ("k", 2L, 5L, 6L), // tied starts merge either way
      ("k", 3L, 10L, 12L), ("k", 4L, 1L, 2L))
    val base = run(rows)
    val shuffled = IntervalMerge.islands(
      rows.reverse.toDF("k", "id", "s", "e").repartition(7), "k", "id", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(base === shuffled)
    // [1,2] alone; [5,9]+[5,6] merge; 10 > running max 9 opens a new island
    assert(base === Set(
      ("k", 1L, 2L, 1L), ("k", 5L, 9L, 2L), ("k", 10L, 12L, 1L)))
  }

  test("islands plan: ONE hash exchange — windows and final agg share the key partitioning") {
    val df = Seq(("k", 1L, 1L, 5L), ("k", 2L, 3L, 8L))
      .toDF("k", "id", "s", "e")
    val plan = IntervalMerge.islands(df, "k", "id", "s", "e")
      .queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1,
      s"expected exactly one hash exchange (the key shuffle), got $hashEx:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort in the merge itself:\n$plan")
  }
}
