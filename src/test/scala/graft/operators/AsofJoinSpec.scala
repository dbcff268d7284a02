package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks latest prior right row per key; inclusive at equal ts; inner-drops unmatched") {
    val left = Seq(
      (1L, 10L, "L10"), (1L, 20L, "L20"), (1L, 5L, "Learly"),
      (2L, 50L, "Lother")).toDF("k", "ts", "lname")
    val right = Seq(
      (1L, 8L, "R8"), (1L, 10L, "R10"), (1L, 15L, "R15"),
      (3L, 1L, "Rnokey")).toDF("k", "ts", "rname")
    val got = AsofJoin.asof(left, right, "k", "ts", Seq("ts", "rname"))
      .select($"lname", $"asof_rname").as[(String, String)].collect().toMap
    assert(got("L10") === "R10", "equal ts matches (inclusive >=)")
    assert(got("L20") === "R15", "latest prior wins")
    assert(!got.contains("Learly"), "no prior right row → dropped (inner)")
    assert(!got.contains("Lother"), "no right rows for key → dropped")
  }

  test("forward direction: earliest at-or-after right row; inclusive; inner-drops") {
    val left = Seq(
      (1L, 10L, "L10"), (1L, 20L, "L20"), (1L, 16L, "L16"),
      (2L, 50L, "Lother")).toDF("k", "ts", "lname")
    val right = Seq(
      (1L, 10L, "R10"), (1L, 15L, "R15"), (1L, 18L, "R18"),
      (3L, 99L, "Rnokey")).toDF("k", "ts", "rname")
    val got = AsofJoin.asofForward(left, right, "k", "ts", Seq("ts", "rname"))
      .select($"lname", $"asof_rname").as[(String, String)].collect().toMap
    assert(got("L10") === "R10", "equal ts matches (inclusive <=)")
    assert(got("L16") === "R18", "earliest following wins")
    assert(!got.contains("L20"), "no following right row → dropped (inner)")
    assert(!got.contains("Lother"), "no right rows for key → dropped")
    // tolerance: a match farther than tol seconds ahead is discarded
    val lt = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "a"))
      .toDF("k", "ts", "v")
    val rt = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 02:00:00"), 1.0))
      .toDF("k", "ts", "p")
    assert(AsofJoin.asofForward(lt, rt, "k", "ts", Seq("p"),
      toleranceSec = Some(3600L)).count() === 0)
    assert(AsofJoin.asofForward(lt, rt, "k", "ts", Seq("p"),
      toleranceSec = Some(7300L)).count() === 1)
  }

  test("property: random data matches an in-memory reference, both directions") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      // right timestamps UNIQUE per key (the operator's documented
      // contract: equal right ts within a key is caller-resolved);
      // left ts freely collide with rights (inclusive match exercised)
      val right = (0L until 5L).flatMap { k =>
        rnd.shuffle((0L until 60L).toList).take(12).map(ts => (k, ts, s"r${k}_$ts"))
      }
      val left = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextInt(70).toLong))
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "ts", "rname")
      val rByKey = right.groupBy(_._1)
      def refBack(k: Long, ts: Long) = rByKey.get(k)
        .flatMap(rs => rs.filter(_._2 <= ts).sortBy(_._2).lastOption).map(_._3)
      def refFwd(k: Long, ts: Long) = rByKey.get(k)
        .flatMap(rs => rs.filter(_._2 >= ts).sortBy(_._2).headOption).map(_._3)
      val gotBack = AsofJoin.asof(lDf, rDf, "k", "ts", Seq("rname"))
        .select($"lid", $"asof_rname").as[(Long, String)].collect().toMap
      val gotFwd = AsofJoin.asofForward(lDf, rDf, "k", "ts", Seq("rname"))
        .select($"lid", $"asof_rname").as[(Long, String)].collect().toMap
      left.foreach { case (k, ts, lid) =>
        assert(gotBack.get(lid) === refBack(k, ts), s"trial $trial backward ($k,$ts)")
        assert(gotFwd.get(lid) === refFwd(k, ts), s"trial $trial forward ($k,$ts)")
      }
    }
  }

  test("single shuffle plan: no range explosion") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "p")
    val plan = AsofJoin.asof(left, right, "k", "ts", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"window-based, not a join: no O(|L|x|R|) risk")
    assert(plan.contains("Window"))
  }
}
