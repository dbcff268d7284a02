package graft.operators

import graft.SparkSpec

class SequenceGapsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force oracle: gaps of the sorted distinct key set. */
  private def expected(keys: Seq[Long]): Seq[(Long, Long, Long)] =
    keys.distinct.sorted.sliding(2).collect {
      case Seq(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq

  private def run(keys: Seq[java.lang.Long], p: Int): Seq[(Long, Long, Long)] =
    SequenceGaps.gaps(keys.toDF("k"), "k", p)
      .as[(Long, Long, Long)].collect().toSeq

  test("holes spanning partition boundaries are found exactly once") {
    // dense 1..10000 with a hole that straddles whichever boundary the
    // range partitioner picks, plus small holes inside partitions
    val keys = ((1L to 10000L).filterNot(k => (k >= 4900 && k <= 5100) ||
      k % 997 == 0)).map(Long.box)
    assert(run(keys, 8) === expected(keys.map(Long.unbox)))
  }

  test("hole spanning ENTIRE partitions: sparse keys, most partitions empty") {
    // 3 keys at the bottom, 2 near 10^9: with 8 range partitions the
    // giant hole crosses several empty partitions and must come out
    // as ONE gap row from the summary fix-up
    val keys = Seq(1L, 2L, 3L, 1000000000L, 1000000001L).map(Long.box)
    assert(run(keys, 8) === Seq((4L, 999999999L, 999999996L)))
  }

  test("single-partition input") {
    val keys = Seq(10L, 11L, 15L, 20L).map(Long.box)
    assert(run(keys, 1) === Seq((12L, 14L, 3L), (16L, 19L, 4L)))
  }

  test("duplicate keys collapse; duplicates at partition boundaries don't invent gaps") {
    val base = (1L to 2000L).filterNot(k => k >= 700 && k <= 710)
    val keys = (base ++ base ++ base.map(identity)).map(Long.box) // every key ×3
    assert(run(keys, 16) === expected(base))
  }

  test("null keys are ignored, not NPE'd") {
    val keys: Seq[java.lang.Long] = Seq(1L, 2L, 5L).map(Long.box) ++
      Seq(null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Long])
    assert(run(keys, 4) === Seq((3L, 4L, 2L)))
  }

  test("empty and all-null inputs yield no gaps") {
    assert(run(Seq.empty, 4) === Seq.empty)
    assert(run(Seq(null.asInstanceOf[java.lang.Long]), 4) === Seq.empty)
  }

  test("more partitions than keys") {
    val keys = Seq(5L, 9L).map(Long.box)
    assert(run(keys, 32) === Seq((6L, 8L, 3L)))
  }

  test("contiguous sequence has no gaps") {
    assert(run((1L to 5000L).map(Long.box), 8) === Seq.empty)
  }

  test("building the DataFrame is lazy: no Spark job runs until an action") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val df = SequenceGaps.gaps((1L to 100L).map(Long.box).toDF("k"), "k", 4)
    df.queryExecution.executedPlan // plan-only caller
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "plan construction/inspection must not run jobs")
    assert(df.count() === 0)
  }

  test("property: random key multisets agree with the brute-force oracle at any partition count") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(3000)
      val span = 1 + rnd.nextInt(20000)
      // multiset with duplicates and clustered runs
      val keys = Seq.fill(n)(rnd.nextInt(span).toLong)
        .flatMap(k => Seq.fill(1 + rnd.nextInt(3))(k))
      val p = 1 + rnd.nextInt(16)
      val got = run(keys.map(Long.box), p)
      assert(got === expected(keys),
        s"trial $trial (n=$n span=$span p=$p) diverged from brute force")
    }
  }

  test("reliable-checkpoint mode: same answers, blocks written to the configured dir") {
    val dir = tmpDir("seq_gaps_ckpt")
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val keys = ((1L to 3000L).filterNot(k => k % 500 == 0)).map(Long.box)
      assert(run(keys, 8) === expected(keys.map(Long.unbox)))
      // the connected-components loop exercises eager reliable cuts
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      val cc = DedupClusters.connectedComponents(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      def files(f: java.io.File): Int =
        if (f.isFile) 1
        else Option(f.listFiles()).map(_.map(files).sum).getOrElse(0)
      assert(files(new java.io.File(dir)) > 0,
        "reliable checkpoint must write under the configured directory")
    } finally spark.conf.unset(Checkpoints.DirKey)
  }
}
