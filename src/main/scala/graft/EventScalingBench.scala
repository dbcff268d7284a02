package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the events/time family (SURVEY.md §8j
  * — companion to Dedup/Ann/Graph/Bpe/PqScalingBench): sliding-window
  * rollup, as-of join, and sessionization on 1×–16× the sf0.1 events
  * table.
  *
  * Replication that keeps the claim honest: copy c offsets user_id by
  * c·10⁷ (users are disjoint across copies, so per-user windows,
  * as-of matches and sessions are exactly N× the original structure)
  * and keeps timestamps IDENTICAL — the time axis does not stretch,
  * so the sliding-window key space (windows × types) is constant
  * while per-window mass grows N×: the partial-agg shuffle carries N×
  * rows into the same number of groups, the shape a busier (not
  * longer) event stream produces in production.
  */
object EventScalingBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = "/root/repo/target/scratch/eventscale"
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
    val n = base.count() // warms IO/codegen

    def slidingAgg(ev: DataFrame): Long =
      ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)), sum(round(col("value") * 100)))
        .count()

    def asof(ev: DataFrame): Long = {
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      operators.AsofJoin.asof(purchases, clicks, "user_id", "ts",
        Seq("ts", "value")).count()
    }

    def sessions(ev: DataFrame): Long =
      streaming.EventStreams.sessionize(ev).count()

    val results = Seq(1, 4, 16).map { copies =>
      val path = s"$scratch/events_$copies"
      (0 until copies).map(c => base
          .withColumn("user_id", col("user_id") + lit(c.toLong * 10000000L))
          .withColumn("event_id", col("event_id") + lit(c.toLong * 1000000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(path)
      val ev = spark.read.parquet(path)

      def time(f: => Long): (Double, Long) = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val out = f
          ((System.nanoTime() - t0) / 1e9, out)
        }
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }
      val (swS, nSw) = time(slidingAgg(ev))
      val (asS, nAs) = time(asof(ev))
      val (seS, nSe) = time(sessions(ev))
      println(f"[eventscale] copies=$copies%2d rows=${n * copies}%9d " +
        f"sliding=$swS%6.2fs($nSw) asof=$asS%6.2fs($nAs) sessions=$seS%6.2fs($nSe)")
      (copies, n * copies, swS, nSw, asS, nAs, seS, nSe)
    }
    println("[eventscale] copies | rows | sliding s | windows | asof s | matches | sessions s | sessions")
    results.foreach { case (c, r, sw, nw, as, na, se, ns) =>
      println(f"[eventscale] $c%6d | $r%9d | $sw%9.2f | $nw%7d | $as%6.2f | $na%8d | $se%10.2f | $ns%8d")
    }
    spark.stop()
  }
}
