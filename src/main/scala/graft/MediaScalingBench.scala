package graft

import graft.operators.LlmQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the multimodal family (SURVEY.md
  * §8k): m4 shard planning + m5 perceptual-hash pairing on media
  * corpora of 1×–16× the sf0.1 documents table. The 100 TB claim is
  * that both are LINEAR in the corpus — m4 is one source-window pass,
  * m5 is one explode/partial-agg hash pass plus a banded equi-join —
  * so this bench measures wall and asserts the output structure
  * scales exactly N×.
  *
  * Replication that keeps the claim honest (DedupScalingBench's
  * recipe): each copy shifts doc_ids into a disjoint range (the
  * planted-re-upload id arithmetic, doc_id % 25, is preserved —
  * the shift is a multiple of 25), renames sources with a per-copy
  * suffix (so shard windows never span copies), appends a
  * fixed-width per-copy text marker (so cross-copy texts differ BY
  * CONSTRUCTION — an alphabet rotation alone is an identity on
  * letter-free or sub-shingle-length docs, which would quietly
  * reproduce byte-identical cross-copy assets), and rewrites text
  * through a copy-specific alphabet rotation. The marker+rotation
  * map is per-copy injective on whole documents, so within-copy
  * EXACT duplicates (the planted pairs) are reproduced
  * copy-for-copy while no cross-copy pair can be byte-identical.
  * Planted pair counts must therefore be EXACTLY copies × the 1×
  * counts (asserted); organic pairs vary per rotation and are only
  * bounded (linear).
  */
object MediaScalingBench {

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

    val scratch = "/root/repo/target/scratch/mediascale"
    val docs0 = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val alpha = lower + lower.toUpperCase
    def rotated(k: Int): String = {
      val r = k % 26
      lower.drop(r) + lower.take(r) +
        (lower.drop(r) + lower.take(r)).toUpperCase
    }

    docs0.count() // warmup

    var base: Option[(Long, Long, Long)] = None // (pairs0, planted, shards)
    val results = Seq(1, 2, 4, 8, 16).map { copies =>
      val perCopy = (0 until copies).map { c =>
        docs0
          .withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L))
          .withColumn("source", concat(col("source"), lit(s"_$c")))
          .withColumn("text", translate(
            concat(col("text"), lit(" mark%02d".format(c))), alpha, rotated(c)))
      }
      val path = s"$scratch/docs_$copies"
      perCopy.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$path/documents.parquet")
      val n = spark.read.parquet(s"$path/documents.parquet").count()

      def timed[T](f: => T): (Double, T) = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val r = f
          ((System.nanoTime() - t0) / 1e9, r)
        }
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }

      val (tPairs, (nPairs, nZero, nPlanted)) = timed {
        val p = LlmQueries.m5PhashNeardup(spark, path)
          .select(col("id_a"), col("id_b"), col("hamming")).cache()
        val total = p.count()
        val zero = p.filter(col("hamming") === 0).count()
        // planted re-uploads live at id_b − id_a = 1e6 within a copy
        val planted = p.filter(col("hamming") === 0 &&
          (col("id_b") - col("id_a")) === 1000000L).count()
        p.unpersist()
        (total, zero, planted)
      }
      val (tShard, (nShards, shardBytes)) = timed {
        val s = LlmQueries.m4ShardPlan(spark, path).cache()
        val rows = s.count()
        val bytes = s.agg(sum(col("shard_bytes"))).head.getLong(0)
        s.unpersist()
        (rows, bytes)
      }

      base match {
        case None => base = Some((nPairs, nPlanted, nShards))
        case Some((t0, p0, s0)) =>
          // the scaling contract: the DETERMINISTIC structure scales
          // copy-for-copy (planted re-uploads are exact-text dups —
          // bijection-invariant; shard windows never span copies)
          // and TOTAL pairs stay linear, never quadratic. Exact-
          // total scaling is deliberately not asserted: organic
          // hamming-≤3 pairs between different texts are vote-margin
          // coincidences that each copy's rotation legitimately
          // re-rolls (measured ±~2% per copy at sf0.1).
          require(nPlanted == p0 * copies,
            s"planted pairs must scale exactly: $nPlanted != $p0 x $copies")
          require(nShards == s0 * copies,
            s"shard count must scale exactly: $nShards != $s0 x $copies")
          require(nPairs <= 2L * t0 * copies,
            s"pair growth must stay linear: $nPairs vs base $t0 x $copies")
      }
      println(f"[mediascale] copies=$copies%2d assets=$n%8d pairs=$nPairs%6d " +
        f"h0=$nZero%6d planted=$nPlanted%5d shards=$nShards%5d " +
        f"bytes=$shardBytes%12d phash=$tPairs%6.2fs shard=$tShard%6.2fs " +
        f"assets_per_s=${n / tPairs}%9.0f")
      (copies, n, nPairs, nZero, nPlanted, nShards, tPairs, tShard)
    }

    println("[mediascale] copies | assets | pairs | h0 | planted | shards | phash s | shard s | assets/s")
    results.foreach { case (c, n, p, z, pl, s, tp, ts) =>
      println(f"[mediascale] $c%6d | $n%6d | $p%5d | $z%4d | $pl%7d | $s%6d | $tp%7.2f | $ts%7.2f | ${n / tp}%8.0f")
    }
    spark.stop()
  }
}
