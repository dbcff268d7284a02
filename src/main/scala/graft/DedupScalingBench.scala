package graft

import graft.operators.{CandidatePairs, Dedup, DedupClusters}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the flagship dedup pipeline
  * (SURVEY.md §8h): candidates → jaccard verify → connected
  * components on corpora of 1×–16× the sf0.1 documents table. The
  * 100 TB claim for the dedup path is that total work is LINEAR in
  * the corpus (gap-blocked candidates, bucketed verify, O(log d)
  * component rounds) — this bench measures it instead of asserting
  * it.
  *
  * Replication that keeps the claim honest: each copy remaps doc_ids
  * into a disjoint id range (gap blocks never span copies) and
  * rewrites text through a copy-specific alphabet ROTATION
  * (`translate` with a rotated a–z map — a per-copy bijection on
  * characters). A bijection preserves shingle equality WITHIN a copy,
  * so every copy contributes exactly the original corpus' candidate/
  * edge/cluster structure, while cross-copy shingles differ — the
  * composite corpus has N× the work of the original by construction,
  * never N². (Naive replication would make every doc an exact dup of
  * its N−1 copies and measure the quadratic blow-up of a planted
  * pathology, not scaling.)
  */
object DedupScalingBench {

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

    val scratch = "/root/repo/target/scratch/dedupscale"
    val docs0 = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "source", "text")

    // rotate BOTH cases by the same offset: the map then commutes
    // with the pipeline's lowercasing, so it stays a bijection on
    // normalized shingles and within-copy jaccard is untouched
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val alpha = lower + lower.toUpperCase
    def rotated(k: Int): String = {
      val r = k % 26
      lower.drop(r) + lower.take(r) +
        (lower.drop(r) + lower.take(r)).toUpperCase
    }

    // warmup (codegen, IO pools) so the 1× point isn't charged init
    docs0.count()

    val results = Seq(1, 2, 4, 8, 16).map { copies =>
      val perCopy = (0 until copies).map { c =>
        docs0.withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L))
          .withColumn("text", translate(col("text"), alpha, rotated(c)))
      }
      val path = s"$scratch/docs_$copies"
      perCopy.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)
      val n = docs.count()

      def timed(f: => Long): (Double, Long) = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val rows = f
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }

      val (tEdges, nEdges) = timed {
        val pairs = CandidatePairs.idGapJoin(docs, "doc_id", "source", 60)
          .select(col("id_a"), col("id_b"))
        Dedup.jaccardVerify(docs, pairs, "doc_id", "text", threshold = 0.2).count()
      }
      val (tCc, nClusters) = timed {
        val pairs = CandidatePairs.idGapJoin(docs, "doc_id", "source", 60)
          .select(col("id_a"), col("id_b"))
        val edges = Dedup.jaccardVerify(docs, pairs, "doc_id", "text", threshold = 0.2)
        DedupClusters.connectedComponents(edges, "id_a", "id_b").count()
      }
      println(f"[dedupscale] copies=$copies%2d docs=$n%7d edges=$nEdges%7d " +
        f"clustered=$nClusters%7d verify=$tEdges%6.2fs full=$tCc%6.2fs " +
        f"docs_per_s_verify=${n / tEdges}%9.0f docs_per_s_full=${n / tCc}%9.0f")
      (copies, n, nEdges, nClusters, tEdges, tCc)
    }

    println("[dedupscale] copies | docs | edges | verify s | full s | verify docs/s | full docs/s")
    results.foreach { case (c, n, e, _, tv, tf) =>
      println(f"[dedupscale] $c%6d | $n%6d | $e%6d | $tv%8.2f | $tf%6.2f | ${n / tv}%13.0f | ${n / tf}%11.0f")
    }
    spark.stop()
  }
}
