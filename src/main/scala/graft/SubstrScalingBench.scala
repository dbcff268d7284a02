package graft

import graft.operators.{ExactSubstr, IncrementalExactSubstr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-scaling measurement for the exact-substring family (SURVEY
  * §8m — companion to Media/Dedup/Graph ScalingBench): the d24
  * report and its incremental merge on 1×–8× the sf0.1 corpus.
  *
  * Replication that keeps the claim honest: copy c offsets doc ids
  * by c·10⁷ and PREFIXES every token with `c<c>_` — structurally
  * disjoint vocabularies (a Caesar rotation of the text is only
  * data-dependently disjoint: letter-free tokens are rotation-
  * invariant and a rotated token can equal a different original
  * token, either of which would admit cross-copy windows), so the
  * composite corpus has EXACTLY N× the planted repeats of the
  * original (no cross-copy pairs, no quadratic pathology) and the
  * per-copy decade plant lands entirely inside its own id range
  * (offsets are multiples of 10).
  */
object SubstrScalingBench {

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

    val scratch = "/root/repo/target/scratch/substrscale"
    val docs0 = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    docs0.count() // warmup

    // the d11/d24 decade-head plant, inline (plantedSpanToks' rule)
    def planted(docs: DataFrame): DataFrame = {
      val toksD = docs.select(col("doc_id"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
      val heads = toksD.select(col("doc_id").as("head_id"),
        slice(col("toks"), 1, 12).as("ptoks"))
      toksD.withColumn("head_id", col("doc_id") - pmod(col("doc_id"), lit(10)))
        .join(heads, "head_id")
        .select(col("doc_id"), concat(col("toks"), col("ptoks")).as("tk"))
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }

    // plant once, replicate the TOKEN frame: copy c = id offset +
    // per-token prefix (windows of copy c are bijective images of
    // copy 0's, so repeats replicate exactly)
    val tk0 = planted(docs0)
    var base: Option[Long] = None
    Seq(1, 2, 4, 8).foreach { copies =>
      val path = s"$scratch/docs_$copies"
      (0 until copies).map(c =>
          tk0.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
            transform(col("tk"), t => concat(lit(s"c${c}_"), t)).as("tk")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(path)
      val tk = spark.read.parquet(path)
      val (fullS, nRep) = time(ExactSubstr.maximalRepeats(tk).count())
      base = base.orElse(Some(nRep))
      val exact = base.get * copies
      // incremental: every-7th-doc batch folded against the 6/7 index
      val corpus = tk.filter(col("doc_id") % 7 =!= 0)
      val batch = tk.filter(col("doc_id") % 7 === 0)
      val prefix = s"sscale_$copies"
      IncrementalExactSubstr.buildIndexes(
        ExactSubstr.windowPositions(corpus), prefix = prefix, buckets = 16)
      val oldOut = s"$scratch/old_$copies"
      ExactSubstr.maximalRepeats(corpus).write.mode("overwrite").parquet(oldOut)
      val oldRepeats = spark.read.parquet(oldOut)
      oldRepeats.count()
      val (mergeS, nMerged) = time(
        IncrementalExactSubstr.mergeBatch(spark,
          ExactSubstr.windowPositions(batch), oldRepeats,
          prefix = prefix).count())
      println(f"[substrscale] copies=$copies%2d repeats=$nRep%8d (expect $exact%8d) " +
        f"full=$fullS%6.2fs merge=$mergeS%6.2fs merged=$nMerged%8d")
      assert(nRep == exact,
        s"replication must scale repeats exactly: got $nRep, expect $exact")
    }
    spark.stop()
  }
}
