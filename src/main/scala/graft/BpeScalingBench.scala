package graft

import graft.operators.BpeMerges
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scaling measurement for BPE tokenizer induction (SURVEY.md
  * §8i — the fifth measured 100 TB claim, companion to the
  * dedup/ANN/graph/PQ benches): the t18/t19 pipeline split into its
  * three production stages on 1×–16× the sf0.1 documents table
  * (copies doc_id-remapped into disjoint ranges; texts identical per
  * copy, so the DISTINCT-WORD vocabulary is constant across scales —
  * exactly the regime a replicated/crawl-heavy corpus produces),
  * each stage with its own scale model:
  *
  *   1. VOCAB — the one corpus-proportional aggregation (explode
  *      words → (word, cnt)); wall must grow ~linearly, throughput
  *      (docs/s) must RISE as the job floor amortizes.
  *   2. ROUNDS — 8 merge rounds over the materialized vocab frame;
  *      the vocab row count is corpus-INDEPENDENT here, so round
  *      cost must stay FLAT as the corpus grows 16×.
  *   3. ENCODE — t19's tokenize: apply merges per distinct word,
  *      equi-join the exploded corpus, per-doc rollup; linear, with
  *      rising docs/s.
  */
object BpeScalingBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = "/root/repo/target/scratch/bpescale"
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    base.count() // warm IO/codegen

    val results = Seq(1, 2, 4, 8, 16).map { copies =>
      val perCopy = (0 until copies).map(c =>
        base.withColumn("doc_id", col("doc_id") + lit(c.toLong * 10000000L)))
      val path = s"$scratch/docs_$copies"
      perCopy.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)
      val nDocs = docs.count()

      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val v0 = BpeMerges.wordVocab(docs, "text")
          .select(BpeMerges.symInit(col("word")).as("s"), col("cnt"),
            col("word"))
          .persist()
        val nVocab = v0.count() // materialize: the corpus-linear stage
        val t1 = System.nanoTime()
        val merges = BpeMerges.learnOnVocab(v0.select("s", "cnt"), 8)
        val t2 = System.nanoTime()
        val fin = merges.foldLeft(
          v0.select(col("word"), col("s")))((v, m) =>
          BpeMerges.applyMerge(v, m.lhs, m.rhs))
        val wlen = fin.select(col("word"),
          size(split(trim(col("s")), "  ")).cast("long").as("n_sub"))
        val occ = docs.select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
            .as("word"))
        occ.join(wlen, "word").groupBy(col("doc_id"))
          .agg(sum(col("n_sub")).as("n_subwords")).count()
        val t3 = System.nanoTime()
        v0.unpersist()
        (nVocab, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def med(f: ((Long, Double, Double, Double)) => Double) =
        runs.map(f).sorted.apply(1)
      val (tv, tr, te) = (med(_._2), med(_._3), med(_._4))
      val nVocab = runs.head._1
      println(f"[bpescale] copies=$copies%2d docs=$nDocs%7d vocab=$nVocab%6d " +
        f"vocab=$tv%6.2fs rounds=$tr%6.2fs encode=$te%6.2fs " +
        f"encode_docs_per_s=${nDocs / te}%9.0f")
      (copies, nDocs, nVocab, tv, tr, te)
    }
    println("[bpescale] copies | docs | vocab | vocab s | rounds s | encode s | encode docs/s")
    results.foreach { case (c, n, v, tv, tr, te) =>
      println(f"[bpescale] $c%6d | $n%5d | $v%5d | $tv%7.2f | $tr%8.2f | $te%8.2f | ${n / te}%7.0f")
    }
    spark.stop()
  }
}
