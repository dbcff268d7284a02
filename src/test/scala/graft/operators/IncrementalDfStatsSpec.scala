package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incrementally maintained df/avgdl statistics (SURVEY §2.5
  * t7/t24-incremental): admitted batches must fold EXACTLY — the
  * maintained (term, df) + (n_docs, sum_dl) equal a full recompute
  * over the union corpus, tf-idf served from the maintained tables
  * equals t7's from-scratch scores, replays are absorbed, and
  * compaction changes layout only.
  */
class IncrementalDfStatsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha alpha delta"),
    (3L, "beta beta beta"),
    (4L, "")).toDF("doc_id", "text")

  private def batch = Seq(
    (10L, "alpha epsilon"),
    (11L, "epsilon epsilon beta gamma")).toDF("doc_id", "text")

  private def fullDf(docs: org.apache.spark.sql.DataFrame) =
    docs.select($"doc_id",
        explode(graft.functions.TextFunctions.wsTokens($"text")).as("term"))
      .distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toSet

  private def fullTotals(docs: org.apache.spark.sql.DataFrame) =
    docs.select(size(graft.functions.TextFunctions.wsTokens($"text"))
        .cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
      .as[(Long, Long)].head()

  test("admitBatch folds df and totals exactly (empty docs count toward n_docs)") {
    IncrementalDfStats.buildIndex(corpus, prefix = "idf1", buckets = 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf1", buckets = 4)
    val union = corpus.unionByName(batch)
    assert(IncrementalDfStats.dfStats(spark, "idf1")
      .as[(String, Long)].collect().toSet === fullDf(union))
    assert(IncrementalDfStats.totals(spark, "idf1")
      .as[(Long, Long)].head() === fullTotals(union))
  }

  test("tf-idf served from the maintained stats ≡ t7's from-scratch scores") {
    val dir = tmpDir(s"idfstats_${System.nanoTime()}")
    corpus.unionByName(batch).filter($"doc_id" =!= 4L)
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    IncrementalDfStats.buildIndex(corpus.filter($"doc_id" =!= 4L),
      prefix = "idf2", buckets = 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf2", buckets = 4)
    val served = IncrementalDfStats.tfidfTop5(spark,
        spark.read.parquet(dir + "/documents.parquet"), prefix = "idf2")
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    val scratch = PipelineQueries.t7Tfidf(spark, dir)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    assert(served === scratch,
      s"served-from-stats scores must equal the entry's: ${served.diff(scratch)}")
  }

  test("a REPLAYED admitBatch is absorbed (stats unchanged)") {
    IncrementalDfStats.buildIndex(corpus, prefix = "idf3", buckets = 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf3", buckets = 4)
    val df1 = IncrementalDfStats.dfStats(spark, "idf3")
      .as[(String, Long)].collect().toSet
    val tot1 = IncrementalDfStats.totals(spark, "idf3").as[(Long, Long)].head()
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf3", buckets = 4)
    assert(IncrementalDfStats.dfStats(spark, "idf3")
      .as[(String, Long)].collect().toSet === df1)
    assert(IncrementalDfStats.totals(spark, "idf3").as[(Long, Long)].head() === tot1)
    // a PARTIALLY new batch admits only its fresh docs
    val overlap = batch.unionByName(Seq((12L, "zeta")).toDF("doc_id", "text"))
    IncrementalDfStats.admitBatch(spark, overlap, prefix = "idf3", buckets = 4)
    val union = corpus.unionByName(batch)
      .unionByName(Seq((12L, "zeta")).toDF("doc_id", "text"))
    assert(IncrementalDfStats.dfStats(spark, "idf3")
      .as[(String, Long)].collect().toSet === fullDf(union))
  }

  test("crash between the three appends heals on retry without double-counting") {
    // the admit writes THREE tables; stats deltas are aggregates, so
    // the retry can't doc-heal like the index appends — instead each
    // table is keyed by the batch fingerprint and appended only if it
    // lacks it. Simulate both crash orders by erasing one table's
    // batch rows after a successful admit, then re-admitting.
    IncrementalDfStats.buildIndex(corpus, prefix = "idf6", buckets = 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf6", buckets = 4)
    val wantDf = IncrementalDfStats.dfStats(spark, "idf6")
      .as[(String, Long)].collect().toSet
    val wantTot = IncrementalDfStats.totals(spark, "idf6").as[(Long, Long)].head()
    // crash BEFORE the _docs append: df/tot landed, docs did not
    val docsKept = spark.table("idf6_docs").filter($"batch_id" === "corpus")
      .select($"doc_id", $"batch_id").collect()
    graft.sources.Bucketing.writeBucketed(
      spark.createDataFrame(spark.sparkContext.parallelize(docsKept.toSeq),
        spark.table("idf6_docs").schema),
      "idf6_docs", "doc_id", 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf6", buckets = 4)
    assert(IncrementalDfStats.dfStats(spark, "idf6")
      .as[(String, Long)].collect().toSet === wantDf,
      "the retry must not re-append df deltas the table already has")
    assert(IncrementalDfStats.totals(spark, "idf6").as[(Long, Long)].head() === wantTot)
    assert(spark.table("idf6_docs").filter($"batch_id" =!= "corpus").count() ===
      batch.count(), "the retry must heal the lagging docs table")
    // crash BEFORE the _tot append: erase the batch's totals row only
    val totSchema = spark.table("idf6_tot").schema
    val totKept = spark.table("idf6_tot").filter($"batch_id" === "corpus").collect()
    val totName = graft.sources.Bucketing.dropTableAndLocation(spark, "idf6_tot")
    spark.createDataFrame(spark.sparkContext.parallelize(totKept.toSeq), totSchema)
      .write.mode("overwrite").format("parquet").saveAsTable(totName)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf6", buckets = 4)
    assert(IncrementalDfStats.totals(spark, "idf6").as[(Long, Long)].head() === wantTot,
      "the retry must heal the lagging totals table exactly once")
    assert(IncrementalDfStats.dfStats(spark, "idf6")
      .as[(String, Long)].collect().toSet === wantDf)
  }

  test("compact folds deltas without changing the served stats; reads stay exchange-free") {
    IncrementalDfStats.buildIndex(corpus, prefix = "idf4", buckets = 4)
    IncrementalDfStats.admitBatch(spark, batch, prefix = "idf4", buckets = 4)
    val before = IncrementalDfStats.dfStats(spark, "idf4")
      .as[(String, Long)].collect().toSet
    // pre-compact: alpha has delta rows from the build AND the admit
    assert(spark.table("idf4_df").groupBy($"term").count()
      .filter($"count" > 1).count() > 0, "fixture must exercise real deltas")
    IncrementalDfStats.compact(spark, prefix = "idf4", buckets = 4)
    assert(IncrementalDfStats.dfStats(spark, "idf4")
      .as[(String, Long)].collect().toSet === before)
    assert(spark.table("idf4_df").groupBy($"term").count()
      .filter($"count" > 1).count() === 0, "compaction folds to one row per term")
    val plan = IncrementalDfStats.dfStats(spark, "idf4")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the served group-by must ride the bucket layout:\n$plan")
  }

  test("real corpus: build + admit over a doc split ≡ recompute on the union") {
    val docs = graft.GraftSession.table(spark, sf0, "documents")
      .select($"doc_id", $"text")
    IncrementalDfStats.buildIndex(docs.filter($"doc_id" % 7 =!= 0),
      prefix = "idf5", buckets = 8)
    IncrementalDfStats.admitBatch(spark, docs.filter($"doc_id" % 7 === 0),
      prefix = "idf5", buckets = 8)
    assert(IncrementalDfStats.dfStats(spark, "idf5")
      .as[(String, Long)].collect().toSet === fullDf(docs))
    assert(IncrementalDfStats.totals(spark, "idf5")
      .as[(Long, Long)].head() === fullTotals(docs))
  }
}
