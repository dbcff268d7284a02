package graft.operators

import graft.functions.TextFunctions.wsTokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the corpus-level TERM STATISTICS that
  * tf-idf (t7) and BM25 (t24) serve — document frequency per term,
  * document count, and total token length (avgdl) — completing the
  * "every corpus-derived artifact is incrementally maintainable"
  * story beyond dedup (SURVEY §2.3/§2.5): the statistics currently
  * recompute per corpus version; an ingest batch shifts df and the
  * totals MONOTONICALLY (the same census argument as the dedup
  * merges), so folding a batch is exact by construction.
  *
  * Layout — append-only deltas, not in-place rewrites, every row
  * tagged with its admit's BATCH FINGERPRINT:
  *   - `<prefix>_df` (batch_id, term, df) bucketed on term: each
  *     admit APPENDS the batch's per-term document counts; the served
  *     df is an exchange-free group-by-sum riding the bucket layout.
  *     Appends keep the admit O(batch); `compact` folds the deltas
  *     back to one row per term when the delta count warrants it
  *     (the log-structured-merge discipline, Spark-shaped).
  *   - `<prefix>_tot` (batch_id, n_docs, sum_dl): one appended row
  *     per admit; served as a two-scalar sum.
  *   - `<prefix>_docs` (doc_id, batch_id) bucketed on doc_id: which
  *     docs each admit contributed — the dedup source for
  *     partially-overlapping batches.
  *
  * CRASH-RETRY EXACTNESS (the reason for the fingerprint): the admit
  * writes THREE tables, and a crash between any two must heal on the
  * at-least-once retry without double-counting — unlike the
  * doc-keyed index appends (d24/trigram), stats deltas are
  * AGGREGATES, so per-table doc presence can't express "this table
  * already has this batch". Instead:
  *   - the batch fingerprint derives from the batch's FULL id set
  *     (count + xor/sum of id hashes), so a retry computes the SAME
  *     id regardless of which appends already landed;
  *   - the fresh-doc set excludes docs admitted by OTHER batches
  *     only (`batch_id != this`), so the current batch's own partial
  *     `_docs` append cannot change what the retry recomputes;
  *   - each table is appended only if it does not already hold this
  *     batch_id — three independent idempotent steps, any crash
  *     point heals.
  * `compact` erases `_df`'s batch ids (folded rows carry the
  * sentinel "compacted"), so it must only run when no admit is
  * mid-retry — the standard LSM compaction contract, documented
  * here because violating it re-opens the double-count.
  *
  * Statistics contract (pinned by the equivalence spec): df(term) =
  * |{doc : term ∈ wsTokens(doc)}|, n_docs = all admitted docs,
  * sum_dl = Σ |wsTokens(doc)| — exactly the quantities t7/t24 derive
  * from scratch, so serving from the maintained tables reproduces
  * their scores on the union corpus. The t7/t24 ENTRIES stay
  * recompute-per-corpus-version (they are oracled); this module is
  * the ingest path a 100 TB deployment runs instead.
  */
object IncrementalDfStats {

  /** Distinct (doc_id, term) rows + per-doc token length of a
    * documents frame — the one tokenization both stats share.
    */
  private def docTerms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wsTokens(col("text")).as("tk"))

  /** The batch's stat deltas: per-term doc counts and the totals row. */
  private def deltas(docs: DataFrame): (DataFrame, DataFrame) = {
    val d = Checkpoints.cut(docTerms(docs))
    val dfB = d.select(col("doc_id"), explode(col("tk")).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totB = d.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(col("tk")).cast("long")), lit(0L)).as("sum_dl"))
    (dfB, totB)
  }

  /** Deterministic fingerprint of the batch's id set — stable across
    * retries (derived from the ORIGINAL batch, never from table
    * state). Order-independent combine (count + xor + decimal sum of
    * id hashes; decimal so the ANSI sweep can't overflow-throw), one
    * scalar agg over the batch.
    */
  private def batchFingerprint(batchDocs: DataFrame): String = {
    val r = batchDocs.select(xxhash64(col("doc_id")).as("h")).distinct()
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
        coalesce(sum(col("h").cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)).as("s"))
      .head()
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"${r.getLong(0)}|${r.getLong(1)}|${r.getDecimal(2)}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Initialize the three tables from the standing corpus (batch id
    * "corpus").
    */
  def buildIndex(docs: DataFrame, prefix: String = "graft_dfstats",
      buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val d = Checkpoints.cut(docs.select(col("doc_id"), col("text")))
    val (dfB, totB) = deltas(d)
    graft.sources.Bucketing.writeBucketed(
      dfB.withColumn("batch_id", lit("corpus")), s"${prefix}_df", "term", buckets)
    graft.sources.Bucketing.writeBucketed(
      d.select(col("doc_id")).withColumn("batch_id", lit("corpus")),
      s"${prefix}_docs", "doc_id", buckets)
    val tot = graft.sources.Bucketing.dropTableAndLocation(spark, s"${prefix}_tot")
    totB.withColumn("batch_id", lit("corpus"))
      .write.mode("overwrite").format("parquet").saveAsTable(tot)
  }

  /** Fold an ingest batch into the statistics — O(batch) work, zero
    * corpus-side recompute, crash-retry-exact (see scaladoc).
    */
  def admitBatch(spark: SparkSession, batchDocs: DataFrame,
      prefix: String = "graft_dfstats", buckets: Int = 32): Unit = {
    val b = Checkpoints.cut(batchDocs.select(col("doc_id"), col("text")))
    val bid = batchFingerprint(b)
    // fresh = batch docs not admitted by OTHER batches; this batch's
    // own partial _docs append is excluded so a retry recomputes the
    // same set
    val ids = b.select(col("doc_id")).distinct()
    val present = spark.table(s"${prefix}_docs")
      .filter(col("batch_id") =!= lit(bid))
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id")).distinct()
    val fresh = Checkpoints.cut(
      b.join(broadcast(present), Seq("doc_id"), "left_anti"))
    val (dfB, totB) = deltas(fresh)
    def lacks(table: String): Boolean =
      spark.table(table).filter(col("batch_id") === lit(bid)).isEmpty
    if (lacks(s"${prefix}_df"))
      graft.sources.Bucketing.appendBucketed(
        dfB.withColumn("batch_id", lit(bid)), s"${prefix}_df", "term", buckets)
    if (lacks(s"${prefix}_docs"))
      graft.sources.Bucketing.appendBucketed(
        fresh.select(col("doc_id")).withColumn("batch_id", lit(bid)),
        s"${prefix}_docs", "doc_id", buckets)
    if (lacks(s"${prefix}_tot"))
      totB.withColumn("batch_id", lit(bid))
        .write.mode("append").format("parquet")
        .saveAsTable(s"${prefix}_tot".toLowerCase(java.util.Locale.ROOT))
  }

  /** The served (term, df) statistics — an exchange-free bucket-key
    * group-by over the delta rows.
    */
  def dfStats(spark: SparkSession, prefix: String = "graft_dfstats"): DataFrame =
    spark.table(s"${prefix}_df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))

  /** The served (n_docs, sum_dl) totals. */
  def totals(spark: SparkSession, prefix: String = "graft_dfstats"): DataFrame =
    spark.table(s"${prefix}_tot")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))

  /** Fold the accumulated df deltas back to one row per term — run
    * when the delta count warrants it AND no admit is mid-retry (the
    * LSM compaction contract: folded rows carry the "compacted"
    * sentinel, so a pre-compact batch retried post-compact would
    * re-append). One linear pass riding the bucket layout.
    */
  def compact(spark: SparkSession, prefix: String = "graft_dfstats",
      buckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      Checkpoints.cut(
        dfStats(spark, prefix).withColumn("batch_id", lit("compacted")),
        eager = true),
      s"${prefix}_df", "term", buckets)

  /** t7's tf-idf top-5 SERVED from the maintained statistics: score
    * any document set (the standing corpus, an arriving batch, a
    * query panel) without recomputing df over the corpus — the
    * serving shape the equivalence spec pins against the from-scratch
    * entry.
    */
  def tfidfTop5(spark: SparkSession, docs: DataFrame,
      prefix: String = "graft_dfstats"): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfStats(spark, prefix).withColumnRenamed("df", "dfreq"), "term")
      .crossJoin(broadcast(totals(spark, prefix).select(col("n_docs"))))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("dfreq").cast("double")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("dfreq"), col("score"))
  }
}
