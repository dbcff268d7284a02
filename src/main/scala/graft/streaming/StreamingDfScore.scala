package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming front door of the TERM-STATISTICS family (SURVEY §2.5)
  * — tf-idf mass at INGESTION time: each arriving doc is scored
  * against the MAINTAINED corpus statistics (`IncrementalDfStats`'s
  * df table + totals) before it enters the corpus, completing the
  * family's lifecycle (batch t7/t24 → incremental df/avgdl admits →
  * this), exactly as the dedup families gate arrivals against their
  * maintained indexes. The score is the serving-side signal a corpus
  * build routes on: a doc whose tokens carry near-zero idf mass is
  * boilerplate; an unusually high mass flags topical novelty worth a
  * closer look.
  *
  * Shape:
  *   - the IDF side is a static frame (df stats joined with the
  *     1-row totals), re-resolved per micro-batch — an
  *     `IncrementalDfStats.admitBatch` between micro-batches is
  *     picked up without restarting the query;
  *   - the stream explodes tokens in-row (no pre-aggregation, so
  *     Σ tf·idf needs NO tf state: each occurrence contributes its
  *     term's idf once, and the stateful rollup sums them);
  *   - the ONLY stateful step is the (event window, doc) rollup,
  *     watermark-evicted. Terms unseen by the stats carry no idf and
  *     are REPORTED (n_unseen) rather than silently dropped — a high
  *     unseen count on an arriving doc means the maintained
  *     statistics have drifted behind the stream.
  */
object StreamingDfScore {

  /** The static idf frame from the maintained statistics: (term,
    * idf = ln(n_docs / df)), the same quantity t7 computes from
    * scratch.
    */
  def idfFrame(dfStats: DataFrame, totals: DataFrame): DataFrame =
    dfStats.crossJoin(broadcast(totals.select(col("n_docs"))))
      .select(col("term"),
        log(col("n_docs").cast("double") / col("df").cast("double")).as("idf"))

  /** Score arriving docs: per (event window, doc) — token count,
    * known-token OCCURRENCE count (each occurrence of a term the
    * stats know counts once — NOT distinct terms; `n_unseen`
    * likewise counts unseen occurrences), and the 6dp tf-idf mass
    * Σ tf·idf. Stream schema: (doc_id, `tsCol`, text).
    */
  def scoreAgainstStats(stream: DataFrame, idf: DataFrame, tsCol: String,
      watermark: String = "10 minutes",
      timeWindow: String = "1 minute"): DataFrame = {
    val toks = stream
      .withWatermark(tsCol, watermark)
      .select(col("doc_id"), col(tsCol),
        explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("term"))
    toks
      .join(broadcast(idf), Seq("term"), "left")
      .groupBy(window(col(tsCol), timeWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        count(col("idf")).as("n_known"),
        (count(lit(1)) - count(col("idf"))).as("n_unseen"),
        round(coalesce(sum(col("idf")), lit(0.0)), 6).as("tfidf_mass"))
      .select(col("doc_id"), col("n_tok"), col("n_known"),
        col("n_unseen"), col("tfidf_mass"))
  }

  /** The batch form of the same score — the equivalence oracle the
    * spec pins the stream against, and the shape a backfill job runs.
    */
  def scoreBatch(docs: DataFrame, idf: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("term"))
      .join(broadcast(idf), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        count(col("idf")).as("n_known"),
        (count(lit(1)) - count(col("idf"))).as("n_unseen"),
        round(coalesce(sum(col("idf")), lit(0.0)), 6).as("tfidf_mass"))
}
