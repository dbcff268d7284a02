package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level duplicate COVERAGE (§2.3 d18): for every doc, the
  * maximal token spans whose rolling `Width`-token windows also occur
  * in at least one OTHER doc, plus the duplicated-token fraction —
  * the per-doc statistic behind span-REMOVAL dedup (cut the
  * copy-pasted passage, keep the unique prose), where doc-level dedup
  * (d1-d10) can only keep or drop whole docs and d11 only reports
  * which PAIRS share passages.
  *
  * Construction: d11's rolling-window kernel with POSITIONS kept
  * (posexplode over the same md5 60-bit window hashes) → windows
  * whose distinct-doc frequency is ≥ 2 → each surviving position
  * becomes the half-open token interval [pos, pos + Width) →
  * `IntervalMerge.islands` collapses overlapping/TOUCHING intervals
  * per doc into maximal spans (half-open ends make windows with
  * contiguous token coverage merge: [1,9) and [9,17) are one
  * 16-token span) → per-doc rollup + left join back onto the corpus
  * census so undupped docs report zeros.
  *
  * Deliberately NO hot-window cap, unlike d11/d8: those drop
  * ubiquitous windows because they form PAIRS (a df-10k boilerplate
  * window alone contributes ~5·10⁷ pairs); coverage never forms
  * pairs — a hot window costs exactly its position rows, and
  * boilerplate tokens ARE duplicated coverage a span-removal pass
  * should count.
  *
  * Scale shape: the input frame is lineage-cut once (Checkpoints.cut
  * — it is both the d11 "post-exchange attribute" barrier for the
  * per-row hash lambda and the guard against its two consumers
  * re-running the upstream plant join); window rows shuffle three
  * times (distinct (doc,h), df agg on h, dup equi-join — each ∝
  * windows, never docs²); the island merge is IntervalMerge's ONE
  * doc-key exchange with the rollup riding its partitioning. Nothing
  * is collected, nothing broadcast grows with the corpus (AQE may
  * broadcast the df≥2 hash side when it is small; at crawl scale it
  * shuffles). Micro-unit fraction: dup_tokens ≤ n_tok, so the ×10⁶
  * product is ≤ 10⁶·n_tok — a 9·10¹²-token doc would be needed to
  * wrap a long (p6's overflow discipline, trivially satisfied
  * per-doc).
  */
object DupSpans {

  /** Rolling window width in tokens (d11's passage granularity). */
  val Width = 8

  /** Lineage-cut token frame + merged dup spans (doc_id, m_start,
    * m_end, …) over it — the shared front half of census and scrub,
    * returned as a pair so both consumers ride ONE plant scan and one
    * island merge.
    */
  private def spanFrames(toks: DataFrame): (DataFrame, DataFrame) = {
    val cut = Checkpoints.cut(toks.select(col("doc_id"), col("tk")))
    // the span family's ONE window-hash kernel (d11's expression) —
    // d18/d19/d24 and the incremental/stream paths must never diverge
    val winArr = IncrementalPassages.windowHashExpr(col("tk"), Width)
    val pw = cut
      .select(col("doc_id"),
        posexplode(when(size(col("tk")) >= Width, winArr)
          .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), (col("pos") + lit(1)).cast("long").as("pos"),
        col("col").as("h"))
    val dup = pw.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("h"))
    val dpos = pw.join(dup, "h")
      .select(col("doc_id"), col("pos"), (col("pos") + lit(Width)).as("e"))
    (cut, IntervalMerge.islands(dpos, "doc_id", "pos", "pos", "e"))
  }

  /** Per-doc duplicated-span census over `toks`: one row per doc with
    * (doc_id, tk: array&lt;string&gt;) in, one row per doc out —
    * (doc_id, n_tok, n_spans, dup_tokens, dup_frac_micro).
    */
  def census(toks: DataFrame): DataFrame = {
    val (cut, spans) = spanFrames(toks)
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("m_end") - col("m_start")).as("dup_tokens"))
    cut.select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("coalesce(dup_tokens, 0) * 1000000 div greatest(n_tok, 1)")
          .as("dup_frac_micro"))
  }

  /** Span REMOVAL (the transform the census decides on): one row per
    * doc out — (doc_id, n_tok, kept: array&lt;string&gt;) where `kept`
    * is `tk` with every token inside a merged duplicated span cut and
    * the unique prose kept, in original order.
    *
    * Shape: the merged spans collapse to ONE per-doc struct array
    * (bounded by doc length — a doc of n tokens has ≤ n/Width merged
    * spans; never corpus-sized), joined back to the cut token frame on
    * the doc key; the cut itself is then a narrow index-filter map
    * (`filter(tk, (x, i) -> !exists(spans, …))`) inside codegen — no
    * explode of the corpus into token rows.
    */
  def scrub(toks: DataFrame): DataFrame = {
    val (cut, spans) = spanFrames(toks)
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("m_start"), col("m_end"))).as("spans"))
    cut.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tok"),
        when(col("spans").isNull, col("tk"))
          .otherwise(filter(col("tk"), (_, i) =>
            !exists(col("spans"), sp =>
              (i + lit(1) >= sp.getField("m_start")) &&
                (i + lit(1) < sp.getField("m_end")))))
          .as("kept"))
  }
}
