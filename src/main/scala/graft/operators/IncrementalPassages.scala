package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the passage-pair artifact — SURVEY.md
  * §2.3, the d11 counterpart of d9's `mergeBatch` and d10's bucketed
  * probes.
  *
  * `PipelineQueries.passagePairs` materializes the (doc_a, doc_b,
  * n_shared ≥ 3) table once per corpus version, but a growing corpus
  * cannot re-run the window-hash pipeline over 100 TB per ingest
  * batch. This module maintains the artifact EXACTLY with O(batch +
  * bounded probes) work, exploiting that document frequency only
  * GROWS as docs arrive:
  *
  *   - NEW pairs can only involve a batch doc (old docs' window sets
  *     are immutable);
  *   - EXISTING pairs can only LOSE shared windows — precisely those
  *     whose df crosses the boilerplate cap because of the batch.
  *
  * So the merge is three bounded pieces over a persisted (doc_id, h)
  * window index BUCKETED on h (`buildWindowIndex`, d10's layout —
  * the census and every probe below run with ZERO corpus-side
  * exchange):
  *
  *   1. df census: old df from the bucketed index (exchange-free
  *      group-by on the bucket key) + batch df → the new hot set and
  *      the CROSSING set (was ≤ cap, now > cap).
  *   2. decrements: for each crossing window, the docs containing it
  *      come from an index probe — at most `cap` docs by the
  *      definition of crossing, so the per-window pair fan-out is
  *      ≤ cap² and the whole stage is bounded by |crossing| · cap²,
  *      never corpus-sized. Old pairs lose one shared count per
  *      crossing window both sides contain; pairs falling below the
  *      ≥ 3 floor drop out.
  *   3. new pairs: batch windows (minus the new hot set) probe the
  *      index for corpus partners and self-join for batch-batch
  *      partners; shared counts ≥ 3 enter the table.
  *
  * `mergeBatch` returns the merged pair table; an equivalence spec
  * (IncrementalPassagesSpec) pins merged ≡ full recompute over the
  * union corpus, including a cap-crossing plant.
  */
object IncrementalPassages {

  /** The family's ONE window-hash kernel: the array of 60-bit md5
    * prefixes of each rolling `windowTokens`-token window of the
    * token-array column `tk`. Batch pipeline (d11), incremental index,
    * and streaming gate all hash through this expression — the
    * incremental/stream ≡ batch guarantees rest on the kernel never
    * diverging between them. `tk` must be a plain post-exchange
    * attribute so the lambda doesn't re-derive the token array per
    * element.
    */
  private[graft] def windowHashExpr(tk: org.apache.spark.sql.Column,
      windowTokens: Int = 8): org.apache.spark.sql.Column =
    transform(
      sequence(lit(1), size(tk) - lit(windowTokens - 1)),
      i => conv(substring(md5(array_join(slice(tk, i, lit(windowTokens)), " ")), 1, 15), 16, 10)
        .cast("long"))

  /** Distinct (doc_id, h) rolling-window hashes of whitespace-token
    * text — the index row shape.
    */
  def windowHashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", windowTokens: Int = 8): DataFrame = {
    val toks = graft.functions.TextFunctions.wsTokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("tk"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(when(size(col("tk")) >= windowTokens, windowHashExpr(col("tk"), windowTokens))
          .otherwise(array().cast("array<long>"))).as("h"))
      .distinct()
  }

  /** Pair derivation shared by the full pipeline and the equivalence
    * spec: df census → hot windows (df > cap) dropped via broadcast
    * anti-join → shared-window self-join → counts ≥ minShared. The
    * d11 contract, parameterized.
    */
  def pairsFromWindows(wins: DataFrame, cap: Int = 100,
      minShared: Int = 3): DataFrame = {
    val hot = wins.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > cap).select(col("h"))
    val ok = wins.join(broadcast(hot), Seq("h"), "left_anti")
    ok.select(col("h"), col("doc_id").as("doc_a"))
      .join(ok.select(col("h"), col("doc_id").as("doc_b")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Persist the corpus window index as a bucketed-on-h table — the
    * write-time shuffle is paid once per corpus build; every merge
    * reads its bucket layout directly (census and probes exchange-
    * free on the corpus side).
    */
  def buildWindowIndex(wins: DataFrame, prefix: String = "graft_passages",
      buckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      wins.select(col("doc_id"), col("h")), s"${prefix}_win", "h", buckets)

  /** The LIVE corpus index: `_win` minus net-dead docs (the
    * [[Tombstones]] discipline — retraction appends signed
    * tombstones, never rewrites the by-h-bucketed index; the
    * broadcast anti-join preserves the bucket layout).
    */
  def liveWin(spark: SparkSession, prefix: String = "graft_passages"): DataFrame =
    Tombstones.live(spark, spark.table(s"${prefix}_win"), prefix, "doc_id")

  /** Append a merged batch's windows to the index (bucket spec must
    * match `buildWindowIndex`'s) — idempotently at doc granularity: a
    * replayed ingest is absorbed, and a RE-ADMIT of a retracted doc
    * resurrects its still-present physical rows via a +1 tombstone
    * instead of duplicating them (docs are immutable).
    */
  def appendToIndex(batchWins: DataFrame, prefix: String = "graft_passages",
      buckets: Int = 32): Unit = {
    val bw = Checkpoints.cut(batchWins.select(col("doc_id"), col("h")))
    graft.sources.Bucketing.appendBucketed(
      graft.sources.Bucketing.absentOnly(bw, s"${prefix}_win", "doc_id"),
      s"${prefix}_win", "h", buckets)
    Tombstones.resurrect(bw.sparkSession, prefix,
      bw.select(col("doc_id")), "doc_id")
  }

  /** The hot-window set at the CURRENT live index — the df > cap
    * census, exchange-free on the bucketed key. Maintained as a tiny
    * `<prefix>_hot` table (`refreshHotWindows`) so consumers that
    * must exclude boilerplate (the streaming gate) read a maintained
    * exclusion instead of re-counting the corpus per micro-batch.
    * Refresh after each index append: a window crossing the cap
    * retroactively is thereby picked up at batch cadence — the same
    * retroactivity `mergeBatch` repairs exactly for the pair table.
    */
  def hotWindows(spark: SparkSession, prefix: String = "graft_passages",
      cap: Int = 100): DataFrame =
    liveWin(spark, prefix).groupBy(col("h"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap).select(col("h"))

  /** Land the hot census as `<prefix>_hot` (one linear, exchange-free
    * scan per batch — never per micro-batch).
    */
  def refreshHotWindows(spark: SparkSession, prefix: String = "graft_passages",
      cap: Int = 100, buckets: Int = 8): Unit = {
    graft.sources.Bucketing.writeBucketed(
      hotWindows(spark, prefix, cap), s"${prefix}_hot", "h", buckets)
    HotRefresh.stamp(spark, s"${prefix}_hot", prefix)
  }

  /** Re-census only when the retraction state moved since the last
    * refresh ([[HotRefresh]]) — micro-batch-cadence takedown pickup.
    */
  def refreshHotWindowsIfStale(spark: SparkSession,
      prefix: String = "graft_passages", cap: Int = 100,
      buckets: Int = 8): Unit =
    if (HotRefresh.isStale(spark, s"${prefix}_hot", prefix))
      refreshHotWindows(spark, prefix, cap, buckets)

  /** Fold the net-dead docs into `_win` physically and truncate the
    * tombstone history ([[Tombstones.compact]]); the hot census
    * re-derives on the next IfStale.
    */
  def compact(spark: SparkSession, prefix: String = "graft_passages",
      buckets: Int = 32): Unit =
    Tombstones.compact(spark, prefix, "doc_id",
      Seq((s"${prefix}_win", "h", buckets)))

  /** The index a SERVING consumer probes: full index minus the
    * maintained hot set — boilerplate windows carry no passage signal
    * and would fan a probe out to every doc containing them.
    * `mergeBatch` must keep reading the FULL `<prefix>_win` table
    * (its df census needs true counts); this is the one split surface
    * between the two contracts.
    */
  def servableIndex(spark: SparkSession,
      prefix: String = "graft_passages"): DataFrame =
    liveWin(spark, prefix)
      .join(broadcast(spark.table(s"${prefix}_hot")), Seq("h"), "left_anti")

  /** Merge an ingest batch into the passage-pair table EXACTLY —
    * returns the pair table of the union corpus without re-windowing
    * a single old doc. `oldPairs` is the current artifact
    * (`pairsFromWindows` of the indexed corpus at the same `cap` /
    * `minShared`); `batchWins` is `windowHashes` of the NEW docs only
    * (batch doc_ids must be disjoint from the corpus').
    */
  def mergeBatch(spark: SparkSession, batchWins: DataFrame, oldPairs: DataFrame,
      prefix: String = "graft_passages", cap: Int = 100,
      minShared: Int = 3): DataFrame = {
    // lineage-cut the batch window frame (t15's rule): it feeds the
    // census AND both new-pair sides, and its producer is the batch's
    // whole tokenize→window→hash pipeline
    val bw = Checkpoints.cut(batchWins)
    // corpus-as-of-before-this-batch: live rows minus the batch's own
    // ids, so a replayed admit (append landed, merge re-run) computes
    // the same result — the trigram/exact-substr replay discipline
    val index = liveWin(spark, prefix)
      .join(broadcast(bw.select(col("doc_id")).distinct()), Seq("doc_id"), "left_anti")
    // 1. df census — BATCH-SCOPED, never a corpus scan: a window can
    // only cross the cap (and only then disturb anything) if the
    // batch CONTAINS it, and windows absent from the batch can never
    // reach the new-pair join either (they'd have nothing to match).
    // So df is counted only for the batch's window hashes: a
    // broadcast semi-probe of the bucketed index (corpus side
    // unshuffled, rows ∝ postings of batch windows) + an exchange-
    // free group-by on the bucket key. The merge's total cost is
    // O(batch + postings of batch windows) — a per-ingest cost that
    // does NOT grow with corpus size.
    val dfB = bw.groupBy(col("h")).agg(count(lit(1)).as("df_b"))
    // ONE bucketed index read restricted to the batch's windows,
    // shared by the census, the decrement probe and the new-pair
    // corpus side (r20, the t15/q_triangles shared-subtree rule —
    // previously THREE separate corpus scans each re-paying the
    // tombstone + batch anti-joins). The cut materializes only the
    // postings of batch-held windows.
    val idxB = Checkpoints.cutBucketed(
      index.join(broadcast(dfB.select(col("h"))), Seq("h"), "left_semi"))
    val dfC = idxB.groupBy(col("h")).agg(count(lit(1)).as("df_c"))
    val census = Checkpoints.cut(dfB.join(dfC, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("df_c"), lit(0L)).as("df_c"),
        (coalesce(col("df_c"), lit(0L)) + col("df_b")).as("df_new")))
    // new-hot set over the batch's windows (all that the new-pair
    // filter can ever meet; a window hot BEFORE the batch is hot here
    // too, since df only grows) — broadcast-sized like the full
    // pipeline's `hot`
    val hotNew = census.filter(col("df_new") > cap).select(col("h"))
    // crossing windows: were countable, now boilerplate — each has
    // ≤ cap corpus docs by construction, and all are batch windows
    val crossing = census.filter(col("df_c") <= cap && col("df_new") > cap)
      .select(col("h"))
    // 2. decrements: probe the index for the ≤ cap docs of each
    // crossing window; fan-out bounded by |crossing| · cap².
    // crossing ⊆ dfB's windows — served by the shared idxB cut
    val crossDocs = idxB.join(broadcast(crossing), Seq("h"))
    val dec = crossDocs.select(col("h"), col("doc_id").as("doc_a"))
      .join(crossDocs.select(col("h"), col("doc_id").as("doc_b")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_lost"))
    val adjusted = oldPairs.join(dec, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        (col("n_shared") - coalesce(col("n_lost"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // 3. new pairs: batch windows (minus new hot) against indexed
    // corpus partners + batch-batch partners; the corpus side joins
    // on its bucket key, unshuffled
    val bOk = bw.join(broadcast(hotNew), Seq("h"), "left_anti")
    // the new-pair join keys on h from bOk (⊆ batch windows), so a
    // corpus partner row with a non-batch window can never match —
    // the partner side is the shared idxB cut minus the union-hot
    // set, row-equivalent to the full-index anti-join it replaces
    val cOk = idxB.join(broadcast(hotNew), Seq("h"), "left_anti")
    val partners = cOk.unionByName(bOk)
    val fresh = bOk.select(col("h"), col("doc_id").as("doc_new"))
      .join(partners.select(col("h"), col("doc_id").as("doc_other")), "h")
      .filter(col("doc_new") =!= col("doc_other"))
      .select(least(col("doc_new"), col("doc_other")).as("doc_a"),
        greatest(col("doc_new"), col("doc_other")).as("doc_b"),
        col("h"))
      .distinct() // batch-batch pairs arrive once per side
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    adjusted.unionByName(fresh)
  }

  /** One-owner ingest step — the d10 `admitBatch` analogue for the
    * passage family, composing the lifecycle the caller previously
    * had to order by hand (and could order WRONG: an append before
    * the merge double-counts the batch in the census):
    *
    *   1. `mergeBatch` against the PRE-append index — materialized
    *      EAGERLY, because the merge plan reads `<prefix>_win` by
    *      name and a lazy consumer evaluating it after step 2 would
    *      see the batch twice (once from the batch frame, once from
    *      the appended table);
    *   2. `appendToIndex` lands the batch windows under the bucket
    *      layout;
    *   3. `refreshHotWindows` re-censuses, so the NEXT probe or
    *      stream micro-batch reads a `servableIndex` that both
    *      CONTAINS the admitted docs and EXCLUDES any window the
    *      batch pushed over the cap.
    *
    * Returns the merged pair table (lineage-cut — the caller lands
    * it as the new artifact). Batch doc ids must be disjoint from
    * the corpus' (`mergeBatch`'s contract).
    */
  def admitBatch(spark: SparkSession, batchWins: DataFrame, oldPairs: DataFrame,
      prefix: String = "graft_passages", cap: Int = 100, minShared: Int = 3,
      buckets: Int = 32, hotBuckets: Int = 8): DataFrame = {
    val bw = Checkpoints.cut(batchWins) // feeds the merge AND the append
    val merged = Checkpoints.cut(
      mergeBatch(spark, bw, oldPairs, prefix, cap, minShared), eager = true)
    appendToIndex(bw, prefix, buckets)
    refreshHotWindows(spark, prefix, cap, hotBuckets)
    merged
  }

  /** Fold a TAKEDOWN batch out of the passage-pair table EXACTLY —
    * the reverse lifecycle. The admit merge's census argument runs in
    * reverse: dfs only DECREASE on removal, so a retraction can only
    *
    *   - DELETE pairs involving a batch doc (broadcast anti-joins on
    *     both pair sides);
    *   - UN-CROSS windows whose df drops back to ≤ cap — which
    *     requires the batch to CONTAIN the window. Each un-crossed
    *     window has ≤ cap remaining live holders, so the AFFECTED
    *     docs are a bounded set; their pair rows are recomputed from
    *     scratch against the post-retraction hot set (restricted to
    *     the windows those docs hold — every other window's df is
    *     untouched). A bounded recompute, not increments: the old cap
    *     may have pushed a pair below `minShared` OUT of the table,
    *     and only a recompute can resurrect it exactly.
    *
    * `batchWins` must be `windowHashes` of the docs' ORIGINAL text
    * (immutability is the family contract). Reads the live index
    * MINUS the batch ids, so a replayed retract (tombstones landed,
    * merge crashed) reproduces the same result. Retract ≡ full
    * recompute on corpus-minus-batch is spec-pinned, including a pair
    * resurrected from absence by an un-crossing window.
    */
  def retractMerge(spark: SparkSession, batchWins: DataFrame, oldPairs: DataFrame,
      prefix: String = "graft_passages", cap: Int = 100,
      minShared: Int = 3): DataFrame = {
    val bw = Checkpoints.cut(batchWins)
    val batchIds = bw.select(col("doc_id")).distinct()
    // corpus-as-of-after-this-retract, whether or not the tombstones
    // have landed (replay safety)
    val idx = liveWin(spark, prefix)
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
    val oldP = Checkpoints.cut(oldPairs)
    // 1. batch-scoped census: only windows the batch CONTAINS can
    // un-cross
    val dfR = bw.groupBy(col("h")).agg(count(lit(1)).as("df_r"))
    // ONE bucketed index read restricted to the batch's windows,
    // shared by the census and the affected-doc probe (r20, the admit
    // merge's shared-subtree rule)
    val idxR = Checkpoints.cutBucketed(
      idx.join(broadcast(dfR.select(col("h"))), Seq("h"), "left_semi"))
    val dfA = idxR.groupBy(col("h")).agg(count(lit(1)).as("df_a"))
    val census = Checkpoints.cut(dfR.join(dfA, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("df_a"), lit(0L)).as("df_a"),
        (coalesce(col("df_a"), lit(0L)) + col("df_r")).as("df_before")))
    val uncross = census.filter(col("df_before") > cap && col("df_a") <= cap)
      .select(col("h"))
    // 2. affected docs: the ≤-cap remaining live holders of any
    // un-crossed window; recompute ALL their pairs against the
    // post-retraction hot set over the windows they hold
    // uncross ⊆ dfR's windows — served by the shared idxR cut
    val affIds = Checkpoints.cut(
      idxR.join(broadcast(uncross), Seq("h")).select(col("doc_id")).distinct())
    val affRows = Checkpoints.cut(
      idx.join(broadcast(affIds), Seq("doc_id"), "left_semi"))
    val affH = affRows.select(col("h")).distinct()
    val hotA = idx.join(broadcast(affH), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > cap).select(col("h"))
    val aOk = affRows.join(broadcast(hotA), Seq("h"), "left_anti")
    val pOk = idx.join(broadcast(hotA), Seq("h"), "left_anti")
    val recomputed = aOk.select(col("h"), col("doc_id").as("doc_new"))
      .join(pOk.select(col("h"), col("doc_id").as("doc_other")), "h")
      .filter(col("doc_new") =!= col("doc_other"))
      .select(least(col("doc_new"), col("doc_other")).as("doc_a"),
        greatest(col("doc_new"), col("doc_other")).as("doc_b"),
        col("h"))
      .distinct() // affected-affected pairs arrive once per side
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // 3. keep everything else: batch pairs deleted, affected docs'
    // rows replaced by the recompute (pairs of two unaffected docs
    // share no un-crossed window — else both docs would be affected —
    // so their counts are untouched)
    val drop = Checkpoints.cut(batchIds.unionByName(affIds).distinct())
    val keep = oldP
      .join(broadcast(drop.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_anti")
      .join(broadcast(drop.withColumnRenamed("doc_id", "doc_b")),
        Seq("doc_b"), "left_anti")
      // using-joins front their key — restore the pair schema's order
      .select(col("doc_a"), col("doc_b"), col("n_shared"))
    keep.unionByName(recomputed)
  }

  /** One-owner takedown step (admitBatch's reverse parity): eager
    * retract-merge, signed tombstones ([[Tombstones]]), hot refresh —
    * the next probe or stream micro-batch serves a live index without
    * the batch and an exclusion with the un-crossed windows restored.
    * Returns the merged pair table.
    */
  def retractBatch(spark: SparkSession, batchWins: DataFrame, oldPairs: DataFrame,
      prefix: String = "graft_passages", cap: Int = 100, minShared: Int = 3,
      hotBuckets: Int = 8): DataFrame = {
    val bw = Checkpoints.cut(batchWins)
    val merged = Checkpoints.cut(
      retractMerge(spark, bw, oldPairs, prefix, cap, minShared), eager = true)
    Tombstones.retract(spark, prefix, bw.select(col("doc_id")), "doc_id")
    refreshHotWindows(spark, prefix, cap, hotBuckets)
    merged
  }

  // ---------------------------------------------------------------
  // Bench fixture: the per-batch cost of keeping the artifact fresh
  // ---------------------------------------------------------------

  private def benchFixture(spark: SparkSession, dir: String): (String, DataFrame) =
    BenchFixtures.memoized(spark, dir, "bench_ipass") { prefix =>
      val docs = graft.GraftSession.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpusWins = windowHashes(docs.filter(col("doc_id") % 7 =!= 0))
      buildWindowIndex(corpusWins, prefix = prefix)
      pairsFromWindows(corpusWins)
    }

  /** Build the standing artifacts (bucketed window index + old-pair
    * table) WITHOUT running a merge — called from Bench's warmup
    * phase so the timed `d11x` runs price only per-batch work. In
    * production these are built once per corpus version; a bench run
    * that priced their construction into the first timed run measured
    * fixture setup, not the merge (the round-12 driver medians did).
    */
  def warmBenchFixture(spark: SparkSession, dir: String): Unit = {
    benchFixture(spark, dir); ()
  }

  /** Bench entry (`d11x_incremental_merge`): the incremental cost of
    * folding an every-7th-doc batch into the passage-pair table —
    * what a corpus build pays PER INGEST vs `passagePairPipeline`'s
    * full re-run. The corpus index and old pair table are the
    * standing artifacts (built in Bench's warmup via
    * `warmBenchFixture`; per corpus version in production); each
    * timed run pays only the real per-batch work: window-hash the
    * batch, census, probes, merge.
    */
  def benchIncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val (prefix, oldPairs) = benchFixture(spark, dir)
    val batch = graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 7 === 0)
    mergeBatch(spark, windowHashes(batch), oldPairs, prefix = prefix)
  }

  /** Bench entry (`d11r_retract_merge`): the per-takedown cost of
    * folding an indexed-doc slice OUT of the pair table vs the full
    * window pipeline — `retractMerge` only (pure reads; tombstones
    * would mutate the standing fixture across timed runs).
    */
  def benchRetractMerge(spark: SparkSession, dir: String): DataFrame = {
    val (prefix, oldPairs) = benchFixture(spark, dir)
    val slice = graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
    retractMerge(spark, windowHashes(slice), oldPairs, prefix = prefix)
  }
}
