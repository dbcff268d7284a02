package graft.operators

import graft.GraftSession.table
import graft.functions.HashFunctions.{minhashA, minhashB, MinhashP}
import graft.functions.TextFunctions.fingerprintMd5
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-corpus) deduplication — SURVEY.md §2.3
  * `d10_incremental_dedup`.
  *
  * A growing corpus must dedup each INCOMING batch against what it
  * already holds without reprocessing the corpus: cost must be
  * O(batch + index probes), never O(corpus) per batch and never
  * corpus × batch. Two stages, both equi-joins against columns a
  * production pipeline would keep as precomputed index tables
  * (fingerprint set, LSH band buckets — derived in-plan here so the
  * entry is self-contained):
  *   1. exact: md5 fingerprint semi-join — batch docs whose
  *      normalized text already exists are `exact_dup`;
  *   2. near: MinHash band buckets of the batch equi-joined to the
  *      corpus buckets (the LSH trick bounds candidates), then exact
  *      n-gram Jaccard ≥ 0.2 verification on candidates only —
  *      matches are `near_dup`. Oversized corpus buckets (boilerplate
  *      text) are dropped via a broadcast anti-join, the same skew
  *      guard as d2 — a hot bucket must not fan the batch out.
  * Everything else in the batch is `kept`.
  *
  * The synthetic corpus has no duplicates, so the entry PLANTS the
  * batch deterministically from every 10th corpus doc: one third
  * exact copies, one third near copies (a short appended tail keeps
  * shingle Jaccard ≈ 0.95), one third fresh text (md5-derived, zero
  * shingle overlap). All three verdict paths are exercised on every
  * run; the DuckDB oracle replays plant, fingerprints, minhash bands
  * and verification from the same constants, so LSH candidate sets
  * match EXACTLY (even a missed near-dup is the same miss on both
  * engines).
  */
object IncrementalDedup {

  private val tail = " fresh tail segment"

  private[operators] def plantBatch(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        when(pmod(col("doc_id"), lit(30)) === 0, col("text"))
          .when(pmod(col("doc_id"), lit(30)) === 10, concat(col("text"), lit(tail)))
          .otherwise(concat(md5(col("text")),
            md5(concat(col("text"), lit("x"))),
            md5(concat(col("text"), lit("y"))))).as("text"))

  def d10IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val batch = plantBatch(docs)
    // stage 1: exact fingerprint match
    val fpC = docs.select(fingerprintMd5(col("text")).as("fp")).distinct()
    val exactDup = batch.select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .join(fpC, "fp").select(col("doc_id")).distinct()
    // stage 2: LSH band-bucket candidates, hot buckets dropped
    val bB = Dedup.minhashBands(batch, "doc_id", "text")
      .withColumnRenamed("doc_id", "id_a")
    val bC = Dedup.minhashBands(docs, "doc_id", "text")
      .withColumnRenamed("doc_id", "id_b")
    val hot = bC.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1000)
      .select(col("band"), col("band_hash"))
    val cand = bB.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
      .join(bC, Seq("band", "band_hash"))
      .select(col("id_a"), col("id_b")).distinct()
    val universe = docs.unionByName(batch)
    val nearDup = Dedup.jaccardVerify(universe, cand, "doc_id", "text", threshold = 0.2)
      .select(col("id_a").as("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exactDup.withColumn("e", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("nd", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("e") === 1, "exact_dup")
          .when(col("nd") === 1, "near_dup")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Persist the corpus' two dedup indexes as BUCKETED tables — the
    * d10 scale path. The entry above derives both indexes in-plan so
    * it stays oracle-replayable, but a production corpus maintains
    * them as tables and must not recompute fingerprints/minhashes of
    * the whole corpus per batch:
    *   - `<prefix>_fp`: distinct normalized-text fingerprints,
    *     bucketed + sorted on fp;
    *   - `<prefix>_bands`: MinHash LSH band postings keyed by ONE
    *     combined bucket key (band '|' band_hash — a single column so
    *     the bucket layout alone satisfies the join's distribution),
    *     bucketed + sorted on it.
    * `probeBatch` then answers each incoming batch with equi-joins
    * where the CORPUS side reads its bucket layout directly — zero
    * exchange on the big side, only the (small) batch shuffles into
    * the index's partitioning (IncrementalDedupSpec pins it). The
    * write-time shuffle is paid once per corpus build, not per batch.
    */
  /** `numHashes`/`bands` select the index's LSH operating point
    * (`Dedup.lshOperatingPoint`; retune for corpus growth via
    * `Dedup.chooseBanding`). The banding is STAMPED into the bands
    * table's properties: a probe with a different banding would
    * compute band keys over different signature slices and the bucket
    * equi-join would silently match nothing — every near-dup labeled
    * `kept` with no error — so `probeBatch` validates the stamp and
    * fails loudly on mismatch instead.
    */
  /** The band-posting row shape both index writes share: (id_b, bkey
    * = band '|' band_hash).
    */
  private def bandRows(docs: DataFrame, numHashes: Int, bands: Int): DataFrame =
    Dedup.minhashBands(docs, "doc_id", "text",
        numHashes = numHashes, bands = bands)
      .select(col("doc_id").as("id_b"),
        concat_ws("|", col("band"), col("band_hash")).as("bkey"))

  def buildIndexes(corpus: DataFrame, buckets: Int = 32,
      prefix: String = "graft_dedup",
      numHashes: Int = 16, bands: Int = 4): Unit = {
    // fp rows carry their HOLDER id: existence semantics are
    // unchanged (probe joins on fp and distincts the verdict), but a
    // retraction can then remove exactly one doc's claim — a shared
    // fingerprint stays as long as any live holder remains
    val fp = corpus.select(fingerprintMd5(col("text")).as("fp"),
      col("doc_id").as("id_b")).distinct()
    graft.sources.Bucketing.writeBucketed(fp, s"${prefix}_fp", "fp", buckets)
    graft.sources.Bucketing.writeBucketed(
      bandRows(corpus, numHashes, bands), s"${prefix}_bands", "bkey", buckets)
    corpus.sparkSession.sql(
      s"ALTER TABLE ${prefix}_bands SET TBLPROPERTIES " +
        s"('graft.lsh.numHashes' = '$numHashes', 'graft.lsh.bands' = '$bands')")
    ()
  }

  /** Fold a probed batch's ADMITTED docs (status `kept`) into the
    * persisted indexes so the next batch dedups against them — the
    * maintenance step that completes the ingest loop
    * (probe → admit → append; `IncrementalPassages`/`IncrementalMedia`
    * are the pair-table analogues). Appends under the existing bucket
    * layout with the index's stamped banding: O(kept docs), no corpus
    * rewrite.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame, verdicts: DataFrame,
      buckets: Int = 32, prefix: String = "graft_dedup",
      numHashes: Int = 16, bands: Int = 4): Unit = {
    requireHolderFp(spark, prefix)
    indexBanding(spark, prefix).foreach { case (nh, b) =>
      require(nh == numHashes && b == bands,
        s"admitBatch banding ($numHashes, $bands) != index '${prefix}_bands' " +
          s"banding ($nh, $b)")
    }
    // lineage-cut: `verdicts` is typically the whole probeBatch plan,
    // and both appends below would otherwise re-run it
    val kept = Checkpoints.cut(batch.join(
      verdicts.filter(col("status") === "kept").select(col("doc_id")), "doc_id"))
    graft.sources.Bucketing.appendBucketed(
      graft.sources.Bucketing.absentOnly(
        kept.select(fingerprintMd5(col("text")).as("fp"),
          col("doc_id").as("id_b")).distinct(),
        s"${prefix}_fp", "id_b"),
      s"${prefix}_fp", "fp", buckets)
    graft.sources.Bucketing.appendBucketed(
      graft.sources.Bucketing.absentOnly(
        bandRows(kept, numHashes, bands), s"${prefix}_bands", "id_b"),
      s"${prefix}_bands", "bkey", buckets)
    // a re-admit of a retracted doc: rows still present in both tables
    Tombstones.resurrect(spark, prefix, kept.select(col("doc_id").as("id_b")), "id_b")
  }

  /** Remove a TAKEDOWN batch of docs from the dedup indexes — the
    * reverse lifecycle, O(batch): signed tombstones ([[Tombstones]],
    * one table governing both index copies) flip the docs dead; the
    * next probe's live reads no longer match their fingerprints or
    * band postings. A fingerprint SHARED with a surviving doc keeps
    * matching through the survivor's own (fp, id_b) row — removal is
    * per-claim, not per-value. Only doc ids are needed (no text).
    */
  def retractBatch(spark: SparkSession, docIds: DataFrame,
      prefix: String = "graft_dedup"): Unit =
    Tombstones.retract(spark, prefix,
      docIds.select(col(docIds.columns.head).as("id_b")), "id_b")

  /** Fold the net-dead docs into BOTH index copies physically and
    * truncate the tombstone history ([[Tombstones.compact]] — the
    * per-claim (fp, id_b) rows make removal exact: a shared
    * fingerprint keeps its surviving holders' rows).
    */
  def compact(spark: SparkSession, prefix: String = "graft_dedup",
      buckets: Int = 32): Unit =
    Tombstones.compact(spark, prefix, "id_b",
      Seq((s"${prefix}_fp", "fp", buckets),
        (s"${prefix}_bands", "bkey", buckets)))

  /** Fail fast on an `_fp` index predating the per-holder (fp, id_b)
    * row format: every read and append here resolves `id_b`, so an
    * fp-only index would otherwise die mid-plan with an opaque
    * unresolved-column error (or, worse, a retract would silently not
    * remove the claim it thinks it removed).
    */
  private def requireHolderFp(spark: SparkSession, prefix: String): Unit = {
    val cols = spark.table(s"${prefix}_fp").columns
    require(cols.contains("id_b"),
      s"'${prefix}_fp' predates the per-holder (fp, id_b) row format " +
        s"(columns: ${cols.mkString(", ")}) — rebuild the index with " +
        "buildIndexes; per-claim rows are what make retraction and " +
        "replay absorption exact")
  }

  /** The (numHashes, bands) stamp `buildIndexes` wrote, or None for a
    * pre-stamp index (the BANDING stamp's absence alone is tolerated —
    * the caller's banding is then trusted as before; the `_fp`
    * per-holder ROW FORMAT is mandatory regardless, enforced by
    * `requireHolderFp` with an explicit rebuild message).
    */
  private def indexBanding(spark: SparkSession, prefix: String): Option[(Int, Int)] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${prefix}_bands").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for {
      nh <- props.get("graft.lsh.numHashes")
      b <- props.get("graft.lsh.bands")
    } yield (nh.toInt, b.toInt)
  }

  /** Dedup an incoming batch against the PERSISTED indexes
    * (`buildIndexes`). Identical verdict semantics to the in-plan
    * entry: exact fingerprint match, then LSH candidates (hot corpus
    * buckets > `maxBucket` dropped via broadcast anti-join) verified
    * by n-gram Jaccard ≥ 0.2. `corpus` supplies candidate TEXTS for
    * verification only — an O(candidates) id-join, never a corpus
    * re-index.
    */
  def probeBatch(spark: SparkSession, corpus: DataFrame, batch: DataFrame,
      maxBucket: Int = 1000, prefix: String = "graft_dedup",
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    requireHolderFp(spark, prefix)
    indexBanding(spark, prefix).foreach { case (nh, b) =>
      require(nh == numHashes && b == bands,
        s"probeBatch banding ($numHashes, $bands) != index '${prefix}_bands' " +
          s"banding ($nh, $b) — band keys would never match; rebuild the index " +
          "or probe with its stamped operating point")
    }
    val fpC = Tombstones.live(spark, spark.table(s"${prefix}_fp"), prefix, "id_b")
    val bandsC = Tombstones.live(spark, spark.table(s"${prefix}_bands"), prefix, "id_b")
    val exactDup = batch.select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .join(fpC, "fp").select(col("doc_id")).distinct()
    val bB = Dedup.minhashBands(batch, "doc_id", "text",
        numHashes = numHashes, bands = bands)
      .select(col("doc_id").as("id_a"),
        concat_ws("|", col("band"), col("band_hash")).as("bkey"))
    val hot = bandsC.groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bkey"))
    val cand = bB.join(broadcast(hot), Seq("bkey"), "left_anti")
      .join(bandsC, Seq("bkey"))
      .select(col("id_a"), col("id_b")).distinct()
    val universe = corpus.select(col("doc_id"), col("text"))
      .unionByName(batch.select(col("doc_id"), col("text")))
    val nearDup = Dedup.jaccardVerify(universe, cand, "doc_id", "text", threshold = 0.2)
      .select(col("id_a").as("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exactDup.withColumn("e", lit(1)), Seq("doc_id"), "left")
      .join(nearDup.withColumn("nd", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("e") === 1, "exact_dup")
          .when(col("nd") === 1, "near_dup")
          .otherwise("kept").as("status"))
      .orderBy(col("doc_id"))
  }

  val d10IncrementalDedupSql: String = {
    val P = MinhashP
    val minCols = (0 until 16).map(j =>
      s"min((h * ${minhashA(j)} + ${minhashB(j)}) % $P) AS h$j").mkString(", ")
    def bandSelects(mh: String) = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"h${b * 4 + r}::VARCHAR").mkString(", ")
      s"SELECT doc_id, $b::INT AS band, md5(concat_ws('|', $cols)) AS band_hash FROM $mh"
    }.mkString(" UNION ALL ")
    // per-side minhash band pipeline (same shape as the d2 oracle)
    def bandCtes(side: String, src: String) =
      s"""norm$side AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        |  FROM $src
        |), sh$side AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([substr(t, i, 5) for i in generate_series(1, length(t) - 4)])) AS s
        |  FROM norm$side WHERE length(t) >= 5
        |), hb$side AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % $P AS h FROM sh$side
        |), mh$side AS (
        |  SELECT doc_id, $minCols FROM hb$side GROUP BY doc_id
        |), bands$side AS (
        |  ${bandSelects(s"mh$side")}
        |)""".stripMargin
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |), batch AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |    CASE WHEN doc_id % 30 = 0 THEN text
      |         WHEN doc_id % 30 = 10 THEN text || '$tail'
      |         ELSE md5(text) || md5(text || 'x') || md5(text || 'y') END AS text
      |  FROM corpus WHERE doc_id % 10 = 0
      |), fpc AS (
      |  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      |  FROM corpus
      |), exact_dup AS (
      |  SELECT DISTINCT b.doc_id
      |  FROM (SELECT doc_id,
      |          md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      |        FROM batch) b
      |  JOIN fpc USING (fp)
      |), ${bandCtes("b", "batch")}, ${bandCtes("c", "corpus")},
      |hot AS (
      |  SELECT band, band_hash FROM bandsc GROUP BY band, band_hash HAVING count(*) > 1000
      |), cand AS (
      |  SELECT DISTINCT bb.doc_id AS id_a, bc.doc_id AS id_b
      |  FROM bandsb bb JOIN bandsc bc USING (band, band_hash)
      |  WHERE NOT EXISTS (SELECT 1 FROM hot h
      |                    WHERE h.band = bb.band AND h.band_hash = bb.band_hash)
      |), univ AS (
      |  SELECT doc_id, text FROM corpus UNION ALL SELECT doc_id, text FROM batch
      |), shu AS (
      |  SELECT doc_id,
      |    list_distinct([('0x' || substr(md5(substr(t, i, 5)), 1, 15))::BIGINT
      |                   for i in generate_series(1, length(t) - 4)]) AS sh
      |  FROM (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      |        FROM univ)
      |), near_dup AS (
      |  SELECT DISTINCT c.id_a AS doc_id
      |  FROM cand c JOIN shu a ON a.doc_id = c.id_a JOIN shu b ON b.doc_id = c.id_b
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.2
      |)
      |SELECT b.doc_id AS doc_id,
      |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
      |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
      |       ELSE 'kept' END AS status
      |FROM batch b
      |LEFT JOIN exact_dup e ON e.doc_id = b.doc_id
      |LEFT JOIN near_dup n ON n.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin
  }
}
