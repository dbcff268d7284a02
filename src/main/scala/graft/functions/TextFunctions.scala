package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives (SURVEY.md §2.5), all pure `Column`
  * algebra over `org.apache.spark.sql.functions` — codegen'd, no UDFs,
  * no shuffles. Each primitive has an exact DuckDB-SQL counterpart
  * (see LlmQueries) so results are oracle-checkable bit-for-bit.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased text. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text (non-empty). */
  def wsTokens(c: Column): Column =
    filter(split(lower(trim(c)), " +"), t => t =!= "")

  def distinctTokens(c: Column): Column = array_distinct(wsTokens(c))

  /** Character k-gram (shingle) sequence of the normalized text, WITH
    * duplicates. Scale: a narrow map — shingling never shuffles.
    * Min-hashing is multiset-invariant, so it consumes this directly;
    * set semantics (jaccard) deduplicate downstream via `collect_set`
    * after an explode — `array_distinct` here would be O(n²) per doc
    * (measured: dominated the minhash stage).
    */
  def charShingleSeq(c: Column, k: Int): Column =
    // let-bind the normalized text (r20, ExprLet scaladoc): the
    // per-position lambda referenced the normText SUBTREE, re-running
    // the regex normalization once per shingle position — O(length²)
    ExprLet.bindOnce(normText(c)) { n =>
      when(length(n) < k, array().cast("array<string>"))
        .otherwise(
          transform(sequence(lit(1), length(n) - lit(k - 1)), i => n.substr(i, lit(k))))
    }

  /** Distinct shingles as an array (small inputs / tests). */
  def charShingles(c: Column, k: Int): Column =
    array_distinct(charShingleSeq(c, k))

  /** BPE-ish token count: alpha runs, digit runs, and single symbols. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** md5 fingerprint of the normalized text — the oracled document
    * fingerprint (SURVEY.md §2.5 t4).
    */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Winnowing fingerprints: the distinct set of per-window minimum
    * k-gram hashes (window w over the shingle sequence) — the
    * classic local document fingerprint for plagiarism-style matching.
    * Pure expression fold; spec-checked (not SQL-oracled).
    */
  def winnowing(c: Column, k: Int = 5, w: Int = 4): Column = {
    // charShingleSeq let-binds the normalized text internally
    val hashesExpr = transform(charShingleSeq(c, k), g => xxhash64(g))
    // LET-BIND the hash array (r20): the sliding-window transform
    // below references `hashes` once per output POSITION, and
    // interpreted higher-order functions re-evaluate a referenced
    // subtree per reference — the gram+hash pass ran O(length²)
    // xxhash64 evaluations per document. Bound as a lambda variable
    // it evaluates once; the windows read the bound array.
    // Result-identical (same hashes, same window minima).
    def windows(hashes: Column): Column =
      when(size(hashes) < w, array_distinct(hashes)).otherwise(
        array_distinct(transform(sequence(lit(0), size(hashes) - lit(w)),
          i => array_min(slice(hashes, i + 1, lit(w))))))
    element_at(transform(array(hashesExpr), hashes => windows(hashes)), 1)
  }

  /** Language-marker hit count: distinct tokens ∩ marker set. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(array_intersect(toks, array(markers.map(lit): _*)))

  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "a", "is", "to"),
    "es" -> Seq("el", "los", "que", "y", "es", "una"),
    "fr" -> Seq("le", "la", "et", "les", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))
}
