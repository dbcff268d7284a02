package graft

/** Plain-JVM replicas of the dedup kernels' byte-level pipeline,
  * built from the SAME constants the engine and the DuckDB oracle
  * generator use (HashFunctions.minhashA/B/P, md5-hex, normText's
  * regex) — the reference side of the property-based specs
  * (KernelPropertySpec, LshParamSpec).
  *
  * Faithfulness notes: Spark's `trim` strips 0x20 ONLY (Java's
  * String.trim strips all ≤ 0x20, so the space-only trim is explicit
  * here); Spark's `substr`/`length` count code points while Java
  * counts UTF-16 units — identical on the Basic Multilingual Plane,
  * so generators stay BMP-only; `lower` matches Locale.ROOT for the
  * generated alphabets.
  */
object TestOracles {
  import graft.functions.HashFunctions.{minhashA, minhashB, MinhashP => P}

  def jvmNorm(s: String): String =
    s.replaceAll("\\s+", " ").replaceAll("\\A +| +\\z", "")
      .toLowerCase(java.util.Locale.ROOT)

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Distinct char k-shingles of the NORMALIZED text, in first-
    * occurrence order.
    */
  def jvmShingles(text: String, k: Int): Seq[String] = {
    val t = jvmNorm(text)
    if (t.length < k) Nil
    else (0 to t.length - k).map(i => t.substring(i, i + k)).distinct
  }

  /** The 60-bit md5-prefix shingle SET (jaccardVerify's elements). */
  def jvmShingleSet(text: String, k: Int = 5): Set[Long] =
    jvmShingles(text, k)
      .map(s => java.lang.Long.parseLong(md5hex(s).take(15), 16)).toSet

  /** The universal-hash minhash signature; None when the doc has no
    * shingles (the engine emits no signature row).
    */
  def jvmSignature(text: String, numHashes: Int, k: Int = 5): Option[Seq[Long]] = {
    val sh = jvmShingles(text, k)
    if (sh.isEmpty) None
    else Some {
      val bases = sh.map(s => java.lang.Long.parseLong(md5hex(s).take(8), 16) % P)
      (0 until numHashes).map(j =>
        bases.map(h => (h * minhashA(j) + minhashB(j)) % P).min)
    }
  }

  /** LSH band keys over the signature (minhashBands' md5-of-concat). */
  def jvmBands(text: String, numHashes: Int, bands: Int): Option[Seq[(Int, String)]] =
    jvmSignature(text, numHashes).map { sig =>
      val rows = numHashes / bands
      (0 until bands).map(b =>
        b -> md5hex(sig.slice(b * rows, b * rows + rows).mkString("|")))
    }

  /** Whitespace tokens under `TextFunctions.wsTokens`' exact rule:
    * trim SPACES only (Spark trim strips 0x20, not \t\n), lower,
    * split on runs of literal spaces, drop empties — so tokens can
    * contain tabs/newlines, faithfully.
    */
  def jvmWsTokens(s: String): Seq[String] = {
    val t = s.replaceAll("\\A +| +\\z", "").toLowerCase(java.util.Locale.ROOT)
    t.split(" +", -1).filter(_.nonEmpty).toSeq
  }

  /** The passage family's DISTINCT rolling-window hash set
    * (`IncrementalPassages.windowHashExpr` ≡ d11's kernel): 60-bit
    * md5 prefix of each `k`-token window joined by single spaces.
    */
  def jvmWindowHashes(text: String, k: Int = 8): Set[Long] = {
    val tk = jvmWsTokens(text)
    if (tk.length < k) Set.empty
    else (0 to tk.length - k).map(i =>
      java.lang.Long.parseLong(
        md5hex(tk.slice(i, i + k).mkString(" ")).take(15), 16)).toSet
  }
}
