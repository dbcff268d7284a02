package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared plumbing for corpus-version-keyed materialized artifacts
  * (cluster table, IVF centroids, PQ codebooks, BPE merges): the
  * staleness stamp and the deterministic artifact path. One
  * implementation so every artifact ages out under the SAME rule —
  * a new session or a rewritten corpus recomputes, nothing else
  * does.
  */
private[operators] object Artifacts {

  /** Staleness stamp via Hadoop's FileSystem (mtime + content
    * summary) — works on any Hadoop path (hdfs://, s3a://, local),
    * and the content summary catches a same-name in-place rewrite
    * that leaves the directory mtime untouched.
    */
  def corpusStamp(spark: SparkSession, src: String): String = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val cs = fs.getContentSummary(p)
      s"${fs.getFileStatus(p).getModificationTime}-${cs.getLength}-${cs.getFileCount}"
    }
  }

  /** Deterministic artifact location under `spark.graft.artifactDir`
    * (any Hadoop-writable path on a cluster; local scratch default).
    */
  def path(spark: SparkSession, prefix: String, key: String): String = {
    val base = spark.conf.get("spark.graft.artifactDir",
      "/root/repo/target/scratch/clusters")
    base.stripSuffix("/") + "/" + prefix + "_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(key).toLong & 0xffffffffL)
  }

  private val memo = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The materialize-once discipline every corpus-version artifact
    * (document clusters, media clusters, passage pairs) follows:
    * build `frame` ONCE per (prefix, application, dir, corpus stamp),
    * land it as parquet clustered on `clusterCols`
    * (Layout.writeClustered — downstream per-key scans hit tight row
    * groups), and serve every subsequent call from the scan. Keyed by
    * the corpus stamp, so a new session or a rewritten corpus
    * recomputes and results can never go stale against the driver's
    * gate or planted spec fixtures. Single-flight under one lock:
    * TrieMap.getOrElseUpdate may evaluate concurrently, and two
    * threads would overwrite the SAME deterministic output path
    * mid-write (parallel test suites share the session; Spark jobs
    * inside the lock still run fine).
    */
  def materializedClustered(spark: SparkSession, prefix: String, dir: String,
      stampSrc: String, clusterCols: Seq[String])(
      frame: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stamp = corpusStamp(spark, s"$dir/$stampSrc")
    val key = s"$prefix|${spark.sparkContext.applicationId}|$dir|$stamp"
    val p = memo.synchronized(memo.getOrElseUpdate(key, {
      val out = path(spark, prefix, key)
      graft.sources.Layout.writeClustered(frame, out, clusterCols)
      out
    }))
    spark.read.parquet(p)
  }
}
