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
}
