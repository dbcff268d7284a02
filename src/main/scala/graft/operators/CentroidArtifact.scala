package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.SparkSession

/** The learned IVF centroid set as a MATERIALIZED index artifact —
  * the `documentClusters` pattern (LlmQueries) applied to ANN: a
  * serving index learns its centroids ONCE per corpus and every
  * consumer (s3 search, s6 append, d13 SemDeDup cells) reads the
  * artifact instead of re-running Lloyd. That is what makes s6's
  * "append without relearning" true in the EXECUTED plan, not just
  * per-batch asymptotics: the append path fetches the artifact (a
  * k×dims table, driver-bounded by the same argument as IvfIndex's
  * centroid literals) and runs one argmin pass — zero learning jobs
  * (spec-pinned via `learnCount`).
  *
  * Staleness: keyed by (application, corpus path, Hadoop-FS mtime +
  * content summary, full learning config) — a new session or a
  * rewritten corpus relearns; within a session the learning runs at
  * most once per config. The artifact lands under
  * `spark.graft.artifactDir` as a (cid, v) parquet table — the
  * durable form a production index serves from between relearns —
  * and is read back from THAT table (the parquet is the source of
  * truth, not a driver-memory side channel; centroids are 6-decimal
  * rounded, so the roundtrip is exact).
  */
object CentroidArtifact {

  private val paths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]
  private val learns = new java.util.concurrent.atomic.AtomicLong

  /** How many actual Lloyd learnings have run (artifact misses) —
    * the spec hook pinning "append path relearns nothing".
    */
  def learnCount: Long = learns.get

  /** Centroids for the embeddings corpus at `dir`, learned at most
    * once per (session, corpus version, config).
    */
  def embeddingCentroids(spark: SparkSession, dir: String, k: Int,
      iters: Int = 2, dims: Int = 64,
      sampleRate: Double = 1.0): Seq[(Int, Seq[Double])] = {
    val src = s"$dir/embeddings.parquet"
    // staleness stamp via Hadoop FS (mtime + content summary), the
    // documentClusters rule: works on hdfs://s3a://, catches in-place
    // rewrites a directory mtime would miss
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp =
      if (!fs.exists(p)) "absent"
      else {
        val cs = fs.getContentSummary(p)
        s"${fs.getFileStatus(p).getModificationTime}-${cs.getLength}-${cs.getFileCount}"
      }
    val key = s"${spark.sparkContext.applicationId}|$src|$stamp" +
      s"|k=$k|it=$iters|d=$dims|sr=$sampleRate"
    // single-flight (the documentClusters rule): concurrent suites
    // sharing the session must not race two learnings onto the same
    // deterministic output path
    val path = paths.synchronized(paths.getOrElseUpdate(key, {
      val e = table(spark, dir, "embeddings")
      val cents = IvfIndex.learnCentroids(e, "vec_id", "embedding",
        k = k, iters = iters, dims = dims, sampleRate = sampleRate)
      learns.incrementAndGet()
      val base = spark.conf.get("spark.graft.artifactDir",
        "/root/repo/target/scratch/clusters")
      val out = base.stripSuffix("/") + "/ivf_" +
        java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(key).toLong & 0xffffffffL)
      import spark.implicits._
      cents.toDF("cid", "v").coalesce(1).write.mode("overwrite").parquet(out)
      out
    }))
    loaded.getOrElseUpdate(path,
      spark.read.parquet(path).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq.sortBy(_._1))
  }
}
