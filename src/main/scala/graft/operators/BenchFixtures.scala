package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE standing-fixture protocol behind the incremental-merge
  * bench entries (d11x / m5y / d24x): build the bucketed index
  * tables and the old-artifact frame once per (seed, application,
  * dir), land the frame as parquet and force-materialize it, and
  * derive the index table prefix from the SAME key as the memo —
  * so benching two sf dirs in one session can never pair one dir's
  * memoized artifact with the other's rebuilt tables, and timed runs
  * price only per-batch work (the r13 fixture-pricing rule). One
  * implementation so the next pricing-rule change cannot silently
  * miss a family and reintroduce the round-12 mismeasurement there.
  */
private[operators] object BenchFixtures {

  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** `build` receives the derived table prefix, creates the index
    * tables under it, and returns the old-artifact frame. Returns
    * (prefix, materialized old frame).
    */
  def memoized(spark: SparkSession, dir: String, seed: String)(
      build: String => DataFrame): (String, DataFrame) = {
    val key = s"$seed|${spark.sparkContext.applicationId}|$dir"
    val prefix = seed + "_" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(key).toLong & 0xffffffffL)
    val old = memo.synchronized(memo.getOrElseUpdate(key, {
      val frame = build(prefix)
      val out = Artifacts.path(spark, s"${seed}_old", key)
      frame.write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      back.count() // pay file listing + footer reads here, not in a timed run
      back
    }))
    (prefix, old)
  }
}
