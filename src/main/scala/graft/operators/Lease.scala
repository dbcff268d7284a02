package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease files under the warehouse dir — the ONE owner
  * of the mutual-exclusion discipline the incremental families'
  * maintenance operations (admit / retract / compact) rely on.
  *
  * Acquisition is CREATE-EXCLUSIVE FIRST, list-for-rivals SECOND:
  * `fs.create(path, overwrite = false)` is namenode-atomic on HDFS, so
  * two operations racing the same prefix can no longer both observe an
  * empty lease dir and both proceed (the check-then-create TOCTOU of
  * the earlier in-family implementation). Each racer registers its own
  * lease before looking — if both were concurrent, at least one's list
  * happens after both creates, so at least one sees the other and
  * backs off (deleting the lease it just created; a lease is never
  * held by an operation that won't run). On object stores without
  * atomic create-exclusive the exclusion is best-effort — same
  * contract as every lock-file scheme on S3-likes; deployments needing
  * hard exclusion there front this with an external coordinator.
  *
  * The lease is released only on SUCCESS: a crashed operation leaves
  * its file so nothing else (including compact) runs until its retry
  * heals. A retry reuses its operation id and ADOPTS the crashed
  * attempt's lease (create-exclusive fails, the path is its own), and
  * keeps holding it on a repeat crash.
  */
object Lease {

  private def leaseDir(spark: SparkSession, prefix: String) =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir")),
      s"${prefix.toLowerCase(java.util.Locale.ROOT)}_lease")

  /** Run `body` holding the `prefix` lease as operation `opId`; throws
    * IllegalStateException when another operation is in flight.
    */
  def withLease[A](spark: SparkSession, prefix: String, opId: String)(
      body: => A): A = {
    val dir = leaseDir(spark, prefix)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val mine = new Path(dir, opId)
    val fresh =
      try { fs.create(mine, false).close(); true }
      catch {
        // the path already existing means OUR crashed attempt's lease
        // (same opId = same operation retrying) — adopt it; any other
        // IO failure propagates
        case e: java.io.IOException => if (fs.exists(mine)) false else throw e
      }
    val others = fs.listStatus(dir).map(_.getPath.getName).filterNot(_ == opId)
    if (others.nonEmpty) {
      if (fresh) fs.delete(mine, false)
      throw new IllegalStateException(
        s"'$prefix': operation(s) in flight: ${others.sorted.mkString(", ")} — " +
          "retry them to completion (or remove the stale lease file) first")
    }
    val out = body
    fs.delete(mine, false)
    out
  }
}
