package graft.operators

import org.apache.spark.sql.SparkSession

/** Retraction-version stamping for the maintained `_hot` exclusion
  * tables — the subscription that lets a mid-stream takedown reach
  * the streaming gates without waiting for the next merge: every
  * `refreshHot*` stamps the [[Tombstones.version]] it censused at
  * into the hot table's properties, and the family's
  * `refreshHot*IfStale` re-censuses only when the stamp no longer
  * matches the current version (one tiny-table count + one
  * properties read — cheap enough for micro-batch cadence, e.g. from
  * a `foreachBatch` hook or a trigger-interval timer).
  *
  * Pickup contract for a RUNNING stream: the refresh overwrites the
  * hot table (new files), so a query whose static side snapshotted
  * the old file listing picks the new census up at its next
  * (re)start or plan re-resolution; gates that must react within one
  * micro-batch read the hot frame inside `foreachBatch` (re-resolved
  * per batch by construction). ONE owner for the stamp key so the
  * families cannot drift.
  */
object HotRefresh {

  val VersionKey = "graft.gone.version"

  /** Stamp `hotTable` with the current retraction version of
    * `prefix` — call immediately after writing the census.
    */
  def stamp(spark: SparkSession, hotTable: String, prefix: String): Unit = {
    spark.sql(s"ALTER TABLE $hotTable SET TBLPROPERTIES " +
      s"('$VersionKey' = '${Tombstones.version(spark, prefix)}')")
    ()
  }

  /** True when `hotTable` is missing, unstamped, or stamped at a
    * different retraction version than `prefix` currently has.
    */
  def isStale(spark: SparkSession, hotTable: String, prefix: String): Boolean =
    !spark.catalog.tableExists(hotTable) || {
      val props = spark.sql(s"SHOW TBLPROPERTIES $hotTable").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      !props.get(VersionKey)
        .contains(Tombstones.version(spark, prefix).toString)
    }
}
