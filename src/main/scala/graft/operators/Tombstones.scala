package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signed tombstones over an append-only bucketed index — the ONE
  * owner of the retraction lifecycle's presence discipline, shared by
  * the trigram / passage / media families (the same single-owner rule
  * as `Bucketing.absentOnly`): retracting a doc appends a −1 row to
  * `<prefix>_gone`; re-admitting it appends a +1 RESURRECTION row
  * (its index rows are still physically present — docs are immutable,
  * so same id ⇒ same rows); an id is dead iff its net sign is
  * negative.
  *
  * Everything stays append-only: no index rewrite (a by-key-bucketed
  * index would touch every bucket for one doc's removal), no in-place
  * update, and replays are absorbed by net-sign checks rather than
  * guards the caller must remember. A deployment that never retracts
  * pays nothing — the tombstone table is created lazily on the first
  * retract and every reader short-circuits on its absence.
  *
  * Retraction targets are filtered by NOT-CURRENTLY-DEAD rather than
  * by a liveness probe of the corpus index: the dead set is
  * tombstone-sized (broadcastable), while "ids with live index rows"
  * would shuffle the corpus on the doc key. Tombstoning an id that
  * was never admitted is harmless — there are no index rows for the
  * live-reader's anti-join to remove, and the retract-merge maths
  * stay exact because every recompute runs against the TRUE
  * post-retraction index (a spurious un-crossing merely recomputes
  * rows to their current values).
  */
object Tombstones {

  private def goneTable(prefix: String): String =
    s"${prefix}_gone".toLowerCase(java.util.Locale.ROOT)

  /** Net-dead ids — None when no retraction has ever happened. */
  def deadIds(spark: SparkSession, prefix: String,
      idCol: String): Option[DataFrame] =
    if (!spark.catalog.tableExists(goneTable(prefix))) None
    else Some(spark.table(goneTable(prefix))
      .groupBy(col(idCol)).agg(sum(col("sign")).as("net"))
      .filter(col("net") < 0).select(col(idCol)))

  /** `index` minus net-dead ids — a broadcast anti-join preserving the
    * index's bucket layout (downstream bucket-key censuses stay
    * exchange-free); the identity when no tombstones exist.
    */
  def live(spark: SparkSession, index: DataFrame, prefix: String,
      idCol: String): DataFrame =
    deadIds(spark, prefix, idCol) match {
      case Some(dead) => index.join(broadcast(dead), Seq(idCol), "left_anti")
      case None => index
    }

  /** Append −1 tombstones for the not-currently-dead subset of
    * `batchIds` — a replayed retract finds its ids already dead and
    * appends nothing. Creates the table on first use (schema from the
    * ids themselves, so the id type follows the family's).
    */
  def retract(spark: SparkSession, prefix: String, batchIds: DataFrame,
      idCol: String): Unit = {
    val gone = goneTable(prefix)
    val ids = batchIds.select(col(idCol)).distinct()
    val targets = deadIds(spark, prefix, idCol) match {
      case Some(dead) => ids.join(broadcast(dead), Seq(idCol), "left_anti")
      case None => ids
    }
    val rows = targets.withColumn("sign", lit(-1))
    if (!spark.catalog.tableExists(gone)) {
      // first retract ever: clear any stale managed location a prior
      // session left behind (dropTableAndLocation — the one owner of
      // that discipline), then create VIA APPEND mode — append creates
      // a missing table but never clobbers an existing one, so two
      // concurrent first retracts cannot silently drop each other's
      // tombstones (an overwrite here could resurrect the loser's
      // docs)
      graft.sources.Bucketing.dropTableAndLocation(spark, gone)
      rows.write.mode("append").format("parquet").saveAsTable(gone)
    } else if (!rows.isEmpty)
      rows.write.mode("append").format("parquet").saveAsTable(gone)
  }

  /** Append +1 resurrection rows for the currently-dead subset of
    * `batchIds` — the re-admit path for ids whose index rows are
    * still physically present. A replayed resurrection sees net ≥ 0
    * and appends nothing.
    */
  def resurrect(spark: SparkSession, prefix: String, batchIds: DataFrame,
      idCol: String): Unit =
    deadIds(spark, prefix, idCol).foreach { dead =>
      val back = batchIds.select(col(idCol)).distinct()
        .join(broadcast(dead), Seq(idCol), "left_semi")
      if (!back.isEmpty)
        back.withColumn("sign", lit(1))
          .write.mode("append").format("parquet").saveAsTable(goneTable(prefix))
    }
}
