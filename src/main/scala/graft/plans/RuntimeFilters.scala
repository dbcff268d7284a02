package graft.plans

import org.apache.spark.sql.SparkSession

/** Runtime bloom-filter join pruning (SURVEY.md §2.2 runtime-filter
  * row).
  *
  * For a shuffle join big ⋈ selective-small, Catalyst can build a
  * bloom filter over the small side's join keys at runtime and push a
  * `might_contain` predicate into the BIG side's scan — rows that
  * cannot match are dropped before the shuffle, which at 100 TB is
  * the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction. This is the engine-native form
  * of the hand-written "semi-join prefilter" trick.
  *
  * Spark ships the rule (`InjectRuntimeFilter`) but its default
  * thresholds target clusters: the application side must scan >10 GB
  * before injection triggers, so local runs and mid-size tables never
  * see it. `enable` opts a session in with an explicit application
  * -side floor; `restore` puts the defaults back. Creation-side
  * guard (small side must stay under `creationSideThreshold`) is kept
  * — building a bloom over a huge build side would cost more than it
  * saves.
  */
object RuntimeFilters {

  private val AppSideKey =
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
  private val EnabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"

  /** Opt in: inject bloom runtime filters for application-side scans
    * above `appSideScanBytes` (0 = always consider).
    */
  def enable(spark: SparkSession, appSideScanBytes: Long = 0L): Unit = {
    spark.conf.set(EnabledKey, "true")
    spark.conf.set(AppSideKey, appSideScanBytes.toString)
  }

  /** Back to Spark defaults (enabled, but 10 GB application floor). */
  def restore(spark: SparkSession): Unit = {
    spark.conf.unset(EnabledKey)
    spark.conf.unset(AppSideKey)
  }
}
