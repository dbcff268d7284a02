package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative / branching operators (DedupClusters,
  * PageRank, SequenceGaps). An iterative DataFrame loop otherwise
  * stacks O(rounds) joins into one plan, and a branching consumer
  * re-runs its producer once per branch.
  *
  * Two cut modes, selected by configuration:
  *   - default: `localCheckpoint` — blocks live on executors; fast,
  *     but at real cluster scale an executor loss forces recompute
  *     from the last shuffle (or kills the job for a long lineage);
  *   - `spark.graft.checkpointDir` set: reliable `checkpoint()` —
  *     blocks written to the (distributed) checkpoint directory, so
  *     a 1000-executor run survives executor loss mid-iteration.
  *     This is the 100 TB-safe choice for multi-hour jobs.
  */
object Checkpoints {

  /** When set (to an HDFS/DBFS/local path), cuts become reliable
    * checkpoints written under this directory.
    */
  val DirKey = "spark.graft.checkpointDir"

  /** Cut `df`'s lineage. `eager = true` materializes immediately
    * (iterative loops); `eager = false` defers to the first action
    * (plan-only callers stay free).
    */
  def cut(df: DataFrame, eager: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set
        // only when unset or pointed elsewhere, so one session's cuts
        // share a directory
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
