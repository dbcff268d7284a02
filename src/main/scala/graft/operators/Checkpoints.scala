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
  *
  * Cleanup: reliable checkpoint files are NOT deleted by default
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so
  * a 64-round loop would otherwise leave 64 full frames on disk for
  * the session's lifetime. The engine's session builders
  * (GraftSession / Bench / Verify) set that conf to true: every
  * iterative loop here reassigns its frame variable each round, so
  * a superseded round's DataFrame becomes unreachable, is GC'd, and
  * the ContextCleaner deletes its checkpoint files — disk usage
  * stays O(live frames), not O(rounds). Sessions built outside the
  * engine should set the conf themselves (it is a SparkConf-time
  * setting) or clean the directory between jobs.
  */
object Checkpoints {

  /** When set (to an HDFS/DBFS/local path), cuts become reliable
    * checkpoints written under this directory.
    */
  val DirKey = "spark.graft.checkpointDir"

  /** Test/dev hook (r20): when true, every cut records the physical
    * plan of the frame it is about to cut. A cut frame reads as an
    * opaque RDD scan downstream, so the plan-shape specs (bucketed
    * index reads, no cartesian, partial-agg degree counts) can no
    * longer see the guarded subtrees in the FINAL frame's plan once
    * an operator shares subtrees behind a cut — this records them at
    * the source. Off by default: production pays one conf lookup per
    * cut and never forces planning.
    */
  val CapturePlansKey = "spark.graft.capturePlans"

  private val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Plans recorded since the last [[clearCapturedPlans]] (capture-mode
    * only).
    */
  def capturedPlans: Seq[String] = {
    val out = Vector.newBuilder[String]
    captured.forEach(p => out += p)
    out.result()
  }

  def clearCapturedPlans(): Unit = captured.clear()

  /** Cut `df`'s lineage with bucketed scans FORCED in its plan (r20,
    * the merge family's shared-subtree cuts): the planner's
    * auto-bucketed-scan pass disables a bucketed read when nothing in
    * the SAME plan needs hash partitioning on the bucket key — which
    * is exactly what happens to a frame about to be CUT, because its
    * census/probe consumers live on the other side of the checkpoint.
    * Forcing the bucketed read keeps the scan's HashPartitioning,
    * which Dataset.checkpoint carries into the LogicalRDD
    * (firstLeafPartitioning of the physical plan), so downstream
    * bucket-key group-bys stay exchange-free — the family property
    * the bucket layout exists for. Physical planning happens INSIDE
    * the localCheckpoint/checkpoint call, so the scoped conf is seen.
    */
  def cutBucketed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try cut(df)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Cut `df`'s lineage. `eager = true` materializes immediately
    * (iterative loops); `eager = false` defers to the first action
    * (plan-only callers stay free).
    */
  def cut(df: DataFrame, eager: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(CapturePlansKey, "false") == "true")
      captured.add(df.queryExecution.executedPlan.toString)
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set
        // only when unset or pointed elsewhere, so one session's cuts
        // share a directory. "Pointed elsewhere" compares the minted
        // subdir's PARENT against the fully-qualified configured dir
        // (substring containment would wrongly keep a stale dir when
        // the config changes to a path that is a substring of it).
        val p = new org.apache.hadoop.fs.Path(dir)
        val qualified = p.getFileSystem(sc.hadoopConfiguration)
          .makeQualified(p).toString
        val current = sc.getCheckpointDir.map(cd =>
          new org.apache.hadoop.fs.Path(cd).getParent.toString)
        if (!current.contains(qualified)) sc.setCheckpointDir(dir)
        // persist BEFORE the reliable checkpoint (RDD.checkpoint's own
        // documented discipline): without it the first action computes
        // the lineage for the action and the checkpoint write then
        // RECOMPUTES it end-to-end — for the 1-row corpus-agg frames
        // the governed builds cut, that is a second full corpus pass
        // in exactly the 100 TB configuration this mode exists for.
        // The cached blocks are cleaned with the checkpoint files:
        // every cut frame is reassigned/GC'd and the ContextCleaner
        // unpersists unreachable RDDs (referenceTracking default).
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
