package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The materialize-once discipline all corpus artifacts share
  * (`Artifacts.materializedClustered`): one build per (prefix, app,
  * dir, corpus stamp), every later call served from the landed
  * parquet; a rewritten corpus gets a fresh stamp and rebuilds.
  */
class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  test("materializedClustered builds once per corpus stamp and serves from the scan") {
    val dir = tmpDir("artifacts_fixture")
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    var builds = 0
    def call() = Artifacts.materializedClustered(spark, "aspec", dir,
      "documents.parquet", Seq("doc_id")) {
      builds += 1
      spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"), upper(col("text")).as("t"))
    }
    val first = call().as[(Long, String)].collect().toSet
    val second = call().as[(Long, String)].collect().toSet
    assert(first === Set((1L, "A"), (2L, "B")) && second === first)
    assert(builds === 1, s"artifact must build once, built $builds times")
    // the serving plan is a plain parquet scan of the artifact — the
    // build pipeline (here: the upper() project over the corpus) is
    // not in it
    val serve = call().queryExecution.executedPlan.toString
    assert(!serve.contains("upper"), s"serving must read the artifact:\n$serve")
    // a REWRITTEN corpus changes the stamp: the artifact rebuilds and
    // serves the new contents (staleness can't leak across versions)
    Thread.sleep(1100) // ensure a distinct mtime second on coarse filesystems
    Seq((3L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val third = call().as[(Long, String)].collect().toSet
    assert(third === Set((3L, "C")), s"stale artifact served: $third")
    assert(builds === 2)
  }
}
