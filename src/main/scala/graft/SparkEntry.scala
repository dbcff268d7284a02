package graft

import graft.operators.{ConversionQueries, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in
  * `queries`; SQL-expressible ones also have a DuckDB oracle in
  * `oracleSql` with identical column names/aliases on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "q3_join_topn" -> Relational.q3JoinTopn _,
    "q5_broadcast_join" -> Relational.q5BroadcastJoin _,
    "q_window" -> Relational.qWindow _,
    "q_semi_anti" -> Relational.qSemiAnti _,
    "q_distinct_union" -> Relational.qDistinctUnion _,
    "q_events_bucket" -> Relational.qEventsBucket _,
    "q_topn_group" -> Relational.qTopnGroup _,
    "ref_infer_schema" -> ConversionQueries.refInferSchema _,
    "ref_headerless" -> ConversionQueries.refHeaderless _,
    "ref_roundtrip_infer" -> ConversionQueries.refRoundtripInfer _,
    "ref_roundtrip_schema" -> ConversionQueries.refRoundtripSchema _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join_topn" -> Relational.q3JoinTopnSql,
    "q5_broadcast_join" -> Relational.q5BroadcastJoinSql,
    "q_window" -> Relational.qWindowSql,
    "q_semi_anti" -> Relational.qSemiAntiSql,
    "q_distinct_union" -> Relational.qDistinctUnionSql,
    "q_events_bucket" -> Relational.qEventsBucketSql,
    "q_topn_group" -> Relational.qTopnGroupSql,
    "ref_infer_schema" -> ConversionQueries.refInferSchemaSql,
    "ref_headerless" -> ConversionQueries.refHeaderlessSql,
    "ref_roundtrip_infer" -> ConversionQueries.refRoundtripInferSql,
    "ref_roundtrip_schema" -> ConversionQueries.refRoundtripSchemaSql,
  )
}
