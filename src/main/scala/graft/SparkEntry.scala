package graft

import graft.operators.{ConversionQueries, Extended, LlmQueries, Relational}
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
    "q_rollup" -> Relational.qRollup _,
    "q_asof" -> Relational.qAsof _,
    "q_scalar_subq" -> Relational.qScalarSubq _,
    "q_pivot" -> Relational.qPivot _,
    "ref_infer_schema" -> ConversionQueries.refInferSchema _,
    "ref_headerless" -> ConversionQueries.refHeaderless _,
    "ref_roundtrip_infer" -> ConversionQueries.refRoundtripInfer _,
    "ref_roundtrip_schema" -> ConversionQueries.refRoundtripSchema _,
    "ref_jsonl_roundtrip" -> ConversionQueries.refJsonlRoundtrip _,
    "d1_dedup_exact" -> LlmQueries.d1DedupExact _,
    "d2_minhash_lsh" -> LlmQueries.d2MinhashLsh _,
    "d3_simhash" -> LlmQueries.d3Simhash _,
    "d4_ngram_jaccard" -> LlmQueries.d4NgramJaccard _,
    "d5_embed_neardup" -> LlmQueries.d5EmbedNeardup _,
    "d6_embed_lsh" -> LlmQueries.d6EmbedLsh _,
    "s1_knn_brute" -> LlmQueries.s1KnnBrute _,
    "s2_knn_ivf" -> LlmQueries.s2KnnIvf _,
    "m2_media_decode" -> LlmQueries.m2MediaDecode _,
    "q_sessionize" -> LlmQueries.qSessionize _,
    "p1_hash_sample" -> LlmQueries.p1HashSample _,
    "p2_split_assign" -> LlmQueries.p2SplitAssign _,
    "t1_tokens" -> LlmQueries.t1Tokens _,
    "t2_quality" -> LlmQueries.t2Quality _,
    "t3_langid" -> LlmQueries.t3Langid _,
    "t4_fingerprint" -> LlmQueries.t4Fingerprint _,
    "m1_binary_meta" -> LlmQueries.m1BinaryMeta _,
    "q_set_ops" -> Extended.qSetOps _,
    "q_cube" -> Extended.qCube _,
    "q_grouping_sets" -> Extended.qGroupingSets _,
    "q_percentiles" -> Extended.qPercentiles _,
    "q_range_join" -> Extended.qRangeJoin _,
    "q_json_props" -> Extended.qJsonProps _,
    "q_explode_words" -> Extended.qExplodeWords _,
    "q_regex_extract" -> Extended.qRegexExtract _,
    "t5_packing" -> Extended.t5Packing _,
    "p3_stratified" -> Extended.p3Stratified _,
    "q_stateful_stats" -> LlmQueries.qStatefulStats _,
    "q_window2" -> Extended.qWindow2 _,
    "d7_editdist" -> Extended.d7EditDist _,
    "q_datetime" -> Extended.qDatetime _,
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
    "q_rollup" -> Relational.qRollupSql,
    "q_asof" -> Relational.qAsofSql,
    "q_scalar_subq" -> Relational.qScalarSubqSql,
    "q_pivot" -> Relational.qPivotSql,
    "ref_infer_schema" -> ConversionQueries.refInferSchemaSql,
    "ref_headerless" -> ConversionQueries.refHeaderlessSql,
    "ref_roundtrip_infer" -> ConversionQueries.refRoundtripInferSql,
    "ref_roundtrip_schema" -> ConversionQueries.refRoundtripSchemaSql,
    "ref_jsonl_roundtrip" -> ConversionQueries.refJsonlRoundtripSql,
    "d1_dedup_exact" -> LlmQueries.d1DedupExactSql,
    "d2_minhash_lsh" -> LlmQueries.d2MinhashLshSql,
    "d3_simhash" -> LlmQueries.d3SimhashSql,
    "d4_ngram_jaccard" -> LlmQueries.d4NgramJaccardSql,
    "d5_embed_neardup" -> LlmQueries.d5EmbedNeardupSql,
    "d6_embed_lsh" -> LlmQueries.d6EmbedLshSql,
    "s1_knn_brute" -> LlmQueries.s1KnnBruteSql,
    "p1_hash_sample" -> LlmQueries.p1HashSampleSql,
    "p2_split_assign" -> LlmQueries.p2SplitAssignSql,
    "t1_tokens" -> LlmQueries.t1TokensSql,
    "t2_quality" -> LlmQueries.t2QualitySql,
    "t3_langid" -> LlmQueries.t3LangidSql,
    "t4_fingerprint" -> LlmQueries.t4FingerprintSql,
    "m1_binary_meta" -> LlmQueries.m1BinaryMetaSql,
    "q_sessionize" -> LlmQueries.qSessionizeSql,
    "q_set_ops" -> Extended.qSetOpsSql,
    "q_cube" -> Extended.qCubeSql,
    "q_grouping_sets" -> Extended.qGroupingSetsSql,
    "q_percentiles" -> Extended.qPercentilesSql,
    "q_range_join" -> Extended.qRangeJoinSql,
    "q_json_props" -> Extended.qJsonPropsSql,
    "q_explode_words" -> Extended.qExplodeWordsSql,
    "q_regex_extract" -> Extended.qRegexExtractSql,
    "t5_packing" -> Extended.t5PackingSql,
    "p3_stratified" -> Extended.p3StratifiedSql,
    "s2_knn_ivf" -> LlmQueries.s2KnnIvfSql,
    "m2_media_decode" -> LlmQueries.m2MediaDecodeSql,
    "q_stateful_stats" -> LlmQueries.qStatefulStatsSql,
    "q_window2" -> Extended.qWindow2Sql,
    "d7_editdist" -> Extended.d7EditDistSql,
    "q_datetime" -> Extended.qDatetimeSql,
  )
}
