package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.cdc.Cdc

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q2_filter_project" -> Relational.q2FilterProject _,
    "q3_top_revenue" -> Relational.q3TopRevenue _,
    "q4_semi_join" -> Relational.q4SemiJoin _,
    "q5_local_supplier" -> Relational.q5LocalSupplier _,
    "q6_forecast" -> Relational.q6Forecast _,
    "q7_anti_join" -> Relational.q7AntiJoin _,
    "q8_market_share" -> Relational.q8MarketShare _,
    "q10_returned_items" -> Relational.q10ReturnedItems _,
    "q12_shipmode" -> Relational.q12Priority _,
    "q13_order_distribution" -> Relational.q13OrderDistribution _,
    "q14_promo" -> Relational.q14Promo _,
    "q16_supplier_cnt" -> Relational.q16SupplierCnt _,
    "q17_small_qty" -> Relational.q17SmallQty _,
    "q18_large_orders" -> Relational.q18LargeOrders _,
    "q19_disjunctive" -> Relational.q19Disjunctive _,
    "q21_suppliers_kept_waiting" -> Relational.q21Waiting _,
    "q22_global_sales" -> Relational.q22GlobalSales _,
    "q9_product_profit" -> Relational2.q9ProductProfit _,
    "q11_important_balance" -> Relational2.q11ImportantBalance _,
    "window_ranks" -> Relational2.windowRanks _,
    "q15_top_supplier" -> Relational2.q15TopSupplier _,
    "q20_excess_suppliers" -> Relational2.q20ExcessSuppliers _,
    "skew_agg_salted" -> Skew.skewAggSalted _,
    "skew_join_salted" -> Skew.skewJoinSalted _,
    "sort_limit" -> Relational.sortLimit _,
    "union_ops" -> Relational.unionOps _,
    "distinct_count" -> Relational.distinctCount _,
    "string_funcs" -> Relational.stringFuncs _,
    "date_funcs" -> Relational.dateFuncs _,
    // windows
    "window_topn" -> Windows.windowTopn _,
    "window_running" -> Windows.windowRunning _,
    "window_lag_lead" -> Windows.windowLagLead _,
    "sessionize" -> Windows.sessionize _,
    // grouping
    "rollup_agg" -> Grouping.rollupAgg _,
    "cube_agg" -> Grouping.cubeAgg _,
    "grouping_sets" -> Grouping.groupingSets _,
    "pivot_events" -> Grouping.pivotEvents _,
    "percentiles" -> Grouping.percentiles _,
    // time series
    "asof_join" -> TimeSeries.asofJoin _,
    "range_join" -> TimeSeries.rangeJoin _,
    "events_hourly" -> TimeSeries.eventsHourly _,
    // cdc
    "cdc_parse" -> Cdc.cdcParse _,
    "cdc_flatten" -> Cdc.cdcFlatten _,
    "cdc_route" -> Cdc.cdcRoute _,
    "cdc_materialize" -> Cdc.cdcMaterialize _,
    "cdc_history" -> Cdc.cdcHistory _,
    "cdc_delete_tombstones" -> Cdc.cdcTombstones _,
    "cdc_schema_evolution" -> Cdc.cdcSchemaEvolution _,
    "json_extract" -> Cdc.jsonExtract _,
    // LLM-data pipeline
    "text_tokens" -> TextAnalysis.textTokens _,
    "text_quality" -> TextAnalysis.textQuality _,
    "text_langid" -> TextAnalysis.textLangid _,
    "text_fingerprint" -> TextAnalysis.textFingerprint _,
    "text_tfidf" -> TextAnalysis.textTfidf _,
    "dedup_exact" -> Dedup.dedupExact _,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard _,
    "dedup_minhash" -> Dedup.dedupMinhash _,
    "dedup_simhash" -> Dedup.dedupSimhash _,
    "dedup_embedding" -> Dedup.dedupEmbedding _,
    "ann_bruteforce" -> Similarity.annBruteforce _,
    "ann_lsh" -> Similarity.annLsh _,
    "ann_ivf" -> ((s: SparkSession, d: String) => IvfIndex.annIvf(s, d)),
    "multimodal_meta" -> Multimodal.multimodalMeta _,
    "table_profile" -> Profile.tableProfile _,
    "approx_distinct" -> Profile.approxDistinct _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1Sql,
    "q2_filter_project" -> Relational.q2Sql,
    "q3_top_revenue" -> Relational.q3Sql,
    "q4_semi_join" -> Relational.q4Sql,
    "q5_local_supplier" -> Relational.q5Sql,
    "q6_forecast" -> Relational.q6Sql,
    "q7_anti_join" -> Relational.q7Sql,
    "q8_market_share" -> Relational.q8Sql,
    "q10_returned_items" -> Relational.q10Sql,
    "q12_shipmode" -> Relational.q12Sql,
    "q13_order_distribution" -> Relational.q13Sql,
    "q14_promo" -> Relational.q14Sql,
    "q16_supplier_cnt" -> Relational.q16Sql,
    "q17_small_qty" -> Relational.q17Sql,
    "q18_large_orders" -> Relational.q18Sql,
    "q19_disjunctive" -> Relational.q19Sql,
    "q21_suppliers_kept_waiting" -> Relational.q21Sql,
    "q22_global_sales" -> Relational.q22Sql,
    "q9_product_profit" -> Relational2.q9Sql,
    "q11_important_balance" -> Relational2.q11Sql,
    "window_ranks" -> Relational2.windowRanksSql,
    "q15_top_supplier" -> Relational2.q15Sql,
    "q20_excess_suppliers" -> Relational2.q20Sql,
    "skew_agg_salted" -> Skew.skewAggSaltedSql,
    "skew_join_salted" -> Skew.skewJoinSaltedSql,
    "sort_limit" -> Relational.sortLimitSql,
    "union_ops" -> Relational.unionOpsSql,
    "distinct_count" -> Relational.distinctCountSql,
    "string_funcs" -> Relational.stringFuncsSql,
    "date_funcs" -> Relational.dateFuncsSql,
    "window_topn" -> Windows.windowTopnSql,
    "window_running" -> Windows.windowRunningSql,
    "window_lag_lead" -> Windows.windowLagLeadSql,
    "sessionize" -> Windows.sessionizeSql,
    "rollup_agg" -> Grouping.rollupAggSql,
    "cube_agg" -> Grouping.cubeAggSql,
    "grouping_sets" -> Grouping.groupingSetsSql,
    "pivot_events" -> Grouping.pivotEventsSql,
    "percentiles" -> Grouping.percentilesSql,
    "asof_join" -> TimeSeries.asofJoinSql,
    "range_join" -> TimeSeries.rangeJoinSql,
    "events_hourly" -> TimeSeries.eventsHourlySql,
    "cdc_parse" -> Cdc.cdcParseSql,
    "cdc_flatten" -> Cdc.cdcFlattenSql,
    "cdc_route" -> Cdc.cdcRouteSql,
    "cdc_materialize" -> Cdc.cdcMaterializeSql,
    "cdc_history" -> Cdc.cdcHistorySql,
    "cdc_delete_tombstones" -> Cdc.cdcTombstonesSql,
    "cdc_schema_evolution" -> Cdc.cdcSchemaEvolutionSql,
    "json_extract" -> Cdc.jsonExtractSql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
    "text_tfidf" -> TextAnalysis.textTfidfSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "ann_bruteforce" -> Similarity.annBruteforceSql,
    "table_profile" -> Profile.tableProfileSql,
    // ann_lsh / ann_ivf / multimodal_meta / approx_distinct are
    // rows-only: hyperplane-LSH/IVF recall is spec-checked against
    // ann_bruteforce, multimodal decode is a mapPartitions stub, and
    // HLL sketches are not SQL-reproducible.
  )
}
