package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the operator
  * inventory each entry descends from, and §7 for the build plan.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` ending in
  * a total ORDER BY; every oracle is the equivalent ANSI SQL for DuckDB
  * over the same parquet tables, with column names aliased identically
  * on both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the end-to-end acquisition plan (SURVEY.md §7.2) —
    * dims × window → chunks → buffered bounds → broadcast IP lookup →
    * request keys, on sf0.001. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Acquisition.acquisitionPlan(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Acquisition plan ops (E1-E8)
    "q_cross_dims" -> (Acquisition.qCrossDims _),
    "q_chunk_explode" -> (Acquisition.qChunkExplode _),
    "q_buffered_bounds" -> (Acquisition.qBufferedBounds _),
    "q_key_projection" -> (Acquisition.qKeyProjection _),
    "q_lookup_join" -> (Acquisition.qLookupJoin _),
    "q_lookup_misses" -> (Acquisition.qLookupMisses _),
    "q_anti_dedup" -> (Acquisition.qAntiDedup _),
    "q_semi_present" -> (Acquisition.qSemiPresent _),
    "q_asof_latest" -> (Acquisition.qAsofLatest _),
    "q_asof_native" -> (Acquisition.qAsofNative _),
    "q_asof_merge" -> (Acquisition.qAsofMerge _),
    "q_asof_forward" -> (Acquisition.qAsofForward _),
    "q_asof_nearest" -> (Acquisition.qAsofNearest _),
    "q_asof_window" -> (Acquisition.qAsofWindow _),
    "q_asof_dim_enrich" -> (Acquisition.qAsofDimEnrich _),
    "q_asof_stream_twin" -> (Acquisition.qAsofStreamTwin _),
    "q_range_join" -> (Acquisition.qRangeJoin _),
    "q_completeness" -> (Acquisition.qCompleteness _),
    "q_skew_join_salted" -> (Acquisition.qSkewJoinSalted _),
    "q_acquisition_plan" -> (Acquisition.acquisitionPlan _),
    // Inventory / completeness analytics (E9-E15, E20)
    "q_group_agg" -> (Inventory.qGroupAgg _),
    "q_group_agg_salted" -> (Inventory.qGroupAggSalted _),
    "q_distinct" -> (Inventory.qDistinct _),
    "q_distinct_approx" -> (Inventory.qDistinctApprox _),
    "q_heavy_hitters" -> (Inventory.qHeavyHitters _),
    "q_dq_audit" -> (Inventory.qDqAudit _),
    "q_theta_overlap" -> (Inventory.qThetaOverlap _),
    "q_rollup" -> (Inventory.qRollup _),
    "q_schema_profile" -> (Inventory.qSchemaProfile _),
    "q_cube" -> (Inventory.qCube _),
    "q_grouping_sets" -> (Inventory.qGroupingSets _),
    "q_intersect" -> (Inventory.qIntersect _),
    "q_window_rank" -> (Inventory.qWindowRank _),
    "q_gap_detect" -> (Inventory.qGapDetect _),
    "q_interval_merge" -> (Inventory.qIntervalMerge _),
    "q_topk_per_group" -> (Inventory.qTopkPerGroup _),
    "q_topk_agg" -> (Inventory.qTopkAgg _),
    "q_pivot" -> (Inventory.qPivot _),
    "q_unpivot" -> (Inventory.qUnpivot _),
    "q_percentiles" -> (Inventory.qPercentiles _),
    "q_percentiles_approx" -> (Inventory.qPercentilesApprox _),
    "q_union_except" -> (Inventory.qUnionExcept _),
    "q_filename_inventory" -> (Inventory.qFilenameInventory _),
    // Relational analytics (star schema, windows, funnel, profile)
    "q_star_join" -> (Analytics.qStarJoin _),
    "q_rolling_stats" -> (Analytics.qRollingStats _),
    "q_ntile_cume" -> (Analytics.qNtileCume _),
    "q_funnel" -> (Analytics.qFunnel _),
    "q_funnel_time" -> (Analytics.qFunnelTime _),
    "q_value_histogram" -> (Analytics.qValueHistogram _),
    "q_winsorize" -> (Analytics.qWinsorize _),
    "q_scd2" -> (Analytics.qScd2 _),
    "q_zscore_outliers" -> (Analytics.qZscoreOutliers _),
    "q_rolling_time" -> (Analytics.qRollingTime _),
    "q_full_outer" -> (Analytics.qFullOuter _),
    "q_upsert_compact" -> (Inventory.qUpsertCompact _),
    "q_merge_upsert" -> (Inventory.qMergeUpsert _),
    "q_user_journey" -> (Analytics.qUserJourney _),
    "q_surrogate_key" -> (Packing.qSurrogateKey _),
    "q_corr_group" -> (Analytics.qCorrGroup _),
    "q_mad_outliers" -> (Analytics.qMadOutliers _),
    "q_sessionize" -> (Analytics.qSessionize _),
    "q_session_stats" -> (Analytics.qSessionStats _),
    "q_daily_anomaly" -> (Analytics.qDailyAnomaly _),
    "q_autocorr" -> (Analytics.qAutocorr _),
    "q_retention" -> (Analytics.qRetention _),
    "q_event_transitions" -> (Analytics.qEventTransitions _),
    "q_freshness" -> (Analytics.qFreshness _),
    "q_skew_profile" -> (Analytics.qSkewProfile _),
    // Warehouse-shaped multi-join reports (TPC-H Q1/Q3/Q5 patterns)
    "q_tpch_pricing" -> (Relational.qTpchPricing _),
    "q_tpch_shipping" -> (Relational.qTpchShipping _),
    "q_tpch_volume" -> (Relational.qTpchVolume _),
    "q_brand_sales" -> (Relational.qBrandSales _),
    // Corpus layout (bucketing, packing, sharding, passage dedup)
    "q_length_buckets" -> (Packing.qLengthBuckets _),
    "q_curriculum" -> (Packing.qCurriculum _),
    "q_pack_greedy" -> (Packing.qPackGreedy _),
    "q_shard_assign" -> (Packing.qShardAssign _),
    "q_shard_manifest" -> (Packing.qShardManifest _),
    "q_passage_dedup" -> (Packing.qPassageDedup _),
    "q_chunk_overlap" -> (Packing.qChunkOverlap _),
    "q_zorder_layout" -> (Packing.qZorderLayout _),
    "q_zorder_skipping" -> (Packing.qZorderSkipping _),
    // Time windows (E16-E18)
    "q_tumbling_daily" -> (TimeWindows.qTumblingDaily _),
    "q_sliding_window" -> (TimeWindows.qSlidingWindow _),
    "q_session_window" -> (TimeWindows.qSessionWindow _),
    "q_throttle_events" -> (TimeWindows.qThrottleEvents _),
    // Quality / training-data ops (E21-E23, E25 + north star)
    "q_exact_dedup" -> (Quality.qExactDedup _),
    "q_text_stats" -> (Quality.qTextStats _),
    "q_token_count" -> (Quality.qTokenCount _),
    "q_lang_id" -> (Quality.qLangId _),
    "q_quality_score" -> (Quality.qQualityScore _),
    "q_doc_fingerprint" -> (Quality.qDocFingerprint _),
    "q_minhash_neardup" -> (Quality.qMinhashNeardup _),
    "q_neardup_sweep" -> (Quality.qNeardupSweep _),
    "q_simhash" -> (Quality.qSimhash _),
    "q_ngram_jaccard" -> (Quality.qNgramJaccard _),
    "q_containment" -> (Quality.qContainment _),
    "q_tfidf" -> (Quality.qTfidf _),
    "q_bm25" -> (Quality.qBm25 _),
    "q_normalize_text" -> (Quality.qNormalizeText _),
    "q_bloom_dedup" -> (Quality.qBloomDedup _),
    "q_ngram_counts" -> (Quality.qNgramCounts _),
    "q_bpe_pairs" -> (Quality.qBpePairs _),
    "q_hybrid_rank" -> (Quality.qHybridRank _),
    "q_rbo_overlap" -> (Quality.qRboOverlap _),
    "q_gap_fill" -> (TimeWindows.qGapFill _),
    "q_xml_config" -> (graft.sources.XmlSource.qXmlConfig _),
    "q_dup_rate_by_source" -> (Quality.qDupRateBySource _),
    "q_cross_source_leak" -> (Quality.qCrossSourceLeak _),
    "q_contamination" -> (Quality.qContamination _),
    "q_repetition" -> (Quality.qRepetition _),
    "q_dup_spans" -> (Quality.qDupSpans _),
    "q_dsir_weight" -> (Quality.qDsirWeight _),
    "q_cdc_chunks" -> (Quality.qCdcChunks _),
    "q_anchor_dedup" -> (Quality.qAnchorDedup _),
    "q_minhash_est_err" -> (Quality.qMinhashEstErr _),
    "q_pad_waste" -> (Packing.qPadWaste _),
    "q_small_cells" -> (Quality.qSmallCells _),
    "q_semdedup_sweep" -> (Similarity.qSemdedupSweep _),
    "q_ivf_probe_sweep" -> (Similarity.qIvfProbeSweep _),
    "q_label_prop" -> (Mining.qLabelProp _),
    "q_graph_insights" -> (Mining.qGraphInsights _),
    "q_quality_sweep" -> (Quality.qQualitySweep _),
    "q_tok_efficiency" -> (Quality.qTokEfficiency _),
    "q_curation_funnel" -> (Pipeline.qCurationFunnel _),
    "q_winnowing" -> (Quality.qWinnowing _),
    "q_burstiness" -> (Quality.qBurstiness _),
    "q_vocab_growth" -> (Quality.qVocabGrowth _),
    "q_key_width" -> (Quality.qKeyWidth _),
    "q_detector_agreement" -> (Quality.qDetectorAgreement _),
    "q_band_load" -> (Quality.qBandLoad _),
    "q_cdc_savings" -> (Quality.qCdcSavings _),
    "q_zipf_slope" -> (Quality.qZipfSlope _),
    "q_kl_drift" -> (Quality.qKlDrift _),
    "q_mutual_info" -> (Inventory.qMutualInfo _),
    "q_chi2_test" -> (Inventory.qChi2Test _),
    "q_lsh_planner" -> (Quality.qLshPlanner _),
    "q_decayed_trend" -> (Analytics.qDecayedTrend _),
    "q_cohort_ltv" -> (Analytics.qCohortLtv _),
    "q_path_trigrams" -> (Analytics.qPathTrigrams _),
    "q_region_top_brands" -> (Relational.qRegionTopBrands _),
    "q_temporal_split" -> (Sampling.qTemporalSplit _),
    "q_woe_encode" -> (FeaturePrep.qWoeEncode _),
    "q_pit_rolling" -> (FeaturePrep.qPitRolling _),
    "q_psi_drift" -> (Analytics.qPsiDrift _),
    "q_gini_concentration" -> (Relational.qGiniConcentration _),
    "q_hhi_concentration" -> (Relational.qHhiConcentration _),
    "q_return_hazard" -> (Analytics.qReturnHazard _),
    "q_wau_stickiness" -> (Analytics.qWauStickiness _),
    "q_fd_discovery" -> (Inventory.qFdDiscovery _),
    "q_join_card_est" -> (Inventory.qJoinCardEst _),
    "q_vocab_coverage" -> (Quality.qVocabCoverage _),
    "q_pmi_bigrams" -> (Quality.qPmiBigrams _),
    "q_dedup_clusters" -> (DedupClusters.qDedupClusters _),
    "q_cluster_view" -> (DedupClusters.qClusterView _),
    "q_cluster_stats" -> (DedupClusters.qClusterStats _),
    "q_dedup_keep_best" -> (DedupClusters.qDedupKeepBest _),
    "q_dedup_weight" -> (DedupClusters.qDedupWeight _),
    "q_audio_energy" -> (Multimodal.qAudioEnergy _),
    "q_training_pipeline" -> (Pipeline.qTrainingPipeline _),
    "q_simhash_neardup" -> (Quality.qSimhashNeardup _),
    "q_stratified_sample" -> (Sampling.qStratifiedSample _),
    "q_weighted_sample" -> (Sampling.qWeightedSample _),
    "q_group_sample" -> (Sampling.qGroupSample _),
    "q_data_split" -> (Sampling.qDataSplit _),
    "q_mix_weights" -> (Sampling.qMixWeights _),
    "q_upsample_plan" -> (Sampling.qUpsamplePlan _),
    "q_top_p_select" -> (Sampling.qTopPSelect _),
    "q_boilerplate" -> (Quality.qBoilerplate _),
    "q_quality_gate" -> (Quality.qQualityGate _),
    "q_vocab_drift" -> (Quality.qVocabDrift _),
    "q_ngram_novelty" -> (Quality.qNgramNovelty _),
    "q_eval_overlap" -> (Quality.qEvalOverlap _),
    "q_json_extract" -> (Quality.qJsonExtract _),
    "q_perplexity_proxy" -> (Quality.qPerplexityProxy _),
    "q_incremental_dedup" -> (Quality.qIncrementalDedup _),
    "q_entropy" -> (Quality.qEntropy _),
    "q_redact" -> (Quality.qRedact _),
    // JSON/CSV ingestion surface (R1)
    "q_json_config" -> (graft.sources.JsonSource.qJsonConfig _),
    "q_from_json" -> (graft.sources.JsonSource.qFromJson _),
    "q_map_explode" -> (graft.sources.JsonSource.qMapExplode _),
    "q_csv_config" -> (graft.sources.CsvSource.qCsvConfig _),
    "q_orc_roundtrip" -> (graft.sources.OrcSource.qOrcRoundtrip _),
    "q_text_lines" -> (graft.sources.TextSource.qTextLines _),
    "q_partition_prune" -> (graft.sources.PartitionedSource.qPartitionPrune _),
    // Similarity search (E24 + north star)
    "q_cosine_topk" -> (Similarity.qCosineTopk _),
    "q_ann_ivf" -> (Similarity.qAnnIvf _),
    "q_ann_lsh" -> (Similarity.qAnnLsh _),
    "q_embed_neardup" -> (Similarity.qEmbedNeardup _),
    "q_kmeans_step" -> (Similarity.qKmeansStep _),
    "q_kmeans_train" -> (Similarity.qKmeansTrain _),
    "q_perceptron_train" -> (Classifier.qPerceptronTrain _),
    "q_perceptron_eval" -> (Classifier.qPerceptronEval _),
    "q_perceptron_score" -> (Classifier.qPerceptronScore _),
    "q_pq_codes" -> (Similarity.qPqCodes _),
    "q_pq_search" -> (Similarity.qPqSearch _),
    "q_ann_ivfpq" -> (Similarity.qAnnIvfPq _),
    "q_knn_classify" -> (Similarity.qKnnClassify _),
    "q_embedding_stats" -> (Similarity.qEmbeddingStats _),
    "q_embed_outliers" -> (Similarity.qEmbedOutliers _),
    "q_label_separability" -> (Similarity.qLabelSeparability _),
    "q_rand_project" -> (Similarity.qRandProject _),
    "q_scalar_quant" -> (Similarity.qScalarQuant _),
    "q_mmr_rerank" -> (Similarity.qMmrRerank _),
    "q_hard_negatives" -> (Similarity.qHardNegatives _),
    "q_ann_recall" -> (Similarity.qAnnRecall _),
    "q_ndcg_eval" -> (Similarity.qNdcgEval _),
    "q_ivf_balance" -> (Similarity.qIvfBalance _),
    "q_ivf_margin" -> (Similarity.qIvfMargin _),
    "q_degree_dist" -> (Mining.qDegreeDist _),
    "q_assortativity" -> (Mining.qAssortativity _),
    "q_source_jaccard" -> (Quality.qSourceJaccard _),
    "q_user_entropy" -> (Analytics.qUserEntropy _),
    "q_backfill_chunks" -> (Acquisition.qBackfillChunks _),
    "q_daily_close" -> (Analytics.qDailyClose _),
    // Multimodal binary columns (north star; features = stubbed decode)
    "q_multimodal_meta" -> (Multimodal.qMultimodalMeta _),
    "q_multimodal_features" -> (Multimodal.qMultimodalFeatures _),
    "q_frame_sample" -> (Multimodal.qFrameSample _),
    "q_frame_dedup" -> (Multimodal.qFrameDedup _),
    "q_image_resize" -> (Multimodal.qImageResize _),
    // Pattern mining / entity resolution / CDC / graph centrality
    "q_market_basket" -> (Mining.qMarketBasket _),
    "q_triangles" -> (Mining.qTriangles _),
    "q_fuzzy_join" -> (Mining.qFuzzyJoin _),
    "q_cdc_apply" -> (Mining.qCdcApply _),
    "q_ivm_merge" -> (Mining.qIvmMerge _),
    "q_ewma" -> (Mining.qEwma _),
    "q_pagerank" -> (Mining.qPagerank _),
    "q_khop_reach" -> (Mining.qKhopReach _),
    "q_impute" -> (Mining.qImpute _),
    "q_rfm" -> (Analytics.qRfm _),
    "q_changepoint" -> (Analytics.qChangepoint _),
    "q_pareto" -> (Analytics.qPareto _),
    "q_skyline" -> (Analytics.qSkyline _),
    "q_activity_bitmap" -> (Analytics.qActivityBitmap _),
    "q_attribution" -> (Analytics.qAttribution _),
    "q_seasonal_profile" -> (Analytics.qSeasonalProfile _),
    "q_order_latency" -> (Relational.qOrderLatency _),
    "q_tpch_discount" -> (Relational.qTpchDiscount _),
    "q_tpch_returned" -> (Relational.qTpchReturned _),
    "q_tpch_promo" -> (Relational.qTpchPromo _),
    "q_tpch_small_qty" -> (Relational.qTpchSmallQty _),
    "q_tpch_large_orders" -> (Relational.qTpchLargeOrders _),
    "q_tpch_top_supplier" -> (Relational.qTpchTopSupplier _),
    "q_tpch_disjunct" -> (Relational.qTpchDisjunct _),
    "q_tpch_custdist" -> (Relational.qTpchCustdist _),
    "q_tpch_dormant" -> (Relational.qTpchDormant _),
    "q_tpch_mktshare" -> (Relational.qTpchMktshare _),
    "q_tpch_profit" -> (Relational.qTpchProfit _),
    // Feature preparation for model training
    "q_feature_hash" -> (FeaturePrep.qFeatureHash _),
    "q_onehot" -> (FeaturePrep.qOnehot _),
    "q_minmax_norm" -> (FeaturePrep.qMinmaxNorm _),
    "q_target_encode" -> (FeaturePrep.qTargetEncode _),
    "q_kfold" -> (FeaturePrep.qKfold _),
    "q_class_weights" -> (FeaturePrep.qClassWeights _),
    "q_grid_neighbors" -> (Similarity.qGridNeighbors _),
    "q_grid_neighbor_stats" -> (Similarity.qGridNeighborStats _),
    "q_degree_histogram" -> (Similarity.qDegreeHistogram _),
    "q_cross_corr" -> (Analytics.qCrossCorr _),
    "q_embed_clusters" -> (DedupClusters.qEmbedClusters _),
    "q_dedup_recall" -> (DedupClusters.qDedupRecall _),
    "q_span_corrupt" -> (Packing.qSpanCorrupt _),
    "q_fim_split" -> (Packing.qFimSplit _),
    "q_window_suite" -> (Inventory.qWindowSuite _),
    "q_null_semantics" -> (Inventory.qNullSemantics _),
    "q_benford" -> (Analytics.qBenford _),
    "q_movers" -> (Analytics.qMovers _),
    "q_cumulative_users" -> (Analytics.qCumulativeUsers _),
    "q_epoch_shuffle" -> (Packing.qEpochShuffle _),
    "q_pit_features" -> (Acquisition.qPitFeatures _),
    "q_lateness_audit" -> (TimeWindows.qLatenessAudit _),
    "q_tpch_priority" -> (Relational.qTpchPriority _),
    "q_label_audit" -> (Similarity.qLabelAudit _),
    "q_gnn_aggregate" -> (Similarity.qGnnAggregate _),
    "q_dataset_card" -> (Quality.qDatasetCard _),
    "q_supplier_diversity" -> (Relational.qTpchSupplierDiversity _),
    "q_sql_report" -> (Relational.qSqlReport _),
    "q_drift_bins" -> (Analytics.qDriftBins _),
    "q_tpch_sole_fault" -> (Relational.qTpchSoleFault _),
    "q_lang_confusion" -> (Quality.qLangConfusion _),
    "q_tpch_nation_trade" -> (Relational.qTpchNationTrade _),
    "q_twap" -> (Analytics.qTwap _),
    "q_interval_audit" -> (Inventory.qIntervalAudit _),
    "q_recommend" -> (Mining.qRecommend _),
    "q_interleave" -> (Packing.qInterleave _),
    "q_readability" -> (Quality.qReadability _),
    "q_bigram_lm" -> (Quality.qBigramLm _),
    "q_ab_test" -> (Analytics.qAbTest _),
    "q_rag_chunks" -> (Packing.qRagChunks _),
    "q_batch_buckets" -> (Packing.qBatchBuckets _),
    "q_compaction_plan" -> (Inventory.qCompactionPlan _),
    "q_compaction_nfd" -> (Inventory.qCompactionNfd _),
    "q_ks_test" -> (Quality.qKsTest _),
    "q_merge_stats" -> (Quality.qMergeStats _),
    "q_binary_ingest" -> (Multimodal.qBinaryIngest _),
    "q_mannwhitney" -> (Quality.qMannWhitney _),
    "q_bootstrap_ci" -> (Quality.qBootstrapCi _),
    "q_spearman" -> (Analytics.qSpearman _),
    "q_bpe_merge" -> (Quality.qBpeMerge _),
    "q_bpe_train3" -> (Quality.qBpeTrain3 _),
    "q_bpe_encode" -> (Quality.qBpeEncode _),
    "q_js_divergence" -> (Quality.qJsDivergence _),
    "q_line_dedup" -> (Quality.qLineDedup _),
    "q_snapshot_diff" -> (Quality.qSnapshotDiff _),
  )

  /** DuckDB-equivalent SQL per query (driver correctness gate).
    * Conventions: CAST(ts AS TIMESTAMP) truncates the nanosecond
    * events timestamps to microseconds exactly as our reader does;
    * double aggregates go through DECIMAL(18,6) sums on both sides;
    * every query ends in a total ORDER BY. */
  def oracleSql: Map[String, String] =
    // q_cluster_view reads the landed cluster artifact back through the
    // registered SQL view — its oracle IS q_dedup_clusters's (the view
    // must equal the derivation)
    oracleBase + ("q_cluster_view" -> oracleBase("q_dedup_clusters"))

  private def oracleBase: Map[String, String] = Map(
    "q_cross_dims" ->
      """SELECT r_name, n_name, location, channel
        |FROM region CROSS JOIN nation
        |CROSS JOIN (VALUES ('00'), ('10')) l(location)
        |CROSS JOIN (VALUES ('HHZ'), ('HHN'), ('HHE')) c(channel)
        |ORDER BY r_name, n_name, location, channel""".stripMargin,

    "q_chunk_explode" ->
      """SELECT day + hh * INTERVAL 1 HOUR AS chunk_start
        |FROM (SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events)
        |CROSS JOIN range(24) t(hh)
        |ORDER BY chunk_start""".stripMargin,

    "q_buffered_bounds" ->
      """SELECT event_id,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS chunk_start,
        |  GREATEST(date_trunc('day', CAST(ts AS TIMESTAMP)),
        |           date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 120 SECOND) AS query_start,
        |  LEAST(date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY,
        |        date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 62 MINUTE) AS query_end
        |FROM events ORDER BY event_id""".stripMargin,

    "q_key_projection" ->
      """WITH f AS (
        |  SELECT event_id,
        |    'OX.STA' || user_id || '.' || event_id || '.' || event_type || '.'
        |      || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.mseed' AS filename
        |  FROM events)
        |SELECT event_id, filename,
        |  string_split(filename, '.')[2] AS station_parsed,
        |  string_split(filename, '.')[4] AS channel_parsed,
        |  substr(string_split(filename, '.')[5], 1, 8) AS date_part,
        |  substr(string_split(filename, '.')[5], 1, 8) || '/' || filename AS s3_key
        |FROM f ORDER BY event_id""".stripMargin,

    "q_lookup_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_lookup_misses" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |                  WHERE c_custkey = o_custkey AND c_nationkey < 10)
        |ORDER BY o_orderkey""".stripMargin,

    "q_anti_dedup" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_semi_present" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // Tolerance-bounded as-of (custom operator, 8400-day floor —
    // fixture-calibrated to split matches into kept and expired): the
    // oracle expresses the floor as a second range predicate; the
    // engine applies it as an emit-time comparison in the same plan.
    "q_asof_window" ->
      """SELECT event_id, ts, asof_order, asof_date FROM (
        |  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |    o.o_orderkey AS asof_order, o.o_orderdate AS asof_date,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id
        |    AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        |    AND o.o_orderdate >= CAST(e.ts AS TIMESTAMP) - INTERVAL 8400 DAY)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // Nearest as-of: per order, the customer's closest shipment in
    // absolute µs distance; ties to backward, then the directional
    // tiebreak (max backward / min forward) via CASE-flipped ranking.
    "q_asof_nearest" ->
      """SELECT o_orderkey, ship_order, ship_line, ship_date FROM (
        |  SELECT o.o_orderkey, s.l_orderkey AS ship_order,
        |    CAST(s.l_linenumber AS BIGINT) AS ship_line,
        |    CAST(s.st AS TIMESTAMP) AS ship_date,
        |    row_number() OVER (PARTITION BY o.o_orderkey ORDER BY
        |      abs(epoch_us(CAST(s.st AS TIMESTAMP))
        |          - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))) ASC,
        |      CASE WHEN CAST(s.st AS TIMESTAMP) <= CAST(o.o_orderdate AS TIMESTAMP)
        |        THEN 0 ELSE 1 END ASC,
        |      CASE WHEN CAST(s.st AS TIMESTAMP) <= CAST(o.o_orderdate AS TIMESTAMP)
        |        THEN -s.l_orderkey ELSE s.l_orderkey END ASC,
        |      CASE WHEN CAST(s.st AS TIMESTAMP) <= CAST(o.o_orderdate AS TIMESTAMP)
        |        THEN -s.l_linenumber ELSE s.l_linenumber END ASC) AS rn
        |  FROM orders o JOIN (
        |    SELECT o2.o_custkey AS ck, l.l_shipdate AS st,
        |      l.l_orderkey, l.l_linenumber
        |    FROM lineitem l JOIN orders o2 ON o2.o_orderkey = l.l_orderkey) s
        |    ON s.ck = o.o_custkey)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    // Forward as-of: per order, the customer's first event at-or-after
    // the order date; smallest (ts, event_id) wins ties.
    "q_asof_forward" ->
      """SELECT o_orderkey, next_event, next_ts FROM (
        |  SELECT o.o_orderkey, e.event_id AS next_event,
        |    CAST(e.ts AS TIMESTAMP) AS next_ts,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY CAST(e.ts AS TIMESTAMP) ASC, e.event_id ASC) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey
        |    AND CAST(e.ts AS TIMESTAMP) >= CAST(o.o_orderdate AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    // q_asof_merge pins the broadcast hint OFF so the co-partitioned
    // sort-merge exec is oracle-verified too (stats would always pick
    // broadcast at testdata scale); same SQL as q_asof_latest.
    "q_asof_merge" ->
      """SELECT event_id, ts, asof_order, asof_date FROM (
        |  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |    o.o_orderkey AS asof_order, o.o_orderdate AS asof_date,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // q_asof_native shares this oracle verbatim: same semantics, planned
    // through the custom AsOfJoinExec instead of union-and-carry.
    "q_asof_native" ->
      """SELECT event_id, ts, asof_order, asof_date FROM (
        |  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |    o.o_orderkey AS asof_order, o.o_orderdate AS asof_date,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_asof_latest" ->
      """SELECT event_id, ts, asof_order, asof_date FROM (
        |  SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |    o.o_orderkey AS asof_order, o.o_orderdate AS asof_date,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // Temporal-dim (SCD2) enrichment: the dim is each event type's
    // above-average-traffic days (integer cross-multiply so the set is
    // SF-relative); each event carries the latest qualifying day
    // at-or-before its ts.
    "q_asof_dim_enrich" ->
      """WITH dim AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS eff_from,
        |    count(*) AS n_day
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(n_day) AS total, count(*) AS n_days
        |  FROM dim GROUP BY 1),
        |hot AS (
        |  SELECT d.event_type, d.eff_from, d.n_day
        |  FROM dim d JOIN tot t ON d.event_type = t.event_type
        |  WHERE d.n_day * t.n_days > t.total),
        |r AS (
        |  SELECT e.event_id, h.eff_from, h.n_day,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY h.eff_from DESC) AS rn
        |  FROM events e JOIN hot h
        |    ON h.event_type = e.event_type
        |    AND h.eff_from <= CAST(e.ts AS TIMESTAMP))
        |SELECT event_id, eff_from, CAST(n_day AS BIGINT) AS dim_n_day
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // Stream-stream as-of batch twin: union-and-carry formulation —
    // at equal ts rights sort before lefts (inclusive <=) and equal-ts
    // rights sort by id asc so the larger id is carried last (the
    // processor's (ts, id) tiebreak).
    "q_asof_stream_twin" ->
      """WITH l AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, ts, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, ts, 1 AS side, event_id, NULL::BIGINT AS rid,
        |    NULL::STRUCT(rid BIGINT, rts TIMESTAMP, rval DOUBLE) AS rrow
        |  FROM l
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, event_id,
        |    struct_pack(rid := event_id, rts := ts, rval := value) FROM r),
        |c AS (
        |  SELECT user_id, ts, side, event_id,
        |    last_value(rrow IGNORE NULLS) OVER w AS rr
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, side, coalesce(rid, event_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id AS key, event_id AS left_id, epoch_ms(ts) AS left_ms,
        |  rr.rid AS right_id, epoch_ms(rr.rts) AS right_ms,
        |  rr.rval AS right_value
        |FROM c WHERE side = 1 ORDER BY key, left_id""".stripMargin,

    // Expected grid = distinct channels × distinct days; missing slots
    // surface as n_landed = 0 rows, never as absent rows.
    "q_completeness" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
        |  FROM events),
        |ded AS (SELECT DISTINCT event_type, day, hr FROM e),
        |landed AS (
        |  SELECT event_type, day, count(*) AS n_landed FROM ded GROUP BY event_type, day),
        |grid AS (
        |  SELECT t.event_type, dd.day
        |  FROM (SELECT DISTINCT event_type FROM e) t
        |  CROSS JOIN (SELECT DISTINCT day FROM e) dd)
        |SELECT g.event_type, g.day,
        |  coalesce(l.n_landed, 0) AS n_landed,
        |  CAST(24 AS BIGINT) AS n_expected,
        |  24 - coalesce(l.n_landed, 0) AS n_missing
        |FROM grid g LEFT JOIN landed l
        |  ON g.event_type = l.event_type AND g.day = l.day
        |ORDER BY g.event_type, g.day""".stripMargin,

    "q_range_join" ->
      """SELECT e.event_id, count(p.event_id) AS n_prior,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_prior_value
        |FROM events e LEFT JOIN events p
        |  ON p.user_id = e.user_id
        | AND CAST(p.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 24 HOUR
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "q_skew_join_salted" ->
      """SELECT event_id, user_id, c_name, value
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "q_group_agg" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q_group_agg_salted" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",

    "q_schema_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c1n,
        |    count(DISTINCT event_id) AS c1d,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c2n,
        |    count(DISTINCT user_id) AS c2d,
        |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c3n,
        |    count(DISTINCT event_type) AS c3d,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c4n,
        |    count(DISTINCT value) AS c4d,
        |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c5n,
        |    count(DISTINCT props) AS c5d
        |  FROM events)
        |SELECT col_name, n_nulls, n_distinct, n_rows FROM (
        |  SELECT 'event_id' AS col_name, c1n AS n_nulls, c1d AS n_distinct, n_rows FROM a
        |  UNION ALL SELECT 'user_id', c2n, c2d, n_rows FROM a
        |  UNION ALL SELECT 'event_type', c3n, c3d, n_rows FROM a
        |  UNION ALL SELECT 'value', c4n, c4d, n_rows FROM a
        |  UNION ALL SELECT 'props', c5n, c5d, n_rows FROM a)
        |ORDER BY col_name""".stripMargin,

    "q_rollup" ->
      """SELECT GROUPING(o_year, o_month) AS gid, o_year, o_month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |        o_totalprice FROM orders)
        |GROUP BY ROLLUP(o_year, o_month)
        |ORDER BY gid, o_year NULLS FIRST, o_month NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT GROUPING(o_year, o_month) AS gid, o_year, o_month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |        o_totalprice FROM orders)
        |GROUP BY CUBE(o_year, o_month)
        |ORDER BY gid, o_year NULLS FIRST, o_month NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "q_gap_detect" ->
      """SELECT user_id, event_id, prev_ts, ts, gap_us FROM (
        |  SELECT user_id, event_id,
        |    lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |WHERE gap_us > 300000000 ORDER BY user_id, event_id""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS iv_end
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts, iv_end,
        |    CASE WHEN max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR ts > max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM iv),
        |islands AS (
        |  SELECT user_id, ts, iv_end,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flags)
        |SELECT user_id, min(ts) AS merged_start, max(iv_end) AS merged_end,
        |  count(*) AS n_chunks
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, merged_start""".stripMargin,

    "q_topk_per_group" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,

    "q_topk_agg" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """WITH w AS (
        |  SELECT user_id,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, event_type, n FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n FROM w
        |  UNION ALL SELECT user_id, 'error', error FROM w
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM w
        |  UNION ALL SELECT user_id, 'signup', signup FROM w
        |  UNION ALL SELECT user_id, 'view', view FROM w)
        |ORDER BY user_id, event_type""".stripMargin,

    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS med,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Sketch queries: the oracle states the exact companions and TRUE
    // for the in-bound booleans — the sketch side is computed only by
    // the engine, so a sketch regression flips a boolean and fails the
    // hash without requiring DuckDB to reproduce the sketch itself.
    "q_percentiles_approx" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS med_exact,
        |  round(quantile_cont(value, 0.95), 4) AS p95_exact,
        |  round(quantile_cont(value, 0.99), 4) AS p99_exact,
        |  TRUE AS med_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_dq_audit" ->
      """SELECT check_name, target, n_total, n_bad, n_bad = 0 AS ok FROM (
        |  SELECT 'not_null_events_user' AS check_name, 'events' AS target,
        |    (SELECT count(*) FROM events) AS n_total,
        |    (SELECT count(*) FROM events WHERE user_id IS NULL) AS n_bad
        |  UNION ALL
        |  SELECT 'not_null_events_value', 'events',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(*) FROM events WHERE value IS NULL)
        |  UNION ALL
        |  SELECT 'range_events_ts', 'events',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(*) FROM events WHERE ts IS NULL
        |       OR CAST(ts AS TIMESTAMP) < TIMESTAMP '1990-01-01'
        |       OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2030-01-01')
        |  UNION ALL
        |  SELECT 'range_lineitem_quantity', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
        |  UNION ALL
        |  SELECT 'range_lineitem_price', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
        |  UNION ALL
        |  SELECT 'pk_orders_unique', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL
        |  SELECT 'range_orders_totalprice', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', 'lineitem',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
        |       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'fk_orders_customer', 'orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders r WHERE NOT EXISTS (
        |       SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey))
        |) t ORDER BY check_name""".stripMargin,

    // Theta-sketch set intersection: exact pairwise distinct-user
    // overlap + TRUE where the engine asserts the estimate band.
    "q_theta_overlap" ->
      """WITH ut AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS exact_overlap, TRUE AS est_ok
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Sketch-oracle pattern: exact top-10 counts + literal TRUE where
    // the engine asserts the count-min guarantees (est ≥ exact, and
    // est ≤ exact + ⌈e·N/width⌉ under the fixed seed).
    "q_heavy_hitters" ->
      """SELECT user_id, count(*) AS exact_n,
        |  TRUE AS est_ge_ok, TRUE AS est_band_ok
        |FROM events GROUP BY user_id
        |ORDER BY exact_n DESC, user_id LIMIT 10""".stripMargin,

    "q_distinct_approx" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  count(DISTINCT value) AS exact_values,
        |  TRUE AS users_ok, TRUE AS values_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_union_except" ->
      """(SELECT o_orderkey, 'live' AS status FROM orders WHERE o_orderstatus <> 'F'
        | UNION ALL
        | SELECT o_orderkey, 'dead' AS status FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_orderkey, 'live' AS status FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY o_orderkey, status""".stripMargin,

    "q_filename_inventory" ->
      """WITH f AS (
        |  SELECT event_id,
        |    'OX.STA' || user_id || '.' || event_id || '.' || event_type || '.'
        |      || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.mseed' AS filename
        |  FROM events)
        |SELECT event_id,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 1) AS network,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 2) AS station,
        |  regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 4) AS channel,
        |  substr(regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 5), 1, 8) AS date_part,
        |  substr(regexp_extract(filename, '^([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.([^.]+)\.mseed$', 5), 1, 8) || '/' || filename AS s3_key
        |FROM f ORDER BY event_id""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_rolling_stats" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  count(*) OVER w AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_sum,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS roll_avg,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_ntile_cume" ->
      """SELECT event_type, event_id, value,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS first_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS first_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.first_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.first_click GROUP BY e.user_id)
        |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
        |  CASE WHEN p.first_purchase IS NOT NULL THEN 'purchase'
        |       WHEN c.first_click IS NOT NULL THEN 'click'
        |       ELSE 'view' END AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    max(us) - min(us) AS duration_us
        |  FROM s GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) FILTER (n_events = 1) AS n_single_event,
        |  quantile_disc(n_events, 0.5) AS median_events,
        |  quantile_disc(duration_us, 0.5) AS median_duration_us,
        |  max(duration_us) AS max_duration_us
        |FROM sess""".stripMargin,

    "q_freshness" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |wm AS (SELECT max(ts) AS watermark FROM e)
        |SELECT event_type, count(*) AS n_events, max(ts) AS last_seen,
        |  epoch_us(wm.watermark) - epoch_us(max(ts)) AS staleness_us
        |FROM e CROSS JOIN wm
        |GROUP BY event_type, wm.watermark ORDER BY event_type""".stripMargin,

    "q_skew_profile" ->
      """WITH c AS (
        |  SELECT user_id AS key, count(*) AS n FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT key, n, round(n / CAST(n_total AS DOUBLE), 6) AS share
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, key LIMIT 10""".stripMargin,

    "q_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS first_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS first_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.first_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.first_click GROUP BY e.user_id),
        |deltas AS (
        |  SELECT 'view_to_click' AS transition,
        |    epoch_us(c.first_click) - epoch_us(v.first_view) AS delta_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS transition,
        |    epoch_us(p.first_purchase) - epoch_us(c.first_click) AS delta_us
        |  FROM c JOIN p ON c.user_id = p.user_id)
        |SELECT transition, count(*) AS n_converted,
        |  min(delta_us) AS min_us,
        |  quantile_disc(delta_us, 0.5) AS median_us,
        |  max(delta_us) AS max_us
        |FROM deltas GROUP BY transition ORDER BY transition""".stripMargin,

    "q_value_histogram" ->
      """WITH b AS (
        |  SELECT event_type,
        |    LEAST(CAST(floor(value / CAST(25.0 AS DOUBLE)) AS BIGINT), 19) AS bin
        |  FROM events)
        |SELECT event_type, bin, bin * CAST(25.0 AS DOUBLE) AS bin_lo,
        |  (bin + 1) * CAST(25.0 AS DOUBLE) AS bin_hi, count(*) AS n
        |FROM b GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin,

    "q_winsorize" ->
      """WITH pct AS (
        |  SELECT event_type, round(quantile_cont(value, 0.05), 4) AS p05,
        |    round(quantile_cont(value, 0.95), 4) AS p95
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, e.event_id, e.value, p.p05, p.p95,
        |  greatest(least(e.value, p.p95), p.p05) AS winsorized
        |FROM events e JOIN pct p ON e.event_type = p.event_type
        |ORDER BY e.event_type, e.event_id""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS valid_from,
        |  lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
        |  row_number() OVER w AS version,
        |  lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT len(string_split_regex(text, '\s+')) AS n_tokens FROM documents)
        |SELECT CAST(length(bin(n_tokens)) AS BIGINT) AS bucket, count(*) AS n_docs,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_pack_greedy" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT shard, doc_id, n_tokens, cum_before // 512 AS bin_id,
        |  cum_before - (cum_before // 512) * 512 AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_curriculum" ->
      """WITH th AS (
        |  SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS c1,
        |         percentile_disc(0.50) WITHIN GROUP (ORDER BY n_chars) AS c2,
        |         percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS c3
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(CASE WHEN n_chars <= c1 THEN 0 WHEN n_chars <= c2 THEN 1
        |            WHEN n_chars <= c3 THEN 2 ELSE 3 END AS BIGINT) AS phase,
        |  md5('curr:' || doc_id) AS order_key
        |FROM documents, th ORDER BY doc_id""".stripMargin,

    "q_shard_assign" ->
      """WITH t AS (
        |  SELECT substr(md5('shard:' || doc_id), 1, 1) AS shard, doc_id, n_chars
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,

    "q_shard_manifest" ->
      """WITH t AS (
        |  SELECT substr(md5('shard:' || doc_id), 1, 1) AS shard, n_chars,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |                     substr(md5(text), i, 1)) - 1)
        |                   * pow(16.0, 13 - i) for i in range(1, 14)])
        |      AS BIGINT) AS h52
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  bit_xor(h52) AS content_checksum
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,

    "q_passage_dedup" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |ch AS (
        |  SELECT doc_id, s.ci, s.ch FROM (
        |    SELECT doc_id,
        |      unnest([{'ci': i, 'ch': array_to_string(tk[10*i+1:10*i+10], ' ')}
        |              for i in range(0, (len(tk)+9)//10)]) AS s
        |    FROM tkt)),
        |fl AS (
        |  SELECT doc_id, ci, row_number() OVER (PARTITION BY ch ORDER BY doc_id, ci) AS rn
        |  FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE), 4) AS kept_ratio
        |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // PQ assignment: ||a-b||^2 expanded as (daa - 2*dab) + dbb with
    // each dot the vec_dot ≡ list_sum left-fold (bit-identical IEEE
    // doubles on both engines); ties to the lower centroid id.
    "q_pq_codes" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, m, e[1 + m * 16:(m + 1) * 16] AS s
        |  FROM v CROSS JOIN range(4) t(m)),
        |a AS (SELECT vec_id, m, s, list_sum([x * x for x in s]) AS daa FROM sv),
        |c AS (SELECT vec_id AS centroid_id, m, s, list_sum([x * x for x in s]) AS dbb
        |      FROM sv WHERE vec_id < 8),
        |p AS (
        |  SELECT a.vec_id, a.m, c.centroid_id,
        |    (a.daa - 2 * list_sum([a.s[i] * c.s[i]
        |       for i in range(1, len(a.s) + 1)])) + c.dbb AS d2
        |  FROM a JOIN c ON a.m = c.m),
        |r AS (
        |  SELECT vec_id, m, centroid_id,
        |    row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY d2, centroid_id) AS rn
        |  FROM p)
        |SELECT vec_id, m AS subspace, centroid_id AS code
        |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin,

    // Composed IVF-PQ: the q_ann_ivf assignment CTEs restrict
    // candidates to the probe's cosine cluster, the q_pq_search CTEs
    // score them from codes via ADC with the fixed pivot fold.
    "q_ann_ivfpq" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |pr AS (SELECT vec_id AS probe_id, cluster FROM asg WHERE vec_id < 5),
        |cand AS (
        |  SELECT pr.probe_id, pr.cluster, asg.vec_id
        |  FROM pr JOIN asg ON pr.cluster = asg.cluster
        |    AND asg.vec_id <> pr.probe_id),
        |sv AS (
        |  SELECT vec_id, m, e[1 + m * 16:(m + 1) * 16] AS s
        |  FROM v CROSS JOIN range(4) t(m)),
        |a2 AS (SELECT vec_id, m, s, list_sum([x * x for x in s]) AS daa FROM sv),
        |c2 AS (SELECT vec_id AS centroid_id, m, s, list_sum([x * x for x in s]) AS dbb
        |       FROM sv WHERE vec_id < 8),
        |codes AS (
        |  SELECT vec_id, m, centroid_id AS code FROM (
        |    SELECT a2.vec_id, a2.m, c2.centroid_id,
        |      row_number() OVER (PARTITION BY a2.vec_id, a2.m ORDER BY
        |        (a2.daa - 2 * list_sum([a2.s[i] * c2.s[i]
        |           for i in range(1, len(a2.s) + 1)])) + c2.dbb,
        |        c2.centroid_id) AS rn
        |    FROM a2 JOIN c2 ON a2.m = c2.m) WHERE rn = 1),
        |tbl AS (
        |  SELECT a2.vec_id AS probe_id, a2.m, c2.centroid_id,
        |    (a2.daa - 2 * list_sum([a2.s[i] * c2.s[i]
        |       for i in range(1, len(a2.s) + 1)])) + c2.dbb AS pd2
        |  FROM a2 JOIN c2 ON a2.m = c2.m WHERE a2.vec_id < 5),
        |sc AS (
        |  SELECT cd.probe_id, cd.cluster, g.vec_id,
        |    min(CASE WHEN g.m = 0 THEN t.pd2 END) AS d0,
        |    min(CASE WHEN g.m = 1 THEN t.pd2 END) AS d1,
        |    min(CASE WHEN g.m = 2 THEN t.pd2 END) AS d2,
        |    min(CASE WHEN g.m = 3 THEN t.pd2 END) AS d3
        |  FROM cand cd
        |    JOIN codes g ON g.vec_id = cd.vec_id
        |    JOIN tbl t ON t.m = g.m AND t.centroid_id = g.code
        |      AND t.probe_id = cd.probe_id
        |  GROUP BY cd.probe_id, cd.cluster, g.vec_id),
        |r AS (
        |  SELECT probe_id, cluster, vec_id, d0 + d1 + d2 + d3 AS ad2,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY d0 + d1 + d2 + d3, vec_id) AS rn
        |  FROM sc)
        |SELECT probe_id, cluster, vec_id, round(ad2, 4) AS approx_d2, rn
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,

    // ADC search: per-probe sub-distance table joined on the stored
    // codes; the distance is the FIXED fold ((d0+d1)+d2)+d3 after a
    // CASE pivot, so partial-aggregation order can't re-associate it.
    "q_pq_search" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, m, e[1 + m * 16:(m + 1) * 16] AS s
        |  FROM v CROSS JOIN range(4) t(m)),
        |a AS (SELECT vec_id, m, s, list_sum([x * x for x in s]) AS daa FROM sv),
        |c AS (SELECT vec_id AS centroid_id, m, s, list_sum([x * x for x in s]) AS dbb
        |      FROM sv WHERE vec_id < 8),
        |asg AS (
        |  SELECT vec_id, m, centroid_id AS code FROM (
        |    SELECT a.vec_id, a.m, c.centroid_id,
        |      row_number() OVER (PARTITION BY a.vec_id, a.m ORDER BY
        |        (a.daa - 2 * list_sum([a.s[i] * c.s[i]
        |           for i in range(1, len(a.s) + 1)])) + c.dbb,
        |        c.centroid_id) AS rn
        |    FROM a JOIN c ON a.m = c.m) WHERE rn = 1),
        |tbl AS (
        |  SELECT a.vec_id AS probe_id, a.m, c.centroid_id,
        |    (a.daa - 2 * list_sum([a.s[i] * c.s[i]
        |       for i in range(1, len(a.s) + 1)])) + c.dbb AS pd2
        |  FROM a JOIN c ON a.m = c.m WHERE a.vec_id < 5),
        |sc AS (
        |  SELECT t.probe_id, g.vec_id,
        |    min(CASE WHEN g.m = 0 THEN t.pd2 END) AS d0,
        |    min(CASE WHEN g.m = 1 THEN t.pd2 END) AS d1,
        |    min(CASE WHEN g.m = 2 THEN t.pd2 END) AS d2,
        |    min(CASE WHEN g.m = 3 THEN t.pd2 END) AS d3
        |  FROM asg g JOIN tbl t ON t.m = g.m AND t.centroid_id = g.code
        |  WHERE g.vec_id <> t.probe_id
        |  GROUP BY t.probe_id, g.vec_id),
        |r AS (
        |  SELECT probe_id, vec_id, d0 + d1 + d2 + d3 AS ad2,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY d0 + d1 + d2 + d3, vec_id) AS rn
        |  FROM sc)
        |SELECT probe_id, vec_id, round(ad2, 4) AS approx_d2, rn
        |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    "q_kmeans_step" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, eb, cluster FROM (
        |    SELECT b.vec_id, b.e AS eb, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |x AS (
        |  SELECT cluster, s.dim, s.x FROM (
        |    SELECT cluster,
        |      unnest([{'dim': i, 'x': eb[i + 1]} for i in range(0, len(eb))]) AS s
        |    FROM asg))
        |SELECT cluster, CAST(dim AS BIGINT) AS dim, count(*) AS n_members,
        |  CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS centroid_sum
        |FROM x GROUP BY cluster, dim ORDER BY cluster, dim""".stripMargin,

    "q_csv_config" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_xml_config" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS n
        |  FROM events GROUP BY event_type, day_us),
        |b AS (SELECT min(day_us) AS d0, max(day_us) AS d1 FROM daily),
        |obs AS (
        |  SELECT event_type, day_us, n FROM daily, b
        |  WHERE ((day_us - d0) // 86400000000) % 3 = 0),
        |grid AS (
        |  SELECT t.event_type, g.day_us, b.d0
        |  FROM (SELECT DISTINCT event_type FROM daily) t, b,
        |    (SELECT unnest(range(d0, d1 + 1, 86400000000)) AS day_us FROM b) g),
        |j AS (
        |  SELECT g.event_type, g.day_us, o.n, (g.day_us - g.d0) // 86400000000 AS di
        |  FROM grid g LEFT JOIN obs o USING (event_type, day_us)),
        |w AS (
        |  SELECT *,
        |    last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
        |    last_value(CASE WHEN n IS NOT NULL THEN di END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pdi,
        |    first_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day_us
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn,
        |    first_value(CASE WHEN n IS NOT NULL THEN di END IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY day_us
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ndi
        |  FROM j)
        |SELECT event_type, day_us,
        |  CAST(CASE WHEN n IS NOT NULL THEN n
        |            WHEN pn IS NULL THEN nn
        |            WHEN nn IS NULL THEN pn
        |            ELSE (pn * (ndi - di) + nn * (di - pdi)) // (ndi - pdi)
        |       END AS BIGINT) AS n_filled,
        |  CASE WHEN n IS NOT NULL THEN 'obs'
        |       WHEN pn IS NULL OR nn IS NULL THEN 'edge'
        |       ELSE 'interp' END AS src
        |FROM w ORDER BY event_type, day_us""".stripMargin,

    "q_merge_upsert" ->
      """WITH changed AS (
        |  SELECT * FROM orders WHERE o_orderkey % 7 = 0),
        |u AS (
        |  SELECT o_orderkey AS k, 'U' AS status, o_totalprice + 1000.0 AS price
        |  FROM changed
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, 'I' AS status, o_totalprice AS price
        |  FROM changed),
        |b AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
        |  FROM orders)
        |SELECT COALESCE(b.k, u.k) AS o_orderkey,
        |  COALESCE(u.status, b.status) AS status,
        |  COALESCE(u.price, b.price) AS price,
        |  CASE WHEN b.k IS NULL THEN 'insert'
        |       WHEN u.k IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM b FULL OUTER JOIN u ON b.k = u.k
        |ORDER BY o_orderkey""".stripMargin,

    "q_brand_sales" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_redact" ->
      """SELECT event_id,
        |  len(regexp_extract_all(props, '[0-9]+')) AS n_redacted,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted
        |FROM events ORDER BY event_id""".stripMargin,

    "q_user_journey" ->
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, '>'
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS journey
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT GROUPING(o_year) AS gy, GROUPING(o_priority) AS gp,
        |  o_year, o_priority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM (SELECT year(o_orderdate) AS o_year,
        |        o_orderpriority AS o_priority, o_totalprice FROM orders)
        |GROUP BY GROUPING SETS ((o_year, o_priority), (o_year), (o_priority))
        |ORDER BY gy, gp, o_year NULLS FIRST, o_priority NULLS FIRST""".stripMargin,

    "q_intersect" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus <> 'F'
        |INTERSECT
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin,

    "q_map_explode" ->
      """SELECT 'k' AS key, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_val,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_val,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_val
        |FROM events
        |WHERE props IS NOT NULL
        |  AND json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY key""".stripMargin,

    "q_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |w AS (
        |  SELECT doc_id, tk,
        |    unnest(range(0, GREATEST(0,
        |      CAST(ceil((len(tk) - 10) / 5.0) AS INT)) + 1)) AS win_id
        |  FROM t)
        |SELECT doc_id, win_id,
        |  len(tk[win_id * 5 + 1 : win_id * 5 + 10]) AS n_tokens,
        |  array_to_string(tk[win_id * 5 + 1 : win_id * 5 + 10], ' ') AS chunk
        |FROM w ORDER BY doc_id, win_id""".stripMargin,

    "q_text_lines" ->
      """SELECT doc_id, length(text) AS n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_partition_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_shipping" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, o_orderkey
        |LIMIT 10""".stripMargin,

    "q_tpch_volume" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_corr_group" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
        |  round((sxy - sx * sy / n)
        |    / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |wm AS (
        |  SELECT e.event_type, e.event_id, e.value, m.med
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM wm GROUP BY event_type)
        |SELECT w.event_type, w.event_id, w.value,
        |  round(w.med, 4) AS med, round(d.mad, 4) AS mad
        |FROM wm w JOIN mad d ON w.event_type = d.event_type
        |WHERE abs(w.value - w.med) > 3 * d.mad
        |ORDER BY w.event_type, w.event_id""".stripMargin,

    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  count(*) AS n_transitions
        |FROM s WHERE next_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,

    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |  FROM events),
        |coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
        |SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_k,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM act a JOIN coh c ON a.user_id = c.user_id
        |WHERE datediff('day', c.cohort_day, a.day) <= 7
        |GROUP BY c.cohort_day, day_k
        |ORDER BY c.cohort_day, day_k""".stripMargin,

    // Lag-k autocorrelation moments at calendar lags 1 and 7: the
    // checked surface is exact integer sums only (r is one closed-form
    // consumer step) — no division/sqrt crosses the hash. DuckDB sums
    // integers into HUGEINT; CAST back to BIGINT for schema parity.
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT x.event_type, l.lag_days, x.n AS x, y.n AS y
        |  FROM daily x
        |  CROSS JOIN (SELECT * FROM (VALUES (1), (7)) AS t(lag_days)) l
        |  JOIN daily y ON y.event_type = x.event_type
        |    AND y.day_us = x.day_us + l.lag_days * 86400000000)
        |SELECT event_type, CAST(lag_days AS BIGINT) AS lag_days,
        |  count(*) AS n_pairs,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(y * y) AS BIGINT) AS syy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy
        |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // 2σ day-volume outliers; same exact-decimal moment discipline as
    // q_zscore_outliers (squared-distance form avoids a sqrt).
    "q_daily_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT count(*) AS n_days,
        |    sum(CAST(n_events AS DECIMAL(18,6))) AS s1,
        |    sum(CAST(n_events * n_events AS DECIMAL(28,6))) AS s2
        |  FROM daily),
        |sc AS (
        |  SELECT day, n_events,
        |    CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |    CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) AS variance
        |  FROM daily CROSS JOIN st)
        |SELECT day, n_events, round(mean, 4) AS mean_daily,
        |  round(variance, 4) AS var_daily
        |FROM sc
        |WHERE (CAST(n_events AS DOUBLE) - mean) * (CAST(n_events AS DOUBLE) - mean)
        |      > 4.0e0 * variance
        |ORDER BY day""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  max(us) - min(us) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, n_chars,
        |    unnest([substring(text, i, 1)
        |            for i in range(1, CAST(length(text) AS INT) + 1)]) AS ch
        |  FROM documents),
        |cc AS (
        |  SELECT doc_id, n_chars, ch, count(*) AS c
        |  FROM chars GROUP BY doc_id, n_chars, ch)
        |SELECT doc_id, n_chars, count(*) AS n_distinct_chars,
        |  - CAST(sum(CAST((c / n_chars) * ln(c / n_chars) AS DECIMAL(18,12))) AS DOUBLE)
        |    AS entropy
        |FROM cc GROUP BY doc_id, n_chars ORDER BY doc_id""".stripMargin,

    "q_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
        |  date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY AS w_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start""".stripMargin,

    "q_sliding_window" ->
      """WITH g AS (
        |  SELECT TIMESTAMP '1970-01-01'
        |    + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 * INTERVAL 1 SECOND
        |    - k * INTERVAL 30 MINUTE AS w_start
        |  FROM events CROSS JOIN range(2) t(k))
        |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, count(*) AS n
        |FROM g GROUP BY w_start ORDER BY w_start""".stripMargin,

    // Greedy admission throttle: whether a row is kept depends on
    // which earlier rows were kept — a data-dependent recurrence, so
    // the oracle walks each user's stream with a recursive CTE
    // (rn → rn+1), carrying the last-kept time in µs integers.
    "q_throttle_events" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |walk AS (
        |  SELECT user_id, event_id, us, rn, TRUE AS kept, us AS last_kept
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.us, e.rn,
        |    e.us >= w.last_kept + 3600000000 AS kept,
        |    CASE WHEN e.us >= w.last_kept + 3600000000
        |      THEN e.us ELSE w.last_kept END AS last_kept
        |  FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1)
        |SELECT user_id, event_id, make_timestamp(us) AS ts
        |FROM walk WHERE kept ORDER BY user_id, ts, event_id""".stripMargin,

    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flags)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 5 MINUTE AS s_end,
        |  count(*) AS n
        |FROM islands GROUP BY user_id, island
        |ORDER BY user_id, s_start""".stripMargin,

    "q_exact_dedup" ->
      """SELECT user_id, event_type, value, min(event_id) AS keep_event_id,
        |  count(*) AS n_dups
        |FROM events GROUP BY user_id, event_type, value
        |ORDER BY user_id, event_type, value""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(text, '\s+'))) AS n_types,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
        |  round(len(list_distinct(string_split_regex(text, '\s+')))
        |    / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 4) AS type_token_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to'))) AS s_en,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('el','los','es','y','que'))) AS s_es,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('le','la','et','les','des'))) AS s_fr
        |  FROM documents),
        |p AS (
        |  SELECT *, CASE
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |    WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |    WHEN s_fr > 0 THEN 'fr'
        |    ELSE 'und' END AS pred_lang
        |  FROM s)
        |SELECT doc_id, lang, s_en, s_de, s_es, s_fr, pred_lang,
        |  pred_lang = lang AS is_correct
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    round((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), 4) AS mean_token_len,
        |    round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4) AS symbol_ratio,
        |    round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio
        |  FROM m)
        |SELECT doc_id, n_chars, n_tokens, n_symbol_chars, n_digit_chars, n_stopwords,
        |  mean_token_len, symbol_ratio, stopword_ratio,
        |  round(least(1.0, greatest(0.0,
        |    0.5 * least(n_tokens / 20.0, 1.0)
        |    + 0.3 * (1.0 - symbol_ratio)
        |    + 0.2 * least(stopword_ratio * 5.0, 1.0))), 4) AS quality_score
        |FROM r ORDER BY doc_id""".stripMargin,

    // Budget-capped top-p selection: the q_quality_score CTE feeds a
    // per-source cumulative-chars window; the 20% cut is the integer
    // cross-multiply 5*cum <= total (no floats in the decision).
    "q_top_p_select" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4) AS symbol_ratio,
        |    round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
        |    n_tokens
        |  FROM m),
        |q AS (
        |  SELECT doc_id,
        |    round(least(1.0, greatest(0.0,
        |      0.5 * least(n_tokens / 20.0, 1.0)
        |      + 0.3 * (1.0 - symbol_ratio)
        |      + 0.2 * least(stopword_ratio * 5.0, 1.0))), 4) AS quality_score
        |  FROM r),
        |sc AS (
        |  SELECT d.doc_id, d.source, d.n_chars, q.quality_score
        |  FROM documents d JOIN q USING (doc_id)),
        |cum AS (
        |  SELECT *, sum(n_chars) OVER (PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum_chars FROM sc),
        |tot AS (
        |  SELECT source, count(*) AS n_total,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source),
        |kept AS (
        |  SELECT c.source, count(*) AS n_kept,
        |    CAST(sum(c.n_chars) AS BIGINT) AS kept_chars
        |  FROM cum c JOIN tot t USING (source)
        |  WHERE c.cum_chars * 5 <= t.total_chars
        |  GROUP BY c.source)
        |SELECT t.source, coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.kept_chars, 0) AS kept_chars,
        |  t.n_total, t.total_chars,
        |  coalesce(k.kept_chars, 0) * 1000000 // t.total_chars AS kept_ppm
        |FROM tot t LEFT JOIN kept k USING (source)
        |ORDER BY t.source""".stripMargin,

    "q_eval_overlap" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |inv AS (
        |  SELECT DISTINCT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
        |    for i in range(1, len(tk) - 1)]) AS shingle
        |  FROM tkt WHERE len(tk) >= 3),
        |ov AS (
        |  SELECT b.doc_id AS bench_doc, c.doc_id AS corpus_doc,
        |    count(*) AS n_shared
        |  FROM inv b JOIN inv c USING (shingle)
        |  WHERE b.doc_id < 10 AND c.doc_id >= 10
        |  GROUP BY b.doc_id, c.doc_id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY bench_doc
        |    ORDER BY n_shared DESC, corpus_doc) AS rn
        |  FROM ov)
        |SELECT bench_doc, corpus_doc, n_shared FROM rk
        |WHERE rn = 1 ORDER BY bench_doc""".stripMargin,

    "q_ngram_novelty" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |inv AS (
        |  SELECT DISTINCT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
        |    for i in range(1, len(tk) - 1)]) AS shingle
        |  FROM tkt WHERE len(tk) >= 3),
        |fst AS (SELECT shingle, min(doc_id) AS first_doc FROM inv GROUP BY shingle)
        |SELECT inv.doc_id, count(*) AS n_shingles,
        |  count(*) FILTER (fst.first_doc = inv.doc_id) AS n_novel,
        |  round(count(*) FILTER (fst.first_doc = inv.doc_id)
        |    / CAST(count(*) AS DOUBLE), 4) AS novelty_ratio
        |FROM inv JOIN fst USING (shingle)
        |GROUP BY inv.doc_id ORDER BY inv.doc_id""".stripMargin,

    "q_vocab_drift" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*) AS n_ts FROM t GROUP BY source, tok),
        |ct AS (SELECT tok, CAST(sum(n_ts) AS BIGINT) AS n_t FROM st GROUP BY tok),
        |stot AS (SELECT source, CAST(sum(n_ts) AS BIGINT) AS n_s
        |         FROM st GROUP BY source),
        |tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM ct)
        |SELECT st.source, count(*) AS n_types, max(n_s) AS n_tokens,
        |  round(CAST(CAST(sum(CAST((CAST(n_ts AS DOUBLE) / n_s)
        |      * ln((CAST(n_ts AS DOUBLE) / n_s) / (CAST(n_t AS DOUBLE) / n))
        |      AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 4) AS kl_divergence
        |FROM st JOIN ct USING (tok) JOIN stot USING (source) CROSS JOIN tot
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    "q_quality_gate" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4) AS symbol_ratio,
        |    round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
        |    n_tokens
        |  FROM m),
        |q AS (
        |  SELECT doc_id, round(least(1.0, greatest(0.0,
        |    0.5 * least(n_tokens / 20.0, 1.0)
        |    + 0.3 * (1.0 - symbol_ratio)
        |    + 0.2 * least(stopword_ratio * 5.0, 1.0))), 4) AS quality_score
        |  FROM r),
        |j AS (
        |  SELECT d.source, q.quality_score
        |  FROM q JOIN documents d ON q.doc_id = d.doc_id),
        |med AS (
        |  SELECT source, quantile_disc(quality_score, 0.5) AS med
        |  FROM j GROUP BY source)
        |SELECT j.source, count(*) AS n_docs,
        |  count(*) FILTER (j.quality_score >= med.med) AS n_kept,
        |  max(med.med) AS median_score
        |FROM j JOIN med ON j.source = med.source
        |GROUP BY j.source ORDER BY j.source""".stripMargin,

    "q_doc_fingerprint" ->
      """WITH sh AS (
        |  SELECT doc_id, text,
        |    list_distinct([substr(text, i, 5) for i in range(1, len(text) - 3)]) AS s
        |  FROM documents WHERE len(text) >= 5)
        |SELECT doc_id, md5(text) AS full_md5,
        |  list_min([md5(x) for x in s]) AS min_shingle_md5,
        |  list_max([md5(x) for x in s]) AS max_shingle_md5
        |FROM sh ORDER BY doc_id""".stripMargin,

    "q_minhash_neardup" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Per-token term is one ln over a long/long division (bit-identical
    // doubles both engines); the sum goes through DECIMAL(18,12) and the
    // VARCHAR bridge avoids DuckDB's int128 decimal->double cast edge.
    "q_perplexity_proxy" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
        |uni AS (SELECT tok, count(*) AS n_t FROM t GROUP BY tok),
        |tot AS (SELECT count(*) AS n_tok FROM t)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(CAST(sum(CAST(-ln(CAST(n_t AS DOUBLE) / n_tok) AS DECIMAL(18,12)))
        |    AS VARCHAR) AS DOUBLE) / count(*), 4) AS avg_surprisal
        |FROM t JOIN uni USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same shingle/band/verify pipeline as q_minhash_neardup with the
    // candidate join made asymmetric: arrivals (doc_id >= 400) against
    // the pre-existing index (doc_id < 400) only.
    "q_incremental_dedup" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT b.doc_id AS new_doc, a.doc_id AS index_doc
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val
        |    AND a.doc_id < 400 AND b.doc_id >= 400),
        |cand AS (
        |  SELECT c.new_doc, c.index_doc, bb.s AS sb, ba.s AS sa
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.index_doc
        |  JOIN bands bb ON bb.doc_id = c.new_doc),
        |j AS (
        |  SELECT new_doc, index_doc,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand)
        |SELECT new_doc, index_doc, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY new_doc, index_doc""".stripMargin,

    "q_simhash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    [md5(x) for x in string_split_regex(text, '\s+')] AS tm
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string([CASE WHEN list_sum(
        |      [CASE WHEN substr(m, b, 1) >= '8' THEN 1 ELSE -1 END for m in tm]) > 0
        |    THEN '1' ELSE '0' END for b in range(1, 17)], '') AS simhash
        |FROM t ORDER BY doc_id""".stripMargin,

    // Inverted-index formulation (shingle equi-join → per-pair common
    // count), NOT the naive all-pairs list_intersect join: identical
    // result set — a pair with zero common shingles has jaccard 0 and
    // never passes the ≥ 0.5 cut, so materializing only ≥1-common
    // pairs loses nothing — but the oracle's cost becomes Σdf² like
    // the engine's, which keeps the K=10 magnitude probe checkable
    // (the naive form ran >80 min there; this runs in minutes). The
    // naive ↔ PPJoin equivalence is still asserted independently in
    // QualitySpec against ngramJaccardNaive.
    "q_ngram_jaccard" ->
      """WITH tkt AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |shx AS (SELECT doc_id, lang, unnest(s) AS shingle FROM sh),
        |szs AS (SELECT doc_id, lang, len(s) AS sz FROM sh),
        |com AS (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_common
        |  FROM shx a JOIN shx b ON a.lang = b.lang AND a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT com.lang, doc_a, doc_b,
        |    round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 4) AS jaccard
        |  FROM com
        |  JOIN szs sa ON sa.doc_id = com.doc_a AND sa.lang = com.lang
        |  JOIN szs sb ON sb.doc_id = com.doc_b AND sb.lang = com.lang)
        |SELECT lang, doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY lang, doc_a, doc_b""".stripMargin,

    "q_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rn
        |  FROM s)
        |SELECT doc_id, term, tf, df, round(score, 4) AS tfidf, rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS dl FROM documents),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t
        |  WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.term, tf.doc_id,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
        |       / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)
        |     * (CAST(tf AS DOUBLE) * 2.2e0)
        |     / (CAST(tf AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0
        |          * CAST(dl AS DOUBLE)
        |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS score
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |r AS (
        |  SELECT term, doc_id, score,
        |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rn
        |  FROM s)
        |SELECT term, doc_id, round(score, 4) AS bm25, rn
        |FROM r WHERE rn <= 10 ORDER BY term, rn""".stripMargin,

    "q_contamination" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |shr AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |bench AS (SELECT DISTINCT shingle FROM shr WHERE doc_id < 10)
        |SELECT c.doc_id, count(b.shingle) AS n_overlap, count(*) AS n_shingles,
        |  round(count(b.shingle) / CAST(count(*) AS DOUBLE), 4) AS overlap_ratio
        |FROM shr c LEFT JOIN bench b ON c.shingle = b.shingle
        |WHERE c.doc_id >= 10
        |GROUP BY c.doc_id
        |HAVING count(b.shingle) > 0
        |ORDER BY doc_id""".stripMargin,

    "q_vocab_coverage" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS term FROM documents),
        |c AS (SELECT term, count(*) AS n FROM t GROUP BY term),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
        |r AS (
        |  SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rank
        |  FROM c)
        |SELECT rank, term, n,
        |  round(n / CAST(n_total AS DOUBLE), 4) AS share,
        |  round(sum(n) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) / CAST(n_total AS DOUBLE), 4) AS cum_share
        |FROM r CROSS JOIN tot WHERE rank <= 50
        |ORDER BY rank""".stripMargin,

    "q_pmi_bigrams" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |toks AS (SELECT doc_id, unnest(t) AS tok FROM tk),
        |uni AS (SELECT tok AS t, count(*) AS n_t FROM toks GROUP BY tok),
        |ntok AS (SELECT count(*) AS n_tok FROM toks),
        |bi AS (
        |  SELECT pair[1] AS a, pair[2] AS b, count(*) AS n_ab
        |  FROM tk, unnest([[t[i], t[i+1]] for i in range(1, len(t))]) u(pair)
        |  GROUP BY 1, 2),
        |npairs AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_pairs FROM bi),
        |top AS (
        |  SELECT a, b, n_ab, row_number() OVER (ORDER BY n_ab DESC, a, b) AS rn
        |  FROM bi)
        |SELECT rn, a, b, n_ab,
        |  round(ln(CAST(n_ab AS DOUBLE) * n_tok * n_tok
        |    / (CAST(n_pairs AS DOUBLE) * ua.n_t * ub.n_t)), 4) AS pmi
        |FROM top
        |JOIN uni ua ON ua.t = top.a
        |JOIN uni ub ON ub.t = top.b
        |CROSS JOIN ntok CROSS JOIN npairs
        |WHERE rn <= 20
        |ORDER BY rn""".stripMargin,

    // Same pair CTEs as q_minhash_neardup, rolled up by the two sides'
    // provenance buckets (unordered source pair).
    "q_cross_source_leak" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |srcp AS (
        |  SELECT least(da.source, db.source) AS src_lo,
        |         greatest(da.source, db.source) AS src_hi
        |  FROM p JOIN documents da ON da.doc_id = p.doc_a
        |         JOIN documents db ON db.doc_id = p.doc_b)
        |SELECT src_lo, src_hi, count(*) AS n_pairs
        |FROM srcp GROUP BY src_lo, src_hi ORDER BY src_lo, src_hi""".stripMargin,

    // The bloom bits are implementation-defined; the declared surface
    // is the exact truth + the no-false-negative contract boolean
    // (same checkability pattern as q_percentiles_approx).
    "q_bloom_dedup" ->
      """WITH dd AS (SELECT doc_id, md5(text) AS h FROM documents),
        |idx AS (SELECT DISTINCT h FROM dd WHERE doc_id < 400)
        |SELECT d.doc_id, (i.h IS NOT NULL) AS exact_dup, TRUE AS bloom_sound
        |FROM dd d LEFT JOIN idx i ON d.h = i.h
        |WHERE d.doc_id >= 400 ORDER BY d.doc_id""".stripMargin,

    "q_normalize_text" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_md5, len(norm) AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_ngram_counts" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |shr AS (
        |  SELECT unnest([array_to_string(tk[i:i+2], ' ')
        |    for i in range(1, len(tk) - 1)]) AS shingle
        |  FROM tkt WHERE len(tk) >= 3)
        |SELECT shingle, count(*) AS n FROM shr GROUP BY shingle
        |ORDER BY n DESC, shingle LIMIT 20""".stripMargin,

    "q_hybrid_rank" ->
      """WITH dl AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS dl FROM documents),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t
        |  WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.term, tf.doc_id,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
        |       / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)
        |     * (CAST(tf AS DOUBLE) * 2.2e0)
        |     / (CAST(tf AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0
        |          * CAST(dl AS DOUBLE)
        |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS score
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |lex AS (
        |  SELECT term, doc_id, rn AS rn_lex FROM (
        |    SELECT term, doc_id, score,
        |      row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rn
        |    FROM s)
        |  WHERE rn <= 10),
        |m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |qs AS (
        |  SELECT doc_id, round(least(1.0, greatest(0.0,
        |      0.5 * least(n_tokens / 20.0, 1.0)
        |      + 0.3 * (1.0 - round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4))
        |      + 0.2 * least(round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) * 5.0, 1.0))),
        |    4) AS quality_score
        |  FROM m),
        |rq AS (
        |  SELECT l.term, l.doc_id, l.rn_lex, q.quality_score,
        |    row_number() OVER (PARTITION BY l.term
        |      ORDER BY q.quality_score DESC, l.doc_id) AS rn_quality
        |  FROM lex l JOIN qs q USING (doc_id)),
        |f AS (
        |  SELECT term, doc_id, CAST(rn_lex AS BIGINT) AS rn_lex,
        |    CAST(rn_quality AS BIGINT) AS rn_quality,
        |    CAST(1000000000 // (60 + rn_lex)
        |       + 1000000000 // (60 + rn_quality) AS BIGINT) AS rrf_scaled
        |  FROM rq)
        |SELECT term, doc_id, rn_lex, rn_quality, rrf_scaled,
        |  CAST(row_number() OVER (PARTITION BY term
        |    ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS fused_rank
        |FROM f ORDER BY term, fused_rank""".stripMargin,

    "q_rbo_overlap" ->
      """WITH dl AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS dl FROM documents),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |t AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM t
        |  WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT tf.term, tf.doc_id,
        |    ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
        |       / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)
        |     * (CAST(tf AS DOUBLE) * 2.2e0)
        |     / (CAST(tf AS DOUBLE) + 1.2e0 * (0.25e0 + 0.75e0
        |          * CAST(dl AS DOUBLE)
        |          / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS score
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |lex AS (
        |  SELECT term, doc_id, CAST(rn AS BIGINT) AS rn_a FROM (
        |    SELECT term, doc_id,
        |      row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rn
        |    FROM s)
        |  WHERE rn <= 10),
        |raw AS (
        |  SELECT term, doc_id, CAST(rn AS BIGINT) AS rn_b FROM (
        |    SELECT term, doc_id,
        |      row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
        |    FROM tf)
        |  WHERE rn <= 10),
        |m AS (
        |  SELECT l.term, greatest(l.rn_a, r.rn_b) AS mx
        |  FROM lex l JOIN raw r USING (term, doc_id)),
        |mdep AS (SELECT term, unnest(range(mx, 11)) AS depth FROM m),
        |ov AS (SELECT term, depth, count(*) AS ov FROM mdep GROUP BY term, depth),
        |terms AS (SELECT DISTINCT term FROM lex)
        |SELECT terms.term,
        |  CAST(coalesce(max(CASE WHEN depth = 10 THEN ov END), 0) AS BIGINT)
        |    AS overlap10,
        |  CAST(coalesce(sum(
        |    CAST(1000000000000 AS BIGINT) * ov
        |      // (CAST(1 AS BIGINT) << depth) // depth), 0) AS BIGINT)
        |    AS rbo_scaled
        |FROM terms LEFT JOIN ov ON terms.term = ov.term
        |GROUP BY terms.term ORDER BY terms.term""".stripMargin,

    "q_ivm_merge" ->
      """SELECT o_custkey,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_orderdate < TIMESTAMP '2001-01-01')
        |    AS n_base,
        |  count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |    AS n_delta,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS total_spend
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, count(*) AS n FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |p AS (
        |  SELECT n, unnest([substr(word, i, 2) for i in range(1, length(word))]) AS pair
        |  FROM w WHERE length(word) >= 2)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,

    "q_dup_rate_by_source" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct,
        |  round((count(*) - count(DISTINCT md5(text))) / CAST(count(*) AS DOUBLE), 4)
        |    AS dup_rate
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Segments are the doc's consecutive 10-word windows; a segment in
    // >= 3 distinct docs is corpus boilerplate and is cut. integer ppm
    // (div) keeps the fraction float-free on both engines.
    "q_line_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |seg AS (
        |  SELECT doc_id, unnest([array_to_string(w[i*10+1:i*10+10], ' ')
        |    for i in range(0, (len(w) - 1) // 10 + 1)]) AS seg
        |  FROM w),
        |df AS (
        |  SELECT seg, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, seg FROM seg) GROUP BY seg)
        |SELECT s.doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN df < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN df < 3 THEN length(s.seg) ELSE 0 END) AS BIGINT)
        |    AS kept_chars,
        |  CAST(sum(length(s.seg)) AS BIGINT) AS total_chars,
        |  (CAST(sum(CASE WHEN df < 3 THEN length(s.seg) ELSE 0 END) AS BIGINT)
        |     * 1000000)
        |    // greatest(CAST(sum(length(s.seg)) AS BIGINT), 1) AS retained_ppm
        |FROM seg s JOIN df USING (seg)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // Snapshots are per-(user, event_type) event counts in the corpus
    // month's first and last week; presence is the count itself, so a
    // NULL value column can never misclassify a key.
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT user_id, event_type, count(*) AS n_old
        |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
        |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00'
        |  GROUP BY user_id, event_type),
        |b AS (
        |  SELECT user_id, event_type, count(*) AS n_new
        |  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24 00:00:00'
        |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-31 00:00:00'
        |  GROUP BY user_id, event_type),
        |j AS (
        |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |    CASE WHEN a.user_id IS NULL THEN 'added'
        |         WHEN b.user_id IS NULL THEN 'removed'
        |         WHEN n_old = n_new THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM a FULL OUTER JOIN b
        |    ON a.user_id = b.user_id AND a.event_type = b.event_type)
        |SELECT status, count(*) AS n_keys,
        |  CAST(sum(user_id) AS BIGINT) AS key_checksum
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    "q_repetition" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |shr AS (
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+2], ' ')
        |    for i in range(1, len(tk) - 1)]) AS shingle
        |  FROM tkt WHERE len(tk) >= 3),
        |per AS (SELECT doc_id, shingle, count(*) AS n FROM shr GROUP BY doc_id, shingle)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_shingles, count(*) AS n_distinct,
        |  max(n) AS max_repeat,
        |  round(1 - count(*) / CAST(sum(n) AS DOUBLE), 4) AS repetition_ratio
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Substring-dedup cut mask: positions covered by 8-token windows
    // shared with >= 2 distinct docs, overlaps merged per doc via the
    // cumulative-max island pattern.
    "q_dup_spans" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |win AS (
        |  SELECT doc_id, len(tk) AS n_tokens,
        |    unnest([{'pos': i - 1, 'w': array_to_string(tk[i:i+7], ' ')}
        |            for i in range(1, len(tk) - 6)], recursive := true)
        |  FROM tkt WHERE len(tk) >= 8),
        |shared AS (
        |  SELECT w FROM (SELECT w, count(DISTINCT doc_id) AS df FROM win GROUP BY w)
        |  WHERE df >= 2),
        |dup AS (SELECT win.doc_id, win.n_tokens, win.pos FROM win JOIN shared USING (w)),
        |isl AS (
        |  SELECT doc_id, n_tokens, pos, pos + 8 AS pend,
        |    max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM dup),
        |grp AS (
        |  SELECT doc_id, n_tokens, pos, pend,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |cov AS (
        |  SELECT doc_id, n_tokens, island, min(pos) AS mn, max(pend) AS mx,
        |    count(*) AS nw
        |  FROM grp GROUP BY doc_id, n_tokens, island)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum(nw) AS BIGINT) AS n_dup_windows, count(*) AS n_spans,
        |  CAST(sum(mx - mn) AS BIGINT) AS covered_tokens,
        |  CAST((sum(mx - mn) * 1000000) // n_tokens AS BIGINT) AS dup_ppm
        |FROM cov GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,

    // DSIR-style integer affinity: per doc, sum over bigram
    // occurrences of (target ppm - corpus ppm).
    "q_dsir_weight" ->
      """WITH tkt AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS tk FROM documents),
        |occ AS (
        |  SELECT doc_id, lang, unnest([array_to_string(tk[i:i+1], ' ')
        |    for i in range(1, len(tk))]) AS g
        |  FROM tkt WHERE len(tk) >= 2),
        |raw AS (SELECT g, count(*) AS c_r FROM occ GROUP BY g),
        |tgt AS (SELECT g, count(*) AS c_t FROM occ WHERE lang = 'en' GROUP BY g),
        |tot AS (SELECT count(*) AS tot_r,
        |  count(*) FILTER (WHERE lang = 'en') AS tot_t FROM occ),
        |st AS (
        |  SELECT r.g,
        |    (coalesce(t.c_t, 0) * 1000000) // tot_t
        |      - (r.c_r * 1000000) // tot_r AS delta_ppm
        |  FROM raw r LEFT JOIN tgt t ON r.g = t.g, tot)
        |SELECT o.doc_id, count(*) AS n_grams,
        |  CAST(sum(delta_ppm) AS BIGINT) AS affinity_ppm
        |FROM occ o JOIN st ON o.g = st.g
        |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin,

    // Content-defined chunking: boundary after any token whose md5
    // ends in {0,8}; chunk id = windowed sum of preceding boundary
    // flags; chunk key = md5 of the space-joined chunk; dup mass =
    // tokens in chunks shared by >= 2 docs.
    "q_cdc_chunks" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |tok AS (
        |  SELECT doc_id, len(tk) AS n_tokens,
        |    unnest([{'pos': i - 1, 'w': tk[i]} for i in range(1, len(tk) + 1)],
        |           recursive := true)
        |  FROM tkt),
        |fl AS (
        |  SELECT doc_id, n_tokens, pos, w,
        |    CASE WHEN substr(md5(w), 32, 1) IN ('0', '8') THEN 1 ELSE 0 END AS flag
        |  FROM tok),
        |ch AS (
        |  SELECT doc_id, n_tokens, pos, w,
        |    coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM fl),
        |chunks AS (
        |  SELECT doc_id, n_tokens, chunk, count(*) AS c_toks,
        |    md5(string_agg(w, ' ' ORDER BY pos)) AS ckey
        |  FROM ch GROUP BY doc_id, n_tokens, chunk),
        |cdf AS (SELECT ckey, count(DISTINCT doc_id) AS cdf FROM chunks GROUP BY ckey)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
        |  CAST(sum(CASE WHEN cdf >= 2 THEN c_toks ELSE 0 END) AS BIGINT) AS dup_tokens,
        |  CAST((sum(CASE WHEN cdf >= 2 THEN c_toks ELSE 0 END) * 1000000)
        |    // n_tokens AS BIGINT) AS dup_ppm
        |FROM chunks JOIN cdf USING (ckey)
        |GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,

    // Shared 12-token-prefix anchor groups with document/source spread.
    "q_anchor_dedup" ->
      """WITH tkt AS (
        |  SELECT doc_id, source, string_split_regex(text, '\s+') AS tk FROM documents),
        |anch AS (
        |  SELECT doc_id, source, md5(array_to_string(tk[1:12], ' ')) AS anchor
        |  FROM tkt WHERE len(tk) >= 12)
        |SELECT anchor, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM anch GROUP BY anchor HAVING count(*) >= 2 ORDER BY anchor""".stripMargin,

    // MinHash estimate-vs-exact error per verified near-dup pair:
    // q_minhash_neardup's band/verify pipeline carrying the 8 slice
    // minima; est = matching slices * 125000 ppm.
    "q_minhash_est_err" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |sig AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 4*j + 1, 4) for x in s])
        |      for j in range(0, 8)] AS sl,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM sig, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b,
        |    sa.s AS sa, sb.s AS sb, sa.sl AS sla, sb.sl AS slb
        |  FROM cpair c
        |  JOIN sig sa ON sa.doc_id = c.doc_a
        |  JOIN sig sb ON sb.doc_id = c.doc_b),
        |m AS (
        |  SELECT doc_a, doc_b,
        |    len(list_intersect(sa, sb)) AS ni,
        |    len(sa) + len(sb) - len(list_intersect(sa, sb)) AS nu,
        |    len(list_filter(range(1, 9), i -> sla[i] = slb[i])) AS nm
        |  FROM cand)
        |SELECT doc_a, doc_b, round(ni / CAST(nu AS DOUBLE), 4) AS jaccard,
        |  CAST((ni * 1000000) // nu AS BIGINT) AS jacc_ppm,
        |  CAST(nm * 125000 AS BIGINT) AS est_ppm,
        |  CAST(nm * 125000 - (ni * 1000000) // nu AS BIGINT) AS err_ppm
        |FROM m WHERE round(ni / CAST(nu AS DOUBLE), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Padding-waste policy comparison: fixed 128-token contexts with
    // truncation vs power-of-two length buckets.
    "q_pad_waste" ->
      """WITH n AS (
        |  SELECT len(string_split_regex(text, '\s+')) AS n FROM documents),
        |pol AS (
        |  SELECT 'pow2_bucket' AS policy,
        |    CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
        |         WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
        |         WHEN n <= 512 THEN 512 ELSE 1024 END AS bucket_len, n FROM n
        |  UNION ALL
        |  SELECT 'fixed_128', 128, n FROM n),
        |agg AS (
        |  SELECT policy, bucket_len, count(*) AS n_docs,
        |    sum(least(n, bucket_len)) AS kept_tokens,
        |    sum(n - least(n, bucket_len)) AS truncated_tokens
        |  FROM pol GROUP BY policy, bucket_len)
        |SELECT policy, CAST(bucket_len AS BIGINT) AS bucket_len, n_docs,
        |  CAST(kept_tokens AS BIGINT) AS kept_tokens,
        |  CAST(truncated_tokens AS BIGINT) AS truncated_tokens,
        |  CAST(n_docs * bucket_len AS BIGINT) AS padded_slots,
        |  CAST(((n_docs * bucket_len - kept_tokens) * 1000000)
        |    // (n_docs * bucket_len) AS BIGINT) AS waste_ppm
        |FROM agg ORDER BY policy, bucket_len""".stripMargin,

    // Quality-threshold calibration: 0.1 bands over the q_quality_score
    // composite with cumulative docs/tokens retained at-or-above.
    "q_quality_sweep" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4) AS symbol_ratio,
        |    round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio
        |  FROM m),
        |q AS (
        |  SELECT n_tokens,
        |    round(least(1.0, greatest(0.0,
        |      0.5 * least(n_tokens / 20.0, 1.0)
        |      + 0.3 * (1.0 - symbol_ratio)
        |      + 0.2 * least(stopword_ratio * 5.0, 1.0))), 4) AS quality_score
        |  FROM r),
        |b AS (
        |  SELECT CAST(floor(quality_score * 10) AS BIGINT) AS band_x10,
        |    count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |  FROM q GROUP BY 1)
        |SELECT band_x10, n_docs, sum_tokens,
        |  CAST(sum(n_docs) OVER (ORDER BY band_x10 DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_at_least,
        |  CAST(sum(sum_tokens) OVER (ORDER BY band_x10 DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_at_least
        |FROM b ORDER BY band_x10""".stripMargin,

    // Tokenizer efficiency per language: compression (chars/subword)
    // and fertility (subwords/word), integer ppm.
    "q_tok_efficiency" ->
      """WITH m AS (
        |  SELECT lang, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_words,
        |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe
        |  FROM documents),
        |a AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(sum(n_words) AS BIGINT) AS sum_words,
        |    CAST(sum(n_bpe) AS BIGINT) AS sum_bpe
        |  FROM m GROUP BY lang)
        |SELECT lang, n_docs, sum_chars, sum_words, sum_bpe,
        |  CAST((sum_chars * 1000000) // sum_bpe AS BIGINT) AS chars_per_tok_ppm,
        |  CAST((sum_bpe * 1000000) // sum_words AS BIGINT) AS fertility_ppm
        |FROM a ORDER BY lang""".stripMargin,

    // Curation funnel: cumulative stage survival (raw -> min-length ->
    // lang-ID'd en -> near-dup canonical); lang CASE = q_lang_id,
    // cluster reachability = q_dedup_clusters.
    "q_curation_funnel" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d),
        |lng AS (
        |  SELECT doc_id, CASE
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |    WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |    WHEN s_fr > 0 THEN 'fr'
        |    ELSE 'und' END AS pred_lang
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(tk, t -> t IN ('the','a','of','and','to'))) AS s_en,
        |      len(list_filter(tk, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |      len(list_filter(tk, t -> t IN ('el','los','es','y','que'))) AS s_es,
        |      len(list_filter(tk, t -> t IN ('le','la','et','les','des'))) AS s_fr
        |    FROM tkt)),
        |flags AS (
        |  SELECT d.doc_id, len(t.tk) AS n_tokens,
        |    d.n_chars >= 100 AND len(t.tk) >= 20 AS f_len,
        |    lng.pred_lang = 'en' AS f_lang,
        |    lab.canonical_id IS NULL OR lab.canonical_id = d.doc_id AS f_canon
        |  FROM documents d
        |  JOIN tkt t USING (doc_id)
        |  JOIN lng USING (doc_id)
        |  LEFT JOIN lab USING (doc_id))
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
        |    count(*) AS n_docs,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM flags
        |  UNION ALL
        |  SELECT 1, 'min_length', count(*),
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
        |  FROM flags WHERE f_len
        |  UNION ALL
        |  SELECT 2, 'lang_en', count(*),
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
        |  FROM flags WHERE f_len AND f_lang
        |  UNION ALL
        |  SELECT 3, 'near_dedup', count(*),
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
        |  FROM flags WHERE f_len AND f_lang AND f_canon)
        |ORDER BY stage_idx""".stripMargin,

    // Winnowing (MOSS): min md5 of each 4-window over 5-token shingle
    // hashes, deduped per doc; shared = fingerprint in >= 2 docs.
    "q_winnowing" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, len(tk) - 4 AS n_shingles,
        |    [md5(array_to_string(tk[i:i+4], ' ')) for i in range(1, len(tk) - 3)] AS hs
        |  FROM tkt WHERE len(tk) >= 5),
        |win AS (
        |  SELECT doc_id, n_shingles,
        |    unnest([list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]) AS sel
        |  FROM sh WHERE len(hs) >= 4),
        |fp AS (SELECT DISTINCT doc_id, n_shingles, sel FROM win),
        |cdf AS (SELECT sel, count(DISTINCT doc_id) AS df FROM fp GROUP BY sel),
        |per AS (
        |  SELECT doc_id, n_shingles, count(*) AS n_fingerprints,
        |    sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
        |  FROM fp JOIN cdf USING (sel) GROUP BY doc_id, n_shingles)
        |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
        |  n_fingerprints, CAST(n_shared AS BIGINT) AS n_shared,
        |  CAST((n_shared * 1000000) // n_fingerprints AS BIGINT) AS shared_ppm,
        |  n_shared * 2 >= n_fingerprints AS is_suspect
        |FROM per ORDER BY doc_id""".stripMargin,

    // Church-Gale burstiness: cf*1e6 // df, df >= 5, top 20.
    "q_burstiness" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        |    FROM documents)
        |  GROUP BY doc_id, term),
        |agg AS (
        |  SELECT term, CAST(sum(tf) AS BIGINT) AS cf, count(*) AS df
        |  FROM tf GROUP BY term HAVING count(*) >= 5)
        |SELECT term, cf, df, CAST((cf * 1000000) // df AS BIGINT) AS burst_ppm
        |FROM agg ORDER BY burst_ppm DESC, term LIMIT 20""".stripMargin,

    // Heaps-law growth: distinct types / docs / tokens in the corpus
    // prefix below each doc-id decile threshold.
    "q_vocab_growth" ->
      """WITH docs AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens
        |  FROM documents),
        |mx AS (SELECT max(doc_id) + 1 AS n_ids FROM documents),
        |dec AS (
        |  SELECT t.d AS decile, (n_ids * t.d) // 10 AS threshold
        |  FROM range(1, 11) t(d), mx),
        |fs AS (
        |  SELECT term, min(doc_id) AS first_id FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        |    FROM documents)
        |  GROUP BY term),
        |ty AS (
        |  SELECT decile, threshold, count(*) AS n_types
        |  FROM dec JOIN fs ON first_id < threshold GROUP BY 1, 2),
        |ms AS (
        |  SELECT decile, threshold, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |  FROM dec JOIN docs ON doc_id < threshold GROUP BY 1, 2)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(threshold AS BIGINT) AS threshold, n_docs, n_tokens, n_types
        |FROM ty JOIN ms USING (decile, threshold) ORDER BY decile""".stripMargin,

    // Dedup-key width sizing: md5-prefix collision counts over
    // distinct texts at candidate widths.
    "q_key_width" ->
      """WITH t AS (SELECT DISTINCT md5(text) AS h FROM documents),
        |w AS (SELECT w FROM (VALUES (4), (6), (8), (12), (16), (32)) v(w))
        |SELECT CAST(w AS BIGINT) AS width,
        |  count(DISTINCT substr(h, 1, w)) AS n_keys, count(*) AS n_texts,
        |  count(*) - count(DISTINCT substr(h, 1, w)) AS n_collisions
        |FROM t, w GROUP BY w ORDER BY w""".stripMargin,

    // LSH band-load audit: per band, buckets, max bucket, exact
    // candidate-pair volume, and doc mass past the hot-band cap.
    "q_band_load" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, b AS band_idx,
        |    list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |      || list_min([substr(md5(x), 8*b + 5, 4) for x in s]) AS band_val
        |  FROM sh, (SELECT unnest(range(0, 4)) AS b)),
        |bk AS (SELECT band_idx, band_val, count(*) AS sz FROM bands GROUP BY 1, 2)
        |SELECT CAST(band_idx AS BIGINT) AS band_idx, count(*) AS n_buckets,
        |  CAST(sum(sz) AS BIGINT) AS n_docs, CAST(max(sz) AS BIGINT) AS max_bucket,
        |  CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs,
        |  CAST(sum(CASE WHEN sz > 1000 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_docs_capped
        |FROM bk GROUP BY band_idx ORDER BY band_idx""".stripMargin,

    // Cross-detector pair agreement: q_minhash_neardup's verified
    // pairs vs q_simhash_neardup's hamming<=1 pairs.
    "q_detector_agreement" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |mhb AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |mhbx AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM mhb, range(1, 5) t(i)),
        |mhp AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM mhbx a JOIN mhbx b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |mhc AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM mhp c
        |  JOIN mhb ba ON ba.doc_id = c.doc_a
        |  JOIN mhb bb ON bb.doc_id = c.doc_b),
        |mh AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT doc_a, doc_b,
        |      round(len(list_intersect(sa, sb))
        |        / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4)
        |        AS jaccard
        |    FROM mhc)
        |  WHERE jaccard >= 0.5),
        |tdoc AS (
        |  SELECT doc_id, [md5(x) for x in string_split_regex(text, '\s+')] AS tm
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string([CASE WHEN list_sum(
        |        [CASE WHEN substr(m, b, 1) >= '8' THEN 1 ELSE -1 END for m in tm]) > 0
        |      THEN '1' ELSE '0' END for b in range(1, 33)], '') AS simhash
        |  FROM tdoc),
        |shbands AS (
        |  SELECT doc_id, simhash, b AS band_idx, substr(simhash, 8*b + 1, 8) AS band_val
        |  FROM sig CROSS JOIN range(4) t(b)),
        |shc AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM shbands a JOIN shbands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |   AND a.doc_id < b.doc_id),
        |sim AS (
        |  SELECT doc_a, doc_b FROM shc
        |  WHERE list_sum([CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1)
        |    THEN 1 ELSE 0 END for i in range(1, 33)]) <= 1),
        |c AS (SELECT count(*) AS n_common_pairs FROM mh JOIN sim USING (doc_a, doc_b)),
        |a AS (SELECT count(*) AS n_lsh_pairs FROM mh),
        |b AS (SELECT count(*) AS n_simhash_pairs FROM sim)
        |SELECT n_lsh_pairs, n_simhash_pairs, n_common_pairs,
        |  CAST(n_lsh_pairs + n_simhash_pairs - n_common_pairs AS BIGINT)
        |    AS n_union_pairs,
        |  CAST((n_common_pairs * 1000000)
        |    // greatest(n_lsh_pairs + n_simhash_pairs - n_common_pairs, 1) AS BIGINT)
        |    AS overlap_ppm
        |FROM a, b, c""".stripMargin,

    // CDC dedup savings rolled up to source (q_cdc_chunks' chunking).
    "q_cdc_savings" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |tok AS (
        |  SELECT doc_id, len(tk) AS n_tokens,
        |    unnest([{'pos': i - 1, 'w': tk[i]} for i in range(1, len(tk) + 1)],
        |           recursive := true)
        |  FROM tkt),
        |fl AS (
        |  SELECT doc_id, n_tokens, pos, w,
        |    CASE WHEN substr(md5(w), 32, 1) IN ('0', '8') THEN 1 ELSE 0 END AS flag
        |  FROM tok),
        |ch AS (
        |  SELECT doc_id, n_tokens, pos, w,
        |    coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM fl),
        |chunks AS (
        |  SELECT doc_id, n_tokens, chunk, count(*) AS c_toks,
        |    md5(string_agg(w, ' ' ORDER BY pos)) AS ckey
        |  FROM ch GROUP BY doc_id, n_tokens, chunk),
        |cdf AS (SELECT ckey, count(DISTINCT doc_id) AS cdf FROM chunks GROUP BY ckey),
        |per AS (
        |  SELECT doc_id, n_tokens,
        |    sum(CASE WHEN cdf >= 2 THEN c_toks ELSE 0 END) AS dup_tokens
        |  FROM chunks JOIN cdf USING (ckey)
        |  GROUP BY doc_id, n_tokens)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(per.n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(per.dup_tokens) AS BIGINT) AS dup_tokens,
        |  CAST((sum(per.dup_tokens) * 1000000) // sum(per.n_tokens) AS BIGINT)
        |    AS savings_ppm
        |FROM per JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // k-anonymity small-cell audit over (lang, source, n_chars bucket).
    "q_small_cells" ->
      """SELECT lang, source,
        |  CAST(CASE WHEN n_chars <= 128 THEN 128 WHEN n_chars <= 256 THEN 256
        |       WHEN n_chars <= 512 THEN 512 WHEN n_chars <= 1024 THEN 1024
        |       ELSE 2048 END AS BIGINT) AS len_bucket,
        |  count(*) AS n_docs, count(*) < 5 AS suppress
        |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Zipf slope per source: OLS on milli-floored logs — integer-only
    // after the single ln(), so the fit is bit-identical by definition.
    "q_zipf_slope" ->
      """WITH tf AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents),
        |cf AS (SELECT source, term, count(*) AS cf FROM tf GROUP BY 1, 2),
        |rk AS (
        |  SELECT source, cf,
        |    row_number() OVER (PARTITION BY source ORDER BY cf DESC, term) AS rank
        |  FROM cf),
        |m AS (
        |  SELECT source,
        |    CAST(floor(ln(rank) * 1000) AS BIGINT) AS x_m,
        |    CAST(floor(ln(cf) * 1000) AS BIGINT) AS y_m
        |  FROM rk WHERE rank <= 100),
        |s AS (
        |  SELECT source, count(*) AS n_terms, sum(x_m) AS sx, sum(y_m) AS sy,
        |    sum(x_m * y_m) AS sxy, sum(x_m * x_m) AS sxx
        |  FROM m GROUP BY source)
        |SELECT source, n_terms, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
        |  CAST((1000 * (sx * sy - n_terms * sxy))
        |    // greatest(n_terms * sxx - sx * sx, 1) AS BIGINT) AS slope_neg_milli
        |FROM s ORDER BY source""".stripMargin,

    // Per-source KL vs the corpus top-100 unigram distribution,
    // add-1 smoothed; per-term doubles over exact integers pinned to
    // DECIMAL(18,12) before the exact sum (qEntropy recipe).
    "q_kl_drift" ->
      """WITH tf AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents),
        |stc AS (SELECT source, term, count(*) AS c FROM tf GROUP BY 1, 2),
        |corpus AS (
        |  SELECT term, CAST(sum(c) AS BIGINT) AS cc FROM stc GROUP BY term
        |  ORDER BY cc DESC, term LIMIT 100),
        |qt AS (SELECT CAST(sum(cc) AS BIGINT) AS q_total, count(*) AS n_univ
        |       FROM corpus),
        |grid AS (
        |  SELECT s.source, t.term, t.cc
        |  FROM (SELECT DISTINCT source FROM documents) s, corpus t),
        |j AS (
        |  SELECT g.source, g.term, g.cc, COALESCE(c.c, 0) AS c
        |  FROM grid g LEFT JOIN stc c ON g.source = c.source AND g.term = c.term),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM j GROUP BY source)
        |SELECT j.source, max(t.ns) AS n_src_tokens,
        |  CAST(sum(CAST(
        |    (CAST(j.c + 1 AS DOUBLE) / (t.ns + q.n_univ))
        |    * ln(CAST((j.c + 1) * q.q_total AS DOUBLE) / ((t.ns + q.n_univ) * j.cc))
        |  AS DECIMAL(18,12))) AS DOUBLE) AS kl_nats
        |FROM j JOIN tot t ON j.source = t.source CROSS JOIN qt q
        |GROUP BY j.source ORDER BY j.source""".stripMargin,

    // PSI per event type over q_drift_bins' fixed grid, add-1
    // smoothed; per-bin doubles over exact ints, decimal-pinned sum.
    "q_psi_drift" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin,
        |    CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16' AS is_b
        |  FROM events),
        |bins AS (
        |  SELECT event_type, bin,
        |    CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ev GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, CAST(sum(n_a) AS BIGINT) AS ta,
        |    CAST(sum(n_b) AS BIGINT) AS tb
        |  FROM bins GROUP BY 1)
        |SELECT b.event_type, max(ta) AS n_a_total, max(tb) AS n_b_total,
        |  CAST(sum(CAST(
        |    (CAST(n_b + 1 AS DOUBLE) / (tb + 10) - CAST(n_a + 1 AS DOUBLE) / (ta + 10))
        |    * ln(CAST((n_b + 1) * (ta + 10) AS DOUBLE) / ((tb + 10) * (n_a + 1)))
        |  AS DECIMAL(18,12))) AS DOUBLE) AS psi_nats
        |FROM bins b JOIN t USING (event_type)
        |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,

    // Gini of per-customer order value by segment; exact decimal
    // sums floored to BIGINT, split-scale ppm division (overflow-safe).
    "q_gini_concentration" ->
      """WITH pc AS (
        |  SELECT c_mktsegment, c_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT c_mktsegment, rev,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY rev, c_custkey) AS i,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM pc),
        |g AS (
        |  SELECT c_mktsegment, count(*) AS n_customers,
        |    CAST(floor(sum(rev * (2 * i - n - 1))) AS BIGINT) AS num_int,
        |    CAST(floor(sum(rev) * count(*)) AS BIGINT) AS den_int
        |  FROM rk GROUP BY 1)
        |SELECT c_mktsegment, n_customers,
        |  CAST((num_int * 1000) // greatest(den_int // 1000, 1) AS BIGINT) AS gini_ppm
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    // HHI supplier concentration per part type from floor-to-unit
    // integer revenues; share² sum over the supplier frame.
    "q_hhi_concentration" ->
      """WITH ps AS (
        |  SELECT p_type, l_suppkey,
        |    CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |      * (1 - CAST(l_discount AS DECIMAL(18,6))))) AS BIGINT) AS rev_int
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |t AS (SELECT p_type, CAST(sum(rev_int) AS BIGINT) AS type_rev
        |      FROM ps GROUP BY 1)
        |SELECT ps.p_type, count(*) AS n_suppliers,
        |  CAST(max((rev_int * 1000000) // type_rev) AS BIGINT) AS top_share_ppm,
        |  CAST(sum(((rev_int * 1000000) // type_rev)
        |           * ((rev_int * 1000000) // type_rev)) // 1000000 AS BIGINT) AS hhi_ppm
        |FROM ps JOIN t USING (p_type)
        |GROUP BY ps.p_type ORDER BY ps.p_type""".stripMargin,

    // Temporal split + entity-leakage audit (last 7 days test).
    "q_temporal_split" ->
      """WITH wm AS (
        |  SELECT CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) - 6 AS cutoff FROM events),
        |f AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) >= cutoff AS is_test
        |  FROM events CROSS JOIN wm),
        |u AS (
        |  SELECT user_id,
        |    max(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS in_train,
        |    max(CASE WHEN is_test THEN 1 ELSE 0 END) AS in_test
        |  FROM f GROUP BY user_id),
        |ec AS (
        |  SELECT
        |    CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train_events,
        |    CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test_events
        |  FROM f)
        |SELECT n_train_events, n_test_events,
        |  CAST(sum(in_train) AS BIGINT) AS train_users,
        |  CAST(sum(in_test) AS BIGINT) AS test_users,
        |  CAST(sum(in_train * in_test) AS BIGINT) AS overlap_users,
        |  CAST((CAST(sum(in_train * in_test) AS BIGINT) * 1000000)
        |    // greatest(CAST(sum(in_test) AS BIGINT), 1) AS BIGINT) AS overlap_ppm
        |FROM u CROSS JOIN ec
        |GROUP BY n_train_events, n_test_events""".stripMargin,

    // Weight-of-evidence by day-of-week (DuckDB dow, 0=Sunday);
    // smoothing cleared to integers, one ln() per row, no double sums.
    "q_woe_encode" ->
      """WITH e AS (
        |  SELECT CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
        |    event_type = 'purchase' AS is_good
        |  FROM events),
        |tot AS (
        |  SELECT CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END) AS BIGINT) AS g_tot,
        |    CAST(sum(CASE WHEN NOT is_good THEN 1 ELSE 0 END) AS BIGINT) AS b_tot
        |  FROM e)
        |SELECT dow, count(*) AS n_events,
        |  CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN NOT is_good THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  ln(CAST((2 * CAST(sum(CASE WHEN is_good THEN 1 ELSE 0 END) AS BIGINT) + 1)
        |       * b_tot AS DOUBLE)
        |     / ((2 * CAST(sum(CASE WHEN NOT is_good THEN 1 ELSE 0 END) AS BIGINT) + 1)
        |       * g_tot)) AS woe_nats
        |FROM e CROSS JOIN tot GROUP BY dow, g_tot, b_tot ORDER BY dow""".stripMargin,

    // Leakage-safe strictly-prior 7-day rolling features: RANGE frame
    // on epoch micros excludes the current instant (and its ties).
    "q_pit_rolling" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(count(*) OVER w AS BIGINT) AS prior_n_7d,
        |  CAST(floor(coalesce(sum(CAST(value AS DECIMAL(18,6))) OVER w, 0) * 1000)
        |    AS BIGINT) AS prior_sum_milli
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    // Cohort LTV: weekly value accumulation per first-day cohort;
    // cumulative over the ≤5-row per-cohort frame, decimal-exact.
    "q_cohort_ltv" ->
      """WITH fd AS (
        |  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |cs AS (SELECT cohort_day, count(*) AS cohort_users FROM fd GROUP BY cohort_day),
        |wkagg AS (
        |  SELECT f.cohort_day,
        |    date_diff('day', f.cohort_day, CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) // 7
        |      AS wk,
        |    count(DISTINCT e.user_id) AS active_users,
        |    sum(CAST(e.value AS DECIMAL(18,6))) AS rev_dec
        |  FROM events e JOIN fd f ON e.user_id = f.user_id
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT cohort_day, wk, active_users, rev_dec,
        |    CAST(floor(sum(rev_dec) OVER (PARTITION BY cohort_day ORDER BY wk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000) AS BIGINT)
        |      AS cum_rev_milli
        |  FROM wkagg)
        |SELECT c.cohort_day, CAST(c.wk AS BIGINT) AS wk, cs.cohort_users,
        |  c.active_users, CAST(c.rev_dec AS DOUBLE) AS week_revenue,
        |  c.cum_rev_milli,
        |  CAST(c.cum_rev_milli // cs.cohort_users AS BIGINT) AS ltv_milli
        |FROM c JOIN cs USING (cohort_day) ORDER BY cohort_day, wk""".stripMargin,

    // Top event-path trigrams (per-user sort ties broken by event_id).
    "q_path_trigrams" ->
      """WITH t AS (
        |  SELECT event_type || '>' || lead(event_type, 1) OVER w
        |      || '>' || lead(event_type, 2) OVER w AS path,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT path, count(*) AS n FROM t WHERE e3 IS NOT NULL GROUP BY path),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM p)
        |SELECT path, n, CAST((n * 1000000) // n_total AS BIGINT) AS share_ppm
        |FROM p CROSS JOIN tot ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // Regional top-3 brand report with ordered string aggregation;
    // scale-12 revenue goes through the VARCHAR round-trip.
    "q_region_top_brands" ->
      """WITH rev AS (
        |  SELECT r_name, p_brand,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |        * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT r_name, p_brand, rev,
        |    row_number() OVER (PARTITION BY r_name ORDER BY rev DESC, p_brand) AS rn
        |  FROM rev)
        |SELECT r_name, string_agg(p_brand, ',' ORDER BY rn) AS top_brands,
        |  CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS top3_revenue
        |FROM rk WHERE rn <= 3 GROUP BY r_name ORDER BY r_name""".stripMargin,

    // Half-life-decayed trend: integer nano-value mass with
    // floor-pinned ppm weights (exact powers of 2 at k≡0 mod 7).
    "q_decayed_trend" ->
      """WITH wm AS (
        |  SELECT CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS wm_day FROM events),
        |e AS (
        |  SELECT event_type,
        |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
        |    CAST(floor(pow(2.0,
        |      -date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE), wm_day) / 7.0)
        |      * 1000000) AS BIGINT) AS w_ppm
        |  FROM events CROSS JOIN wm)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(v_milli) AS BIGINT) AS raw_milli,
        |  CAST(sum(v_milli * w_ppm) AS BIGINT) AS decayed_nano,
        |  CAST(CAST(sum(v_milli * w_ppm) AS BIGINT)
        |    // greatest(CAST(sum(v_milli) AS BIGINT), 1) AS BIGINT) AS retained_ppm
        |FROM e GROUP BY event_type
        |ORDER BY decayed_nano DESC, event_type""".stripMargin,

    // Discrete return hazard over per-user inter-event day gaps
    // (capped 14+); survival cumulative runs over the ≤15 bucket rows.
    "q_return_hazard" ->
      """WITH nxt AS (
        |  SELECT ts, lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS next_ts
        |  FROM events),
        |g AS (
        |  SELECT least(date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
        |    CAST(CAST(next_ts AS TIMESTAMP) AS DATE)), 14) AS gap_days
        |  FROM nxt WHERE next_ts IS NOT NULL),
        |b AS (SELECT gap_days, count(*) AS n_returns FROM g GROUP BY gap_days),
        |s AS (
        |  SELECT gap_days, n_returns,
        |    CAST(sum(n_returns) OVER (ORDER BY gap_days
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS survivors
        |  FROM b)
        |SELECT CAST(gap_days AS BIGINT) AS gap_days, n_returns, survivors,
        |  CAST((n_returns * 1000000) // survivors AS BIGINT) AS hazard_ppm
        |FROM s ORDER BY gap_days""".stripMargin,

    // DAU/WAU/MAU stickiness via the bounded-expansion banded join of
    // distinct (user, day) pairs against the observed day grid.
    "q_wau_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day AS grid_day FROM ud),
        |agg AS (
        |  SELECT d.grid_day AS day,
        |    count(DISTINCT CASE WHEN u.day = d.grid_day THEN u.user_id END) AS dau,
        |    count(DISTINCT CASE WHEN date_diff('day', u.day, d.grid_day) <= 6
        |      THEN u.user_id END) AS wau,
        |    count(DISTINCT u.user_id) AS mau
        |  FROM ud u JOIN days d
        |    ON date_diff('day', u.day, d.grid_day) BETWEEN 0 AND 27
        |  GROUP BY d.grid_day)
        |SELECT day, dau, wau, mau,
        |  CAST((dau * 1000000) // wau AS BIGINT) AS dau_wau_ppm,
        |  CAST((wau * 1000000) // mau AS BIGINT) AS wau_mau_ppm
        |FROM agg ORDER BY day""".stripMargin,

    // LSH band-geometry planner: 40-row config enumeration, one pow()
    // chain per row over identical literal operands on both engines.
    "q_lsh_planner" ->
      """WITH b AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS n_bands),
        |s AS (SELECT unnest([50, 60, 70, 80, 90]) AS s_pct)
        |SELECT CAST(n_bands AS BIGINT) AS n_bands,
        |  CAST(128 // n_bands AS BIGINT) AS rows_per_band,
        |  CAST(s_pct AS BIGINT) AS s_pct,
        |  CAST(floor((1.0 - pow(1.0 - pow(s_pct / 100.0, 128 // n_bands), n_bands))
        |       * 1000000) AS BIGINT) AS p_candidate_ppm,
        |  CAST(floor(pow(1.0 / n_bands, 1.0 / (128 // n_bands)) * 1000) AS BIGINT)
        |    AS s_star_milli
        |FROM b, s ORDER BY n_bands, s_pct""".stripMargin,

    // Approximate-FD discovery: counts-only probes, one row per A→B.
    "q_fd_discovery" ->
      """WITH probes AS (
        |  SELECT 'nation' AS tbl, 'n_nationkey' AS det, 'n_name' AS dep, ndv
        |  FROM (SELECT count(DISTINCT n_name) AS ndv FROM nation GROUP BY n_nationkey)
        |  UNION ALL
        |  SELECT 'customer', 'c_custkey', 'c_mktsegment', ndv
        |  FROM (SELECT count(DISTINCT c_mktsegment) AS ndv FROM customer GROUP BY c_custkey)
        |  UNION ALL
        |  SELECT 'customer', 'c_nationkey', 'c_mktsegment', ndv
        |  FROM (SELECT count(DISTINCT c_mktsegment) AS ndv FROM customer GROUP BY c_nationkey)
        |  UNION ALL
        |  SELECT 'part', 'p_brand', 'p_type', ndv
        |  FROM (SELECT count(DISTINCT p_type) AS ndv FROM part GROUP BY p_brand)
        |  UNION ALL
        |  SELECT 'part', 'p_type', 'p_brand', ndv
        |  FROM (SELECT count(DISTINCT p_brand) AS ndv FROM part GROUP BY p_type)
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'o_orderpriority', ndv
        |  FROM (SELECT count(DISTINCT o_orderpriority) AS ndv FROM orders GROUP BY o_custkey)
        |  UNION ALL
        |  SELECT 'events', 'user_id', 'event_type', ndv
        |  FROM (SELECT count(DISTINCT event_type) AS ndv FROM events GROUP BY user_id)
        |  UNION ALL
        |  SELECT 'documents', 'source', 'lang', ndv
        |  FROM (SELECT count(DISTINCT lang) AS ndv FROM documents GROUP BY source))
        |SELECT tbl, det, dep, count(*) AS n_keys, CAST(sum(ndv) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
        |  CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS fd_holds
        |FROM probes GROUP BY tbl, det, dep ORDER BY tbl, det, dep""".stripMargin,

    // Optimizer cardinality-estimate audit for the three fixture FK
    // joins; all-integer arithmetic.
    "q_join_card_est" ->
      """WITH lo AS (
        |  SELECT 'lineitem_orders' AS join_name,
        |    (SELECT count(*) FROM lineitem) AS n_left,
        |    (SELECT count(*) FROM orders) AS n_right,
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS ndv_left,
        |    (SELECT count(DISTINCT o_orderkey) FROM orders) AS ndv_right,
        |    (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |      AS actual_rows),
        |oc AS (
        |  SELECT 'orders_customer' AS join_name,
        |    (SELECT count(*) FROM orders) AS n_left,
        |    (SELECT count(*) FROM customer) AS n_right,
        |    (SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_left,
        |    (SELECT count(DISTINCT c_custkey) FROM customer) AS ndv_right,
        |    (SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey)
        |      AS actual_rows),
        |lp AS (
        |  SELECT 'lineitem_part' AS join_name,
        |    (SELECT count(*) FROM lineitem) AS n_left,
        |    (SELECT count(*) FROM part) AS n_right,
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem) AS ndv_left,
        |    (SELECT count(DISTINCT p_partkey) FROM part) AS ndv_right,
        |    (SELECT count(*) FROM lineitem JOIN part ON l_partkey = p_partkey)
        |      AS actual_rows),
        |u AS (SELECT * FROM lo UNION ALL SELECT * FROM oc UNION ALL SELECT * FROM lp)
        |SELECT join_name, n_left, n_right, ndv_left, ndv_right,
        |  CAST((n_left * n_right) // greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
        |  actual_rows,
        |  CAST((abs(actual_rows - (n_left * n_right) // greatest(ndv_left, ndv_right))
        |        * 1000000) // actual_rows AS BIGINT) AS abs_err_ppm
        |FROM u ORDER BY join_name""".stripMargin,

    // Mutual information over the observed (lang, source) contingency
    // cells; empty cells contribute 0 in the p·ln p limit.
    "q_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |ml AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cl FROM cells GROUP BY lang),
        |ms AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM cells GROUP BY source),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells)
        |SELECT max(nn) AS n_docs, count(*) AS n_cells,
        |  CAST(sum(CAST(
        |    (o / CAST(nn AS DOUBLE)) * ln((o * nn) / CAST(cl * cs AS DOUBLE))
        |  AS DECIMAL(18,12))) AS DOUBLE) AS mi_nats
        |FROM cells JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN n""".stripMargin,

    // Chi-squared contributions per lang over the FULL lang×source
    // grid (absent cells contribute e); one double division per cell.
    "q_chi2_test" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT l.lang, s.source
        |  FROM (SELECT DISTINCT lang FROM documents) l,
        |       (SELECT DISTINCT source FROM documents) s),
        |g AS (
        |  SELECT grid.lang, grid.source, COALESCE(cells.o, 0) AS o
        |  FROM grid LEFT JOIN cells
        |    ON grid.lang = cells.lang AND grid.source = cells.source),
        |ml AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cl FROM g GROUP BY lang),
        |ms AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM g GROUP BY source),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM g)
        |SELECT g.lang, max(cl) AS n_docs, count(*) AS n_cells,
        |  CAST(sum(CAST(
        |    ((o * nn - cl * cs) * (o * nn - cl * cs)) / CAST(nn * cl * cs AS DOUBLE)
        |  AS DECIMAL(18,12))) AS DOUBLE) AS chi2_part
        |FROM g JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN n
        |GROUP BY g.lang ORDER BY g.lang""".stripMargin,

    // SemDeDup threshold sweep: 0.05 cosine bands over the verified
    // embedding near-dup pairs (q_embed_neardup's pair semantics).
    "q_semdedup_sweep" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |p AS (
        |  SELECT vec_a, vec_b,
        |    list_sum([na.e[i] * nb.e[i] for i in range(1, len(na.e) + 1)])
        |      / (na.nrm * nb.nrm) AS c
        |  FROM cand JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b),
        |pr AS (SELECT vec_a, vec_b, round(c, 4) AS cos_sim FROM p WHERE c >= 0.45),
        |bnd AS (
        |  SELECT CAST(floor(cos_sim * 20) AS BIGINT) AS band_x20, vec_a, vec_b FROM pr),
        |agg AS (SELECT band_x20, count(*) AS n_pairs FROM bnd GROUP BY band_x20),
        |vecs AS (SELECT band_x20, count(DISTINCT vec) AS n_vecs FROM (
        |  SELECT band_x20, unnest([vec_a, vec_b]) AS vec FROM bnd)
        |  GROUP BY band_x20)
        |SELECT a.band_x20, a.n_pairs,
        |  CAST(sum(a.n_pairs) OVER (ORDER BY a.band_x20 DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pairs_at_least,
        |  v2.n_vecs
        |FROM agg a JOIN vecs v2 USING (band_x20)
        |ORDER BY a.band_x20""".stripMargin,

    // IVF nprobe sweep: corpus indexed in its ONE nearest cluster;
    // each probe searches its top-np clusters; recall@3 vs brute force.
    "q_ivf_probe_sweep" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |casg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |pasg AS (
        |  SELECT vec_id AS probe_id, cluster, rn AS prank FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8 WHERE b.vec_id < 5)
        |  WHERE rn <= 3),
        |brute AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        list_sum([p.e[i] * c.e[i] for i in range(1, len(p.e) + 1)])
        |          / (p.nrm * c.nrm) DESC, c.vec_id) AS rn
        |    FROM n p JOIN n c ON p.vec_id < 5 AND c.vec_id <> p.vec_id)
        |  WHERE rn <= 3),
        |ivf AS (
        |  SELECT nprobe, probe_id, vec_id FROM (
        |    SELECT np.np AS nprobe, pa.probe_id, ca.vec_id,
        |      row_number() OVER (PARTITION BY np.np, pa.probe_id ORDER BY
        |        list_sum([p.e[i] * c.e[i] for i in range(1, len(p.e) + 1)])
        |          / (p.nrm * c.nrm) DESC, ca.vec_id) AS rn
        |    FROM (VALUES (1), (2), (3)) np(np)
        |    JOIN pasg pa ON pa.prank <= np.np
        |    JOIN casg ca ON ca.cluster = pa.cluster AND ca.vec_id <> pa.probe_id
        |    JOIN n p ON p.vec_id = pa.probe_id
        |    JOIN n c ON c.vec_id = ca.vec_id)
        |  WHERE rn <= 3)
        |SELECT CAST(nprobe AS BIGINT) AS nprobe, count(*) AS n_hits,
        |  CAST((count(*) * 1000000) // 15 AS BIGINT) AS recall_ppm
        |FROM ivf JOIN brute USING (probe_id, vec_id)
        |GROUP BY nprobe ORDER BY nprobe""".stripMargin,

    // Weighted label propagation, 3 synchronous rounds, over the
    // positive-lift co-purchase graph (q_market_basket's pairs).
    "q_label_prop" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
        |m AS (SELECT p_brand, count(*) AS n_x FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2),
        |ed AS (
        |  SELECT brand_a, brand_b, n_ab FROM pairs
        |  JOIN m ma ON ma.p_brand = brand_a JOIN m mb ON mb.p_brand = brand_b
        |  CROSS JOIN no
        |  WHERE n_ab * n_orders > ma.n_x * mb.n_x),
        |e2 AS (SELECT brand_a AS u, brand_b AS v, n_ab FROM ed
        |  UNION ALL SELECT brand_b, brand_a, n_ab FROM ed),
        |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM e2),
        |s0 AS (SELECT e2.u AS node, l0.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l0 ON e2.v = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s0)
        |  WHERE rn = 1),
        |s1 AS (SELECT e2.u AS node, l1.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l1 ON e2.v = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s1)
        |  WHERE rn = 1),
        |s2 AS (SELECT e2.u AS node, l2.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l2 ON e2.v = l2.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s2)
        |  WHERE rn = 1),
        |sz AS (SELECT lbl, count(*) AS community_size FROM l3 GROUP BY lbl)
        |SELECT node AS p_brand, l3.lbl AS community, sz.community_size
        |FROM l3 JOIN sz USING (lbl) ORDER BY p_brand""".stripMargin,

    // Composed graph flagship: lift edges -> 3-round LPA communities
    // -> per-community member/edge/weight/density report.
    "q_graph_insights" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
        |m AS (SELECT p_brand, count(*) AS n_x FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2),
        |ed AS (
        |  SELECT brand_a, brand_b, n_ab FROM pairs
        |  JOIN m ma ON ma.p_brand = brand_a JOIN m mb ON mb.p_brand = brand_b
        |  CROSS JOIN no
        |  WHERE n_ab * n_orders > ma.n_x * mb.n_x),
        |e2 AS (SELECT brand_a AS u, brand_b AS v, n_ab FROM ed
        |  UNION ALL SELECT brand_b, brand_a, n_ab FROM ed),
        |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM e2),
        |s0 AS (SELECT e2.u AS node, l0.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l0 ON e2.v = l0.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s0)
        |  WHERE rn = 1),
        |s1 AS (SELECT e2.u AS node, l1.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l1 ON e2.v = l1.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s1)
        |  WHERE rn = 1),
        |s2 AS (SELECT e2.u AS node, l2.lbl, sum(e2.n_ab) AS w
        |  FROM e2 JOIN l2 ON e2.v = l2.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lbl FROM (SELECT node, lbl,
        |  row_number() OVER (PARTITION BY node ORDER BY w DESC, lbl) AS rn FROM s2)
        |  WHERE rn = 1),
        |sz AS (SELECT lbl, count(*) AS n_members FROM l3 GROUP BY lbl),
        |ie AS (
        |  SELECT la.lbl AS community, count(*) AS n_internal_edges,
        |    CAST(sum(ed.n_ab) AS BIGINT) AS internal_weight
        |  FROM ed JOIN l3 la ON la.node = ed.brand_a
        |  JOIN l3 lb ON lb.node = ed.brand_b
        |  WHERE la.lbl = lb.lbl GROUP BY 1)
        |SELECT sz.lbl AS community, sz.n_members,
        |  coalesce(ie.n_internal_edges, 0) AS n_internal_edges,
        |  coalesce(ie.internal_weight, 0) AS internal_weight,
        |  CAST((2 * coalesce(ie.n_internal_edges, 0) * 1000000)
        |    // greatest(sz.n_members * (sz.n_members - 1), 1) AS BIGINT)
        |    AS density_ppm
        |FROM sz LEFT JOIN ie ON ie.community = sz.lbl
        |ORDER BY community""".stripMargin,

    // Connected components over the MinHash-LSH near-dup pairs
    // (q_minhash_neardup's pair semantics — band-bucketed candidates,
    // exact Jaccard >= 0.5 verify); canonical = min reachable doc_id,
    // DuckDB side via recursive reachability.
    "q_dedup_clusters" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d)
        |SELECT doc_id, canonical_id,
        |  count(*) OVER (PARTITION BY canonical_id) AS cluster_size,
        |  doc_id = canonical_id AS is_canonical
        |FROM lab ORDER BY doc_id""".stripMargin,

    // Same pair + recursive-reachability CTEs as q_dedup_clusters,
    // joined to the quality-score projection: per cluster keep the
    // highest-quality member (ties to the smaller doc_id).
    "q_dedup_keep_best" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d),
        |sized AS (
        |  SELECT doc_id, canonical_id,
        |    count(*) OVER (PARTITION BY canonical_id) AS cluster_size
        |  FROM lab),
        |m AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split_regex(text, '\s+')) AS n_tokens,
        |    len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_symbol_chars,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords
        |  FROM documents),
        |qual AS (
        |  SELECT doc_id,
        |    round(least(1.0, greatest(0.0,
        |      0.5 * least(n_tokens / 20.0, 1.0)
        |      + 0.3 * (1.0 - round(n_symbol_chars / CAST(n_chars AS DOUBLE), 4))
        |      + 0.2 * least(round(n_stopwords / CAST(n_tokens AS DOUBLE), 4) * 5.0, 1.0))), 4)
        |      AS quality_score
        |  FROM m),
        |ranked AS (
        |  SELECT s.canonical_id, s.cluster_size, s.doc_id, q.quality_score,
        |    row_number() OVER (PARTITION BY s.canonical_id
        |      ORDER BY q.quality_score DESC, s.doc_id) AS rn
        |  FROM sized s JOIN qual q ON q.doc_id = s.doc_id)
        |SELECT canonical_id, cluster_size, doc_id AS kept_doc,
        |  quality_score AS kept_quality
        |FROM ranked WHERE rn = 1 ORDER BY canonical_id""".stripMargin,

    // Same pair + recursive-reachability CTEs as q_dedup_clusters,
    // rolled up to the per-size audit report.
    "q_cluster_stats" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d),
        |sized AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY canonical_id) AS cluster_size
        |  FROM lab)
        |SELECT cluster_size,
        |  CAST(count(*) / cluster_size AS BIGINT) AS n_clusters,
        |  CAST(count(*) - count(*) / cluster_size AS BIGINT) AS n_dropped
        |FROM sized GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    // Flagship LLM pipeline: quality filter -> LSH dedup keep-canonical
    // -> content-stable shard + 512-token greedy pack -> shard manifest.
    // Pair/cluster CTEs identical to q_dedup_clusters; pack/shard forms
    // identical to q_pack_greedy/q_shard_assign.
    "q_training_pipeline" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, n_chars, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d),
        |kept AS (
        |  SELECT t.doc_id, len(t.tk) AS n_tokens
        |  FROM tkt t LEFT JOIN lab l ON t.doc_id = l.doc_id
        |  WHERE t.n_chars >= 100 AND len(t.tk) >= 20
        |    AND (l.doc_id IS NULL OR l.doc_id = l.canonical_id)),
        |packed AS (
        |  SELECT substr(md5('shard:' || doc_id), 1, 1) AS shard, doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (
        |      PARTITION BY substr(md5('shard:' || doc_id), 1, 1) ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS bin_id
        |  FROM kept)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  count(DISTINCT bin_id) AS n_bins, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM packed GROUP BY shard ORDER BY shard""".stripMargin,

    "q_rolling_time" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  count(*) OVER w AS n_24h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_full_outer" ->
      """WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
        |e AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
        |SELECT COALESCE(o_custkey, user_id) AS join_key,
        |  COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events
        |FROM o FULL JOIN e ON o_custkey = user_id
        |ORDER BY join_key""".stripMargin,

    "q_surrogate_key" ->
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS sk
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_upsert_compact" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  ts AS last_ts, value AS last_value FROM (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_zscore_outliers" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, s / n AS mean,
        |    sqrt((s2 - s * s / n) / (n - 1)) AS std
        |  FROM st)
        |SELECT e.event_type, e.event_id, e.value,
        |  round(m.mean, 4) AS mean, round(m.std, 4) AS std,
        |  round((e.value - m.mean) / m.std, 4) AS z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs((e.value - m.mean) / m.std) > 2.5
        |ORDER BY e.event_type, e.event_id""".stripMargin,

    "q_simhash_neardup" ->
      """WITH t AS (
        |  SELECT doc_id, [md5(x) for x in string_split_regex(text, '\s+')] AS tm
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string([CASE WHEN list_sum(
        |        [CASE WHEN substr(m, b, 1) >= '8' THEN 1 ELSE -1 END for m in tm]) > 0
        |      THEN '1' ELSE '0' END for b in range(1, 33)], '') AS simhash
        |  FROM t),
        |bands AS (
        |  SELECT doc_id, simhash, b AS band_idx, substr(simhash, 8*b + 1, 8) AS band_val
        |  FROM sig CROSS JOIN range(4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |   AND a.doc_id < b.doc_id),
        |h AS (
        |  SELECT doc_a, doc_b,
        |    CAST(list_sum([CASE WHEN substr(sa, i, 1) <> substr(sb, i, 1)
        |      THEN 1 ELSE 0 END for i in range(1, 33)]) AS BIGINT) AS hamming
        |  FROM cand)
        |SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_group_sample" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY substr(md5('gs:' || doc_id), 1, 13), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,

    "q_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    list_sum([(strpos('0123456789abcdef',
        |                 substr(md5('wsmp:' || doc_id), i, 1)) - 1)
        |               * pow(16.0, 13 - i) for i in range(1, 14)]) AS u52
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, n_chars,
        |    pow(u52 / CAST(4503599627370496 AS DOUBLE),
        |        CAST(1 AS DOUBLE) / n_chars) AS key
        |  FROM s)
        |SELECT doc_id, n_chars, round(key, 6) AS priority
        |FROM k ORDER BY key DESC, doc_id LIMIT 20""".stripMargin,

    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, i, substring(text, i, 1) AS fr
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, CAST(length(text) AS INT) + 1, 4)) AS i
        |        FROM documents))
        |SELECT doc_id, count(*) AS n_frames,
        |  md5(string_agg(fr, '' ORDER BY i)) AS frames_md5
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Video near-dup by sampled-frame fingerprint overlap: md5 of
    // each 8-byte payload window at stride 4, boilerplate
    // fingerprints (df > 64) dropped, pairs sharing >= 2 kept.
    "q_frame_dedup" ->
      """WITH f AS (
        |  SELECT DISTINCT doc_id, substring(text, i, 8) AS fp
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, CAST(length(text) AS INT) - 6, 4)) AS i
        |        FROM documents WHERE length(text) >= 8)),
        |keep AS (SELECT fp FROM (
        |  SELECT fp, count(*) AS df FROM f GROUP BY fp) WHERE df <= 64),
        |k AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang, source,
        |  substr(md5('smpl:' || doc_id), 1, 4) AS hk
        |FROM documents
        |WHERE substr(md5('smpl:' || doc_id), 1, 4)
        |  < CASE WHEN lang = 'en' THEN '1999' ELSE '6666' END
        |ORDER BY doc_id""".stripMargin,

    "q_data_split" ->
      """WITH s AS (
        |  SELECT source, n_chars, doc_id,
        |    CASE WHEN substr(md5('split:' || doc_id), 1, 1) <= 'c' THEN 'train'
        |         WHEN substr(md5('split:' || doc_id), 1, 1) <= 'e' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_doc
        |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q_mix_weights" ->
      """WITH b AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(sum_chars) AS BIGINT) AS total_chars,
        |        count(*) AS n_sources FROM b)
        |SELECT source, n_docs, sum_chars,
        |  round(CAST(total_chars AS DOUBLE) / n_sources / sum_chars, 4) AS weight
        |FROM b, t ORDER BY source""".stripMargin,

    "q_upsample_plan" ->
      """WITH b AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(sum_chars) AS BIGINT) AS total_chars,
        |        count(*) AS n_sources FROM b),
        |p AS (
        |  SELECT source, n_docs,
        |    CAST(floor(CAST(total_chars AS DOUBLE) / n_sources / sum_chars)
        |      AS BIGINT) AS epochs,
        |    CAST(floor((CAST(total_chars AS DOUBLE) / n_sources / sum_chars
        |        - floor(CAST(total_chars AS DOUBLE) / n_sources / sum_chars))
        |      * 65536) AS BIGINT) AS frac_scaled
        |  FROM b, t),
        |hk AS (
        |  SELECT source,
        |    list_sum([(strpos('0123456789abcdef',
        |                 substr(md5('up:' || doc_id), i, 1)) - 1)
        |              * pow(16.0, 4 - i) for i in range(1, 5)]) AS hk
        |  FROM documents),
        |e AS (
        |  SELECT h.source, count(*) AS n_extra
        |  FROM hk h JOIN p USING (source)
        |  WHERE h.hk < p.frac_scaled GROUP BY h.source)
        |SELECT p.source, p.n_docs, p.epochs, p.frac_scaled,
        |  COALESCE(e.n_extra, 0) AS n_extra,
        |  p.epochs * p.n_docs + COALESCE(e.n_extra, 0) AS n_sampled
        |FROM p LEFT JOIN e ON p.source = e.source
        |ORDER BY p.source""".stripMargin,

    "q_boilerplate" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |ph AS (
        |  SELECT DISTINCT doc_id, unnest([array_to_string(tk[i:i+4], ' ')
        |    for i in range(1, len(tk) - 3)]) AS phrase
        |  FROM tkt WHERE len(tk) >= 5)
        |SELECT phrase, count(*) AS df FROM ph GROUP BY phrase
        |HAVING count(*) >= 3 ORDER BY df DESC, phrase""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    // q_json_config round-trips the nation dim through a multiLine JSON
    // config document; the oracle is the dim itself.
    "q_json_config" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_from_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "q_cosine_topk" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |p AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |r AS (
        |  SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |  FROM p)
        |SELECT probe_id, vec_id, round(c, 4) AS cos_sim, rn
        |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    // Pairwise cosine between per-label embedding centroids (the
    // class-confusability matrix); q_embed_outliers' centroid recipe.
    "q_label_separability" ->
      """WITH v AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |x AS (
        |  SELECT label, s.dim, s.x FROM (
        |    SELECT label,
        |      unnest([{'dim': i, 'x': e[i + 1]} for i in range(0, len(e))]) AS s
        |    FROM v)),
        |cm AS (
        |  SELECT label, dim,
        |    CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      / count(*) AS m
        |  FROM x GROUP BY label, dim),
        |cent AS (SELECT label, list(m ORDER BY dim) AS c FROM cm GROUP BY label),
        |cnt AS (SELECT label, count(*) AS n_vecs FROM v GROUP BY label),
        |cc AS (
        |  SELECT cent.label, cent.c,
        |    sqrt(list_sum([y * y for y in cent.c])) AS cn, cnt.n_vecs
        |  FROM cent JOIN cnt USING (label))
        |SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
        |  a.n_vecs AS n_a, b.n_vecs AS n_b,
        |  round(list_sum([a.c[i] * b.c[i] for i in range(1, len(a.c) + 1)])
        |    / (a.cn * b.cn), 4) AS cent_cos
        |FROM cc a JOIN cc b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,

    "q_embed_outliers" ->
      """WITH v AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |x AS (
        |  SELECT label, s.dim, s.x FROM (
        |    SELECT label,
        |      unnest([{'dim': i, 'x': e[i + 1]} for i in range(0, len(e))]) AS s
        |    FROM v)),
        |cm AS (
        |  SELECT label, dim,
        |    CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      / count(*) AS m
        |  FROM x GROUP BY label, dim),
        |cent AS (SELECT label, list(m ORDER BY dim) AS c FROM cm GROUP BY label),
        |sc AS (
        |  SELECT v.vec_id, v.label,
        |    list_sum([v.e[i] * c.c[i] for i in range(1, len(v.e) + 1)])
        |      / (sqrt(list_sum([y * y for y in v.e]))
        |         * sqrt(list_sum([y * y for y in c.c]))) AS cos
        |  FROM v JOIN cent c USING (label)),
        |cnt AS (SELECT label, count(*) AS n_vecs FROM v GROUP BY label),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY cos, vec_id) AS rn
        |  FROM sc)
        |SELECT CAST(rk.label AS BIGINT) AS label, cnt.n_vecs,
        |  rk.vec_id AS outlier_vec,
        |  round(rk.cos, 4) AS outlier_cos
        |FROM rk JOIN cnt ON rk.label = cnt.label
        |WHERE rn = 1 ORDER BY rk.label""".stripMargin,

    // Norm mean ships as (exact decimal sum string, count): no derived
    // double in the checked surface (the q_kmeans_step lesson).
    "q_embedding_stats" ->
      """WITH v AS (
        |  SELECT label, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT label, len(e) AS dim,
        |    sqrt(list_sum([x * x for x in e])) AS nrm FROM v)
        |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
        |  min(dim) AS min_dim, max(dim) AS max_dim,
        |  CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm,
        |  CAST(sum(CAST(nrm AS DECIMAL(18,6))) AS VARCHAR) AS norm_sum
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    // Random projection: signs are a pure function of (out_dim,
    // in_dim) via md5 first-hex-digit parity; each projection is one
    // list_sum left-fold ≡ vec_dot — bit-identical doubles.
    "q_rand_project" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |sg AS (
        |  SELECT j.out_dim,
        |    [CASE WHEN substr(md5('rp:' || out_dim || ':' || i), 1, 1)
        |               IN ('0','2','4','6','8','a','c','e')
        |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
        |     for i in range(0, 64)] AS s
        |  FROM range(16) j(out_dim))
        |SELECT v.vec_id, sg.out_dim,
        |  round(list_sum([v.e[i] * sg.s[i] for i in range(1, 65)]), 4) AS proj
        |FROM v CROSS JOIN sg ORDER BY vec_id, out_dim""".stripMargin,

    // Scalar quantization calibration: min/max are selection-only;
    // the code is one fixed double expression tree with an integer
    // floor — no reassociation, no HALF_UP edge.
    "q_scalar_quant" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |xs AS (
        |  SELECT vec_id, t.i - 1 AS dim, e[t.i] AS x
        |  FROM v CROSS JOIN range(1, 65) t(i)),
        |grid AS (
        |  SELECT dim, min(x) AS mn, max(x) AS mx FROM xs GROUP BY dim),
        |coded AS (
        |  SELECT xs.dim, xs.x, grid.mn, grid.mx,
        |    CAST(CASE WHEN mx = mn THEN 0
        |         ELSE floor((x - mn) * CAST(255.0 AS DOUBLE) / (mx - mn)) END
        |      AS INT) AS code
        |  FROM xs JOIN grid USING (dim))
        |SELECT dim, count(*) AS n_vals,
        |  round(min(mn), 4) AS mn_r, round(max(mx), 4) AS mx_r,
        |  CAST(sum(code) AS BIGINT) AS sum_code,
        |  CAST(sum(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |FROM coded GROUP BY dim ORDER BY dim""".stripMargin,

    // ANN recall@3: IVF top-3 (cluster-restricted) overlapped with the
    // brute-force top-3 per probe — composes the q_ann_ivf and
    // q_cosine_topk CTEs; metric is exact integer ppm.
    "q_ann_recall" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster, eb, nb FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster, b.e AS eb, b.nrm AS nb,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |pr AS (
        |  SELECT vec_id AS probe_id, cluster, eb AS ea, nb AS na
        |  FROM asg WHERE vec_id < 5),
        |sc AS (
        |  SELECT pr.probe_id, asg.vec_id,
        |    list_sum([pr.ea[i] * asg.eb[i] for i in range(1, len(pr.ea) + 1)])
        |      / (pr.na * asg.nb) AS c
        |  FROM pr JOIN asg ON pr.cluster = asg.cluster AND asg.vec_id <> pr.probe_id),
        |ivf AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |    FROM sc) WHERE rn <= 3),
        |bp AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |bt AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |    FROM bp) WHERE rn <= 3)
        |SELECT bt.probe_id, count(*) AS k,
        |  CAST(sum(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hit,
        |  CAST(sum(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // count(*) AS recall_ppm
        |FROM bt LEFT JOIN ivf
        |  ON bt.probe_id = ivf.probe_id AND bt.vec_id = ivf.vec_id
        |GROUP BY bt.probe_id ORDER BY bt.probe_id""".stripMargin,

    // NDCG@3 of the IVF ranking vs brute-force graded relevance:
    // same IVF/brute CTEs as q_ann_recall, pre-floored integer
    // discount weights (no libm in the checked surface), constant
    // IDCG over the (5,4,3) ideal grades.
    "q_ndcg_eval" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster, eb, nb FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster, b.e AS eb, b.nrm AS nb,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |pr AS (
        |  SELECT vec_id AS probe_id, cluster, eb AS ea, nb AS na
        |  FROM asg WHERE vec_id < 5),
        |sc AS (
        |  SELECT pr.probe_id, asg.vec_id,
        |    list_sum([pr.ea[i] * asg.eb[i] for i in range(1, len(pr.ea) + 1)])
        |      / (pr.na * asg.nb) AS c
        |  FROM pr JOIN asg ON pr.cluster = asg.cluster AND asg.vec_id <> pr.probe_id),
        |ivf AS (
        |  SELECT probe_id, vec_id, rn FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |    FROM sc) WHERE rn <= 3),
        |bp AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |bt AS (
        |  SELECT probe_id, vec_id, 6 - rn AS rel FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |    FROM bp) WHERE rn <= 5),
        |j AS (
        |  SELECT ivf.probe_id, COALESCE(bt.rel, 0) AS rel,
        |    CASE ivf.rn WHEN 1 THEN 1000000 WHEN 2 THEN 630929
        |      ELSE 500000 END AS w
        |  FROM ivf LEFT JOIN bt
        |    ON bt.probe_id = ivf.probe_id AND bt.vec_id = ivf.vec_id)
        |SELECT probe_id, count(*) AS k,
        |  CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_graded,
        |  CAST(sum(rel * w) AS BIGINT) AS dcg_milli,
        |  CAST(sum(rel * w) AS BIGINT) * 1000000 // 9023716 AS ndcg_ppm
        |FROM j GROUP BY probe_id ORDER BY probe_id""".stripMargin,

    // Hard negatives: cosine top-5 restricted to label-mismatched
    // candidates; same vec_dot fold parity as q_cosine_topk.
    "q_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, e,
        |    sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |p AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id, b.label AS neg_label,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b
        |    ON a.vec_id < 5 AND b.vec_id <> a.vec_id AND b.label <> a.label),
        |r AS (
        |  SELECT probe_id, vec_id, neg_label, c,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |  FROM p)
        |SELECT probe_id, rn, vec_id, CAST(neg_label AS BIGINT) AS neg_label,
        |  round(c, 4) AS cos_sim
        |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    // MMR greedy diversity re-rank: 4 unrolled selection steps (the
    // q_pagerank generated-CTE pattern); rel/sim/score are the proven
    // bit-identical double folds, picks are selection-only.
    "q_mmr_rerank" -> Similarity.mmrOracleSql,

    "q_knn_classify" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |p AS (
        |  SELECT a.vec_id AS probe_id, b.vec_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10),
        |r AS (
        |  SELECT probe_id, vec_id,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |  FROM p),
        |votes AS (
        |  SELECT probe_id, e.label, count(*) AS votes
        |  FROM r JOIN embeddings e USING (vec_id)
        |  WHERE rn <= 5 GROUP BY probe_id, e.label),
        |w AS (
        |  SELECT probe_id, label, votes,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) AS rw
        |  FROM votes)
        |SELECT w.probe_id, CAST(t.label AS BIGINT) AS true_label,
        |  CAST(w.label AS BIGINT) AS pred_label, w.votes
        |FROM w JOIN embeddings t ON t.vec_id = w.probe_id
        |WHERE w.rw = 1 ORDER BY probe_id""".stripMargin,

    "q_ann_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster, eb, nb FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster, b.e AS eb, b.nrm AS nb,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |pr AS (
        |  SELECT vec_id AS probe_id, cluster, eb AS ea, nb AS na
        |  FROM asg WHERE vec_id < 5),
        |sc AS (
        |  SELECT pr.probe_id, pr.cluster, asg.vec_id,
        |    list_sum([pr.ea[i] * asg.eb[i] for i in range(1, len(pr.ea) + 1)])
        |      / (pr.na * asg.nb) AS c
        |  FROM pr JOIN asg ON pr.cluster = asg.cluster AND asg.vec_id <> pr.probe_id),
        |r AS (
        |  SELECT probe_id, cluster, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |  FROM sc)
        |SELECT probe_id, cluster, vec_id, round(c, 4) AS cos_sim, rn
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,

    // IVF cell-balance audit over the same deterministic assignment.
    "q_ivf_balance" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn = 1),
        |sizes AS (SELECT cluster, count(*) AS n_vecs FROM asg GROUP BY cluster),
        |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total, count(*) AS k FROM sizes)
        |SELECT cluster, n_vecs,
        |  CAST((n_vecs * 1000000) // n_total AS BIGINT) AS share_ppm,
        |  CAST((n_vecs * k * 1000000) // n_total AS BIGINT) AS load_ppm
        |FROM sizes CROSS JOIN t ORDER BY cluster""".stripMargin,

    // IVF assignment margin: per-vector best-vs-second centroid gap,
    // averaged per cell with a decimal-pinned sum.
    "q_ivf_margin" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |sc AS (
        |  SELECT b.vec_id, a.vec_id AS centroid_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |      / (a.nrm * b.nrm) AS c
        |  FROM n b JOIN n a ON a.vec_id < 8),
        |rk AS (
        |  SELECT vec_id, centroid_id, c,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, centroid_id) AS rn
        |  FROM sc),
        |m AS (
        |  SELECT r1.vec_id, r1.centroid_id AS cluster, r1.c - r2.c AS margin
        |  FROM rk r1 JOIN rk r2 ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2),
        |edge AS (
        |  SELECT cluster, vec_id,
        |    row_number() OVER (PARTITION BY cluster ORDER BY margin, vec_id) AS r
        |  FROM m)
        |SELECT m.cluster, count(*) AS n_vecs,
        |  CAST(sum(CAST(m.margin AS DECIMAL(18,12))) AS DOUBLE) / count(*)
        |    AS avg_margin,
        |  min(m.margin) AS min_margin,
        |  CAST(max(CASE WHEN e.r = 1 THEN e.vec_id END) AS BIGINT) AS edge_vec
        |FROM m JOIN edge e ON m.cluster = e.cluster AND m.vec_id = e.vec_id
        |GROUP BY m.cluster ORDER BY m.cluster""".stripMargin,

    // Degree distribution of the positive-lift brand co-purchase
    // graph (the raw co-occurrence graph is complete at sf≥0.01).
    "q_degree_dist" ->
      """WITH bb AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM bb),
        |m AS (SELECT p_brand, count(*) AS n_x FROM bb GROUP BY 1),
        |pairs AS (
        |  SELECT x.p_brand AS a, y.p_brand AS b, count(*) AS n_ab
        |  FROM bb x JOIN bb y
        |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT a, b FROM pairs
        |  JOIN m ma ON ma.p_brand = a JOIN m mb ON mb.p_brand = b CROSS JOIN n
        |  WHERE n_ab * n_orders > ma.n_x * mb.n_x),
        |deg AS (
        |  SELECT v, count(*) AS degree FROM (
        |    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        |  GROUP BY v),
        |hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree),
        |t AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM hist)
        |SELECT CAST(degree AS BIGINT) AS degree, n_nodes,
        |  CAST(sum(n_nodes) OVER (ORDER BY degree DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nodes_ge,
        |  CAST((n_nodes * 1000000) // n_total AS BIGINT) AS share_ppm
        |FROM hist CROSS JOIN t ORDER BY degree""".stripMargin,

    // Degree assortativity of the lift graph; signed milli division
    // spelled out as truncation-toward-zero in both engines.
    "q_assortativity" ->
      """WITH bb AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM bb),
        |m AS (SELECT p_brand, count(*) AS n_x FROM bb GROUP BY 1),
        |pairs AS (
        |  SELECT x.p_brand AS a, y.p_brand AS b, count(*) AS n_ab
        |  FROM bb x JOIN bb y
        |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT a, b FROM pairs
        |  JOIN m ma ON ma.p_brand = a JOIN m mb ON mb.p_brand = b CROSS JOIN n
        |  WHERE n_ab * n_orders > ma.n_x * mb.n_x),
        |deg AS (
        |  SELECT v, count(*) AS dg FROM (
        |    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        |  GROUP BY v),
        |e2 AS (
        |  SELECT da.dg AS x, db.dg AS y
        |  FROM edges JOIN deg da ON da.v = a JOIN deg db ON db.v = b
        |  UNION ALL
        |  SELECT db.dg, da.dg
        |  FROM edges JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
        |s AS (
        |  SELECT count(*) AS n_pairs, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM e2)
        |SELECT n_pairs, sx, sxy, sxx,
        |  CAST(CASE WHEN n_pairs * sxy - sx * sx >= 0
        |    THEN (1000 * (n_pairs * sxy - sx * sx)) // (n_pairs * sxx - sx * sx)
        |    ELSE -((1000 * (sx * sx - n_pairs * sxy)) // (n_pairs * sxx - sx * sx))
        |  END AS BIGINT) AS assort_milli
        |FROM s""".stripMargin,

    // All-pairs source vocabulary Jaccard (inverted-index shape).
    "q_source_jaccard" ->
      """WITH stc AS (
        |  SELECT DISTINCT source, term FROM (
        |    SELECT source, unnest(string_split_regex(text, '\s+')) AS term
        |    FROM documents)),
        |v AS (SELECT source, count(*) AS n_terms FROM stc GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
        |  FROM stc a JOIN stc b ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_common,
        |  CAST(va.n_terms + vb.n_terms - n_common AS BIGINT) AS n_union,
        |  CAST((n_common * 1000000) // (va.n_terms + vb.n_terms - n_common)
        |    AS BIGINT) AS jaccard_ppm
        |FROM pairs
        |JOIN v va ON va.source = source_a JOIN v vb ON vb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // Gap-driven hourly backfill plan with buffered query bounds.
    "q_backfill_chunks" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(CAST(prev_ts AS TIMESTAMP)) // 3600000000 AS h0,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h1
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM events)
        |  WHERE prev_ts IS NOT NULL
        |    AND epoch_us(CAST(ts AS TIMESTAMP))
        |      - epoch_us(CAST(prev_ts AS TIMESTAMP)) > 300000000),
        |c AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_idx FROM g),
        |a AS (
        |  SELECT user_id, hour_idx, count(*) AS n_gaps_covered
        |  FROM c GROUP BY 1, 2)
        |SELECT user_id,
        |  make_timestamp(hour_idx * 3600000000) AS chunk_start,
        |  make_timestamp((hour_idx + 1) * 3600000000 - 1) AS chunk_end_inc,
        |  make_timestamp(hour_idx * 3600000000 - 120000000) AS query_start,
        |  make_timestamp((hour_idx + 1) * 3600000000 + 120000000) AS query_end,
        |  n_gaps_covered
        |FROM a ORDER BY user_id, chunk_start""".stripMargin,

    // Daily close with carry-forward over the user × day grid.
    "q_daily_close" ->
      """WITH pd AS (
        |  SELECT user_id, day, value AS close FROM (
        |    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value,
        |      row_number() OVER (
        |        PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |grid AS (
        |  SELECT u.user_id, dd.day
        |  FROM (SELECT DISTINCT user_id FROM events) u,
        |    (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |     FROM events) dd),
        |f AS (
        |  SELECT g.user_id, g.day, pd.close,
        |    last_value(pd.close IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM grid g LEFT JOIN pd ON g.user_id = pd.user_id AND g.day = pd.day)
        |SELECT user_id, day,
        |  CAST(floor(filled * 1000) AS BIGINT) AS close_milli,
        |  close IS NULL AS is_carried
        |FROM f WHERE filled IS NOT NULL
        |ORDER BY user_id, day""".stripMargin,

    // Per-user behavioral entropy over event types (qEntropy recipe).
    "q_user_entropy" ->
      """WITH cells AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1)
        |SELECT c.user_id, max(t.n) AS n_events, count(*) AS n_types,
        |  - CAST(sum(CAST((c.c / t.n) * ln(c.c / t.n) AS DECIMAL(18,12))) AS DOUBLE)
        |    AS entropy,
        |  CAST((CAST(max(c.c) AS BIGINT) * 1000000) // max(t.n) AS BIGINT)
        |    AS top_share_ppm
        |FROM cells c JOIN t ON c.user_id = t.user_id
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

    "q_ann_lsh" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |hp AS (SELECT vec_id - 8 AS h, e AS he FROM v WHERE vec_id >= 8 AND vec_id < 24),
        |sig AS (
        |  SELECT b.vec_id,
        |    sum(CASE WHEN list_sum([hp.he[i] * b.e[i] for i in range(1, len(b.e) + 1)]) >= 0
        |         THEN CAST(1 << h AS BIGINT) ELSE 0 END) AS sig
        |  FROM v b CROSS JOIN hp GROUP BY b.vec_id),
        |bands AS (
        |  SELECT vec_id, band_idx, (sig // p) % 16 AS band_val
        |  FROM sig CROSS JOIN (VALUES (0, 1), (1, 16), (2, 256), (3, 4096)) t(band_idx, p)),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id
        |  FROM bands p JOIN bands c
        |    ON p.band_idx = c.band_idx AND p.band_val = c.band_val
        |  WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id),
        |sc AS (
        |  SELECT probe_id, cand.vec_id,
        |    list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)]) / (a.nrm * b.nrm) AS c
        |  FROM cand JOIN n a ON a.vec_id = probe_id JOIN n b ON b.vec_id = cand.vec_id),
        |r AS (
        |  SELECT probe_id, vec_id, c,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, vec_id) AS rn
        |  FROM sc)
        |SELECT probe_id, vec_id, round(c, 4) AS cos_sim, rn
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,

    // Bucketed semantics: candidate pairs share one of their top-2 IVF
    // clusters (multi-probe nprobe=2, same assignment rule as
    // q_ann_ivf), exact cosine verifies candidates — the engine's
    // 100 TB shape; brute-force all-pairs is spec-only ground truth.
    "q_embed_neardup" ->
      """WITH v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |p AS (
        |  SELECT vec_a, vec_b,
        |    list_sum([na.e[i] * nb.e[i] for i in range(1, len(na.e) + 1)])
        |      / (na.nrm * nb.nrm) AS c
        |  FROM cand JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b)
        |SELECT vec_a, vec_b, round(c, 4) AS cos_sim
        |FROM p WHERE c >= 0.45 ORDER BY vec_a, vec_b""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, lang, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The corpus is pure ASCII (asserted in SinkSourceSpec), so DuckDB
    // codepoints equal the engine's UTF-8 bytes and the stubbed
    // byte-histogram decode is exactly checkable.
    "q_multimodal_features" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |    [ascii(substr(text, i, 1)) // 64 for i in range(1, length(text) + 1)] AS bs
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, CAST(b.bucket AS BIGINT) AS bucket,
        |    len(list_filter(bs, x -> x = b.bucket)) AS n_in_bucket, n_bytes
        |  FROM c CROSS JOIN (VALUES (0), (1), (2), (3)) b(bucket))
        |SELECT doc_id, bucket, n_in_bucket, n_bytes,
        |  round(n_in_bucket / CAST(greatest(n_bytes, 1) AS DOUBLE), 4) AS share
        |FROM e ORDER BY doc_id, bucket""".stripMargin,

    // 2x2 block-average resize of the 16-wide fake image; all-integer
    // arithmetic (div 4 block mean), ord ≡ ascii on the ASCII corpus.
    "q_image_resize" ->
      """WITH b2 AS (
        |  SELECT doc_id, text AS t,
        |    least(length(text) // 16, 16) // 2 AS h2
        |  FROM documents
        |  WHERE least(length(text) // 16, 16) // 2 >= 1),
        |px AS (
        |  SELECT doc_id, h2,
        |    (ord(substr(t, ((k.i // 8) * 2) * 16 + (k.i % 8) * 2 + 1, 1))
        |     + ord(substr(t, ((k.i // 8) * 2) * 16 + (k.i % 8) * 2 + 2, 1))
        |     + ord(substr(t, ((k.i // 8) * 2 + 1) * 16 + (k.i % 8) * 2 + 1, 1))
        |     + ord(substr(t, ((k.i // 8) * 2 + 1) * 16 + (k.i % 8) * 2 + 2, 1)))
        |      // 4 AS px
        |  FROM b2 CROSS JOIN range(0, 128) k(i)
        |  WHERE k.i < h2 * 8)
        |SELECT doc_id, max(h2) AS out_h, count(*) AS n_px,
        |  CAST(sum(px) AS BIGINT) AS px_sum,
        |  CAST(min(px) AS BIGINT) AS px_min, CAST(max(px) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_acquisition_plan" ->
      """WITH eod AS (
        |  SELECT date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS day_end FROM events),
        |d2 AS (SELECT day_end, day_end - INTERVAL 1 DAY AS day_start FROM eod),
        |dims AS (SELECT r_name AS network, n_name AS station, n_nationkey AS station_key
        |         FROM region CROSS JOIN nation),
        |chunks AS (
        |  SELECT network, station, station_key, day_start, day_end,
        |    unnest(generate_series(day_start, day_end - INTERVAL 1 HOUR,
        |                           INTERVAL 1 HOUR)) AS chunk_start
        |  FROM dims CROSS JOIN d2),
        |bounded AS (
        |  SELECT *, GREATEST(day_start, chunk_start - INTERVAL 120 SECOND) AS query_start,
        |    LEAST(day_end, chunk_start + INTERVAL 62 MINUTE) AS query_end
        |  FROM chunks),
        |resolved AS (
        |  SELECT b.*, '10.147.20.' || n.n_nationkey || ':8080' AS sensor_ip
        |  FROM bounded b JOIN nation n ON b.station_key = n.n_nationkey)
        |SELECT network, station, chunk_start, query_start, query_end, sensor_ip,
        |  'http://' || sensor_ip || '/data?channel=' || network || '.' || station
        |    || '.00.HHZ' || '&from=' || CAST(epoch(query_start) AS BIGINT)
        |    || '&to=' || CAST(epoch(query_end) AS BIGINT) AS url,
        |  network || '.' || station || '.00.HHZ.'
        |    || strftime(chunk_start, '%Y%m%dT%H%M%S') || '.mseed' AS filename
        |FROM resolved
        |ORDER BY network, station, chunk_start""".stripMargin,

    // Degree-oriented triangle counting; (degree, name) row-value
    // comparisons mirror Spark's struct ordering exactly.
    "q_triangles" ->
      """WITH bb AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |edges AS (
        |  SELECT DISTINCT x.p_brand AS a, y.p_brand AS b
        |  FROM bb x JOIN bb y
        |    ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand),
        |deg AS (
        |  SELECT v, count(*) AS dg FROM (
        |    SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        |  GROUP BY v),
        |o AS (
        |  SELECT
        |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN e.a ELSE e.b END AS src,
        |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN e.b ELSE e.a END AS dst,
        |    CASE WHEN (da.dg, e.a) < (db.dg, e.b) THEN db.dg ELSE da.dg END AS dst_dg
        |  FROM edges e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
        |tri AS (
        |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
        |  FROM o e1 JOIN o e2
        |    ON e1.src = e2.src
        |    AND (e1.dst_dg, e1.dst) < (e2.dst_dg, e2.dst)
        |  JOIN o c ON c.src = e1.dst AND c.dst = e2.dst)
        |SELECT p_brand, count(*) AS n_triangles FROM (
        |  SELECT u AS p_brand FROM tri
        |  UNION ALL SELECT v AS p_brand FROM tri
        |  UNION ALL SELECT w AS p_brand FROM tri)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
        |m AS (SELECT p_brand, count(*) AS n_x FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_ab, ma.n_x AS n_a, mb.n_x AS n_b,
        |  (n_ab * n_orders * 1000000) // (ma.n_x * mb.n_x) AS lift_ppm
        |FROM pairs
        |JOIN m ma ON ma.p_brand = brand_a
        |JOIN m mb ON mb.p_brand = brand_b
        |CROSS JOIN n
        |ORDER BY lift_ppm DESC, brand_a, brand_b""".stripMargin,

    "q_fuzzy_join" ->
      """WITH names AS (
        |  SELECT p_name, count(*) AS n_parts, string_split(p_name, ' ')[-1] AS noun
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
        |  a.n_parts AS parts_a, b.n_parts AS parts_b
        |FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "q_cdc_apply" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops,
        |    count(CASE WHEN event_type = 'error' THEN 1 END)
        |      OVER (PARTITION BY user_id) AS n_deletes
        |  FROM ev)
        |SELECT user_id, event_type AS last_op, value AS last_value,
        |  ts AS updated_at, n_ops, n_deletes
        |FROM w WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q_ewma" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        |r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev),
        |t AS (
        |  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(1 AS BIGINT) << (8 - rn) AS w
        |  FROM r WHERE rn <= 8)
        |SELECT user_id, count(*) AS n_recent, CAST(sum(w) AS BIGINT) AS den,
        |  CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS BIGINT) AS ewma
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_pagerank" -> pagerankOracle,

    // Semi-naive BFS ≡ min-hop per node: the recursive CTE re-derives
    // nodes at every hop that reaches them; min(hop) collapses to the
    // BFS level the frontier/anti-join evaluation assigns directly.
    "q_khop_reach" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        |edges AS (
        |  SELECT 'p' || p AS src, 's' || s AS dst FROM e
        |  UNION ALL
        |  SELECT 's' || s AS src, 'p' || p AS dst FROM e),
        |walk AS (
        |  SELECT 'p' || p_partkey AS node, 0 AS hop
        |  FROM part WHERE p_partkey < 5
        |  UNION ALL
        |  SELECT g.dst AS node, w.hop + 1 AS hop
        |  FROM walk w JOIN edges g ON g.src = w.node WHERE w.hop < 3)
        |SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM walk GROUP BY node
        |ORDER BY node""".stripMargin,

    // Inverted-index formulation — same rewrite and rationale as the
    // q_ngram_jaccard oracle above: a zero-common pair has containment
    // 0 ppm and can never reach the 800000 cut, so the equi-join form
    // is result-identical while staying K=10-checkable.
    "q_containment" ->
      """WITH tkt AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |shx AS (SELECT doc_id, lang, unnest(s) AS shingle FROM sh),
        |szs AS (SELECT doc_id, lang, len(s) AS sz FROM sh),
        |com AS (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_common
        |  FROM shx a JOIN shx b ON a.lang = b.lang AND a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT com.lang, doc_a, doc_b, n_common,
        |    (n_common * 1000000) // least(sa.sz, sb.sz) AS containment_ppm
        |  FROM com
        |  JOIN szs sa ON sa.doc_id = com.doc_a AND sa.lang = com.lang
        |  JOIN szs sb ON sb.doc_id = com.doc_b AND sb.lang = com.lang)
        |SELECT lang, doc_a, doc_b, n_common, containment_ppm FROM j
        |WHERE containment_ppm >= 800000
        |ORDER BY lang, doc_a, doc_b""".stripMargin,

    // File-skipping dividend: both layouts judged by the same min/max
    // overlap test. The 16-bit mask applies ONLY inside the z-key
    // ladder (the engine's zorder16 masks its inputs); file stats,
    // the linear layout, and box membership all use the RAW column
    // values — parquet stats describe stored values, not the
    // quantized key (divergence surfaced by the sf0.3 magnitude
    // probe, where pk exceeds 2^16).
    "q_zorder_skipping" ->
      """WITH q AS (
        |  SELECT l_partkey AS pk,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS day
        |  FROM lineitem),
        |s1 AS (SELECT pk, day,
        |  (((pk & 65535) | ((pk & 65535) << 8)) & 16711935) AS xa,
        |  (((day & 65535) | ((day & 65535) << 8)) & 16711935) AS xb FROM q),
        |s2 AS (SELECT pk, day,
        |  ((xa | (xa << 4)) & 252645135) AS xa,
        |  ((xb | (xb << 4)) & 252645135) AS xb FROM s1),
        |s3 AS (SELECT pk, day,
        |  ((xa | (xa << 2)) & 858993459) AS xa,
        |  ((xb | (xb << 2)) & 858993459) AS xb FROM s2),
        |s4 AS (SELECT pk, day,
        |  ((xa | (xa << 1)) & 1431655765) AS xa,
        |  ((xb | (xb << 1)) & 1431655765) AS xb FROM s3),
        |z AS (SELECT pk, day, (xa | (xb << 1)) >> 22 AS file_id FROM s4),
        |lin AS (SELECT pk, day, pk // 128 AS file_id FROM q),
        |boxes(box_id, pk_lo, pk_hi, day_lo, day_hi) AS (VALUES
        |  (1, 100, 300, 0, 5000), (2, 0, 100000, 1500, 1560),
        |  (3, 500, 900, 2000, 2200)),
        |zst AS (SELECT file_id, min(pk) AS min_pk, max(pk) AS max_pk,
        |  min(day) AS min_day, max(day) AS max_day FROM z GROUP BY file_id),
        |lst AS (SELECT file_id, min(pk) AS min_pk, max(pk) AS max_pk,
        |  min(day) AS min_day, max(day) AS max_day FROM lin GROUP BY file_id),
        |zt AS (SELECT box_id, count(*) AS z_files_touched FROM boxes b JOIN zst s
        |  ON s.min_pk <= b.pk_hi AND s.max_pk >= b.pk_lo
        |  AND s.min_day <= b.day_hi AND s.max_day >= b.day_lo GROUP BY box_id),
        |lt AS (SELECT box_id, count(*) AS lin_files_touched FROM boxes b JOIN lst s
        |  ON s.min_pk <= b.pk_hi AND s.max_pk >= b.pk_lo
        |  AND s.min_day <= b.day_hi AND s.max_day >= b.day_lo GROUP BY box_id),
        |mt AS (SELECT box_id, count(*) AS n_rows_match FROM boxes b JOIN q
        |  ON q.pk BETWEEN b.pk_lo AND b.pk_hi
        |  AND q.day BETWEEN b.day_lo AND b.day_hi GROUP BY box_id)
        |SELECT CAST(b.box_id AS BIGINT) AS box_id,
        |  coalesce(mt.n_rows_match, 0) AS n_rows_match,
        |  coalesce(zt.z_files_touched, 0) AS z_files_touched,
        |  (SELECT count(*) FROM zst) AS z_files_total,
        |  coalesce(lt.lin_files_touched, 0) AS lin_files_touched,
        |  (SELECT count(*) FROM lst) AS lin_files_total
        |FROM boxes b
        |LEFT JOIN mt ON mt.box_id = b.box_id
        |LEFT JOIN zt ON zt.box_id = b.box_id
        |LEFT JOIN lt ON lt.box_id = b.box_id
        |ORDER BY b.box_id""".stripMargin,

    // Same mask-only-the-key rule as q_zorder_skipping: file stats
    // report the RAW stored values.
    "q_zorder_layout" ->
      """WITH q AS (
        |  SELECT l_partkey AS pk,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS day
        |  FROM lineitem),
        |s1 AS (SELECT pk, day,
        |  (((pk & 65535) | ((pk & 65535) << 8)) & 16711935) AS xa,
        |  (((day & 65535) | ((day & 65535) << 8)) & 16711935) AS xb FROM q),
        |s2 AS (SELECT pk, day,
        |  ((xa | (xa << 4)) & 252645135) AS xa,
        |  ((xb | (xb << 4)) & 252645135) AS xb FROM s1),
        |s3 AS (SELECT pk, day,
        |  ((xa | (xa << 2)) & 858993459) AS xa,
        |  ((xb | (xb << 2)) & 858993459) AS xb FROM s2),
        |s4 AS (SELECT pk, day,
        |  ((xa | (xa << 1)) & 1431655765) AS xa,
        |  ((xb | (xb << 1)) & 1431655765) AS xb FROM s3),
        |z AS (SELECT pk, day, (xa | (xb << 1)) >> 22 AS file_id FROM s4)
        |SELECT file_id, count(*) AS n_rows,
        |  min(pk) AS min_pk, max(pk) AS max_pk,
        |  min(day) AS min_day, max(day) AS max_day
        |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin,

    "q_impute" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |  FROM events),
        |good AS (SELECT * FROM ev WHERE event_type <> 'error'),
        |um AS (SELECT user_id, quantile_disc(value, 0.5) AS user_median
        |       FROM good GROUP BY user_id),
        |gm AS (SELECT quantile_disc(value, 0.5) AS global_median FROM good)
        |SELECT e.event_id, e.user_id, e.ts,
        |  COALESCE(um.user_median, gm.global_median) AS value_imputed,
        |  CASE WHEN um.user_median IS NOT NULL
        |    THEN 'user_median' ELSE 'global_median' END AS impute_source
        |FROM ev e LEFT JOIN um ON e.user_id = um.user_id CROSS JOIN gm
        |WHERE e.event_type = 'error'
        |ORDER BY e.event_id""".stripMargin,

    "q_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
        |    count(*) AS frequency,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary_dec
        |  FROM orders GROUP BY o_custkey),
        |ref AS (SELECT max(last_order) AS ref_date FROM cust),
        |rec AS (
        |  SELECT c.*, datediff('day', last_order, ref_date) AS recency_days,
        |    CAST(monetary_dec AS DOUBLE) AS m
        |  FROM cust c CROSS JOIN ref),
        |th AS (SELECT
        |  quantile_disc(recency_days, 0.25) AS r1, quantile_disc(recency_days, 0.5) AS r2,
        |  quantile_disc(recency_days, 0.75) AS r3,
        |  quantile_disc(frequency, 0.25) AS f1, quantile_disc(frequency, 0.5) AS f2,
        |  quantile_disc(frequency, 0.75) AS f3,
        |  quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
        |  quantile_disc(m, 0.75) AS m3
        |  FROM rec),
        |scored AS (
        |  SELECT rec.*,
        |    1 + (CASE WHEN recency_days > r1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency_days > r2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency_days > r3 THEN 1 ELSE 0 END) AS r_bucket,
        |    1 + (CASE WHEN frequency > f1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency > f2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency > f3 THEN 1 ELSE 0 END) AS f_bucket,
        |    1 + (CASE WHEN m > m1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN m > m2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN m > m3 THEN 1 ELSE 0 END) AS m_bucket
        |  FROM rec CROSS JOIN th)
        |SELECT 'R' || r_bucket || 'F' || f_bucket || 'M' || m_bucket AS segment,
        |  count(*) AS n_customers,
        |  CAST(sum(monetary_dec) AS DOUBLE) AS sum_monetary
        |FROM scored GROUP BY 1 ORDER BY segment""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
        |      count(*) AS n_days FROM daily GROUP BY 1),
        |c AS (
        |  SELECT d.event_type, d.day, t.n_days, t.total,
        |    sum(d.n * t.n_days - t.total)
        |      OVER (PARTITION BY d.event_type ORDER BY d.day) AS cusum
        |  FROM daily d JOIN t ON d.event_type = t.event_type),
        |r AS (SELECT *, row_number()
        |  OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn FROM c)
        |SELECT event_type, day AS cp_day, CAST(abs(cusum) AS BIGINT) AS cusum_abs,
        |  n_days, total
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // Skyline spec: the O(n²) dominance anti-join IS the semantics;
    // the engine's frontier-walk plan must reproduce it exactly.
    "q_skyline" ->
      """SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |  p_retailprice FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q WHERE q.p_brand = p.p_brand
        |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin,

    "q_pareto" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS rev_micros
        |  FROM orders GROUP BY o_custkey),
        |th AS (SELECT
        |  quantile_disc(rev, 0.1) AS t1, quantile_disc(rev, 0.2) AS t2,
        |  quantile_disc(rev, 0.3) AS t3, quantile_disc(rev, 0.4) AS t4,
        |  quantile_disc(rev, 0.5) AS t5, quantile_disc(rev, 0.6) AS t6,
        |  quantile_disc(rev, 0.7) AS t7, quantile_disc(rev, 0.8) AS t8,
        |  quantile_disc(rev, 0.9) AS t9,
        |  CAST(sum(rev_micros) AS BIGINT) AS total_micros FROM cust),
        |scored AS (
        |  SELECT cust.*, total_micros,
        |    1 + (CASE WHEN rev > t1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t4 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t5 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN rev > t9 THEN 1 ELSE 0 END) AS decile
        |  FROM cust CROSS JOIN th)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_customers,
        |  CAST(sum(rev_dec) AS DOUBLE) AS revenue,
        |  CAST(sum(rev_micros) AS BIGINT) // (max(total_micros) // 1000000) AS share_ppm
        |FROM scored GROUP BY decile ORDER BY decile""".stripMargin,

    "q_activity_bitmap" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |ref AS (SELECT max(day) AS ref_day FROM ev),
        |idx AS (
        |  SELECT user_id, datediff('day', day, ref_day) AS idx
        |  FROM ev CROSS JOIN ref WHERE datediff('day', day, ref_day) < 64)
        |SELECT user_id,
        |  bit_or(CAST(1 AS BIGINT) << CAST(idx AS INT)) AS bitmap,
        |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << CAST(idx AS INT))) AS BIGINT)
        |    AS n_active_days,
        |  CAST(bit_or(CAST(1 AS BIGINT) << CAST(idx AS INT)) & 1 AS BIGINT)
        |    AS active_today
        |FROM idx GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
        |  FROM events),
        |touched AS (
        |  SELECT *, last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM ev)
        |SELECT COALESCE(touch, 'direct') AS channel,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM touched WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_seasonal_profile" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
        |    CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS type_total
        |      FROM cells GROUP BY 1)
        |SELECT cells.event_type, dow, hod, n,
        |  (n * 1000000) // type_total AS share_ppm
        |FROM cells JOIN t ON cells.event_type = t.event_type
        |ORDER BY cells.event_type, dow, hod""".stripMargin,

    "q_order_latency" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  min(lat_days) AS min_days,
        |  quantile_disc(lat_days, 0.5) AS median_days,
        |  quantile_disc(lat_days, 0.9) AS p90_days,
        |  max(lat_days) AS max_days
        |FROM (
        |  SELECT o_orderpriority,
        |    datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lat_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_discount" ->
      """SELECT count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS lost_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin,

    "q_tpch_returned" ->
      """SELECT c_custkey, c_name, n_name, count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS lost_revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY lost_revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_tpch_promo" ->
      """SELECT CAST(date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS TIMESTAMP)
        |    AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_promo_lines,
        |  count(*) AS n_lines,
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |         * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE)
        |    AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY ship_month""".stripMargin,

    "q_tpch_small_qty" ->
      """WITH pp AS (
        |  SELECT l_partkey, count(*) AS n_part,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_small_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS small_revenue
        |FROM lineitem
        |JOIN pp ON lineitem.l_partkey = pp.l_partkey
        |JOIN part ON lineitem.l_partkey = p_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * n_part < sum_qty
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_tpch_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    > 260.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_tpch_top_supplier" ->
      """WITH ps AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |        * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue
        |FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT max(rev) FROM ps)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_disjunct" ->
      """SELECT count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_custdist" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_dormant" ->
      """WITH pos AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s, count(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_tpch_mktshare" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |         * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS nation_rev,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE)
        |    AS total_rev,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q_tpch_profit" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |             * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |           - CAST(p_retailprice AS DECIMAL(18,6))
        |             * CAST(l_quantity * 0.5 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS sum_margin,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin,

    "q_interval_audit" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS iv_end
        |  FROM events),
        |flags AS (
        |  SELECT user_id, ts, iv_end,
        |    CASE WHEN max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR ts > max(iv_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM iv),
        |islands AS (
        |  SELECT user_id, ts, iv_end,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flags),
        |m AS (
        |  SELECT user_id, min(ts) AS ms, max(iv_end) AS me
        |  FROM islands GROUP BY user_id, island),
        |agg AS (
        |  SELECT user_id, count(*) AS n_merged,
        |    CAST(sum((epoch_us(me) - epoch_us(ms)) // 1000000) AS BIGINT)
        |      AS covered_s
        |  FROM m GROUP BY user_id),
        |raw AS (
        |  SELECT user_id, count(*) AS n_raw, count(*) * 300 AS raw_s
        |  FROM events GROUP BY user_id)
        |SELECT r.user_id, r.n_raw, CAST(r.raw_s AS BIGINT) AS raw_s,
        |  a.n_merged, a.covered_s,
        |  CAST(r.raw_s - a.covered_s AS BIGINT) AS overlap_s,
        |  CAST((a.covered_s * 1000000) // r.raw_s AS BIGINT) AS coverage_ppm
        |FROM raw r JOIN agg a ON r.user_id = a.user_id
        |ORDER BY r.user_id""".stripMargin,

    "q_twap" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    epoch_us(date_trunc('day', ts)) AS day_us
        |  FROM events),
        |h AS (
        |  SELECT user_id, day_us, value,
        |    (coalesce(lead(us, 1) OVER (PARTITION BY user_id, day_us
        |        ORDER BY us, event_id), day_us + 86400000000) - us)
        |      // 1000000 AS dur_s
        |  FROM ev)
        |SELECT user_id, day_us, count(*) AS n_events,
        |  CAST(sum(dur_s) AS BIGINT) AS held_s,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)) * dur_s) AS VARCHAR)
        |    AS weighted_sum
        |FROM h GROUP BY user_id, day_us
        |ORDER BY user_id, day_us""".stripMargin,

    "q_lang_confusion" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('the','a','of','and','to'))) AS s_en,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('el','los','es','y','que'))) AS s_es,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      t -> t IN ('le','la','et','les','des'))) AS s_fr
        |  FROM documents),
        |p AS (
        |  SELECT lang AS true_lang,
        |    CASE
        |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |      WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |      WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |      WHEN s_fr > 0 THEN 'fr'
        |      ELSE 'und' END AS pred_lang
        |  FROM scored)
        |SELECT true_lang, pred_lang, count(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY true_lang, pred_lang""".stripMargin,

    "q_tpch_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_drift_bins" ->
      """WITH ev AS (
        |  SELECT value, (ts >= TIMESTAMP '2024-01-16') AS is_b,
        |    least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin
        |  FROM events),
        |bins AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ev GROUP BY bin),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |        CAST(sum(n_b) AS BIGINT) AS tb FROM bins)
        |SELECT bin, n_a, n_b,
        |  CAST((n_a * 1000000) // ta AS BIGINT) AS share_a_ppm,
        |  CAST((n_b * 1000000) // tb AS BIGINT) AS share_b_ppm
        |FROM bins, t ORDER BY bin""".stripMargin,

    "q_tpch_sole_fault" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS supp_faulty
        |  FROM lineitem GROUP BY 1, 2),
        |o AS (
        |  SELECT l_orderkey, count(*) AS n_suppliers,
        |    CAST(sum(supp_faulty) AS BIGINT) AS n_faulty,
        |    max(CASE WHEN supp_faulty = 1 THEN l_suppkey END) AS sole_supp
        |  FROM ps GROUP BY 1)
        |SELECT sole_supp AS s_suppkey, count(*) AS numwait
        |FROM o WHERE n_suppliers > 1 AND n_faulty = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 10""".stripMargin,

    "q_sql_report" ->
      """SELECT r_name AS region, o_orderpriority AS priority,
        |  count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, o_orderpriority
        |ORDER BY region, priority""".stripMargin,

    "q_dataset_card" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(*) - count(DISTINCT md5(text)) AS n_dup_texts,
        |  CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_short_docs
        |FROM documents""".stripMargin,

    "q_supplier_diversity" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#12'
        |  AND p_type NOT IN ('PROMO', 'ECONOMY')
        |  AND p_size IN (5, 10, 15, 20, 25, 30)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,

    "q_label_audit" ->
      """WITH v AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS e
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS probe_id, b.vec_id
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id <> a.vec_id),
        |sc AS (
        |  SELECT probe_id, c.vec_id,
        |    list_sum([na.e[i] * nb.e[i] for i in range(1, len(na.e) + 1)])
        |      / (na.nrm * nb.nrm) AS cs
        |  FROM cand c
        |  JOIN n na ON na.vec_id = c.probe_id
        |  JOIN n nb ON nb.vec_id = c.vec_id),
        |top5 AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, vec_id) AS rn
        |    FROM sc)
        |  WHERE rn <= 5),
        |pred AS (
        |  SELECT probe_id, label AS pred_label FROM (
        |    SELECT t.probe_id, e.label, count(*) AS votes,
        |      row_number() OVER (PARTITION BY t.probe_id
        |        ORDER BY count(*) DESC, e.label) AS rn
        |    FROM top5 t JOIN embeddings e ON e.vec_id = t.vec_id
        |    GROUP BY t.probe_id, e.label)
        |  WHERE rn = 1)
        |SELECT CAST(t.label AS BIGINT) AS true_label,
        |  CAST(p.pred_label AS BIGINT) AS pred_label, count(*) AS n
        |FROM pred p JOIN embeddings t ON t.vec_id = p.probe_id
        |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin,

    "q_gnn_aggregate" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        |        * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        |      + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        |        * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        |    < 0.0016),
        |edges AS (
        |  SELECT vec_a AS dst, vec_b AS src FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |feats AS (
        |  SELECT vec_id AS src,
        |    unnest([{'dim': i, 'x': CAST(embedding[i + 1] AS DOUBLE)}
        |      for i in range(0, len(embedding))]) AS s
        |  FROM embeddings)
        |SELECT e.dst AS vec_id, CAST(f.s.dim AS BIGINT) AS dim,
        |  count(*) AS n_neighbors,
        |  CAST(sum(CAST(f.s.x AS DECIMAL(18,6))) AS VARCHAR) AS msg_sum
        |FROM edges e JOIN feats f ON f.src = e.src
        |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,

    "q_lateness_audit" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |    epoch_us(date_trunc('day', ts)) AS day_us,
        |    (CAST(list_sum([(strpos('0123456789abcdef',
        |         substr(md5('lat:' || event_id), h, 1)) - 1) * pow(16.0, 4 - h)
        |       for h in range(1, 5)]) AS BIGINT) % 600) * 1000000 AS delay_us
        |  FROM events),
        |a AS (SELECT event_id, us, day_us, us + delay_us AS arrival_us FROM ev),
        |m AS (
        |  SELECT us,
        |    max(us) OVER (PARTITION BY day_us ORDER BY arrival_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw_us
        |  FROM a),
        |x AS (
        |  SELECT b.budget_s, m.us, m.hw_us
        |  FROM m CROSS JOIN (VALUES (60), (300), (600)) b(budget_s))
        |SELECT CAST(budget_s AS BIGINT) AS budget_s, count(*) AS n_events,
        |  CAST(sum(CASE WHEN hw_us IS NOT NULL
        |    AND us < hw_us - budget_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  (CAST(sum(CASE WHEN hw_us IS NOT NULL
        |    AND us < hw_us - budget_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) AS late_ppm
        |FROM x GROUP BY 1 ORDER BY budget_s""".stripMargin,

    "q_tpch_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pit_features" ->
      """SELECT label_id, user_id, ts, feat_event, feat_value FROM (
        |  SELECT l.event_id AS label_id, l.user_id,
        |    CAST(l.ts AS TIMESTAMP) AS ts,
        |    f.event_id AS feat_event, f.value AS feat_value,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY f.ts DESC, f.event_id DESC) AS rn
        |  FROM events l JOIN events f
        |    ON f.user_id = l.user_id
        |    AND CAST(f.ts AS TIMESTAMP)
        |        <= CAST(l.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |    AND CAST(f.ts AS TIMESTAMP)
        |        >= CAST(l.ts AS TIMESTAMP) - INTERVAL 1 HOUR - INTERVAL 7 DAY
        |  WHERE l.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY label_id""".stripMargin,

    "q_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT e.epoch, doc_id,
        |    md5(e.epoch || ':shuf:' || doc_id) AS k
        |  FROM documents CROSS JOIN (VALUES (0), (1)) e(epoch))
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |  row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
        |FROM keyed ORDER BY epoch, pos""".stripMargin,

    "q_movers" ->
      """WITH r AS (
        |  SELECT p_brand,
        |    sum(CASE WHEN year(l_shipdate) = 2000
        |      THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS rev_a,
        |    sum(CASE WHEN year(l_shipdate) = 2001
        |      THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |           * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS rev_b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |    AND l_shipdate < TIMESTAMP '2002-01-01'
        |  GROUP BY p_brand)
        |SELECT p_brand,
        |  CAST(CAST(rev_a AS VARCHAR) AS DOUBLE) AS rev_2000,
        |  CAST(CAST(rev_b AS VARCHAR) AS DOUBLE) AS rev_2001,
        |  CAST(CAST(rev_b - rev_a AS VARCHAR) AS DOUBLE) AS delta
        |FROM r
        |ORDER BY abs(rev_b - rev_a) DESC, p_brand
        |LIMIT 10""".stripMargin,

    "q_cumulative_users" ->
      """WITH fd AS (
        |  SELECT user_id, min(epoch_us(date_trunc('day', ts))) AS day_us
        |  FROM events GROUP BY user_id),
        |daily AS (SELECT day_us, count(*) AS n_new FROM fd GROUP BY day_us)
        |SELECT day_us, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY day_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_cumulative
        |FROM daily ORDER BY day_us""".stripMargin,

    "q_null_semantics" ->
      """WITH base AS (
        |  SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et,
        |    user_id
        |  FROM events),
        |dim AS (SELECT * FROM (VALUES ('click', TRUE), ('purchase', TRUE),
        |  (NULL, TRUE)) AS t(k, present)),
        |g AS (
        |  SELECT et, count(*) AS n_rows, count(et) AS n_nonnull_key,
        |    count(DISTINCT user_id) AS n_users
        |  FROM base GROUP BY et)
        |SELECT g.et, g.n_rows, g.n_nonnull_key, g.n_users,
        |  coalesce(ns.present, FALSE) AS in_dim_nullsafe,
        |  coalesce(eq.present, FALSE) AS in_dim_equijoin
        |FROM g
        |LEFT JOIN dim ns ON g.et IS NOT DISTINCT FROM ns.k
        |LEFT JOIN dim eq ON g.et = eq.k
        |ORDER BY g.et NULLS FIRST""".stripMargin,

    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |h AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT sum(n) AS total FROM h)
        |SELECT digit, n, CAST((n * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST([301030, 176091, 124939, 96910, 79181,
        |   66947, 57992, 51153, 45757][CAST(digit AS INT)] AS BIGINT) AS benford_ppm
        |FROM h, t ORDER BY digit""".stripMargin,

    "q_span_corrupt" ->
      """WITH base AS (
        |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, n_tokens, unnest(range(1, n_tokens + 1)) AS i FROM base),
        |starts AS (
        |  SELECT doc_id, n_tokens, i FROM pos
        |  WHERE CAST(list_sum([(strpos('0123456789abcdef',
        |          substr(md5(doc_id || ':sp:' || i), h, 1)) - 1) * pow(16.0, 4 - h)
        |        for h in range(1, 5)]) AS BIGINT) % 20 = 0),
        |masked AS (
        |  SELECT doc_id, count(DISTINCT m) AS n_masked FROM (
        |    SELECT doc_id, unnest(range(i, least(i + 2, n_tokens) + 1)) AS m
        |    FROM starts)
        |  GROUP BY doc_id),
        |sc AS (SELECT doc_id, count(*) AS n_spans FROM starts GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens,
        |  coalesce(sc.n_spans, 0) AS n_spans,
        |  coalesce(masked.n_masked, 0) AS n_masked,
        |  coalesce(masked.n_masked, 0) * 1000000 // b.n_tokens AS mask_ppm
        |FROM base b
        |LEFT JOIN sc ON sc.doc_id = b.doc_id
        |LEFT JOIN masked ON masked.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // FIM split plan: two md5-derived cut points uniform over 0..n
    // partition each doc into (prefix, middle, suffix); 50/50 PSM/SPM.
    "q_fim_split" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |        substr(md5('fim1:' || doc_id), i, 1)) - 1) * pow(16.0, 4 - i)
        |      for i in range(1, 5)]) AS BIGINT) % (n + 1) AS c1,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |        substr(md5('fim2:' || doc_id), i, 1)) - 1) * pow(16.0, 4 - i)
        |      for i in range(1, 5)]) AS BIGINT) % (n + 1) AS c2,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |        substr(md5('fimm:' || doc_id), i, 1)) - 1) * pow(16.0, 4 - i)
        |      for i in range(1, 5)]) AS BIGINT) % 2 AS m
        |  FROM t)
        |SELECT doc_id, n AS n_tokens,
        |  least(c1, c2) AS prefix_tokens,
        |  greatest(c1, c2) - least(c1, c2) AS middle_tokens,
        |  n - greatest(c1, c2) AS suffix_tokens,
        |  CASE WHEN m = 0 THEN 'SPM' ELSE 'PSM' END AS mode
        |FROM h ORDER BY doc_id""".stripMargin,

    // Threshold sweep over the verified LSH pair stream: per 0.1
    // jaccard band, pairs, distinct docs, and cumulative pairs at or
    // above the band (what a cutoff there would remove).
    "q_neardup_sweep" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |p AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |bnd AS (
        |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS band_x10, doc_a, doc_b
        |  FROM p WHERE jaccard >= 0.5),
        |agg AS (SELECT band_x10, count(*) AS n_pairs FROM bnd GROUP BY band_x10),
        |docs AS (SELECT band_x10, count(DISTINCT doc) AS n_docs FROM (
        |  SELECT band_x10, unnest([doc_a, doc_b]) AS doc FROM bnd)
        |  GROUP BY band_x10)
        |SELECT a.band_x10, a.n_pairs,
        |  CAST(sum(a.n_pairs) OVER (ORDER BY a.band_x10 DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pairs_at_least,
        |  d.n_docs
        |FROM agg a JOIN docs d USING (band_x10)
        |ORDER BY a.band_x10""".stripMargin,

    "q_window_suite" ->
      """SELECT user_id, event_id,
        |  row_number() OVER w AS seq,
        |  first_value(us) OVER w AS first_us,
        |  nth_value(us, 3) OVER w AS third_us,
        |  us - lag(us, 1) OVER w AS prev_gap_us,
        |  lead(event_id, 1) OVER w AS next_event,
        |  rank() OVER wt AS type_rank,
        |  dense_rank() OVER wt AS type_dense_rank
        |FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id),
        |  wt AS (PARTITION BY user_id ORDER BY event_type)
        |ORDER BY user_id, seq""".stripMargin,

    "q_embed_clusters" ->
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (
        |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
        |asg AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT b.vec_id, a.vec_id AS cluster,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum([a.e[i] * b.e[i] for i in range(1, len(a.e) + 1)])
        |          / (a.nrm * b.nrm) DESC, a.vec_id) AS rn
        |    FROM n b JOIN n a ON a.vec_id < 8)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |p AS (
        |  SELECT vec_a, vec_b
        |  FROM (SELECT vec_a, vec_b,
        |      list_sum([na.e[i] * nb.e[i] for i in range(1, len(na.e) + 1)])
        |        / (na.nrm * nb.nrm) AS c
        |    FROM cand JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b)
        |  WHERE c >= 0.45),
        |edges AS (
        |  SELECT vec_a AS s, vec_b AS t FROM p
        |  UNION ALL SELECT vec_b, vec_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS vec_id, min(r) AS canonical_id FROM reach GROUP BY d)
        |SELECT vec_id, canonical_id,
        |  count(*) OVER (PARTITION BY canonical_id) AS cluster_size,
        |  vec_id = canonical_id AS is_canonical
        |FROM lab ORDER BY vec_id""".stripMargin,

    // Both pair sides rewritten scalable (same result-identity
    // arguments as the q_ngram_jaccard/q_containment oracles): the
    // LSH candidates come from a band-value EQUI-join over exploded
    // (band_idx, band_val) rows — the set {pairs sharing ≥1 band} is
    // exactly the old all-pairs band-comparison's, deduped — and the
    // exact truth side uses the inverted-index common-count join.
    // This keeps the heaviest oracle in the dedup family K=10-checkable
    // (the all-pairs form was the only K=3-only holdout family in r7/r8).
    "q_dedup_recall" ->
      """WITH tkt AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bx AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bx a JOIN bx b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |lsh AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT c.doc_a, c.doc_b,
        |      round(len(list_intersect(sa.s, sb.s))
        |        / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))
        |            AS DOUBLE), 4) AS jac
        |    FROM cand c
        |    JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b)
        |  WHERE jac >= 0.5),
        |lshl AS (
        |  SELECT l.doc_a, l.doc_b, (la.lang = lb.lang) AS same_block,
        |    TRUE AS in_lsh
        |  FROM lsh l
        |  JOIN documents la ON la.doc_id = l.doc_a
        |  JOIN documents lb ON lb.doc_id = l.doc_b),
        |shx AS (SELECT doc_id, lang, unnest(s) AS shingle FROM sh),
        |szs AS (SELECT doc_id, lang, len(s) AS sz FROM sh),
        |com AS (
        |  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_common
        |  FROM shx a JOIN shx b ON a.lang = b.lang AND a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |ex AS (
        |  SELECT doc_a, doc_b, TRUE AS in_exact
        |  FROM com
        |  JOIN szs sa ON sa.doc_id = com.doc_a AND sa.lang = com.lang
        |  JOIN szs sb ON sb.doc_id = com.doc_b AND sb.lang = com.lang
        |  WHERE round(n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE), 4)
        |    >= 0.5),
        |f AS (
        |  SELECT l.same_block, l.in_lsh, e.in_exact
        |  FROM lshl l FULL JOIN ex e
        |    ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b)
        |SELECT
        |  count(*) FILTER (in_exact) AS n_exact,
        |  count(*) FILTER (in_exact AND in_lsh) AS n_found,
        |  count(*) FILTER (in_lsh AND NOT coalesce(in_exact, FALSE)
        |    AND same_block) AS n_extra_in_block,
        |  count(*) FILTER (in_lsh AND NOT same_block) AS n_cross_block,
        |  (count(*) FILTER (in_exact AND in_lsh)) * 1000000
        |    // (count(*) FILTER (in_exact)) AS recall_ppm
        |FROM f""".stripMargin,

    "q_grid_neighbors" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        |      * (CAST(a.embedding[1] AS DOUBLE) - CAST(b.embedding[1] AS DOUBLE))
        |    + (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        |      * (CAST(a.embedding[2] AS DOUBLE) - CAST(b.embedding[2] AS DOUBLE))
        |  < 0.0016
        |ORDER BY vec_a, vec_b""".stripMargin,

    // Shared degree CTE for the two output-bounded grid companions:
    // grid-bucketed like the engine (NOT all-pairs — the K=30 probe
    // corpus is 60k points and an n² oracle there is the exact failure
    // class the r9 inverted-index oracle rewrites retired).
    "q_grid_neighbor_stats" ->
      """WITH p AS (
        |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
        |    CAST(embedding[2] AS DOUBLE) AS y,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
        |  FROM embeddings),
        |deg0 AS (
        |  SELECT a.vec_id, count(*) AS deg
        |  FROM (SELECT p.*, p.cx + dx.d AS tcx, p.cy + dy.d AS tcy
        |        FROM p
        |        CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
        |        CROSS JOIN (VALUES (-1), (0), (1)) dy(d)) a
        |  JOIN p b ON a.tcx = b.cx AND a.tcy = b.cy AND a.vec_id <> b.vec_id
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < 0.0016
        |  GROUP BY 1),
        |deg AS (
        |  SELECT p.vec_id, p.cx, p.cy, coalesce(d.deg, 0) AS deg
        |  FROM p LEFT JOIN deg0 d ON p.vec_id = d.vec_id)
        |SELECT cx, cy, count(*) AS n_pts,
        |  CAST(sum(deg) AS BIGINT) AS deg_sum,
        |  CAST(max(deg) AS BIGINT) AS deg_max,
        |  count(*) FILTER (deg = 0) AS n_isolated
        |FROM deg GROUP BY cx, cy
        |ORDER BY cx, cy""".stripMargin,

    "q_degree_histogram" ->
      """WITH p AS (
        |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
        |    CAST(embedding[2] AS DOUBLE) AS y,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
        |  FROM embeddings),
        |deg0 AS (
        |  SELECT a.vec_id, count(*) AS deg
        |  FROM (SELECT p.*, p.cx + dx.d AS tcx, p.cy + dy.d AS tcy
        |        FROM p
        |        CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
        |        CROSS JOIN (VALUES (-1), (0), (1)) dy(d)) a
        |  JOIN p b ON a.tcx = b.cx AND a.tcy = b.cy AND a.vec_id <> b.vec_id
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < 0.0016
        |  GROUP BY 1),
        |deg AS (
        |  SELECT p.vec_id, coalesce(d.deg, 0) AS deg
        |  FROM p LEFT JOIN deg0 d ON p.vec_id = d.vec_id)
        |SELECT deg AS degree, count(*) AS n_vecs
        |FROM deg GROUP BY deg
        |ORDER BY degree""".stripMargin,

    "q_cross_corr" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
        |    count(*) AS n
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT l.lag_days, x.n AS x, y.n AS y
        |  FROM (SELECT * FROM daily WHERE event_type = 'click') x
        |  CROSS JOIN (SELECT * FROM
        |    (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS t(lag_days)) l
        |  JOIN (SELECT * FROM daily WHERE event_type = 'purchase') y
        |    ON y.day_us = x.day_us + l.lag_days * 86400000000)
        |SELECT CAST(lag_days AS BIGINT) AS lag_days, count(*) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(y * y) AS BIGINT) AS syy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy
        |FROM pairs GROUP BY 1 ORDER BY lag_days""".stripMargin,

    "q_feature_hash" ->
      """SELECT doc_id, substr(md5('fh:' || w), 1, 2) AS bucket, count(*) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |WHERE w <> ''
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_onehot" ->
      """SELECT c_custkey,
        |  CAST(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS BIGINT)
        |    AS seg_automobile,
        |  CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS BIGINT)
        |    AS seg_building,
        |  CAST(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS BIGINT)
        |    AS seg_furniture,
        |  CAST(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS BIGINT)
        |    AS seg_household,
        |  CAST(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS BIGINT)
        |    AS seg_machinery
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_minmax_norm" ->
      """WITH ex AS (
        |  SELECT event_type, min(value) AS v_min, max(value) AS v_max
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  CASE WHEN v_max = v_min THEN 0.0
        |       ELSE (value - v_min) / (v_max - v_min) END AS norm_value
        |FROM events e JOIN ex USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_target_encode" ->
      """WITH ps AS (
        |  SELECT c_mktsegment, count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS s
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |g AS (SELECT CAST(CAST(sum(s) AS VARCHAR) AS DOUBLE) AS gs,
        |        sum(n_orders) AS gn FROM ps)
        |SELECT c_mktsegment, n_orders,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) AS sum_total,
        |  (CAST(CAST(s AS VARCHAR) AS DOUBLE) + 10.0 * (gs / gn))
        |    / (n_orders + 10.0) AS enc
        |FROM ps, g ORDER BY c_mktsegment""".stripMargin,

    "q_kfold" ->
      """WITH f AS (
        |  SELECT CAST(list_sum([(strpos('0123456789abcdef',
        |             substr(md5('fold:' || doc_id), i, 1)) - 1) * pow(16.0, 4 - i)
        |           for i in range(1, 5)]) AS BIGINT) % 5 AS fold,
        |    lang, n_chars
        |  FROM documents)
        |SELECT fold, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM f GROUP BY fold, lang ORDER BY fold, lang""".stripMargin,

    "q_class_weights" ->
      """WITH pc AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |t AS (SELECT sum(n) AS total, count(*) AS k FROM pc)
        |SELECT CAST(label AS BIGINT) AS label, n,
        |  CAST(total AS DOUBLE) / (k * n) AS weight
        |FROM pc, t ORDER BY label""".stripMargin,

    "q_recommend" ->
      """WITH owned AS (
        |  SELECT DISTINCT o_custkey AS custkey, p_brand AS brand
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey),
        |co AS (
        |  SELECT a.brand AS b1, b.brand AS b2, count(*) AS co
        |  FROM owned a JOIN owned b
        |    ON a.custkey = b.custkey AND a.brand <> b.brand
        |  GROUP BY 1, 2),
        |scores AS (
        |  SELECT o.custkey, co.b2 AS brand, CAST(sum(co.co) AS BIGINT) AS score
        |  FROM owned o JOIN co ON o.brand = co.b1
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT s.custkey, s.brand, s.score FROM scores s
        |  WHERE NOT EXISTS (SELECT 1 FROM owned w
        |    WHERE w.custkey = s.custkey AND w.brand = s.brand)),
        |ranked AS (
        |  SELECT custkey, brand, score,
        |    row_number() OVER (PARTITION BY custkey
        |      ORDER BY score DESC, brand) AS rn
        |  FROM cand)
        |SELECT custkey, brand, score, rn FROM ranked
        |WHERE rn <= 3 ORDER BY custkey, rn""".stripMargin,

    "q_interleave" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |    substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |    md5('ilv:' || CAST(doc_id AS VARCHAR)) AS okey
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY shard, okey, doc_id) AS ordinal
        |  FROM k),
        |s AS (
        |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT count(*) AS n_sources FROM s)
        |SELECT o.doc_id, o.source, o.ordinal,
        |  (o.ordinal - 1) * n.n_sources + s.sidx AS global_pos
        |FROM o JOIN s ON o.source = s.source CROSS JOIN n
        |ORDER BY global_pos""".stripMargin,

    "q_readability" ->
      """SELECT doc_id, n_words, n_sentences, n_syllables,
        |  206835 - (1015 * n_words) // n_sentences
        |         - (84600 * n_syllables) // n_words AS flesch_milli
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
        |    CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT) AS n_syllables
        |  FROM documents)
        |WHERE n_words >= 1
        |ORDER BY doc_id""".stripMargin,

    "q_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id,
        |      unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
        |    FROM toks WHERE len(t) >= 2)),
        |big AS (SELECT w1, w2, count(*) AS n_big FROM bi GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS n_ctx FROM bi GROUP BY 1),
        |v AS (SELECT count(*) AS v_size FROM (
        |  SELECT DISTINCT tok FROM (
        |    SELECT w1 AS tok FROM bi UNION ALL SELECT w2 FROM bi))),
        |terms AS (
        |  SELECT bi.doc_id,
        |    -ln(CAST(big.n_big + 1 AS DOUBLE) / CAST(ctx.n_ctx + v.v_size AS DOUBLE)) AS term
        |  FROM bi JOIN big ON bi.w1 = big.w1 AND bi.w2 = big.w2
        |  JOIN ctx ON bi.w1 = ctx.w1 CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(CAST(sum(CAST(term AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)
        |    / count(*), 4) AS avg_surprisal
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS converted,
        |    user_id % 2 AS arm
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT
        |    count(CASE WHEN arm = 0 THEN 1 END) AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    count(CASE WHEN arm = 1 THEN 1 END) AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  (conv_a * 1000000) // n_a AS rate_a_ppm,
        |  (conv_b * 1000000) // n_b AS rate_b_ppm,
        |  (conv_a * 1000000) // n_a - (conv_b * 1000000) // n_b AS diff_ppm
        |FROM m""".stripMargin,

    "q_kmeans_train" -> kmeansTrainOracle,

    "q_perceptron_train" -> perceptronTrainOracle,
    "q_perceptron_eval" -> perceptronEvalOracle,
    "q_perceptron_score" -> perceptronScoreOracle,

    // Same pair + recursive-reachability CTEs as q_dedup_clusters,
    // left-joined onto the full corpus: weight = 1e6 div cluster size,
    // unclustered docs weigh exactly 1e6.
    "q_dedup_weight" ->
      """WITH RECURSIVE tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |      for i in range(1, len(tk) - 1)]) AS s
        |  FROM tkt WHERE len(tk) >= 3),
        |bands AS (
        |  SELECT doc_id, s,
        |    [list_min([substr(md5(x), 8*b + 1, 4) for x in s])
        |       || list_min([substr(md5(x), 8*b + 5, 4) for x in s])
        |      for b in range(0, 4)] AS bd
        |  FROM sh),
        |bxp AS (
        |  SELECT doc_id, i AS band_idx, bd[i] AS band_val
        |  FROM bands, range(1, 5) t(i)),
        |cpair AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bxp a JOIN bxp b ON a.band_idx = b.band_idx
        |    AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
        |cand AS (
        |  SELECT c.doc_a, c.doc_b, ba.s AS sa, bb.s AS sb
        |  FROM cpair c
        |  JOIN bands ba ON ba.doc_id = c.doc_a
        |  JOIN bands bb ON bb.doc_id = c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(len(list_intersect(sa, sb))
        |      / CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS DOUBLE), 4) AS jaccard
        |  FROM cand),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p),
        |nodes AS (SELECT DISTINCT s AS d FROM edges),
        |reach AS (
        |  SELECT d, d AS r FROM nodes
        |  UNION
        |  SELECT reach.d, e.t AS r FROM reach JOIN edges e ON e.s = reach.r),
        |lab AS (SELECT d AS doc_id, min(r) AS canonical_id FROM reach GROUP BY d),
        |sized AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY canonical_id) AS cluster_size
        |  FROM lab)
        |SELECT d.doc_id, d.source,
        |  COALESCE(s.cluster_size, 1) AS cluster_size,
        |  1000000 // COALESCE(s.cluster_size, 1) AS weight_ppm
        |FROM documents d LEFT JOIN sized s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_audio_energy" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    unnest([{'fr': k // 16, 's': ascii(substr(text, k + 1, 1)) - 96}
        |            for k in range(0, (least(length(text), 128) // 16) * 16)]) AS u
        |  FROM documents
        |  WHERE least(length(text), 128) // 16 >= 1)
        |SELECT doc_id, u.fr AS fr, count(*) AS n_samples,
        |  CAST(sum(u.s * u.s) AS BIGINT) AS energy,
        |  CAST(max(abs(u.s)) AS BIGINT) AS peak,
        |  CAST(sum(u.s * u.s) AS BIGINT) < 64 AS is_silent
        |FROM px GROUP BY doc_id, u.fr ORDER BY doc_id, fr""".stripMargin,

    "q_rag_chunks" ->
      """WITH tkt AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
        |st AS (
        |  SELECT doc_id, tk,
        |    unnest(generate_series(1, len(tk), 48)) AS tok_start
        |  FROM tkt),
        |ch AS (
        |  SELECT doc_id, tok_start, tk[tok_start:tok_start+63] AS chunk FROM st)
        |SELECT doc_id, CAST(tok_start AS BIGINT) AS tok_start,
        |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS fp
        |FROM ch WHERE len(chunk) >= 16 OR tok_start = 1
        |ORDER BY doc_id, tok_start""".stripMargin,

    "q_batch_buckets" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n,
        |    md5('batch:' || doc_id) AS ord
        |  FROM documents),
        |u AS (
        |  SELECT 'bucket_' || length(bin(n)) AS scope, source, n, ord, doc_id FROM d
        |  UNION ALL
        |  SELECT 'naive' AS scope, source, n, ord, doc_id FROM d),
        |r AS (
        |  SELECT scope, source, n,
        |    (row_number() OVER (PARTITION BY scope, source ORDER BY ord, doc_id) - 1)
        |      // 32 AS batch
        |  FROM u),
        |b AS (
        |  SELECT scope, source, batch, count(*) AS n_docs, max(n) AS max_n,
        |    CAST(sum(n) AS BIGINT) AS sum_n
        |  FROM r GROUP BY scope, source, batch)
        |SELECT scope, count(*) AS n_batches, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(sum_n) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n_docs * max_n - sum_n) AS BIGINT) AS pad_tokens,
        |  CAST(sum(n_docs * max_n - sum_n) AS BIGINT) * 1000000
        |    // (CAST(sum(n_docs * max_n - sum_n) AS BIGINT)
        |        + CAST(sum(sum_n) AS BIGINT)) AS waste_ppm
        |FROM b GROUP BY scope ORDER BY scope""".stripMargin,

    "q_compaction_plan" ->
      """WITH f AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(length(props)) + 64 * count(*) AS BIGINT) AS bytes
        |  FROM events GROUP BY day, event_type),
        |a AS (
        |  SELECT day, bytes,
        |    COALESCE(CAST(sum(bytes) OVER (PARTITION BY day
        |      ORDER BY bytes DESC, event_type
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      // 4096 AS bin
        |  FROM f)
        |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS n_files,
        |  max(bin) + 1 AS n_bins, CAST(sum(bytes) AS BIGINT) AS total_bytes
        |FROM a GROUP BY day ORDER BY day""".stripMargin,

    // The NFD greedy unrolled as a per-day recursive walk over the
    // size-ranked file list: the recursion carries (bins, current bin
    // bytes, remaining capacity, max bin) and steps rn → rn+1, exactly
    // the engine aggregator's fold. Equal-size ties are interchangeable
    // under NFD, so the rank's event_type tiebreak cannot diverge from
    // the engine's tie-free sort.
    "q_compaction_nfd" ->
      """WITH RECURSIVE f AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |    CAST(sum(length(props)) + 64 * count(*) AS BIGINT) AS bytes
        |  FROM events GROUP BY day, event_type),
        |o AS (
        |  SELECT day, bytes,
        |    row_number() OVER (PARTITION BY day
        |      ORDER BY bytes DESC, event_type) AS rn,
        |    count(*) OVER (PARTITION BY day) AS nf,
        |    CAST(sum(bytes) OVER (PARTITION BY day) AS BIGINT) AS tot
        |  FROM f),
        |rec AS (
        |  SELECT day, rn, nf, tot, CAST(1 AS BIGINT) AS bins, bytes AS cur,
        |    CAST(greatest(4096 - bytes, 0) AS BIGINT) AS rem, bytes AS maxbin
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.day, o.rn, o.nf, o.tot,
        |    CASE WHEN o.bytes > r.rem THEN r.bins + 1 ELSE r.bins END,
        |    CASE WHEN o.bytes > r.rem THEN o.bytes ELSE r.cur + o.bytes END,
        |    CAST(CASE WHEN o.bytes > r.rem THEN greatest(4096 - o.bytes, 0)
        |      ELSE r.rem - o.bytes END AS BIGINT),
        |    greatest(r.maxbin,
        |      CASE WHEN o.bytes > r.rem THEN o.bytes ELSE r.cur + o.bytes END)
        |  FROM rec r JOIN o ON o.day = r.day AND o.rn = r.rn + 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(nf AS BIGINT) AS n_files,
        |  bins AS n_bins, tot AS total_bytes, maxbin AS max_bin_bytes
        |FROM rec WHERE rn = nf ORDER BY day""".stripMargin,

    "q_ks_test" ->
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |filled AS (
        |  SELECT s.source, g.n_chars, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN (SELECT DISTINCT n_chars FROM documents) g
        |  LEFT JOIN c ON c.source = s.source AND c.n_chars = g.n_chars),
        |cdf AS (
        |  SELECT f.source, f.n_chars,
        |    CAST(sum(f.c) OVER (PARTITION BY f.source ORDER BY f.n_chars)
        |      AS BIGINT) AS cum,
        |    t.n_total
        |  FROM filled f
        |  JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_total
        |        FROM documents GROUP BY source) t ON f.source = t.source)
        |SELECT x.source AS source_a, y.source AS source_b,
        |  CAST(max(abs(x.cum * y.n_total - y.cum * x.n_total)) AS BIGINT) * 1000000
        |    // (max(x.n_total) * max(y.n_total)) AS ks_ppm
        |FROM cdf x JOIN cdf y
        |  ON x.n_chars = y.n_chars AND x.source < y.source
        |GROUP BY x.source, y.source
        |ORDER BY source_a, source_b""".stripMargin,

    "q_merge_stats" ->
      """WITH s AS (
        |  SELECT ascii(substr(md5('stats:' || doc_id), 1, 1)) % 8 AS shard,
        |    count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY shard),
        |u AS (
        |  SELECT 'shard_' || shard AS scope, n, sx, sxx FROM s
        |  UNION ALL
        |  SELECT 'merged' AS scope, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sxx) AS BIGINT) AS sxx
        |  FROM s)
        |SELECT scope, n, sx, sxx, sx // n AS mean_int,
        |  (n * sxx - sx * sx) // (n * n) AS var_int
        |FROM u ORDER BY scope""".stripMargin,

    "q_binary_ingest" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id % 13 = 0 AND doc_id < 5000
        |ORDER BY doc_id""".stripMargin,

    "q_mannwhitney" ->
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |filled AS (
        |  SELECT s.source, g.n_chars, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN (SELECT DISTINCT n_chars FROM documents) g
        |  LEFT JOIN c ON c.source = s.source AND c.n_chars = g.n_chars),
        |cdf AS (
        |  SELECT f.source, f.n_chars, f.c,
        |    CAST(sum(f.c) OVER (PARTITION BY f.source ORDER BY f.n_chars)
        |      AS BIGINT) AS cum,
        |    t.n_total
        |  FROM filled f
        |  JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_total
        |        FROM documents GROUP BY source) t ON f.source = t.source),
        |a AS (
        |  SELECT x.source AS source_a, y.source AS source_b,
        |    CAST(sum(x.c * (2 * (x.cum - x.c + y.cum - y.c) + x.c + y.c + 1))
        |      AS BIGINT) AS r2a,
        |    max(x.n_total) AS na, max(y.n_total) AS nb
        |  FROM cdf x JOIN cdf y
        |    ON x.n_chars = y.n_chars AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, r2a - na * (na + 1) AS u2,
        |  ((r2a - na * (na + 1)) * 1000000) // (2 * na * nb) AS auc_ppm
        |FROM a ORDER BY source_a, source_b""".stripMargin,

    "q_bootstrap_ci" ->
      """WITH reps AS (
        |  SELECT d.source, d.n_chars, r.r,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |             substr(md5('boot:' || r.r || ':' || d.doc_id), i, 1)) - 1)
        |           * pow(16.0, 8 - i) for i in range(1, 9)]) AS BIGINT) AS u
        |  FROM documents d CROSS JOIN (SELECT unnest(range(0, 32)) AS r) r),
        |w AS (
        |  SELECT source, r, n_chars,
        |    CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END
        |    + CASE WHEN u >= 3160060337 THEN 1 ELSE 0 END
        |    + CASE WHEN u >= 3950075421 THEN 1 ELSE 0 END
        |    + CASE WHEN u >= 4213413783 THEN 1 ELSE 0 END
        |    + CASE WHEN u >= 4279248373 THEN 1 ELSE 0 END
        |    + CASE WHEN u >= 4292415291 THEN 1 ELSE 0 END AS w
        |  FROM reps),
        |cell AS (
        |  SELECT source, r, CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(w * n_chars) AS BIGINT) AS swx
        |  FROM w GROUP BY source, r),
        |m AS (
        |  SELECT source, swx // greatest(sw, 1) AS mean_r,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY swx // greatest(sw, 1), r) AS rn
        |  FROM cell)
        |SELECT source, count(*) AS n_reps,
        |  max(CASE WHEN rn = 2 THEN mean_r END) AS boot_lo,
        |  max(CASE WHEN rn = 16 THEN mean_r END) AS boot_med,
        |  max(CASE WHEN rn = 31 THEN mean_r END) AS boot_hi
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q_spearman" ->
      """WITH b AS (
        |  SELECT event_type, value, CAST(length(props) AS BIGINT) AS plen
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY value)
        |      + count(*) OVER (PARTITION BY event_type, value) - 1
        |      - (count(*) OVER (PARTITION BY event_type) + 1) AS cx,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY plen)
        |      + count(*) OVER (PARTITION BY event_type, plen) - 1
        |      - (count(*) OVER (PARTITION BY event_type) + 1) AS cy
        |  FROM b),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cx * cy) AS BIGINT) AS sxy,
        |    CAST(sum(cx * cx) AS BIGINT) AS sxx,
        |    CAST(sum(cy * cy) AS BIGINT) AS syy
        |  FROM r GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CASE WHEN sxx = 0 OR syy = 0 THEN NULL
        |    ELSE CAST(sxy AS DOUBLE)
        |      / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |  END, 6) AS spearman
        |FROM a ORDER BY event_type""".stripMargin,

    "q_bpe_merge" ->
      """WITH w AS (
        |  SELECT source, word, count(*) AS n FROM (
        |    SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY source, word),
        |g AS (
        |  SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w GROUP BY word),
        |p AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM g WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |a AS (
        |  SELECT w.source, p.pair,
        |    CAST(sum(w.n * length(w.word)) AS BIGINT) AS tokens_before,
        |    CAST(sum(w.n * ((length(w.word)
        |      - length(replace(w.word, p.pair, ''))) // 2)) AS BIGINT) AS merges
        |  FROM w CROSS JOIN p GROUP BY 1, 2)
        |SELECT source, pair, tokens_before, merges,
        |  tokens_before - merges AS tokens_after,
        |  (merges * 1000000) // greatest(tokens_before, 1) AS saved_ppm
        |FROM a ORDER BY source""".stripMargin,

    // Three iterated BPE rounds, unrolled: each round re-picks the top
    // adjacent symbol pair over the CURRENT vocabulary and rewrites it
    // to a fresh marker char — same pick/apply recipe as q_bpe_merge.
    "q_bpe_train3" ->
      """WITH w0 AS (
        |  SELECT source, word, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY source, word),
        |p1 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w0 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |w1 AS (
        |  SELECT source, word, CAST(sum(n) AS BIGINT) AS n FROM (
        |    SELECT source, replace(word, (SELECT pair FROM p1), '0') AS word, n
        |    FROM w0)
        |  GROUP BY source, word),
        |p2 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w1 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |w2 AS (
        |  SELECT source, word, CAST(sum(n) AS BIGINT) AS n FROM (
        |    SELECT source, replace(word, (SELECT pair FROM p2), '1') AS word, n
        |    FROM w1)
        |  GROUP BY source, word),
        |p3 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w2 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |w3 AS (
        |  SELECT source, word, CAST(sum(n) AS BIGINT) AS n FROM (
        |    SELECT source, replace(word, (SELECT pair FROM p3), '2') AS word, n
        |    FROM w2)
        |  GROUP BY source, word),
        |t0 AS (SELECT source, CAST(sum(n * length(word)) AS BIGINT) AS t
        |       FROM w0 GROUP BY source),
        |t1 AS (SELECT source, CAST(sum(n * length(word)) AS BIGINT) AS t
        |       FROM w1 GROUP BY source),
        |t2 AS (SELECT source, CAST(sum(n * length(word)) AS BIGINT) AS t
        |       FROM w2 GROUP BY source),
        |t3 AS (SELECT source, CAST(sum(n * length(word)) AS BIGINT) AS t
        |       FROM w3 GROUP BY source)
        |SELECT source, round, pair, tokens_before, tokens_after,
        |  tokens_before - tokens_after AS merges,
        |  ((tokens_before - tokens_after) * 1000000)
        |    // greatest(tokens_before, 1) AS saved_ppm
        |FROM (
        |  SELECT t0.source, CAST(1 AS BIGINT) AS round,
        |    (SELECT pair FROM p1) AS pair,
        |    t0.t AS tokens_before, t1.t AS tokens_after
        |  FROM t0 JOIN t1 USING (source)
        |  UNION ALL
        |  SELECT t1.source, CAST(2 AS BIGINT), (SELECT pair FROM p2),
        |    t1.t, t2.t
        |  FROM t1 JOIN t2 USING (source)
        |  UNION ALL
        |  SELECT t2.source, CAST(3 AS BIGINT), (SELECT pair FROM p3),
        |    t2.t, t3.t
        |  FROM t2 JOIN t3 USING (source))
        |ORDER BY source, round""".stripMargin,

    // Applies q_bpe_train3's three picked merges per document (same
    // w0->p3 training chain), reporting per-doc exact token accounting
    "q_bpe_encode" ->
      """WITH w0 AS (
        |  SELECT source, word, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY source, word),
        |p1 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w0 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |w1 AS (
        |  SELECT source, word, CAST(sum(n) AS BIGINT) AS n FROM (
        |    SELECT source, replace(word, (SELECT pair FROM p1), '0') AS word, n
        |    FROM w0)
        |  GROUP BY source, word),
        |p2 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w1 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |w2 AS (
        |  SELECT source, word, CAST(sum(n) AS BIGINT) AS n FROM (
        |    SELECT source, replace(word, (SELECT pair FROM p2), '1') AS word, n
        |    FROM w1)
        |  GROUP BY source, word),
        |p3 AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(wn) AS BIGINT) AS pc FROM (
        |      SELECT wn, unnest([substr(word, i, 2)
        |                         for i in range(1, length(word))]) AS pair
        |      FROM (SELECT word, CAST(sum(n) AS BIGINT) AS wn FROM w2 GROUP BY word)
        |      WHERE length(word) >= 2)
        |    GROUP BY pair)
        |  ORDER BY pc DESC, pair LIMIT 1),
        |pp AS (SELECT p1.pair AS p1, p2.pair AS p2, p3.pair AS p3
        |       FROM p1, p2, p3),
        |d AS (
        |  SELECT doc_id,
        |    [w for w in string_split_regex(lower(text), '[^a-z]+') if w <> ''] AS ws
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    COALESCE(CAST(list_sum([length(w) for w in ws]) AS BIGINT), 0)
        |      AS tokens_before,
        |    COALESCE(CAST(list_sum([length(replace(replace(replace(
        |      w, p1, '0'), p2, '1'), p3, '2')) for w in ws]) AS BIGINT), 0)
        |      AS tokens_after
        |  FROM d CROSS JOIN pp)
        |SELECT doc_id, tokens_before, tokens_after,
        |  ((tokens_before - tokens_after) * 1000000)
        |    // GREATEST(tokens_before, 1) AS saved_ppm
        |FROM e ORDER BY doc_id""".stripMargin,

    "q_js_divergence" ->
      """WITH tf AS (
        |  SELECT source, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents),
        |stc AS (SELECT source, term, count(*) AS c FROM tf GROUP BY 1, 2),
        |corpus AS (
        |  SELECT term, CAST(sum(c) AS BIGINT) AS cc FROM stc GROUP BY term
        |  ORDER BY cc DESC, term LIMIT 100),
        |grid AS (
        |  SELECT s.source, t.term
        |  FROM (SELECT DISTINCT source FROM documents) s, corpus t),
        |j AS (
        |  SELECT g.source, g.term, COALESCE(c.c, 0) AS c
        |  FROM grid g LEFT JOIN stc c ON g.source = c.source AND g.term = c.term),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns, count(*) AS n_univ
        |        FROM j GROUP BY source),
        |side AS (
        |  SELECT j.source, j.term, j.c, t.ns, t.n_univ
        |  FROM j JOIN tot t ON j.source = t.source)
        |SELECT x.source AS source_a, y.source AS source_b,
        |  CAST(sum(CAST(
        |    0.5 * (CAST(x.c + 1 AS DOUBLE) / (x.ns + x.n_univ))
        |      * ln((CAST(x.c + 1 AS DOUBLE) / (x.ns + x.n_univ))
        |            / ((CAST(x.c + 1 AS DOUBLE) / (x.ns + x.n_univ)
        |                + CAST(y.c + 1 AS DOUBLE) / (y.ns + y.n_univ))
        |               / CAST(2 AS DOUBLE)))
        |    + 0.5 * (CAST(y.c + 1 AS DOUBLE) / (y.ns + y.n_univ))
        |      * ln((CAST(y.c + 1 AS DOUBLE) / (y.ns + y.n_univ))
        |            / ((CAST(x.c + 1 AS DOUBLE) / (x.ns + x.n_univ)
        |                + CAST(y.c + 1 AS DOUBLE) / (y.ns + y.n_univ))
        |               / CAST(2 AS DOUBLE)))
        |  AS DECIMAL(18,12))) AS DOUBLE) AS js_nats
        |FROM side x JOIN side y
        |  ON x.term = y.term AND x.source < y.source
        |GROUP BY x.source, y.source
        |ORDER BY source_a, source_b""".stripMargin,
  )

  /** Two unrolled Lloyd rounds + final assignment (see
    * Similarity.qKmeansTrain) — the q_pagerank pattern: the iteration
    * CTE trio (assign / explode / re-center) is mechanical, so it is
    * generated, not typed. */
  /** Margins CTE of perceptron epoch `t` — every row's exact integer
    * margin y·(Σ w·x + b6·10⁶) under the previous epoch's weights.
    * Factored out because the declared eval/score queries need a
    * FOURTH margin pass (m4) under the final w3/b3. */
  private def perceptronMargins(t: Int): String =
    s"""m$t AS (
       |  SELECT d.vec_id, d.y, d.y * (d.dot + b.b6 * 1000000) AS margin
       |  FROM (SELECT xd.vec_id, xd.y, sum(xd.x6 * w.w6) AS dot
       |        FROM xd JOIN w${t - 1} w ON xd.dim = w.dim
       |        GROUP BY xd.vec_id, xd.y) d CROSS JOIN b${t - 1} b)""".stripMargin

  /** Shared CTE chain of the batch-perceptron family (see
    * ops/Classifier.scala for the algorithm and the micro-unit
    * numeric contract): 3 unrolled epochs of exact BIGINT arithmetic.
    * Unrolled for the same reason as kmeansTrainOracle — portable SQL
    * has no grouped recursion. The CASE-weight update (0 for correct
    * rows) keeps every dim present per epoch, so no outer-join
    * edge case exists on a separable corpus. */
  private def perceptronChain: String = {
    def epoch(t: Int) =
      s"""${perceptronMargins(t)},
         |w$t AS (
         |  SELECT w.dim, w.w6 + u.u AS w6
         |  FROM w${t - 1} w JOIN (
         |    SELECT xd.dim,
         |      sum(CASE WHEN m.margin <= 0 THEN xd.y ELSE 0 END * xd.x6) AS u
         |    FROM xd JOIN m$t m ON xd.vec_id = m.vec_id GROUP BY xd.dim) u
         |  ON w.dim = u.dim),
         |b$t AS (
         |  SELECT b.b6 + s.db * 1000000 AS b6
         |  FROM b${t - 1} b CROSS JOIN (
         |    SELECT sum(CASE WHEN margin <= 0 THEN y ELSE 0 END) AS db
         |    FROM m$t) s)""".stripMargin
    s"""WITH x6 AS (
       |  SELECT vec_id, CASE WHEN label % 2 = 0 THEN 1 ELSE -1 END AS y,
       |    [CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) for x in embedding] AS e6
       |  FROM embeddings),
       |xd AS (
       |  SELECT vec_id, y, CAST(s.dim AS BIGINT) AS dim, s.x AS x6 FROM (
       |    SELECT vec_id, y,
       |      unnest([{'dim': i, 'x': e6[i + 1]} for i in range(0, len(e6))]) AS s
       |    FROM x6)),
       |w0 AS (SELECT DISTINCT dim, CAST(0 AS BIGINT) AS w6 FROM xd),
       |b0 AS (SELECT CAST(0 AS BIGINT) AS b6),
       |${epoch(1)},
       |${epoch(2)},
       |${epoch(3)}""".stripMargin
  }

  private def perceptronTrainOracle: String =
    s"""$perceptronChain
       |SELECT dim, CAST(w6 AS BIGINT) AS w6 FROM w3
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS dim, CAST(b6 AS BIGINT) AS w6 FROM b3
       |ORDER BY dim""".stripMargin

  private def perceptronEvalOracle: String =
    s"""$perceptronChain,
       |${perceptronMargins(4)}
       |SELECT CAST(y AS BIGINT) AS y,
       |  CAST(CASE WHEN margin * y > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
       |  count(*) AS n
       |FROM m4 GROUP BY y, pred ORDER BY y, pred""".stripMargin

  private def perceptronScoreOracle: String =
    s"""$perceptronChain,
       |${perceptronMargins(4)}
       |SELECT vec_id, CAST(y AS BIGINT) AS y,
       |  CAST(margin * y AS BIGINT) AS score12 FROM m4
       |ORDER BY score12 DESC, vec_id LIMIT 20""".stripMargin

  private def kmeansTrainOracle: String = {
    def assign(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, eb, cluster FROM (
         |    SELECT b.vec_id, b.e AS eb, c.cid AS cluster,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |        list_sum([c.ce[i] * b.e[i] for i in range(1, len(c.ce) + 1)])
         |          / (c.cn * b.nrm) DESC, c.cid) AS rn
         |    FROM n b CROSS JOIN $cents c)
         |  WHERE rn = 1)""".stripMargin
    def explode(name: String, asg: String) =
      s"""$name AS (
         |  SELECT cluster, s.dim AS dim, s.x AS x FROM (
         |    SELECT cluster,
         |      unnest([{'dim': i, 'x': eb[i + 1]} for i in range(0, len(eb))]) AS s
         |    FROM $asg))""".stripMargin
    def center(mName: String, cName: String, xName: String) =
      s"""$mName AS (
         |  SELECT cluster, dim,
         |    CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         |      / count(*) AS c
         |  FROM $xName GROUP BY cluster, dim),
         |$cName AS (
         |  SELECT cid, ce, sqrt(list_sum([y * y for y in ce])) AS cn FROM (
         |    SELECT cluster AS cid, list(c ORDER BY dim) AS ce
         |    FROM $mName GROUP BY cluster))""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
       |n AS (
       |  SELECT vec_id, e, sqrt(list_sum([x * x for x in e])) AS nrm FROM v),
       |c0 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS cid, e AS ce, nrm AS cn
       |  FROM n WHERE vec_id < 8),
       |${assign("a1", "c0")},
       |${explode("x1", "a1")},
       |${center("m1", "c1", "x1")},
       |${assign("a2", "c1")},
       |${explode("x2", "a2")},
       |${center("m2", "c2", "x2")},
       |${assign("a3", "c2")},
       |${explode("x3", "a3")}
       |SELECT cluster, CAST(dim AS BIGINT) AS dim, count(*) AS n_members,
       |  CAST(sum(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS centroid_sum
       |FROM x3 GROUP BY cluster, dim ORDER BY cluster, dim""".stripMargin
  }

  /** Ten unrolled fixed-point iterations (see Mining.qPagerank): the
    * recursive form would need grouped recursion, which portable SQL
    * lacks; the unroll is mechanical so it is generated, not typed. */
  private def pagerankOracle: String = {
    val iters = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST(150000000 + COALESCE(SUM((85 * r.pr * e.wppm) // 100000000), 0)
         |      AS BIGINT) AS pr
         |  FROM nodes n
         |  LEFT JOIN e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e0 GROUP BY src),
       |e AS (
       |  SELECT e0.src, e0.dst, CAST((w * 1000000) // outw AS BIGINT) AS wppm
       |  FROM e0 JOIN ow ON e0.src = ow.src),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |$iters
       |SELECT n_name, pr AS pagerank FROM r10
       |JOIN nation ON node = n_nationkey
       |ORDER BY n_name""".stripMargin
  }
}
