package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans of representative queries for
  * the scale audit (pushdown, broadcast, codegen coverage). */
object PlanAudit extends App {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val sf = "/root/testdata/sf0.01"
  val targets = Seq("q02_filter_where", "q11_join_multiway", "q20_agg_hash",
    "q30_window_rank", "q82_knn_cosine", "q05_topk_global", "q15_join_theta",
    "q85_dedup_minhash_lsh", "q86_dedup_ngram", "q16_join_asof",
    "q52_math_funcs", "q58_decimal_money", "q94_dedup_lsh_lang",
    "q96_dedup_simhash", "q97_curation_pipeline", "q98_knn_ivf_cell",
    "q24_agg_grouping_sets", "q45_pivot", "q46_subquery",
    "q19_join_asof_generic", "q75_dedup_incremental", "q76_profile_stats",
    "q99_quality_repetition", "q100_dedup_components", "q101_contamination",
    "q102_seq_pack", "q103_text_normalize", "q104_shard_assign",
    "q105_domain_mix", "q106_line_dedup", "q107_quality_classifier",
    "q108_dedup_canonical", "q109_dedup_keep_best",
    "q110_winnow_fingerprint", "q111_lm_bigram_score",
    "q112_char_entropy", "q113_source_divergence", "q114_stratified_topk",
    "q115_dedup_prefix", "q116_mix_temperature", "q117_span_mask",
    "q118_pii_redact", "q119_event_funnel", "q120_cohort_retention",
    "q121_event_transitions", "q122_user_rfm", "q123_scd2_intervals",
    "q124_time_weighted_avg", "q125_dq_checks", "q126_attribution",
    "q127_window_funnel", "q128_topk_per_key", "q129_interval_join",
    "q130_bm25_ranked", "q131_sessionize", "q132_value_histogram",
    "q133_rolling_zscore", "q134_ab_test", "q135_trend_slope",
    "q136_robust_stats", "q137_window_distinct", "q138_dau_wau",
    "q139_geo_cell_join", "q140_topk_events", "q141_inverted_index",
    "q142_correlation", "q143_hierarchy_flatten", "q144_resample_locf",
    "q145_fuzzy_match", "q146_interval_overlap", "q147_pareto",
    "q148_subtree_rollup", "q149_chi_square", "q150_skyline",
    "q151_triangle_count", "q152_weighted_median", "q153_day_streaks",
    "q154_basket_lift", "q155_kmeans_assign", "q156_skyline3d",
    "q157_pagerank", "q158_semdedup", "q159_bfs_hops",
    "q160_item_cooccur_sim", "q161_path_trigrams", "q162_ewma",
    "q163_entity_clusters", "q164_knn_label_vote", "q165_grid_density",
    "q166_time_to_convert", "q167_mutual_info", "q168_seasonal_index",
    "q169_changepoint", "q170_cohort_ltv", "q171_lag_autocorr",
    "q27_agg_percentile", "q33_window_ntile", "q172_bpe_token_stats",
    "q173_event_pivot", "q174_value_ecdf", "q175_doc_chunks",
    "q176_event_rollup", "q177_span_dedup", "q178_quota_sample",
    "q179_dup_rate_by_source", "q180_dup_span_share", "q181_dsir_weight",
    "q182_ngram_novelty", "q183_target_encode", "q184_benford",
    "q185_shortest_path", "q186_distinct_ngrams", "q187_order_reconcile",
    "q188_decile_gains", "q189_ks_drift", "q190_unpivot",
    "q191_auc_roc", "q192_kaplan_meier", "q193_span_containment",
    "q194_gini_spend", "q195_user_entropy", "q196_new_returning",
    "q197_embed_health", "q198_quantile_normalize", "q199_mom_growth",
    "q200_ann_recall", "q227_ann_recall_kmeans",
    "q201_seasonal_decompose", "q202_kcore_peel",
    "q203_dedup_report", "q204_demand_variability",
    "q205_forecast_backtest", "q206_slo_burn", "q207_psi_drift",
    "q208_order_aging", "q209_session_stats", "q210_lagged_xcorr",
    "q211_vocab_growth", "q212_retrieval_eval", "q213_calibration_bins",
    "q214_hhi_spend", "q215_dispersion", "q216_readability",
    "q217_daily_anomaly", "q218_churn_state", "q219_ship_delay",
    "q220_rebalance_plan", "q221_value_bands",
    "q222_position_attribution", "q223_srm_screen",
    "q224_margin_waterfall", "q225_audience_overlap",
    "q226_lang_confusion")
  targets.foreach { q =>
    println(s"\n========== $q ==========")
    println(SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
  spark.stop()
}
