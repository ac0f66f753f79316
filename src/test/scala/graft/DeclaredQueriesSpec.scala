package graft

import org.apache.spark.sql.functions._

/** Smoke + pinned-shape checks for every declared query (the full
  * hash-match gate is the driver's DuckDB oracle; tools/compare.py mirrors
  * it — these assert structural invariants that survive refactors).
  */
class DeclaredQueriesSpec extends SparkSpec {

  // pinned sf0.001 row counts — the cheap regression net under the full
  // DuckDB-oracle gate; a count change means a semantic change
  private val golden: Map[String, Long] = Map(
    "q01_scan_project" -> 100L, "q02_filter_where" -> 48L,
    "q03_project_arith" -> 500L, "q04_sort_multi" -> 200L,
    "q05_topk_global" -> 50L, "q10_join_inner" -> 1000L,
    "q11_join_multiway" -> 1L, "q12_join_left_outer" -> 150L,
    "q13_join_semi" -> 27L, "q14_join_anti" -> 7L, "q15_join_theta" -> 25L,
    "q16_join_asof" -> 202L, "q17_join_cross" -> 125L,
    "q19_join_asof_generic" -> 202L, "q20_agg_hash" -> 6L,
    "q21_agg_distinct" -> 5L, "q22_agg_rollup" -> 31L, "q23_agg_cube" -> 24L,
    "q25_agg_having" -> 149L, "q26_agg_stats" -> 5L,
    "q30_window_rank" -> 449L, "q31_window_frame" -> 1000L,
    "q32_window_lag" -> 1000L, "q40_union" -> 57L, "q41_intersect" -> 4L,
    "q42_except" -> 30L, "q50_string_funcs" -> 200L,
    "q51_date_funcs" -> 80L, "q52_math_funcs" -> 500L,
    "q53_case_coalesce" -> 15L, "q54_array_funcs" -> 100L,
    "q55_json_map" -> 5L, "q60_window_tumbling" -> 150L,
    "q61_window_sliding" -> 123L, "q62_session_window" -> 946L,
    "q63_dedup_keyed" -> 75L, "q70_udf_scalar" -> 3L,
    "q71_udaf_weighted" -> 3L, "q72_udtf_explode" -> 192L,
    "q80_dedup_exact" -> 500L, "q81_sim_jaccard" -> 7289L,
    "q82_knn_cosine" -> 25L, "q83_text_topterms" -> 25L,
    "q84_text_langstats" -> 99L, "q85_dedup_minhash_lsh" -> 260L,
    "q86_dedup_ngram" -> 8L, "q87_dedup_embcos" -> 82L,
    "q88_text_quality" -> 500L, "q89_doc_fingerprint" -> 500L,
    "q90_fulltext_search" -> 304L, "q18_join_full_outer" -> 36L,
    "q27_agg_percentile" -> 5L, "q33_window_ntile" -> 1500L,
    "q43_union_all" -> 65L, "q56_regex_funcs" -> 200L,
    "q28_agg_minmax_by" -> 5L, "q34_window_range" -> 202L,
    "q44_except_all" -> 957L, "q29_agg_bool" -> 5L,
    "q35_window_firstlast" -> 15L, "q57_date_arith" -> 500L,
    "q91_text_langid" -> 500L, "q92_text_tfidf" -> 1500L,
    "q93_text_cooccur" -> 25L, "q94_dedup_lsh_lang" -> 7283L,
    "q58_decimal_money" -> 3L, "q59_geo_distance" -> 10L,
    "q95_fulltext_ranked" -> 304L, "q24_agg_grouping_sets" -> 9L,
    "q36_window_distribution" -> 150L, "q45_pivot" -> 3L,
    "q46_subquery" -> 130L, "q48_string_agg" -> 5L,
    "q97_curation_pipeline" -> 421L, "q96_dedup_simhash" -> 1883L,
    "q98_knn_ivf_cell" -> 25L, "q99_quality_repetition" -> 500L,
    "q73_hash_split" -> 500L, "q74_data_recipe" -> 196L,
    "q75_dedup_incremental" -> 247L, "q76_profile_stats" -> 5L,
    "q77_upsert_merge" -> 1500L, "q100_dedup_components" -> 335L,
    "q101_contamination" -> 236L, "q102_seq_pack" -> 331L,
    "q172_bpe_token_stats" -> 5L, "q173_event_pivot" -> 5L,
    "q174_value_ecdf" -> 1000L, "q175_doc_chunks" -> 1388L,
    "q176_event_rollup" -> 13L,
    "q177_span_dedup" -> 45L, "q178_quota_sample" -> 5L,
    "q179_dup_rate_by_source" -> 20L, "q180_dup_span_share" -> 500L,
    "q181_dsir_weight" -> 500L, "q182_ngram_novelty" -> 500L,
    "q183_target_encode" -> 15L, "q184_benford" -> 9L,
    "q185_shortest_path" -> 15L, "q186_distinct_ngrams" -> 15L,
    "q187_order_reconcile" -> 3L, "q188_decile_gains" -> 10L,
    "q189_ks_drift" -> 5L, "q190_unpivot" -> 4L,
    "q191_auc_roc" -> 5L, "q192_kaplan_meier" -> 5L,
    "q193_span_containment" -> 28L, "q194_gini_spend" -> 5L,
    "q195_user_entropy" -> 15L, "q196_new_returning" -> 30L,
    "q197_embed_health" -> 64L, "q198_quantile_normalize" -> 1000L,
    "q199_mom_growth" -> 80L, "q200_ann_recall" -> 50L,
    "q201_seasonal_decompose" -> 150L, "q202_kcore_peel" -> 0L,
    "q203_dedup_report" -> 6L, "q204_demand_variability" -> 200L,
    "q205_forecast_backtest" -> 5L, "q206_slo_burn" -> 30L,
    "q207_psi_drift" -> 5L, "q208_order_aging" -> 12L,
    "q209_session_stats" -> 30L, "q210_lagged_xcorr" -> 8L,
    "q211_vocab_growth" -> 50L, "q212_retrieval_eval" -> 10L,
    "q213_calibration_bins" -> 10L, "q214_hhi_spend" -> 5L,
    "q215_dispersion" -> 5L, "q216_readability" -> 500L,
    "q217_daily_anomaly" -> 15L, "q218_churn_state" -> 2L,
    "q219_ship_delay" -> 5L, "q220_rebalance_plan" -> 20L,
    "q221_value_bands" -> 30L, "q222_position_attribution" -> 2L,
    "q223_srm_screen" -> 30L, "q224_margin_waterfall" -> 83L,
    "q225_audience_overlap" -> 10L, "q226_lang_confusion" -> 25L,
    "q227_ann_recall_kmeans" -> 50L,
    "q103_text_normalize" -> 500L, "q104_shard_assign" -> 16L,
    "q105_domain_mix" -> 20L, "q106_line_dedup" -> 500L,
    "q107_quality_classifier" -> 500L, "q108_dedup_canonical" -> 174L,
    "q109_dedup_keep_best" -> 174L, "q110_winnow_fingerprint" -> 500L,
    "q111_lm_bigram_score" -> 500L, "q112_char_entropy" -> 500L,
    "q113_source_divergence" -> 20L, "q114_stratified_topk" -> 50L,
    "q115_dedup_prefix" -> 24L, "q116_mix_temperature" -> 20L,
    "q117_span_mask" -> 500L, "q118_pii_redact" -> 1000L,
    "q119_event_funnel" -> 8L, "q120_cohort_retention" -> 9L,
    "q121_event_transitions" -> 25L, "q122_user_rfm" -> 15L,
    "q123_scd2_intervals" -> 802L, "q124_time_weighted_avg" -> 15L,
    "q125_dq_checks" -> 5L, "q126_attribution" -> 5L,
    "q127_window_funnel" -> 4L, "q128_topk_per_key" -> 449L,
    "q129_interval_join" -> 520L, "q130_bm25_ranked" -> 335L,
    "q131_sessionize" -> 946L, "q132_value_histogram" -> 29L,
    "q133_rolling_zscore" -> 14L, "q134_ab_test" -> 1L,
    "q135_trend_slope" -> 15L, "q136_robust_stats" -> 5L,
    "q137_window_distinct" -> 1000L, "q138_dau_wau" -> 30L,
    "q139_geo_cell_join" -> 147L, "q140_topk_events" -> 30L,
    "q141_inverted_index" -> 5L, "q142_correlation" -> 5L,
    "q143_hierarchy_flatten" -> 150L, "q144_resample_locf" -> 138L,
    "q145_fuzzy_match" -> 150L, "q146_interval_overlap" -> 40L,
    "q147_pareto" -> 10L, "q148_subtree_rollup" -> 150L,
    "q149_chi_square" -> 5L, "q150_skyline" -> 5L,
    "q151_triangle_count" -> 15L, "q152_weighted_median" -> 10L,
    "q153_day_streaks" -> 15L, "q154_basket_lift" -> 10L,
    "q155_kmeans_assign" -> 8L, "q156_skyline3d" -> 9L,
    "q157_pagerank" -> 15L, "q158_semdedup" -> 18L,
    "q159_bfs_hops" -> 15L, "q160_item_cooccur_sim" -> 6L,
    "q161_path_trigrams" -> 2L, "q162_ewma" -> 45L,
    "q163_entity_clusters" -> 150L, "q164_knn_label_vote" -> 10L,
    "q165_grid_density" -> 10L, "q166_time_to_convert" -> 4L,
    "q167_mutual_info" -> 5L, "q168_seasonal_index" -> 35L,
    "q169_changepoint" -> 5L, "q170_cohort_ltv" -> 5L,
    "q171_lag_autocorr" -> 1L)

  test("every declared query has an oracle and matches its golden sf0.001 count") {
    val qs = SparkEntry.queries
    assert(qs.size == golden.size,
      s"query set changed: ${qs.keySet.diff(golden.keySet)} / ${golden.keySet.diff(qs.keySet)} -- re-pin golden counts")
    assert(SparkEntry.oracleSql.keySet == qs.keySet,
      s"oracle/queries key mismatch: ${qs.keySet.diff(SparkEntry.oracleSql.keySet)} / ${SparkEntry.oracleSql.keySet.diff(qs.keySet)}")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n == golden(name), s"$name: got $n rows, golden ${golden(name)}")
    }
  }

  test("entry() is the flagship q20 and returns the 6 flag×status groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("q17 cross join is exactly |region| × |nation|") {
    assert(SparkEntry.queries("q17_join_cross")(spark, sfDir).count() == 125)
  }

  test("q30 emits at most 3 rows per customer, rank consistent") {
    val df = SparkEntry.queries("q30_window_rank")(spark, sfDir)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") =!= col("rnk")).count() == 0) // unique sort key
  }

  test("q81 plan contains no cartesian product (blocked join)") {
    val plan = SparkEntry.queries("q81_sim_jaccard")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q82 ranks are 1..5 per probe") {
    val df = SparkEntry.queries("q82_knn_cosine")(spark, sfDir)
    val perProbe = df.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
      .collect()
    assert(perProbe.length == 5)
    perProbe.foreach { r =>
      assert(r.getAs[Long]("n") == 5 && r.getAs[Long]("mn") == 1 &&
        r.getAs[Long]("mx") == 5)
    }
  }

  test("q40/q41/q42 satisfy |A ∪ B| = |A| + |B| - |A ∩ B| (independent |A|, |B|)") {
    val u = SparkEntry.queries("q40_union")(spark, sfDir).count()
    val i = SparkEntry.queries("q41_intersect")(spark, sfDir).count()
    val d = SparkEntry.queries("q42_except")(spark, sfDir).count()
    // |A| and |B| counted straight from the source frames, NOT derived
    // from u/i/d — otherwise the identity is a tautology
    val a = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").distinct().count()
    val b = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 490000)
      .select("o_custkey").distinct().count()
    assert(u == a + b - i, s"u=$u a=$a b=$b i=$i")
    assert(d == a - i, s"d=$d a=$a i=$i")
  }

  test("topk(50) ⊆ topk(100) for the global top-k") {
    val orders = Tables.orders(spark, sfDir)
    def top(k: Int) = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k).select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(top(50).subsetOf(top(100)))
  }

  test("q31 running sum final value equals the group sum per user") {
    val df = SparkEntry.queries("q31_window_frame")(spark, sfDir)
    val lastRun = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select(col("user_id"), col("run_sum"))
    val gsum = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(round(sum("value"), 2).as("g"))
    val joined = lastRun.join(gsum, "user_id")
      .filter(abs(col("run_sum") - col("g")) > 0.011)
    assert(joined.count() == 0)
  }

  test("q63 output is idempotent under re-dedup") {
    val d1 = SparkEntry.queries("q63_dedup_keyed")(spark, sfDir)
    assert(d1.count() == d1.dropDuplicates("user_id", "event_type").count())
  }
}
