package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.SaveMode

/** Degenerate-input robustness: every corpus-preparation query must
  * return an EMPTY frame (not throw) on an empty documents table — at
  * 100 TB, empty partitions, filtered-out strata, and zero-row incremental
  * batches are routine, and an operator that NPEs or divides by zero on
  * them kills the job.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.documents(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("corpus-preparation queries return empty, not errors, on zero docs") {
    val qs = Seq(
      "q100_dedup_components", "q101_contamination", "q102_seq_pack",
      "q103_text_normalize", "q104_shard_assign", "q105_domain_mix",
      "q106_line_dedup", "q107_quality_classifier", "q108_dedup_canonical",
      "q109_dedup_keep_best", "q110_winnow_fingerprint",
      "q111_lm_bigram_score", "q112_char_entropy", "q113_source_divergence",
      "q114_stratified_topk", "q115_dedup_prefix", "q116_mix_temperature",
      "q117_span_mask", "q130_bm25_ranked", "q172_bpe_token_stats",
      "q175_doc_chunks",
      // round-6 span/selection tier
      "q177_span_dedup", "q178_quota_sample", "q179_dup_rate_by_source",
      "q180_dup_span_share", "q181_dsir_weight", "q182_ngram_novelty",
      "q186_distinct_ngrams", "q193_span_containment",
      // embeddings live in the same fixture dir
      "q197_embed_health", "q200_ann_recall", "q227_ann_recall_kmeans",
      "q203_dedup_report")
    qs.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, emptyDir).count()
      assert(n == 0, s"$q returned $n rows on an empty corpus")
    }
  }

  private lazy val emptyEventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-ev").toString
    // write zero rows under the RAW events schema (ts as int64 nanos) so
    // Tables.events' nanosAsLong read path sees the shape it expects
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Tables.eventsRawSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  test("event-analytics queries return empty, not errors, on zero events") {
    val qs = Seq(
      "q118_pii_redact", "q119_event_funnel", "q120_cohort_retention",
      "q121_event_transitions", "q122_user_rfm", "q123_scd2_intervals",
      "q124_time_weighted_avg", "q126_attribution", "q127_window_funnel",
      "q129_interval_join", "q131_sessionize", "q132_value_histogram",
      "q133_rolling_zscore", "q134_ab_test", "q135_trend_slope",
      "q136_robust_stats", "q137_window_distinct", "q138_dau_wau",
      "q144_resample_locf", "q146_interval_overlap", "q149_chi_square",
      "q153_day_streaks", "q154_basket_lift",
      // round-5 cont. 5 mining/time-series tier
      "q161_path_trigrams", "q162_ewma", "q166_time_to_convert",
      "q167_mutual_info", "q168_seasonal_index", "q169_changepoint",
      "q170_cohort_ltv", "q171_lag_autocorr",
      // round-6 reporting tier
      // q176 excluded on purpose: GROUPING SETS (()) correctly yields the
      // grand-total row even over zero input rows
      "q173_event_pivot", "q174_value_ecdf",
      // round-6 continuation: ML-eval / survival / growth tier
      "q183_target_encode", "q188_decile_gains", "q189_ks_drift",
      "q191_auc_roc", "q192_kaplan_meier", "q195_user_entropy",
      "q196_new_returning", "q198_quantile_normalize",
      "q201_seasonal_decompose", "q205_forecast_backtest",
      "q206_slo_burn")
    qs.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, emptyEventsDir).count()
      assert(n == 0, s"$q returned $n rows on an empty event log")
    }
  }

  test("q163/q164 mining queries return empty on empty customers/embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-m").toString
    Tables.customer(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    Tables.embeddings(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    Tables.lineitem(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    Seq("q163_entity_clusters", "q164_knn_label_vote",
        "q160_item_cooccur_sim").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0, s"$q returned $n rows on empty inputs")
    }
  }

  test("q139/q143 return empty, not errors, on zero customers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-cu").toString
    Tables.customer(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
    Seq("q139_geo_cell_join", "q143_hierarchy_flatten",
        "q145_fuzzy_match", "q148_subtree_rollup",
        "q151_triangle_count", "q202_kcore_peel").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0, s"$q returned $n rows on an empty customer table")
    }
  }

  test("warehouse reporting queries return empty, not errors, on zero " +
    "orders/lineitems") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-or").toString
    Tables.orders(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    Tables.lineitem(spark, sfDir).limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    Seq("q184_benford", "q187_order_reconcile", "q190_unpivot",
        "q199_mom_growth", "q204_demand_variability").foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      assert(n == 0, s"$q returned $n rows on an empty order book")
    }
  }
}
