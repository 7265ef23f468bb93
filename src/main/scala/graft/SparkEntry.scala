package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, GraphOps, MultimodalOps, Recommender, Relational, TextOps, VectorOps}
import graft.pipeline.ExclusionPipeline

/** Driver contract — see /root/repo/SURVEY.md §2 (declared inventory)
  * and §7 (build order). Every declared operator has a `queries`
  * entry; every SQL-expressible one also has a DuckDB twin in
  * `oracleSql` (graft.Oracles). Non-SQL-expressible ops
  * (HLL sketch, LSH/IVF ANN) are implemented + spec-tested but not
  * oracle-declared, per SURVEY §2.12.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's E1 pipeline shape
    * (/root/reference/__main__.py:36-67) in relational form:
    * filter → enrichment join → group-agg → top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderpriority"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1–§2.2 scans / predicates
    "q_scan_project" -> (Relational.q_scan_project _),
    "q_filter_eq" -> (Relational.q_filter_eq _),
    "q_filter_nonempty" -> (Relational.q_filter_nonempty _),
    "q_filter_range" -> (Relational.q_filter_range _),
    // §2.6 sort / top-k
    "q_topk_desc" -> (Relational.q_topk_desc _),
    "q_topk_offset" -> (Relational.q_topk_offset _),
    // §2.4 aggregations
    "q_groupby_count" -> (Relational.q_groupby_count _),
    "q_agg_sum" -> (Relational.q_agg_sum _),
    "q_agg_distinct" -> (Relational.q_agg_distinct _),
    "q_agg_approx_distinct" -> (Relational.q_agg_approx_distinct _),
    "q_agg_rollup" -> (Relational.q_agg_rollup _),
    "q_agg_cube" -> (Relational.q_agg_cube _),
    "q_agg_stats" -> (Relational.q_agg_stats _),
    "q_agg_argminmax" -> (Relational.q_agg_argminmax _),
    "q_agg_corr" -> (Relational.q_agg_corr _),
    "q_agg_quantile" -> (Relational.q_agg_quantile _),
    "q_quantile_scalable" -> (Relational.q_quantile_scalable _),
    "q_time_parts" -> (Relational.q_time_parts _),
    "q_pivot" -> (Relational.q_pivot _),
    "q_profile" -> (operators.Profiler.q_profile _),
    "q_profile_approx" -> (operators.Profiler.q_profile_approx _),
    // §2.3 joins
    "q_join_enrich" -> (Relational.q_join_enrich _),
    "q_join_left" -> (Relational.q_join_left _),
    "q_join_multi" -> (Relational.q_join_multi _),
    "q_join_star" -> (Relational.q_join_star _),
    "q_join_anti" -> (Relational.q_join_anti _),
    "q_join_semi" -> (Relational.q_join_semi _),
    "q_subquery_scalar" -> (Relational.q_subquery_scalar _),
    "q_subquery_scalar_1scan" -> (Relational.q_subquery_scalar_1scan _),
    "q_subquery_exists" -> (Relational.q_subquery_exists _),
    "q_subquery_in" -> (Relational.q_subquery_in _),
    "q_lateral_topn" -> (Relational.q_lateral_topn _),
    "q_recursive_decay" -> (Relational.q_recursive_decay _),
    "q_join_range_auto" -> (Relational.q_join_range_auto _),
    "q_join_asof" -> (AsOfJoin.q_join_asof _),
    "q_join_asof_native" -> (AsOfJoin.q_join_asof_native _),
    "q_join_asof_fwd" -> (AsOfJoin.q_join_asof_fwd _),
    "q_join_asof_fwd_native" -> (AsOfJoin.q_join_asof_fwd_native _),
    "q_join_asof_tol_native" -> (AsOfJoin.q_join_asof_tol_native _),
    "q_join_asof_nearest" -> (AsOfJoin.q_join_asof_nearest _),
    "q_join_asof_tol" -> (AsOfJoin.q_join_asof_tol _),
    "q_user_overlap" -> (Relational.q_user_overlap _),
    "q_join_range" -> (Relational.q_join_range _),
    "q_join_bloom" -> (operators.BloomJoin.q_join_bloom _),
    "q_join_salted" -> (Relational.q_join_salted _),
    // §2.7 set ops
    "q_set_union" -> (Relational.q_set_union _),
    "q_set_except" -> (Relational.q_set_except _),
    "q_set_intersect" -> (Relational.q_set_intersect _),
    // §2.5 windows
    "q_window_dedup_lww" -> (Relational.q_window_dedup_lww _),
    "q_window_rank" -> (Relational.q_window_rank _),
    "q_window_frame" -> (Relational.q_window_frame _),
    "q_window_ntile" -> (Relational.q_window_ntile _),
    "q_window_percent" -> (Relational.q_window_percent _),
    "q_sessionize" -> (Relational.q_sessionize _),
    "q_funnel" -> (Relational.q_funnel _),
    "q_retention" -> (Relational.q_retention _),
    "q_cohort_ltv" -> (Relational.q_cohort_ltv _),
    "q_seasonality" -> (Relational.q_seasonality _),
    "q_rolling_time" -> (Relational.q_rolling_time _),
    "q_sample_hash" -> (Relational.q_sample_hash _),
    "q_sample_stratified" -> (Relational.q_sample_stratified _),
    "q_sample_weighted" -> (Relational.q_sample_weighted _),
    "q_split_assign" -> (Relational.q_split_assign _),
    "q_scd2" -> (Relational.q_scd2 _),
    "q_markov" -> (Relational.q_markov _),
    "q_interp" -> (Relational.q_interp _),
    "q_ab_test" -> (Relational.q_ab_test _),
    "q_dq_checks" -> (Relational.q_dq_checks _),
    "q_agg_mode" -> (Relational.q_agg_mode _),
    "q_contingency" -> (Relational.q_contingency _),
    "q_attribution" -> (Relational.q_attribution _),
    "q_shard_assign" -> (Relational.q_shard_assign _),
    "q_readability" -> (TextOps.q_readability _),
    "q_unpivot" -> (Relational.q_unpivot _),
    "q_changepoint" -> (Relational.q_changepoint _),
    "q_cross_corr" -> (Relational.q_cross_corr _),
    "q_vocab_coverage" -> (TextOps.q_vocab_coverage _),
    "q_linreg" -> (Relational.q_linreg _),
    "q_basket" -> (Relational.q_basket _),
    "q_concentration" -> (Relational.q_concentration _),
    "q_benford" -> (Relational.q_benford _),
    "q_forecast_eval" -> (Relational.q_forecast_eval _),
    "q_skyline" -> (Relational.q_skyline _),
    "q_weighted_median" -> (Relational.q_weighted_median _),
    "q_streak" -> (Relational.q_streak _),
    "q_cdc_merge" -> (Relational.q_cdc_merge _),
    "q_feature_hash" -> (TextOps.q_feature_hash _),
    // §2.8 scalar functions
    "q_regex_clean" -> (Relational.q_regex_clean _),
    "q_typify_cast" -> (Relational.q_typify_cast _),
    "q_json_extract" -> (Relational.q_json_extract _),
    "q_explode" -> (Relational.q_explode _),
    "q_html_inputs" -> (ExclusionPipeline.q_html_inputs _),
    "q_time_bucket" -> (Relational.q_time_bucket _),
    // §2.11 text / dedup
    "q_text_dedup" -> (TextOps.q_text_dedup _),
    "q_text_tokens" -> (TextOps.q_text_tokens _),
    "q_token_count" -> (TextOps.q_token_count _),
    "q_heavy_hitters" -> (TextOps.q_heavy_hitters _),
    "q_group_topk" -> (TextOps.q_group_topk _),
    "q_lang_id" -> (TextOps.q_lang_id _),
    "q_logreg" -> (TextOps.q_logreg _),
    "q_boost" -> (TextOps.q_boost _),
    "q_nbayes" -> (TextOps.q_nbayes _),
    "q_dtree" -> (TextOps.q_dtree _),
    "q_kmeans" -> (TextOps.q_kmeans _),
    "q_auc" -> (TextOps.q_auc _),
    "q_als" -> (Recommender.q_als _),
    "q_forest" -> (TextOps.q_forest _),
    "q_gbt" -> (TextOps.q_gbt _),
    "q_crossval" -> (TextOps.q_crossval _),
    "q_chi2" -> (TextOps.q_chi2 _),
    "q_learning_curve" -> (TextOps.q_learning_curve _),
    "q_isotonic" -> (Relational.q_isotonic _),
    "q_conformal" -> (Relational.q_conformal _),
    "q_quality_score" -> (TextOps.q_quality_score _),
    "q_quality_rules" -> (TextOps.q_quality_rules _),
    "q_compress_ratio" -> (TextOps.q_compress_ratio _),
    "q_fingerprint" -> (TextOps.q_fingerprint _),
    "q_redact" -> (TextOps.q_redact _),
    "q_text_clean" -> (TextOps.q_text_clean _),
    "q_tfidf" -> (TextOps.q_tfidf _),
    "q_bm25" -> (TextOps.q_bm25 _),
    "q_rrf" -> (TextOps.q_rrf _),
    "q_ndcg" -> (TextOps.q_ndcg _),
    "q_postings" -> (TextOps.q_postings _),
    "q_keywords" -> (TextOps.q_keywords _),
    "q_edit_distance" -> (TextOps.q_edit_distance _),
    "q_fuzzy_join" -> (TextOps.q_fuzzy_join _),
    "q_name_match" -> (TextOps.q_name_match _),
    "q_dedup_ngram" -> (TextOps.q_dedup_ngram _),
    "q_dedup_containment" -> (TextOps.q_dedup_containment _),
    "q_minhash_sig" -> (TextOps.q_minhash_sig _),
    "q_dedup_minhash" -> (TextOps.q_dedup_minhash _),
    "q_minhash_est" -> (TextOps.q_minhash_est _),
    "q_dedup_cluster" -> (TextOps.q_dedup_cluster _),
    "q_curate" -> (TextOps.q_curate _),
    "q_pipeline_build" -> (TextOps.q_pipeline_build _),
    "q_repetition" -> (TextOps.q_repetition _),
    "q_decontaminate" -> (TextOps.q_decontaminate _),
    "q_dedup_incremental" -> (TextOps.q_dedup_incremental _),
    "q_mixture_weights" -> (TextOps.q_mixture_weights _),
    "q_pack" -> (TextOps.q_pack _),
    "q_token_entropy" -> (TextOps.q_token_entropy _),
    "q_lm_score" -> (TextOps.q_lm_score _),
    "q_lm_bigram" -> (TextOps.q_lm_bigram _),
    "q_chunk" -> (TextOps.q_chunk _),
    "q_boilerplate" -> (TextOps.q_boilerplate _),
    "q_cooccur" -> (TextOps.q_cooccur _),
    "q_outlier" -> (TextOps.q_outlier _),
    "q_winsorize" -> (TextOps.q_winsorize _),
    "q_anomaly_mad" -> (TextOps.q_anomaly_mad _),
    "q_bpe_pairs" -> (TextOps.q_bpe_pairs _),
    "q_corpus_stats" -> (TextOps.q_corpus_stats _),
    "q_histogram" -> (Relational.q_histogram _),
    "q_histogram_log" -> (TextOps.q_histogram_log _),
    "q_dedup_span" -> (TextOps.q_dedup_span _),
    // connector end-to-end (hash-gated: the oracle regenerates the
    // deterministic fixture inline — Oracles.scala q_datatables_scan)
    "q_datatables_scan" ->
      (sources.datatables.DataTablesQueries.q_datatables_scan _),
    "q_grouping_sets" -> (Relational.q_grouping_sets _),
    "q_agg_quantile_approx" -> (Relational.q_agg_quantile_approx _),
    "q_set_union_all" -> (Relational.q_set_union_all _),
    "q_set_except_all" -> (Relational.q_set_except_all _),
    "q_set_intersect_all" -> (Relational.q_set_intersect_all _),
    "q_simhash_sig" -> (TextOps.q_simhash_sig _),
    "q_dedup_simhash" -> (TextOps.q_dedup_simhash _),
    // §2.11 vectors
    "q_sim_topk" -> (VectorOps.q_sim_topk _),
    "q_vec_norm" -> (VectorOps.q_vec_norm _),
    "q_vec_project" -> (VectorOps.q_vec_project _),
    "q_dedup_embed" -> (VectorOps.q_dedup_embed _),
    "q_dedup_embed_star" -> (VectorOps.q_dedup_embed_star _),
    "q_dedup_semantic" -> (VectorOps.q_dedup_semantic _),
    "q_centroid_sim" -> (VectorOps.q_centroid_sim _),
    "q_vec_quantize" -> (VectorOps.q_vec_quantize _),
    "q_ann_lsh" -> (VectorOps.q_ann_lsh _),
    "q_ann_ivf" -> (VectorOps.q_ann_ivf _),
    // multimodal
    "q_media_meta" -> (MultimodalOps.q_media_meta _),
    "q_media_frames" -> (MultimodalOps.q_media_frames _),
    "q_media_features" -> (MultimodalOps.q_media_features _),
    "q_media_dhash" -> (MultimodalOps.q_media_dhash _),
    "q_vec_cov" -> (VectorOps.q_vec_cov _),
    "q_vec_cov_sample" -> (VectorOps.q_vec_cov_sample _),
    "q_vec_pca" -> (VectorOps.q_vec_pca _),
    // graph analytics
    "q_pagerank" -> (GraphOps.q_pagerank _),
    "q_pagerank_conv" -> (GraphOps.q_pagerank_conv _),
    "q_triangles" -> (GraphOps.q_triangles _),
    "q_bfs" -> (GraphOps.q_bfs _),
    "q_hits" -> (GraphOps.q_hits _),
    "q_sssp" -> (GraphOps.q_sssp _),
    // customer / time-series analytics (round 5, batch 2)
    "q_rfm" -> (Relational.q_rfm _),
    "q_growth" -> (Relational.q_growth _),
    "q_paths" -> (Relational.q_paths _),
    "q_ewma" -> (Relational.q_ewma _),
    // analytics / ML-feature batch (round 5, session 2)
    "q_acf" -> (Relational.q_acf _),
    "q_psi_drift" -> (Relational.q_psi_drift _),
    "q_target_encode" -> (Relational.q_target_encode _),
    "q_join_interval" -> (Relational.q_join_interval _),
    "q_join_followup" -> (Relational.q_join_followup _),
    "q_snapshot_diff" -> (Relational.q_snapshot_diff _),
    "q_vec_pq" -> (VectorOps.q_vec_pq _),
    "q_time_rollup" -> (Relational.q_time_rollup _),
    "q_lag_features" -> (Relational.q_lag_features _),
    "q_ann_ivfpq" -> (VectorOps.q_ann_ivfpq _),
    "q_bpe_train" -> (TextOps.q_bpe_train _),
    "q_bpe_encode" -> (TextOps.q_bpe_encode _),
    "q_cume_users" -> (Relational.q_cume_users _),
    "q_gini" -> (Relational.q_gini _),
    "q_survival" -> (Relational.q_survival _),
    "q_ks_drift" -> (Relational.q_ks_drift _),
    "q_jackknife" -> (Relational.q_jackknife _),
    "q_rolling_median" -> (Relational.q_rolling_median _),
    "q_coverage_curve" -> (TextOps.q_coverage_curve _),
    "q_dedup_eval_sweep" -> (TextOps.q_dedup_eval_sweep _),
    "q_lorenz" -> (Relational.q_lorenz _),
    "q_quality_vs_dup" -> (TextOps.q_quality_vs_dup _),
    "q_corr_matrix" -> (Relational.q_corr_matrix _),
    "q_window_nav" -> (Relational.q_window_nav _),
    "q_calibration" -> (Relational.q_calibration _),
    "q_bootstrap" -> (Relational.q_bootstrap _),
    "q_hll_overlap" -> (Relational.q_hll_overlap _),
    "q_pii_scan" -> (TextOps.q_pii_scan _),
    "q_decile_bands" -> (Relational.q_decile_bands _),
    "q_mmr" -> (VectorOps.q_mmr _),
    "q_dedup_eval" -> (TextOps.q_dedup_eval _),
    "q_label_prop" -> (GraphOps.q_label_prop _),
    "q_cluster_stats" -> (TextOps.q_cluster_stats _),
    "q_sliding_uniques" -> (Relational.q_sliding_uniques _),
    "q_funnel_time" -> (Relational.q_funnel_time _),
    "q_entity_resolve" -> (TextOps.q_entity_resolve _),
    "q_distinct_ngrams" -> (TextOps.q_distinct_ngrams _),
    "q_kl_mixture" -> (TextOps.q_kl_mixture _),
    "q_source_overlap" -> (TextOps.q_source_overlap _),
    "q_dup_share" -> (TextOps.q_dup_share _),
    "q_zipf" -> (TextOps.q_zipf _),
    "q_cms_err" -> (TextOps.q_cms_err _),
    "q_sparse_sim" -> (TextOps.q_sparse_sim _),
    "q_mixture_sample" -> (TextOps.q_mixture_sample _),
    "q_dedup_canonical" -> (TextOps.q_dedup_canonical _),
    "q_anova" -> (TextOps.q_anova _),
    "q_langid_eval" -> (TextOps.q_langid_eval _),
    "q_topic_terms" -> (TextOps.q_topic_terms _),
    "q_hamming_hist" -> (TextOps.q_hamming_hist _),
    "q_degree_dist" -> (TextOps.q_degree_dist _),
    "q_source_profile" -> (TextOps.q_source_profile _),
    "q_dup_matrix" -> (TextOps.q_dup_matrix _),
    "q_kcore" -> (GraphOps.q_kcore _),
    // §2.10 streaming state machines under the driver's oracle gate:
    // real fMGWS queries drained with AvailableNow, final emissions
    // projected to the batch twin's shape (oracle = the twin's SQL)
    "q_stream_markov" -> (streaming.Streams.q_stream_markov _),
    "q_stream_retention" -> (streaming.Streams.q_stream_retention _),
    "q_stream_paths" -> (streaming.Streams.q_stream_paths _),
    "q_stream_sessionize" -> (streaming.Streams.q_stream_sessionize _),
    "q_stream_funnel" -> (streaming.Streams.q_stream_funnel _),
    "q_stream_windowed" -> (streaming.Streams.q_stream_windowed _),
    "q_stream_lww" -> (streaming.Streams.q_stream_lww _),
    "q_stream_topk" -> (streaming.Streams.q_stream_topk _),
    "q_stream_asof" -> (streaming.Streams.q_stream_asof _),
    "q_stream_psi" -> (streaming.Streams.q_stream_psi _),
    "q_stream_dedup" -> (streaming.Streams.q_stream_dedup _),
    "q_stream_join" -> (streaming.Streams.q_stream_join _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_agg_approx_distinct, q_ann_lsh, q_ann_ivf, q_profile_approx,
    * q_agg_quantile_approx, q_compress_ratio) → rows-only check.
    */
  def oracleSql: Map[String, String] = Oracles.sql
}
