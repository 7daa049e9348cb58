package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for representative queries — the
  * plan-review loop: check pushed filters, pruned schemas, broadcast vs
  * shuffle joins, and whole-stage codegen coverage before trusting a
  * query at scale. Usage: runMain graft.Plans [sfDir] [name ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "time_range_scan", "q5_region_revenue", "candles_1h", "topk_parts",
      "asof_purchase_click", "neardup_minhash_lsh", "cosine_topk_brute",
      "range_join_views",
      // round-2 additions: the LSH-bucketed vector paths (proof of no
      // cartesian join) and the columnar multimodal features (proof of
      // whole-stage codegen, no RDD hop)
      "cosine_neardup_pairs", "knn_label_purity", "ann_lsh_topk",
      "mm_binary_features",
      // late round-2: the native as-of exec and the remaining ANN paths
      "asof_purchase_click_native", "ann_multiprobe_topk", "ivf_ann_topk",
      // round-3: outer joins, tolerance as-of, windowed EMA, dup clusters
      // (iterative; the printed plan is the final cluster aggregation),
      // and the incremental store read-back (day-partitioned scan)
      "join_right_outer_customers", "join_full_outer_user_activity",
      "asof_purchase_click_tolerance", "ema_window_8",
      "neardup_dup_groups", "incremental_candles_store",
      // round-4: single-pass simhash bands, iterated Lloyd IVF, bucketed
      // as-of, int8 ANN, exploded-shingle Jaccard, decontamination,
      // repetition stats, RANGE frame, bivariate stats, token chunking
      "simhash_neardup_pairs", "ivf_lloyd2_topk",
      "asof_bucketed_global_click", "ann_int8_topk",
      "jaccard_bigram_pairs", "decontamination_overlap",
      "repetition_ngram_stats", "window_range_7d", "stat_regression",
      "chunk_documents",
      // round-4b: bloom probe-side pruning (filter must sit under the
      // join), bloom-screened decontamination, OPQ-rotated PQ, the ANN
      // recall measurement, the single-pass boilerplate window, heavy
      // hitters (ReusedExchange), native batch session_window, deciles,
      // nearest as-of, growth/cohort analytics
      "bloom_prune_revenue", "decontamination_bloom", "ann_opq_topk",
      "ann_recall_lsh", "boilerplate_ngram_ratio", "heavy_hitter_tokens",
      "vocab_by_source", "session_window_batch", "value_deciles_by_type",
      "asof_nearest_click", "user_growth_daily", "cohort_retention",
      // late round-4b: signal agreement, Arrow seam, robust stats,
      // interpolating gap fill
      "neardup_signal_agreement", "mm_binary_features_arrow",
      "mad_outliers", "gap_fill_interp",
      // round-5: the indicator family's shared single-window shape (tema
      // is the deepest), exact-moment stats, LATERAL decorrelation,
      // histogram-based join cardinality, ordered-fold text analytics,
      // centroid separation, PQ reconstruction error, discrete percentile
      // bands, session co-occurrence, sampled IVF recall
      "tema_window_8", "rsi_cutler_14", "autocorr_lag1",
      "skew_kurtosis_moments", "lateral_top2_orders",
      "join_cardinality_estimate", "entropy_unigram_docs",
      "kl_divergence_sources", "zipf_slope_corpus",
      "label_centroid_cosine", "pq_reconstruction_error",
      "hourly_percentile_bands", "session_pair_counts", "ann_recall_ivf",
      // late round-5: the graded bucketed co-located join (zero exchange
      // below the SMJ), sliding sketch-merge distinct, int8 recall, and
      // the recursive-CTE compounding index
      "bucketed_join_priority_revenue", "hll_sliding_distinct",
      "ann_recall_int8", "compound_index_weekly",
      "ann_recall_pq", "neardup_keep_by_quality",
      // round-6: binary ANN + its recall, forward/skewed as-of, candle
      // patterns, KMV sketches, candle MERGE, UNPIVOT (streaming drains
      // stay out of the dump — their registry builders execute eagerly)
      "ann_binary_topk", "ann_recall_binary", "asof_forward_click",
      "asof_skewed_type_candle", "candle_patterns_1h",
      "kmv_distinct_daily", "kmv_set_ops_users", "merge_upsert_candles",
      "unpivot_candle_measures",
      // round-7: embedding-level semantic dedup over the shared Lloyd
      // centroids
      "semdedup_keep",
      // round-7b: sliding KMV, intersection bounds, curation/mixing
      "kmv_sliding_distinct_7d", "kmv_intersection_bounds",
      "curation_quota_mix", "token_budget_fill",
      // round-8: matryoshka two-stage ANN, CMS, SymSpell banding, CEP
      // sequence regex, TWAP, single-scan profiling, integer PageRank
      "matryoshka_topk", "cms_heavy_hitters", "editdist1_pairs",
      "event_seq_regex", "twap_daily", "profile_columns",
      "pagerank_3iter", "pagerank_personalized", "profile_histogram",
      "event_seq_error_runs", "join_null_safe_props", "data_skew_report",
      "fk_integrity_check", "bitmap_distinct_users", "try_arithmetic_audit",
      "dedup_keep_latest",
      // round-9: repeated-span dedup, persisted ANN index read path, the
      // graph family (LPA / BFS / weighted PR / recursive CTE), CEP
      // quantifiers, two-level prefix-sum packing, grouped histograms,
      // KMV difference (streaming CEP stays out — eager drain)
      "substring_dup_spans", "ann_persisted_index_topk",
      "label_prop_3iter", "bfs_hops_3", "pagerank_weighted",
      "recursive_cte_paths", "event_seq_quantified", "seq_packing",
      "profile_histogram_by_group", "kmv_difference_bounds",
      "zorder_layout",
      // round-9 close: layout/graph/basket/sketch/interval/SCD2/forecast
      // seven, then the final batch — prefix-filtered Jaccard (broadcast
      // set verify), attribution single-pass window, CUSUM, RFM map-only
      // scoring, per-segment Gini, wide-integer PMI, banded interval
      // overlap, weighted Bellman-Ford, chi-square cells (streaming HLL/
      // editdist twins stay out — eager drains)
      "hilbert_layout", "triangle_count", "basket_brand_pairs",
      "hll_sparse_mode", "interval_merge_coverage", "scd2_user_state",
      "forecast_snaive_mae",
      "jaccard_prefix_join", "attribution_last_touch", "cusum_changepoint",
      "rfm_segments", "gini_by_segment", "pmi_top_bigrams",
      "interval_overlap_join", "bellman_ford_3", "contingency_chi2",
      // round-9 continuation: robust trend/means (Mann-Kendall, Theil-Sen,
      // trimmed/winsorized), audit + retrieval-fusion analytics, then the
      // final batch — distributed BPE training/apply, linear skyline,
      // item-item CF, data-derived k-core, weekly cohorts, Wilson A/B,
      // bigram novelty/next-word, linear attribution, matryoshka recall
      "mann_kendall_trend", "theil_sen_slope", "trimmed_mean_by_type",
      "benford_digit_audit", "vocab_growth_curve", "decayed_popularity",
      "bounce_rate_daily", "feature_scaling_minmax", "rrf_fusion_topk",
      "mmr_diversify_topk", "tokenizer_fertility", "filter_clause_aggs",
      "bpe_learn_merges", "bpe_vocab_apply", "pareto_frontier_docs",
      "copurchase_cosine", "kcore_3", "cohort_retention_weekly",
      "ab_conversion_wilson", "doc_novelty_bigram", "bigram_next_word",
      "attribution_linear", "ann_recall_matryoshka",
      // round-9 continuation 2: point-in-time SCD2 feature join (carry-
      // forward form), split-conformal coverage, centroid drift monitor
      // (streaming_pareto_frontier stays out — eager drain)
      "pit_feature_join", "conformal_interval_eval",
      "embedding_drift_halves", "dtw_banded_click_view",
      // round-9 stragglers the r9 dump omitted (ADVICE r9 #4): an
      // in-query localCheckpoint runs eagerly at CONSTRUCTION time (a
      // bounded cost, same as listed peers kcore_3/bpe_learn_merges) but
      // never blocks explain — so the exclusion criterion is strictly
      // "streaming eager drains only", now applied consistently
      "textrank_keywords", "sax_daily_symbols", "feature_scaling_robust",
      "markov_stationary_3", "coreset_kcenter",
      // round-10: BM25 lexical retrieval, Holt forecaster, A-ES weighted
      // sampling, t-digest quantile sketch
      "bm25_topk_docs", "forecast_holt_mae", "weighted_sample_aes",
      "tdigest_clusters", "lm_perplexity_score", "unigram_viterbi_segment",
      "hybrid_bm25_vec_rrf", "stratified_sample_docs", "pearson_corr_types",
      "feature_hashing_vec", "mann_whitney_u",
      // round-10 continuation: survival pair (KM + log-rank), KS test,
      // Fano dispersion, word burstiness, simplified silhouette, HITS
      "kaplan_meier_conversion", "logrank_test_conversion",
      "ks_two_sample", "dispersion_index_hourly", "word_burstiness",
      "silhouette_simplified", "hits_hubs_authorities",
      "seasonal_decompose_hourly", "js_divergence_sources",
      "cross_correlation_lags", "seq_pattern_support", "forecast_hw_mae",
      "psi_value_drift", "containment_bigram_pairs")
      // streaming_histogram_quantile / streaming_psi_drift stay out —
      // eager drains
      // streaming_interval_overlap / streaming_stratified_sample stay
      // out — eager drains
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
