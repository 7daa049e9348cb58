package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Plan-shape regression guards (VERDICT r3 #8): the bench's run-to-run
  * noise floor (~2× on this host) can hide a refactor that silently adds
  * a shuffle, so the exchange counts of the most expensive BATCH queries
  * are pinned here. A failure means the physical plan changed — either
  * revert the regression or consciously re-pin the count in this table
  * with a note in the commit message.
  *
  * Counts are (ShuffleExchange, BroadcastExchange) of the pre-AQE
  * physical plan at sf0.001 (plan shape is scale-invariant for these
  * queries; AQE only coalesces/re-plans at runtime). Streaming drains and
  * eager queries (incremental store, connected components, CSV write)
  * execute work at build time and are deliberately not listed.
  */
class PlanShapeSpec extends SparkSpec {

  private val pinned: Seq[(String, (Int, Int))] = Seq(
    // hash-agg + sort: partial/final exchange + the ORDER BY range
    "q1_pricing" -> (2, 0),
    // one agg shuffle; dims broadcast (4-deep BHJ chain), top-k is
    // TakeOrderedAndProject (no extra exchange)
    "q3_revenue_topk" -> (1, 2),
    "q5_region_revenue" -> (2, 4),
    "candles_1h" -> (2, 0),
    // round-7: reads the session-shared bruteTop5 relation (graft.Shared)
    // — the consumer plan is just the output sort over the InMemoryScan;
    // the quadratic derivation's own exchanges (repartition + window +
    // broadcast nested-loop) are paid once at materialization
    "cosine_topk_brute" -> (1, 0),
    // round-7: reads the session-shared MinHash pair relation — output
    // sort only; the single-pass LSH pipeline's exchanges are paid once
    "neardup_minhash_lsh" -> (1, 0),
    // round-7: reads the session-shared SimHash pair relation — output
    // sort only (chunk grouping + pair dedup paid once at materialization)
    "simhash_neardup_pairs" -> (1, 0),
    // round-7: reads the session-shared p4t6 scored-pair relation —
    // filter + output sort over the InMemoryScan (derivation exchanges
    // paid once, reused by knn_label_purity / cosine_score_histogram)
    "cosine_neardup_pairs" -> (1, 0),
    // Round 16: the seven flat/compression ANN families now slice
    // session-shared top-3 relations (lshTop3Shared .. matryoshkaTop3Shared
    // InMemoryScans — the refineTop3Shared discipline applied to the rest
    // of the eval matrix): topk = output sort only (1,0); recall = brute
    // join + hit agg (4,0); NDCG = DCG agg chain (5,0). Pipelines' own
    // exchanges are paid once at materialization.
    "ann_multiprobe_topk" -> (1, 0),
    // round-16 (VERDICT r15 #1): re-platformed off the fixed-lists flat
    // IVF onto the hier search at fprobes = 3, and the three consumers
    // slice the session-shared top-3 relation (hier3Top3Shared
    // InMemoryScan — output sort only; the search pipeline's exchanges
    // are paid once at materialization, the ivfpqTop3 discipline)
    "ivf_ann_topk" -> (1, 0),
    // co-partition left + right + window + ORDER BY; ZERO broadcasts —
    // the custom exec's whole point is two key-clustered exchanges
    "asof_purchase_click_native" -> (4, 0),
    "skew_salted_join_agg" -> (2, 1),
    // bounded-heap typed aggregator: partial/final + ORDER BY only
    "topk_heap_parts_by_brand" -> (2, 0),
    "sessionize_30m" -> (2, 0),
    // round 17: explode + hash-agg replaced by per-doc array HOFs (the
    // fingerprint aggregates each doc's OWN shingle set) — the agg
    // exchange is gone, only the output sort remains
    "doc_fingerprint" -> (1, 0),
    "tfidf_top_terms" -> (5, 1),
    // bucketed as-of: more exchanges by design, all on compacted or
    // bucket-keyed relations — the price of hot-key parallelism
    "asof_bucketed_global_click" -> (7, 3),
    // round-4 additions
    // bivariate stats: one partial/final agg + ORDER BY, same as q1
    "stat_regression" -> (2, 0),
    // daily agg + RANGE window (re-partitions by priority) + ORDER BY
    "window_range_7d" -> (3, 0),
    // pure map-side regex pass; the only exchange is the output sort
    "token_subword_regex" -> (1, 0),
    // map-side explode + slice; output sort only
    "chunk_documents" -> (1, 0),
    // exploded-shingle intersection counting: docfreq band-pass window
    // (feeds both self-join sides AND, since the round-9 df ceiling, the
    // doc-size branch — sizes must count only df<=C grams now that the
    // ceiling is part of the similarity contract) + self-join + pair
    // hash-agg + ORDER BY, with both size lookups broadcast. The twin
    // window subtrees are bit-identical → ReusedExchange at runtime;
    // must never degrade to a per-pair array_intersect nested loop.
    // Round 16 (8,3) → (1,0): reads the session-shared bigram candidate
    // relation (graft.Shared InMemoryScan — score filter + output sort
    // only); the band-pass window + blocked self-join machinery is paid
    // once, reused verbatim by containment_bigram_pairs
    "jaccard_bigram_pairs" -> (1, 0),
    "ann_int8_topk" -> (1, 0), // r16: shared int8 top-3, see ann_multiprobe note
    // explode + (doc,gram) agg + doc agg + ORDER BY; no joins
    "repetition_ngram_stats" -> (3, 0),
    // gram semi-join + per-doc counts + totals join + sort; small sides
    // broadcast at fixture scale
    "decontamination_overlap" -> (4, 2),
    // PQ: encode (assignment window) + recon agg + bucket join + rank
    // window + sort = 4 shuffles; the 7 broadcasts are all tiny plan-time
    // relations (subspace-index ranges, 8-row seed slices, codebook on
    // both the encode and recon sides) — never the embeddings table
    "ann_pq_topk" -> (1, 0), // r16: shared pq top-3, see ann_multiprobe note
    // round-4b additions
    // bloom prune: probe filter (scalar-subquery bloom, no exchange of its
    // own) + broadcast dim join + agg partial/final + ORDER BY
    "bloom_prune_revenue" -> (2, 1),
    // token counts agg appears twice in the plan (once for counts, once
    // under the one-row total) = 2×2 exchanges + total broadcast — but the
    // duplicated subtree is bit-identical, so ReusedExchange computes the
    // corpus scan + counts agg ONCE at runtime (verified in the executed
    // plan; the 4 is plan-shape, not work)
    "heavy_hitter_tokens" -> (4, 1),
    // distinct rewrite: (source, tok) partial + per-source final + sort
    "vocab_by_source" -> (3, 0),
    // single-pass: explode (map-side) → shingle-partition count window
    // (1) → per-doc agg (1) → sort (1); no join, no broadcast
    "boilerplate_ngram_ratio" -> (3, 0),
    // round-5 additions
    // the whole indicator family (rsi/stochastic/drawdown/obv/donchian/
    // tema) shares this shape: ONE window shuffle on event_type + the
    // output sort — lag chains and frame aggs all ride the same exchange.
    // tema is the deepest (three chained 8-tap convolutions, still one
    // shuffle); rsi adds running frame sums on the same spec
    "tema_window_8" -> (2, 0),
    "rsi_cutler_14" -> (2, 0),
    // window pass + final agg REUSES the window's hash partitioning on
    // event_type (no third exchange) + ORDER BY
    "autocorr_lag1" -> (2, 0),
    // key histogram agg partial/final; the Σcnt² roll-up collapses into
    // the single-row agg — the join itself is never executed
    "join_cardinality_estimate" -> (2, 0),
    // LATERAL decorrelates to a window over the orders side joined back
    // broadcast; + ORDER BY
    "lateral_top2_orders" -> (2, 1),
    // explode → (doc,w) agg → per-doc agg + ordered-fold → sort
    "entropy_unigram_docs" -> (3, 0),
    // (label,i) component agg + i-keyed self-join (one exchange per
    // side reused) + pair agg + sort; the 1-broadcast is the tiny
    // centroid side of the join at fixture scale
    "label_centroid_cosine" -> (4, 1),
    // PQ encode assignment window + per-subspace agg + sort; broadcasts
    // are the 32-row codebook + subspace ranges, never the vectors
    "pq_reconstruction_error" -> (3, 3),
    // two windows on one (event_type,hod) exchange + bands agg reusing
    // it + broadcast band join + final agg... net: window shuffle +
    // output sort, bands broadcast
    "hourly_percentile_bands" -> (2, 1),
    // sessionize window (user_id) + distinct agg + self-join (broadcast
    // at fixture scale) + pair agg + sort
    "session_pair_counts" -> (4, 1),
    // bucketed co-located SMJ: BOTH exchanges are above the join (agg +
    // ORDER BY); the join itself reads Bucketed: true scans with zero
    // exchange — the graded twin of BucketingSpec's plan assert
    "bucketed_join_priority_revenue" -> (2, 0),
    // daily sketch agg + window merge + exact side (distinct + grid
    // range-join + agg) + final join/sort; the raw table is scanned for
    // sketches ONCE — every window is sketch-merge arithmetic
    "hll_sliding_distinct" -> (7, 2),
    // int8 recall: bucketed int8 pipeline + intersect; the brute truth
    // arrives from the session-shared relation (round-7), dropping the
    // sampled cross-join's repartition + broadcast from this plan
    "ann_recall_int8" -> (4, 0), // r16: shared int8 top-3
    // recursive CTE: the returns relation is localCheckpointed BEFORE the
    // recursion (UnionLoop re-executes its step subtree every iteration —
    // without the checkpoint the weekly agg re-ran per step, measured
    // 8.2 s at the old daily grain), and the whole recursion materializes
    // inside the builder under 4 shuffle partitions — the returned plan
    // is just the output ORDER BY over the checkpointed RDD; re-pin
    // consciously if either materialization moves
    "compound_index_weekly" -> (1, 0),
    // round-7b: sliding KMV merge — (day,hv) distinct + per-day rank
    // window + grid distinct + explode/equi-join + post-join (end,hv)
    // distinct partial/final + per-end window + output sort; the one
    // broadcast is the tiny day grid
    "kmv_sliding_distinct_7d" -> (7, 1),
    // round-8 additions (pagerank_* and cms_heavy_hitters localCheckpoint
    // eagerly and are deliberately not listed, per the header note)
    // matryoshka: prefix-bucket join + bounded-heap shortlist agg
    // (partial/final) + rerank window over ≤ shortlist rows/qid.
    // Re-pinned round-12 (2,1)→(2,3): the heap re-platform (the r11
    // 100× 75× super-linear window fix) fetches full vectors for the
    // shortlist survivors via two vec_id equi-joins — +2 broadcasts of
    // the embeddings table at this SF (plain shuffle joins at scale),
    // in exchange for candidate volume never hitting a sort
    "matryoshka_topk" -> (1, 0), // r16: shared matryoshka top-3
    // deletion-neighborhood equi-join + pair distinct + sort; both
    // variant sides derive from one token-counts agg
    "editdist1_pairs" -> (3, 1),
    // one (event_type, day) window + hash agg + sort — the vwap shape
    "twap_daily" -> (2, 0),
    // per-user collect_list agg + sort; map-side regex measures
    "event_seq_regex" -> (2, 0),
    "event_seq_error_runs" -> (2, 0),
    // cents projection + broadcast (min,max) row + bin agg + sort
    "profile_histogram" -> (3, 1),
    // 8 unioned single-column aggs, each with its distinct rewrite
    "profile_columns" -> (16, 0),
    // null-safe equality still plans as an EQUI hash join (the point);
    // two pre-agg sides + small side broadcast + sort
    "join_null_safe_props" -> (3, 1),
    // three unioned two-level key-count aggs
    "data_skew_report" -> (6, 0),
    // round-9 additions (graph iteratives, recursive CTE, substring
    // dedup and the persisted ANN index localCheckpoint / write eagerly
    // and are deliberately not listed, per the header note)
    // two-level prefix sum: per-block window + block-totals agg + the
    // tiny level-2 running-offset window + output sort; the block
    // offsets come back BROADCAST — the whole point of the shape (a
    // SortMergeJoin here would mean the prefix sum re-serialized)
    "seq_packing" -> (4, 1),
    // single codegen scan + agg partial/final + sort; the interleave
    // must stay a straight-line projection (no extra exchange, no HOF)
    "zorder_layout" -> (2, 0),
    // per-group stats agg + BROADCAST join-back + bin agg + sort —
    // binning stays map-side over one fact scan
    "profile_histogram_by_group" -> (3, 1),
    // per-user collect_list agg + sort, same as the other CEP queries
    "event_seq_quantified" -> (2, 0),
    // round-9 continuation (kcore/bpe/markov/conformal/robust-scaler
    // localCheckpoint eagerly and are deliberately not listed)
    // Round 16 (7,3) → (4,2): the counted pair relation comes from the
    // session-shared copurchasePairs memo (localCheckpoint scan) — the
    // basket self-join + pair agg are paid once per session; the graded
    // tail keeps the per-part count agg + two broadcast count joins +
    // top-k sort
    "copurchase_cosine" -> (4, 2),
    // the linear skyline: ONE global-sort exchange, zero joins — the
    // entire point vs the quadratic NOT-EXISTS form; must never grow one
    "pareto_frontier_docs" -> (1, 0),
    // explode → per-doc bigram window (doc_id exchange) → corpus agg +
    // bigram-keyed join-back + per-doc agg + sort; corpus counts
    // broadcast at fixture scale
    "doc_novelty_bigram" -> (4, 1),
    // explode → doc window + (w, nxt) agg + per-w rank window + sort
    "bigram_next_word" -> (4, 0),
    // first-week agg + (user,wk) distinct + user join + (cohort,offset)
    // distinct-count expansion + broadcast sizes + sort
    "cohort_retention_weekly" -> (7, 2),
    // per-user conv agg + per-arm agg + sort; Wilson math is pure
    // projection — no exchange may ever come from it
    "ab_conversion_wilson" -> (3, 0),
    // ONE user-partitioned µs-RANGE window + output sort — the
    // no-range-join contract; a purchases⋈touches join would add joins
    "attribution_linear" -> (2, 0),
    // version+query union rides ONE user exchange for both window passes
    // (lag-dedup and carry-forward) + output sort — the no-range-join
    // contract, same as attribution
    "pit_feature_join" -> (3, 0),
    // daily agg + ntile/word windows on the type key + motif agg/rank
    // riding the same exchange + sort
    "sax_daily_symbols" -> (3, 0),
    // explode → (label,half,dim) agg → reshape/label aggs + sort; the
    // centroid relation is output-sized so no broadcast is needed
    "embedding_drift_halves" -> (4, 0),
    // round-10 (viterbi localCheckpoints eagerly and is not listed):
    // token agg chain (dl / corpus / tf / df) + doc-length shuffle join
    // (dl is NOT broadcastable at scale) + score agg + top-k; df and the
    // one-row corpus broadcast, plus AQE's pre-planned option
    "bm25_topk_docs" -> (7, 3),
    // daily agg + per-type series agg + final agg; the Viterbi-style
    // fold is pure projection — no exchange may ever come from it
    "forecast_holt_mae" -> (3, 0),
    // bigram count aggs (c2/c1/vocab) + the (w1,w2) count join-back
    // (deliberately NOT hint-broadcast — AQE chooses at fixture scale)
    // + per-doc agg + sort
    "lm_perplexity_score" -> (7, 3),
    // ONE type exchange shared by the rank window and the cluster agg +
    // output sort; the asin/floor clustering is pure projection
    "tdigest_clusters" -> (2, 0),
    // map + TakeOrderedAndProject: ZERO exchanges — the whole point;
    // the rank window runs on the ≤20-row post-limit relation
    "weighted_sample_aes" -> (0, 0),
    // the bm25 arm's agg chain + doc-length join + per-arm top-k; the
    // 4th broadcast is the one-row anchor embedding; the arm fuse is a
    // full-outer over two ≤50-row relations (rides the arm exchanges)
    "hybrid_bm25_vec_rrf" -> (7, 4),
    // ONE stratum exchange for the rank window + output sort
    "stratified_sample_docs" -> (2, 0),
    // daily agg + day-keyed self-join (broadcast at fixture scale) +
    // pair agg + sort; the r computation is pure projection
    "pearson_corr_types" -> (4, 1),
    // (doc,bucket) agg + per-doc window/agg riding one doc exchange + sort
    "feature_hashing_vec" -> (3, 0),
    // distinct-cents aggs + two pair equi-joins (broadcast 10-row pair
    // relation would be free, but the type-distinct derivation shuffles)
    // + pair-keyed window + final agg + sort
    "mann_whitney_u" -> (7, 4),
    // two per-user aggs (one exchange each) + broadcast left join +
    // risk-table agg + ONE bounded-domain window exchange carrying all
    // three windows (n_total full-frame, dropped, cumulative ln-surv);
    // no scalar-anchor crossJoin — n_total derives from the rows at hand
    "kaplan_meier_conversion" -> (4, 1),
    // same spine as kaplan_meier (two per-user aggs + broadcast left
    // join + risk-table agg + one bounded-domain window exchange); the
    // single-row chi-square agg collapses into the window's partition
    "logrank_test_conversion" -> (4, 1),
    // one distinct-cents agg exchange + the bounded-domain window's
    // single-partition exchange carrying all five frames
    "ks_two_sample" -> (2, 0),
    // hour/type distincts + (type,h) counts agg + final agg + sort;
    // both spine-join probe sides broadcast (calendar-bounded)
    "dispersion_index_hourly" -> (5, 2),
    // (word, doc) agg + word agg + sort — two linear shuffles
    "word_burstiness" -> (3, 0),
    // round-13 hierarchical candidate stage (coarse heap agg + unhinted
    // f2g join + top-2 heap agg replacing the flat broadcast-assignment
    // window and the top1/top2 self-join) + cluster agg + sort; the
    // shared Lloyd build reads the InMemoryScan
    "silhouette_simplified" -> (3, 3),
    // hour agg + lo/hi single-row agg + calendar-bounded window + sort;
    // hour counts, the spine anchor, and the 24-row seasonal table all
    // broadcast
    "seasonal_decompose_hourly" -> (4, 3),
    // the KL agg spine + the broadcast sources×vocab base join + the
    // ordered-fold agg + sort
    "js_divergence_sources" -> (7, 3),
    // (type,h) agg + lag'd equi-join (spine/lag/series sides broadcast,
    // calendar-bounded) + per-lag agg + sort — never a theta join
    "cross_correlation_lags" -> (4, 4),
    // one per-(user,type) agg + user-keyed self-join (planner picks
    // broadcast at fixture scale; co-partitioned SMJ at scale) + pair
    // agg + sort
    "seq_pattern_support" -> (4, 1),
    // (type,h) agg + per-type series agg + sort; spine anchor + counts
    // broadcast — the whole HW recurrence is a codegen fold, zero
    // exchanges of its own
    "forecast_hw_mae" -> (3, 2),
    // baseline ntile window + edge aggs + two binning aggs + sort; the
    // 9-edge list and per-type totals broadcast — binning is an array
    // filter, never a range join
    "psi_value_drift" -> (7, 3),
    // Round 16 (8,3) → (1,0): identical machinery to
    // jaccard_bigram_pairs — now literally the same session-shared
    // candidate relation; only the score/threshold differ
    "containment_bigram_pairs" -> (1, 0),
    // round-11 multimodal: the 32-term phash is MAP-ONLY (1 = output
    // sort); the Hamming banding is chunk-group + pair-distinct + sort,
    // never a cartesian; frame dedup is one digest agg (partial/final)
    // + sort; the funnel is two broadcast joins into one global agg
    "mm_phash_fingerprint" -> (1, 0),
    // Round 16 (3,0) → (1,0): reads the session-shared phash32 pair
    // relation (graft.Shared InMemoryScan — output sort only; the
    // fingerprint pass + chunk-bucket join are paid once, reused by
    // mm_phash_dup_groups), the neardup_minhash_lsh pin pattern
    "mm_phash_neardup_pairs" -> (1, 0),
    "mm_frame_dup_stats" -> (3, 0),
    "mm_crossmodal_funnel" -> (1, 2),
    // round-11 depth: dup-groups explains the final cluster agg (CC
    // rounds + pair derivation paid at construction, the
    // neardup_dup_groups shape); kappa/acf explain the post-checkpoint
    // tail over ≤ 25-row / 6-row local relations — their pipelines run
    // ONCE at construction (the kcore localCheckpoint discipline)
    "mm_phash_dup_groups" -> (2, 0),
    "cohens_kappa_langid" -> (4, 1),
    "acf_pacf_hourly" -> (7, 1),
    // round-11: rank windows (2 thin per-type) + day-keyed pair join + agg
    "spearman_corr_types" -> (5, 1),
    // round-11: day agg + series equi-join + day-pair join + pair agg
    "kendall_tau_types" -> (7, 2),
    // round-11: bigram explode → count chain; model join back on (w1,w2)
    "kn_perplexity_score" -> (9, 4),
    // round-11: jaccard blocked machinery on unigrams + idf broadcast;
    // same 4-consumer replay as its jaccard_bigram_pairs sibling
    "weighted_jaccard_pairs" -> (12, 7),
    // round-11: post-checkpoint tail (edge build + z-relation each
    // localCheckpointed — pair self-join + anti-join + top-k only)
    "adamic_adar_links" -> (4, 0),
    // round-11: MG summary agg (partial/final) + candidate broadcast +
    // recount agg + scalar total broadcast + output sort
    "heavy_hitters_mg_verified" -> (4, 2),
    // round-11: shared brute InMemoryScan (×2) + LSH bucket join + DCG agg
    "ann_ndcg_lsh" -> (5, 0), // r16: shared lsh top-3
    // round-11: post-checkpoint tails (support-≥2 edge build
    // localCheckpointed once — degree agg, orientation, triangle join /
    // symmetrized stat agg only)
    "local_clustering_coeff" -> (7, 0),
    "degree_assortativity" -> (1, 0),
    // round-11: token agg + count-class agg (+1-offset self-join rides
    // the same r-key exchange) + output sort
    "good_turing_counts" -> (5, 1),
    // round-12: the ann_ndcg_lsh contract over the other three index
    // families (shared brute InMemoryScan + per-index pipeline + DCG agg)
    "ann_ndcg_ivf" -> (5, 0), // r16: shared hier3 top-3 relation, see ivf_ann_topk
    "ann_ndcg_binary" -> (5, 0), // r16: shared binary top-3
    "ann_ndcg_pq" -> (5, 0), // r16: shared pq top-3
    // round-12: good_turing_counts' N_r pipeline + one global OLS fold
    // broadcast back over the table
    "good_turing_sgt" -> (6, 1),
    // round-12: two-level IVF search — post-checkpoint tail (coarse/f2g
    // are localCheckpointed bounded artifacts; the counts cover neighbor
    // hier-assign + query coarse/fine heap aggs + cell join + rank).
    // Round 13 (+1 shuffle, -1 broadcast per pinned pair): the f2g joins
    // lost their broadcast hint, so the INITIAL plan is a gid-keyed
    // shuffle join (AQE converts it back to broadcast at runtime while
    // f2g is small — removing the k ∝ n broadcast ceiling, not the
    // broadcast itself at fixture scale)
    // Round 15 (7,7) → (6,1): the neighbor assignment and the query
    // coarse/fine routing now come from ONE hierRouting pass whose
    // result is localCheckpointed (VecOps.hierRouting), so the coarse
    // crossJoin broadcasts and the routing heap exchanges moved behind
    // the checkpoint — the graded tail keeps the cells equi-join, the
    // qid joins and the final heap agg only
    // Round 16 (6,1) → (1,0): the three hier consumers slice the
    // session-shared top-3 relation (hierTop3Shared) — output sort over
    // the InMemoryScan; the routing + candidate join exchanges are paid
    // once at materialization
    "ivf_hier_topk" -> (1, 0),
    // round-14 (VERDICT r13 #1): re-platformed from the flat
    // crossJoin(broadcast(k ∝ n)) + n·k rank window onto the hier
    // machinery at probes = 3 — same shape class as ivf_hier_topk; the
    // flat form survives only as a ScaleDemo contrast row
    "ivf_lloyd2_topk" -> (6, 1),
    // round-12: recall-ladder completions (shared brute InMemoryScan +
    // the sibling index pipelines + hit-count agg)
    "ann_recall_multiprobe" -> (4, 0), // r16: shared multiprobe top-3
    "ann_recall_opq" -> (4, 0), // r16: shared opq top-3
    // round-12: hier-family accuracy contract (lloyd2+hier pipelines +
    // brute InMemoryScan + hit agg) and the multiprobe NDCG
    "ann_recall_hier" -> (4, 0), // r16: shared hier top-3 relation, see ivf_hier_topk
    "ann_ndcg_multiprobe" -> (5, 0), // r16: shared multiprobe top-3
    // round-12: the eval-matrix completion (NDCG for the remaining rungs)
    "ann_ndcg_int8" -> (5, 0), // r16: shared int8 top-3
    "ann_ndcg_opq" -> (5, 0), // r16: shared opq top-3
    "ann_ndcg_matryoshka" -> (5, 0), // r16: shared matryoshka top-3
    "ann_ndcg_hier" -> (5, 0), // r16: shared hier top-3 relation, see ivf_hier_topk
    // round-13: SGT unigram perplexity (token agg + count-class agg +
    // OLS fold + w-keyed count join-back + r join + doc agg + sort)
    "sgt_perplexity_score" -> (9, 4),
    // round-13 curation shelf + residual rung.
    // gopher_quality: pure map-side gate — the only exchange is the
    // output sort (the shape the scaladoc promises)
    "gopher_quality_filter" -> (1, 0),
    // Round 16 (7,3) → (1,0): reads the session-shared repetition-signal
    // relation (graft.Shared InMemoryScan — output sort only); the per-n
    // (doc,gram) agg + doc-keyed top window machinery is paid once,
    // reused by the funnel
    "gopher_repetition_filter" -> (1, 0),
    // dsir: token bucket agg ×2 (target/raw) + two one-row totals +
    // the 64-row lr join (SMJ in the static plan; AQE broadcasts at
    // runtime) + per-doc agg + sort
    "dsir_importance_weights" -> (8, 4),
    // ccnet: per-lang bigram counts + c1 agg + vocab agg (broadcast) +
    // the vocabulary-sized nll join (shuffle by design — the
    // lm_perplexity_score 100 TB argument) + per-doc agg + lang-
    // partitioned rank window + bucket agg + sort
    "ccnet_perplexity_buckets" -> (8, 3),
    // ivfpq family: all three consumers read the session-shared top-3
    // relation (ivfpqTop3Shared InMemoryScan — output sort / hit + idcg
    // aggs only); the index pipeline's own exchanges (coarse assignment
    // window + code window + recon agg + cell join + rank window, with
    // every broadcast a bounded plan-time relation) are paid ONCE at
    // materialization, the bruteTop5Shared discipline
    "ann_ivfpq_topk" -> (1, 0),
    "ann_recall_ivfpq" -> (4, 0),
    "ann_ndcg_ivfpq" -> (5, 0),
    // Round 16 (19,11) → (7,5): both signal branches read the
    // session-shared relations (graft.Shared InMemoryScans) instead of
    // replaying the full quality + repetition machinery per stage — the
    // graded tail keeps the semi-joins, the four single-row count aggs
    // and their 1-row cross-join sides
    "gopher_filter_funnel" -> (7, 5),
    // reads the session-shared directed p4t6 pair relation (InMemoryScan)
    // + rank window + sort; both label lookups broadcast
    "hard_negative_mining" -> (2, 2),
    // encode stage (coarse-assignment exchanges land before the residual
    // localCheckpoint; the plan sees the checkpoint scan) + code window +
    // error agg + sort; broadcasts = coarse table, codebook sides, rseed
    // anti-join — all bounded
    "ivfpq_reconstruction_error" -> (3, 4),
    // the lm_perplexity bigram spine (c2/c1 aggs + vocab broadcast +
    // vocabulary-sized nll shuffle join + per-doc agg) + quality join +
    // TWO lang-partitioned doubled-midrank windows + per-lang agg + sort
    "quality_nll_agreement" -> (8, 4),
    // refine family re-pinned round 14 (ADVICE r13): all three consumers
    // read the session-shared refineTop3Shared relation (InMemoryScan —
    // output sort / hit + idcg aggs only); the int8 bucket join +
    // shortlist + full-precision re-rank exchanges are paid once at
    // materialization, exactly the ivfpq family's pin pattern.
    // Previous (derive-per-consumer) pins, for the record:
    // refine: int8 bucket join + shortlist window riding one exchange +
    // final rank window + sort; both full-precision refine lookups
    // broadcast at fixture scale (id-keyed equi-joins at scale)
    "ann_refine_topk" -> (1, 0),
    "ann_recall_refine" -> (4, 0),
    "ann_ndcg_refine" -> (5, 0),
    // hier IVF-PQ family: all three consumers read the session-shared
    // top-3 relation (ivfpqHierTop3Shared InMemoryScan — output sort /
    // hit + idcg aggs only); the index pipeline's own exchanges (hier
    // assignment heap aggs, residual code window, recon agg, query
    // coarse/fine heap routing, unhinted f2g/ce joins) are paid ONCE at
    // materialization, the shared-relation discipline
    "ann_ivfpq_hier_topk" -> (1, 0),
    "ann_recall_ivfpq_hier" -> (4, 0),
    "ann_ndcg_ivfpq_hier" -> (5, 0),
    // round-14: hier-refine family — all three consumers read the
    // session-shared hierRefineTop3Shared relation (the ivfpq/refine
    // pin pattern)
    "ivf_hier_refine_topk" -> (1, 0),
    "ann_recall_hier_refine" -> (4, 0),
    "ann_ndcg_hier_refine" -> (5, 0))
    // hits_hubs_authorities stays out of the pin table: in-query
    // localCheckpoints make its explain show only the tail plan

  test("join_null_safe_props: <=> is a hash join, never a nested loop") {
    val df = SparkEntry.queries("join_null_safe_props")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "null-safe equality degraded to a non-equi join")
  }

  private def shape(name: String): (Int, Int) = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    val plan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (plan.collect { case e: ShuffleExchangeExec => e }.size,
      plan.collect { case e: BroadcastExchangeExec => e }.size)
  }

  for ((name, want) <- pinned)
    test(s"plan shape pinned: $name $want") {
      val got = shape(name)
      assert(got == want,
        s"$name exchange counts moved: got $got, pinned $want — " +
          "diff the .explain against the pinned note")
    }

  // Round 14 (VERDICT r13 #1 + #2): the hierarchical IVF family must
  // never carry a window operator at all — coarse/fine routing is
  // bounded-heap aggregation, assignment is max_by, and the final top-k
  // cut is topKHeap (partial-aggregated, never a per-qid sort over the
  // candidate volume). A WindowExec reappearing here means either the
  // flat n·k centroid ranking or the n·E[cell] rank-window rescore
  // snuck back in a refactor — both are the retired 100×/1000×
  // scale-killers BASELINE.md prices.
  for (name <- Seq("ivf_lloyd2_topk", "ivf_hier_topk"))
    test(s"$name: window-free plan (heap routing + heap final cut)") {
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      val plan: SparkPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty,
        s"$name grew a window operator — the flat ranking or the " +
          s"rank-window rescore is back:\n$plan")
    }

  // The sliding-KMV merge expands sketch days to window ends with
  // explode(sequence) + an equi-join to the day grid — the shape that
  // scales. The naive formulation (d BETWEEN de-6 AND de) planifies as a
  // broadcast nested-loop range join, which is quadratic in grid size;
  // this tripwire keeps it from sneaking back in a refactor.
  test("kmv_sliding_distinct_7d: sketch merge is equi-join, never BNL") {
    val df = SparkEntry.queries("kmv_sliding_distinct_7d")(spark, sf("sf0.001"))
    val plan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bnl = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.isEmpty,
      s"sliding-KMV window merge degraded to a nested-loop range join:\n$plan")
  }
}
