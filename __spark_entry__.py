"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the corpus-curation pipeline:
lang-ID → quality → exact-dedup canonical election → split assignment)
at sf0.001.

``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``.

``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely approximate / non-SQL ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pgsink_spark.operators import corpus as _corpus  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import curation as _curation  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import dedup as _dedup
from pgsink_spark.operators import evaluation as _evaluation  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import export as _export  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import formats as _formats  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import graph as _graph  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import ivm as _ivm  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import multimodal as _mm
from pgsink_spark.operators import packing as _packing  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import privacy as _privacy  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import relational as _rel
from pgsink_spark.operators import retrieval as _retrieval  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import sampling as _sampling  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import similarity as _sim
from pgsink_spark.operators import skew as _skew  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import streaming_q as _streaming_q  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import tpch as _tpch  # noqa: F401 — registers into _rel.QUERIES
from pgsink_spark.operators import text as _text

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver checks exactly the first 50 registry entries per round
# (CORRECTNESS_r01..r05: 50 rows each, cut in registration order).
# Registry order therefore rotates per round so the union of rounds
# covers every query. Round 6 burns down the never-driver-checked
# backlog (58 queries after the round-5 registry growth; the r5
# verdict's top action): 50 of them fill the window, preferring the
# oldest additions (a19/a20 SCD2, src_* roundtrips, cdc/ivm, d65–d68)
# and the ENTIRE stream_* wave (verdict item 4 — a driver hash on each
# pins emit-on-close / watermark-eviction semantics). The 8 deferred
# (the newest wave-5d statistical singles: d83/d84/d86/d87/d88/d89,
# mdm_survivorship, corpus_temperature_sample) plus the 40 r1/r2-stale
# green rows head _ROUND7_PRIORITY next round. See VERIFICATION.md
# for the rotation ledger.
# Round 7 burns the never-driver-checked backlog to ZERO (r6 verdict
# item 2): all 15 queries without a driver row in r1–r6 (the 8 deferred
# wave-5d singles + the 7 round-6 additions) head the window, followed
# by the stalest green rows — all 12 r1-vintage rows (d22,d24–d34) and
# 23 of the 28 r2-vintage rows (the 18 TPC-H queries + the 5 flagship
# dedup/similarity ops). The 5 deferred r2 rows (ann_bruteforce_topk,
# dedup_cluster, dedup_embedding_pairs, dedup_simhash_pairs,
# text_fingerprint) + the r3-vintage block head _ROUND8_PRIORITY.
# Rotation ledger: VERIFICATION.md.
# Round 8 drains the 63-query never-driver-checked backlog created by
# the round-7 registrations (r7 verdict item 1): the window is exactly
# 50 of the 63, hardest-to-trust first — the cross-engine-arithmetic
# and multi-stage kernels (graph_*, d98/d99, eval_*, borda fusion, the
# LSH/IVF curves, streaming windows, CDC snapshot, source-format edge
# cases, the retrieval five, multimodal resamplers) before the simple
# census aggs. The 13 deferred single-pass census rows + the 5 r2 +
# 45 r3-vintage stale rows head _ROUND9_PRIORITY. Registry growth is
# frozen this round (≤10 new registrations, §2 gaps only) so the
# queue arithmetic converges — see VERIFICATION.md rotation ledger.
# Round 9 drains the driver-evidence queue to ZERO never-checked (r8
# verdict item 1): the window is exactly the 14 rows with no driver
# row in r1–r8 (the round-7/8 census additions + graph_hub_cap_audit,
# all mirror-green at sf0.01), then the 5 r2-vintage rows deferred
# since round 7 (ann_bruteforce_topk, dedup_cluster,
# dedup_embedding_pairs, dedup_simhash_pairs, text_fingerprint), then
# the oldest 31 of the 45 registered r3-vintage rows in their original
# round-3 window order. The remaining 14 r3 rows head
# _ROUND10_PRIORITY, which restores "no green row older than two
# rounds" registry-wide. Growth freeze continues (≤5 new
# registrations). Rotation ledger: VERIFICATION.md.
# Round 10 drains the evidence queue to ZERO (r9 verdict items 2+5):
# the window is the 2 never-driver-checked round-9 audit registrations
# (dedup_cluster_cap_audit, dedup_embedding_collapse_audit — the
# falsifiability instruments for the cap/collapse fixes, called out in
# verdict item 5), then the 14 remaining r3-vintage rows in their
# original round-3 window order, then the oldest 34 of the 50
# r4-vintage rows in their round-4 window order. After this round no
# green row is older than two rounds registry-wide for the r3 block,
# and the steady-state rotation (stalest-50 each round) keeps it that
# way. The 16 youngest r4 rows + d3_outer_join_agg head
# _ROUND11_PRIORITY (d3 gave its r10 slot to the round's one new
# registration, dedup_embedding_dup_branch — the driver-gate pin for
# the adaptive collapse's plan-level branch, which the dedup-clean
# fixture never exercises; windowing it keeps never-checked at ZERO).
# Growth freeze holds (1 of ≤5 new registrations this round).
# Rotation ledger: VERIFICATION.md.
# Round 11 keeps the steady-state stalest-50 rotation (optimization
# round — zero new registrations, growth freeze holds): the window is
# exactly the 50 stalest green rows by (round, window-position) over
# CORRECTNESS_r01..r10 — the 17 r4-vintage rows whose last driver
# green is round 4 (d3_outer_join_agg, which gave its r10 slot to
# dedup_embedding_dup_branch, plus d4_range_join … d19_udf_parity, as
# the r10 ledger promised), then the oldest 33 r5-vintage rows in
# their round-5 window order (a5b_keyset_composite … b8_array_agg).
# After this round no green row is older than round 5. Rotation
# ledger: VERIFICATION.md.
_ROUND11_PRIORITY = [
    # ---- r4-vintage stale rows, round-4 window order (17) ----
    "d3_outer_join_agg",
    "d4_range_join",
    "d5_tpch_q1",
    "d6_count_distinct",
    "d7_rollup",
    "d8_rank_topk",
    "d9_lag_lead",
    "d10_running_sum",
    "d11_topk_order",
    "d12_intersect",
    "d13_string_fns",
    "d14_date_trunc",
    "d15_array_fns",
    "d16_json_fns",
    "d17_tumbling_window",
    "d18_distinct_dedup",
    "d19_udf_parity",
    # ---- oldest 33 r5-vintage stale rows, round-5 window order ----
    "a5b_keyset_composite",
    "dedup_duplicate_spans",
    "mm_phash_neardup",
    "text_pmi_pairs",
    "graph_pagerank",
    "graph_triangles",
    "dedup_incremental_probe",
    "mine_hard_negatives",
    "graph_linkpred",
    "text_bpe_pairs",
    "d69_rolling_zscore",
    "privacy_k_anonymity",
    "corpus_mixture_reweight",
    "ann_pq_recall",
    "d70_ohlc_resample",
    "d71_attribution",
    "d72_mad_outliers",
    "stream_attribution",
    "stream_rolling_zscore",
    "eval_langid_metrics",
    "eval_score_auc",
    "eval_calibration",
    "text_bigram_perplexity",
    "text_subword_encode",
    "export_webdataset",
    "privacy_dp_counts",
    "d74_cusum_changepoints",
    "text_keyword_chi2",
    "stream_cusum",
    "mm_phash_clusters",
    "d21_text_group",
    "d23_session_gap",
    "b8_array_agg",
]

_ROUND10_PRIORITY = [
    # ---- never driver-checked: the round-9 audits (2) ----
    "dedup_cluster_cap_audit",
    "dedup_embedding_collapse_audit",
    # ---- r3-vintage stale rows, round-3 window order (14) ----
    "d55_lateral_topn",
    "d56_time_range_frame",
    "d57_table_diff",
    "d58_histogram",
    "quality_gopher_rules",
    "bm25_search",
    "tfidf_top_terms",
    "dedup_dupfrac_ngram",
    "d59_grouped_percentiles",
    "d60_grouped_moments",
    "stream_interval_join",
    "d61_distribution_windows",
    "d62_regression_agg",
    "semdedup_cluster_prune",
    # ---- oldest 34 r4-vintage stale rows, round-4 window order ----
    "cdc_refresh_endstate",
    "d63_interpolate_linear",
    "dedup_fuzzy_blocked",
    "mm_frame_stats",
    "mm_frame_sample",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "ann_kmeans_recall",
    "mm_embedding_recall",
    "d35_approx_distinct",
    "retrieval_rrf",
    "dsir_importance",
    "text_kn_bigram",
    "d64_gaps_islands",
    "mm_keyframes",
    "pipeline_curate_pack",
    "a5_keyset_scan",
    "a16_compaction_view",
    "a3_total_order",
    "a17_claim_predicate",
    "b5_anti_join_diff",
    "b1_filter_limit",
    "b2_inner_join",
    "b3_left_join_inlist",
    "b4_latest_per_key",
    "b6_semi_join",
    "b7_include_exclude",
    "b11_scalar_fns",
    "b12_arith_update",
    "b13_count",
    "d1_filter_pushdown",
    "d2_join_agg_topk",
    "d2b_broadcast_join",
    # ---- round-10 registration: plan-level collapse branch pin ----
    "dedup_embedding_dup_branch",
]

_ROUND9_PRIORITY = [
    # ---- never driver-checked (14) ----
    "corpus_dup_rate_by_source",
    "corpus_length_gini",
    "corpus_simpson_diversity",
    "corpus_source_purity",
    "corpus_term_burstiness",
    "d91_session_bounce",
    "d92_rfm_segments",
    "d100_interarrival_histogram",
    "graph_hub_cap_audit",
    "sample_reservoir_hash",
    "src_parquet_partition_prune",
    "text_feature_hashing",
    "text_hapax_ratio",
    "text_stopword_profile",
    # ---- r2-vintage (5, deferred since round 7) ----
    "ann_bruteforce_topk",
    "dedup_cluster",
    "dedup_embedding_pairs",
    "dedup_simhash_pairs",
    "text_fingerprint",
    # ---- oldest 31 r3-vintage stale rows (round-3 window order) ----
    "tpch_q12_priority_lateness",
    "mm_decode_stats",
    "mm_audio_stats",
    "mm_audio_windows",
    "ivm_join_view",
    "ivm_agg_view",
    "ivm_minmax_view",
    "stream_sessionize",
    "stream_ewma_anomalies",
    "pack_sequences",
    "pack_sequences_greedy",
    "chunk_documents",
    "dedup_paragraph",
    "text_ngram_topk",
    "domain_mix_sample",
    "quality_lm_score",
    "quality_model_score",
    "contamination_check",
    "pii_redact",
    "sample_weighted",
    "a18_view_asof",
    "d45_resample_locf",
    "d46_unpivot",
    "d47_distribution_windows",
    "d48_profile_documents",
    "d49_funnel",
    "d50_cohort_retention",
    "d51_transition_matrix",
    "d52_share_of_total",
    "d53_month_over_month",
    "d54_recursive_series",
]

_ROUND8_PRIORITY = [
    # ---- never driver-checked: verdict-named hard kernels ----
    "graph_assortativity",
    "d99_winsorized_stats",
    "d98_window_funnel",
    "eval_cohens_kappa",
    "quality_borda_fusion",
    "dedup_lsh_band_curve",
    "ann_ivf_probe_curve",
    "ann_range_search",
    "stream_hopping_window",
    "stream_complete_totals",
    "cdc_cross_table_snapshot",
    "src_parquet_schema_merge",
    "src_csv_malformed_quarantine",
    "retrieval_phrase_search",
    "retrieval_boolean_query",
    "retrieval_fuzzy_match",
    "retrieval_snippet_extract",
    "retrieval_term_proximity",
    "graph_bfs_distance",
    "graph_modularity",
    "graph_jaccard_edges",
    "graph_transitivity",
    "graph_local_bridges",
    "mm_image_resize",
    "mm_audio_resample",
    # ---- never driver-checked: multi-stage / cross-engine rest ----
    "d93_funnel_conversion_lag",
    "d94_join_skew_audit",
    "d95_market_basket",
    "d96_sequence_pairs",
    "d97_seasonal_decompose",
    "d101_survival_curve",
    "d102_rolling_slope",
    "d103_bag_set_ops",
    "d104_sql_api_views",
    "cdc_slot_gap_audit",
    "corpus_token_coverage",
    "text_oov_rate",
    "corpus_ngram_novelty",
    "eval_confusion_matrix",
    "eval_mcnemar",
    "eval_bootstrap_replicates",
    "export_manifest_checksums",
    "export_curriculum_order",
    "ivm_topk_view",
    "privacy_pseudonymize_ri",
    "privacy_risk_histogram",
    "sample_stratified_quota",
    "sample_kish_neff",
    "curation_filter_impact",
    "pipeline_stage_metrics",
]

_ROUND7_PRIORITY = [
    # ---- never driver-checked: wave-5d statistical singles ----
    "d83_seq_match",
    "d84_kmv_setops",
    "d86_holt_forecast",
    "d87_rolling_distinct",
    "d88_kmv_reach",
    "d89_trend_robust",
    "mdm_survivorship",
    "corpus_temperature_sample",
    # ---- never driver-checked: round-6 additions ----
    "d90_skyline_pareto",
    "dedup_blocking_audit",
    "graph_label_propagation",
    "retrieval_mrr",
    "decontaminate_ngram_overlap",
    "corpus_source_overlap",
    "src_xml_roundtrip",
    # ---- r1-vintage green rows (latest driver check = round 1) ----
    "d22_asof_join",
    "d24_percentiles",
    "d25_set_ops",
    "d26_cube",
    "d27_date_arithmetic",
    "d28_grouping_sets",
    "d29_window_frames",
    "d30_tpch_q3",
    "d31_tpch_q5",
    "d32_pivot",
    "d33_string_agg",
    "d34_exists_combo",
    # ---- r2-vintage: the TPC-H module (18 rows; q12 is r3) ----
    "tpch_q02_min_cost_supplier",
    "tpch_q04_order_priority",
    "tpch_q06_forecast_revenue",
    "tpch_q07_volume_shipping",
    "tpch_q08_market_share",
    "tpch_q09_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_relationship",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    # ---- r2-vintage: flagship dedup/similarity (5 of 10; rest → r8) ----
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "d20_similarity_topk",
]

_ROUND6_PRIORITY = [
    # ---- never driver-checked, oldest first ----
    # SCD2 / CDC / IVM plane (wave 5b)
    "a19_scd2_history",
    "a20_scd2_pointintime",
    "cdc_time_travel",
    "ivm_distinct_view",
    # source-format roundtrips (wave 5b)
    "src_csv_roundtrip",
    "src_ndjson_roundtrip",
    "src_json_schema_drift",
    "src_orc_roundtrip",
    # relational wave 5b/5c
    "d65_cube",
    "d66_ntile",
    "d67_approx_quantile_bound",
    "d68_freq_items_guarantee",
    "d75_weighted_median",
    "d76_benford_audit",
    "d77_mode_per_group",
    "d78_psi_drift",
    "d79_ks_drift",
    "d80_asof_tolerance",
    "d81_cms_heavy_hitters",
    "d82_corr_matrix",
    # the full streaming wave — §2.F emit-on-close / watermark-eviction
    # semantics pinned by a driver hash (verdict r5 item 4)
    "stream_tumbling_agg",
    "stream_static_join",
    "stream_scd2",
    "stream_sample_evictions",
    "stream_dedup_replay",
    "stream_funnel",
    "stream_topk",
    "stream_session_window",
    "stream_interval_join_outer",
    "stream_band_neardup",
    # dedup / linkage wave 5c
    "dedup_containment",
    "dedup_jaro_winkler",
    "dedup_lexical_pairs",
    "dedup_minhash_err_gate",
    # sampling / curation wave 5c
    "diversity_kcenter",
    "sample_domain_cap",
    "sample_group_topk",
    "curation_quantile_filter",
    "corpus_perplexity_buckets",
    # text / tokenizer wave 5c
    "text_bpe_learn",
    "text_token_entropy",
    "text_zipf_audit",
    # privacy audits + quantization + retrieval metric (wave 5c)
    "privacy_l_diversity",
    "privacy_t_closeness",
    "quant_int8_gate",
    "retrieval_ndcg",
    # chunking + export + graph + bloom (waves 5c/5d)
    "chunk_cdc_rolling",
    "export_epoch_shuffle",
    "graph_kcore",
    "d85_bloom_join_reduce",
]

_ROUND5_PRIORITY = [
    # never driver-checked (round-5 additions) — hard-signal first.
    # Window budget: 6 new + the first 44 round-2-vintage rows = 50;
    # the remaining round-5 additions (stream_dedup_replay,
    # dedup_lexical_pairs, … — all oracle-checked and swept at all
    # three SFs) queue for round 6 rather than displace stale rows.
    "a5b_keyset_composite",
    "dedup_duplicate_spans",
    # late round-5 additions, also never driver-checked (each swept
    # green at all three SFs at creation; they displace the tail of the
    # round-2-vintage block from the 50-slot window into round 6)
    "mm_phash_neardup",
    "text_pmi_pairs",
    "graph_pagerank",
    "graph_triangles",
    "dedup_incremental_probe",
    "mine_hard_negatives",
    "graph_linkpred",
    "text_bpe_pairs",
    "d69_rolling_zscore",
    "privacy_k_anonymity",
    "corpus_mixture_reweight",
    "ann_pq_recall",
    "d70_ohlc_resample",
    "d71_attribution",
    "d72_mad_outliers",
    "stream_attribution",
    "stream_rolling_zscore",
    "eval_langid_metrics",
    "eval_score_auc",
    "eval_calibration",
    "text_bigram_perplexity",
    "text_subword_encode",
    "export_webdataset",
    "privacy_dp_counts",
    "d74_cusum_changepoints",
    "text_keyword_chi2",
    "stream_cusum",
    "mm_phash_clusters",
    # round-2-vintage rows, oldest evidence in the registry:
    # the three round-1 failures whose fixes were last proven in r2
    "d21_text_group",
    "d23_session_gap",
    "b8_array_agg",
    # the d36–d44 block
    "d36_sliding_window",
    "d37_json_struct_map",
    "d38_lateral_explode",
    "d39_scalar_subquery",
    "d40_conditional_agg",
    "d41_regex_translate",
    "d42_range_frame",
    "d43_keyed_running_sum",
    "d44_salted_join",
    # sampling / split trio + curation + text ops
    "sample_hash_10pct",
    "train_test_split",
    "stratified_sample",
    "pipeline_curation",
    "text_repetition",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    # the TPC-H module (q12 is r3-vintage and sits out this window;
    # q21 was REWRITTEN in r4 — its driver row predates the rewrite)
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q02_min_cost_supplier",
    "tpch_q04_order_priority",
    "tpch_q06_forecast_revenue",
    "tpch_q07_volume_shipping",
    "tpch_q08_market_share",
    "tpch_q09_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_relationship",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales_opportunity",
    # the six dedup families + similarity trio
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_cluster",
    "d20_similarity_topk",
    "ann_bruteforce_topk",
    "dedup_embedding_pairs",
]

# Raw approximate outputs, rows-only BY DESIGN, each shadowed by a
# green oracle-checked twin (ann_*_recall, mm_embedding_recall, the
# superset-pinned bloom tests). RETIRED from ``queries()`` entirely as
# of round 6 (r5 verdict item 2): they structurally cannot hash-match,
# so keeping them registered left permanent unfalsifiable `err` rows in
# every driver file. The functions, their tests, and their bench
# entries all remain — only the driver-facing registration is gone.
_RETIRED_ROWS_ONLY = [
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_ivf_kmeans_topk",
    "mm_embedding_topk",
    "bloom_decontaminate",
]
_ROUND4_PRIORITY = [
    # never driver-checked (post-r3-gate additions) — hard-signal first
    "cdc_refresh_endstate",
    "d63_interpolate_linear",
    "dedup_fuzzy_blocked",
    "mm_frame_stats",
    "mm_frame_sample",  # NEW closed-form decode oracle this round
    # round-4 falsifiability upgrades (all oracle-checked)
    "ann_ivf_recall",
    "ann_lsh_recall",
    "ann_kmeans_recall",
    "mm_embedding_recall",
    "d35_approx_distinct",  # now a bound-gate with an exact-count oracle
    # new round-4 operators (all oracle-checked) — in-window so they
    # get a driver row THIS round instead of repeating the round-3
    # late-addition gap
    "retrieval_rrf",
    "dsir_importance",
    "text_kn_bigram",
    "d64_gaps_islands",
    "mm_keyframes",
    "pipeline_curate_pack",
]

# round-1-vintage green rows re-confirmed in remaining r4 slots
_ROUND1_VINTAGE = [
    "a5_keyset_scan",
    "a16_compaction_view",
    "a3_total_order",
    "a17_claim_predicate",
    "b5_anti_join_diff",
    "b1_filter_limit",
    "b2_inner_join",
    "b3_left_join_inlist",
    "b4_latest_per_key",
    "b6_semi_join",
    "b7_include_exclude",
    "b11_scalar_fns",
    "b12_arith_update",
    "b13_count",
    "d1_filter_pushdown",
    "d2_join_agg_topk",
    "d2b_broadcast_join",
    "d3_outer_join_agg",
    "d4_range_join",
    "d5_tpch_q1",
    "d6_count_distinct",
    "d7_rollup",
    "d8_rank_topk",
    "d9_lag_lead",
    "d10_running_sum",
    "d11_topk_order",
    "d12_intersect",
    "d13_string_fns",
    "d14_date_trunc",
    "d15_array_fns",
    "d16_json_fns",
    "d17_tumbling_window",
    "d18_distinct_dedup",
    "d19_udf_parity",
]

_ROUND3_PRIORITY = [
    # round-2 non-green rows, fixed this round
    "tpch_q12_priority_lateness",
    "mm_decode_stats",
    # new round-3 oracle-checked media queries (real PNG/WAV codecs)
    "mm_audio_stats",
    "mm_audio_windows",
    # no driver row in r01∪r02 — oracle-checked queries first
    "ivm_join_view",
    "ivm_agg_view",
    "ivm_minmax_view",
    "stream_sessionize",
    "stream_ewma_anomalies",
    "pack_sequences",
    "pack_sequences_greedy",
    "chunk_documents",
    "dedup_paragraph",
    "text_ngram_topk",
    "domain_mix_sample",
    "quality_lm_score",
    "quality_model_score",
    "contamination_check",
    "pii_redact",
    "sample_weighted",
    "a18_view_asof",
    "d45_resample_locf",
    "d46_unpivot",
    "d47_distribution_windows",
    "d48_profile_documents",
    "d49_funnel",
    "d50_cohort_retention",
    "d51_transition_matrix",
    "d52_share_of_total",
    "d53_month_over_month",
    "d54_recursive_series",
    "d55_lateral_topn",
    "d56_time_range_frame",
    "d57_table_diff",
    "d58_histogram",
    "quality_gopher_rules",
    # rows-only by declared design (approximate ANN / stub video codec
    # / float-topk ties). mm_frame_sample yields its slot to the
    # oracle-checked gopher rules this round (deferred to round 4 —
    # it is the weakest-check form and its sibling probes are in-window)
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_ivf_kmeans_topk",
    "mm_embedding_topk",
    # new round-3 queries append here (through slot 50)
    "bm25_search",
    "tfidf_top_terms",
    "dedup_dupfrac_ngram",
    "d59_grouped_percentiles",
    "d60_grouped_moments",
    "stream_interval_join",
    "d61_distribution_windows",
    "d62_regression_agg",
    "semdedup_cluster_prune",
    "bloom_decontaminate",  # rows-only: probabilistic triage by design
]

_ROUND2_PRIORITY = [
    # round-1 gate failures, fixed in commit 87134e9
    "d21_text_group",
    "d23_session_gap",
    "b8_array_agg",
    # no CORRECTNESS_r01 row — oracle-checked queries first
    "d36_sliding_window",
    "d37_json_struct_map",
    "d38_lateral_explode",
    "d39_scalar_subquery",
    "d40_conditional_agg",
    "d41_regex_translate",
    "d42_range_frame",
    "d43_keyed_running_sum",
    "d44_salted_join",
    "sample_hash_10pct",
    "train_test_split",
    "stratified_sample",
    "pipeline_curation",
    "text_repetition",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "tpch_q02_min_cost_supplier",
    "tpch_q04_order_priority",
    "tpch_q06_forecast_revenue",
    "tpch_q07_volume_shipping",
    "tpch_q08_market_share",
    "tpch_q09_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_lateness",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_relationship",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_cluster",
    "d20_similarity_topk",
    "ann_bruteforce_topk",
    "dedup_embedding_pairs",
    # one rows-only representative of the multimodal plumbing family
    "mm_decode_stats",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the corpus-curation pipeline (lang-ID → quality →
    exact-dedup canonical election → split assignment), the engine's
    training-data north star. One row-local pass + one fingerprint
    shuffle — see pgsink_spark/operators/curation.py."""
    return _rel.QUERIES["pipeline_curation"](spark, "/root/testdata/sf0.001")


def _registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    queries.update(_rel.QUERIES)
    oracles.update(_rel.ORACLES)

    for mod in (_dedup, _sim, _text):
        oracles.update(mod.ORACLES)

    queries["dedup_exact"] = _dedup.dedup_exact
    queries["dedup_ngram_jaccard"] = _dedup.dedup_ngram_jaccard
    queries["dedup_minhash_lsh"] = _dedup.dedup_minhash_lsh
    queries["dedup_simhash"] = _dedup.dedup_simhash
    queries["dedup_simhash_pairs"] = _dedup.dedup_simhash_pairs
    queries["dedup_cluster"] = _dedup.dedup_cluster
    queries["contamination_check"] = _dedup.contamination_check

    queries["d20_similarity_topk"] = _sim.d20_similarity_topk
    queries["ann_bruteforce_topk"] = _sim.ann_bruteforce_topk
    queries["dedup_embedding_pairs"] = _sim.dedup_embedding_pairs

    # multimodal: decode/window queries are oracle-checked against
    # closed-form content predictions (real PNG/WAV codecs)
    queries["mm_decode_stats"] = _mm.mm_decode_stats
    queries["mm_audio_stats"] = _mm.mm_audio_stats
    queries["mm_audio_windows"] = _mm.mm_audio_windows
    queries["mm_frame_sample"] = _mm.mm_frame_sample

    queries["text_lang_id"] = _text.text_lang_id
    queries["quality_model_score"] = _text.quality_model_score
    queries["text_quality_score"] = _text.text_quality_score
    queries["text_token_count"] = _text.text_token_count
    queries["text_fingerprint"] = _text.text_fingerprint

    ordered: dict[str, QueryFn] = {}
    for name in _ROUND11_PRIORITY:
        ordered[name] = queries[name]
    for name in _ROUND10_PRIORITY:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND9_PRIORITY:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND8_PRIORITY:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND7_PRIORITY:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND6_PRIORITY:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND5_PRIORITY + _ROUND4_PRIORITY + _ROUND1_VINTAGE:
        if name not in ordered:
            ordered[name] = queries[name]
    for name in _ROUND3_PRIORITY + _ROUND2_PRIORITY:
        if name not in ordered and name not in _RETIRED_ROWS_ONLY:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered and name not in _RETIRED_ROWS_ONLY:
            ordered[name] = fn
    for name in _RETIRED_ROWS_ONLY:
        ordered.pop(name, None)
    return ordered, oracles


def queries() -> dict[str, QueryFn]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    qs, oracles = _registry()
    return {k: v for k, v in oracles.items() if k in qs}
