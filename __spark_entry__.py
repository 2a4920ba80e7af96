"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in ``time_series_storage_spark.queries_testdata`` (core
engine operators) and ``time_series_storage_spark.queries_extensions``
(dedup / similarity / text-analysis), shared with bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver's correctness gate caps at the FIRST 50 registry entries
# (insertion order), so registration order decides which queries get the
# hard external hash-gate each round.  _GATE_PRIORITY rotates coverage:
# put the newest queries plus everything the previous round's driver gate
# did NOT cover at the front; long-stable rows rotate to the back and
# stay covered by pytest (tests/test_extensions_oracle.py runs the full
# registry at sf0.001) and tools/check_oracle.py sweeps.  Round 13
# (this session) implements the r12 verdict's rotation exactly: the 9
# new r13 queries + the 5 r7-stale graph/fuzzy rows + the 36
# longest-unrotated r8 rows in registry order (computed from the
# CORRECTNESS artifacts, not by hand).  After a green r13, zero rows
# are never-gated and the oldest external gate registry-wide advances
# from r7 to r8 (exactly the fourteen r8 rows leading the backlog below
# the line — they lead r14).
_GATE_PRIORITY = [
    # --- round-13 window (the first 50 are the driver's hard hash
    # --- gate), composed per the r12 verdict's rotation directive,
    # --- computed from the CORRECTNESS_r01..r12 artifacts. 1-9: the
    # --- nine NEW r13 queries — the token-accounting pipeline
    # --- (tempered token mixer; frozen-ledger store-served and
    # --- stream-served twins; training-order serialization;
    # --- concatenate-and-cut context packing; epochs plan; UniMax
    # --- token waterfill) and the ANN serving audits (nprobe
    # --- recall/work sweep + full nprobe x refine grid) — never
    # --- externally gated ---
    "sample_token_budget_mix",
    "tokmix_incremental",
    "tokmix_streamed",
    "tokmix_training_order",
    "tokmix_pack_contexts",
    "sample_epochs_plan",
    "sample_token_waterfill",
    "ivfpq_nprobe_audit",
    "ivfpq_serving_grid",
    # --- 10-14: the five r7-stale rows (the graph/CC dedup family +
    # --- fuzzy match — last external gate four rounds old) ---
    "decontaminate_bloom",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_simhash",
    "fuzzy_part_names",
    # --- 15-50: the 36 longest-unrotated r8 rows, registry order
    # --- (the remaining fourteen r8 rows lead the backlog and r14) ---
    "forecast_revenue_delta",
    "nation_market_share",
    "product_profit",
    "important_stock",
    "late_shipment_priority",
    "semantic_dedup",
    "chunk_dedup_docs",
    "lm_doc_likelihood",
    "chunk_dedup_incremental",
    "doc_embed_hashing",
    "text_semantic_dedup",
    "pipeline_quality_chunk_dedup",
    "small_qty_revenue",
    "customer_order_counts",
    "top_revenue_supplier",
    "bulk_part_suppliers",
    "part_supplier_variety",
    "img_near_dup",
    "img_near_incremental",
    "audio_near_dup",
    "audio_near_incremental",
    "bpe_encode_prod",
    "lm_score_incremental",
    "pipeline_incremental_curation",
    "video_frame_sample",
    "video_near_dup",
    "video_near_incremental",
    "sim_topk_ivf_incremental",
    "entity_resolution_parts",
    "event_transitions",
    "split_assign",
    "asof_purchase_click",
    "asof_click_next_purchase",
    "asof_nearest_click",
    "sessionize_user_30m",
    "interval_join_purchase_session",
    # --- below the 50-row gate line: every remaining row ordered
    # --- by staleness of its last external gate (the fourteen
    # --- leftover r8 rows first, then r9, r10, r11, r12 freshest);
    # --- all keep pytest/sweep coverage
    # --- (tests/test_extensions_oracle.py runs the FULL registry at
    # --- sf0.001) ---
    "interval_overlap_incidents",
    "funnel_view_click_purchase",
    "sim_topk_cosine",
    "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
    "sim_lsh_pairs",
    "dedup_embedding_cosine",
    "text_token_stats",
    "text_quality",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
    "text_top_terms",
    "text_repetition",
    "dedup_exact_substring",
    "esub_dedup_incremental",
    "pipeline_curation_media",
    "gopher_quality_rules",
    "dsir_importance",
    "ccnet_quality_buckets",
    "pipeline_modern_curation",
    "dsir_score_incremental",
    "text_dup_ngrams",
    "emb_quantize_int8",
    "sim_topk_int8",
    "sim_topk_rerank",
    "sim_topk_pq",
    "dedup_source_overlap",
    "corpus_stats_by_source",
    "corpus_cube",
    "lang_coverage_division",
    "brands_shipping_recent",
    "text_length_ntile",
    "corpus_pivot_lang",
    "dq_violations",
    "vocab_encode_top256",
    "text_chunk_windows",
    "pipeline_chunk_pack",
    "text_len_hist_quantiles",
    "sample_stratified_lang",
    "sample_weighted_mix",
    "pipeline_e2e",
    "pipeline_tokenize_pack",
    "tfidf_top_terms",
    "salted_hourly_totals",
    "contamination_report",
    "quality_percentile",
    "ts_autocorr_24h",
    "promo_revenue_share",
    "similar_users_topk",
    "events_debounce",
    "retention_cohorts",
    "ts_anomaly_zscore",
    "ts_seasonal_anomaly",
    "ts_trend_slope",
    "series_correlation",
    "ts_m4_downsample",
    "ts_ewma_smooth",
    "ts_gap_detect",
    "text_pack_bins",
    "sketch_distinct_tokens",
    "rolling_weekly_users",
    "sales_rollup_nation_month",
    "sim_recall_audit",
    "hll_distinct_by_lang",
    "hll_distinct_incremental",
    "hll_distinct_as_of",
    "hll_union_langs",
    "kmv_overlap_langs",
    "source_token_gini",
    "split_leakage_audit",
    "sample_kcenter_coreset",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "bm25_incremental",
    "cms_heavy_hitters",
    "cms_incremental",
    "dup_graph_labelprop",
    "basket_pair_rules",
    "events_hilbert_cells",
    "sim_rrf_fusion",
    "ts_sax_daily",
    "sim_topk_mmr",
    "ts_dtw_pairs",
    "dq_benford_prices",
    "customer_rfm",
    "join_card_estimate",
    "hist_range_selectivity",
    "ts_theilsen_slope",
    "ts_mann_kendall",
    "maxmatch_segment",
    "rolling_weekly_users_hll",
    "ts_holt_winters",
    "ts_hw_forecast",
    "dedup_lsh_audit",
    "sim_topk_rp",
    "quality_drift_incremental",
    "ts_holt_backtest",
    "dup_graph_kcore",
    "lm_stupid_backoff",
    "knn_label_audit",
    "label_centroid_confusion",
    "ts_classical_decompose",
    "centroid_drift_incremental",
    "text_readability",
    "source_diversity",
    "event_trigram_paths",
    "lm_kneser_ney",
    "dedup_retention_horizon",
    "sb_score_incremental",
    "emb_power_iteration",
    "emb_spectral_outliers",
    "lang_id_confusion",
    "emb_power_iteration2",
    "qsk_event_percentiles",
    "qsk_week_rollup",
    "qsk_incremental",
    "qsk_as_of",
    "qsk_rolling_p95",
    "qsk_error_audit",
    "sample_reservoir_members",
    "reservoir_incremental",
    "reservoir_as_of",
    "ts_counter_hour_streamed",
    "knn_label_audit_ivf",
    "label_norm_robust",
    "distinct_incremental",
    "decontaminate_incremental",
    "dup_graph_triangles",
    "curation_attrition",
    "sim_margin_mine",
    "semantic_dedup_incremental",
    "dedup_keep_best",
    "dup_graph_pagerank",
    "dedup_canonical_pagerank",
    "dedup_clusters_incremental",
    "dedup_keep_best_incremental",
    "sim_topk_mips",
    "sim_range_search",
    "sample_temperature_mix",
    "sample_waterfill",
    "ts_holt_linear",
    "ts_holt_forecast",
    "pipeline_modern_incremental",
    "doc_novelty_incremental",
    "source_length_robust",
    "local_supplier_volume",
    "ts_hourly_profile",
    "pricing_summary",
    "top_open_orders",
    "customers_without_urgent_orders",
    "large_orders",
    "cheapest_supplier",
    "ts_counter_none",
    "ts_counter_day_offset3",
    "ts_counter_week_sunday",
    "ts_counter_month",
    "ts_counter_hierarchy_day",
    "ts_counter_nil_filter",
    "ts_avg_none",
    "ts_histogram_merged",
    "ts_counter_hour_materialized",
    "ts_avg_hour_materialized",
    "ts_histogram_day_materialized",
    "sim_topk_ivfpq",
    "ivfpq_incremental",
    "unigram_fit_pieces",
    "unigram_segment",
    "qsk_p99_streamed",
    "unigram_incremental",
    "unigram_doc_tokens",
    "sample_cluster_quota",
    "sample_cluster_served",
    "sample_weighted_reservoir",
    "qsk_p99_regression",
    "dedup_ppjoin",
    "wres_members_incremental",
    "qsk_weighted_price",
    "ppjoin_incremental",
    "reservoir_mean_audit",
    "ts_counter_hour_fill",
    "ts_avg_hour_fill",
    "ts_histogram_day",
    "ts_histogram_quantiles",
    "ts_rollup_slice15",
    "dedup_near_incremental",
    "emb_near_incremental",
    "volume_shipping",
    "sales_opportunity",
    "events_zorder_cells",
    "bpe_fit_merges",
    "bpe_encode_docs",
    "jpeg_gray_decode",
    "order_priority_returns",
    "supplier_return_blame",
    "ts_cusum_changepoint",
    "brand_quantity_revenue",
    "ts_rolling_corr",
    "top_return_customers",
    "mm_audio_frames",
    "dedup_incremental",
    "events_pii_scrub",
    "events_json_kv",
    "mm_media_meta",
    "mm_frame_sample",
    "mm_feature_stub",
    "ts_rolling_3h",
    "ts_interp_fill",
    "ts_rate_sparse",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "decontaminate_ngram",
    "decontaminate_token_ngram",
]


def _registry() -> dict:
    from time_series_storage_spark.queries_testdata import CORE_QUERIES

    reg = dict(CORE_QUERIES)
    try:
        from time_series_storage_spark.queries_extensions import EXT_QUERIES

        reg.update(EXT_QUERIES)
    except ImportError:
        pass
    ordered = {n: reg[n] for n in _GATE_PRIORITY if n in reg}
    ordered.update((n, v) for n, v in reg.items() if n not in ordered)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly average series
    with dense zero-fill through the full engine pipeline."""
    from time_series_storage_spark.queries_testdata import q_avg_hour

    return q_avg_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for ops whose
    semantics aren't SQL-expressible; the driver then does a rows-only
    check)."""
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
