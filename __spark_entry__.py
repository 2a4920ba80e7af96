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
# did NOT cover (keys absent from CORRECTNESS_r{N-1}.json) at the front;
# long-stable rows rotate to the back and stay covered by pytest
# (tests/test_extensions_oracle.py runs the full registry at sf0.001)
# and tools/check_oracle.py sweeps.  Round 6: the 45 rows the r5 gate
# missed, newest additions first.
_GATE_PRIORITY = [
    # --- new in round 6 ---
    "pipeline_tokenize_pack",
    "large_orders",
    "cheapest_supplier",
    "tfidf_top_terms",
    "salted_hourly_totals",
    "contamination_report",
    "quality_percentile",
    "ts_autocorr_24h",
    "promo_revenue_share",
    "similar_users_topk",
    # --- registered in r5 but never driver-gated (after the 50-row cap) ---
    "pipeline_e2e",
    "sketch_distinct_tokens",
    "rolling_weekly_users",
    "sim_topk_pq",
    "sales_rollup_nation_month",
    "ts_ewma_smooth",
    "emb_quantize_int8",
    "sim_topk_int8",
    "sim_topk_rerank",
    "sim_recall_audit",
    "dedup_source_overlap",
    "vocab_encode_top256",
    "text_chunk_windows",
    "pipeline_chunk_pack",
    "text_pack_bins",
    "text_len_hist_quantiles",
    "text_repetition",
    "text_dup_ngrams",
    "events_debounce",
    "retention_cohorts",
    "ts_anomaly_zscore",
    "ts_seasonal_anomaly",
    "ts_trend_slope",
    "series_correlation",
    "ts_m4_downsample",
    "ts_gap_detect",
    "ts_hourly_profile",
    "sample_stratified_lang",
    "sample_weighted_mix",
    "corpus_stats_by_source",
    "corpus_cube",
    "corpus_pivot_lang",
    "lang_coverage_division",
    "brands_shipping_recent",
    "text_length_ntile",
    "dq_violations",
    "pricing_summary",
    "top_open_orders",
    "customers_without_urgent_orders",
    "local_supplier_volume",
    # the five rows below land past the 50-row gate cap with round 6's
    # ten new queries ahead of them — the r5-unchecked rows deferred
    # to the r7 window, chosen deliberately: all five are thin
    # projections (PII scrub and JSON kv extraction are plan-pinned
    # pure projections; the multimodal metadata/frame/feature stubs),
    # the lowest-risk rows in the registry, and they stay pytest- and
    # check_oracle-gated meanwhile
    "events_pii_scrub",
    "events_json_kv",
    "mm_media_meta",
    "mm_frame_sample",
    "mm_feature_stub",
    # --- r5-gated representatives: keep a few core rows in-window so the
    # engine pipeline itself stays externally gated every round ---
    "ts_counter_hour_fill",
    "ts_histogram_merged",
    "asof_purchase_click",
    "dedup_minhash_lsh",
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
