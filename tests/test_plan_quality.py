"""Physical-plan regression tests: the properties that make the engine
scale are asserted on `.explain` output, not assumed.

A correct result from a plan that scans everything is still a failing
grade at 100 TB — these tests pin the load-bearing plan features:
partition pruning, parquet predicate pushdown, map-side partial
aggregation, broadcast grid fill, and column pruning.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries

START = dt.datetime(2024, 1, 1)
FINISH = dt.datetime(2024, 1, 2)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parquet_engine(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("events")
    eng = TimeSeries(spark, events_path=str(path / "ev"))
    eng.define_fact("hits", "counter", 15)
    eng.define_fact("lat", "average", 15)
    eng.define_dimension("user", facts=["hits", "lat"])
    src = spark.range(1000).select(
        (F.lit(START) + F.make_interval(mins=(F.col("id") * 11) % (7 * 1440))).alias("ts"),
        (F.col("id") % 9).cast("double").alias("value"),
        F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("user"),
    )
    eng.ingest_df("hits", src.withColumn("one", F.lit(1.0)),
                  value_col="one", dim_cols={"user": "user"})
    eng.ingest_df("lat", src, dim_cols={"user": "user"})
    return eng


def test_scan_is_partition_pruned_and_pushed(parquet_engine):
    plan = _plan(
        parquet_engine.get_timeseries("hits", "user", {}, START, FINISH, step="hour")
    )
    # day-range partition pruning on (fact, p_date)
    assert "PartitionFilters" in plan
    assert "fact" in plan.split("PartitionFilters")[1][:300]
    assert "p_date" in plan.split("PartitionFilters")[1][:300]
    # raw ts range reaches the parquet reader for row-group skipping
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed


def test_aggregation_is_partial_single_shuffle(parquet_engine):
    plan = _plan(
        parquet_engine.get_timeseries("lat", "user", {}, START, FINISH, step="hour")
    )
    # map-side combine before the one aggregation exchange
    assert "partial_count" in plan or "partial_sum" in plan
    agg_exchanges = [
        seg for seg in plan.split("Exchange")[1:] if "hashpartitioning" in seg[:200]
    ]
    assert len(agg_exchanges) >= 1
    # grid fill joins via broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_column_pruning_reaches_scan(parquet_engine):
    plan = _plan(
        parquet_engine.get_timeseries("hits", "user", {}, START, FINISH)
    )
    # the events scan must not read `value`-adjacent columns it doesn't
    # need — ReadSchema carries only ts/value/dims
    schema_part = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "ts" in schema_part and "dims" in schema_part


def test_minhash_shingle_sets_have_no_exchange(spark):
    """The per-document shingle-set build (shingle, hash, dedup) is one
    codegen'd projection — any Exchange before the signature aggregate
    is a regression to the exploded-index design."""
    from time_series_storage_spark.operators.dedup import (
        hashed_shingle_sets,
    )

    # other tests may have left the minhash set table cached, which
    # rewrites this plan to an InMemoryTableScan (whose printed
    # materialization duplicates the Exchange) — measure the fresh plan
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(hashed_shingle_sets(docs, "doc_id", "text"))
    # exactly the one round-robin/hash repartition for parallelism, no
    # aggregation exchange
    segs = [s for s in plan.split("Exchange")[1:] if "hashpartitioning" in s[:200]]
    assert len(segs) <= 1
    assert "HashAggregate" not in plan


def test_ivf_probe_joins_are_broadcast(spark):
    """IVF top-k must broadcast the centroid and probe tables — the
    corpus side never shuffles for the similarity computation."""
    from time_series_storage_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(ivf_topk(emb.where(F.col("vec_id") < 4), emb, k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_and_sessionize_single_shuffle_no_join(spark):
    """The as-of join must compile to union + one window exchange on
    the key — no join operator at all; sessionize likewise is one
    window pass."""
    import datetime as dtm

    from time_series_storage_spark.operators.asof import asof_join
    from time_series_storage_spark.operators.sessions import sessionize

    t0 = dtm.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, "k", t0)], ["lid", "k", "ts"])
    right = spark.createDataFrame([(2, "k", t0)], ["rid", "k", "ts"])
    plan = _plan(
        asof_join(left, right, on=["k"], right_payload=["rid"])
    )
    assert "Join" not in plan  # no BroadcastHashJoin/SortMergeJoin/...
    assert plan.count("Window") >= 1

    plan2 = _plan(sessionize(left, ["k"]))
    assert "Join" not in plan2 and "Window" in plan2


def test_repetition_plan_is_linear_no_map_fold(spark):
    """repetition_scores must be the explode -> two partial-aggregated
    groupBys shape — any higher-order per-row fold (aggregate /
    map_zip_with over a growing map) is the interpreted O(tokens x
    distinct-tokens) CPU bomb this operator was rewritten to kill."""
    from time_series_storage_spark.operators.text import repetition_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(repetition_scores(docs, "doc_id", "text"))
    assert "map_zip_with" not in plan and "aggregate(" not in plan
    # both aggregations combine map-side before their exchange
    assert "partial_count" in plan
    assert "partial_max" in plan or "partial_sum" in plan
    # no join back against the input: explode_outer keeps empty docs
    assert "Join" not in plan


def test_contamination_probe_is_broadcast_single_exchange(spark):
    """Decontamination must broadcast the benchmark shingle set and
    probe it map-side: no sort-merge join, and the only hash exchange
    below the final aggregate is the per-doc groupBy."""
    from time_series_storage_spark.operators.dedup import ngram_contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") < 10)
    plan = _plan(ngram_contamination(docs, bench))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan  # map-side combine before the exchange


def test_extension_scan_prunes_columns(spark):
    from time_series_storage_spark.operators.text import ws_token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.select(ws_token_count("text").alias("n")))
    schema_part = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in schema_part
    assert "n_chars" not in schema_part and "source" not in schema_part


def test_int8_topk_is_broadcast_no_smj(spark):
    """Quantized top-k keeps brute_force_topk's scale shape: queries
    broadcast, corpus scan shuffle-free, no sort-merge join; the only
    exchange feeds the per-query rank window."""
    from time_series_storage_spark.operators.similarity import int8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(int8_topk(emb.where(F.col("vec_id") < 4), emb, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    segs = [
        s for s in plan.split("Exchange")[1:] if "hashpartitioning" in s[:200]
    ]
    assert len(segs) == 1  # the window's q_id partitioning


def test_dup_ngram_plan_partial_aggregated(spark):
    """Both aggregations of the duplicated-n-gram signal must partial-
    aggregate map-side (linear in tokens, shuffles carry combiners)."""
    from time_series_storage_spark.operators.text import dup_ngram_fraction

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dup_ngram_fraction(docs))
    assert "partial_count" in plan
    assert "Join" not in plan
    assert "REPARTITION_BY_NUM" in plan  # AQE-coalesce-exempt hash stage


def test_grouped_percentiles_single_sort(spark):
    """Rank-selection percentiles: row_number and the group count share
    ONE window sort (same partitioning + ordering), then aggregate —
    no second exchange, no driver-side collection."""
    from time_series_storage_spark.operators.analytics import (
        grouped_percentiles,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", F.length("text").alias("n"))
    plan = _plan(
        grouped_percentiles(docs, ["source"], "n", order_col="doc_id")
    )
    assert plan.count("Sort ") <= 2  # window sort (+ optional agg sort)
    assert "Join" not in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """The repeated-join answer at 100 TB: two tables bucketed on the
    join key join with ZERO shuffles — the sort-merge join's children
    are the scans themselves. Asserted on the physical plan; the
    unbucketed control join MUST show exchanges, so the assertion is
    known to be sensitive."""
    from time_series_storage_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    users = spark.range(1000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment"),
    )
    events = spark.range(5000).select(
        (F.col("id") % 1000).alias("user_id"),
        F.col("id").alias("event_id"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # control: the same join unbucketed shuffles both sides
        control = _plan(users.join(events, "user_id"))
        assert "Exchange" in control

        write_bucketed(users, "t_users_b", "user_id", 8, sort_by="user_id")
        write_bucketed(events, "t_events_b", "user_id", 8,
                       sort_by="user_id")
        plan = _plan(bucketed_join(spark, "t_users_b", "t_events_b",
                                   "user_id"))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_users_b")
        spark.sql("DROP TABLE IF EXISTS t_events_b")


def test_redact_is_pure_projection(spark):
    """The PII scrub is a zero-shuffle codegen projection — no
    exchange, no Python, one codegen span over scan+project."""
    from time_series_storage_spark.operators.text import redact

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(redact(docs, "doc_id", "text"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(1) Project" in plan  # whole-stage codegen span


def test_pack_single_exchange_reused_by_binning(spark):
    """Sequence packing: the window's (group, shard) exchange is the
    ONLY shuffle — the per-bin aggregate reuses the window partitioning
    (its keys are a superset), so Catalyst plans no second exchange."""
    from time_series_storage_spark.operators.pack import pack_bins

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", F.length("text").alias("n_tokens"))
    plan = _plan(pack_bins(docs, 256, ("source",), n_shards=4))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan  # bin aggregate still map-side combines


def test_anomaly_single_window_pass(spark):
    """anomaly_zscore: all three frame aggregates (count/sum/sumsq)
    share ONE Window operator — one exchange, one sort, no join."""
    from time_series_storage_spark.operators.analytics import (
        anomaly_zscore,
        quantize,
    )

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_id", "event_type", "ts", quantize("value").alias("q"))
    plan = _plan(
        anomaly_zscore(ev, ["event_type"], q_col="q", order_col="event_id")
    )
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_kmv_no_python_no_global_sort(spark):
    """KMV sketch: the two-phase k-min never globally sorts the corpus
    — both rank passes are window sorts (partition-local after their
    exchange); no Python, no cartesian."""
    from time_series_storage_spark.operators.sketch import kmv_estimate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("source", F.explode(F.split("text", " ")).alias("tok"))
    plan = _plan(kmv_estimate(docs, ["source"], "tok"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # global sorts show as Sort [..], global true — windows sort locally
    assert "global=true" not in plan.replace("global true", "global=true")


def test_relational_rollup_broadcasts_dims_pushes_anti_filter(spark):
    """sales rollup: customer+nation joins are BroadcastHashJoin and
    the aggregate partial-combines before its exchange; the anti-join
    query pushes the priority filter into the orders scan."""
    from time_series_storage_spark.queries_extensions import (
        q_customers_without_orders,
        q_sales_rollup,
    )

    sf = "/root/testdata/sf0.001"
    plan = _plan(q_sales_rollup(spark, sf))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "partial_count" in plan
    anti = _plan(q_customers_without_orders(spark, sf))
    assert "LeftAnti" in anti
    assert "EqualTo(o_orderpriority,1-URGENT)" in anti.replace("'", "")


def test_pricing_summary_pushes_filter_partial_aggregates(spark):
    """pricing summary: the shipdate ceiling reaches the parquet scan
    as a pushed filter, the aggregate partial-combines before its one
    exchange, and there is no join or window anywhere."""
    from time_series_storage_spark.queries_extensions import (
        q_pricing_summary,
    )

    plan = _plan(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    assert "partial_count" in plan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


def test_top_open_orders_is_topk_not_global_sort(spark):
    """Q3-shaped top-k: the limit compiles to TakeOrderedAndProject
    (per-task local k, no global sort), the segment-filtered customer
    side broadcasts, and both date filters reach their scans."""
    from time_series_storage_spark.queries_extensions import (
        q_top_open_orders,
    )

    plan = _plan(q_top_open_orders(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    norm = plan.replace("'", "")
    assert "EqualTo(c_mktsegment,BUILDING)" in norm
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_bloom_probe_is_broadcast_bit_test(spark):
    """Bloom decontamination: both bitmap joins are BroadcastHashJoin
    (nothing benchmark-sized is ever shuffle-keyed), the per-doc
    aggregate partial-combines, and no Python runs anywhere."""
    from time_series_storage_spark.queries_extensions import (
        q_decontaminate_bloom,
    )

    plan = _plan(q_decontaminate_bloom(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") == 2
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_topk_codebook_and_lut_broadcast(spark):
    """PQ/ADC: the codebook join (encode) and the LUT join (score) are
    both broadcast — nothing codebook- or query-sized is shuffle-keyed
    — the (q, vec) sum partial-aggregates, and no Python runs."""
    from time_series_storage_spark.queries_extensions import q_sim_topk_pq

    plan = _plan(q_sim_topk_pq(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_cube_is_one_expand_one_exchange(spark):
    """CUBE over (source, lang): Spark compiles all four grouping
    levels into ONE Expand + one partial-aggregated exchange — never
    four scans unioned."""
    from time_series_storage_spark.queries_extensions import q_corpus_cube

    plan = _plan(q_corpus_cube(spark, "/root/testdata/sf0.001"))
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("Scan parquet") == 1
    assert "partial_count" in plan


def test_semi_join_pushes_probe_filter(spark):
    """brands_shipping_recent: the join is LeftSemi (no fan-out, no
    post-join distinct) and the shipdate filter reaches the probe
    side's parquet scan."""
    from time_series_storage_spark.queries_extensions import (
        q_brands_shipping_recent,
    )

    plan = _plan(q_brands_shipping_recent(spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "partial_count" in plan


def test_pivot_is_one_scan_all_partial_aggregated(spark):
    """corpus_pivot_lang with explicit values: ONE scan (no
    distinct-discovery pass, no per-value scans) and Catalyst's
    two-stage pivot plan — a partial-aggregated (source, lang) count
    then a partial pivotfirst — so every exchange carries
    aggregate-sized rows, never raw documents."""
    from time_series_storage_spark.queries_extensions import (
        q_corpus_pivot_lang,
    )

    plan = _plan(q_corpus_pivot_lang(spark, "/root/testdata/sf0.001"))
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan and "partial_pivotfirst" in plan
    assert "Join" not in plan


def test_interval_overlap_is_bin_equijoin_no_nested_loop(spark):
    """Interval-overlap join: the pair generation is a hash equi-join
    on bins (never BroadcastNestedLoopJoin/CartesianProduct) and the
    first-shared-bin rule removes the dedup aggregate — no distinct
    exchange after the join."""
    from time_series_storage_spark.queries_extensions import (
        q_interval_overlap,
    )

    plan = _plan(q_interval_overlap(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # shuffled or broadcast hash equi-join


def test_chunk_pack_composition_single_window_exchange(spark):
    """The chunk -> pack composition stays one lazy DAG: chunking adds
    no exchange (carry_cols pass through without a join back), so the
    whole pipeline is the pack window's exchange plus the
    partial-aggregated bin rollup."""
    from time_series_storage_spark.queries_extensions import (
        q_pipeline_chunk_pack,
    )

    plan = _plan(q_pipeline_chunk_pack(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert "partial_count" in plan


def test_q5_one_big_exchange_four_broadcasts(spark):
    """Local-supplier-volume (Q5 shape): the only shuffled join is
    lineitem-orders; customer/supplier/nation/region all broadcast and
    the order-date window is pushed into the orders scan."""
    from time_series_storage_spark.queries_extensions import (
        q_local_supplier_volume,
    )

    plan = _plan(q_local_supplier_volume(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "partial_count" in plan


def test_round5_analytics_plans(spark):
    """Plan pins for the round-5 analytics queries: retention joins
    co-keyed on user_id with both aggregates partial-combined;
    transitions is one window + a partial-aggregated rollup; the
    seasonal-anomaly profile joins back BROADCAST; rolling KMV never
    cartesians or drops to Python."""
    from time_series_storage_spark.queries_extensions import (
        q_event_transitions,
        q_retention_cohorts,
        q_rolling_weekly_users,
        q_ts_seasonal_anomaly,
    )

    sf = "/root/testdata/sf0.001"
    ret = _plan(q_retention_cohorts(spark, sf))
    assert "partial_count" in ret or "partial_min" in ret
    assert "CartesianProduct" not in ret

    tr = _plan(q_event_transitions(spark, sf))
    assert tr.count("Window") >= 1
    assert "partial_count" in tr
    assert "Join" not in tr  # lag + rollup + prob window, no join

    sa = _plan(q_ts_seasonal_anomaly(spark, sf))
    assert "BroadcastHashJoin" in sa
    assert "SortMergeJoin" not in sa

    rk = _plan(q_rolling_weekly_users(spark, sf))
    assert "CartesianProduct" not in rk
    assert "BatchEvalPython" not in rk
    assert rk.count("Window") >= 2  # two-phase k-min + rolling merge


def test_large_orders_having_aggregates_before_joins(spark):
    """Q18-shape: lineitem reaches its HAVING filter through one
    partial-aggregated exchange (never joins unaggregated), the tiny
    survivor set broadcasts into the orders attach, and the top-k is
    TakeOrderedAndProject — no global sort."""
    from time_series_storage_spark.queries_extensions import q_large_orders

    plan = _plan(q_large_orders(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan        # map-side combine on quantity
    assert "BroadcastHashJoin" in plan  # survivors broadcast


def test_cheapest_supplier_is_two_aggregates_no_window(spark):
    """Q2-shaped argmin: two partial-aggregated hash aggregates (per
    (part, supplier), then per part via min_by) — no Window over the
    fact table, no join back to re-find the winner; the supplier-name
    attach broadcasts; top-k is TakeOrderedAndProject."""
    from time_series_storage_spark.queries_extensions import (
        q_cheapest_supplier,
    )

    plan = _plan(q_cheapest_supplier(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan
    assert "partial_min" in plan or "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_tfidf_window_is_per_doc_not_global(spark):
    """The per-doc top-k window must partition by doc_id (a global
    window over the scored stream would serialize at scale), and both
    tf and df aggregates partial-combine."""
    from time_series_storage_spark.queries_extensions import (
        q_tfidf_top_terms,
    )

    plan = _plan(q_tfidf_top_terms(spark, "/root/testdata/sf0.001"))
    assert "partial_count" in plan
    import re as _re

    for m in _re.finditer(r"Window \[.*?windowspecdefinition\(([^,]*),", plan):
        assert "doc_id" in m.group(1), m.group(0)[:120]
    assert "Window" in plan


def test_salted_agg_is_two_exchanges_both_partial(spark):
    """The salted query's physical shape: exactly two exchanges — by
    (keys, salt) then by keys — and BOTH aggregates partial-combine,
    so the hot key's fan-in per reducer is capped at salt_buckets."""
    from time_series_storage_spark.queries_extensions import (
        q_salted_hourly_totals,
    )

    plan = _plan(q_salted_hourly_totals(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "_salt" in plan
    assert "partial_sum" in plan and "partial_count" in plan


def test_contamination_report_probe_broadcasts_all_suites(spark):
    """The multi-suite probe must stay ONE broadcast join over the
    corpus units — adding suites adds broadcast bytes, never a second
    corpus-side pass or shuffle join on the unit stream."""
    from time_series_storage_spark.queries_extensions import (
        q_contamination_report,
    )

    plan = _plan(q_contamination_report(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # per-doc rollup map-side combines
    # exactly one scan feeds the corpus-unit explode per plan subtree
    # reuse; the suite sets derive from the SAME persisted units
    assert plan.count("InMemoryTableScan") >= 3


def test_quality_percentile_never_sorts_the_corpus(spark):
    """percent_rank from the bounded value histogram: the corpus-wide
    frames only hash-aggregate (partial-combined); the one sort in the
    plan runs over the <= 1001 x sources histogram rows, and the rank
    attach joins back via broadcast."""
    from time_series_storage_spark.queries_extensions import (
        q_quality_percentile,
    )

    plan = _plan(q_quality_percentile(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_ts_autocorr_window_is_bucket_level_per_type(spark):
    """The lag window must run over the hourly-bucket series (one
    partition per event type, <= hours-in-range rows), never the raw
    event stream: the aggregate to buckets partial-combines BEFORE the
    window's exchange."""
    from time_series_storage_spark.queries_extensions import q_ts_autocorr

    plan = _plan(q_ts_autocorr(spark, "/root/testdata/sf0.001"))
    assert "partial_count" in plan
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^,]*),", plan):
        assert "event_type" in m.group(1), m.group(0)[:120]


def test_promo_share_pushes_dates_and_broadcasts_part(spark):
    from time_series_storage_spark.queries_extensions import (
        q_promo_revenue_share,
    )

    plan = _plan(q_promo_revenue_share(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan  # pushed to the scan
    assert "partial_count" in plan


def test_similar_users_is_two_aggs_broadcast_target_topk(spark):
    """Series-similarity search: the target series and the T2 constant
    ride broadcasts, both aggregates partial-combine, and the top-k is
    TakeOrderedAndProject — no global sort, no day-grid densification,
    no user self-join (a join of per_day with itself on day would
    explode)."""
    from time_series_storage_spark.queries_extensions import (
        q_similar_users_topk,
    )

    plan = _plan(q_similar_users_topk(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan


def test_order_priority_returns_semi_join_pruned_probe(spark):
    """Q4 shape: the existence test is a LEFT SEMI join (never
    duplicates orders rows, no distinct after), the returnflag filter
    is pushed into the probe side's parquet scan, and the 5-row
    priority aggregate partial-combines."""
    from time_series_storage_spark.queries_extensions import (
        q_order_priority_returns,
    )

    plan = _plan(q_order_priority_returns(spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan
    assert "EqualTo(l_returnflag,R)" in plan  # pushed to the scan
    assert "partial_count" in plan


def test_supplier_return_blame_one_fact_agg_two_broadcasts(spark):
    """Q21 shape, agg-rewrite form: both existence tests ride ONE
    partial-aggregated pass over lineitem (no second/third fact
    shuffle for EXISTS / NOT EXISTS), supplier and nation broadcast,
    and every shuffle join keys on the orderkey the stats aggregate
    already partitioned on."""
    from time_series_storage_spark.queries_extensions import (
        q_supplier_return_blame,
    )

    plan = _plan(q_supplier_return_blame(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation
    # the blamed-line probe scan is pruned at the source
    assert "EqualTo(l_returnflag,R)" in plan
    # one distinct-expand aggregate pass computes both existence tests
    assert "Expand" in plan
    assert "partial_count" in plan


def test_ts_cusum_windows_share_one_bucket_level_sort(spark):
    """The CUSUM running windows run over the hourly-bucket series
    (every window partitions on event_type; the raw stream collapses
    in a partial-aggregated exchange first), and the chained cumsum /
    running-min / peak windows reuse one sort — no per-window
    re-exchange of the series."""
    from time_series_storage_spark.queries_extensions import q_ts_cusum

    plan = _plan(q_ts_cusum(spark, "/root/testdata/sf0.001"))
    assert "partial_count" in plan
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^,]*),", plan):
        assert "event_type" in m.group(1), m.group(0)[:120]


def test_brand_quantity_revenue_pushes_factored_disjuncts(spark):
    """Q19 shape: no single predicate applies to every OR band, yet
    both scans must still shrink — the per-side disjunctions (quantity
    envelope on lineitem; brand/size bands plus the factored common
    ``p_size >= 1`` on part) are pushed into the parquet scans, part
    broadcasts, and the residual OR evaluates post-join."""
    from time_series_storage_spark.queries_extensions import (
        q_brand_quantity_revenue,
    )

    plan = _plan(q_brand_quantity_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    # quantity disjunction reached the lineitem scan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    # brand disjunction and the factored size conjunct reached part
    # (prefix match: explain truncates long pushed-filter lists)
    assert "Or(Or(And(EqualTo(p_brand" in plan
    assert "GreaterThanOrEqual(p_size,1)" in plan


def test_ts_rolling_corr_one_window_over_bucket_series(spark):
    """All six frame aggregates of the rolling Pearson share ONE
    Window operator, and it runs over the hourly-bucket series (the
    raw stream partial-aggregates away first) — the deliberate global
    window is bounded by hours-in-range, never raw volume."""
    from time_series_storage_spark.queries_extensions import (
        q_ts_rolling_corr,
    )

    plan = _plan(q_ts_rolling_corr(spark, "/root/testdata/sf0.001"))
    assert "partial_sum" in plan  # buckets partial-combine pre-window
    assert plan.count("Window") == 1  # one shared frame pass


def test_top_return_customers_aggregates_before_dim_joins(spark):
    """Q10 shape: the custkey aggregate runs BEFORE the customer and
    nation joins (the broadcast dims see one row per surviving
    customer, never per line), both scans are pruned at the source,
    and the top-k is TakeOrderedAndProject, not a global sort."""
    from time_series_storage_spark.queries_extensions import (
        q_top_return_customers,
    )

    plan = _plan(q_top_return_customers(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the aggregate's output feeds the customer join, not vice versa:
    # c_name must not appear in any aggregate expression
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines and all("c_name" not in ln for ln in agg_lines)


def test_small_qty_revenue_aggregates_fact_before_rejoin(spark):
    """Q17 shape: the per-part average comes from ONE partial-
    aggregated pass over the fact (HashAggregate on l_partkey before
    the re-join, no correlated subquery => no second fact-sized
    exchange pair), the part dimension is a broadcast, and the
    quantity compare is integer arithmetic in the filter, not a
    double-average compare."""
    from time_series_storage_spark.queries_extensions import (
        q_small_qty_revenue,
    )

    plan = _plan(q_small_qty_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan  # part dim rides broadcast
    # the self-join of fact vs per-part aggregate is a real join on
    # l_partkey (SortMerge or ShuffledHash, AQE's pick) feeding from a
    # partial aggregate
    assert "partial_sum" in plan or "partial_count" in plan
    # the per-part aggregate exists as a HashAggregate keyed on
    # l_partkey feeding the re-join (no correlated subquery rewrite)
    assert any(
        "keys=[l_partkey" in ln
        for ln in plan.splitlines()
        if "HashAggregate" in ln
    )


def test_customer_order_counts_preaggregates_orders(spark):
    """Q13 shape: orders are counted per custkey BEFORE the outer join
    (the join's build side is the compact count table, never raw
    orders x customer), the date cut reaches the orders parquet scan,
    and the join preserves zero-order customers (outer join present)."""
    from time_series_storage_spark.queries_extensions import (
        q_customer_order_counts,
    )

    plan = _plan(q_customer_order_counts(spark, "/root/testdata/sf0.001"))
    assert "LessThan(o_orderdate" in plan  # pushed to the scan
    assert "Outer" in plan or "LeftOuter" in plan
    # count-per-custkey aggregation happens below the outer join:
    # the first HashAggregate in the tree is the histogram (c_count),
    # fed by the join; o_custkey aggregation exists too
    assert "partial_count" in plan
    assert "o_custkey" in plan


def test_top_revenue_supplier_scalar_max_no_global_window(spark):
    """Q15 shape: the argmax compares against a broadcast one-row
    scalar (BroadcastNestedLoopJoin/cross of the max aggregate), never
    a single-partition global window; the date range reaches the fact
    scan; supplier dim is broadcast."""
    from time_series_storage_spark.queries_extensions import (
        q_top_revenue_supplier,
    )

    plan = _plan(q_top_revenue_supplier(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan  # the single-task rank()=1 anti-plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "partial_max" in plan or "max(total_rev_cents" in plan


def test_bulk_part_suppliers_semi_join_chain(spark):
    """Q20 shape: both semi-joins are broadcast LeftSemi (part filter
    prunes the fact BEFORE aggregation; the heavy-supplier list prunes
    the supplier dim), the name filter is pushed to the part scan, and
    the HAVING runs on a partial-aggregated (supp, part) table."""
    from time_series_storage_spark.queries_extensions import (
        q_bulk_part_suppliers,
    )

    plan = _plan(q_bulk_part_suppliers(spark, "/root/testdata/sf0.001"))
    assert plan.count("LeftSemi") >= 2
    assert "Contains(p_name" in plan or "widget" in plan
    assert "partial_sum" in plan
    # the fact semi-join against part happens below the aggregation:
    # no supplier column appears in any aggregate
    agg_lines = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert agg_lines and all("s_name" not in ln for ln in agg_lines)


def test_part_supplier_variety_anti_join_before_distinct(spark):
    """Q16 shape: the exclusion list broadcasts into a LeftAnti join
    BELOW the distinct aggregation (fact rows never carry excluded
    suppliers into the countDistinct), the part size filter is pushed
    to the part scan, and the distinct runs partial-aggregated."""
    from time_series_storage_spark.queries_extensions import (
        q_part_supplier_variety,
    )

    plan = _plan(q_part_supplier_variety(spark, "/root/testdata/sf0.001"))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "LessThanOrEqual(p_size" in plan
    assert "partial_count(distinct" in plan or "partial_count" in plan
    # no SortMergeJoin anywhere: both dims broadcast
    assert "SortMergeJoin" not in plan


def test_forecast_revenue_delta_all_filters_pushed(spark):
    """Q6 shape: the whole query is one parquet scan + one-row
    aggregate. ALL THREE predicates (ship date range, discount band,
    quantity cap) must reach PushedFilters, the aggregate must be
    partial (map-side combine before the single-row exchange), and
    there is no join operator of any kind."""
    from time_series_storage_spark.queries_extensions import (
        q_forecast_revenue_delta,
    )

    # the default 100-char metadata render truncates the filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = _plan(
            q_forecast_revenue_delta(spark, "/root/testdata/sf0.001")
        )
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    pushed = plan.split("PushedFilters")[1][:700]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed
    assert "GreaterThanOrEqual(l_discount" in pushed
    assert "LessThanOrEqual(l_discount" in pushed
    assert "LessThan(l_quantity" in pushed
    assert "partial_sum" in plan or "partial_count" in plan
    assert "Join" not in plan


def test_nation_market_share_one_fact_exchange_case_share(spark):
    """Q8 shape: numerator and denominator ride ONE aggregation (a
    CASE inside the same HashAggregate — never two scans or a
    self-join), lineitem|><|orders is the only non-broadcast join,
    the region chain prunes via broadcast, and the order-date range
    is pushed to the orders scan."""
    from time_series_storage_spark.queries_extensions import (
        q_nation_market_share,
    )

    plan = _plan(q_nation_market_share(spark, "/root/testdata/sf0.001"))
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # numerator CASE and denominator sum in the same aggregate node
    agg_lines = [ln for ln in plan.splitlines() if "partial_sum" in ln]
    assert agg_lines and any("CASE WHEN" in ln for ln in agg_lines)
    # exactly one shuffled join (the fact-fact orderkey join) at most
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_product_profit_part_filter_prunes_fact_first(spark):
    """Q9 shape: the LIKE-filtered part dim broadcasts and joins the
    fact BELOW the orders join (pruning lineitem before the big
    exchange), the name filter reaches the part scan, supplier/nation
    broadcast, and the profit measure partial-aggregates on
    (nation, year)."""
    from time_series_storage_spark.queries_extensions import (
        q_product_profit,
    )

    plan = _plan(q_product_profit(spark, "/root/testdata/sf0.001"))
    assert "Contains(p_name" in plan or "widget" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "partial_sum" in plan
    # part join must appear deeper in the tree than the orders join:
    # the broadcast part probe feeds the orderkey join's left side
    okj = plan.find("o_orderkey")
    pkj = plan.find("p_partkey")
    assert pkj > -1 and okj > -1 and pkj > okj


def test_important_stock_semi_prune_scalar_threshold(spark):
    """Q11 shape: the national supplier list prunes the fact via a
    broadcast LeftSemi BEFORE the partkey aggregation, the global
    total re-aggregates the per-part table (second HashAggregate, no
    second fact scan), and the threshold compare is a broadcast
    one-row cross join (never a float fraction, never a window)."""
    from time_series_storage_spark.queries_extensions import (
        q_important_stock,
    )

    plan = _plan(q_important_stock(spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan
    assert "partial_sum" in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
    # single scan of lineitem: the fact file path appears once
    assert plan.count("lineitem.parquet") <= 2  # scan + possible reuse


def test_late_shipment_priority_single_join_conditional_agg(spark):
    """Q12 shape: one fact-fact join keyed on orderkey, the delay
    predicate evaluates AFTER the join (it needs both dates), and both
    CASE counts ride the SAME partial aggregation (one HashAggregate
    pair, bucket-sized output)."""
    from time_series_storage_spark.queries_extensions import (
        q_late_shipment_priority,
    )

    plan = _plan(q_late_shipment_priority(spark, "/root/testdata/sf0.001"))
    n_joins = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert n_joins == 1
    assert "partial_sum" in plan
    # both conditional counts in one aggregate node
    agg_lines = [ln for ln in plan.splitlines() if "partial_sum" in ln]
    assert any(ln.count("CASE WHEN") >= 2 for ln in agg_lines)


def test_semantic_dedup_broadcast_assign_cell_blocked_pairs(spark):
    """SemDeDup: centroid assignment is a broadcast join (centroids
    are a driver-side artifact), the pair search is an equi-join keyed
    on cell_id (never a cross join over the corpus), and the dominated
    set feeds back through a join — no iterative operator."""
    from time_series_storage_spark.queries_extensions import (
        q_semantic_dedup,
    )

    plan = _plan(q_semantic_dedup(spark, "/root/testdata/sf0.001"))
    # centroid scoring is a broadcast cross (tiny build side), never a
    # shuffled cartesian product over the corpus
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the pair search is an equi-join KEYED on cell_id (either shuffle
    # strategy is fine; what matters is it's never all-pairs)
    assert any(
        "cell_id" in ln[:120]
        for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
        or "BroadcastHashJoin" in ln
    )


def test_chunk_dedup_three_shuffles_no_struct_argmin(spark):
    """Chunk dedup: chunking is shuffle-free projection; the plan has
    exactly the three key exchanges (min per chunk text, verdict join,
    per-doc reassembly) and the first-occurrence min is over a LONG
    composite key (partial_min on a bigint), not a struct arg-min."""
    from time_series_storage_spark.queries_extensions import (
        q_chunk_dedup_docs,
    )

    plan = _plan(q_chunk_dedup_docs(spark, "/root/testdata/sf0.001"))
    assert "partial_min" in plan
    n_exchanges = sum(
        1 for seg in plan.split("Exchange")[1:]
        if "hashpartitioning" in seg[:120]
    )
    assert n_exchanges <= 4  # min-agg pair + join + reassembly agg
    assert "Window" not in plan  # no global window anywhere


def test_lm_likelihood_model_joins_partial_aggregated(spark):
    """LM scoring: bigram and unigram counts partial-aggregate before
    their joins, the vocab scalar rides a broadcast, and no Python
    UDF appears anywhere (pure codegen + joins)."""
    from time_series_storage_spark.queries_extensions import (
        q_lm_doc_likelihood,
    )

    plan = _plan(q_lm_doc_likelihood(spark, "/root/testdata/sf0.001"))
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_score_incremental_pushed_keyed_joins_no_python(spark):
    """Incremental LM scoring: the increment predicate reaches the
    parquet scan, the model joins are keyed LeftOuter (never a
    nested-loop except the single-row vocab scalar's cross), the
    per-doc aggregation partial-aggregates before its exchange, and
    no Python evaluator appears (pure codegen + joins)."""
    from time_series_storage_spark.queries_extensions import (
        q_lm_score_incremental,
    )

    plan = _plan(q_lm_score_incremental(spark, "/root/testdata/sf0.001"))
    pushed = plan.split("PushedFilters")[1][:200]
    assert "GreaterThanOrEqual(doc_id" in pushed
    assert "partial_count" in plan
    # exactly one nested-loop: the broadcast single-row vocab scalar
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_video_near_dup_one_decode_pass_banded_join(spark):
    """Video near-dup: exactly ONE Arrow evaluator — since r13 the
    fused decode + sample + hash + per-clip majority pass (the vote is
    row-local, so NO aggregate exchange remains between the Python
    pass and the band index), the pair search is an equi-join on
    (band, key) — never a nested-loop — and verify is a projection."""
    from time_series_storage_spark.queries_extensions import (
        q_video_near_dup,
    )

    plan = _plan(q_video_near_dup(spark, "/root/testdata/sf0.001"))
    # the fused decode+hash+majority pass is checkpointed by the pair
    # search, so the final plan starts from a bare (id, sig) RDD scan
    # — NO Python evaluator and NO majority aggregate may remain
    # between it and the band equi-join
    assert "Scan ExistingRDD[id" in plan
    assert "_o62" not in plan  # the composed path's 63-col aggregate
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_pipeline_incremental_curation_probe_shapes(spark):
    """Two-store daily curation: increment predicate pushed to every
    documents scan, the fingerprint probe is a LeftAnti join (never a
    rescan-and-filter), the LM gate reduces to a LeftSemi on doc_id,
    and no Python evaluator appears."""
    from time_series_storage_spark.queries_extensions import (
        q_pipeline_incremental_curation,
    )

    plan = _plan(
        q_pipeline_incremental_curation(spark, "/root/testdata/sf0.001")
    )
    assert "GreaterThanOrEqual(doc_id" in plan
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # vocab scalar
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_embed_hashing_two_partial_aggs_no_python(spark):
    """Feature-hashing embeddings: exactly the two partial-aggregated
    exchanges ((doc, component) sum + per-doc assembly) — no Python
    evaluator, no join, no window anywhere."""
    from time_series_storage_spark.queries_extensions import (
        q_doc_embed_hashing,
    )

    plan = _plan(q_doc_embed_hashing(spark, "/root/testdata/sf0.001"))
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan
    n_exchanges = sum(
        1 for seg in plan.split("Exchange")[1:]
        if "hashpartitioning" in seg[:120]
    )
    assert n_exchanges <= 2


def test_gopher_rules_plan_is_shuffle_free_projection(spark):
    """The Gopher rule gate claims its cost is the scan itself: the
    whole rule suite must compile to a projection with NO exchange
    and no Python evaluation."""
    from time_series_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "the quick brown fox")], ["doc_id", "text"]
    )
    plan = _plan(T.gopher_quality_rules(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_exact_substring_plan_single_eval_window_min_no_python(spark):
    """Exact substring dedup's first-occurrence pass is a window min
    over the hash partition (r13): the expensive window-fingerprint
    projection must appear ONCE in the plan — the old groupBy + join-
    back form evaluated it twice and broadcast a corpus-sized firsts
    aggregate — with zero Python and no cartesian anywhere."""
    from time_series_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], ["doc_id", "text"]
    )
    plan = _plan(T.exact_substring_dedup(docs, window_words=5))
    assert plan.count("Window") == 1
    # exactly THREE Generate nodes: the stride-1 window explode ONCE
    # (the duplicated-subtree shape — the wins explode appearing
    # twice — is the regression this pins against), plus the word
    # posexplode and the covered-position sequence explode
    assert plan.count("Generate") == 3, plan.count("Generate")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_models_are_broadcast(spark):
    """DSIR scoring joins every doc term against the two bucket-count
    models: both joins must be broadcast (the models are <= buckets
    rows however large the corpus) — a shuffled join here would be
    the 100-TB bottleneck."""
    from time_series_storage_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a b c d", True), (2, "c d e f", False)],
        ["doc_id", "text", "_is_target"],
    )
    plan = _plan(T.dsir_importance(docs))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


# -- round-10 operator pins ----------------------------------------------------

def test_mips_two_bounded_scalar_nljs_no_corpus_shuffle(spark):
    """MIPS top-k: the max-norm scalar and the query set ride as the
    only two (bounded) broadcast NLJs; the corpus is never sort-merge
    joined or reshuffled — the one hash exchange is the per-query
    top-k window."""
    from time_series_storage_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(S.mips_topk(df.where("vec_id < 2"), df, k=2))
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_pagerank_checkpoint_truncates_round_lineage(spark):
    """Iterative PageRank must not grow the plan with the round count:
    localCheckpoint truncates each round, so the FINAL plan contains
    one round's join+aggregate regardless of n_iter (round N never
    replays rounds 1..N-1)."""
    from time_series_storage_spark.operators.dedup import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "d1 long, d2 long")
    p1 = _plan(pagerank(pairs, nodes, "doc_id", n_iter=1))
    p4 = _plan(pagerank(pairs, nodes, "doc_id", n_iter=4))
    assert p4.count("Join") <= p1.count("Join")
    assert "BatchEvalPython" not in p4


def test_range_search_broadcast_probe_no_corpus_exchange(spark):
    """Multi-probe range search: the exploded probe set broadcasts
    onto the bucket-keyed corpus scan — no sort-merge join and no
    hash exchange of the corpus anywhere (the plan is scan + one
    broadcast hash join + filter)."""
    from time_series_storage_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, [0.1 * (i + j) for j in range(S.EMBED_DIM)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(
        S.lsh_range_search(df.where("vec_id < 2"), df, threshold_x1e6=0)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert not any(
        "hashpartitioning" in seg[:120]
        for seg in plan.split("Exchange")[1:]
    )


def test_temperature_mix_broadcast_alloc_two_phase_topk(spark):
    """Temperature sampling: the derived alloc table broadcast-joins
    onto the corpus (never sort-merge), the weight total rides as one
    bounded scalar NLJ, and the selection is the two-phase top-k (two
    rank windows, no single global sort per key)."""
    from time_series_storage_spark.operators.split import temperature_mix

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    plan = _plan(temperature_mix(df, "source", "doc_id", 10))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("Window") >= 2


def test_holt_linear_pure_codegen_one_exchange(spark):
    """Holt smoothing is one exchange (the per-series collect_list)
    and a codegen array fold: no Python evaluator, no join, exactly
    one hash exchange."""
    from time_series_storage_spark.operators.analytics import holt_linear

    df = spark.createDataFrame(
        [("a", i, i * 1000000) for i in range(6)],
        "k string, ep long, x long",
    )
    plan = _plan(holt_linear(df, ["k"], "ep", "x"))
    assert "BatchEvalPython" not in plan and "Join" not in plan
    n_exchanges = sum(
        1 for seg in plan.split("Exchange")[1:]
        if "hashpartitioning" in seg[:120]
    )
    assert n_exchanges == 1


def test_robust_stats_rank_windows_no_python(spark):
    """Robust stats: rank windows partitioned by the group key (never
    a global window), per-group medians ride back as a broadcast hash
    join, zero Python, no cartesian."""
    from time_series_storage_spark.operators.analytics import robust_stats

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", 10 + i) for i in range(12)],
        "doc_id long, source string, n_chars long",
    )
    plan = _plan(robust_stats(df, ["source"], "n_chars", "doc_id"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 2
    assert "BroadcastHashJoin" in plan


def test_holt_winters_pure_codegen_one_exchange(spark):
    """Holt-Winters seasonal smoothing keeps holt_linear's plan
    contract: one hash exchange (the per-series collect_list), a
    codegen array fold carrying the length-m seasonal ring, no
    Python evaluator, no join — for the smoother AND the forecast."""
    from time_series_storage_spark.operators.analytics import (
        holt_winters,
        holt_winters_forecast,
    )

    df = spark.createDataFrame(
        [("a", i, (i % 3) * 1000000) for i in range(9)],
        "k string, ep long, x long",
    )
    for out in (
        holt_winters(df, ["k"], "ep", "x", season=3),
        holt_winters_forecast(df, ["k"], "ep", "x", season=3, horizon=2),
    ):
        plan = _plan(out)
        assert "BatchEvalPython" not in plan and "Join" not in plan
        n_exchanges = sum(
            1 for seg in plan.split("Exchange")[1:]
            if "hashpartitioning" in seg[:120]
        )
        assert n_exchanges == 1


def test_rp_topk_single_bounded_nlj(spark):
    """JL two-stage ANN: the only non-equi join is the bounded
    broadcast of the (small) query side; candidate scoring and rerank
    stay JVM-side; two ranking windows."""
    import random as _r

    from time_series_storage_spark.operators.similarity import (
        EMBED_DIM, rp_topk,
    )

    _r.seed(1)
    df = spark.createDataFrame(
        [
            (i, [float(_r.uniform(-1, 1)) for _ in range(EMBED_DIM)])
            for i in range(12)
        ],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(
        rp_topk(df.where("vec_id < 2"), df, k=3, prefilter_k=6)
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("Window") >= 2


def test_kcore_final_plan_does_not_grow_with_rounds(spark):
    """The per-round localCheckpoints truncate lineage: the FINAL plan
    is one join over checkpointed tables regardless of round count —
    the PageRank discipline on subgraph iteration."""
    from time_series_storage_spark.operators.dedup import kcore_peel

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "d1 long, d2 long"
    )
    p2 = _plan(kcore_peel(pairs, nodes, "doc_id", k=2, n_rounds=2))
    p6 = _plan(kcore_peel(pairs, nodes, "doc_id", k=2, n_rounds=6))
    assert "BatchEvalPython" not in p6
    assert p2.count("Join") == p6.count("Join")


def test_hist_store_drift_plan(spark, tmp_path):
    """HistogramStore.drift: history probed via a broadcast semi join
    on the increment's keys, one full-outer bucket join, one key
    window — no Python, no cartesian."""
    from time_series_storage_spark.operators.hist_store import (
        HistogramStore,
    )

    store = HistogramStore(
        spark, str(tmp_path / "h"), bucket_width=8, n_buckets=8
    )
    df = spark.createDataFrame(
        [("a", 5), ("a", 20), ("b", 9)], "gk string, v long"
    )
    store.absorb(df, "gk", "v")
    plan = _plan(store.drift(df, "gk", "v"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
