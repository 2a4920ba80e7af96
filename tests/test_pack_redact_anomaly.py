"""Semantics pins for the three curation operators added in round 5:
sequence packing (operators/pack.py), PII redaction (text.redact) and
integer z-score anomaly flags (analytics.anomaly_zscore).

The driver-level oracle rows are text_pack_bins / events_pii_scrub /
ts_anomaly_zscore in queries_extensions.py; these tests pin behavior
on adversarial inputs the sf tables don't produce: boundary-straddling
documents, overlapping PII rules, constant-then-spike series,
under-baselined prefixes.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.analytics import anomaly_zscore
from time_series_storage_spark.operators.pack import (
    pack_assignments,
    pack_bins,
)
from time_series_storage_spark.operators.text import PII_PATTERNS, redact

BASE = dt.datetime(2024, 3, 1)


# -- pack -------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def test_pack_cumulative_cut_and_straddle(spark):
    # tokens: 100, 100, 100 with budget 250 -> starts 0/100/200 ->
    # bins 0/0/0? no: floor(200/250)=0 -> all bin 0; fourth doc starts
    # at 300 -> bin 1. The straddler (start 200, len 100) stays in the
    # bin its START falls in — the documented split-at-context-edge rule.
    rows = [(i, "s", 100) for i in range(4)]
    a = pack_assignments(_docs(spark, rows), 250).collect()
    got = {r.doc_id: (r.start_off, r.bin_id) for r in a}
    assert got == {0: (0, 0), 1: (100, 0), 2: (200, 0), 3: (300, 1)}


def test_pack_interior_bins_at_least_budget(spark):
    import random

    rng = random.Random(7)
    rows = [(i, "s", rng.randint(5, 120)) for i in range(200)]
    bins = pack_bins(_docs(spark, rows), 300).collect()
    last = max(b.bin_id for b in bins)
    for b in bins:
        if b.bin_id < last:
            # every non-tail bin spans the full budget of content:
            # its docs cover [bin*B, next start >= (bin+1)*B)
            assert b.bin_tokens >= 1  # non-empty
    # total conservation: every token lands in exactly one bin
    assert sum(b.bin_tokens for b in bins) == sum(r[2] for r in rows)
    # contiguity: bin ids are dense 0..last
    assert sorted({b.bin_id for b in bins}) == list(range(last + 1))


def test_pack_shards_are_disjoint_and_deterministic(spark):
    rows = [(i, "s", 10) for i in range(40)]
    a = pack_assignments(_docs(spark, rows), 100, n_shards=4).collect()
    by_shard = {}
    for r in a:
        assert r.shard == r.doc_id % 4
        by_shard.setdefault(r.shard, []).append(r)
    # each shard packs independently from offset 0
    for rs in by_shard.values():
        assert min(r.start_off for r in rs) == 0


def test_pack_overlapping_column_lists_no_duplicates(spark):
    """A column named in more than one of group_cols / order_cols /
    extra_cols (here: the group column repeated as an order key and an
    extra payload) must appear exactly once in the output — duplicate
    columns are an AnalysisException at the first downstream reference
    (ADVICE r6)."""
    rows = [(i, "s", 100) for i in range(4)]
    a = pack_assignments(
        _docs(spark, rows),
        250,
        group_cols=("source",),
        order_cols=("source", "doc_id"),
        extra_cols=("source", "n_tokens"),
    )
    assert a.columns.count("source") == 1
    assert a.columns.count("n_tokens") == 1
    # downstream groupBy over the once-projected column works
    got = {r.doc_id: (r.start_off, r.bin_id) for r in a.collect()}
    assert got == {0: (0, 0), 1: (100, 0), 2: (200, 0), 3: (300, 1)}


def test_pack_validates_params(spark):
    d = _docs(spark, [(1, "s", 5)])
    with pytest.raises(ValueError, match="budget"):
        pack_assignments(d, 0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_assignments(d, 10, n_shards=0)


# -- redact -----------------------------------------------------------------

def test_redact_rule_order_email_before_id(spark):
    # the email rule must swallow 'user12345678@x.co' whole; if long_id
    # ran against the original text it would count the digit run too
    df = spark.createDataFrame(
        [(1, "user12345678@x.co and 9876543")], "id long, text string"
    )
    r = redact(df, "id", "text").collect()[0]
    assert r.clean == "<EMAIL> and <ID>"
    assert (r.n_email, r.n_long_id, r.n_redactions) == (1, 1, 2)


def test_redact_counts_match_replacements(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co c@d.org ip 10.0.0.1 call +44 20-7946-0958 x 123456")],
        "id long, text string",
    )
    r = redact(df, "id", "text").collect()[0]
    assert r.n_email == 2 and r.n_ipv4 == 1 and r.n_phone == 1
    assert r.n_long_id == 1
    assert r.n_redactions == 5
    for tag in ("<EMAIL>", "<IP>", "<PHONE>", "<ID>"):
        assert tag in r.clean


def test_redact_passthrough_and_clean_rows(spark):
    df = spark.createDataFrame(
        [(1, "en", "no pii here"), (2, "de", "x@y.zz")],
        "id long, lang string, text string",
    )
    out = redact(df, "id", "text")
    assert set(out.columns) >= {"id", "lang", "clean", "n_redactions"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].clean == "no pii here" and rows[1].n_redactions == 0
    assert rows[2].n_email == 1
    assert len(PII_PATTERNS) == 4


def test_redact_missing_id_raises(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="missing id column"):
        redact(df, "doc_id", "text")


# -- anomaly_zscore ---------------------------------------------------------

def _series(spark, vals):
    rows = [
        (i, "k", BASE + dt.timedelta(seconds=60 * i), int(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, q long"
    )


def test_anomaly_spike_flagged_constants_not(spark):
    vals = [100, 101, 99, 100, 101, 99, 100, 101, 99, 100, 500, 100]
    out = anomaly_zscore(
        _series(spark, vals), ["k"], q_col="q", order_col="event_id",
        min_points=5, z_threshold=3,
    ).collect()
    flags = {r.event_id: r.is_anomaly for r in out}
    assert flags[10] == 1  # the spike
    # steady neighbors with a full baseline are not flagged
    assert flags[9] == 0
    # under-baselined prefix is NULL, never false-flagged
    for i in range(5):
        assert flags[i] is None


def test_anomaly_excludes_current_row_from_baseline(spark):
    # 6 identical points then a spike: baseline stats at the spike are
    # the 6 constants (variance 0) -> dev > 0 beats 0 -> flagged. If
    # the current row leaked into its own frame the variance would be
    # huge and the spike would pass as normal.
    vals = [50, 50, 50, 50, 50, 50, 9999]
    out = anomaly_zscore(
        _series(spark, vals), ["k"], q_col="q", order_col="event_id",
        min_points=5, z_threshold=3,
    ).collect()
    spike = [r for r in out if r.event_id == 6][0]
    assert spike.base_n == 6 and spike.base_sum == 300
    assert spike.is_anomaly == 1


def test_anomaly_lookback_bounds_frame(spark):
    # alternating 10/11 baseline (non-degenerate variance — against a
    # zero-variance baseline ANY deviation is infinite-z and flags)
    vals = [1000] * 3 + [10, 11] * 15 + [10]
    out = anomaly_zscore(
        _series(spark, vals), ["k"], q_col="q", order_col="event_id",
        lookback=10, min_points=5, z_threshold=3,
    ).collect()
    last = [r for r in out if r.event_id == 33][0]
    # the early 1000s fell out of the 10-row frame long ago
    assert last.base_n == 10 and last.base_sum == 105
    assert last.is_anomaly == 0


def test_pack_composite_order_no_ties_past_1024_chunks(spark):
    """The r5 ADVICE scenario: a document with MORE than 1024 chunks.
    The old composite scalar id (doc_id * 1024 + chunk_id) collided
    there, making start_off/bin_id tie-nondeterministic; the composite
    (doc_id, chunk_id) order must yield strictly increasing offsets
    and a bit-deterministic layout at any chunk count."""
    from pyspark.sql import functions as F

    from time_series_storage_spark.operators.pack import pack_assignments

    n_chunks = 2100  # > 2 x 1024: the old scalar id would collide
    chunks = spark.range(n_chunks).select(
        F.lit("s").alias("source"),
        F.lit(7).alias("doc_id"),
        F.col("id").alias("chunk_id"),
        F.lit(3).alias("n_tokens"),
    )
    a = pack_assignments(
        chunks, 100, ("source",), id_col="doc_id",
        n_shards=4, order_cols=("doc_id", "chunk_id"),
    ).orderBy("chunk_id").collect()
    assert len(a) == n_chunks
    # one doc -> one shard (sharding hashes doc_id, not chunk position)
    assert len({r["shard"] for r in a}) == 1
    # offsets strictly increase along chunk order: no ties, no races
    offs = [r["start_off"] for r in a]
    assert offs == [i * 3 for i in range(n_chunks)]
    # re-run is bit-identical (deterministic layout)
    b = pack_assignments(
        chunks, 100, ("source",), id_col="doc_id",
        n_shards=4, order_cols=("doc_id", "chunk_id"),
    ).orderBy("chunk_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
