"""Log2 rank-quantile sketch (operators/qsketch.py) +
QuantileSketchStore (operators/qsketch_store.py).

The driver-level oracle rows are qsk_event_percentiles /
qsk_week_rollup / qsk_incremental / qsk_as_of, whose SQL recomputes
the sketch from scratch; these tests pin what that oracle can't see:
the VALUE-ERROR GUARANTEE (every reported percentile lb satisfies
lb <= true quantile < lb + bucket width, and the relative error is
<= 2^-sub_bits in the log region — the property that makes this the
family's rank-quantile member), bucket/lower-bound exactness against
a bit-level Python model across octave boundaries, the additive merge
property (any split = one-shot, exactly), emission contract,
exactly-once batch replay, per-stage commit-crash replay, prune,
reopen/params pinning, time travel, and the streaming foreachBatch
twin.

Reference scope: the reference's only quantile surface is its
unimplemented histogram stub (SURVEY.md section 2.4).
"""

from __future__ import annotations

import json
import math
import os

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.qsketch import (
    QSK_SUB_BITS,
    qsk_bucket,
    qsk_counters,
    qsk_lower_bound,
    qsk_quantiles,
)
from time_series_storage_spark.operators.qsketch_store import (
    QuantileSketchStore,
)

S = QSK_SUB_BITS


def _mbucket(v: int, s: int = S) -> int:
    e = v.bit_length() - 1
    sh = max(e - s, 0)
    return sh * (1 << s) + (v >> sh)


def _mlb(b: int, s: int = S) -> int:
    sh = max(b // (1 << s) - 1, 0)
    return (b - sh * (1 << s)) << sh


def _model_quantiles(vals, qs=(50, 95, 99), s=S):
    """Reference: bucket the values, walk cumulative counts to
    ceil(q*n/100), report the bucket lower bound."""
    from collections import Counter

    cnt = Counter(_mbucket(v, s) for v in vals)
    n = len(vals)
    out = {}
    for q in qs:
        cum = 0
        for b in sorted(cnt):
            cum += cnt[b]
            if cum * 100 >= q * n:
                out[q] = _mlb(b, s)
                break
    return out


BOUNDARY_VALS = (
    list(range(1, 200))
    + [2**k + d for k in range(6, 53) for d in (-1, 0, 1)]
    + [2**53 - 1]
)


def test_bucket_and_lb_match_bit_model(spark):
    df = spark.createDataFrame([(v,) for v in BOUNDARY_VALS], "v long")
    rows = (
        df.select("v", qsk_bucket("v").alias("b"))
        .withColumn("lb", qsk_lower_bound("b"))
        .collect()
    )
    for r in rows:
        assert r.b == _mbucket(r.v), (r.v, r.b)
        assert r.lb == _mlb(r.b), (r.b, r.lb)
        sh = max(r.b // (1 << S) - 1, 0)
        assert r.lb <= r.v < r.lb + (1 << sh)


@given(
    st.lists(st.integers(min_value=1, max_value=2**53 - 1), min_size=1,
             max_size=60)
)
@settings(max_examples=30, deadline=None)
def test_quantile_value_error_guarantee(vals):
    """Pure-model property (no Spark in the loop for speed): the
    reported lb never exceeds the true quantile, and undershoots by
    less than its bucket width — i.e. relative error <= 2^-S once
    values leave the exact region."""
    n = len(vals)
    got = _model_quantiles(vals)
    for q, lb in got.items():
        true_q = sorted(vals)[math.ceil(q * n / 100) - 1]
        assert lb <= true_q
        sh = max(_mbucket(true_q) // (1 << S) - 1, 0)
        assert true_q - lb < (1 << sh)
        if true_q >= 1 << (S + 1):
            assert (true_q - lb) / true_q <= 2.0 ** -S


VALS = [7, 12, 100, 3_000, 65_000, 1_000_000] * 5 + list(range(1, 40))
ROWS = [("a", v) for v in VALS] + [("b", v * 3 + 1) for v in VALS[:30]]
SCHEMA = "k string, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_q(store):
    return {
        r.gk: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in store.quantiles().collect()
    }


def _want(rows):
    out = {}
    for key in {k for k, _ in rows}:
        vs = [v for k, v in rows if k == key]
        m = _model_quantiles(vs)
        out[key] = (len(vs), m[50], m[95], m[99])
    return out


def test_qsk_quantiles_in_plan_matches_model(spark):
    cnt = qsk_counters(_df(spark, ROWS), ["k"], "v")
    got = {
        r.k: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in qsk_quantiles(cnt, ["k"]).collect()
    }
    assert got == _want(ROWS)


def test_store_merge_equals_one_shot_any_split(spark, tmp_path):
    splits = [
        [ROWS[:17], ROWS[17:]],
        [ROWS[::2], ROWS[1::2]],
        [ROWS[:1], ROWS[1:50], ROWS[50:]],
    ]
    for n, parts in enumerate(splits):
        store = QuantileSketchStore(spark, str(tmp_path / f"m{n}"))
        for p in parts:
            store.absorb(_df(spark, p), "k", "v")
        assert _read_q(store) == _want(ROWS), f"split {n}"


def test_store_emission_and_exactly_once_replay(spark, tmp_path):
    store = QuantileSketchStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, ROWS[:40]), "k", "v", batch_id=0)
    out = store.absorb(_df(spark, ROWS[40:]), "k", "v", batch_id=1)
    got = {
        r.k: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in out.collect()
    }
    assert got == _want(ROWS)
    n_files = len(os.listdir(store._current_dir()))
    replay = store.absorb(_df(spark, ROWS[40:]), "k", "v", batch_id=1)
    assert {
        r.k: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in replay.collect()
    } == got
    assert len(os.listdir(store._current_dir())) == n_files
    assert store.absorb(
        _df(spark, ROWS[:5]), "k", "v", batch_id=0
    ).count() == 0


@pytest.mark.parametrize("stage", ["post_write", "post_publish"])
def test_store_commit_crash_replay(spark, tmp_path, stage):
    store = QuantileSketchStore(spark, str(tmp_path / "c"))
    store.absorb(_df(spark, ROWS[:40]), "k", "v", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, ROWS[40:]), "k", "v", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read_q(store) == _want(ROWS[:40])
    store.absorb(_df(spark, ROWS[40:]), "k", "v", batch_id=1)
    assert _read_q(store) == _want(ROWS)


def test_store_prune_time_travel_reopen(spark, tmp_path):
    store = QuantileSketchStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, ROWS[:40]), "k", "v")
    v0 = store.snapshot_versions()[0]
    store.absorb(_df(spark, ROWS[40:]), "k", "v")
    store.prune()
    assert _read_q(store) == _want(ROWS)
    raw = store._table("qb", "gk string, b int, c long")
    assert raw.groupBy("gk", "b").count().where("count > 1").count() == 0
    # prune keeps the as-of read for RETAINED versions or raises
    # loudly; head-state correctness is the contract pinned here
    asof = {
        r.gk: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in store.quantiles_as_of(
            store.snapshot_versions()[0]
        ).collect()
    } if store.snapshot_versions() else {}
    assert asof  # some version always remains readable
    with pytest.raises(ValueError, match="params"):
        QuantileSketchStore(spark, str(tmp_path / "r"), sub_bits=6)
    with pytest.raises(ValueError):
        QuantileSketchStore(spark, str(tmp_path / "x"), sub_bits=0)
    assert v0 is not None


def test_store_time_travel_pre_prune(spark, tmp_path):
    store = QuantileSketchStore(spark, str(tmp_path / "t"))
    store.absorb(_df(spark, ROWS[:40]), "k", "v")
    v0 = store.snapshot_versions()[0]
    store.absorb(_df(spark, ROWS[40:]), "k", "v")
    asof = {
        r.gk: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
        for r in store.quantiles_as_of(v0).collect()
    }
    assert asof == _want(ROWS[:40])


def test_store_foreach_batch_streaming(spark, tmp_path):
    store = QuantileSketchStore(spark, str(tmp_path / "s"))
    seen: list = []
    fn = store.foreach_batch(
        "k", "v", lambda df, bid: seen.append((bid, df.count()))
    )
    fn(_df(spark, ROWS[:40]), 0)
    fn(_df(spark, ROWS[40:]), 1)
    fn(_df(spark, ROWS[40:]), 1)  # replayed micro-batch
    assert [b for b, _ in seen] == [0, 1, 1]
    assert seen[1] == seen[2]
    assert _read_q(store) == _want(ROWS)


def test_store_rejects_values_below_one(spark, tmp_path):
    """r11 review finding: a value < 1 has no bucket (and negatives
    render differently in Spark's conv vs DuckDB's printf), so the
    absorb must fail LOUDLY instead of poisoning persisted state."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    store = QuantileSketchStore(spark, str(tmp_path / "g"))
    bad = spark.createDataFrame([("a", 5), ("a", 0)], SCHEMA)
    with pytest.raises(
        (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException, Exception),
        match=r"must be in \[1, 2\^53\)",
    ):
        store.absorb(bad, "k", "v")
    # nothing committed
    assert store.quantiles().count() == 0


def test_store_rejects_values_at_or_above_2_53(spark, tmp_path):
    """r11 ADVICE: the lower-bound guard's twin. qsk_bucket's
    floor(v / 2^sh) rides IEEE doubles, exact only below 2^53 — an
    epoch-nanos-sized long would bucket differently in Spark (double
    division) than in the DuckDB oracle (exact integer division),
    committing state the oracle can never reproduce. The absorb must
    fail loudly at the documented exactness ceiling instead."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    store = QuantileSketchStore(spark, str(tmp_path / "g53"))
    bad = spark.createDataFrame([("a", 5), ("a", 1 << 53)], SCHEMA)
    with pytest.raises(
        (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException, Exception),
        match=r"must be in \[1, 2\^53\)",
    ):
        store.absorb(bad, "k", "v")
    assert store.quantiles().count() == 0
    # the boundary itself: 2^53 - 1 is the largest exact value and
    # must still absorb cleanly
    ok = spark.createDataFrame([("a", (1 << 53) - 1)], SCHEMA)
    store.absorb(ok, "k", "v")
    assert store.quantiles().count() > 0


def test_store_weighted_absorb_equals_expanded_rows(spark, tmp_path):
    """Weighted absorb (weight_col) must equal absorbing each row
    weight-many times — the replication semantics — and weighted +
    unweighted absorbs compose (both are plain additive counts)."""
    wrows = [("a", 7, 3), ("a", 100, 2), ("b", 12, 5)]
    expanded = [(k, v) for k, v, w in wrows for _ in range(w)]
    wdf = spark.createDataFrame(wrows, "k string, v long, w long")
    a = QuantileSketchStore(spark, str(tmp_path / "w"))
    a.absorb(wdf, "k", "v", weight_col="w")
    b = QuantileSketchStore(spark, str(tmp_path / "e"))
    b.absorb(spark.createDataFrame(expanded, SCHEMA), "k", "v")
    assert _read_q(a) == _read_q(b)
    # compose an unweighted increment on top of the weighted store
    extra = [("a", 5), ("b", 12)]
    a.absorb(spark.createDataFrame(extra, SCHEMA), "k", "v")
    b.absorb(spark.createDataFrame(extra, SCHEMA), "k", "v")
    assert _read_q(a) == _read_q(b)


def test_store_weighted_absorb_rejects_bad_weights(spark, tmp_path):
    """r11 review finding: a negative or NULL weight would commit a
    negative/short bucket count into irreparable additive state — the
    absorb must fail loudly; zero weights are legal no-ops that never
    persist as c=0 rows."""
    store = QuantileSketchStore(spark, str(tmp_path / "w"))
    bad = spark.createDataFrame(
        [("a", 5, 2), ("a", 7, -1)], "k string, v long, w long"
    )
    with pytest.raises(Exception, match="weights must be >= 0"):
        store.absorb(bad, "k", "v", weight_col="w")
    assert store.quantiles().count() == 0
    nul = spark.createDataFrame(
        [("a", 5, None)], "k string, v long, w long"
    )
    with pytest.raises(Exception, match="weights must be >= 0"):
        store.absorb(nul, "k", "v", weight_col="w")
    # zero weights: no-op rows, no c=0 state
    zw = spark.createDataFrame(
        [("a", 5, 0), ("a", 9, 3)], "k string, v long, w long"
    )
    store.absorb(zw, "k", "v", weight_col="w")
    rows = store._table("qb", "gk string, b int, c long").collect()
    assert all(r.c > 0 for r in rows) and len(rows) == 1
