"""operators/analytics.py under the gate: hypothesis property tests
against brute-force Python models (the same strategy test_properties.py
uses for the engine), edge-semantics pins (edge carry, floor-lerp,
observed flags), and physical-plan pins (one window exchange for
rolling_agg, broadcast grid for interpolate_fill).

The driver-level oracle rows are ts_rolling_3h / ts_interp_fill in
queries_testdata.py; these tests pin the semantics on adversarial
inputs the sf tables don't produce (negative values, duplicate
timestamps, single-observation series).
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from time_series_storage_spark.operators.analytics import (
    interpolate_fill,
    rate,
    rolling_agg,
)

BASE = dt.datetime(2024, 3, 1)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (seconds offset, quantized value, key) — duplicate timestamps allowed
# on purpose: the RANGE frame must include every row at the same epoch
rolling_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),
        st.integers(min_value=-50, max_value=50),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=40,
)


@given(events=rolling_events, window_s=st.sampled_from([1, 60, 900]))
@_slow
def test_rolling_matches_bruteforce(spark, events, window_s):
    rows = [
        (k, BASE + dt.timedelta(seconds=s), q) for s, q, k in events
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "q"])
    got = {
        (r["k"], r["ts"], r["q"], r["roll_sum"], r["roll_cnt"], r["roll_avg_q"])
        for r in rolling_agg(df, ["k"], window_s).collect()
    }
    want = set()
    for k, t, q in rows:
        frame = [
            q2 for k2, t2, q2 in rows
            if k2 == k and t - dt.timedelta(seconds=window_s - 1) <= t2 <= t
        ]
        s, c = sum(frame), len(frame)
        want.add((k, t, q, s, c, math.floor(s / c)))
    assert got == want


# per-key observations: bucket index -> value (distinct buckets)
interp_obs = st.dictionaries(
    st.integers(min_value=0, max_value=29),
    st.integers(min_value=-1000, max_value=1000),
    min_size=1,
    max_size=12,
)


def _interp_model(obs: dict[int, int], n: int) -> dict[int, tuple[int, bool]]:
    idx = sorted(obs)
    out = {}
    for i in range(n):
        if i in obs:
            out[i] = (obs[i], True)
            continue
        prevs = [j for j in idx if j < i]
        nexts = [j for j in idx if j > i]
        if not prevs:
            v = obs[nexts[0]]
        elif not nexts:
            v = obs[prevs[-1]]
        else:
            p, nx = prevs[-1], nexts[0]
            v = obs[p] + math.floor((obs[nx] - obs[p]) * (i - p) / (nx - p))
        out[i] = (v, False)
    return out


@given(obs_a=interp_obs, obs_b=interp_obs)
@_slow
def test_interpolate_matches_bruteforce(spark, obs_a, obs_b):
    n, step = 30, 60
    rows = [
        (k, BASE + dt.timedelta(seconds=i * step), q)
        for k, obs in (("a", obs_a), ("b", obs_b))
        for i, q in obs.items()
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "q"])
    out = interpolate_fill(
        df, ["k"], BASE, BASE + dt.timedelta(seconds=n * step), step
    )
    got = {
        (r["k"], r["ts"], r["value_q"], r["observed"])
        for r in out.collect()
    }
    want = set()
    for k, obs in (("a", obs_a), ("b", obs_b)):
        for i, (v, seen) in _interp_model(obs, n).items():
            want.add((k, BASE + dt.timedelta(seconds=i * step), v, seen))
    assert got == want


def test_interpolate_single_observation_carries_flat(spark):
    df = spark.createDataFrame(
        [("a", BASE + dt.timedelta(seconds=300), 7)], ["k", "ts", "q"]
    )
    out = interpolate_fill(
        df, ["k"], BASE, BASE + dt.timedelta(seconds=600), 60
    ).collect()
    assert len(out) == 10
    assert all(r["value_q"] == 7 for r in out)
    assert sum(r["observed"] for r in out) == 1


def test_interpolate_floor_lerp_negative_slope(spark):
    # 10 -> 3 over 3 buckets: lerp deltas -7/3, -14/3 floor to
    # 10-3=7 and 10-5=5 (floor toward -inf, not truncation)
    df = spark.createDataFrame(
        [("a", BASE, 10), ("a", BASE + dt.timedelta(seconds=180), 3)],
        ["k", "ts", "q"],
    )
    out = {
        r["ts"]: r["value_q"]
        for r in interpolate_fill(
            df, ["k"], BASE, BASE + dt.timedelta(seconds=240), 60
        ).collect()
    }
    assert out[BASE + dt.timedelta(seconds=60)] == 7
    assert out[BASE + dt.timedelta(seconds=120)] == 5


@given(events=rolling_events)
@_slow
def test_rate_matches_bruteforce(spark, events):
    # dedupe (key, ts): rate over duplicate timestamps divides by zero
    # elapsed time — the model and operator must agree on unique epochs
    uniq = {}
    for s, q, k in events:
        uniq[(k, s)] = q
    rows = [
        (k, BASE + dt.timedelta(seconds=s), q)
        for (k, s), q in uniq.items()
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "q"])
    got = {
        (r["k"], r["ts"], r["q"], r["delta_q"], r["delta_s"], r["rate_q"])
        for r in rate(df, ["k"]).collect()
    }
    want = set()
    by_key: dict[str, list] = {}
    for k, t, q in sorted(rows, key=lambda r: (r[0], r[1])):
        by_key.setdefault(k, []).append((t, q))
    for k, seq in by_key.items():
        for i, (t, q) in enumerate(seq):
            if i == 0:
                want.add((k, t, q, None, None, None))
            else:
                pt, pq = seq[i - 1]
                ds = int((t - pt).total_seconds())
                dq = q - pq
                want.add((k, t, q, dq, ds, math.floor(dq * 1000 / ds)))
    assert got == want


def test_rate_first_row_and_negative_slope(spark):
    rows = [
        ("a", BASE, 100),
        ("a", BASE + dt.timedelta(seconds=900), 55),  # -45 over 900s
        ("a", BASE + dt.timedelta(seconds=2700), 55),  # flat over 1800s
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "q"])
    out = {r["ts"]: r for r in rate(df, ["k"]).collect()}
    first = out[BASE]
    assert (first["delta_q"], first["delta_s"], first["rate_q"]) == (
        None, None, None,
    )
    neg = out[BASE + dt.timedelta(seconds=900)]
    # floor(-45 * 1000 / 900) = -50 exactly
    assert (neg["delta_q"], neg["delta_s"], neg["rate_q"]) == (-45, 900, -50)
    flat = out[BASE + dt.timedelta(seconds=2700)]
    assert (flat["delta_q"], flat["delta_s"], flat["rate_q"]) == (0, 1800, 0)


def test_rate_duplicate_ts_deterministic_and_null_rate(spark):
    """Duplicate-timestamp contract: equal (dims, ts) rows lag in q
    order (deterministic on every run), delta_s = 0 is emitted, and
    rate_q is explicitly NULL — never an engine-dependent division by
    zero."""
    rows = [
        ("a", BASE, 10),
        ("a", BASE + dt.timedelta(seconds=60), 30),
        ("a", BASE + dt.timedelta(seconds=60), 20),  # duplicate ts
        ("a", BASE + dt.timedelta(seconds=120), 40),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "q"]).repartition(4)
    got = sorted(
        (r["q"], r["delta_q"], r["delta_s"], r["rate_q"])
        for r in rate(df, ["k"]).collect()
    )
    assert got == [
        (10, None, None, None),     # series head
        (20, 10, 60, 166),          # tiebreak: q=20 lags q=10
        (30, 10, 0, None),          # duplicate ts: 0 elapsed, NULL rate
        (40, 10, 60, 166),          # next bucket lags the LARGER dup
    ]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rolling_plan_one_window_exchange_no_join(spark):
    df = spark.createDataFrame([("a", BASE, 1)], ["k", "ts", "q"])
    plan = _plan(rolling_agg(df, ["k"], 3600))
    assert "Window" in plan
    assert "Join" not in plan
    segs = [
        s for s in plan.split("Exchange")[1:] if "hashpartitioning" in s[:200]
    ]
    assert len(segs) == 1  # the one exchange on the series dims


def test_rate_plan_one_window_exchange_no_join(spark):
    df = spark.createDataFrame([("a", BASE, 1)], ["k", "ts", "q"])
    plan = _plan(rate(df, ["k"]))
    assert "Window" in plan
    assert "Join" not in plan
    segs = [
        s for s in plan.split("Exchange")[1:] if "hashpartitioning" in s[:200]
    ]
    assert len(segs) == 1  # both lags share the one exchange + sort


def test_interpolate_plan_grid_is_broadcast(spark):
    df = spark.createDataFrame([("a", BASE, 1)], ["k", "ts", "q"])
    plan = _plan(
        interpolate_fill(df, ["k"], BASE, BASE + dt.timedelta(hours=1), 60)
    )
    # grid densification must never shuffle the grid side
    assert "BroadcastNestedLoopJoin" in plan
    # both carry directions run in window passes, not self-joins
    assert "Window" in plan
