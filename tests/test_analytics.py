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


# -- m4_downsample / ewma_trunc / gap_detect ---------------------------------

m4_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7200),  # seconds offset
        st.integers(min_value=-50, max_value=50),  # quantized value
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=40,
)


def _mk_series(spark, events):
    rows = [
        (i, k, BASE + dt.timedelta(seconds=off), q)
        for i, (off, q, k) in enumerate(events)
    ]
    return rows, spark.createDataFrame(rows, ["id", "k", "ts", "q"])


@given(events=m4_events, bucket_s=st.sampled_from([60, 900]))
@_slow
def test_m4_matches_bruteforce(spark, events, bucket_s):
    from time_series_storage_spark.operators.analytics import m4_downsample

    rows, df = _mk_series(spark, events)
    got = {
        (r["k"], r["bucket_ts"]): (
            r["n_obs"], r["min_q"], r["max_q"], r["first_q"], r["last_q"]
        )
        for r in m4_downsample(df, ["k"], bucket_s).collect()
    }
    buckets = {}
    for i, k, ts, q in rows:
        ep = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
        b = dt.datetime.fromtimestamp(ep // bucket_s * bucket_s)
        buckets.setdefault((k, b), []).append((ep * 2_147_483_648 + i, q))
    want = {}
    for key, obs in buckets.items():
        vals = [q for _, q in obs]
        want[key] = (
            len(obs),
            min(vals),
            max(vals),
            min(obs)[1],
            max(obs)[1],
        )
    assert got == want


@given(events=m4_events, n_lags=st.sampled_from([1, 3, 8]))
@_slow
def test_ewma_matches_bruteforce(spark, events, n_lags):
    from time_series_storage_spark.operators.analytics import ewma_trunc

    rows, df = _mk_series(spark, events)
    got = {
        r["id"]: r["ewma_q"]
        for r in ewma_trunc(
            df, ["k"], q_col="q", n_lags=n_lags, order_col="id"
        ).collect()
    }
    by_key = {}
    for i, k, ts, q in rows:
        by_key.setdefault(k, []).append((ts, i, q))
    want = {}
    for seq in by_key.values():
        seq.sort()
        for pos, (_, i, _) in enumerate(seq):
            num = den = 0
            for j in range(min(n_lags, pos + 1)):
                w = 1 << (n_lags - 1 - j)
                num += seq[pos - j][2] * w
                den += w
            want[i] = num // den
    assert got == want


@given(events=m4_events, threshold=st.sampled_from([1, 600]))
@_slow
def test_gap_detect_matches_bruteforce(spark, events, threshold):
    from time_series_storage_spark.operators.analytics import gap_detect

    rows, df = _mk_series(spark, events)
    got = sorted(
        (r["k"], r["gap_start"], r["gap_end"], r["gap_s"])
        for r in gap_detect(df, ["k"], threshold, order_col="id").collect()
    )
    by_key = {}
    for i, k, ts, q in rows:
        ep = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
        by_key.setdefault(k, []).append((ep, i, ts))
    want = []
    for k, seq in by_key.items():
        seq.sort()
        for (pep, _, pts), (ep, _, ts) in zip(seq, seq[1:]):
            if ep - pep > threshold:
                want.append((k, pts, ts, ep - pep))
    assert got == sorted(want)


def test_m4_plan_single_partial_aggregate_no_window(spark):
    """m4_downsample: ONE hash-aggregate pair (partial map-side combine
    before the exchange), no window, no sort, no join — the shuffle
    carries the downsampled volume only."""
    from time_series_storage_spark.operators.analytics import m4_downsample

    df = spark.createDataFrame([(1, "a", BASE, 1)], ["id", "k", "ts", "q"])
    plan = _plan(m4_downsample(df, ["k"], 3600, id_col="id"))
    assert plan.count("Exchange") == 1
    assert "partial" in plan  # map-side combine present
    assert "Window" not in plan
    assert "Join" not in plan


def test_ewma_plan_one_window_exchange(spark):
    """ewma_trunc: all K lags share ONE Window operator — one exchange,
    one sort, no join, no densification."""
    from time_series_storage_spark.operators.analytics import ewma_trunc

    df = spark.createDataFrame([(1, "a", BASE, 1)], ["id", "k", "ts", "q"])
    plan = _plan(ewma_trunc(df, ["k"], order_col="id"))
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_gap_detect_plan_one_window_exchange(spark):
    from time_series_storage_spark.operators.analytics import gap_detect

    df = spark.createDataFrame([(1, "a", BASE, 1)], ["id", "k", "ts", "q"])
    plan = _plan(gap_detect(df, ["k"], 60, order_col="id"))
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_trend_slope_matches_numpy_fit(spark):
    """trend_slope's exact integer (num, den) must equal the closed-
    form OLS slope over the bucket means — checked against a float
    fit on crafted data with a known slope, plus the single-bucket
    den=0 contract."""
    rows = []
    # series 'up': bucket means exactly 100, 200, ..., 1000 (slope 100)
    for t in range(10):
        rows += [("up", dt.datetime(2024, 1, 1, t), 100 * (t + 1))] * 3
    # series 'flat': constant 500 (slope 0)
    for t in range(6):
        rows.append(("flat", dt.datetime(2024, 1, 1, t), 500))
    # series 'solo': a single bucket -> den 0, slope undefined
    rows.append(("solo", dt.datetime(2024, 1, 1, 0), 123))
    df = spark.createDataFrame(rows, ["k", "ts", "q"])
    from time_series_storage_spark.operators.analytics import trend_slope

    out = {
        r["k"]: (r["n_buckets"], r["slope_num"], r["slope_den"])
        for r in trend_slope(df, ["k"], 3600).collect()
    }
    n, num, den = out["up"]
    assert n == 10 and den > 0
    assert num / den == 100.0  # exact: means are exact multiples
    n, num, den = out["flat"]
    assert n == 6 and num == 0 and den > 0
    assert out["solo"] == (1, 0, 0)
