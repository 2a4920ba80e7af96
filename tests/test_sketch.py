"""operators/sketch.py (KMV distinct-count) under the gate: accuracy
bound, small-group exactness, partitioning invariance (the mergeability
property that makes the sketch a sketch), and parameter validation.

The driver-level oracle row is sketch_distinct_tokens in
queries_extensions.py (bit-exact vs DuckDB); these tests pin the
statistical and algebraic properties no equality check shows.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.sketch import (
    KMV_M,
    kmv_estimate,
    kmv_minima,
)


def _elems(spark, n_distinct, key="g", copies=3, parts=4):
    # each element appears `copies` times so the distinct stage matters
    df = spark.range(n_distinct * copies).select(
        F.lit(key).alias("k"),
        F.concat(F.lit("elem-"), (F.col("id") % n_distinct)).alias("e"),
    )
    return df.repartition(parts)


def test_kmv_exact_below_k(spark):
    out = kmv_estimate(_elems(spark, 40), ["k"], "e", k=64).collect()[0]
    assert out.n_mins == 40
    assert out.est_distinct == 40  # exact, not estimated


def test_kmv_estimate_within_bound(spark):
    # KMV relative error ~1/sqrt(k-2); allow 5 sigma
    n, k = 5000, 64
    out = kmv_estimate(_elems(spark, n), ["k"], "e", k=k).collect()[0]
    assert out.n_mins == k
    sigma = n / math.sqrt(k - 2)
    assert abs(out.est_distinct - n) < 5 * sigma
    assert 0 < out.kth_min < KMV_M


def test_kmv_partitioning_invariance(spark):
    # the estimate is a pure function of the data: any physical
    # layout gives the identical sketch (this IS mergeability — the
    # two-phase selection merges per-partition sketches)
    a = kmv_estimate(_elems(spark, 1000, parts=1), ["k"], "e").collect()[0]
    b = kmv_estimate(_elems(spark, 1000, parts=13), ["k"], "e").collect()[0]
    assert (a.kth_min, a.est_distinct) == (b.kth_min, b.est_distinct)


def test_kmv_minima_are_global_minima(spark):
    k = 16
    df = _elems(spark, 500)
    mins = sorted(
        r.h for r in kmv_minima(df, ["k"], "e", k=k).collect()
    )
    from time_series_storage_spark.operators.sketch import kmv_hash

    all_h = sorted(
        r.h
        for r in df.select(kmv_hash("e").alias("h")).distinct().collect()
    )
    assert mins == all_h[:k]


def test_kmv_multi_group_independent(spark):
    big = _elems(spark, 2000, key="big")
    small = _elems(spark, 10, key="small")
    out = {
        r.k: r
        for r in kmv_estimate(big.union(small), ["k"], "e").collect()
    }
    assert out["small"].est_distinct == 10
    assert out["big"].n_mins == 64 and out["big"].est_distinct > 1000


def test_kmv_k_validated(spark):
    with pytest.raises(ValueError, match="k must be"):
        kmv_minima(_elems(spark, 10), ["k"], "e", k=2)
    with pytest.raises(ValueError, match="k must be"):
        kmv_minima(_elems(spark, 10), ["k"], "e", k=256)


def test_histogram_quantiles_within_one_bucket_of_exact(spark):
    """The histogram-sketch quantile is within one bucket width of the
    exact nearest-rank percentile, clamps outliers into the edge
    buckets instead of failing, and counts rows exactly."""
    import random

    from time_series_storage_spark.operators.analytics import (
        grouped_percentiles,
    )
    from time_series_storage_spark.operators.sketch import (
        histogram_quantiles,
    )

    rng = random.Random(5)
    rows = [("g1", rng.randint(0, 200)) for _ in range(500)] + [
        ("g2", rng.randint(50, 120)) for _ in range(300)
    ] + [("g2", 10_000)]  # outlier: must clamp, not break
    df = spark.createDataFrame(rows, "k string, v long")
    lo, hi, nb = 0, 256, 64
    width = (hi - lo) // nb
    sk = {
        r["k"]: r
        for r in histogram_quantiles(
            df, ["k"], "v", lo, hi, nb, percents=(50, 90)
        ).collect()
    }
    ex = {
        r["k"]: r
        for r in grouped_percentiles(
            df, ["k"], "v", percents=(50, 90)
        ).collect()
    }
    truth_n = {"g1": 500, "g2": 301}
    for k in ("g1", "g2"):
        assert sk[k]["n_rows"] == truth_n[k]
        for p in (50, 90):
            exact = min(ex[k][f"p{p}"], hi - 1)  # sketch domain clamps
            assert abs(sk[k][f"q{p}"] - exact) <= width, (k, p)


def test_histogram_quantiles_rejects_uneven_domain(spark):
    import pytest

    from time_series_storage_spark.operators.sketch import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError):
        histogram_quantiles(df, ["k"], "v", 0, 250, 64)


def test_kmv_rolling_merge_equals_union_sketch(spark):
    """The rolling merge (flatten -> distinct -> sort -> k-slice over
    daily sketches) must yield EXACTLY the sketch of the window's
    element union — KMV's merge algebra, checked per window against
    kmv_estimate on the union; also exact counts below k."""
    import datetime as dt

    from time_series_storage_spark.operators.sketch import (
        kmv_estimate,
        kmv_rolling_estimate,
    )

    base = dt.datetime(2024, 9, 1)
    rows = []
    for day in range(10):
        for j in range(40):
            # overlapping daily memberships; distinct/day = 40, distinct
            # per 3-day window > k=16 -> estimator region exercised
            rows.append(
                ("g", base + dt.timedelta(days=day, seconds=j),
                 f"u{(day * 17 + j) % 90}")
            )
    df = spark.createDataFrame(rows, "k string, ts timestamp, e string")
    K, WB = 16, 3
    rolled = {
        r["bucket_idx"]: (r["n_mins"], r["kth_min"], r["est_distinct"])
        for r in kmv_rolling_estimate(
            df, ["k"], "e", "ts", 86_400, WB, K
        ).collect()
    }
    for b in rolled:
        lo = (b - WB + 1) * 86_400
        hi = (b + 1) * 86_400
        window_rows = [
            (k2, e)
            for k2, ts, e in rows
            if lo <= ts.replace(tzinfo=dt.timezone.utc).timestamp() < hi
        ]
        want = kmv_estimate(
            spark.createDataFrame(window_rows, "k string, e string"),
            ["k"], "e", K,
        ).collect()[0]
        assert rolled[b] == (
            want["n_mins"], want["kth_min"], want["est_distinct"]
        ), b
    # sanity: with 90 possible users and 3 full days, later windows sit
    # in the estimator region and stay within the ~1/sqrt(k-2) band
    last = rolled[max(rolled)]
    assert last[0] == K
    assert 40 <= last[2] <= 220


def test_kmv_overlap_algebra_matches_truth(spark):
    """Broder resemblance on controlled sets: the union sketch is the
    one-shot sketch of the union (keep-min algebra), and the Jaccard
    estimate tracks the true resemblance on a heavy-overlap pair."""
    import hashlib

    a = [f"shared{i}" for i in range(400)] + [f"a{i}" for i in range(100)]
    b = [f"shared{i}" for i in range(400)] + [f"b{i}" for i in range(100)]
    k = 64

    def model_minima(elems):
        hs = sorted(
            {int(hashlib.md5(e.encode()).hexdigest()[:12], 16) for e in elems}
        )
        return hs[:k]

    ma, mb = set(model_minima(a)), set(model_minima(b))
    mu = model_minima(a + b)
    # keep-min algebra: union sketch == k smallest of merged minima
    assert mu == sorted(ma | mb)[:k]
    shared = sum(1 for h in mu if h in ma and h in mb)
    jacc = shared * 1_000_000 // len(mu)
    true_j = 400 * 1_000_000 // 600
    assert abs(jacc - true_j) < 250_000  # within sketch error at k=64
