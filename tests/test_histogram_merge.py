"""get_histogram's pluggable merge (the protocol's merge-with param,
reference api.clj:38-41 — unimplemented there, real here)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries

T0 = dt.datetime(2024, 1, 1, 9, 0)


def _engine(spark):
    eng = TimeSeries(spark)
    eng.define_fact("lat", "histogram", 60, start=0, end=30, step=10)
    eng.define_dimension("svc", facts=["lat"])
    # svc=a: hour 9 has values 5,15 (buckets 0,10); hour 10 has 5,5 (bucket 0 x2)
    for ts, v in [(T0, 5.0), (T0, 15.0),
                  (T0 + dt.timedelta(hours=1), 5.0),
                  (T0 + dt.timedelta(hours=1, minutes=9), 5.0)]:
        eng.new_fact("lat", v, {"svc": "a"}, ts)
    return eng


def test_default_merge_is_sum(spark):
    eng = _engine(spark)
    got = {
        (r["svc"], r["bucket_lo"]): r["counter"]
        for r in eng.get_histogram(
            "lat", "svc", {}, T0, T0 + dt.timedelta(hours=3)
        ).collect()
    }
    assert got == {("a", 0): 3, ("a", 10): 1}


def test_custom_merge_folds_at_slice_grain(spark):
    """The merge contract folds per-*slice* counts (the storage grain),
    pinned with a non-additive combiner at slice=10: two same-bucket
    events in the same hour but different slices must reach the fold as
    [1, 1] (max=1), not as a pre-summed hourly 2."""
    eng = TimeSeries(spark)
    eng.define_fact("lat", "histogram", 10, start=0, end=30, step=10)
    eng.define_dimension("svc", facts=["lat"])
    # bucket 0: slices 9:00 and 9:10 -> one event each; bucket 10: one
    for ts, v in [(T0, 5.0), (T0 + dt.timedelta(minutes=10), 5.0),
                  (T0, 15.0)]:
        eng.new_fact("lat", v, {"svc": "a"}, ts)
    got = {
        (r["svc"], r["bucket_lo"]): r["counter"]
        for r in eng.get_histogram(
            "lat", "svc", {}, T0, T0 + dt.timedelta(hours=1),
            merge=lambda acc, x: F.greatest(acc, x),
        ).collect()
    }
    assert got == {("a", 0): 1, ("a", 10): 1}


def test_custom_merge_served_from_rollup_matches_raw(spark, tmp_path):
    """The rollup-served merge path sees the same slice-grain rows."""
    from time_series_storage_spark.plans import RollupStore

    def build(store=None):
        eng = TimeSeries(spark, rollup_store=store)
        eng.define_fact("lat", "histogram", 10, start=0, end=30, step=10)
        eng.define_dimension("svc", facts=["lat"])
        for i in range(40):
            eng.new_fact(
                "lat", float((i * 7) % 30), {"svc": f"s{i % 2}"},
                T0 + dt.timedelta(minutes=3 * i),
            )
        return eng

    plain = build()
    store = RollupStore(spark, str(tmp_path / "hist_rollups"))
    backed = build(store)
    store.materialize(backed, "lat", "svc")
    kw = dict(merge=lambda acc, x: F.greatest(acc, x))
    args = ("lat", "svc", {}, T0, T0 + dt.timedelta(hours=3))
    rows = lambda eng: sorted(
        (r["svc"], r["bucket_lo"], r["counter"])
        for r in eng.get_histogram(*args, **kw).collect()
    )
    a, b = rows(plain), rows(backed)
    assert a == b and len(a) > 0


def test_custom_merge_max(spark):
    eng = _engine(spark)
    got = {
        (r["svc"], r["bucket_lo"]): r["counter"]
        for r in eng.get_histogram(
            "lat", "svc", {}, T0, T0 + dt.timedelta(hours=3),
            merge=lambda acc, x: F.greatest(acc, x),
        ).collect()
    }
    # max per-hour count: bucket 0 peaked at 2 (hour 10), bucket 10 at 1
    assert got == {("a", 0): 2, ("a", 10): 1}
