"""Materialized rollups: the rollup-served read path must be
indistinguishable from on-demand aggregation over raw events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries
from time_series_storage_spark.errors import GroupOnlyDimensionError
from time_series_storage_spark.plans import RollupStore

START = dt.datetime(2024, 1, 1)
FINISH = dt.datetime(2024, 1, 3)


def _events(spark, n=500):
    return spark.range(n).select(
        (F.lit(START) + F.make_interval(mins=(F.col("id") * 13) % 2880)).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("company"),
        F.concat(F.lit("u"), (F.col("id") % 4).cast("string")).alias("user"),
    )


@pytest.fixture()
def engines(spark, tmp_path):
    """Two engines over the same events: one plain, one rollup-backed."""
    def build(rollup_store=None):
        eng = TimeSeries(spark, rollup_store=rollup_store)
        eng.define_fact("hits", "counter", 10)
        eng.define_fact("lat", "average", 15)
        eng.define_fact("dist", "histogram", 30, start=0, end=6, step=2)
        eng.define_dimension("company", group_only=True)
        eng.define_dimension(
            "user", grouped_by=[["company"], []],
            facts=["hits", "lat", "dist"],
        )
        src = _events(spark)
        dims = {"company": "company", "user": "user"}
        eng.ingest_df("hits", src.withColumn("one", F.lit(1.0)),
                      value_col="one", dim_cols=dims)
        eng.ingest_df("lat", src, dim_cols=dims)
        eng.ingest_df("dist", src, dim_cols=dims)
        return eng

    plain = build()
    store = RollupStore(spark, str(tmp_path / "rollups"))
    backed = build(rollup_store=store)
    names = store.materialize_all(backed)
    # full lattice: 2 paths x 3 facts for dimension `user`
    assert sorted(names) == sorted(
        ["company_user_hits", "user_hits", "company_user_lat", "user_lat",
         "company_user_dist", "user_dist"]
    )
    return plain, backed


@pytest.mark.parametrize(
    "fact,dim,filt,step,offset",
    [
        ("hits", "user", {}, "hour", 0),
        ("hits", "user", {"company": "c1"}, "day", 0),
        ("hits", "user", {"company": None}, None, 0),
        ("lat", "user", {}, "hour", 3),
        ("lat", "user", {"company": "c0"}, None, 0),
        ("dist", "user", {}, "day", 0),
    ],
)
def test_rollup_read_equals_raw_read(engines, fact, dim, filt, step, offset):
    plain, backed = engines
    kw = {"step": step, "offset": offset}
    a = plain.get_timeseries_map(fact, dim, filt, START, FINISH, **kw)
    b = backed.get_timeseries_map(fact, dim, filt, START, FINISH, **kw)
    assert a == b and len(b) > 0


def test_rollup_scan_is_partition_pruned(engines):
    _, backed = engines
    df = backed.get_timeseries("hits", "user", {}, START, dt.datetime(2024, 1, 1, 6), step="hour")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "p_date" in plan


def test_single_pass_equals_per_path(spark, tmp_path, engines):
    """The GROUPING SETS lattice must write byte-equal rollups to the
    one-job-per-path fallback."""
    _, backed = engines
    store_a = RollupStore(spark, str(tmp_path / "a"))
    store_b = RollupStore(spark, str(tmp_path / "b"))
    for fact in ("hits", "lat", "dist"):
        store_a.materialize(backed, fact, "user", single_pass=True)
        store_b.materialize(backed, fact, "user", single_pass=False)
        for grouping in (["company", "user"], ["user"]):
            a = store_a.read(grouping, fact)
            b = store_b.read(grouping, fact)
            cols = sorted(a.columns)
            ra = sorted(tuple(r[c] for c in cols) for r in a.collect())
            rb = sorted(tuple(r[c] for c in cols) for r in b.collect())
            assert ra == rb and len(ra) > 0, (fact, grouping)


def test_group_only_dimension_rejected_as_query_target(engines):
    """group_only dimensions have no time-series tables in the reference
    (postgres/schema.clj:233): querying one is an error, not an answer."""
    plain, _ = engines
    with pytest.raises(GroupOnlyDimensionError):
        plain.get_timeseries("hits", "company", {}, START, FINISH)
    with pytest.raises(GroupOnlyDimensionError):
        plain.get_histogram("dist", "company", {}, START, FINISH)


def test_drop_schema_purges_rollups(spark, tmp_path):
    """drop_schema -> re-define -> re-ingest must serve the NEW data:
    a leftover materialized rollup from before the drop must never
    shadow the fresh events (reference drop-schema! drops all fact
    time-series tables, postgres.clj:19-23)."""
    store = RollupStore(spark, str(tmp_path / "r3"))

    def build(n):
        eng = TimeSeries(spark, rollup_store=store)
        eng.define_fact("hits", "counter", 10)
        eng.define_dimension("user", facts=["hits"])
        eng.ingest_df(
            "hits",
            _events(spark, n).withColumn("one", F.lit(1.0)),
            value_col="one", dim_cols={"user": "user"},
        )
        store.materialize(eng, "hits", "user")
        return eng

    eng = build(50)
    out = eng.get_timeseries_map("hits", "user", {}, START, FINISH)
    assert sum(v["all"] for v in out.values()) == 50
    eng.drop_schema()
    assert not store.exists(["user"], "hits")
    eng2 = build(80)
    out2 = eng2.get_timeseries_map("hits", "user", {}, START, FINISH)
    assert sum(v["all"] for v in out2.values()) == 80


def test_update_dimension_invalidates_rollup(spark, tmp_path):
    """Re-attaching a fact to a dimension drops the stale materialized
    snapshot (reference re-creates the tables at attach time,
    postgres/schema.clj:244-259); queries fall back to raw events."""
    store = RollupStore(spark, str(tmp_path / "r4"))
    eng = TimeSeries(spark, rollup_store=store)
    eng.define_fact("hits", "counter", 10)
    eng.define_dimension("user", facts=["hits"])
    eng.ingest_df(
        "hits",
        _events(spark, 50).withColumn("one", F.lit(1.0)),
        value_col="one", dim_cols={"user": "user"},
    )
    store.materialize(eng, "hits", "user")
    # late events land after materialization: the rollup snapshot is stale
    eng.ingest_df(
        "hits",
        _events(spark, 30).withColumn("one", F.lit(1.0)),
        value_col="one", dim_cols={"user": "user"},
    )
    stale = eng.get_timeseries_map("hits", "user", {}, START, FINISH)
    assert sum(v["all"] for v in stale.values()) == 50  # rollup-served
    eng.update_dimension("user", "hits")
    assert not store.exists(["user"], "hits")
    fresh = eng.get_timeseries_map("hits", "user", {}, START, FINISH)
    assert sum(v["all"] for v in fresh.values()) == 80  # raw-served


def test_rollup_partition_layout_is_coalesced(engines, tmp_path):
    """One parquet file per p_date partition: the materialized read path
    must not pay per-file overhead proportional to shuffle parallelism."""
    import glob
    import os

    _, backed = engines
    root = backed.rollup_store.path
    part_dirs = glob.glob(os.path.join(root, "user_hits", "v*", "p_date=*"))
    assert part_dirs, "expected p_date partition dirs"
    for d in part_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_missing_rollup_falls_back(spark, tmp_path):
    eng = TimeSeries(spark, rollup_store=RollupStore(spark, str(tmp_path / "r2")))
    eng.define_fact("hits", "counter", 10)
    eng.define_dimension("user", facts=["hits"])
    eng.ingest_df(
        "hits",
        _events(spark, 50).withColumn("one", F.lit(1.0)),
        value_col="one", dim_cols={"user": "user"},
    )
    # nothing materialized -> raw-event path serves the query
    out = eng.get_timeseries_map("hits", "user", {}, START, FINISH)
    assert sum(v["all"] for v in out.values()) == 50
