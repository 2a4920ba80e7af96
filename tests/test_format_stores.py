"""JSON/CSV/ORC event stores must be observably identical to the
parquet store (same queries, same results, same partition layout)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries
from time_series_storage_spark.sources.formats import FormatEventStore

START = dt.datetime(2024, 2, 1)
FINISH = dt.datetime(2024, 2, 2)


def _src(spark):
    return spark.range(300).select(
        (F.lit(START) + F.make_interval(mins=(F.col("id") * 7) % 1440)).alias("ts"),
        (F.col("id") % 4).cast("double").alias("value"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
    )


def _engine(spark, store=None):
    eng = TimeSeries(spark, store=store)
    eng.define_fact("m", "average", 15)
    eng.define_dimension("grp", facts=["m"])
    eng.ingest_df("m", _src(spark), dim_cols={"grp": "grp"})
    return eng


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_format_store_round_trip(spark, tmp_path, fmt):
    expected = _engine(spark).get_timeseries_map(
        "m", "grp", {}, START, FINISH, step="hour"
    )
    store = FormatEventStore(spark, str(tmp_path / fmt), fmt=fmt)
    got = _engine(spark, store).get_timeseries_map(
        "m", "grp", {}, START, FINISH, step="hour"
    )
    assert got == expected and len(got) == 3

    # layout is partitioned like the parquet store -> fact pruning works
    assert (tmp_path / fmt / "fact=m").exists()
    # appends accumulate (not overwrite)
    eng2 = TimeSeries(spark, store=store)
    eng2.define_fact("m", "average", 15)
    eng2.define_dimension("grp", facts=["m"])
    eng2.new_fact("m", 5.0, {"grp": "g0"}, START + dt.timedelta(hours=1))
    n = store.events_df().count()
    assert n == 301


def test_curated_dataset_store_roundtrip_and_isolation(spark, tmp_path):
    """The pipeline's terminal sink: versioned partitioned parquet with
    an atomic pointer — readers see old data until the new version's
    flip, the committed count matches the written rows, and partition
    pruning works on the published tree."""
    from pyspark.sql import functions as F

    from time_series_storage_spark.sources.curated import (
        CuratedDatasetStore,
    )

    store = CuratedDatasetStore(spark, str(tmp_path / "curated"))
    assert not store.exists()
    df1 = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    v1 = store.write(df1, partition_by=["source"],
                     provenance={"pipeline": "e2e", "quality_min": 500})
    assert store.exists() and v1 == "v00000000"
    assert store._meta()["count"] == 100
    assert store._meta()["pipeline"] == "e2e"
    assert store.read().count() == 100
    # partition pruning on the published tree
    plan = (
        store.read().where(F.col("source") == "1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(source" in plan

    # second write publishes atomically; reader re-resolves to v1 data
    df2 = df1.where("doc_id < 10")
    store.write(df2, partition_by=["source"])
    assert store._meta()["count"] == 10
    assert store.read().count() == 10
    # no staging orphans after success
    import os

    assert not [
        n for n in os.listdir(store.path) if n.startswith(".staging-")
    ]


def test_curated_dataset_store_crash_leaves_reader_on_old(spark, tmp_path):
    """A writer dying mid-stage (staging dir present, no flip) leaves
    the committed version untouched and the wreck ignorable."""
    import os

    from time_series_storage_spark.sources.curated import (
        CuratedDatasetStore,
    )

    store = CuratedDatasetStore(spark, str(tmp_path / "c2"))
    store.write(spark.range(5).toDF("doc_id"))
    # simulate a crashed next write: staged files, no rename/flip
    os.makedirs(os.path.join(store.path, ".staging-v00000001", "x"))
    assert store._meta()["version"] == "v00000000"
    assert store.read().count() == 5
    # the next successful write sweeps the wreck and publishes v1
    store.write(spark.range(7).toDF("doc_id"))
    assert store._meta()["version"] == "v00000001"
    assert store.read().count() == 7
    assert not [
        n for n in os.listdir(store.path) if n.startswith(".staging-")
    ]
