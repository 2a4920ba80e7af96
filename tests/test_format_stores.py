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
