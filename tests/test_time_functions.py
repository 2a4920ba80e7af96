"""Unit goldens for slice bucketing and step truncation.

Ports the time semantics of reference postgres/common.clj:7-23
(get-slice) and query.clj:6-37 (time-dimension), including the
Sunday-week quirk.
"""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from time_series_storage_spark.errors import InvalidSliceError, InvalidStepError
from time_series_storage_spark.functions.time import (
    grid_df,
    slice_datetime,
    slice_expr,
    step_trunc_datetime,
    step_trunc_expr,
)


def _eval(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.mark.parametrize(
    "ts,slice_min,expected",
    [
        # reference docstring golden: 16:46 @ 15 -> 16:45
        ("2014-03-21 16:46:23", 15, "2014-03-21 16:45:00"),
        ("2014-03-21 09:09:00", 10, "2014-03-21 09:00:00"),
        ("2014-03-21 10:23:00", 10, "2014-03-21 10:20:00"),
        ("2014-03-21 10:59:59", 60, "2014-03-21 10:00:00"),
        ("2014-03-21 10:00:00", 5, "2014-03-21 10:00:00"),
        ("2014-03-21 10:04:59", 5, "2014-03-21 10:00:00"),
    ],
)
def test_slice_expr_goldens(spark, ts, slice_min, expected):
    got = _eval(spark, slice_expr(F.lit(ts).cast("timestamp"), slice_min))
    assert got == _ts(expected)
    # driver-side mirror agrees
    assert slice_datetime(_ts(ts), slice_min) == _ts(expected)


def test_slice_rejects_non_divisor():
    with pytest.raises(InvalidSliceError):
        slice_datetime(_ts("2014-03-21 10:00:00"), 7)


@pytest.mark.parametrize(
    "ts,step,offset,expected",
    [
        ("2014-03-21 16:46:23", "hour", 0, "2014-03-21 16:00:00"),
        ("2014-03-21 16:46:23", "day", 0, "2014-03-21 00:00:00"),
        ("2014-03-21 16:46:23", "month", 0, "2014-03-01 00:00:00"),
        ("2014-03-21 16:46:23", "year", 0, "2014-01-01 00:00:00"),
        # offset shifts before truncation (query.clj:8-10)
        ("2014-03-21 23:30:00", "day", 1, "2014-03-22 00:00:00"),
        ("2014-03-21 00:30:00", "day", -1, "2014-03-20 00:00:00"),
        # week: Sunday STRICTLY before (query.clj:24-30).
        # 2014-03-21 is a Friday (iso dow 5) -> 2014-03-16 (Sunday)
        ("2014-03-21 16:46:23", "week", 0, "2014-03-16 00:00:00"),
        # a Sunday maps to the PREVIOUS Sunday (iso dow 7)
        ("2014-03-16 10:00:00", "week", 0, "2014-03-09 00:00:00"),
        # Monday -> the Sunday one day before
        ("2014-03-17 10:00:00", "week", 0, "2014-03-16 00:00:00"),
        # Saturday
        ("2014-03-22 10:00:00", "week", 0, "2014-03-16 00:00:00"),
    ],
)
def test_step_trunc_goldens(spark, ts, step, offset, expected):
    got = _eval(spark, step_trunc_expr(F.lit(ts).cast("timestamp"), step, offset))
    assert got == _ts(expected)
    if offset == 0:
        assert step_trunc_datetime(_ts(ts), step) == _ts(expected)


def test_step_none_returns_no_expr():
    assert step_trunc_expr(F.lit("2014-03-21").cast("timestamp"), "none") is None
    assert step_trunc_expr(F.lit("2014-03-21").cast("timestamp"), None) is None


def test_invalid_step_raises(spark):
    with pytest.raises(InvalidStepError):
        step_trunc_expr(F.lit("2014-03-21").cast("timestamp"), "minute")


def test_grid_hour_end_exclusive(spark):
    g = grid_df(spark, _ts("2014-03-21 09:00:00"), _ts("2014-03-21 13:00:00"), "hour")
    got = [r["ts"] for r in g.orderBy("ts").collect()]
    assert got == [
        _ts("2014-03-21 09:00:00"),
        _ts("2014-03-21 10:00:00"),
        _ts("2014-03-21 11:00:00"),
        _ts("2014-03-21 12:00:00"),
    ]


def test_grid_aligns_unaligned_start(spark):
    # divergence (SURVEY 2.4 item 6): grid aligned to truncated grain
    g = grid_df(spark, _ts("2014-03-21 09:30:00"), _ts("2014-03-21 12:00:00"), "hour")
    got = [r["ts"] for r in g.orderBy("ts").collect()]
    assert got == [
        _ts("2014-03-21 09:00:00"),
        _ts("2014-03-21 10:00:00"),
        _ts("2014-03-21 11:00:00"),
    ]


def test_grid_month_calendar_aware(spark):
    g = grid_df(spark, _ts("2014-01-15 00:00:00"), _ts("2014-04-01 00:00:00"), "month")
    got = [r["ts"] for r in g.orderBy("ts").collect()]
    assert got == [_ts("2014-01-01 00:00:00"), _ts("2014-02-01 00:00:00"), _ts("2014-03-01 00:00:00")]


def test_grid_empty_when_range_inverted(spark):
    g = grid_df(spark, _ts("2014-03-21 09:00:00"), _ts("2014-03-21 09:00:00"), "hour")
    assert g.count() == 0
