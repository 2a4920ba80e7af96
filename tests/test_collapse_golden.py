"""Collapse/fill unit goldens — scenario C (query_test.clj:7-74).

The reference feeds pre-aggregated rollup rows straight into
collapse-and-fill-range; we reconstruct the equivalent raw events (the
pre-aggregation is associative) and assert the same golden outputs.
Base timestamp 2015-03-21T09:00.
"""

import datetime as dt

import pytest

from time_series_storage_spark import TimeSeries

BASE = dt.datetime(2015, 3, 21, 9, 0, 0)


def _at(minutes):
    return BASE + dt.timedelta(minutes=minutes)


@pytest.fixture()
def counter_engine(spark):
    e = TimeSeries(spark)
    e.define_fact("visits", "counter", 10)
    e.define_dimension("key", facts=["visits"])
    return e


@pytest.fixture()
def avg_engine(spark):
    e = TimeSeries(spark)
    e.define_fact("lat", "average", 10)
    e.define_dimension("key", facts=["lat"])
    return e


class TestCounterGoldens:
    def test_single_point_step_hour(self, counter_engine):
        # query_test.clj:7-15: one row counter=2 -> {09:00 -> 2}
        counter_engine.new_fact("visits", 2, {"key": "k"}, ts=_at(0))
        got = counter_engine.get_timeseries_map(
            "visits", "key", {}, BASE, BASE + dt.timedelta(hours=1), step="hour"
        )
        assert got == {(("key", "k"),): {BASE: 2}}

    def test_single_point_step_none(self, counter_engine):
        # query_test.clj:17-24
        counter_engine.new_fact("visits", 2, {"key": "k"}, ts=_at(0))
        got = counter_engine.get_timeseries_map(
            "visits", "key", {}, BASE, BASE + dt.timedelta(hours=1)
        )
        assert got == {(("key", "k"),): {"all": 2}}

    def test_multi_point_hourly_collapse(self, counter_engine):
        # query_test.clj:26-38: (0,2)(40,1)(80,8)(130,4) ->
        # {09:00->3, 10:00->8, 11:00->4}
        for minutes, counter in [(0, 2), (40, 1), (80, 8), (130, 4)]:
            counter_engine.new_fact("visits", counter, {"key": "k"}, ts=_at(minutes))
        got = counter_engine.get_timeseries_map(
            "visits", "key", {}, BASE, BASE + dt.timedelta(hours=3), step="hour"
        )
        assert got == {
            (("key", "k"),): {
                BASE: 3,
                BASE + dt.timedelta(hours=1): 8,
                BASE + dt.timedelta(hours=2): 4,
            }
        }


class TestAverageGoldens:
    def test_single_point_step_none(self, avg_engine):
        # query_test.clj:41-49: {total 20, counter 2}
        for v in [12, 8]:  # 2 observations totaling 20
            avg_engine.new_fact("lat", v, {"key": "k"}, ts=_at(0))
        got = avg_engine.get_timeseries_map(
            "lat", "key", {}, BASE, BASE + dt.timedelta(hours=1)
        )
        assert got == {(("key", "k"),): {"all": {"counter": 2, "total": 20}}}

    def test_multi_point_hourly_collapse(self, avg_engine):
        # query_test.clj:61-74: buckets (0: t20 c2)(40: t30 c1)(80: t34 c8)
        # (130: t42 c4) -> hourly {09: {50,3}, 10: {34,8}, 11: {42,4}}
        points = {0: (20, 2), 40: (30, 1), 80: (34, 8), 130: (42, 4)}
        for minutes, (total, counter) in points.items():
            for _ in range(counter - 1):
                avg_engine.new_fact("lat", 0, {"key": "k"}, ts=_at(minutes))
            avg_engine.new_fact("lat", total, {"key": "k"}, ts=_at(minutes))
        got = avg_engine.get_timeseries_map(
            "lat", "key", {}, BASE, BASE + dt.timedelta(hours=3), step="hour"
        )
        assert got == {
            (("key", "k"),): {
                BASE: {"counter": 3, "total": 50},
                BASE + dt.timedelta(hours=1): {"counter": 8, "total": 34},
                BASE + dt.timedelta(hours=2): {"counter": 4, "total": 42},
            }
        }
