"""Behavioral parity suite — ports the reference backend tests.

Scenarios from /root/reference/test/time_series_storage/mem_test.clj
(the reference's DB-free behavioral spec), postgres_test.clj and
README.md, as catalogued in FIXTURES.md sections 1-2.
"""

import datetime as dt

import pytest

from time_series_storage_spark import (
    NilCategoryError,
    NoCoveringPathError,
    NoTrackingDimensionError,
    TimeSeries,
    UnknownDimensionError,
    UnknownFactError,
    UnknownGroupingDimensionError,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def engine(spark):
    return TimeSeries(spark)


def _signups_fixture(engine):
    """Canonical scenario A (mem_test.clj:81-133, FIXTURES.md section 2)."""
    engine.define_fact(
        "signups", "counter", 10,
        name="Cantidad de registros", filler=0, units="counter",
    )
    engine.define_dimension(
        "dependency", name="Dependencia de Correo", facts=["signups"]
    )
    engine.define_dimension(
        "dependency_user", grouped_by=[["dependency"]], name="Usuario",
        facts=["signups"],
    )
    engine.new_fact(
        "signups", 1, {"dependency": "32", "dependency_user": "pepe"},
        ts=_ts("2014-03-21 09:09:00"),
    )
    engine.new_fact(
        "signups", 1, {"dependency": "31", "dependency_user": "juanele"},
        ts=_ts("2014-03-21 10:23:00"),
    )
    return engine


class TestCatalog:
    def test_define_fact_roundtrip(self, engine):
        # postgres_test.clj:29-40
        engine.define_fact("signups", "counter", 10, name="Cantidad de registros")
        f = engine.fact("signups")
        assert (f.id, f.type, f.slice, f.filler, f.units) == (
            "signups", "counter", 10, 0, "counter",
        )

    def test_fact_with_histogram_options(self, engine):
        # postgres_test.clj:42-73 (time-distr)
        engine.define_fact(
            "time-distr", "histogram", 15,
            units="seconds", start=0, end=1000, step=100,
        )
        f = engine.fact("time-distr")
        assert f.bucket_edges() == list(range(0, 1000, 100))

    def test_dimension_roundtrip_defaults(self, engine):
        # postgres_test.clj:76-91; defaults schema.clj:135-141
        engine.define_dimension("company", group_only=True)
        engine.define_dimension("campaign", grouped_by=[["company"]])
        d = engine.dimension("campaign")
        assert d.grouped_by == [["company"]]
        assert d.size == 40 and d.group_only is False and d.facts == set()
        assert engine.dimension("company").group_only is True
        assert engine.dimension("company").grouped_by == [[]]

    def test_define_dimension_unknown_group_ref_throws(self, engine):
        # postgres.clj:33-36
        with pytest.raises(UnknownGroupingDimensionError):
            engine.define_dimension("campaign", grouped_by=[["nonexistent"]])

    def test_update_dimension_attaches_fact(self, engine):
        # api.clj:11-12, postgres/schema.clj:244-259
        engine.define_fact("conversions", "counter", 10)
        engine.define_dimension("dependency")
        engine.update_dimension("dependency", "conversions")
        assert "conversions" in engine.dimension("dependency").facts

    def test_update_dimension_unknown_fact_throws(self, engine):
        engine.define_dimension("dependency")
        with pytest.raises(UnknownFactError):
            engine.update_dimension("dependency", "nope")

    def test_drop_schema_resets(self, engine):
        # postgres_test.clj:163-201 (drops exactly its own state)
        engine.define_fact("signups", "counter", 10)
        engine.drop_schema()
        with pytest.raises(UnknownFactError):
            engine.fact("signups")


class TestIngestValidation:
    def test_nil_category_value_throws(self, engine):
        # postgres.clj:66-67
        engine.define_fact("signups", "counter", 10)
        engine.define_dimension("dependency", facts=["signups"])
        with pytest.raises(NilCategoryError):
            engine.new_fact("signups", 1, {"dependency": None})

    def test_unknown_fact_throws(self, engine):
        with pytest.raises(UnknownFactError):
            engine.new_fact("nope", 1, {"dependency": "32"})

    def test_untracked_fact_throws(self, engine):
        # postgres.clj:70-80: dimension must track the fact
        engine.define_fact("signups", "counter", 10)
        engine.define_dimension("dependency")  # facts defaults to {}
        with pytest.raises(NoTrackingDimensionError):
            engine.new_fact("signups", 1, {"dependency": "32"})


class TestCounterTimeseries:
    def test_single_series_filtered(self, engine):
        # mem_test.clj:93-101
        e = _signups_fixture(engine)
        got = e.get_timeseries_map(
            "signups", "dependency_user", {"dependency": "31"},
            _ts("2014-03-21 09:00:00"), _ts("2014-03-21 13:00:00"),
        )
        assert got == {
            (("dependency", "31"), ("dependency_user", "juanele")): {"all": 1}
        }

    def test_nil_filter_returns_all_series(self, engine):
        # mem_test.clj:103-112: nil filter value = wildcard
        e = _signups_fixture(engine)
        got = e.get_timeseries_map(
            "signups", "dependency_user", {"dependency": None},
            _ts("2014-03-21 09:00:00"), _ts("2014-03-21 13:00:00"),
        )
        assert got == {
            (("dependency", "31"), ("dependency_user", "juanele")): {"all": 1},
            (("dependency", "32"), ("dependency_user", "pepe")): {"all": 1},
        }

    def test_step_hour_zero_fills(self, engine):
        # mem_test.clj:115-132
        e = _signups_fixture(engine)
        got = e.get_timeseries_map(
            "signups", "dependency_user", {"dependency": None},
            _ts("2014-03-21 09:00:00"), _ts("2014-03-21 13:00:00"),
            step="hour",
        )
        assert set(got.keys()) == {
            (("dependency", "31"), ("dependency_user", "juanele")),
            (("dependency", "32"), ("dependency_user", "pepe")),
        }
        assert got[(("dependency", "31"), ("dependency_user", "juanele"))] == {
            _ts("2014-03-21 09:00:00"): 0,
            _ts("2014-03-21 10:00:00"): 1,
            _ts("2014-03-21 11:00:00"): 0,
            _ts("2014-03-21 12:00:00"): 0,
        }
        assert got[(("dependency", "32"), ("dependency_user", "pepe"))] == {
            _ts("2014-03-21 09:00:00"): 1,
            _ts("2014-03-21 10:00:00"): 0,
            _ts("2014-03-21 11:00:00"): 0,
            _ts("2014-03-21 12:00:00"): 0,
        }

    def test_counter_value_not_1(self, engine):
        # mem_test.clj:137-151 / postgres_test.clj:147-161 (scenario B)
        engine.define_fact("signups", "counter", 10, name="registros", filler=0)
        engine.define_dimension("dependency", facts=["signups"])
        engine.new_fact("signups", 3, {"dependency": "32"}, ts=_ts("2014-03-21 00:00:00"))
        got = engine.get_timeseries_map(
            "signups", "dependency", {},
            _ts("2012-01-01 00:00:00"), _ts("2020-01-01 00:00:00"),
        )
        assert got == {(("dependency", "32"),): {"all": 3}}

    def test_range_endpoints_inclusive_after_bucketing(self, engine):
        # postgres/query.clj:16-17: >= slice(start) AND <= slice(finish)
        e = _signups_fixture(engine)
        # finish 10:20 buckets to 10:20; event at 10:23 buckets to 10:20 -> included
        got = e.get_timeseries_map(
            "signups", "dependency_user", {"dependency": "31"},
            _ts("2014-03-21 10:00:00"), _ts("2014-03-21 10:20:00"),
        )
        assert got == {
            (("dependency", "31"), ("dependency_user", "juanele")): {"all": 1}
        }

    def test_unknown_fact_and_dim_raise(self, engine):
        e = _signups_fixture(engine)
        with pytest.raises(UnknownFactError):
            e.get_timeseries("nope", "dependency", {}, _ts("2014-01-01 00:00:00"), _ts("2015-01-01 00:00:00"))
        with pytest.raises(UnknownDimensionError):
            e.get_timeseries("signups", "nope", {}, _ts("2014-01-01 00:00:00"), _ts("2015-01-01 00:00:00"))

    def test_uncovered_filter_raises(self, engine):
        # divergence SURVEY 2.4 item 5: reference silently drops filters
        e = _signups_fixture(engine)
        with pytest.raises(NoCoveringPathError):
            e.get_timeseries(
                "signups", "dependency", {"dependency_user": "pepe"},
                _ts("2014-01-01 00:00:00"), _ts("2015-01-01 00:00:00"),
            )


class TestAverageTimeseries:
    def test_average_hierarchy(self, engine):
        # scenario D (README.md:110-125): avg_time via company/campaign/channel
        engine.define_fact("avg_time", "average", 15, name="Tiempo promedio", units="seconds")
        engine.define_dimension("company", group_only=True)
        engine.define_dimension("campaign", grouped_by=[["company"]], facts=["avg_time"])
        engine.define_dimension(
            "channel", grouped_by=[["company", "campaign"]], facts=["avg_time"]
        )
        base = _ts("2014-03-21 10:05:00")
        engine.new_fact(
            "avg_time", 15,
            {"company": "bbva", "campaign": "ventas", "channel": "web"}, ts=base,
        )
        engine.new_fact(
            "avg_time", 25,
            {"company": "bbva", "campaign": "ventas", "channel": "mail"}, ts=base,
        )
        by_campaign = engine.get_timeseries_map(
            "avg_time", "campaign", {"company": "bbva"},
            _ts("2014-03-21 00:00:00"), _ts("2014-03-22 00:00:00"),
        )
        assert by_campaign == {
            (("campaign", "ventas"), ("company", "bbva")): {
                "all": {"counter": 2, "total": 40}
            }
        }
        by_channel = engine.get_timeseries_map(
            "avg_time", "channel", {"company": "bbva", "campaign": "ventas"},
            _ts("2014-03-21 00:00:00"), _ts("2014-03-22 00:00:00"),
        )
        assert by_channel == {
            (("campaign", "ventas"), ("channel", "mail"), ("company", "bbva")): {
                "all": {"counter": 1, "total": 25}
            },
            (("campaign", "ventas"), ("channel", "web"), ("company", "bbva")): {
                "all": {"counter": 1, "total": 15}
            },
        }

    def test_dim_slice_overrides_fact_slice(self, engine):
        # slice precedence: dimension override wins (postgres/query.clj:37)
        engine.define_fact("avg_time", "average", 15)
        engine.define_dimension("campaign", slice=60, facts=["avg_time"])
        engine.new_fact("avg_time", 10, {"campaign": "v"}, ts=_ts("2014-03-21 10:59:00"))
        # finish 10:00 buckets to 10:00 at slice 60; event at 10:59 also
        # buckets to 10:00 -> included only because the dim slice (60)
        # overrides the fact slice (15)
        got = engine.get_timeseries_map(
            "avg_time", "campaign", {},
            _ts("2014-03-21 09:00:00"), _ts("2014-03-21 10:00:00"),
        )
        assert got == {
            (("campaign", "v"),): {"all": {"counter": 1, "total": 10}}
        }


class TestHistogram:
    def _fixture(self, engine):
        # scenario E (FIXTURES.md): fact time-distr, buckets 0..1000 step 100
        engine.define_fact(
            "time-distr", "histogram", 15, units="seconds",
            start=0, end=1000, step=100,
        )
        engine.define_dimension("dependency", facts=["time-distr"])
        t = _ts("2014-03-21 10:05:00")
        for v in [5, 15, 150, 950, 999, 1500, -3]:
            engine.new_fact("time-distr", v, {"dependency": "32"}, ts=t)
        return engine

    def test_histogram_buckets(self, engine):
        e = self._fixture(engine)
        got = e.get_timeseries_map(
            "time-distr", "dependency", {},
            _ts("2014-03-21 00:00:00"), _ts("2014-03-22 00:00:00"),
        )
        # 5,15,-3 -> b0 (clamped); 150 -> b100; 950,999,1500 -> b900 (clamped)
        assert got == {
            (("dependency", "32"),): {"all": {0: 3, 100: 1, 900: 3}}
        }

    def test_get_histogram_merges_range(self, engine):
        e = self._fixture(engine)
        rows = e.get_histogram(
            "time-distr", "dependency", {},
            _ts("2014-03-21 00:00:00"), _ts("2014-03-22 00:00:00"),
        ).collect()
        got = {(r["dependency"], r["bucket_lo"]): r["counter"] for r in rows}
        assert got == {("32", 0): 3, ("32", 100): 1, ("32", 900): 3}


class TestBulkIngest:
    def test_ingest_df_counter(self, engine, spark):
        engine.define_fact("clicks", "counter", 15)
        engine.define_dimension("etype", facts=["clicks"])
        src = spark.createDataFrame(
            [
                (_ts("2014-03-21 10:05:00"), "a", 1.0),
                (_ts("2014-03-21 10:20:00"), "a", 1.0),
                (_ts("2014-03-21 10:20:00"), "b", 1.0),
            ],
            "ts timestamp, et string, value double",
        )
        engine.ingest_df("clicks", src, ts_col="ts", value_col="value", dim_cols={"etype": "et"})
        got = engine.get_timeseries_map(
            "clicks", "etype", {},
            _ts("2014-03-21 00:00:00"), _ts("2014-03-22 00:00:00"),
        )
        assert got == {
            (("etype", "a"),): {"all": 2},
            (("etype", "b"),): {"all": 1},
        }
