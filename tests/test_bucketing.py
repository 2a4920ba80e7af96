"""Bucketed-table contract: write-time partitioning replaces the
runtime exchange — the plan proof that fact-to-fact joins and
aggregations on the bucket key pay no shuffle per query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.bucketing import (
    read_bucketed,
    save_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # spark.sql.warehouse.dir is a static config — tables land in the
    # session's default warehouse (gitignored spark-warehouse/); the
    # fixture drops them after
    left = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    right = spark.range(0, 5_000, 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 31).cast("double").alias("y"),
    )
    save_bucketed(left, "tb_left", ["k"], 8)
    save_bucketed(right, "tb_right", ["k"], 8)
    yield "tb_left", "tb_right"
    spark.sql("DROP TABLE IF EXISTS tb_left")
    spark.sql("DROP TABLE IF EXISTS tb_right")


def test_bucketed_equijoin_runs_without_exchange(spark, bucketed_pair):
    """Both sides bucketed on the join key into the SAME count: the
    executed join plan contains NO Exchange — the write-time layout is
    the shuffle, paid once instead of per query. Auto-broadcast is
    disabled for the pin: bucketing exists for the fact-to-fact case
    where NEITHER side fits a broadcast (at test size the planner
    would broadcast and skip the bucket layout entirely)."""
    lt, rt = bucketed_pair
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, lt).join(
            read_bucketed(spark, rt), "k"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # (a per-task Sort may remain: with several files per bucket
        # Spark cannot trust sortBy's order across files — the shuffle
        # is the cost that matters at scale, and it is gone)
        # correctness unchanged by the physical layout
        assert joined.count() == 2_500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_bucketed_aggregation_reuses_layout(spark, bucketed_pair):
    """A groupBy on the bucket key aggregates in place: no Exchange
    (the final aggregate runs directly on the stored partitioning)."""
    lt, _ = bucketed_pair
    agg = read_bucketed(spark, lt).groupBy("k").agg(F.sum("x").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 5_000


def test_unbucketed_baseline_does_shuffle(spark, tmp_path):
    """Sanity for the pins above: the SAME join over plain parquet
    plans at least one Exchange — the bucketed layout is what removed
    it, not some session setting."""
    left = spark.range(2_000).select(F.col("id").alias("k"))
    right = spark.range(2_000).select(F.col("id").alias("k"))
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    big = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            spark.read.parquet(lp).join(spark.read.parquet(rp), "k")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", big)
    assert "Exchange" in plan


def test_save_bucketed_validates_inputs(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        save_bucketed(df, "tb_bad", ["k"], 0)
    with pytest.raises(ValueError):
        save_bucketed(df, "tb_bad", [], 4)
