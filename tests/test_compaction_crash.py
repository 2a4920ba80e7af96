"""Crash-safety of ParquetEventStore.compact(): a fault injected at any
point of the journaled swap must never lose a partition, never strand
data under a name that parses as a bogus partition, and concurrent
appends must survive compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.sources.events import ParquetEventStore
from time_series_storage_spark.streaming.ingest import stream_events


def _raw(spark, n):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.range(n).select(
        (F.lit(t0) + F.make_interval(mins=F.col("id") % 120)).alias("ts"),
        F.lit(1.0).alias("value"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
    )


@pytest.fixture()
def frag_store(spark, tmp_path):
    store = ParquetEventStore(spark, str(tmp_path / "ev"))
    for chunk in range(3):
        store.append_df(
            stream_events(
                _raw(spark, 40).withColumn(
                    "ts", F.col("ts") + F.make_interval(mins=F.lit(chunk))
                ),
                "hits",
                dim_cols={"user": "user"},
            )
        )
    return store


def _rows(store):
    return sorted(
        tuple(r) for r in store.events_df().select("ts", "value").collect()
    )


def _partition_dirs(store):
    return sorted(
        os.path.relpath(p, store.path)
        for p in glob.glob(os.path.join(store.path, "fact=*", "p_date=*"))
    )


@pytest.mark.parametrize("stage", ["pre_swap", "mid_swap", "post_swap"])
def test_crash_at_any_swap_stage_recovers(frag_store, stage):
    store = frag_store
    before_rows, before_parts = _rows(store), _partition_dirs(store)

    def boom(s, rel):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._compact_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.compact()
    # nothing stranded inside the partitioned namespace: every entry in
    # the tree either is a clean partition dir or an underscore scratch
    for fd in os.listdir(store.path):
        if not os.path.isdir(os.path.join(store.path, fd)):
            continue
        assert fd.startswith(("fact=", "_", ".")), fd
        if fd.startswith("fact="):
            for pd_ in os.listdir(os.path.join(store.path, fd)):
                if not os.path.isdir(os.path.join(store.path, fd, pd_)):
                    continue
                assert pd_.startswith("p_date="), pd_
                assert "._old" not in pd_
    # next compact() repairs and finishes (or re-runs) the job
    store._compact_fault = None
    store.compact()
    assert _rows(store) == before_rows
    assert _partition_dirs(store) == before_parts
    # every partition ended compacted to one file
    for p in _partition_dirs(store):
        files = [
            f
            for f in os.listdir(os.path.join(store.path, p))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (p, files)


def test_recovery_restores_from_trash_when_staging_lost(frag_store):
    """Crash between the two renames AND staged output gone (worst
    case): the old partition comes back from trash — wholly old, never
    absent."""
    import shutil

    store = frag_store
    before_rows = _rows(store)
    crashed_rel = {}

    def boom(s, rel):
        if s == "mid_swap":
            crashed_rel["rel"] = rel
            raise RuntimeError("injected")

    store._compact_fault = boom
    with pytest.raises(RuntimeError):
        store.compact()
    # destroy the staged replacement for the in-flight partition
    shutil.rmtree(
        os.path.join(store.path, store.COMPACT_STAGING, crashed_rel["rel"])
    )
    store._compact_fault = None
    store.compact()  # recovery rolls back from trash, then re-compacts
    assert _rows(store) == before_rows


def test_concurrent_append_is_salvaged(spark, frag_store):
    """A file appended between the fragmentation scan and the swap is
    not silently deleted: it rides into trash and is moved back."""
    store = frag_store
    before_rows = _rows(store)
    extra = stream_events(_raw(spark, 7), "hits", dim_cols={"user": "user"})
    extra_rows = sorted(
        tuple(r)
        for r in extra.withColumn("p_date", F.to_date("ts"))
        .select("ts", "value")
        .collect()
    )
    appended = {}

    def hook(s, rel):
        if s == "pre_swap" and not appended:
            appended["done"] = True
            store.append_df(extra)  # lands in the live dir pre-rename

    store._compact_fault = hook
    assert store.compact() >= 1
    store._compact_fault = None
    assert _rows(store) == sorted(before_rows + extra_rows)
