"""Incrementally maintained rollups (RollupMergeSink) must converge to
exactly the batch-materialized rollup, across micro-batches and late
data, and reads must serve from them transparently."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries
from time_series_storage_spark.plans import RollupStore
from time_series_storage_spark.streaming import stream_events
from time_series_storage_spark.streaming.ingest import streaming_rollup_refresh

T0 = dt.datetime(2024, 5, 1)


def test_rollup_merge_sink_partial_batch_replay(spark, tmp_path):
    """Crash after one grouping's merge committed but before the rest:
    the replayed batch must skip the committed grouping (its _current
    pointer records the batch id) and merge only the remaining ones —
    no double-counting anywhere."""
    from time_series_storage_spark.streaming.ingest import RollupMergeSink

    def build(store):
        eng = TimeSeries(spark, rollup_store=store)
        eng.define_fact("hits", "counter", 15)
        eng.define_dimension("company", group_only=True)
        eng.define_dimension(
            "user", grouped_by=[["company"], []], facts=["hits"]
        )
        return eng

    ev = stream_events(
        spark.range(90).select(
            (F.lit(T0) + F.make_interval(mins=(F.col("id") * 11) % 300)).alias("ts"),
            F.lit(1.0).alias("value"),
            F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("company"),
            F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
        ),
        "hits",
        dim_cols={"company": "company", "user": "user"},
    )

    # crashed run: only the first grouping gets merged for batch 0
    store_a = RollupStore(spark, str(tmp_path / "ra"))
    sink_a = RollupMergeSink(build(store_a), store_a, "hits", "user")
    g1 = sink_a.groupings[0]
    sink_a._merge_one(sink_a._batch_rollup(ev, g1), g1, 0)
    # replay of the whole batch (what foreachBatch does after restart)
    sink_a(ev, 0)

    # clean run for comparison
    store_b = RollupStore(spark, str(tmp_path / "rb"))
    sink_b = RollupMergeSink(build(store_b), store_b, "hits", "user")
    sink_b(ev, 0)

    for g in sink_a.groupings:
        a = sorted(map(tuple, store_a.read(g, "hits").drop("p_date").collect()))
        b = sorted(map(tuple, store_b.read(g, "hits").drop("p_date").collect()))
        assert a == b and len(a) > 0, g


def test_merge_backend_seam_contract(spark, tmp_path):
    """The sink must drive ANY RollupMergeBackend through the
    per-(batch x grouping) idempotent-commit contract: consult the
    watermark before merging, merge exactly the groupings at or above
    it once, and never re-merge a batch a replay already committed —
    proving a MERGE INTO (Delta/Iceberg) backend drops in without
    touching the sink."""
    from time_series_storage_spark.plans import RollupStore
    from time_series_storage_spark.streaming.ingest import (
        RollupMergeBackend,
        RollupMergeSink,
    )

    class RecordingBackend(RollupMergeBackend):
        def __init__(self):
            self.merged = []  # (grouping tuple, batch_id) in call order
            self.hwm = {}  # grouping tuple -> last committed batch

        def last_merged_batch(self, grouping, fact_id):
            return self.hwm.get(tuple(grouping))

        def merge(self, delta, grouping, fact, batch_id):
            assert fact.id == "hits" and delta.columns  # real delta df
            self.merged.append((tuple(grouping), batch_id))
            self.hwm[tuple(grouping)] = batch_id  # atomic commit+record

    store = RollupStore(spark, str(tmp_path / "seam"))
    eng = TimeSeries(spark, rollup_store=store)
    eng.define_fact("hits", "counter", 15)
    eng.define_dimension("company", group_only=True)
    eng.define_dimension("user", grouped_by=[["company"], []], facts=["hits"])
    ev = stream_events(
        spark.range(30).select(
            (F.lit(T0) + F.make_interval(mins=F.col("id"))).alias("ts"),
            F.lit(1.0).alias("value"),
            F.lit("c0").alias("company"),
            F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
        ),
        "hits",
        dim_cols={"company": "company", "user": "user"},
    )
    backend = RecordingBackend()
    sink = RollupMergeSink(eng, store, "hits", "user", backend=backend)
    g1, g2 = sink.groupings

    # batch 0: partial failure — g1 commits, then the process dies
    sink._merge_one(sink._batch_rollup(ev, g1), g1, 0)
    assert backend.merged == [(tuple(g1), 0)]
    # replay of batch 0 merges ONLY the uncommitted grouping
    sink(ev, 0)
    assert backend.merged == [(tuple(g1), 0), (tuple(g2), 0)]
    # batch 1 merges both; a replay of 0 or 1 after that is a no-op
    sink(ev, 1)
    import os

    os.remove(os.path.join(sink.marker_dir, "0"))
    os.remove(os.path.join(sink.marker_dir, "1"))
    sink(ev, 0)
    sink(ev, 1)
    assert backend.merged == [
        (tuple(g1), 0), (tuple(g2), 0), (tuple(g1), 1), (tuple(g2), 1),
    ]


def test_replay_skipped_after_interleaved_materialize(spark, tmp_path):
    """The double-count window the high-watermark closes: a grouping
    commits its merge of batch 0, a full materialize() republishes the
    rollup (no batch id of its own), then the batch replays. The
    replay must still be skipped — the watermark survives the
    materialize — leaving the rollup identical to the fresh
    materialization."""
    from time_series_storage_spark.streaming.ingest import RollupMergeSink

    src = spark.range(90).select(
        (F.lit(T0) + F.make_interval(mins=(F.col("id") * 11) % 300)).alias("ts"),
        F.lit(1.0).alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("company"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
    )
    store = RollupStore(spark, str(tmp_path / "r"))
    eng = TimeSeries(spark, rollup_store=store)
    eng.define_fact("hits", "counter", 15)
    eng.define_dimension("company", group_only=True)
    eng.define_dimension("user", grouped_by=[["company"], []], facts=["hits"])
    # raw store is authoritative: the same events land there too
    eng.ingest_df("hits", src, dim_cols={"company": "company", "user": "user"})

    ev = stream_events(src, "hits", dim_cols={"company": "company", "user": "user"})
    sink = RollupMergeSink(eng, store, "hits", "user")
    g1 = sink.groupings[0]
    # partial commit: g1 merges batch 0, then the process "crashes"
    sink._merge_one(sink._batch_rollup(ev, g1), g1, 0)
    assert store.current_meta(store._dir(g1, "hits"))["merged_batch"] == 0

    # interleaved full materialization republishes every grouping
    store.materialize(eng, "hits", "user")
    meta = store.current_meta(store._dir(g1, "hits"))
    assert meta.get("batch") is None  # materialize has no batch id...
    assert meta["merged_batch"] == 0  # ...but the watermark survived
    want = sorted(map(tuple, store.read(g1, "hits").collect()))

    # replay of batch 0 (restart recovery) must be a no-op for g1
    sink._merge_one(sink._batch_rollup(ev, g1), g1, 0)
    got = sorted(map(tuple, store.read(g1, "hits").collect()))
    assert got == want and len(got) > 0


def test_streaming_merge_converges_to_batch(spark, tmp_path):
    # two source files -> two micro-batches (maxFilesPerTrigger=1);
    # the second batch is entirely "late" (previous day's timestamps)
    src = str(tmp_path / "src")
    batch1 = spark.range(120).select(
        (F.lit(T0) + F.make_interval(mins=(F.col("id") * 11) % 1440)).alias("ts"),
        (F.col("id") % 5).cast("double").alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 2).cast("string")).alias("company"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
    )
    late = spark.range(40).select(
        (F.lit(T0) - F.make_interval(mins=(F.col("id") * 17) % 1440 + 1)).alias("ts"),
        (F.col("id") % 5).cast("double").alias("value"),
        F.lit("c0").alias("company"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
    )
    batch1.coalesce(1).write.parquet(src + "/f1")
    late.coalesce(1).write.parquet(src + "/f2")
    schema = spark.read.parquet(src + "/f1").schema

    def define(eng):
        eng.define_fact("hits", "average", 15)
        eng.define_dimension("company", group_only=True)
        eng.define_dimension(
            "user", grouped_by=[["company"], []], facts=["hits"]
        )

    # streaming side: merge micro-batches into the rollup store
    store = RollupStore(spark, str(tmp_path / "rollups"))
    live = TimeSeries(spark, rollup_store=store)
    define(live)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    ev = stream_events(
        stream, "hits", dim_cols={"company": "company", "user": "user"}
    )
    q = (
        streaming_rollup_refresh(ev, live, store, "hits", "user")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # batch side: same events ingested and materialized in one shot
    batch_eng = TimeSeries(spark)
    define(batch_eng)
    batch_eng.ingest_df(
        "hits",
        batch1.unionByName(late),
        dim_cols={"company": "company", "user": "user"},
    )

    start, finish = T0 - dt.timedelta(days=1), T0 + dt.timedelta(days=1)
    want = batch_eng.get_timeseries_map(
        "hits", "user", {}, start, finish, step="hour"
    )
    # `live` has an EMPTY event store — everything must come from the
    # stream-maintained rollups
    # empty filter -> best_grouping picks the ["company"] path:
    # (company x user) = 6 series
    got = live.get_timeseries_map("hits", "user", {}, start, finish, step="hour")
    assert got == want and len(got) == 6

    # hierarchy path maintained too
    got_h = live.get_timeseries_map(
        "hits", "user", {"company": "c1"}, start, finish
    )
    want_h = batch_eng.get_timeseries_map(
        "hits", "user", {"company": "c1"}, start, finish
    )
    assert got_h == want_h and len(got_h) > 0


def test_duckdb_merge_backend_contract_and_convergence(spark, tmp_path):
    """The SECOND real backend (DuckDB ACID upsert + same-transaction
    watermark) behind the unchanged sink: partial-batch crash replay
    merges only the uncommitted grouping, replays below the watermark
    are no-ops even with sink markers wiped (the backend's own
    transactional watermark must hold alone), and the maintained
    rollup's content equals the batch aggregate exactly."""
    import os

    from time_series_storage_spark.streaming.duckdb_backend import (
        DuckDBMergeBackend,
    )
    from time_series_storage_spark.streaming.ingest import RollupMergeSink

    store = RollupStore(spark, str(tmp_path / "dstore"))
    eng = TimeSeries(spark, rollup_store=store)
    eng.define_fact("hits", "counter", 15)
    eng.define_dimension("company", group_only=True)
    eng.define_dimension("user", grouped_by=[["company"], []], facts=["hits"])

    def events(lo, hi):
        return stream_events(
            spark.range(lo, hi).select(
                (F.lit(T0) + F.make_interval(mins=F.col("id"))).alias("ts"),
                F.lit(1.0).alias("value"),
                F.lit("c0").alias("company"),
                F.concat(
                    F.lit("u"), (F.col("id") % 3).cast("string")
                ).alias("user"),
            ),
            "hits",
            dim_cols={"company": "company", "user": "user"},
        )

    backend = DuckDBMergeBackend(str(tmp_path / "rollups.duckdb"))
    sink = RollupMergeSink(eng, store, "hits", "user", backend=backend)
    g1, g2 = sink.groupings

    b0, b1 = events(0, 30), events(30, 60)
    # batch 0 partial crash: only g1 committed
    sink._merge_one(sink._batch_rollup(b0, g1), g1, 0)
    assert backend.last_merged_batch(g1, "hits") == 0
    assert backend.last_merged_batch(g2, "hits") is None
    # full replay completes g2 without double-merging g1
    sink(b0, 0)
    sink(b1, 1)
    # replays with the sink's own markers wiped: the backend watermark
    # alone must make them no-ops
    for m in ("0", "1"):
        os.remove(os.path.join(sink.marker_dir, m))
    sink(b0, 0)
    sink(b1, 1)
    assert backend.last_merged_batch(g1, "hits") == 1
    assert backend.last_merged_batch(g2, "hits") == 1

    # content: the maintained rollup equals the one-shot batch rollup
    both = b0.unionByName(b1)
    for g in (g1, g2):
        want = {
            tuple(r[c] for c in (*g, "ts")): r["counter"]
            for r in sink._batch_rollup(both, g).collect()
        }
        got_pdf = backend.read_rollup(g, "hits")
        got = {
            tuple(row[c] for c in (*g, "ts")): row["counter"]
            for _, row in got_pdf.iterrows()
        }
        # normalize pandas Timestamp -> datetime for key equality
        got = {
            tuple(
                k.to_pydatetime() if hasattr(k, "to_pydatetime") else k
                for k in key
            ): v
            for key, v in got.items()
        }
        assert got == want and len(want) > 0, g


def test_duckdb_ident_mapping_is_injective():
    """ADVICE r6 (low): 'a-b' and 'a_b' both sanitize to 'a_b', which
    would silently merge two rollup tables (and share one watermark
    row). The identifier carries a hash of the RAW name, so distinct
    ids map to distinct tables."""
    from time_series_storage_spark.streaming.duckdb_backend import _ident

    names = ["a-b", "a_b", "a.b", "a b", "hits", "hit-s", "7x", "_7x"]
    idents = [_ident(n) for n in names]
    assert len(set(idents)) == len(names)
    # still valid SQL identifier fragments
    import re

    for i in idents:
        assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", i), i
    # deterministic
    assert [_ident(n) for n in names] == idents


def test_duckdb_merge_delta_is_rollup_bounded(spark, tmp_path):
    """r11 verdict #7: the backend's driver-side toPandas is bounded
    by distinct (dims x slice buckets) in the batch — NOT its raw row
    count. Pin that: 3000 raw events collapsing to 3 users x 2 slice
    buckets must hand the backend exactly 6 delta rows (per grouping
    that includes user), however many rows the batch carried."""
    from time_series_storage_spark.streaming.duckdb_backend import (
        DuckDBMergeBackend,
    )
    from time_series_storage_spark.streaming.ingest import RollupMergeSink

    store = RollupStore(spark, str(tmp_path / "bstore"))
    eng = TimeSeries(spark, rollup_store=store)
    eng.define_fact("hits", "counter", 15)
    eng.define_dimension("company", group_only=True)
    eng.define_dimension("user", grouped_by=[["company"], []], facts=["hits"])

    batch = stream_events(
        spark.range(0, 3000).select(
            # two 15-minute buckets: minutes 0 and 20
            (F.lit(T0) + F.make_interval(mins=(F.col("id") % 2) * 20)).alias(
                "ts"
            ),
            F.lit(1.0).alias("value"),
            F.lit("c0").alias("company"),
            F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias(
                "user"
            ),
        ),
        "hits",
        dim_cols={"company": "company", "user": "user"},
    )
    captured = []

    class CountingBackend(DuckDBMergeBackend):
        def merge(self, delta, grouping, fact, batch_id):
            captured.append((tuple(grouping), delta.count()))
            super().merge(delta, grouping, fact, batch_id)

    backend = CountingBackend(str(tmp_path / "b.duckdb"))
    sink = RollupMergeSink(eng, store, "hits", "user", backend=backend)
    sink(batch, 0)
    sizes = dict(captured)
    # groupings: (company, user) and (user,) — both 3 users x 2 buckets
    assert all(n == 6 for n in sizes.values()), sizes
    # and the merged content carries the full 3000-event mass
    for g in sizes:
        pdf = backend.read_rollup(list(g), "hits")
        assert int(pdf["counter"].sum()) == 3000
