"""Structured Streaming ingestion (SURVEY.md section 7.2 step 6).

The reference ingests synchronously: one JDBC transaction of
(dims x paths) upserts per event (postgres/update.clj:83-93). The
streaming translation has two modes, matching the two lateness regimes
(SURVEY.md section 2.3 "Streaming constructs"):

* ``streaming_rollup`` — stateful windowed aggregation with a watermark:
  ``withWatermark(ts, ...) -> groupBy(window(ts, slice), dims) -> agg``.
  State is evicted past the watermark, so lateness is *bounded* — the
  idiomatic Spark shape for live dashboards. Slice widths must divide
  60 so epoch-aligned ``window()`` equals the engine's hour-aligned
  slice bucketing (functions/time.py slice_expr; the reference floors
  minute-of-hour, postgres/common.clj:7-23, so for its valid slices the
  two agree).

* ``streaming_append`` — ``foreachBatch`` appending each micro-batch to
  the engine's event store. Rollups stay derived-at-read, so an event
  may arrive arbitrarily late and still lands in its (old) bucket — the
  reference's unbounded-lateness semantics (update.clj:22-26 buckets
  purely from the supplied timestamp). Exactly-once: the sink tracks
  committed batch ids in ``_batches/<id>`` marker files and skips
  replayed batches on restart recovery, making the append idempotent.

At cluster scale the stateful path shuffles once per micro-batch on
(window x dims) with partial aggregation upstream of the state store;
the append path is shuffle-free (partitioned parquet writes only).
"""

from __future__ import annotations

import os
import shutil
from typing import Mapping, Optional

from pyspark.sql import DataFrame, functions as F

from ..catalog import Fact
from ..errors import InvalidSliceError
from ..sources.events import EVENT_SCHEMA, ParquetEventStore


def stream_events(
    stream_df: DataFrame,
    fact_id: str,
    ts_col: str = "ts",
    value_col: str = "value",
    dim_cols: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Normalize any streaming source into the engine's event schema
    (the streaming twin of TimeSeries.ingest_df)."""
    pairs = []
    for dim_id, src in dict(dim_cols or {}).items():
        pairs.append(F.lit(str(dim_id)))
        pairs.append(F.col(src).cast("string"))
    return stream_df.select(
        F.lit(str(fact_id)).alias("fact"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.create_map(*pairs).alias("dims"),
    )


def streaming_rollup(
    events: DataFrame,
    fact: Fact,
    grouping: list[str],
    watermark: str = "1 hour",
    slice_minutes: Optional[int] = None,
) -> DataFrame:
    """Watermarked windowed rollup stream for one (fact x grouping path).

    Output schema matches the batch ``TimeSeries.rollup_df``: grouping
    dims + ``ts`` (slice bucket start) + measures. Run with
    ``outputMode("update")`` (or "complete" to a memory sink); each
    state update is the streaming analogue of one reference upsert
    (update.clj:41-59).
    """
    slice_minutes = slice_minutes or fact.slice
    if 60 % slice_minutes != 0:
        # epoch-aligned window() != hour-aligned slice for these; the
        # foreachBatch path (streaming_append + derived rollups) has no
        # such restriction
        raise InvalidSliceError(slice_minutes)
    ev = events.withWatermark("ts", watermark)
    keys = [F.col("dims").getItem(g).alias(g) for g in grouping]
    win = F.window(F.col("ts"), f"{slice_minutes} minutes")
    if fact.type == "counter":
        aggs = [F.sum("value").alias("counter")]
    elif fact.type == "average":
        aggs = [F.count(F.lit(1)).alias("counter"), F.sum("value").alias("total")]
    else:
        from ..operators.collapse import histogram_bucket_expr

        keys.append(histogram_bucket_expr("value", fact).alias("bucket_lo"))
        aggs = [F.count(F.lit(1)).alias("counter")]
    return (
        ev.where(F.col("fact") == fact.id)
        .groupBy(win, *keys)
        .agg(*aggs)
        .select(F.col("window.start").alias("ts"), "*")
        .drop("window")
    )


def streaming_sessions(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful twin of the
    batch ``operators.sessions.session_stats``.

    Spark-first: ``F.session_window`` is the built-in session state
    machine (merging windows in the state store, evicted past the
    watermark) — no custom ``applyInPandasWithState`` needed for plain
    gap sessions. Output per closed/updated session: keys + session
    window start/end + n_events + start_ts/end_ts + duration_s.

    Boundary semantics: session_window splits at gaps >= the gap
    duration (window ends are exclusive), while the batch operator
    splits at gaps strictly > the gap — events spaced *exactly* the gap
    apart differ; everything else agrees.
    """
    ev = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        ev.groupBy(*[F.col(k) for k in key_cols], win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .select(
            *key_cols,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
            "start_ts",
            "end_ts",
            (
                F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts")
            ).cast("long").alias("duration_s"),
        )
    )


class IdempotentAppendSink:
    """foreachBatch sink: exactly-once append of micro-batches to a
    ParquetEventStore via stage-then-publish.

    Each batch is written once to ``<path>/_staging/<batch_id>`` (a
    normal partitioned parquet job; ``_SUCCESS`` marks it complete),
    then *published* by moving every part file into its mirrored
    partition directory of the store — ``os.replace`` per file, so a
    replay after a crash mid-publish just moves the files that remain
    in staging (already-moved files are gone from staging and never
    moved twice). The marker written after publish is an optimization;
    correctness comes from the moves being idempotent. Underscore
    directories are invisible to parquet readers, so staged batches
    never leak into ``events_df``.
    """

    def __init__(self, store: ParquetEventStore):
        self.store = store
        self.marker_dir = os.path.join(store.path, "_batches")
        self.staging_root = os.path.join(store.path, "_staging")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.marker_dir, str(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return
        staging = os.path.join(self.staging_root, str(batch_id))
        if not os.path.exists(os.path.join(staging, "_SUCCESS")):
            # never started (or died mid-write): (re)stage from scratch
            shutil.rmtree(staging, ignore_errors=True)
            (
                batch_df.select(*EVENT_SCHEMA.fieldNames())
                .withColumn("p_date", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy(*ParquetEventStore.PARTITION_COLS)
                .parquet(staging)
            )
        # publish: move staged part files into the live partition tree
        for dirpath, _dirs, files in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            parts = [f for f in files if f.endswith(".parquet")]
            if not parts:
                continue
            dst_dir = (
                self.store.path
                if rel == "."
                else os.path.join(self.store.path, rel)
            )
            os.makedirs(dst_dir, exist_ok=True)
            for f in parts:
                os.replace(
                    os.path.join(dirpath, f), os.path.join(dst_dir, f)
                )
        os.makedirs(self.marker_dir, exist_ok=True)
        with open(self._marker(batch_id), "w") as fh:
            fh.write("committed")
        shutil.rmtree(staging, ignore_errors=True)


def streaming_append(events: DataFrame, store: ParquetEventStore):
    """Unbounded-lateness ingestion: stream -> event store appends.

    Returns an un-started ``DataStreamWriter``; callers pick the trigger
    (``availableNow`` for backfill, processing-time for live) and the
    checkpoint location.
    """
    return events.writeStream.foreachBatch(IdempotentAppendSink(store))


class RollupMergeBackend:
    """The MERGE seam: how one micro-batch's rollup delta is applied to
    durable storage.

    Contract (what RollupMergeSink relies on, per (batch x grouping)):

    * ``merge`` is ATOMIC — readers see the rollup wholly before or
      wholly after the merge, never a partial state; a crash mid-merge
      leaves the previous state visible and complete.
    * a committed merge durably records ``batch_id`` such that
      ``last_merged_batch`` returns it (or a later batch) afterwards —
      commit-of-data and commit-of-provenance are one event.
    * ``last_merged_batch`` is a merged-batch HIGH-WATERMARK: every
      batch at or below it is fully contained in the rollup. Batch ids
      are monotonic per stream (Structured Streaming checkpoint).

    The sink guarantees exactly-once on top of this: it skips any
    (batch, grouping) at or below the watermark, so replays after a
    crash re-merge only the groupings that had not committed.

    Implementations: :class:`ParquetVersionMergeBackend` (default —
    versioned parquet via RollupStore, dependency-free). On a
    Delta/Iceberg lakehouse this becomes ``MERGE INTO`` keyed by
    (grouping dims, ts[, bucket_lo]) with the batch id carried in the
    commit's application metadata — the two methods below map 1:1 onto
    that commit protocol (Delta: ``txn`` application-transaction ids /
    ``commitInfo`` userMetadata; Iceberg: snapshot summary properties).

    Environment note: a Delta implementation was planned for this
    container but ``delta-spark`` is not installed and package
    installation is unavailable (re-checked round 8: no delta/iceberg
    jars on the Spark classpath, no ``delta`` / ``pyiceberg`` module,
    and installs remain prohibited in this environment). The seam is
    instead proven TWICE by real backends: this module's versioned-
    parquet default, and :class:`~.duckdb_backend.DuckDBMergeBackend`
    (ACID upsert + same-transaction watermark against DuckDB), both
    passing the same contract/convergence tests
    (tests/test_streaming_rollup_refresh.py) that pin exactly the
    calls and atomicity a ``MERGE INTO`` backend must honor.
    """

    def last_merged_batch(
        self, grouping: list[str], fact_id: str
    ) -> Optional[int]:
        raise NotImplementedError

    def merge(
        self, delta: DataFrame, grouping: list[str], fact: Fact, batch_id: int
    ) -> None:
        raise NotImplementedError


class ParquetVersionMergeBackend(RollupMergeBackend):
    """Default backend: versioned parquet through a RollupStore.

    The affected bucket-date partitions of the current rollup version
    are read back, merged (measures are partial aggregates, so merge =
    re-aggregate the union), and written as the *next* version — merged
    dates from Spark, untouched dates hard-linked from the current
    version — then committed by the store's atomic ``_current`` flip
    carrying the merged-batch watermark. A crash mid-version-build
    leaves the previous version visible and complete; publication and
    watermark advance are one ``os.replace``.
    """

    def __init__(self, store):
        self.store = store

    def last_merged_batch(
        self, grouping: list[str], fact_id: str
    ) -> Optional[int]:
        meta = self.store.current_meta(self.store._dir(grouping, fact_id))
        if meta is None:
            return None
        if meta.get("merged_batch") is not None:
            return int(meta["merged_batch"])
        if meta.get("batch") is not None:  # legacy last-batch pointers
            return int(meta["batch"])
        return None

    def merge(
        self, delta: DataFrame, grouping: list[str], fact: Fact, batch_id: int
    ) -> None:
        root = self.store._dir(grouping, fact.id)
        meta = self.store.current_meta(root)
        delta = delta.withColumn("p_date", F.to_date("ts")).persist()
        dates = [r["p_date"] for r in delta.select("p_date").distinct().collect()]
        if not dates:
            delta.unpersist()
            return  # nothing to merge: replaying this no-op is safe
        cur_dir = self.store.current_version_dir(grouping, fact.id)
        existing = None
        if cur_dir is not None:
            existing = self.store.spark.read.parquet(cur_dir).where(
                F.col("p_date").isin(dates)
            )
        merged = delta if existing is None else existing.unionByName(delta)
        keys = [*grouping, "ts", "p_date"]
        if fact.type == "histogram":
            keys.append("bucket_lo")
        aggs = [F.sum("counter").alias("counter")]
        if fact.type == "average":
            aggs.append(F.sum("total").alias("total"))
        merged = merged.groupBy(*keys).agg(*aggs)
        os.makedirs(root, exist_ok=True)
        version = self.store.next_version(meta)
        staging = os.path.join(root, version)
        shutil.rmtree(staging, ignore_errors=True)
        (
            # cluster by p_date so each maintained date partition stays
            # one file (bounded at scale by maxRecordsPerFile) — the
            # read path's file-listing cost must not grow per batch
            merged.repartition(F.col("p_date"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 5_000_000)
            .partitionBy("p_date")
            .parquet(staging)
        )
        # untouched date partitions carry over as hard links (same-fs,
        # O(file count)); merged dates were rewritten above
        if cur_dir is not None:
            touched = {f"p_date={d.isoformat()}" for d in dates}
            for name in os.listdir(cur_dir):
                src = os.path.join(cur_dir, name)
                if (
                    not name.startswith("p_date=")
                    or name in touched
                    or not os.path.isdir(src)
                ):
                    continue
                dst = os.path.join(staging, name)
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    if not f.startswith(("_", ".")):
                        os.link(os.path.join(src, f), os.path.join(dst, f))
        # one atomic flip commits the merged data AND the watermark
        self.store.publish(
            root, version, batch=int(batch_id),
            extra={"merged_batch": int(batch_id)},
        )
        delta.unpersist()


class RollupMergeSink:
    """foreachBatch sink: incrementally maintain one materialized rollup.

    The streaming analogue of the reference's per-event rollup upserts
    (update.clj:41-93) with *unbounded lateness*: each micro-batch is
    aggregated to slice grain per grouping path, and each delta is
    applied through the :class:`RollupMergeBackend` seam (default:
    versioned parquet, see :class:`ParquetVersionMergeBackend`).
    Exactly-once per (batch x grouping) rides on the backend contract:
    skip any batch at or below the backend's merged-batch watermark,
    merge the rest — a replayed batch re-merges only the groupings
    that had not committed.
    """

    def __init__(
        self,
        engine,
        store,
        fact_id: str,
        dimension_id: str,
        backend: Optional[RollupMergeBackend] = None,
    ):
        self.engine = engine
        self.store = store
        self.backend = backend or ParquetVersionMergeBackend(store)
        self.fact = engine.catalog.fact(fact_id)
        self.dim = engine.catalog.dimension(dimension_id)
        self.groupings = []
        for path in self.dim.grouped_by:
            g = [*path, self.dim.id]
            if g not in self.groupings:
                self.groupings.append(g)
        self.marker_dir = os.path.join(
            store.path, "_stream_batches", f"{fact_id}__{dimension_id}"
        )

    def _batch_rollup(self, batch_df: DataFrame, grouping: list[str]) -> DataFrame:
        from ..functions.time import slice_expr
        from ..operators.collapse import histogram_bucket_expr

        fact = self.fact
        slice_minutes = self.dim.slice or fact.slice
        ev = batch_df.where(F.col("fact") == fact.id)
        for g in grouping:
            ev = ev.where(F.col("dims").getItem(g).isNotNull())
        rows = ev.select(
            *[F.col("dims").getItem(g).alias(g) for g in grouping],
            slice_expr(F.col("ts"), slice_minutes).alias("ts"),
            F.col("value"),
        )
        keys = [F.col(c) for c in grouping] + [F.col("ts")]
        if fact.type == "counter":
            return rows.groupBy(*keys).agg(F.sum("value").alias("counter"))
        if fact.type == "average":
            return rows.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("counter"),
                F.sum("value").alias("total"),
            )
        return rows.groupBy(
            *keys, histogram_bucket_expr("value", fact).alias("bucket_lo")
        ).agg(F.count(F.lit(1)).alias("counter"))

    def _merge_one(
        self, delta: DataFrame, grouping: list[str], batch_id: int
    ) -> None:
        # replay guard: skip any batch at or below the backend's
        # merged-batch HIGH-WATERMARK — not just the last batch id — so
        # a materialize() (which republishes with no batch of its own)
        # interleaved between a partial commit and the replay cannot
        # reopen already-merged batches. Resetting the stream's
        # checkpoint (restarting batch ids) requires dropping or
        # re-materializing the rollups.
        hwm = self.backend.last_merged_batch(grouping, self.fact.id)
        if hwm is not None and int(batch_id) <= hwm:
            return  # this grouping already merged this batch (replay)
        self.backend.merge(delta, grouping, self.fact, int(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(self.marker_dir, str(batch_id))
        if os.path.exists(marker):
            return  # fast path; per-grouping commit is the correctness
        batch_df.persist()
        for grouping in self.groupings:
            self._merge_one(
                self._batch_rollup(batch_df, grouping), grouping, batch_id
            )
        batch_df.unpersist()
        os.makedirs(self.marker_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed")


def streaming_rollup_refresh(
    events: DataFrame, engine, store, fact_id: str, dimension_id: str
):
    """Incrementally maintained materialized rollups for one
    (fact x dimension): stream -> RollupMergeSink. The maintained
    layout is exactly ``plans.RollupStore``'s, so ``get_timeseries``
    serves from it transparently."""
    return events.writeStream.foreachBatch(
        RollupMergeSink(engine, store, fact_id, dimension_id)
    )


def streaming_m4(
    events: DataFrame,
    dims: list[str],
    bucket_seconds: int,
    ts_col: str = "ts",
    q_col: str = "q",
    id_col: str = "id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming M4 downsampling — the watermarked twin of
    ``operators.analytics.m4_downsample``: per (series, tumbling
    bucket) min/max/first/last of the quantized value, maintained
    incrementally in the state store.

    Spark-first: min/max/min_by/max_by are all ALGEBRAIC aggregates,
    so the built-in windowed aggregation holds exactly one partial
    aggregate per open (series, bucket) — no custom state. first/last
    ride the same composite ``epoch * 2^31 + id`` ordering key as the
    batch operator, which is what makes the streamed result CONVERGE
    to the batch output once the watermark passes a bucket (pinned in
    tests/test_streaming.py): the selection is a pure min/max over the
    same key set, independent of arrival order or micro-batching.

    State is bounded by the watermark; late rows beyond it drop (the
    standard bounded-state tradeoff, same as the rollup stream).
    Output: dims + bucket_ts + n_obs/min_q/max_q/first_q/last_q.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    ordk = (epoch * F.lit(2_147_483_648) + F.col(id_col)).alias("_o")
    ev = events.withWatermark(ts_col, watermark).select(
        *dims, F.col(ts_col), F.col(q_col).alias("_q"), ordk
    )
    win = F.window(F.col(ts_col), f"{bucket_seconds} seconds")
    return (
        ev.groupBy(win, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.min("_q").cast("long").alias("min_q"),
            F.max("_q").cast("long").alias("max_q"),
            F.min_by("_q", F.col("_o")).cast("long").alias("first_q"),
            F.max_by("_q", F.col("_o")).cast("long").alias("last_q"),
        )
        .select(F.col("window.start").alias("bucket_ts"), "*")
        .drop("window")
    )
