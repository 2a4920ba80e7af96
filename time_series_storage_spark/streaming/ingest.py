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


class IdempotentAppendSink:
    """foreachBatch sink: append micro-batches to a ParquetEventStore,
    skipping batch ids already committed (marker files written *after*
    the append — a replayed half-written batch re-appends, a committed
    one is skipped; markers live under ``<path>/_batches``)."""

    def __init__(self, store: ParquetEventStore):
        self.store = store
        self.marker_dir = os.path.join(store.path, "_batches")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.marker_dir, str(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return
        self.store.append_df(batch_df.select(*EVENT_SCHEMA.fieldNames()))
        os.makedirs(self.marker_dir, exist_ok=True)
        with open(self._marker(batch_id), "w") as fh:
            fh.write("committed")


def streaming_append(events: DataFrame, store: ParquetEventStore):
    """Unbounded-lateness ingestion: stream -> event store appends.

    Returns an un-started ``DataStreamWriter``; callers pick the trigger
    (``availableNow`` for backfill, processing-time for live) and the
    checkpoint location.
    """
    return events.writeStream.foreachBatch(IdempotentAppendSink(store))


class RollupMergeSink:
    """foreachBatch sink: incrementally maintain one materialized rollup.

    The streaming analogue of the reference's per-event rollup upserts
    (update.clj:41-93) with *unbounded lateness*: each micro-batch is
    aggregated to slice grain, the affected bucket-date partitions of
    the rollup are read back, merged (measures are partial aggregates,
    so merge = re-aggregate the union), and rewritten with dynamic
    partition overwrite — only touched dates are rewritten, however old
    the event. Exactly-once via the same marker-file protocol as
    IdempotentAppendSink. On Delta/Iceberg this becomes MERGE INTO; the
    parquet variant keeps the engine dependency-free.
    """

    def __init__(self, engine, store, fact_id: str, dimension_id: str):
        from ..operators.rollup import best_grouping

        self.engine = engine
        self.store = store
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

    def _merge_one(self, delta: DataFrame, grouping: list[str]) -> None:
        delta = delta.withColumn("p_date", F.to_date("ts")).persist()
        dates = [r["p_date"] for r in delta.select("p_date").distinct().collect()]
        if not dates:
            delta.unpersist()
            return
        out_dir = os.path.join(
            self.store.path, "_".join([*grouping, self.fact.id])
        )
        existing = None
        if os.path.exists(out_dir):
            existing = self.store.spark.read.parquet(out_dir).where(
                F.col("p_date").isin(dates)
            )
        merged = delta if existing is None else existing.unionByName(delta)
        keys = [*grouping, "ts", "p_date"]
        if self.fact.type == "histogram":
            keys.append("bucket_lo")
        aggs = [F.sum("counter").alias("counter")]
        if self.fact.type == "average":
            aggs.append(F.sum("total").alias("total"))
        merged = merged.groupBy(*keys).agg(*aggs)
        (
            # cluster by p_date so each maintained date partition stays
            # one file (bounded at scale by maxRecordsPerFile) — the
            # read path's file-listing cost must not grow per batch
            merged.repartition(F.col("p_date"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", 5_000_000)
            .partitionBy("p_date")
            .parquet(out_dir)
        )
        delta.unpersist()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(self.marker_dir, str(batch_id))
        if os.path.exists(marker):
            return
        batch_df.persist()
        for grouping in self.groupings:
            self._merge_one(self._batch_rollup(batch_df, grouping), grouping)
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
