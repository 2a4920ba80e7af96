"""Materialized rollup lattice — the reference's physical layout, on parquet.

The reference maintains one mutable SQL table per (grouping path x fact)
(naming ``join("_", path + [dim] + [fact])``,
/root/reference/src/time_series_storage/postgres/common.clj:25-32; DDL
schema.clj:220-241) and every read scans the best covering table
(postgres/query.clj:19-47). This module reproduces that layout as
derived state: each rollup is the engine's ``rollup_df`` written to a
parquet directory partitioned by bucket date.

Division of labor at scale:

* **on-demand** (default engine path) — aggregate raw events per query;
  right when queries are rare relative to data growth.
* **materialized** (this module) — pay the aggregation once, then every
  ``get_timeseries`` over the rollup reads only (series x slices)-many
  pre-aggregated rows with partition pruning on the bucket date; right
  for hot dashboards over append-mostly data. ``refresh`` re-derives
  from raw events (and Structured Streaming's ``streaming_rollup`` is
  the incremental twin).

Because rollup measures are partial aggregates (counts/sums — never the
average itself), collapsing a rollup to any coarser step grain is exact
(SURVEY.md section 1.2).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def rollup_name(grouping: list[str], fact_id: str) -> str:
    """Reference table naming: join("_", path + [dim] + [fact])
    (postgres/common.clj:25-32) — ``grouping`` already ends with dim."""
    return "_".join([*grouping, fact_id])


class VersionedStore:
    """The snapshot-commit protocol shared by every derived-state store
    in the engine (materialized rollups, the IVF vector index):
    versioned directories under a root plus an atomic current-version
    pointer.

    Layout::

        <root>/_current        {"version": "v...", ...extra fields}
        <root>/v00000007/...   one complete artifact per version

    Readers resolve ``_current`` and scan that version. Writers build
    the next version directory in full and then flip ``_current`` with
    one ``os.replace`` — the miniature of a Delta/Iceberg snapshot
    commit: a crash at any point leaves readers on the old complete
    version, and because the pointer flip carries arbitrary metadata
    (a streaming batch id, a corpus fingerprint), "data visible" and
    "provenance committed" are one atomic event."""

    CURRENT = "_current"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def current_meta(self, root: str) -> Optional[dict]:
        """The committed pointer ({"version", ...}), or None."""
        try:
            with open(os.path.join(root, self.CURRENT)) as fh:
                return json.load(fh)
        except (FileNotFoundError, NotADirectoryError, json.JSONDecodeError):
            return None

    def next_version(self, meta: Optional[dict]) -> str:
        n = 0 if meta is None else int(meta["version"][1:]) + 1
        return f"v{n:08d}"

    def publish(
        self,
        root: str,
        version: str,
        batch: Optional[int] = None,
        extra: Optional[dict] = None,
    ) -> None:
        """Atomically flip ``_current`` to ``version`` (optionally
        recording the streaming batch id and any extra provenance
        fields), then GC all other version directories."""
        meta = dict(extra or {})
        meta["version"] = version
        if batch is not None:
            meta["batch"] = int(batch)
        tmp = os.path.join(root, self.CURRENT + "._tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(root, self.CURRENT))
        for name in os.listdir(root):
            if name.startswith("v") and name != version:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)


class RollupStore(VersionedStore):
    """Parquet-backed materialized rollups, one versioned directory per
    rollup (``VersionedStore`` commit protocol, one root per rollup
    name). Each version is the rollup's parquet tree partitioned by the
    slice bucket's date, so time-range queries prune partitions exactly
    like the raw event store does."""

    def _dir(self, grouping: list[str], fact_id: str) -> str:
        return os.path.join(self.path, rollup_name(grouping, fact_id))

    def current_version_dir(
        self, grouping: list[str], fact_id: str
    ) -> Optional[str]:
        root = self._dir(grouping, fact_id)
        meta = self.current_meta(root)
        if meta is None:
            return None
        d = os.path.join(root, meta["version"])
        return d if os.path.exists(d) else None

    def exists(self, grouping: list[str], fact_id: str) -> bool:
        return self.current_version_dir(grouping, fact_id) is not None

    def materialize(
        self, engine, fact_id: str, dimension_id: str, single_pass: bool = True
    ) -> list[str]:
        """(Re)derive every grouping-path rollup of a (fact, dimension).

        The reference creates the same set of tables per dimension
        (schema.clj:230-239) but pays a per-event upsert forever after.
        Here, with ``single_pass`` (default) a dimension with multiple
        grouping paths is refreshed with ONE ``GROUPING SETS``
        aggregation — one scan + one shuffle feeds the whole lattice,
        instead of one job per path. Returns the rollup names written.
        """
        dim = engine.catalog.dimension(dimension_id)
        groupings = []
        for path in dim.grouped_by:
            g = [*path, dim.id]
            if g not in groupings:
                groupings.append(g)
        agg = None
        if single_pass and len(groupings) > 1:
            frames, agg = self._lattice_single_pass(
                engine, fact_id, dim, groupings
            )
        else:
            frames = {
                tuple(g): engine.rollup_df(fact_id, dimension_id, grouping=g)
                for g in groupings
            }
        written = []
        for g in groupings:
            self._write(frames[tuple(g)], g, fact_id)
            written.append(rollup_name(g, fact_id))
        if agg is not None:
            agg.unpersist()
        return written

    def _write(self, df, grouping: list[str], fact_id: str) -> None:
        root = self._dir(grouping, fact_id)
        os.makedirs(root, exist_ok=True)
        prev = self.current_meta(root)
        version = self.next_version(prev)
        staging = os.path.join(root, version)
        shutil.rmtree(staging, ignore_errors=True)
        (
            # cluster by the partition column before the partitioned
            # write: without it every shuffle partition emits a sliver
            # file into every p_date dir, and at read time file-listing +
            # per-file open overhead dwarfs the (tiny, pre-aggregated)
            # rollup data — "materialized must not lose to raw at any
            # scale". One writer task per date, capped so a skewed date
            # still splits into bounded files at cluster scale.
            df.withColumn("p_date", F.to_date("ts"))
            .repartition(F.col("p_date"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 5_000_000)
            .partitionBy("p_date")
            .parquet(staging)
        )
        # flip after a complete write: readers never see a half rollup.
        # The merged-batch high-watermark (written by RollupMergeSink)
        # survives a full re-materialization: the fresh derivation from
        # raw events already CONTAINS every merged batch's data, so a
        # later replay of one of those batches must still be skipped —
        # dropping the watermark here is exactly the double-count
        # window the streaming replay guard exists to close.
        extra = {}
        if prev is not None and prev.get("merged_batch") is not None:
            extra["merged_batch"] = int(prev["merged_batch"])
        self.publish(root, version, extra=extra or None)

    def _lattice_single_pass(
        self, engine, fact_id: str, dim, groupings: list[list[str]]
    ) -> tuple[dict, DataFrame]:
        """All grouping-path rollups of one (fact, dimension) from a
        single GROUPING SETS aggregation. Returns (frames, agg) where
        ``agg`` is the persisted lattice the frames slice — the caller
        unpersists it once the writes are done.

        The per-path "all key dims present" rule (reference event-key,
        update.clj:11-26) falls out for free: a missing dim is a null
        group key within that set, and dropping null-keyed *output*
        groups equals dropping null-keyed *input* rows per set (groups
        aggregate independently).
        """
        from ..functions.time import slice_expr
        from ..operators.collapse import histogram_bucket_expr

        fact = engine.catalog.fact(fact_id)
        slice_minutes = dim.slice or fact.slice
        all_dims = []
        for g in groupings:
            for c in g:
                if c not in all_dims:
                    all_dims.append(c)
        ev = engine.store.events_df().where(F.col("fact") == fact.id)
        rows = ev.select(
            *[F.col("dims").getItem(c).alias(c) for c in all_dims],
            slice_expr(F.col("ts"), slice_minutes).alias("ts"),
            F.col("value"),
        )
        fixed = ["ts"]  # keys present in every set
        if fact.type == "histogram":
            rows = rows.withColumn(
                "bucket_lo", histogram_bucket_expr("value", fact)
            )
            fixed.append("bucket_lo")
        if fact.type == "counter":
            aggs = [F.sum("value").alias("counter")]
        elif fact.type == "average":
            aggs = [
                F.count(F.lit(1)).alias("counter"),
                F.sum("value").alias("total"),
            ]
        else:
            aggs = [F.count(F.lit(1)).alias("counter")]
        key_order = all_dims + fixed
        sets = [[*g, *fixed] for g in groupings]
        agg = (
            rows.groupingSets(sets, *key_order)
            .agg(*aggs, F.grouping_id().alias("_gid"))
            .persist()
        )
        n = len(key_order)
        frames = {}
        for g, set_cols in zip(groupings, sets):
            # grouping_id: bit (n-1-i) set iff key_order[i] aggregated away
            gid = sum(
                1 << (n - 1 - i)
                for i, c in enumerate(key_order)
                if c not in set_cols
            )
            df = agg.where(F.col("_gid") == gid).select(
                *g, *fixed,
                *[c for c in ("counter", "total") if c in agg.columns],
            )
            for c in g:
                df = df.where(F.col(c).isNotNull())
            frames[tuple(g)] = df
        return frames, agg

    def materialize_all(self, engine) -> list[str]:
        """The full lattice: every non-group_only dimension x tracked
        fact x grouping path (the reference's create-dimension! cross
        product, schema.clj:220-241)."""
        written = []
        for dim in engine.catalog.dimensions():
            if dim.group_only:
                continue
            for fact_id in sorted(dim.facts):
                written += self.materialize(engine, fact_id, dim.id)
        return written

    def read(self, grouping: list[str], fact_id: str) -> DataFrame | None:
        """Rollup scan of the current committed version, or None when
        this rollup was never materialized (callers fall back to raw)."""
        d = self.current_version_dir(grouping, fact_id)
        if d is None:
            return None
        return self.spark.read.parquet(d)

    def drop(self, grouping: list[str], fact_id: str) -> None:
        """Drop one materialized rollup (readers fall back to raw)."""
        shutil.rmtree(self._dir(grouping, fact_id), ignore_errors=True)

    def invalidate(self, dim, fact_id: str) -> None:
        """Drop every grouping-path rollup of one (dimension x fact) —
        called when the combination is (re)attached, mirroring the
        reference's table re-creation at attach time
        (postgres/schema.clj:244-259)."""
        for path in dim.grouped_by:
            self.drop([*path, dim.id], fact_id)

    def drop_all(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
