"""Raw event storage — the engine's source of truth.

The reference stores only mutated rollup rows (per-event JDBC upserts,
/root/reference/src/time_series_storage/postgres/update.clj:41-93); raw
events are never kept. We invert that (SURVEY.md section 7.1): events are
append-only and rollups are derived, which preserves every query's
observable semantics while giving replay, late data with unbounded
lateness, and new-rollup backfill for free.

Event schema (reference new-fact! signature, api.clj:23-26):

    fact:  string                 fact id
    ts:    timestamp              event time (arbitrary lateness allowed)
    value: double                 measure (inc! => 1.0)
    dims:  map<string,string>     category values; nil values rejected upstream

Two stores:

* ``MemoryEventStore`` — driver-side row buffer + ingested DataFrames.
  For tests and small interactive sessions.
* ``ParquetEventStore`` — parquet directory partitioned by
  ``fact, p_date`` (day of ts). At 100 TB this is the layout that makes
  every query's first step a partition-pruned scan: the fact equality
  predicate prunes to one fact's subtree and the slice-range predicate
  prunes to the covered days; within files, the Parquet min/max on ``ts``
  skips row groups. Atomicity: each append is one parquet commit
  (all-or-nothing at the FileOutputCommitter level), the analogue of the
  reference's one-transaction-per-event guarantee (common.clj:34-38).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
from typing import Iterable, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("fact", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("dims", T.MapType(T.StringType(), T.StringType()), False),
    ]
)


class EventStore:
    """Interface: append events, read them back as one DataFrame."""

    def append_rows(
        self, rows: Iterable[tuple[str, dt.datetime, float, Mapping[str, str]]]
    ) -> None:
        raise NotImplementedError

    def append_df(self, df: DataFrame) -> None:
        """Bulk ingest of a DataFrame already in EVENT_SCHEMA column order."""
        raise NotImplementedError

    def events_df(self) -> DataFrame:
        raise NotImplementedError

    def clear(self) -> None:
        raise NotImplementedError


class MemoryEventStore(EventStore):
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._rows: list[tuple] = []
        self._dfs: list[DataFrame] = []

    def append_rows(self, rows) -> None:
        self._rows.extend(
            (str(f), ts, float(v), dict(d)) for f, ts, v, d in rows
        )

    def append_df(self, df: DataFrame) -> None:
        self._dfs.append(df.select(*EVENT_SCHEMA.fieldNames()))

    def events_df(self) -> DataFrame:
        dfs = list(self._dfs)
        if self._rows or not dfs:
            dfs.append(self.spark.createDataFrame(self._rows, EVENT_SCHEMA))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def clear(self) -> None:
        self._rows.clear()
        self._dfs.clear()


class ParquetEventStore(EventStore):
    """Parquet-backed store partitioned by (fact, p_date).

    ``p_date`` is a physical partition column derived from ``ts``; readers
    get it back alongside the logical columns so the engine can add a
    partition-pruning predicate for time ranges.
    """

    PARTITION_COLS = ("fact", "p_date")

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _with_pdate(self, df: DataFrame) -> DataFrame:
        return df.withColumn("p_date", F.to_date("ts"))

    def append_rows(self, rows) -> None:
        rows = [(str(f), ts, float(v), dict(d)) for f, ts, v, d in rows]
        df = self.spark.createDataFrame(rows, EVENT_SCHEMA)
        self.append_df(df)

    def append_df(self, df: DataFrame) -> None:
        (
            self._with_pdate(df.select(*EVENT_SCHEMA.fieldNames()))
            .write.mode("append")
            .partitionBy(*self.PARTITION_COLS)
            .parquet(self.path)
        )

    def events_df(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self._with_pdate(
                self.spark.createDataFrame([], EVENT_SCHEMA)
            )
        # note: StructType.add mutates in place — build a fresh schema
        full = T.StructType(
            list(EVENT_SCHEMA.fields) + [T.StructField("p_date", T.DateType())]
        )
        return self.spark.read.schema(full).parquet(self.path)

    def expire(self, before: dt.date, fact: Optional[str] = None) -> int:
        """Retention: drop every (fact, p_date) partition strictly older
        than ``before`` (optionally one fact only). Whole-directory
        removal, no data rewrite or scan — the operational payoff of
        date partitioning at scale. Returns partitions dropped."""
        removed = 0
        if not os.path.exists(self.path):
            return 0
        for fd in sorted(os.listdir(self.path)):
            if not fd.startswith("fact="):
                continue
            if fact is not None and fd != f"fact={fact}":
                continue
            fdir = os.path.join(self.path, fd)
            for pd_ in sorted(os.listdir(fdir)):
                if not pd_.startswith("p_date="):
                    continue
                d = dt.date.fromisoformat(pd_.split("=", 1)[1])
                if d < before:
                    shutil.rmtree(os.path.join(fdir, pd_), ignore_errors=True)
                    removed += 1
        return removed

    # compaction scratch: underscore-prefixed, so invisible to parquet
    # readers AND outside the partitioned namespace — a crash can never
    # strand data under a directory that parses as a bogus partition
    COMPACT_STAGING = "_compact"
    COMPACT_TRASH = "_compact_trash"
    COMPACT_JOURNAL = "_swap.json"

    # test seam: set to a callable(stage, rel) to inject a crash at a
    # chosen point of the swap ("pre_swap" / "mid_swap" / "post_swap")
    _compact_fault = None

    def compact(self, max_files: int = 1) -> int:
        """Rewrite fragmented (fact, p_date) partitions to one file each.

        Streaming appends accumulate one file set per micro-batch, and
        scan cost grows with file *count*, not data size — periodic
        compaction is the standard maintenance for an append-only
        layout. One Spark job rewrites every fragmented partition (read
        restricted to exactly those partitions, clustered so each gets
        a single writer).

        Crash safety: the swap is journaled. Before any rename, a swap
        plan (partition list + the exact parquet file set each rewrite
        covered) lands in the staging dir; each partition then swaps via
        ``os.replace(live, trash)`` + ``os.replace(new, live)`` with the
        trash *outside* the partitioned tree. A crash at any point is
        repaired by :meth:`_compact_recover` (run automatically at the
        next compact): a partition caught between the two renames is
        completed from staging (or restored from trash), so no partition
        is ever lost and no half-state survives.

        Concurrent appends: files appended after the fragmentation scan
        are NOT lost — they ride along into the trash and are salvaged
        back into the live partition (their names are not in the
        journaled snapshot). The one unprotected race is an append
        landing in the instant between the two renames of its exact
        partition, which recreates the live dir and makes the second
        rename fail — compact() then raises and the next run restores
        from trash; prefer not to run compaction concurrently with
        appends to the same partitions. Returns partitions rewritten.
        """
        if not os.path.exists(self.path):
            return 0
        self._compact_recover()
        frag: list[tuple[str, str, str, list[str]]] = []
        for fd in sorted(os.listdir(self.path)):
            if not fd.startswith("fact="):
                continue
            for pd_ in sorted(os.listdir(os.path.join(self.path, fd))):
                if not pd_.startswith("p_date="):
                    continue
                live = os.path.join(self.path, fd, pd_)
                files = sorted(
                    f for f in os.listdir(live) if f.endswith(".parquet")
                )
                if len(files) > max_files:
                    frag.append(
                        (fd.split("=", 1)[1], pd_.split("=", 1)[1], live, files)
                    )
        if not frag:
            return 0
        staging = os.path.join(self.path, self.COMPACT_STAGING)
        trash_root = os.path.join(self.path, self.COMPACT_TRASH)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash_root, ignore_errors=True)
        keys = [f"{f}/{d}" for f, d, _, _ in frag]
        # rectangle of plain partition-column predicates first (these
        # prune the scan); the exact (fact, date) pair filter narrows
        # any rectangle over-read after pruning
        facts = sorted({f for f, _, _, _ in frag})
        dates = sorted({dt.date.fromisoformat(d) for _, d, _, _ in frag})
        df = self.events_df().where(
            F.col("fact").isin(facts)
            & F.col("p_date").isin(dates)
            & F.concat(
                F.col("fact"), F.lit("/"), F.col("p_date").cast("string")
            ).isin(keys)
        )
        (
            df.repartition(F.col("fact"), F.col("p_date"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 10_000_000)
            .partitionBy(*self.PARTITION_COLS)
            .parquet(staging)
        )
        # journal BEFORE the first rename: recovery replays from it
        plan = [
            {"rel": f"fact={f}/p_date={d}", "files": files}
            for f, d, _, files in frag
        ]
        with open(os.path.join(staging, self.COMPACT_JOURNAL), "w") as fh:
            json.dump(plan, fh)
        for f, d, live, files in frag:
            rel = f"fact={f}/p_date={d}"
            new_dir = os.path.join(staging, rel)
            if not os.path.exists(new_dir):
                continue  # partition read as empty (shouldn't happen)
            trash = os.path.join(trash_root, rel)
            os.makedirs(os.path.dirname(trash), exist_ok=True)
            self._fault("pre_swap", rel)
            os.replace(live, trash)
            self._fault("mid_swap", rel)
            os.replace(new_dir, live)
            self._fault("post_swap", rel)
            self._salvage_appends(trash, live, files)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash_root, ignore_errors=True)
        return len(frag)

    def _fault(self, stage: str, rel: str) -> None:
        if self._compact_fault is not None:
            self._compact_fault(stage, rel)

    @staticmethod
    def _salvage_appends(trash: str, live: str, snapshot: list[str]) -> None:
        """Move any parquet file that appeared in the partition after
        the fragmentation scan (name not in the journaled snapshot)
        from trash back into the live dir. Spark part-file names are
        job-unique, so there is no collision with compacted output."""
        if not os.path.isdir(trash):
            return
        for fname in os.listdir(trash):
            if fname.endswith(".parquet") and fname not in snapshot:
                os.replace(
                    os.path.join(trash, fname), os.path.join(live, fname)
                )

    def _compact_recover(self) -> None:
        """Repair a compaction that crashed mid-swap (idempotent; runs
        at the start of every compact). For each journaled partition:
        complete the swap from staging if the live dir is missing,
        restore from trash as a last resort, and salvage any
        concurrently-appended files still in trash. Scratch dirs are
        then dropped; without a journal (crash before any rename) the
        staged output is simply discarded."""
        staging = os.path.join(self.path, self.COMPACT_STAGING)
        trash_root = os.path.join(self.path, self.COMPACT_TRASH)
        jpath = os.path.join(staging, self.COMPACT_JOURNAL)
        if os.path.exists(jpath):
            with open(jpath) as fh:
                plan = json.load(fh)
            for entry in plan:
                rel, files = entry["rel"], entry["files"]
                live = os.path.join(self.path, rel)
                new_dir = os.path.join(staging, rel)
                trash = os.path.join(trash_root, rel)
                if not os.path.exists(live):
                    if os.path.exists(new_dir):
                        os.replace(new_dir, live)  # finish the swap
                    elif os.path.exists(trash):
                        os.replace(trash, live)  # roll back
                self._salvage_appends(trash, live, files)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash_root, ignore_errors=True)

    def clear(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
