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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def rollup_name(grouping: list[str], fact_id: str) -> str:
    """Reference table naming: join("_", path + [dim] + [fact])
    (postgres/common.clj:25-32) — ``grouping`` already ends with dim."""
    return "_".join([*grouping, fact_id])


class RollupStore:
    """Parquet-backed materialized rollups, one directory per rollup.

    Layout: ``<root>/<rollup_name>/p_date=YYYY-MM-DD/*.parquet`` —
    partitioned by the slice bucket's date so time-range queries prune
    partitions exactly like the raw event store does.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _dir(self, grouping: list[str], fact_id: str) -> str:
        return os.path.join(self.path, rollup_name(grouping, fact_id))

    def exists(self, grouping: list[str], fact_id: str) -> bool:
        return os.path.exists(self._dir(grouping, fact_id))

    def materialize(self, engine, fact_id: str, dimension_id: str) -> list[str]:
        """(Re)derive every grouping-path rollup of a (fact, dimension).

        One aggregation job per path — the reference creates the same
        set of tables per dimension (schema.clj:230-239) but pays a
        per-event upsert forever after; here each refresh is one
        partial-aggregated shuffle over the (partition-pruned) events.
        Returns the rollup names written.
        """
        dim = engine.catalog.dimension(dimension_id)
        written = []
        for path in dim.grouped_by:
            grouping = [*path, dim.id]
            df = engine.rollup_df(fact_id, dimension_id, grouping=grouping)
            out = self._dir(grouping, fact_id)
            tmp = out + "._tmp"
            (
                df.withColumn("p_date", F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy("p_date")
                .parquet(tmp)
            )
            # swap after a complete write: readers never see a half
            # rollup (the parquet commit protocol covers the tmp write,
            # the rename covers replace-on-refresh)
            shutil.rmtree(out, ignore_errors=True)
            os.replace(tmp, out)
            written.append(rollup_name(grouping, fact_id))
        return written

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
        """Rollup scan, or None when this rollup was never materialized
        (callers fall back to raw events)."""
        if not self.exists(grouping, fact_id):
            return None
        return self.spark.read.parquet(self._dir(grouping, fact_id))

    def drop_all(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
