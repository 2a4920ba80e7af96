"""Bucketed-table support — co-located joins without a runtime shuffle.

At 100 TB the dominant cost of a fact-to-fact join (events x events,
lineitem x orders) is the exchange of BOTH sides on the join key, paid
on every query. Spark's bucketed tables move that exchange to WRITE
time: ``bucketBy(n, key)`` hash-partitions rows into a fixed number of
files per partition, records the layout in the catalog, and any later
equi-join or aggregation on the bucket key reuses the stored
partitioning — the plan shows NO Exchange on the bucketed side
(pinned in tests/test_bucketing.py). ``sortBy`` additionally pre-sorts
within buckets so a sort-merge join skips its sort.

This is the standard lakehouse trick (Hive bucketing, Iceberg's
bucket transform, Delta's OPTIMIZE ZORDER is the adjacent idea); the
rules that make it WORK at scale, encoded here:

* both join sides must be bucketed INTO THE SAME bucket count on the
  join key (mismatched counts re-shuffle one side — Spark only avoids
  it when one count divides the other and
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set);
* pick ``n_buckets`` ~ cluster cores x small constant: too few caps
  join parallelism, too many produces small files (each writing task
  emits up to n_buckets files);
* bucket pruning: an equality filter on the bucket key scans 1/n of
  the files — free partition pruning on high-cardinality keys that
  directory partitioning cannot afford.

``save_bucketed`` is deliberately a thin, explicit wrapper over
``DataFrameWriter.bucketBy`` — the value is the pinned plan contract,
not abstraction.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet-backed bucketed catalog table.

    ``sort_cols`` defaults to ``bucket_cols`` (pre-sorted buckets let
    a sort-merge join skip its per-task sort).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    sort_cols = list(sort_cols) if sort_cols is not None else list(bucket_cols)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back (the catalog carries the bucket
    spec; a plain ``spark.table`` read preserves it)."""
    return spark.table(table)
