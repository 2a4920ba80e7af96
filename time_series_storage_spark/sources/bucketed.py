"""Bucketed-table co-location — the join strategy that removes the
shuffle entirely at 100 TB.

A fact-to-fact join (events to sessions, clicks to purchases, corpus
to assignments) shuffles BOTH sides on the key every time it runs.
When the same join runs repeatedly — every pipeline invocation, every
day — the scale-correct answer is to pay the partitioning ONCE at
write time: store both tables bucketed by the join key with the same
bucket count, and every subsequent equi-join on that key reads
co-located buckets with NO exchange on either side (Spark plans a
sort-merge join whose children are the scans themselves). This module
is the thin utility + the pinned plan proof (tests/test_plan_quality):
the claim "bucketing removes the shuffle" is asserted on `.explain`
output, not assumed.

Bucketed tables must live in the session catalog (parquet ``save()``
has nowhere to record bucket metadata), so writers go through
``saveAsTable`` — on a real deployment that is the metastore, in tests
the local warehouse dir. Pick ``n_buckets`` once per dataset family:
both sides of a co-located join must agree on it (Spark 3.1+ can
coalesce mismatched bucket counts when one divides the other, but
agreeing is free and portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the per-task
    Sort under a later sort-merge join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key — the
    plan this produces is the point: zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on)
