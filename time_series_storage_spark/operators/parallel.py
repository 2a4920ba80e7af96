"""Partition-count pinning for compute-dense stages.

AQE's size-based shuffle coalescing assumes bytes predict work: it
merges small shuffle partitions until each holds
``spark.sql.adaptive.advisoryPartitionSizeInBytes`` (64 MB default).
That is the right call for IO-bound stages, and exactly wrong for a
CPU-dense stage over narrow rows — a shingle-hash explode over a 1.5 MB
document table is "one partition" by bytes, so AQE coalesces the
exchange to a single task and the entire md5 workload runs on one core
of however many the cluster has (measured on the sf0.1 corpus: 3.6 s
serialized vs 0.4 s pinned, a 9x loss that GROWS with core count).

``repartition(N, col)`` instead of ``repartition(col)`` is the opt-out:
a user-supplied partition count (``REPARTITION_BY_NUM``) is exempt from
AQE coalescing, while keying stays on the column so downstream
per-key operators (distinct / groupBy on a superset of the key) still
reuse the exchange. :func:`cpu_partitions` picks N as
max(defaultParallelism, spark.sql.shuffle.partitions): never fewer
slots than the cluster has cores, and never fewer than the operator's
other shuffles use — at 100 TB both numbers are cluster-tuned and this
remains the partition count every neighboring exchange already runs at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cpu_partitions(df: DataFrame) -> int:
    """Partition count for a pinned (AQE-coalesce-exempt) repartition
    ahead of a compute-dense stage: max(cluster cores, configured
    shuffle partitions)."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" on some platforms
        shuffle = 0
    return max(cores, shuffle)
