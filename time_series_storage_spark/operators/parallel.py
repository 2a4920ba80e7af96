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


def salted_agg(
    df: DataFrame,
    keys,
    aggs: dict,
    salt_buckets: int = 16,
    salt_col: str = "_salt",
):
    """Two-stage SALTED aggregation for pathological key skew — the
    standard manual fix when one key holds so much of the data that
    even AQE's skew handling (which splits *joins*, not aggregates)
    leaves a straggler reducer.

    ``aggs`` maps output column -> (source column, "sum" | "count" |
    "min" | "max") — the algebraic aggregates whose two-stage
    composition is exact:
    stage 1 groups by (keys..., salt) — the hot key's rows spread over
    ``salt_buckets`` reducers — and stage 2 re-aggregates the per-salt
    partials (counts re-combine by SUM). The result is bit-identical
    to the direct groupBy (pinned in tests); only the shuffle topology
    changes.

    When to reach for this instead of trusting partial aggregation:
    map-side combine already bounds what each TASK emits per key, but
    every partial row for a key still lands on ONE reducer — fine for
    sums (tiny partials), a straggler when the per-key reduce itself
    is heavy (wide collect-style state) or when thousands of map tasks
    each emit a partial for the same hot key. Salting caps the fan-in
    per reducer at the cost of one extra (cheap, salt-bucket-sized)
    exchange.

    The salt is the source PARTITION id modulo ``salt_buckets`` — a
    row-position salt, NOT a value hash: a hot key whose aggregated
    values are constant ("status = ok" a billion times) would hash to
    ONE salt bucket and keep the straggler. Partition-derived salting
    spreads a hot key exactly as widely as its rows are spread across
    input partitions, costs no hashing, and cannot collapse; the
    RESULT is deterministic regardless (stage 2 re-combines whatever
    stage 1 produced).
    """
    from pyspark.sql import functions as F

    if not aggs:
        raise ValueError("aggs must not be empty")
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (src, how) in aggs.items():
        if how not in fns:
            raise ValueError(
                f"unsupported aggregate {how!r}; one of {sorted(fns)}"
            )
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    stage1 = (
        df.withColumn(salt_col, salt)
        .groupBy(*keys, salt_col)
        .agg(
            *[
                fns[how](src).alias(f"_s_{name}")
                for name, (src, how) in aggs.items()
            ]
        )
    )
    # no blanket cast: min/max/sum must keep the source column's type
    # (a long cast would floor-truncate double aggregates and break the
    # bit-identical contract); count is natively long already
    return stage1.groupBy(*keys).agg(
        *[
            recombine[how](f"_s_{name}").alias(name)
            for name, (src, how) in aggs.items()
        ]
    )
