"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in ``time_series_storage_spark.queries_testdata`` (core
engine operators) and ``time_series_storage_spark.queries_extensions``
(dedup / similarity / text-analysis), shared with bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry() -> dict:
    from time_series_storage_spark.queries_testdata import CORE_QUERIES

    reg = dict(CORE_QUERIES)
    try:
        from time_series_storage_spark.queries_extensions import EXT_QUERIES

        reg.update(EXT_QUERIES)
    except ImportError:
        pass
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly average series
    with dense zero-fill through the full engine pipeline."""
    from time_series_storage_spark.queries_testdata import q_avg_hour

    return q_avg_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for ops whose
    semantics aren't SQL-expressible; the driver then does a rows-only
    check)."""
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
