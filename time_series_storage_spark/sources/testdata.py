"""Readers for the driver-generated synthetic tables (TESTDATA.md).

The ``events`` table is written with nanosecond parquet timestamps,
which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read
them as raw int64 nanos (``spark.sql.legacy.parquet.nanosAsLong`` — a
dynamic session conf) and convert with integer division to exact
microseconds. Other tables use ms/us timestamps and read natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division keeps exact microseconds (double would round)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
