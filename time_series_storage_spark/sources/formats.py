"""Alternate event-store file formats (JSON lines / CSV / ORC).

The reference's "connectors" are its three storage backends (Postgres /
SQL Server / in-memory JDBC protocols, project.clj:8-9); ours are file
formats over the same partitioned layout as ``ParquetEventStore`` —
``<path>/fact=<id>/p_date=<day>/``, so partition pruning on
(fact, day-range) works identically in every format. Parquet remains
the performance default (columnar + row-group stats); ORC is the
columnar alternative (native map support, stripe-level stats); JSON/CSV
exist for interop at the edges of a pipeline (log shippers, exports).

CSV cannot carry a map column, so ``dims`` is serialized with
``to_json`` on write and parsed back with ``from_json`` on read — both
JVM-side Catalyst expressions, no Python.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .events import EVENT_SCHEMA, EventStore

_DIMS_TYPE = T.MapType(T.StringType(), T.StringType())


class FormatEventStore(EventStore):
    """JSON-lines or CSV event store, partition-compatible with the
    parquet store."""

    PARTITION_COLS = ("fact", "p_date")

    def __init__(self, spark: SparkSession, path: str, fmt: str = "json"):
        if fmt not in ("json", "csv", "orc"):
            raise ValueError(f"unsupported event store format: {fmt}")
        self.spark = spark
        self.path = path
        self.fmt = fmt

    def append_rows(self, rows) -> None:
        rows = [(str(f), ts, float(v), dict(d)) for f, ts, v, d in rows]
        self.append_df(self.spark.createDataFrame(rows, EVENT_SCHEMA))

    def append_df(self, df: DataFrame) -> None:
        out = df.select(*EVENT_SCHEMA.fieldNames()).withColumn(
            "p_date", F.to_date("ts")
        )
        if self.fmt == "csv":
            out = out.withColumn("dims", F.to_json("dims"))
        (
            out.write.mode("append")
            .partitionBy(*self.PARTITION_COLS)
            .format(self.fmt)
            .options(**({"header": "true"} if self.fmt == "csv" else {}))
            .save(self.path)
        )

    def events_df(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], EVENT_SCHEMA).withColumn(
                "p_date", F.to_date("ts")
            )
        if self.fmt == "csv":
            flat = T.StructType(
                [
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("dims", T.StringType()),
                ]
            )
            df = (
                self.spark.read.schema(flat)
                .options(header="true")
                .csv(self.path)
            )
            df = df.withColumn("dims", F.from_json("dims", _DIMS_TYPE))
        else:
            flat = T.StructType(
                [
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("dims", _DIMS_TYPE),
                ]
            )
            df = (
                self.spark.read.schema(flat).orc(self.path)
                if self.fmt == "orc"
                else self.spark.read.schema(flat).json(self.path)
            )
        # partition columns come back via the directory layout
        return df.select("ts", "value", "dims", "fact", "p_date")

    def clear(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
