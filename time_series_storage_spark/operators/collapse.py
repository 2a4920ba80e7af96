"""Collapse + gap-fill: the read-path aggregation pipeline.

Replaces the reference's driver-side boxed-map ``collapse`` /
``fill-range`` (/root/reference/src/time_series_storage/query.clj:41-118)
with distributed DataFrame aggregation:

* **collapse** — one ``groupBy(series..., trunc(step, ts+offset))`` with a
  per-fact-type aggregate. A single shuffle; Catalyst inserts partial
  (map-side) aggregation so the reduce side only sees one row per
  (series, bucket) per input partition. The reference dispatches on the
  *shape* of the first row (query.clj:41-46); we dispatch on the fact's
  declared type from the catalog — its own TODO agrees (query.clj:39-40).

* **fill_range** — dense grid left-join (query.clj:99-111). The grid is
  one row per step bucket (tiny), broadcast against the distinct series
  keys. Divergences (SURVEY.md section 2.4 item 6): the grid is aligned
  to the truncated grain, and the fact's declared ``filler`` is honored
  (the reference hard-codes 0, TODO at query.clj:110-111).

Measure semantics per fact type (reference update.clj:41-81,
schema.clj:156-173):

* counter   -> ``counter = sum(value)``  (upserts do ``counter+value``)
* average   -> ``counter = count(*), total = sum(value)`` — the average is
  never stored; the (count, sum) pair merges associatively exactly like
  Spark's partial/final aggregation.
* histogram -> per-bucket counts, long format ``(series..., ts, bucket_lo,
  counter)``. The reference never implemented this (its collapse throws,
  query.clj:75-77); semantics here follow the DDL (schema.clj:162-166):
  bucket lower edges ``range(start, end, step)``, out-of-range values
  clamped into the edge buckets.
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import Fact
from ..errors import InvalidStepError
from ..functions.time import STEPS, grid_df, step_trunc_expr

TS_COL = "ts"


def histogram_bucket_expr(value, fact: Fact) -> Column:
    """Lower bucket edge for ``value`` given the fact's (start, end, step).

    ``start + clamp(floor((v-start)/step), 0, nbuckets-1) * step`` —
    schema per reference postgres/schema.clj:162-166 (b{lo} columns);
    clamping of out-of-range values is our defined semantics (the
    reference never implemented histogram ingest, SURVEY.md 2.4 item 3).
    """
    v = F.col(value) if isinstance(value, str) else value
    nbuckets = len(fact.bucket_edges())
    idx = F.floor((v - F.lit(fact.start)) / F.lit(fact.step))
    idx = F.least(F.greatest(idx, F.lit(0)), F.lit(nbuckets - 1))
    return (F.lit(fact.start) + idx * F.lit(fact.step)).cast("int")


def measure_columns(fact_type: str) -> list[str]:
    if fact_type == "average":
        return ["counter", "total"]
    return ["counter"]


def collapse(
    df: DataFrame,
    series_cols: Sequence[str],
    fact: Fact,
    step: str | None,
    offset_hours: int = 0,
    ts_col: str = TS_COL,
    value_col: str = "value",
) -> DataFrame:
    """Aggregate slice-bucketed rows to the requested step grain.

    ``df`` columns: ``series_cols`` + ``ts_col`` (slice bucket timestamp)
    + ``value_col``. Output: ``series_cols`` (+ ``ts`` when step is not
    none, + ``bucket_lo`` for histograms) + measure columns.
    """
    step = step or "none"
    if step not in STEPS:
        raise InvalidStepError(step)
    keys: list[Column] = [F.col(c) for c in series_cols]
    t = step_trunc_expr(ts_col, step, offset_hours)
    if t is not None:
        keys.append(t.alias(TS_COL))
    if fact.type == "histogram":
        keys.append(histogram_bucket_expr(value_col, fact).alias("bucket_lo"))

    grouped = df.groupBy(*keys)
    if fact.type == "counter":
        return grouped.agg(F.sum(value_col).alias("counter"))
    if fact.type == "average":
        return grouped.agg(
            F.count(F.lit(1)).alias("counter"), F.sum(value_col).alias("total")
        )
    # histogram: each row is one observation in its bucket
    return grouped.agg(F.count(F.lit(1)).alias("counter"))


def collapse_rollup(
    df: DataFrame,
    series_cols: Sequence[str],
    fact: Fact,
    step: str | None,
    offset_hours: int = 0,
    ts_col: str = TS_COL,
) -> DataFrame:
    """Collapse pre-aggregated rollup rows (slice grain) to the step grain.

    The reference's read path always starts from rollup rows and *sums
    the stored measures* (query.clj:48-73: counters add, (counter,total)
    pairs merge with +) — unlike :func:`collapse`, which counts raw
    observations. Input columns: series + ``ts`` (slice bucket) +
    measures (``counter`` [+ ``total``] or ``bucket_lo`` + ``counter``).
    """
    step = step or "none"
    if step not in STEPS:
        raise InvalidStepError(step)
    keys: list[Column] = [F.col(c) for c in series_cols]
    t = step_trunc_expr(ts_col, step, offset_hours)
    if t is not None:
        keys.append(t.alias(TS_COL))
    if fact.type == "histogram":
        keys.append(F.col("bucket_lo"))
    aggs = [F.sum("counter").alias("counter")]
    if fact.type == "average":
        aggs.append(F.sum("total").alias("total"))
    return df.groupBy(*keys).agg(*aggs)


def histogram_quantiles(
    hist: DataFrame,
    series_cols: Sequence[str],
    qs: Sequence[int] = (50, 95, 99),
) -> DataFrame:
    """Quantile estimates from histogram bucket counts.

    Input: ``get_histogram``-shaped rows (series..., bucket_lo,
    counter). Output: one row per series with ``p{q}`` = the lower edge
    of the first bucket whose cumulative count reaches q% of the total
    (the standard histogram-quantile estimator, reported at bucket
    resolution). Integer-exact everywhere (``cum*100 >= tot*q`` — no
    float thresholds), so any engine reproduces it bit-for-bit.

    Plan: one window pass for the per-series cumulative/total counts +
    one aggregation — histograms are tiny relative to the events that
    produced them, so this is driver-negligible at any scale.
    """
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*series_cols)
        .orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*series_cols)
    cum = F.sum("counter").over(wcum)
    tot = F.sum("counter").over(wtot)
    enriched = hist.select(
        *series_cols,
        F.col("bucket_lo"),
        (cum * 100).alias("_cum100"),
        tot.alias("_tot"),
    )
    return enriched.groupBy(*series_cols).agg(
        *[
            F.min(
                F.when(
                    F.col("_cum100") >= F.col("_tot") * q, F.col("bucket_lo")
                )
            ).cast("long").alias(f"p{q}")
            for q in qs
        ]
    )


def fill_range(
    collapsed: DataFrame,
    spark,
    series_cols: Sequence[str],
    measure_cols: Sequence[str],
    start: dt.datetime,
    finish: dt.datetime,
    step: str | None,
    offset_hours: int = 0,
    filler: int = 0,
) -> DataFrame:
    """Zero-fill gaps onto the dense step grid (reference query.clj:99-111).

    Pass-through for step none (query.clj:102-103). Only series present
    in the collapsed data are filled — the grid never invents series
    (fill-range iterates the collapsed map's keys).
    """
    step = step or "none"
    if step == "none":
        return collapsed
    grid = grid_df(spark, start, finish, step, offset_hours)
    series = collapsed.select(*series_cols).distinct() if series_cols else None
    if series is not None:
        dense = series.crossJoin(F.broadcast(grid))
        join_keys = list(series_cols) + [TS_COL]
    else:
        dense = grid
        join_keys = [TS_COL]
    out = dense.join(collapsed, on=join_keys, how="left")
    filled = [
        F.coalesce(F.col(m), F.lit(filler)).alias(m) for m in measure_cols
    ]
    return out.select(*join_keys, *filled)
