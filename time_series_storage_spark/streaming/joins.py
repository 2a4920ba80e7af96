"""Streaming time-join operators.

The streaming twin of ``operators/interval.py``: Structured Streaming
already has the right machinery for a point-in-interval join — a
stream-stream inner join whose condition couples the two sides' event
times. Spark keeps both sides in the state store and the TIME-RANGE
condition plus watermarks is exactly what lets it evict state (a point
older than the watermark can never match a future interval and vice
versa), so no bucketing is needed in the streaming form: the state
store plays the role the time-bin equi-join plays in batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def streaming_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    payload: Optional[list[str]] = None,
    watermark: str = "1 hour",
    inclusive_end: bool = False,
) -> DataFrame:
    """Streaming inner point-in-interval join (same output contract as
    the batch ``interval_join``: point columns + ``iv_start``/``iv_end``
    + ``iv_<payload>``).

    Both inputs are streams (or one static side): the point side is
    watermarked on its event time, the interval side on its END time
    (an interval is complete once its end has passed), and the
    containment predicate doubles as the state-retention bound Spark
    requires for stream-stream inner joins in append mode. Late rows
    beyond the watermark are dropped — the standard bounded-state
    tradeoff; the batch operator is the unbounded-lateness replay path.
    """
    if payload is None:
        skip = {*on, start_col, end_col}
        payload = [c for c in intervals.columns if c not in skip]
    iv = intervals.select(
        *[F.col(k).alias(f"_iv_{k}") for k in on],
        F.col(start_col).alias("iv_start"),
        F.col(end_col).alias("iv_end"),
        *[F.col(c).alias(f"iv_{c}") for c in payload],
    ).withWatermark("iv_end", watermark)
    pt = points.withWatermark(point_ts, watermark)
    cond = None
    for k in on:
        eq = F.col(k) == F.col(f"_iv_{k}")
        cond = eq if cond is None else cond & eq
    cond = cond & (F.col(point_ts) >= F.col("iv_start"))
    right = (
        F.col(point_ts) <= F.col("iv_end")
        if inclusive_end
        else F.col(point_ts) < F.col("iv_end")
    )
    return pt.join(iv, cond & right, "inner").drop(
        *[f"_iv_{k}" for k in on]
    )
