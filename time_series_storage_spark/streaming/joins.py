"""Streaming time-join operators.

The streaming twin of ``operators/interval.py``: Structured Streaming
already has the right machinery for a point-in-interval join — a
stream-stream inner join whose condition couples the two sides' event
times. Spark keeps both sides in the state store and uses the
TIME-RANGE clauses of the join condition plus the watermarks to decide
what state is provably dead.

State-eviction asymmetry (why ``max_interval_seconds`` exists): the
containment predicate alone bounds only the INTERVAL side — an
interval whose end has passed the point watermark can never match a
future point, so interval state is always evictable. The point side is
NOT bounded by containment: ``point_ts < iv_end`` puts no upper bound
on a stored point's age, because an arbitrarily old point can still
fall inside a long-lived interval whose end lies beyond the watermark.
Without an explicit bound, point state grows for the life of the
query. Supplying ``max_interval_seconds`` (an upper bound on interval
duration, enforced as ``point_ts >= iv_end - max``) gives Spark the
missing constraint: a point older than ``watermark(iv_end) - max`` can
then never match any future interval and is evicted.
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
    max_interval_seconds: Optional[int] = None,
) -> DataFrame:
    """Streaming inner point-in-interval join (same output contract as
    the batch ``interval_join``: point columns + ``iv_start``/``iv_end``
    + ``iv_<payload>``).

    Both inputs are streams (or one static side): the point side is
    watermarked on its event time, the interval side on its END time
    (an interval is complete once its end has passed). Late rows beyond
    the watermark are dropped — the standard bounded-state tradeoff;
    the batch operator is the unbounded-lateness replay path.

    ``max_interval_seconds`` declares the longest interval duration the
    pipeline will ever produce and adds ``point_ts >= iv_end - max`` to
    the join condition. For intervals that respect the declared bound
    this is implied by containment (``point_ts >= iv_start >=
    iv_end - max``), so results are unchanged — but it converts the
    point side's state from unbounded to evictable (see module
    docstring). Intervals LONGER than the declared bound lose the
    matches in their first ``duration - max`` seconds, so declare a
    true upper bound. Long-running production queries should always
    set it; ``None`` (no point-side eviction) is for short replays
    and tests.
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
    cond = cond & (
        F.col(point_ts) <= F.col("iv_end")
        if inclusive_end
        else F.col(point_ts) < F.col("iv_end")
    )
    if max_interval_seconds is not None:
        # the point-side state bound: ties each stored point's lifetime
        # to the interval-side watermark (see module docstring)
        cond = cond & (
            F.col(point_ts)
            >= F.col("iv_end")
            - F.expr(f"INTERVAL {int(max_interval_seconds)} SECONDS")
        )
    return pt.join(iv, cond, "inner").drop(*[f"_iv_{k}" for k in on])
