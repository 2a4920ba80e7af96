"""Time bucketing expressions — the engine's only "scalar function library".

Two time operations exist in the reference:

* **slice bucketing** (write path W1): floor a timestamp to the
  slice-minute boundary *within its hour*
  (/root/reference/src/time_series_storage/postgres/common.clj:7-23).
  Hour-aligned, not epoch-aligned, so we deliberately do NOT use
  ``F.window`` (SURVEY.md section 2.2 W1). Slices are validated to divide
  60 at definition time, where the reference silently misbuckets.

* **step truncation** (read path Q3): shift by ``offset`` hours then
  truncate to hour/day/week/month (query.clj:6-37). The reference's week
  label is the Sunday *strictly before* the date (it subtracts the ISO
  day-of-week, 1-7, so a Sunday maps to the previous Sunday) — replicated
  exactly with ``date_sub(d, ((dayofweek(d)+5) % 7) + 1)`` since Spark's
  ``dayofweek`` is Sunday=1.

Everything here is a Catalyst ``Column`` expression (whole-stage
codegen'd); no UDFs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, functions as F

from ..errors import InvalidSliceError, InvalidStepError

STEPS = ("hour", "day", "week", "month", "year", "none")

_STEP_INTERVAL = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 day",
    "month": "interval 1 month",
    "year": "interval 1 year",
}


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _validate_slice(slice_minutes: int) -> int:
    slice_minutes = int(slice_minutes)
    if slice_minutes <= 0 or 60 % slice_minutes != 0:
        raise InvalidSliceError(slice_minutes)
    return slice_minutes


def slice_expr(ts, slice_minutes: int) -> Column:
    """Floor ``ts`` to its hour-aligned slice bucket (reference get-slice).

    16:46 @ slice 15 -> 16:45 (postgres/common.clj docstring).
    """
    slice_minutes = _validate_slice(slice_minutes)
    ts = _col(ts)
    if slice_minutes == 60:
        return F.date_trunc("hour", ts)
    floored_min = (F.floor(F.minute(ts) / slice_minutes) * slice_minutes).cast("int")
    return F.date_trunc("hour", ts) + F.make_dt_interval(
        F.lit(0), F.lit(0), floored_min, F.lit(0)
    )


def slice_datetime(d: dt.datetime, slice_minutes: int) -> dt.datetime:
    """Driver-side mirror of :func:`slice_expr` for range endpoints."""
    slice_minutes = _validate_slice(slice_minutes)
    return d.replace(
        minute=(d.minute // slice_minutes) * slice_minutes, second=0, microsecond=0
    )


def step_trunc_expr(ts, step: str, offset_hours: int = 0) -> Column | None:
    """Truncate ``ts`` (shifted by ``offset_hours``) to the step grain.

    Returns None for step ``none`` (the ":all" bucket — no time key).
    Reference: query.clj:6-37 (time-dimension).
    """
    if step is None:
        step = "none"
    if step not in STEPS:
        raise InvalidStepError(step)
    if step == "none":
        return None
    t = _col(ts)
    if offset_hours:
        t = t + F.make_dt_interval(F.lit(0), F.lit(int(offset_hours)), F.lit(0), F.lit(0))
    if step == "week":
        # Sunday strictly before the date; Spark dayofweek: Sun=1..Sat=7,
        # reference subtracts ISO dow (Mon=1..Sun=7): query.clj:24-30.
        iso_dow = ((F.dayofweek(t) + 5) % 7) + 1
        return F.date_sub(t, iso_dow).cast("timestamp")
    return F.date_trunc(step, t)


def step_trunc_datetime(d: dt.datetime, step: str) -> dt.datetime:
    """Driver-side mirror of :func:`step_trunc_expr` (offset applied by caller)."""
    if step not in STEPS or step == "none":
        raise InvalidStepError(step)
    if step == "hour":
        return d.replace(minute=0, second=0, microsecond=0)
    midnight = d.replace(hour=0, minute=0, second=0, microsecond=0)
    if step == "day":
        return midnight
    if step == "week":
        return midnight - dt.timedelta(days=d.isoweekday())
    if step == "month":
        return midnight.replace(day=1)
    return midnight.replace(month=1, day=1)  # year


def step_interval_sql(step: str) -> str:
    """The grid stride for a step grain, as a Spark SQL interval literal."""
    if step not in _STEP_INTERVAL:
        raise InvalidStepError(step)
    return _STEP_INTERVAL[step]


def grid_df(spark, start: dt.datetime, finish: dt.datetime, step: str,
            offset_hours: int = 0):
    """Dense time grid for gap filling (reference time-range, query.clj:84-97).

    The reference steps from the *raw* start, while collapse keys are
    truncated — off-grid data is silently dropped when start is not
    grain-aligned (SURVEY.md section 2.4 item 6). Documented divergence:
    our grid starts at ``trunc(start + offset)`` so grid keys always align
    with collapse keys; for grain-aligned starts (all reference tests) the
    two are identical. End is exclusive, matching time-range.

    Single-row ``sequence`` + ``explode`` — no driver-side loop, and the
    result is tiny (one row per grain bucket) so callers broadcast it.
    """
    if step not in _STEP_INTERVAL:
        raise InvalidStepError(step)
    off = dt.timedelta(hours=offset_hours)
    g0 = step_trunc_datetime(start + off, step)
    end = finish + off
    if g0 >= end:
        # empty grid
        return spark.range(0).select(F.col("id").cast("timestamp").alias("ts"))
    seq = F.sequence(
        F.lit(g0).cast("timestamp"),
        F.lit(end).cast("timestamp"),
        F.expr(_STEP_INTERVAL[step]),
    )
    return (
        spark.range(1)
        .select(F.explode(seq).alias("ts"))
        .where(F.col("ts") < F.lit(end).cast("timestamp"))
    )
