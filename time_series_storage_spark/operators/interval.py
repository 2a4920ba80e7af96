"""Interval (range) join — point-in-interval matching at scale.

The second classic time-series join Spark lacks a first-class operator
for (the first is the as-of join, operators/asof.py): attach to every
point event the interval rows that CONTAIN it — purchases to the
browsing session they happened in, measurements to the maintenance
window covering them, trades to the halt period in force. The
reference engine has no joins at all (SURVEY.md section 2.3); a
feature pipeline needs this constantly.

Naive Spark is the trap: an equality + two range predicates cannot
sort-merge, so Catalyst plans a (broadcast) nested-loop join —
quadratic per key. The scale shape here is the standard BUCKETED range
join (the same binning Databricks' range-join hints and KDB's window
joins use): quantize time into ``bucket_seconds`` bins, explode each
interval onto the bins it spans, tag each point with its single bin,
equi-join on (keys..., bin), then apply the exact containment
predicate. Each (point, interval) pair meets in exactly ONE bin (the
point's), so no dedup pass is needed; the join is a plain shuffled (or
broadcast) hash equi-join, linear in points + interval-bin expansion.

Pick ``bucket_seconds`` near the typical interval duration: expansion
is ~duration/bucket_seconds + 1 rows per interval, and a bin's
candidate set is the intervals overlapping it — both bounded. Skewed
bins (many intervals over one hot hour) are ordinary equi-join skew,
handled by AQE like any other (tests/test_skew.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .analytics import floor_div


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    payload: Optional[list[str]] = None,
    bucket_seconds: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Inner point-in-interval join.

    Every ``points`` row is matched with every same-key ``intervals``
    row whose ``[start_col, end_col)`` contains ``point_ts``
    (``inclusive_end=True`` closes the right edge — e.g. sessions whose
    end IS the last event's timestamp). A point inside k intervals
    emits k rows; a point in none emits nothing (inner semantics —
    wrap with a left join against the input for "unattributed" rows).

    Output: all point columns + ``iv_start``/``iv_end`` + one
    ``iv_<c>`` per payload column (default payload: every interval
    column that is not a key or bound).
    """
    if payload is None:
        skip = {*on, start_col, end_col}
        payload = [c for c in intervals.columns if c not in skip]
    # Bin arithmetic runs on unix_micros — Spark timestamps ARE
    # microsecond-precision integers, so floor-division by the bucket
    # width in micros is exact at any resolution (unix_timestamp would
    # truncate to whole seconds: a point at T+0.7s against an interval
    # ending T+0.2s compared equal, and a sub-second interval [T, T+0.5)
    # spanned "no" bins). Containment/emptiness compare the RAW
    # timestamp columns; the bins only decide where a pair meets.
    g_us = int(bucket_seconds) * 1_000_000
    # the timestamp cast accepts TIMESTAMP_NTZ too; it is applied
    # identically (and monotonically) to both sides, so a pair's bins
    # stay consistent whatever the session zone maps local times to
    _us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    s_us = _us(start_col)
    e_us = _us(end_col)
    # last instant an in-interval point can occupy: the end itself when
    # inclusive, one microsecond before it when exclusive — so the bin
    # sequence covers every point's bin even for fractional ends
    last_us = e_us if inclusive_end else e_us - 1
    not_empty = (
        F.col(start_col) <= F.col(end_col)
        if inclusive_end
        else F.col(start_col) < F.col(end_col)
    )
    iv = (
        intervals.where(not_empty)  # empty intervals contain nothing
        .select(
            *[F.col(k) for k in on],
            F.col(start_col).alias("iv_start"),
            F.col(end_col).alias("iv_end"),
            *[F.col(c).alias(f"iv_{c}") for c in payload],
            F.explode(
                F.sequence(
                    floor_div(s_us, F.lit(g_us)).cast("long"),
                    floor_div(last_us, F.lit(g_us)).cast("long"),
                )
            ).alias("_bin"),
        )
    )
    pt = points.select(
        "*",
        floor_div(_us(point_ts), F.lit(g_us)).cast("long").alias("_bin"),
    )
    contained = F.col(point_ts) >= F.col("iv_start")
    contained = contained & (
        (F.col(point_ts) <= F.col("iv_end"))
        if inclusive_end
        else (F.col(point_ts) < F.col("iv_end"))
    )
    return (
        pt.join(iv, [*on, "_bin"])
        .where(contained)
        .drop("_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    left_payload: Optional[list[str]] = None,
    right_payload: Optional[list[str]] = None,
    bucket_seconds: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Interval x interval OVERLAP join — the second range-join shape
    (the first, point-in-interval, is :func:`interval_join`): every
    same-key pair of intervals that intersect emits one row. Campaign
    windows x user sessions, maintenance windows x incident spans,
    halt periods x trading sessions.

    Overlap is the standard predicate ``l_start < r_end AND r_start <
    l_end`` (``<=`` when ``inclusive_end`` closes the right edges).
    Empty intervals match nothing.

    Scale shape: both sides explode onto the time bins they span and
    equi-join on (keys..., bin) — but an overlapping pair shares MANY
    bins, so a naive bin join needs a distinct. This join instead
    emits a pair only in its FIRST shared bin, which is provably
    ``bin(max(l_start, r_start))`` = ``greatest`` of the two start
    bins (bin assignment is monotone, and that instant lies inside
    both intervals whenever they overlap) — a codegen filter after the
    equi-join, NO dedup exchange. Linear in bin expansion, ordinary
    AQE-handled skew on hot bins, never a nested loop.

    Output: keys + ``l_start/l_end/r_start/r_end`` +
    ``ov_start/ov_end`` (the intersection) + ``l_<c>``/``r_<c>``
    payload columns (default: every non-key, non-bound column).
    """
    if left_payload is None:
        skip = {*on, start_col, end_col}
        left_payload = [c for c in left.columns if c not in skip]
    if right_payload is None:
        skip = {*on, start_col, end_col}
        right_payload = [c for c in right.columns if c not in skip]
    # payload columns named 'start'/'end' would alias onto the
    # l_/r_start/end bound outputs and make the overlap predicate
    # ambiguous — reject rather than silently bind the wrong column
    for side, payload in (("left", left_payload), ("right", right_payload)):
        clash = {"start", "end"} & set(payload)
        if clash:
            raise ValueError(
                f"{side} payload column(s) {sorted(clash)} collide with "
                "the l_/r_start/end output aliases; rename or exclude them"
            )
    g_us = int(bucket_seconds) * 1_000_000
    _us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))

    def prep(df, prefix, payload):
        s_us, e_us = _us(start_col), _us(end_col)
        last_us = e_us if inclusive_end else e_us - 1
        not_empty = (
            F.col(start_col) <= F.col(end_col)
            if inclusive_end
            else F.col(start_col) < F.col(end_col)
        )
        # EXACT integer floor division on the micros (floor_div), not
        # F.floor(a / b): `/` on longs is double division, and epoch
        # microseconds sit ~2x under the 2^53 rounding cliff at small
        # bucket_seconds — no safety margin to spend
        return df.where(not_empty).select(
            *[F.col(k) for k in on],
            F.col(start_col).alias(f"{prefix}_start"),
            F.col(end_col).alias(f"{prefix}_end"),
            floor_div(s_us, F.lit(g_us)).cast("long").alias(f"_{prefix}_bin0"),
            *[F.col(c).alias(f"{prefix}_{c}") for c in payload],
            F.explode(
                F.sequence(
                    floor_div(s_us, F.lit(g_us)).cast("long"),
                    floor_div(last_us, F.lit(g_us)).cast("long"),
                )
            ).alias("_bin"),
        )

    lv = prep(left, "l", left_payload)
    rv = prep(right, "r", right_payload)
    lt = (lambda a, b: a <= b) if inclusive_end else (lambda a, b: a < b)
    overlap = lt(F.col("l_start"), F.col("r_end")) & lt(
        F.col("r_start"), F.col("l_end")
    )
    first_shared = F.col("_bin") == F.greatest(
        F.col("_l_bin0"), F.col("_r_bin0")
    )
    return (
        lv.join(rv, [*on, "_bin"])
        .where(overlap & first_shared)
        .select(
            *on,
            "l_start", "l_end", "r_start", "r_end",
            F.greatest("l_start", "r_start").alias("ov_start"),
            F.least("l_end", "r_end").alias("ov_end"),
            *[f"l_{c}" for c in left_payload],
            *[f"r_{c}" for c in right_payload],
        )
    )
