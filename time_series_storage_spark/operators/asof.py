"""As-of (point-in-time) join — the classic time-series operator Spark
has no built-in for.

For every left row, attach the matching right row with the same key:
the latest one at-or-before ``left.ts`` (``backward`` — kdb's ``aj``,
DuckDB's ``ASOF JOIN``, pandas' ``merge_asof``), the earliest one
at-or-after it (``forward``), or whichever of the two is closer in
time (``nearest``) — the full pandas ``merge_asof`` direction surface.
The reference engine has no such operator (it stores pre-bucketed
rollups only); a training-data / feature pipeline needs it constantly —
"the user's last login before this purchase", "the next purchase after
this click", "the closest sensor reading to this label".

Spark-first design — **no join at all**: tag both sides, union them,
and run one window pass per key ordered by time; the match is
``last(<right payload>, ignorenulls=True)`` over the preceding frame.
One shuffle on the key, linear scan within partitions, no row
explosion, no range-join quadratic blowup — this is the shape that
survives 100 TB (a skewed hot key degrades to a sort, not a cross
product). An equality+range join (what a naive implementation shuffles
into) compares every left row against every same-key right row;
the union+window compares each row to exactly one running state.
``forward`` is the same pass with the time order reversed; ``nearest``
computes both directions over the SAME exchange (two Window operators,
two sorts, one shuffle) and picks the closer match per row.

Tie semantics (pinned, oracle-reproducible): right rows at exactly
``left.ts`` DO match in every direction; among right ties on ts the
largest ``right_order`` column wins (deterministic); ``nearest`` with
equal backward/forward distance prefers the backward match.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

# order-column types with a total order Spark can sort natively — the
# tie-break column rides through the union AT ITS OWN TYPE (no cast:
# a long cast would truncate 1.2 and 1.9 to the same key and quietly
# turn the equal-ts tie-break non-deterministic for fractional types);
# anything else (strings vs numerics across sides, arrays, ...) is
# rejected so the contract stays explicit
_ORDERABLE_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.BooleanType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DateType,
)

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Optional[list[str]] = None,
    right_order: Optional[str] = None,
    tolerance_seconds: Optional[int] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join via union + window (no join operator).

    Returns every ``left`` row with ``asof_ts`` and ``asof_<col>`` for
    each payload column of the matched right row (NULL when nothing
    matches). ``right_order`` breaks ties among right rows with equal
    ts (largest wins); defaults to the first payload column.
    ``tolerance_seconds`` bounds the match distance (microsecond-exact;
    a match farther than the tolerance is nulled), mirroring pandas
    ``merge_asof(tolerance=...)``. ``direction`` is ``backward``
    (latest right at-or-before), ``forward`` (earliest right
    at-or-after) or ``nearest`` (closer of the two; ties backward).
    """
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"asof_join direction must be one of {_DIRECTIONS}, "
            f"got {direction!r}"
        )
    right_payload = list(right_payload or [])
    if not right_payload:
        raise ValueError("right_payload must name at least one column")
    right_order = right_order or right_payload[0]
    order_type = right.schema[right_order].dataType
    if not isinstance(order_type, _ORDERABLE_TYPES):
        raise TypeError(
            f"asof_join right_order column {right_order!r} has type "
            f"{order_type.simpleString()}, which is not an orderable "
            "scalar — the equal-ts tie-break would become "
            "non-deterministic. Use a numeric/timestamp/date column."
        )

    lcols = left.columns
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(order_type).alias("_ord"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}")
            for c in right_payload
        ],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_order).alias("_ord"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    ).select(*l_tagged.columns)

    # BACKWARD frame: ascending time; right rows sort before left rows
    # at equal ts (<= semantics), right ties on ts resolve to the
    # largest right_order (sorted ascending, last() wins).
    # FORWARD frame: the same construction over DESCENDING time — the
    # preceding frame then holds rows with ts >= left ts, and last()
    # picks the smallest such right ts. Both windows share the
    # partitionBy, so Catalyst plans ONE exchange (two sorts).
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(),
                 F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").desc(), F.col("_side").asc(),
                 F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    sel = [*[F.col(c) for c in lcols], F.col("_side")]
    if direction in ("backward", "nearest"):
        sel.append(F.last("_rts", ignorenulls=True).over(w_back).alias("_b_ts"))
        sel.extend(
            F.last(f"_rp_{c}", ignorenulls=True).over(w_back).alias(f"_b_{c}")
            for c in right_payload
        )
    if direction in ("forward", "nearest"):
        sel.append(F.last("_rts", ignorenulls=True).over(w_fwd).alias("_f_ts"))
        sel.extend(
            F.last(f"_rp_{c}", ignorenulls=True).over(w_fwd).alias(f"_f_{c}")
            for c in right_payload
        )
    matched = (
        l_tagged.unionByName(r_tagged).select(*sel)
        .where(F.col("_side") == 1)
    )

    # microsecond-exact distances: unix_timestamp would truncate both
    # sides to whole seconds, sliding boundaries by up to 1s for
    # sub-second timestamps
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    tol_us = (
        None
        if tolerance_seconds is None
        else F.lit(int(tolerance_seconds) * 1_000_000)
    )

    def _ok(ts_col: str, dist: Column) -> Column:
        ok: Column = F.col(ts_col).isNotNull()
        if tol_us is not None:
            ok = ok & (dist <= tol_us)
        return ok

    if direction == "backward":
        ok = _ok("_b_ts", l_us - F.unix_micros(F.col("_b_ts")))
        pick = [("_b_ts", [f"_b_{c}" for c in right_payload], ok)]
    elif direction == "forward":
        ok = _ok("_f_ts", F.unix_micros(F.col("_f_ts")) - l_us)
        pick = [("_f_ts", [f"_f_{c}" for c in right_payload], ok)]
    else:  # nearest
        b_dist = l_us - F.unix_micros(F.col("_b_ts"))
        f_dist = F.unix_micros(F.col("_f_ts")) - l_us
        b_ok = _ok("_b_ts", b_dist)
        f_ok = _ok("_f_ts", f_dist)
        use_back = b_ok & (~f_ok | (b_dist <= f_dist))
        pick = [
            ("_b_ts", [f"_b_{c}" for c in right_payload], use_back),
            ("_f_ts", [f"_f_{c}" for c in right_payload], f_ok),
        ]

    def _case(idx: int) -> Column:
        # idx -1 selects the ts column, otherwise payload idx
        expr = None
        for ts_c, pay_cs, cond in pick:
            col = F.col(ts_c) if idx < 0 else F.col(pay_cs[idx])
            expr = F.when(cond, col) if expr is None else expr.when(cond, col)
        return expr

    return matched.select(
        *lcols,
        _case(-1).alias("asof_ts"),
        *[
            _case(i).alias(f"asof_{c}")
            for i, c in enumerate(right_payload)
        ],
    )
