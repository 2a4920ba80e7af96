"""As-of (point-in-time) join — the classic time-series operator Spark
has no built-in for.

For every left row, attach the latest right row with the same key and
``right.ts <= left.ts`` (backward direction; kdb's ``aj``, DuckDB's
``ASOF JOIN``, pandas' ``merge_asof``). The reference engine has no
such operator (it stores pre-bucketed rollups only); a training-data /
feature pipeline needs it constantly — "the user's last login before
this purchase", "the most recent model score before this label".

Spark-first design — **no join at all**: tag both sides, union them,
and run one window pass per key ordered by time; the match is
``last(<right payload>, ignorenulls=True)`` over the preceding frame.
One shuffle on the key, linear scan within partitions, no row
explosion, no range-join quadratic blowup — this is the shape that
survives 100 TB (a skewed hot key degrades to a sort, not a cross
product). An equality+range join (what a naive implementation shuffles
into) compares every left row against every same-key right row;
the union+window compares each row to exactly one running state.

Tie semantics (pinned, oracle-reproducible): right rows at exactly
``left.ts`` DO match (<=); among right ties on ts the largest
``right_order`` column wins (deterministic).
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Optional[list[str]] = None,
    right_order: Optional[str] = None,
    tolerance_seconds: Optional[int] = None,
) -> DataFrame:
    """Backward as-of join via union + window (no join operator).

    Returns every ``left`` row with ``asof_<col>`` for each payload
    column of the matched right row (NULL when no right row precedes).
    ``right_order`` breaks ties among right rows with equal ts (largest
    wins); defaults to the first payload column. ``tolerance_seconds``
    bounds the lookback (a match older than the tolerance is nulled),
    mirroring pandas ``merge_asof(tolerance=...)``.
    """
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

    # right rows sort before left rows at equal ts (<= semantics); right
    # ties on ts resolve to the largest right_order deterministically
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"), F.col("_ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).select(
        *lcols,
        "_side",
        F.last("_rts", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    ).where(F.col("_side") == 1)
    ok: Column = F.col("_m_ts").isNotNull()
    if tolerance_seconds is not None:
        # microsecond-exact: unix_timestamp would truncate both sides to
        # whole seconds, sliding the tolerance boundary by up to 1s for
        # sub-second timestamps
        ok = ok & (
            F.unix_micros(F.col(left_ts).cast("timestamp"))
            - F.unix_micros(F.col("_m_ts"))
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
    return matched.select(
        *lcols,
        F.when(ok, F.col("_m_ts")).alias("asof_ts"),
        *[
            F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
