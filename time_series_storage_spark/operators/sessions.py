"""Sessionization — gap-based session assignment over event streams.

The standard feature-engineering / behavioral-analytics operator: a
key's events belong to one session until a quiet gap longer than
``gap_minutes`` splits them. Spark-first shape: ONE window pass per key
(lag to detect gap starts, running sum to number sessions) — a single
shuffle on the key, linear work within partitions, no self-join, no
state store needed for the batch form. (The streaming twin is
``F.session_window`` in a watermarked aggregation; this batch operator
matches its semantics for complete data.)

At 100 TB the shuffle is the whole cost and it is the minimum possible
one (any session assignment must co-locate a key's events); skewed hot
keys degrade to a large sort within one partition, not a blowup.

Deterministic (ties ordered by ``order_col``), so results are exactly
reproducible by any SQL engine's identical window expression.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Assign session ordinals per key.

    Output: input columns + ``session_start`` (1 on the first event of
    each session) + ``session_seq`` (1-based session ordinal within the
    key). An event starts a new session when it is the key's first or
    follows a gap strictly longer than ``gap_minutes``.
    """
    order = [F.col(ts_col)]
    if order_col:
        order.append(F.col(order_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
    is_new = (
        F.when(prev.isNull() | (gap_s > gap_minutes * 60), F.lit(1))
        .otherwise(F.lit(0))
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        "*",
        is_new.alias("session_start"),
        F.sum(is_new).over(wcum).cast("long").alias("session_seq"),
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Per-session aggregates: (keys, session_seq, n_events, start_ts,
    end_ts, duration_s). One extra aggregation over the sessionized
    frame — same key partitioning, so AQE coalesces it onto the window
    shuffle's output."""
    s = sessionize(df, key_cols, ts_col, gap_minutes, order_col)
    return s.groupBy(*key_cols, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("duration_s"),
    )


def funnel(
    df: DataFrame,
    key_cols: list[str],
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Greedy funnel matching: per key, the earliest chain of ``steps``
    in order (step i+1 must occur at-or-after the matched step i).

    Output: one row per key with ``steps_completed`` (0..len(steps))
    and ``t0..t{n-1}`` (matched timestamps, NULL past the last
    completed step — NULLs are monotone by construction: a later step
    can only match after an earlier one did).

    Spark-first shape: n chained window aggregates over the SAME key
    partitioning — Catalyst reuses one exchange for all of them, so the
    whole funnel is a single shuffle however many steps it has, then a
    final per-key collapse. Greedy-earliest is the standard funnel
    semantics (deterministic, and provably maximal for 'does the chain
    exist': if any chain exists, the greedy one does).
    """
    w = Window.partitionBy(*key_cols)
    cur = df.select(
        *[F.col(k) for k in key_cols], F.col(type_col), F.col(ts_col)
    )
    prev_t = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_t))
        cur = cur.withColumn(
            f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = f"t{i}"
    tcols = [f"t{i}" for i in range(len(steps))]
    completed = None
    for t in tcols:
        c = F.when(F.col(t).isNotNull(), 1).otherwise(0)
        completed = c if completed is None else completed + c
    return (
        cur.groupBy(*key_cols)
        .agg(*[F.min(t).alias(t) for t in tcols])
        .select(
            *key_cols,
            completed.cast("long").alias("steps_completed"),
            *tcols,
        )
    )
