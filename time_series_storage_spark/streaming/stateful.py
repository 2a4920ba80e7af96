"""Stateful streaming operators beyond windowed aggregation.

Two regimes, matching the division of labor in the batch operators:

* ``streaming_exact_dedup`` — built-in state: watermarked
  ``dropDuplicates`` on the normalized content fingerprint. Spark's
  own dedup state store handles it; the watermark bounds state (a
  duplicate arriving later than the watermark re-emits — the standard
  bounded-state tradeoff).

* ``streaming_funnel`` — genuinely custom state that no built-in
  streaming aggregate expresses: per-key ordered-step pattern matching
  (the streaming twin of ``operators.sessions.funnel``), implemented
  with Arrow-batched ``applyInPandasWithState``. The state is the
  greedy chain's matched epochs; each micro-batch advances it and
  emits the key's current progress. Events are consumed in event-time
  order *within* each batch; a cross-batch out-of-order event that
  would have matched earlier is picked up when it arrives (greedy
  re-check), so on in-order streams this converges to the batch
  funnel exactly — pinned by test.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalized_fingerprint


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """First-seen exact dedup over a document stream: one surviving row
    per normalized content fingerprint, state bounded by the watermark."""
    return (
        stream_df.withColumn("fp", normalized_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fp"])
    )


FUNNEL_STATE_SCHEMA = "ts_matched array<long>"


def streaming_funnel(
    events: DataFrame,
    key_col: str,
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key greedy funnel progress as a custom stateful operator.

    Output stream (update semantics): one row per key per micro-batch
    in which its progress advanced — (key, steps_completed,
    t_first..t_last as epoch seconds, -1 past the frontier).
    """
    n_steps = len(steps)
    out_schema = (
        f"{key_col} string, steps_completed long, "
        + ", ".join(f"t{i} long" for i in range(n_steps))
    )

    def advance(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        matched: list[int] = (
            list(state.get[0]) if state.exists else []
        )
        before = len(matched)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, type_col]).reset_index(drop=True)
        for _, r in rows.iterrows():
            if len(matched) >= n_steps:
                break
            want = steps[len(matched)]
            epoch = int(r[ts_col].timestamp())
            floor = matched[-1] if matched else None
            if r[type_col] == want and (floor is None or epoch >= floor):
                matched.append(epoch)
        if len(matched) != before or not state.exists:
            state.update((matched,))
            out = {key_col: [key[0]], "steps_completed": [len(matched)]}
            for i in range(n_steps):
                out[f"t{i}"] = [matched[i] if i < len(matched) else -1]
            yield pd.DataFrame(out)

    return (
        events.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(type_col),
            F.col(ts_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            advance,
            outputStructType=out_schema,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
