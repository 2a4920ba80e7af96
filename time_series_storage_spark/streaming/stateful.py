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

import numpy as np
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
        # vectorized greedy scan — the whole batch as two numpy arrays,
        # one nonzero per *step* (<= n_steps passes), never per row: a
        # hot key delivering a large batch costs O(rows x steps) numpy
        # ops, not per-row pandas overhead
        order = rows.sort_values([ts_col, type_col], kind="mergesort").index
        epochs = (
            rows[ts_col].to_numpy()[order]
            .astype("datetime64[s]")
            .astype("int64")
        )
        types = rows[type_col].to_numpy()[order]
        pos = 0
        while len(matched) < n_steps:
            if matched:
                # epochs is sorted: rows older than the last matched
                # step form a prefix, skip it in one bisection
                pos = max(
                    pos,
                    int(np.searchsorted(epochs, matched[-1], side="left")),
                )
            hits = np.nonzero(types[pos:] == steps[len(matched)])[0]
            if hits.size == 0:
                break
            pos += int(hits[0]) + 1
            matched.append(int(epochs[pos - 1]))
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
