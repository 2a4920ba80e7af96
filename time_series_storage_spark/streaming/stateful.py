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


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "lid",
    right_id: str = "rid",
    lookback_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming backward as-of join — the custom stateful operator no
    built-in streaming join expresses (stream-stream joins need a
    range condition on BOTH sides' watermarks; as-of's "latest right
    at-or-before" is an ordered-state problem, not a predicate).

    The batch twin is ``operators.asof.asof_join``; here the two
    streams are unioned with a side tag, grouped by key, and an
    ``applyInPandasWithState`` function keeps per key the RIGHT-side
    buffer needed to serve future lefts: every right row within
    ``lookback_seconds`` of the newest event seen. Each micro-batch is
    processed in event-time order (rights before lefts at equal ts,
    larger ``right_id`` wins right ties — the batch operator's exact
    tie rule), emitting one append-mode row per left event:
    (key, left_id, left ts, asof_ts, asof_rid; NULLs when nothing
    matched).

    Bounded-state contract: a left row may match any right row that is
    at most ``lookback_seconds`` older than the stream's frontier for
    that key when the left is processed — rights older than that are
    pruned, so a sufficiently late left can miss a match a full batch
    replay would find (it emits NULLs, never a wrong match). The
    watermark bounds how late ANY row can arrive at all; on in-order
    streams the output converges to the batch as-of exactly (pinned by
    test).
    """
    # null ts cannot order and a null id cannot tag its row — drop
    # JVM-side (NaN/NaT in the pandas state fn is a poison pill that
    # fails the micro-batch and every checkpoint restart)
    lt = (
        left.where(F.col(left_ts).isNotNull() & F.col(left_id).isNotNull())
        .select(
            F.col(on).cast("string").alias("k"),
            F.col(left_ts).alias("ts"),
            F.lit(1).alias("side"),
            F.col(left_id).cast("long").alias("lid"),
            F.lit(None).cast("long").alias("rid"),
        )
        .withWatermark("ts", watermark)
    )
    rt = (
        right.where(F.col(right_ts).isNotNull() & F.col(right_id).isNotNull())
        .select(
            F.col(on).cast("string").alias("k"),
            F.col(right_ts).alias("ts"),
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("lid"),
            F.col(right_id).cast("long").alias("rid"),
        )
        .withWatermark("ts", watermark)
    )
    u = lt.unionByName(rt)

    out_schema = (
        "k string, lid long, ts_us long, asof_ts_us long, asof_rid long"
    )
    state_schema = "r_ts array<long>, r_id array<long>"
    lb_us = int(lookback_seconds) * 1_000_000

    def match(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            r_ts, r_id = (
                np.array(state.get[0], dtype=np.int64),
                np.array(state.get[1], dtype=np.int64),
            )
        else:
            r_ts = np.empty(0, dtype=np.int64)
            r_id = np.empty(0, dtype=np.int64)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True)
        # Fully vectorized — NO per-row Python (a hot key's micro-batch
        # used to pay O(n) np.append copies per right plus an O(state)
        # linear scan per left: quadratic). The sequential semantics —
        # process in (ts, rights-before-lefts) order, each left matches
        # max (ts, rid) among rights seen so far within lookback —
        # reduce to a pure predicate: a right (state or batch) is
        # eligible for a left exactly when r_ts <= l_ts, because any
        # batch right with r_ts <= l_ts sorts before that left anyway.
        # So: sort ALL rights once by (ts, rid); for each left, the
        # rights with r_ts <= l_ts are a PREFIX of that sort and the
        # max-(ts, rid) winner is the prefix's LAST element — one
        # searchsorted per batch serves every left.
        ts_us = (
            rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        )
        is_r = rows["side"].to_numpy() == 0
        all_r_ts = np.concatenate([r_ts, ts_us[is_r]])
        all_r_id = np.concatenate(
            [r_id, rows["rid"].to_numpy()[is_r].astype(np.int64)]
        )
        order = np.lexsort((all_r_id, all_r_ts))
        sr_ts, sr_id = all_r_ts[order], all_r_id[order]
        # lefts in event-time order (stable: equal-ts lefts keep input
        # order), matching the sequential emission order
        l_mask = ~is_r
        l_order = np.argsort(ts_us[l_mask], kind="stable")
        l_ts = ts_us[l_mask][l_order]
        l_id = rows["lid"].to_numpy()[l_mask].astype(np.int64)[l_order]
        # prune rights beyond the lookback of the key's frontier
        frontier = max(
            int(ts_us.max()),
            int(sr_ts[-1]) if len(sr_ts) else 0,
        )
        keep = sr_ts >= frontier - lb_us
        state.update((sr_ts[keep].tolist(), sr_id[keep].tolist()))
        if len(l_ts):
            if len(sr_ts):
                pos = np.searchsorted(sr_ts, l_ts, side="right") - 1
                hit = pos >= 0
                m_ts = pd.array(sr_ts[pos], dtype="Int64")
                m_id = pd.array(sr_id[pos], dtype="Int64")
                m_ts[~hit] = pd.NA
                m_id[~hit] = pd.NA
            else:
                m_ts = pd.array([pd.NA] * len(l_ts), dtype="Int64")
                m_id = pd.array([pd.NA] * len(l_ts), dtype="Int64")
            yield pd.DataFrame(
                {
                    "k": [key[0]] * len(l_ts),
                    "lid": l_id,
                    "ts_us": l_ts,
                    "asof_ts_us": m_ts,
                    "asof_rid": m_id,
                }
            )

    return u.groupBy("k").applyInPandasWithState(
        match,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_STATE_SCHEMA = "minima array<long>"


def streaming_kmv_distinct(
    elements: DataFrame,
    key_col: str,
    elem_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming KMV distinct-count: the k-minimum-values sketch
    (operators/sketch.py) maintained incrementally per key — "how many
    distinct X so far" over an unbounded stream with O(k) state, the
    question exact streaming distinct cannot answer without unbounded
    state.

    KMV is the sketch built for this deployment: its merge is "union
    the minima, keep the k smallest", so per-batch incorporation is
    exactly the batch operator's phase-1/phase-2 selection replayed
    against the stored minima. After any prefix of micro-batches the
    state — and therefore the emitted estimate — is bit-identical to
    running batch :func:`~..operators.sketch.kmv_estimate` over the
    union of those batches' rows (tests/test_streaming_stateful.py
    pins this, including across single-file micro-batches).

    Emits one row per (key, micro-batch that changed or refreshed the
    key): key, n_mins, kth_min, est_distinct — same estimator, same
    exact integer arithmetic (Python ints here, BIGINT there).

    State is ``k`` longs per key, forever — no watermark needed; the
    sketch never grows. The hash projection runs JVM-side before the
    Arrow exchange; the per-key python work is O(batch distinct + k).
    """
    from ..operators.sketch import KMV_M, kmv_hash

    if not 2 < k <= 255:
        raise ValueError(f"k must be in (2, 255], got {k}")
    out_schema = (
        f"{key_col} string, n_mins long, kth_min long, est_distinct long"
    )

    def absorb(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        minima = list(state.get[0]) if state.exists else []
        s = set(minima)
        for pdf in pdfs:
            s.update(int(h) for h in pdf["h"])
        m = sorted(s)[:k]
        state.update((m,))
        n = len(m)
        h_k = int(m[-1]) if m else 0
        if n < k:
            est = n
        else:
            est = (k - 1) * (KMV_M // h_k) + ((k - 1) * (KMV_M % h_k)) // h_k
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_mins": [n],
                "kth_min": [h_k],
                "est_distinct": [est],
            }
        )

    return (
        elements.select(
            F.col(key_col).cast("string").alias(key_col),
            kmv_hash(elem_col).alias("h"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            absorb,
            outputStructType=out_schema,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HH_STATE_SCHEMA = (
    "items array<string>, counts array<long>, errs array<long>"
)


def streaming_heavy_hitters(
    elements: DataFrame,
    key_col: str,
    elem_col: str,
    capacity: int = 16,
) -> DataFrame:
    """Streaming heavy hitters: the SpaceSaving summary (Metwally et
    al., ICDT'05) with weighted updates, maintained per key over an
    unbounded element stream in O(capacity) state — "which items are
    frequent so far", the companion question to KMV's "how many
    distinct".

    Guarantees (the classic SpaceSaving bounds, pinned in tests): for
    every tracked item ``est_count - max_err <= true <= est_count``,
    and any item whose true count exceeds ``total_seen / capacity`` is
    tracked. When a key's distinct-element count never exceeds
    ``capacity`` the summary is EXACT (``max_err`` stays 0 and
    ``est_count`` equals the batch groupBy count — the convergence
    pin).

    Determinism contract: each micro-batch is pre-counted (weighted
    update, one SpaceSaving step per distinct element) and absorbed in
    (batch count desc, item asc) order; eviction always removes the
    (count, item)-minimal counter. Same batches => same summary,
    replayable across restarts.

    Scale shape: the projection to (key, element) runs JVM-side; the
    Arrow-batched python work is O(batch distinct + capacity) per key
    per batch, state is ~capacity strings + 2*capacity longs per key,
    forever — no watermark needed, the summary never grows. Emits the
    full tracked summary for each key touched by the batch (update
    mode): key, item, est_count, max_err.
    """
    if capacity < 2:
        raise ValueError(f"capacity must be >= 2, got {capacity}")
    out_schema = (
        f"{key_col} string, item string, est_count long, max_err long"
    )

    def absorb(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        if state.exists:
            items, counts, errs = state.get
            summary = {
                it: [int(c), int(e)]
                for it, c, e in zip(items, counts, errs)
            }
        else:
            summary = {}
        batch: dict[str, int] = {}
        for pdf in pdfs:
            for it, c in pdf[elem_col].value_counts().items():
                batch[it] = batch.get(it, 0) + int(c)
        for item, c in sorted(batch.items(), key=lambda kv: (-kv[1], kv[0])):
            if item in summary:
                summary[item][0] += c
            elif len(summary) < capacity:
                summary[item] = [c, 0]
            else:
                evict = min(
                    summary.items(), key=lambda kv: (kv[1][0], kv[0])
                )[0]
                floor_c = summary[evict][0]
                del summary[evict]
                summary[item] = [floor_c + c, floor_c]
        ordered = sorted(
            summary.items(), key=lambda kv: (-kv[1][0], kv[0])
        )
        state.update((
            [it for it, _ in ordered],
            [ce[0] for _, ce in ordered],
            [ce[1] for _, ce in ordered],
        ))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ordered),
                "item": [it for it, _ in ordered],
                "est_count": [ce[0] for _, ce in ordered],
                "max_err": [ce[1] for _, ce in ordered],
            }
        )

    return (
        elements.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(elem_col).cast("string").alias(elem_col),
        )
        # NULL is not a countable item: dropped explicitly (pandas
        # value_counts would silently skip it anyway — this makes the
        # policy visible and keeps the under-capacity exactness claim
        # honest vs a batch groupBy, which WOULD count a null group)
        .where(F.col(elem_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            absorb,
            outputStructType=out_schema,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


GAP_STATE_SCHEMA = "last_ep long, last_id long"


def streaming_gap_detect(
    series: DataFrame,
    key_col: str,
    threshold_seconds: int,
    ts_col: str = "ts",
    id_col: str = "id",
) -> DataFrame:
    """Streaming reporting-silence detection — the stateful twin of
    ``operators.analytics.gap_detect``: per key, every consecutive
    pair of observations further apart than ``threshold_seconds``
    emits one gap row, across micro-batch boundaries.

    State is exactly TWO longs per key (the last observation's epoch
    and id tiebreak) — the minimum any cross-batch lag needs; no
    watermark required, the state never grows. Within a batch rows
    sort by (epoch, id) — the same composite order as the batch
    operator — so on in-order streams the emitted gaps converge to
    the batch output exactly (pinned in tests). An out-of-order
    arrival BEHIND the stored cursor cannot retroactively split an
    already-emitted gap; it is counted against the cursor like any
    late point (documented divergence, same tradeoff as every
    bounded-state streaming operator here).

    Output: key, gap_start_ep, gap_end_ep, gap_s (epoch seconds —
    integer, engine-portable).
    """
    out_schema = (
        f"{key_col} string, gap_start_ep long, gap_end_ep long, gap_s long"
    )

    def scan(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        import numpy as np

        last_ep, last_id = state.get if state.exists else (None, None)
        frames = [p for p in pdfs if len(p)]
        gaps_start, gaps_end = [], []
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            pdf = pdf.dropna(subset=["_ep"])  # null ts cannot order
            if last_ep is not None:
                # a point BEHIND the cursor cannot retroactively change
                # anything already emitted; keeping it would REGRESS the
                # cursor and fabricate a false gap against the next
                # arrival over time that provably had an observation
                pdf = pdf[pdf["_ep"].values >= last_ep]
            if not len(pdf):
                return
            order = np.lexsort((pdf["_id"].values, pdf["_ep"].values))
            eps = pdf["_ep"].values[order]
            ids = pdf["_id"].values[order]
            prev = np.concatenate(
                ([last_ep if last_ep is not None else eps[0]], eps[:-1])
            )
            mask = (eps - prev) > threshold_seconds
            gaps_start = prev[mask].tolist()
            gaps_end = eps[mask].tolist()
            state.update((int(eps[-1]), int(ids[-1])))
        if gaps_start:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(gaps_start),
                    "gap_start_ep": gaps_start,
                    "gap_end_ep": gaps_end,
                    "gap_s": [e - s for s, e in zip(gaps_start, gaps_end)],
                }
            )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias("_id"),
        )
        # null ts cannot order; null id cannot tie-break — either one
        # becomes NaN in pandas and int() on it poisons the micro-batch
        .where(F.col("_ep").isNotNull() & F.col("_id").isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            scan,
            outputStructType=out_schema,
            stateStructType=GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_STATE_SCHEMA = "qs array<long>"


def streaming_ewma(
    series: DataFrame,
    key_col: str,
    n_lags: int = 8,
    ts_col: str = "ts",
    q_col: str = "q",
    id_col: str = "id",
) -> DataFrame:
    """Streaming truncated EWMA — the stateful twin of
    ``operators.analytics.ewma_trunc``: each observation's smoothed
    value from power-of-two weights over itself and its ``n_lags - 1``
    predecessors, across micro-batch boundaries.

    State is the last ``n_lags - 1`` quantized values per key (a ring
    of longs — the K-lag window's entire memory; this bounded state is
    exactly why the batch operator truncates the EWMA horizon).
    Within a batch rows sort by (epoch, id); note the epoch is
    WHOLE-SECOND (the watermark-friendly long the state keys on), so
    two observations inside the same second order by id here while
    the batch operator's raw-timestamp sort sees their sub-second
    order — on second-granularity (or id-ordered) streams every
    emitted ``ewma_q`` equals the batch output bit-for-bit (pinned in
    tests); the arithmetic is the same exact integer num/den with
    renormalized warm-up.

    Emits one row per observation: key, id, q, ewma_q.
    """
    if not 1 <= n_lags <= 40:
        raise ValueError(f"n_lags must be in [1, 40], got {n_lags}")
    out_schema = f"{key_col} string, {id_col} long, q long, ewma_q long"

    def smooth(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        hist = list(state.get[0]) if state.exists else []
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", id_col], kind="mergesort")
        out_ids, out_q, out_e = [], [], []
        for rid, q in zip(pdf[id_col], pdf["_q"]):
            q = int(q)
            window = ([q] + hist[::-1])[:n_lags]  # newest first
            num = den = 0
            for j, x in enumerate(window):
                w = 1 << (n_lags - 1 - j)
                num += x * w
                den += w
            out_ids.append(int(rid))
            out_q.append(q)
            # int // int: EXACT floor at any magnitude — math.floor of
            # a float quotient rounds past 2^53 and could diverge from
            # the batch operator's exact long arithmetic
            out_e.append(num // den)
            hist.append(q)
            if len(hist) > n_lags - 1:
                hist = hist[-(n_lags - 1):] if n_lags > 1 else []
        state.update((hist,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_ids),
                id_col: out_ids,
                "q": out_q,
                "ewma_q": out_e,
            }
        )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(q_col).cast("long").alias("_q"),
        )
        # a NULL measure, timestamp, or id cannot smooth, order, or
        # tie-break; dropping it HERE (JVM-side) keeps one bad row from
        # becoming a poison pill (int(NaN) in the state fn fails the
        # task AND every checkpoint restart)
        .where(
            F.col("_q").isNotNull()
            & F.col("_ep").isNotNull()
            & F.col(id_col).isNotNull()
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            smooth,
            outputStructType=out_schema,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_STATE_SCHEMA = "l long, b long"


def streaming_holt(
    series: DataFrame,
    key_col: str,
    ep_col: str = "ep",
    x_col: str = "x",
) -> DataFrame:
    """Streaming Holt linear-trend smoothing — the stateful twin of
    ``operators.analytics.holt_linear``, and the case that NEEDS
    per-key state: the level+trend recursion has an unbounded horizon
    (every value depends on the full prefix), so unlike the truncated
    EWMA's K-value ring the state here is just the two running
    fixed-point registers (l, b) — constant memory per series however
    long it runs.

    Arithmetic is the batch operator's exactly: with alpha=gamma=1/2
    each step is one halving truncated toward zero, done here in pure
    integer form (``a // 2`` sign-adjusted), which equals the batch
    double-halving bit-for-bit within the operator's documented
    sub-2^52 magnitude contract. First observation ever per key:
    l = x, b = 0. Rows sort by (ep, x) within a batch and the state
    assumes in-order micro-batches (the bucketed-series contract —
    same as streaming_cusum); on in-order streams every emitted row
    equals the batch output bit-for-bit (pinned in tests).

    Emits one row per observation: key, ep, x, level_x1e6, trend_x1e6.
    """
    out_schema = (
        f"{key_col} string, {ep_col} long, {x_col} long,"
        " level_x1e6 long, trend_x1e6 long"
    )

    def _half_trunc(a: int) -> int:
        return a // 2 if a >= 0 else -((-a) // 2)

    def smooth(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        have = state.exists
        l, b = state.get if have else (0, 0)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", "_x"], kind="mergesort")
        eps, xs, ls, bs = [], [], [], []
        for ep, x in zip(pdf["_ep"], pdf["_x"]):
            x = int(x)
            if not have:
                l, b, have = x, 0, True
            else:
                nl = _half_trunc(x + l + b)
                b = _half_trunc(nl - l + b)
                l = nl
            eps.append(int(ep))
            xs.append(x)
            ls.append(l)
            bs.append(b)
        state.update((l, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(eps),
                ep_col: eps,
                x_col: xs,
                "level_x1e6": ls,
                "trend_x1e6": bs,
            }
        )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ep_col).cast("long").alias("_ep"),
            F.col(x_col).cast("long").alias("_x"),
        )
        .where(
            F.col("_ep").isNotNull() & F.col("_x").isNotNull()
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            smooth,
            outputStructType=out_schema,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HW_STATE_SCHEMA = "t long, l long, b long, s array<long>"


def streaming_holt_winters(
    series: DataFrame,
    key_col: str,
    ep_col: str = "ep",
    x_col: str = "x",
    season: int = 24,
) -> DataFrame:
    """Streaming Holt-Winters additive seasonal smoothing — the
    stateful twin of ``operators.analytics.holt_winters``. Like
    :func:`streaming_holt` the horizon is unbounded, but the state
    stays BOUNDED BY THE SEASON, never the stream: the two fixed-point
    registers plus the length-m seasonal ring, m = ``season`` (and the
    observation counter) — constant memory per series however long it
    runs.

    Warmup matches the batch initialization exactly: the first m
    observations per key are BUFFERED IN THE RING SLOT of the state
    (the counter ``t`` discriminates buffer from ring — t < m means
    ``s`` still holds raw observations) and emit nothing; at the m-th
    observation the state flips to ``l = sum(buffer) // m, b = 0,
    s[i] = x_i - l`` — the batch operator's first-season rule — and
    every later observation steps the alpha=gamma=delta=1/2 halving
    recursion in sign-adjusted pure-integer form (bit-equal to the
    batch double halving within the sub-2^52 contract). On in-order
    micro-batches every emitted row equals batch ``holt_winters``
    bit-for-bit, across batch boundaries and through warmup split over
    multiple batches (pinned in tests).

    Emits one row per observation with t > m: key, ep, x, level_x1e6,
    trend_x1e6, seasonal_x1e6.
    """
    m = int(season)
    if m < 2:
        raise ValueError(f"streaming_holt_winters: season >= 2, got {m}")
    out_schema = (
        f"{key_col} string, {ep_col} long, {x_col} long,"
        " level_x1e6 long, trend_x1e6 long, seasonal_x1e6 long"
    )

    def _half_trunc(a: int) -> int:
        return a // 2 if a >= 0 else -((-a) // 2)

    def smooth(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        if state.exists:
            t, l, b, s = state.get
            s = list(s)
        else:
            t, l, b, s = 0, 0, 0, []
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", "_x"], kind="mergesort")
        out = []
        for ep, x in zip(pdf["_ep"], pdf["_x"]):
            x = int(x)
            t += 1
            if t <= m:
                s.append(x)
                if t == m:  # flip buffer -> first-season init
                    l = sum(s) // m
                    b = 0
                    s = [v - l for v in s]
                continue
            j = (t - 1) % m
            sm = s[j]
            nl = _half_trunc(x - sm + l + b)
            nb = _half_trunc(nl - l + b)
            ns = _half_trunc(x - nl + sm)
            s[j] = ns
            l, b = nl, nb
            out.append((int(ep), x, l, b, ns))
        state.update((t, l, b, s))
        if not out:
            return
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out),
                ep_col: [r[0] for r in out],
                x_col: [r[1] for r in out],
                "level_x1e6": [r[2] for r in out],
                "trend_x1e6": [r[3] for r in out],
                "seasonal_x1e6": [r[4] for r in out],
            }
        )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(ep_col).cast("long").alias("_ep"),
            F.col(x_col).cast("long").alias("_x"),
        )
        .where(F.col("_ep").isNotNull() & F.col("_x").isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            smooth,
            outputStructType=out_schema,
            stateStructType=HW_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOM_STATE_SCHEMA = "qs array<long>"


def streaming_anomaly_zscore(
    series: DataFrame,
    key_col: str,
    lookback: int = 20,
    min_points: int = 5,
    z_threshold: int = 3,
    ts_col: str = "ts",
    q_col: str = "q",
    id_col: str = "id",
) -> DataFrame:
    """Streaming trailing-window z-score anomaly flags — the stateful
    twin of ``operators.analytics.anomaly_zscore``, with the identical
    EXACT integer test ``(n*x - s)^2 * (n-1) > z^2 * n * (n*ss - s^2)``
    (the squared z cleared of division/sqrt) evaluated against the
    ``lookback`` observations BEFORE each row, across micro-batch
    boundaries.

    State is the last ``lookback`` quantized values per key (the
    baseline window's entire memory). Batches process in (whole-second
    epoch, id) order, so on second-granularity in-order streams flags
    converge to the batch operator bit-for-bit (pinned in tests);
    rows with fewer than ``min_points`` predecessors emit a NULL flag,
    never a false positive — the same under-baseline contract.

    Emits one row per observation: key, id, q, base_n, base_sum,
    is_anomaly (0/1, NULL when under-baselined).
    """
    if not 2 <= lookback <= 64:
        raise ValueError(f"lookback must be in [2, 64], got {lookback}")
    out_schema = (
        f"{key_col} string, {id_col} long, q long,"
        " base_n long, base_sum long, is_anomaly long"
    )
    z2 = z_threshold * z_threshold

    def scan(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        hist = list(state.get[0]) if state.exists else []
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", id_col], kind="mergesort")
        ids, qs, ns, ss_, flags = [], [], [], [], []
        for rid, q in zip(pdf[id_col], pdf["_q"]):
            x = int(q)
            base = hist[-lookback:]
            n, s = len(base), sum(base)
            ss = sum(v * v for v in base)
            if n >= min_points:
                dev = n * x - s
                flag = int(dev * dev * (n - 1) > z2 * n * (n * ss - s * s))
            else:
                flag = None
            ids.append(int(rid))
            qs.append(x)
            ns.append(n)
            # SQL SUM over an empty frame is NULL, not 0 — match the
            # batch operator's (and any engine's) contract exactly
            ss_.append(s if n else None)
            flags.append(flag)
            hist.append(x)
            if len(hist) > lookback:
                hist = hist[-lookback:]
        state.update((hist,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ids),
                id_col: ids,
                "q": qs,
                "base_n": ns,
                "base_sum": pd.array(ss_, dtype="Int64"),
                "is_anomaly": pd.array(flags, dtype="Int64"),
            }
        )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(q_col).cast("long").alias("_q"),
        )
        # null id is the same poison pill as null measure/ts: it would
        # surface as NaN in pandas and fail int()/astype('int64')
        .where(
            F.col("_q").isNotNull()
            & F.col("_ep").isNotNull()
            & F.col(id_col).isNotNull()
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            scan,
            outputStructType=out_schema,
            stateStructType=ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PACK_STATE_SCHEMA = "next_off long"


def streaming_pack(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Streaming sequence packing — the online twin of
    ``operators.pack.pack_assignments``: documents arriving on a
    stream are appended to their group's running token layout and
    assigned ``bin_id = floor(start_off / budget)`` as they arrive
    (online dataset assembly: the dataloader can consume bin b as
    soon as the stream has moved past it).

    State is ONE long per group — the next cumulative offset; the
    contiguous-cumulative form is what makes streaming packing
    possible at all (first-fit would need every open bin's residual
    in state). Within a batch rows sort by id — the batch operator's
    order — so on id-ordered streams every assignment equals the
    batch layout exactly (pinned in tests); out-of-order arrivals
    append at the current offset (a documented divergence: an online
    packer cannot hold a gap open).

    Emits one row per document: group, id, n_tokens, start_off,
    bin_id.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out_schema = (
        f"{group_col} string, {id_col} long, {tokens_col} long,"
        " start_off long, bin_id long"
    )

    def lay_out(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        off = state.get[0] if state.exists else 0
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(id_col, kind="mergesort")
        starts = []
        for t in pdf[tokens_col]:
            starts.append(off)
            off += int(t)
        state.update((int(off),))
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(starts),
                id_col: pdf[id_col].astype("int64").values,
                tokens_col: pdf[tokens_col].astype("int64").values,
                "start_off": starts,
                "bin_id": [s // budget for s in starts],
            }
        )

    return (
        docs.select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(id_col).cast("long").alias(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
        )
        .where(F.col(tokens_col).isNotNull() & F.col(id_col).isNotNull())
        .groupBy(group_col)
        .applyInPandasWithState(
            lay_out,
            outputStructType=out_schema,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_STATE_SCHEMA = "last_type string"


def streaming_transition_events(
    events: DataFrame,
    key_col: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming first-order transition extraction — the stateful twin
    of the batch Markov-matrix query's lag pass: per key, every
    arriving event emits one (prev_type, curr_type) edge against the
    key's previous event, across micro-batch boundaries. Downstream
    consumers aggregate the edge stream into the transition matrix
    (counts are a plain windowed/total aggregate — kept OUT of this
    operator so the edges stay append-mode composable).

    State is ONE string per key (the last event type — all a lag
    needs). Batches sort by (whole-second epoch, id), the batch
    query's composite order, so on second-granularity in-order
    streams the aggregated edges equal the batch lag output exactly
    (pinned in tests). Each key's first event emits nothing (no
    predecessor), matching the batch WHERE prev IS NOT NULL.
    """
    out_schema = (
        f"{key_col} string, {id_col} long, prev_type string,"
        " curr_type string"
    )

    def emit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        last = state.get[0] if state.exists else None
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", id_col], kind="mergesort")
        ids, prevs, currs = [], [], []
        for rid, t in zip(pdf[id_col], pdf["_t"]):
            # NULL event types stay NULL (str(None) would fabricate a
            # 'None' category); an edge FROM a null predecessor is not
            # emitted — the batch query's WHERE prev IS NOT NULL
            cur = None if pd.isna(t) else str(t)
            if last is not None:
                ids.append(int(rid))
                prevs.append(last)
                currs.append(cur)
            last = cur
        state.update((last,))
        if ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(ids),
                    id_col: ids,
                    "prev_type": prevs,
                    "curr_type": currs,
                }
            )

    return (
        events.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(type_col).cast("string").alias("_t"),
        )
        # null ts cannot order; null id cannot tie-break (NaN poison)
        .where(F.col("_ep").isNotNull() & F.col(id_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            emit,
            outputStructType=out_schema,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ROLLING_KMV_STATE_SCHEMA = "bidxs array<long>, mins array<array<long>>"


def streaming_rolling_kmv(
    elements: DataFrame,
    key_col: str,
    elem_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
    window_buckets: int = 7,
    k: int = 64,
) -> DataFrame:
    """Streaming rolling distinct estimate — the stateful twin of
    ``operators.sketch.kmv_rolling_estimate``: per key, daily KMV
    sketches maintained incrementally and merged into trailing-window
    estimates as data arrives (rolling weekly-active-users on a
    stream).

    Because KMV merge is pure set algebra (union the minima, keep the
    k smallest), the absorbed state is ORDER-INDEPENDENT: any arrival
    order of the same rows yields the same sketches, so the latest
    emission per (key, bucket) converges to the batch operator
    wherever the window's data has fully arrived — a stronger
    convergence than the order-dependent twins (pinned in tests,
    including a late within-horizon arrival).

    State is bounded by construction: ``2 * (window_buckets - 1) + 1``
    buckets' k-minima per key — the last ``window_buckets`` ends are
    still emittable (late within-horizon data can refresh them) and
    the oldest of those needs ``window_buckets - 1`` lookback buckets
    below itself; anything older is pruned (a bucket arriving later
    than the horizon is absorbed but its window estimates from
    surviving buckets only — the bounded-state tradeoff, documented
    not hidden). Each batch emits the refreshed rolling estimate for
    every emittable bucket of each touched key: key, bucket_idx,
    n_mins, kth_min, est_distinct.
    """
    from ..operators.sketch import KMV_M, kmv_hash

    if not 2 < k <= 255:
        raise ValueError(f"k must be in (2, 255], got {k}")
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1, got {window_buckets}")
    out_schema = (
        f"{key_col} string, bucket_idx long, n_mins long,"
        " kth_min long, est_distinct long"
    )

    def absorb(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        if state.exists:
            bidxs, mins = state.get
            sketches = {
                int(b): set(int(x) for x in m)
                for b, m in zip(bidxs, mins)
            }
        else:
            sketches = {}
        touched = False
        for pdf in pdfs:
            for b, h in zip(pdf["_b"], pdf["h"]):
                sketches.setdefault(int(b), set()).add(int(h))
                touched = True
        if not touched and not sketches:
            return
        # retention keeps 2*(wb-1)+1 buckets: the EMISSION horizon is
        # the last wb ends (older ends were final when they left it),
        # and the oldest emittable end still needs wb-1 buckets of
        # lookback below itself
        top = max(sketches)
        keep_from = top - 2 * (window_buckets - 1)
        emit_from = top - (window_buckets - 1)
        sketches = {
            b: set(sorted(s)[:k])
            for b, s in sketches.items()
            if b >= keep_from
        }
        state.update((
            [b for b in sorted(sketches)],
            [sorted(sketches[b]) for b in sorted(sketches)],
        ))
        rows = {"b": [], "n": [], "kth": [], "est": []}
        for b in sorted(sketches):
            if b < emit_from:
                continue  # final estimate already emitted
            merged = sorted(
                set().union(
                    *(
                        sketches[bb]
                        for bb in sketches
                        if b - window_buckets < bb <= b
                    )
                )
            )[:k]
            n = len(merged)
            kth = merged[-1] if merged else 0
            if n < k:
                est = n
            else:
                est = (k - 1) * (KMV_M // kth) + (
                    (k - 1) * (KMV_M % kth)
                ) // kth
            rows["b"].append(b)
            rows["n"].append(n)
            rows["kth"].append(kth)
            rows["est"].append(est)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(rows["b"]),
                "bucket_idx": rows["b"],
                "n_mins": rows["n"],
                "kth_min": rows["kth"],
                "est_distinct": rows["est"],
            }
        )

    bidx = F.floor(
        F.unix_timestamp(F.col(ts_col)) / bucket_seconds
    ).cast("long")
    return (
        elements.select(
            F.col(key_col).cast("string").alias(key_col),
            bidx.alias("_b"),
            kmv_hash(elem_col).alias("h"),
        )
        .where(F.col("_b").isNotNull() & F.col("h").isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            absorb,
            outputStructType=out_schema,
            stateStructType=ROLLING_KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_STATE_SCHEMA = "s long"


def streaming_cusum(
    series: DataFrame,
    key_col: str,
    target: int,
    ts_col: str = "ts",
    q_col: str = "q",
    id_col: str = "id",
) -> DataFrame:
    """Streaming one-sided CUSUM — the stateful twin of
    ``operators.analytics.cusum``: per key, the reset-at-zero drift
    statistic ``S_i = max(0, S_{i-1} + (q_i - target))`` carried
    across micro-batch boundaries.

    The batch operator fits each series' target from the whole data;
    a stream cannot see its future, so ``target`` is the caller's
    fitted allowance (the standard deployment: fit k offline on
    history, monitor the live stream against it). State is ONE long
    per key — the current statistic — the smallest state of any
    operator in this module.

    The per-batch work is fully vectorized: with y = q - target and
    the carry s0, prefix sums C = cumsum(y) give

        ``S_i = C_i - min(running_min(C)_i, -s0)``

    (the closed form of the recursion started at ``S_0 = s0 >= 0``:
    the floor ``-s0`` plays the virtual C_0 so the carry participates
    in the running minimum; the ``0`` floor is subsumed because
    ``-s0 <= 0``). No Python loop over rows — one cumsum + one
    minimum-accumulate per key per batch, the same discipline as the
    vectorized funnel / as-of state functions.

    Rows order by (whole-second epoch, id) within a batch — the
    same tie contract as ``streaming_ewma``; on in-order streams the
    emitted statistic equals the batch operator bit-for-bit (pinned).
    Emits one row per observation: key, id, q, cusum.
    """
    out_schema = f"{key_col} string, {id_col} long, q long, cusum long"
    k = int(target)

    def advance(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        s0 = int(state.get[0]) if state.exists else 0
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", id_col], kind="mergesort")
        q = pdf["_q"].to_numpy(dtype="int64")
        c = np.cumsum(q - k)
        floor = np.minimum(np.minimum.accumulate(c), -s0)
        s = c - floor
        state.update((int(s[-1]),))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(s),
                id_col: pdf[id_col].to_numpy(dtype="int64"),
                "q": q,
                "cusum": s,
            }
        )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(q_col).cast("long").alias("_q"),
        )
        # NULL measure/epoch/id cannot advance, order, or tie-break;
        # drop JVM-side so one bad row is not a poison pill for the
        # task and every checkpoint restart after it
        .where(
            F.col("_q").isNotNull()
            & F.col("_ep").isNotNull()
            & F.col(id_col).isNotNull()
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            advance,
            outputStructType=out_schema,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ROLLING_CORR_STATE_SCHEMA = "xs array<long>, ys array<long>"


def streaming_rolling_corr(
    series: DataFrame,
    key_col: str,
    window: int = 24,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Streaming rolling Pearson components — the stateful twin of the
    batch trailing-window co-movement query (``ts_rolling_corr``): per
    key, for every observation whose trailing ``window`` observations
    are complete, the EXACT integer components (corr_num, sxx, syy)
    of the Pearson correlation between the two aligned series.

    State is the last ``window - 1`` (x, y) pairs per key — bounded by
    construction, exactly the batch operator's frame memory. Each
    micro-batch is vectorized: one concat of state + batch, five
    prefix-sum arrays (x, y, xy, x^2, y^2), and every emitted row's
    frame aggregate is two prefix lookups — no per-row Python loop.
    Rows order by (whole-second epoch, id) within a batch, the module's
    standard tie contract; on in-order bucket streams the emitted
    components equal the batch query bit-for-bit (pinned).

    Emits only complete windows (the batch twin's ``n_w = window``
    filter): key, id, corr_num, sxx, syy.
    """
    if not 2 <= window <= 10_000:
        raise ValueError(f"window must be in [2, 10000], got {window}")
    out_schema = (
        f"{key_col} string, {id_col} long, "
        "corr_num long, sxx long, syy long"
    )

    def advance(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        if state.exists:
            sx, sy = state.get
            hx, hy = list(sx), list(sy)
        else:
            hx, hy = [], []
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["_ep", id_col], kind="mergesort")
        bx = pdf["_x"].to_numpy(dtype="int64")
        by = pdf["_y"].to_numpy(dtype="int64")
        ax = np.concatenate([np.asarray(hx, dtype="int64"), bx])
        ay = np.concatenate([np.asarray(hy, dtype="int64"), by])
        n0 = len(hx)
        # five prefix sums; every frame aggregate = two lookups
        z = np.zeros(1, dtype="int64")
        px = np.concatenate([z, np.cumsum(ax)])
        py = np.concatenate([z, np.cumsum(ay)])
        pxy = np.concatenate([z, np.cumsum(ax * ay)])
        px2 = np.concatenate([z, np.cumsum(ax * ax)])
        py2 = np.concatenate([z, np.cumsum(ay * ay)])
        m = np.arange(n0, n0 + len(bx)) + 1  # global end index per row
        full = m >= window
        if full.any():
            hi, lo = m[full], m[full] - window
            w = np.int64(window)
            sx_, sy_ = px[hi] - px[lo], py[hi] - py[lo]
            sxy_ = pxy[hi] - pxy[lo]
            sx2_, sy2_ = px2[hi] - px2[lo], py2[hi] - py2[lo]
            out = pd.DataFrame(
                {
                    key_col: [key[0]] * int(full.sum()),
                    id_col: pdf[id_col].to_numpy(dtype="int64")[full],
                    "corr_num": w * sxy_ - sx_ * sy_,
                    "sxx": w * sx2_ - sx_ * sx_,
                    "syy": w * sy2_ - sy_ * sy_,
                }
            )
        else:
            out = None
        keep = window - 1
        state.update((ax[-keep:].tolist(), ay[-keep:].tolist()))
        if out is not None:
            yield out

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
            F.col(x_col).cast("long").alias("_x"),
            F.col(y_col).cast("long").alias("_y"),
        )
        # NULLs cannot align, order, or tie-break — drop JVM-side so a
        # bad row is not a poison pill across checkpoint restarts
        .where(
            F.col("_x").isNotNull()
            & F.col("_y").isNotNull()
            & F.col("_ep").isNotNull()
            & F.col(id_col).isNotNull()
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            advance,
            outputStructType=out_schema,
            stateStructType=ROLLING_CORR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEBOUNCE_STATE_SCHEMA = (
    "head_id long, head_ep long, size long, last_ep long, last_id long"
)


def streaming_debounce(
    series: DataFrame,
    key_col: str,
    threshold_seconds: int,
    ts_col: str = "ts",
    id_col: str = "id",
) -> DataFrame:
    """Streaming burst collapse — the stateful twin of the batch
    debounce (``events_debounce``): per key, consecutive events with
    gaps <= ``threshold_seconds`` collapse into one burst represented
    by its HEAD event, across micro-batch boundaries.

    A burst is only provably complete when a later event arrives
    beyond the threshold, so emission is ON CLOSE: each new burst head
    flushes the previous burst's (head id, head epoch, collapsed
    count); the per-key open burst rides in state (five longs — head,
    epoch, size, and the (epoch, id) cursor) and is emitted by the
    NEXT event that closes it. On in-order streams the closed bursts
    equal the batch operator's output minus each key's final
    still-open burst (pinned). Rows behind the cursor drop — a late
    arrival cannot retroactively split an already-flushed burst (the
    same bounded-state tradeoff as the gap twin, documented there).

    Per-batch work is vectorized: one lexsort, one diff for the head
    mask, one cumsum for burst ids, one bincount for sizes — no
    per-row Python.

    Emits one row per CLOSED burst: key, id (head), head_ep,
    n_collapsed.
    """
    out_schema = (
        f"{key_col} string, {id_col} long, head_ep long, n_collapsed long"
    )

    def scan(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        st = state.get if state.exists else None
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        order = np.lexsort((pdf[id_col].values, pdf["_ep"].values))
        eps = pdf["_ep"].values[order].astype("int64")
        ids = pdf[id_col].values[order].astype("int64")
        if st is not None:
            head_id, head_ep, size, last_ep, _last_id = (
                int(st[0]), int(st[1]), int(st[2]), int(st[3]), int(st[4]),
            )
            keep = eps >= last_ep
            eps, ids = eps[keep], ids[keep]
            if not len(eps):
                return
            prev = np.concatenate(([last_ep], eps[:-1]))
            is_head = (eps - prev) > threshold_seconds
        else:
            head_id = head_ep = None
            size = 0
            prev = np.concatenate(([eps[0]], eps[:-1]))
            is_head = (eps - prev) > threshold_seconds
            is_head[0] = True
        burst = np.cumsum(is_head)  # 0 = continuation of the open burst
        nb = int(burst[-1])
        n_open_join = int((burst == 0).sum())
        out_ids, out_eps, out_n = [], [], []
        if nb > 0:
            if st is not None:
                # a new head arrived: the carried burst is now closed
                out_ids.append(head_id)
                out_eps.append(head_ep)
                out_n.append(size + n_open_join)
            counts = np.bincount(burst, minlength=nb + 1)
            hp = np.flatnonzero(is_head)  # head position of bursts 1..nb
            out_ids.extend(ids[hp[:-1]].tolist())
            out_eps.extend(eps[hp[:-1]].tolist())
            out_n.extend(counts[1:nb].tolist())
            new_state = (
                int(ids[hp[-1]]), int(eps[hp[-1]]), int(counts[nb]),
                int(eps[-1]), int(ids[-1]),
            )
        else:  # every row joined the carried burst
            new_state = (
                head_id, head_ep, size + n_open_join,
                int(eps[-1]), int(ids[-1]),
            )
        state.update(new_state)
        if out_ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_ids),
                    id_col: out_ids,
                    "head_ep": out_eps,
                    "n_collapsed": out_n,
                }
            )

    return (
        series.select(
            F.col(key_col).cast("string").alias(key_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
            F.col(id_col).cast("long").alias(id_col),
        )
        # null ts/id cannot order or tie-break; drop JVM-side so one
        # bad row is not a poison pill across checkpoint restarts
        .where(F.col("_ep").isNotNull() & F.col(id_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            scan,
            outputStructType=out_schema,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RETENTION_STATE_SCHEMA = "first_week long, emitted array<long>"


def streaming_retention_pairs(
    series: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming retention feed — the stateful twin of the batch
    cohort matrix (``retention_cohorts``): per user, emit each NEW
    (cohort_week, week_offset) activity pair exactly once, across
    micro-batch boundaries. The cohort matrix itself is then one
    ordinary aggregation over this append-only feed
    (``groupBy(cohort_week, week_offset).count()``) — each emitted
    pair is one distinct active user by construction, so the
    downstream count needs no distinct.

    State per user: the cohort week (fixed at first sight — the
    in-order contract shared by every operator here; a late arrival
    from before the stored first week is counted against the stored
    cohort) plus the set of week offsets already emitted, bounded by
    weeks-in-range. Week arithmetic is the batch operator's exact
    integer epoch-day division (Monday-epoch offset 3) — no
    date_trunc drift.

    Emits: user, cohort_week, week_offset (longs).
    """
    out_schema = (
        f"{user_col} long, cohort_week long, week_offset long"
    )

    def track(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ):
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        weeks = np.unique(
            ((pdf["_ep"].to_numpy(dtype="int64") // 86_400) + 3) // 7
        )
        if state.exists:
            first_week, emitted = int(state.get[0]), set(state.get[1])
        else:
            first_week, emitted = int(weeks[0]), set()
        offs = [
            int(w) - first_week
            for w in weeks
            if int(w) - first_week not in emitted
        ]
        if not offs:
            return
        emitted.update(offs)
        state.update((first_week, sorted(emitted)))
        yield pd.DataFrame(
            {
                user_col: [int(key[0])] * len(offs),
                "cohort_week": [first_week] * len(offs),
                "week_offset": offs,
            }
        )

    return (
        series.select(
            F.col(user_col).cast("long").alias(user_col),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
        )
        # null user/ts cannot cohort; drop JVM-side (poison-pill rule)
        .where(F.col(user_col).isNotNull() & F.col("_ep").isNotNull())
        .groupBy(user_col)
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=RETENTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
