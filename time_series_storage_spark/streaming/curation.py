"""Streaming curation — the two-store daily pipeline as one
``foreachBatch`` function with exactly-once semantics ACROSS stores.

Batch form: queries_extensions.q_pipeline_incremental_curation (LM
quality gate under the historical model, then exact dedup against the
fingerprint store). Streaming form: every micro-batch is scored under
the LM model-so-far and absorbed into it, gate survivors probe the
fingerprint set and absorb into that, and the final survivors are
emitted — the corpus curates itself as it arrives.

The composition is exactly-once WITHOUT a cross-store transaction
because both stores share the snapshot protocol's idempotent
``batch_id`` replay contract and the pipeline is deterministic given
the emissions:

* crash BEFORE the LM commit: nothing moved; the replay is a fresh
  run.
* crash BETWEEN the commits: the replayed ``lm_store.absorb`` returns
  its COMMITTED emission (the original pre-update scores — it never
  re-adds counts), the gate recomputes the same survivor set from
  that emission, and the fingerprint absorb proceeds as if first
  time.
* crash AFTER both commits: both absorbs return their committed
  emissions; nothing is re-added on either side.

So the pair of per-store watermarks IS the transaction log: the
fingerprint watermark trails the LM watermark by at most one batch,
and replaying the in-flight batch converges both. The same argument
extends to any chain of snapshot stores — determinism of the glue
between absorbs is the only requirement — and
:func:`curation_media_foreach_batch` instantiates it at length three
(LM gate -> text dedup -> perceptual media dedup), crash-tested at
both new commit boundaries.

Reference scope: the reference engine has no streaming or text
surface (SURVEY.md section 2) — this is training-data-pipeline
surface in its streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def curation_foreach_batch(
    lm_store,
    fp_store,
    keep_x1e9: int,
    id_col: str,
    text_col: str,
    emit,
):
    """Exactly-once ``foreachBatch`` function composing
    :class:`~..operators.lm_store.LmModelStore` and
    :class:`~..operators.dedup.FingerprintStore`.

    Per micro-batch: score under the LM model-so-far and absorb the
    counts; keep documents whose mean bigram probability clears
    ``keep_x1e9``/1e9 (exact integer compare — ``sum_p >= thr * n``,
    never a float mean; documents with fewer than two tokens have no
    score and fail the gate, same as the batch pipeline); dedup the
    kept documents against the fingerprint store and absorb the
    survivors. ``emit(survivors_df, batch_id)`` receives the committed
    (id, fp, dup_count) emission.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        scores = lm_store.absorb(
            batch_df, id_col, text_col, batch_id=batch_id
        )
        keep = scores.where(
            F.col("sum_p_x1e9") >= F.lit(keep_x1e9) * F.col("n_bigrams")
        ).select(id_col)
        kept = batch_df.join(keep, id_col, "left_semi")
        survivors = fp_store.absorb(
            kept, id_col, text_col, batch_id=batch_id
        )
        emit(survivors, batch_id)

    return _fn


def esub_foreach_batch(
    store,
    window_words: int,
    id_col: str,
    text_col: str,
    emit,
):
    """Exactly-once STREAMING exact-substring dedup (the Lee et al.
    2021 pipeline as a live feed): each micro-batch's stride-1 windows
    absorb into a window-grain raw-mode
    :class:`~..operators.dedup.FingerprintStore` under the batch id —
    a span ever retained by ANY earlier batch suppresses today's
    occurrences (first-day-wins at window grain) — and the per-document
    removal + reassembly is reconstructed FROM THE COMMITTED EMISSION
    (the kept window keys), so a sink-crash replay re-reads the
    committed keys and emits byte-identical reassembled survivors
    without re-adjudicating or double-absorbing.
    ``emit(survivors_df, batch_id)`` receives (id, n_words, n_kept,
    new_n_chars, new_text_md5) for every batch document."""
    from ..operators.text import (
        _remove_covered_and_reassemble,
        substring_windows,
    )

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        wins = substring_windows(batch_df, id_col, text_col, window_words)
        kept = store.absorb(
            wins.select("_pk", "_win"), "_pk", "_win",
            batch_id=int(batch_id),
        ).select("_pk")
        dup_occ = wins.join(kept, "_pk", "left_anti").select(
            F.col(id_col), "_start"
        )
        out = _remove_covered_and_reassemble(
            batch_df, dup_occ, id_col, text_col, window_words
        )
        emit(out, int(batch_id))

    return _fn


def curation_media_foreach_batch(
    lm_store,
    fp_store,
    media_store,
    render,
    keep_x1e9: int,
    id_col: str,
    text_col: str,
    emit,
):
    """THREE snapshot stores in one exactly-once ``foreachBatch`` —
    the proof that the module docstring's "any chain of snapshot
    stores" argument composes beyond two. Per micro-batch: score under
    the LM model-so-far and absorb the counts; gate; dedup the kept
    documents' TEXT against the fingerprint store and absorb; render
    the text survivors to media payloads with the caller's
    deterministic ``render(docs_df) -> (id, payload)`` (at scale this
    is a storage fetch, not a render); dedup the payloads PERCEPTUALLY
    against the media store (e.g. :class:`~..operators.phash
    .ImgNearDupStore`) and absorb; ``emit(survivors_df, batch_id)``
    receives the committed (id, n_members) emission.

    Exactly-once across all three without a transaction, by induction
    on the two-store argument: each store's ``batch_id`` replay
    returns its COMMITTED emission, and the glue between any two
    commits (gate filter, semi-joins, ``render``) is deterministic
    given the upstream emission — so after a crash between ANY pair of
    commits, the replay reproduces the exact inputs every
    already-committed store saw (its absorb no-ops into a re-read) and
    the first not-yet-committed store absorbs as if first time. The
    three watermarks form a monotone front that one replay converges.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        scores = lm_store.absorb(
            batch_df, id_col, text_col, batch_id=batch_id
        )
        keep = scores.where(
            F.col("sum_p_x1e9") >= F.lit(keep_x1e9) * F.col("n_bigrams")
        ).select(id_col)
        kept = batch_df.join(keep, id_col, "left_semi")
        text_surv = fp_store.absorb(
            kept, id_col, text_col, batch_id=batch_id
        )
        surv_docs = batch_df.join(
            text_surv.select(id_col), id_col, "left_semi"
        )
        media = render(surv_docs)
        final = media_store.absorb(
            media, id_col, "payload", batch_id=batch_id
        )
        emit(final, batch_id)

    return _fn


def modern_curation_foreach_batch(
    dsir_store,
    esub_store,
    window_words: int,
    keep_x1e9: int,
    min_stops: int,
    id_col: str,
    text_col: str,
    target_col: str,
    emit,
):
    """The MODERN published pipeline (Gopher rules -> DSIR importance
    -> exact substring dedup) as one exactly-once ``foreachBatch`` —
    the store-backed streaming form of
    ``queries_extensions.q_pipeline_modern_curation``, and the first
    chain mixing BOTH store merge disciplines: the DSIR model store is
    an ADDITIVE-merge member (counts summed across increment files),
    the window-fingerprint store a UNION-merge snapshot member. The
    module docstring's convergence argument only needs each store's
    idempotent ``batch_id`` replay plus deterministic glue, so the mix
    composes unchanged.

    Per micro-batch: (1) Gopher-gate the batch (stateless projection —
    no store); (2) score the gate survivors under the DSIR models-so-
    far and absorb their counts (raw = all gate survivors, target =
    ``target_col`` rows); (3) keep documents whose mean term ratio
    clears ``keep_x1e9``/1e9 (exact integer compare; documents with
    fewer than two tokens have no score and fail, as in the batch
    pipeline); (4) window the selected documents at stride 1, absorb
    the fresh windows (first-day-wins at window grain), and rebuild
    the per-document removal + reassembly FROM THE COMMITTED window
    emission, so a sink-crash replay emits byte-identical survivors.
    ``emit(survivors_df, batch_id)`` receives (id, n_words, n_kept,
    new_n_chars, new_text_md5) for every SELECTED batch document.
    """
    from ..operators.text import (
        _remove_covered_and_reassemble,
        gopher_quality_rules,
        substring_windows,
    )

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        g = gopher_quality_rules(
            batch_df, id_col, text_col, min_stops=min_stops
        ).where(F.col("keep") == 1).select(id_col)
        kept1 = batch_df.join(g, id_col, "left_semi")
        scores = dsir_store.absorb(
            kept1, id_col, text_col, target_col, batch_id=int(batch_id)
        )
        sel = scores.where(
            F.col("sum_ratio_x1e9") >= F.lit(keep_x1e9) * F.col("n_terms")
        ).select(id_col)
        kept2 = batch_df.join(sel, id_col, "left_semi")
        wins = substring_windows(kept2, id_col, text_col, window_words)
        kept_w = esub_store.absorb(
            wins.select("_pk", "_win"), "_pk", "_win",
            batch_id=int(batch_id),
        ).select("_pk")
        dup_occ = wins.join(kept_w, "_pk", "left_anti").select(
            F.col(id_col), "_start"
        )
        out = _remove_covered_and_reassemble(
            kept2, dup_occ, id_col, text_col, window_words
        )
        emit(out, int(batch_id))

    return _fn


def monitored_curation_foreach_batch(
    lm_store,
    fp_store,
    hist_store,
    keep_x1e9: int,
    id_col: str,
    text_col: str,
    key_col: str,
    emit,
):
    """Curation WITH LIVE QUALITY MONITORING — three stores spanning
    all three batch-state disciplines in one exactly-once
    ``foreachBatch``: the ADDITIVE LM model, the UNION-merge
    fingerprint set, and the ADDITIVE
    :class:`~..operators.hist_store.HistogramStore` watching the
    SURVIVORS' length distribution. Per micro-batch: score under the
    LM model-so-far and absorb; gate on mean bigram probability
    (exact integer compare); dedup the kept documents against the
    fingerprint store and absorb; absorb the survivors' (key, length)
    rows into the histogram store, whose committed emission IS the
    alert signal — per key, the exact L1 drift of this batch's
    survivor lengths against every previous batch's (the
    "did today's kept data change shape?" pager line; -1 on a key's
    first day). ``emit(survivors_df, drift_df, batch_id)`` receives
    both committed emissions.

    Exactly-once by the module docstring's induction: the drift store
    is one more idempotent ``batch_id`` absorber, and the glue that
    feeds it (semi-join of the batch to the committed fingerprint
    survivors + a length projection) is deterministic given the
    upstream emissions — a crash between the fingerprint and
    histogram commits replays into a fingerprint re-read and a
    first-time histogram absorb; a crash after all three replays into
    three re-reads.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        scores = lm_store.absorb(
            batch_df, id_col, text_col, batch_id=batch_id
        )
        keep = scores.where(
            F.col("sum_p_x1e9") >= F.lit(keep_x1e9) * F.col("n_bigrams")
        ).select(id_col)
        kept = batch_df.join(keep, id_col, "left_semi")
        survivors = fp_store.absorb(
            kept, id_col, text_col, batch_id=batch_id
        )
        surv_docs = batch_df.join(
            survivors.select(id_col), id_col, "left_semi"
        )
        drift = hist_store.absorb(
            surv_docs.select(
                F.col(key_col), F.length(text_col).alias("_len")
            ),
            key_col,
            "_len",
            batch_id=batch_id,
        )
        emit(survivors, drift, batch_id)

    return _fn


def sketch_audited_curation_foreach_batch(
    lm_store,
    fp_store,
    kmv_store,
    hll_store,
    cms_store,
    keep_x1e9: int,
    id_col: str,
    text_col: str,
    key_col: str,
    emit,
    qsk_store=None,
):
    """Curation audited by the FULL sketch family — six stores
    spanning EVERY merge discipline in the snapshot-store algebra in
    one exactly-once ``foreachBatch``: the ADDITIVE LM model gates,
    the UNION-merge fingerprint set dedups, and the survivors feed
    four monitoring sketches at once — KEEP-MIN
    (:class:`~..operators.sketch_store.KmvSketchStore`) and MAX
    (:class:`~..operators.hll_store.HllSketchStore`) both tracking
    per-key distinct vocabulary (two independent estimators of the
    same quantity: their disagreement is itself an alert signal), the
    ADDITIVE Count-Min counters
    (:class:`~..operators.cms_store.CmsStore`) tracking token
    frequencies for heavy-hitter drift, and (r11, optional for
    back-compat) the rank-quantile member
    (:class:`~..operators.qsketch_store.QuantileSketchStore`)
    tracking the per-key distribution of survivor document LENGTHS —
    "did today's accepted docs suddenly get short?", the length-drift
    alert curation pipelines watch beside vocabulary drift.

    ``emit(survivors_df, kmv_df, hll_df, cms_df, batch_id)`` receives
    the committed emissions; with ``qsk_store`` the quantile emission
    rides fifth: ``emit(surv, kmv, hll, cms, qsk, batch_id)``.

    Exactly-once by the module docstring's induction, now at length
    SIX: each sketch store is one more idempotent ``batch_id``
    absorber, and the glue that feeds all four (semi-join of the
    batch to the committed fingerprint survivors + one token explode
    + one token-count projection) is deterministic given the upstream
    emissions — a crash between ANY two commits replays the
    already-committed stores as re-reads and the rest as first-time
    absorbs (crash-tested at every one of the six boundaries).
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        scores = lm_store.absorb(
            batch_df, id_col, text_col, batch_id=batch_id
        )
        keep = scores.where(
            F.col("sum_p_x1e9") >= F.lit(keep_x1e9) * F.col("n_bigrams")
        ).select(id_col)
        kept = batch_df.join(keep, id_col, "left_semi")
        survivors = fp_store.absorb(
            kept, id_col, text_col, batch_id=batch_id
        )
        surv_docs = batch_df.join(
            survivors.select(id_col), id_col, "left_semi"
        )
        toks = surv_docs.select(
            F.col(key_col),
            F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
        ).where(F.col("_tok") != "")
        kmv = kmv_store.absorb(toks, key_col, "_tok", batch_id=batch_id)
        hll = hll_store.absorb(toks, key_col, "_tok", batch_id=batch_id)
        cms = cms_store.absorb(toks, "_tok", batch_id=batch_id)
        if qsk_store is None:
            emit(survivors, kmv, hll, cms, batch_id)
            return
        # survivor doc length in tokens, clamped to the sketch's
        # v >= 1 domain (an all-whitespace survivor counts as 1)
        lens = surv_docs.select(
            F.col(key_col),
            F.greatest(
                F.lit(1),
                F.size(
                    F.filter(
                        F.split(F.col(text_col), " "),
                        lambda t: t != "",
                    )
                ),
            ).cast("long").alias("_len"),
        )
        qsk = qsk_store.absorb(lens, key_col, "_len", batch_id=batch_id)
        emit(survivors, kmv, hll, cms, qsk, batch_id)

    return _fn
