"""Persisted INCREMENTAL Stupid-Backoff trigram LM — the fifth
ADDITIVE-merge member of the store family, and the LM the smoothing
was DESIGNED for: Brants et al. (2007) built Stupid Backoff precisely
so a distributed count-table LM needs no normalization pass, which is
also what makes it INCREMENTABLE — the model is nothing but unigram /
bigram / trigram counts, pure aggregates that merge across daily
absorbs by addition (one appended file per table per absorb, history
hard-linked, O(increment) I/O), and the summed tables equal the model
fit on the concatenated corpus. Contrast Kneser-Ney, whose
continuation counts are DISTINCT counts — not additive — and which
therefore stays a batch operator here.

Scoring is the shared :func:`~.text.sb_score_with_counts` arithmetic
(the batch :func:`~.text.stupid_backoff_score`'s joins factored once),
so the persisted model and the batch operator score bit-identically on
identical counts — and the driver gate's oracle refits the counts over
both absorbed slices from scratch, externally hash-checking the
additive-merge claim.

Emission contract (exactly-once under ``batch_id``): ``absorb`` scores
the increment under the PRE-update counts — "what did yesterday's LM
think of today's data?", the online-evaluation convention of the
LM/DSIR/histogram/centroid stores — then commits the increment's
counts; a replayed batch re-reads its committed emission and never
re-adds. ``fold()`` is the additive semantic compaction (state returns
to one row per n-gram).

Scale shape: count tables are word-keyed (vocab-scale, NOT broadcast);
scoring joins them on their natural keys, which AQE co-partitions.
Absorb cost is O(increment n-grams); reads shuffle the summed tables
once. Nothing is keyed on corpus size.

Reference scope: the reference engine has no text surface (SURVEY.md
section 2.3) — this extends the published web-scale LM to the
daily-ingest regime the other stores serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .text import sb_count_tables, sb_score_with_counts


class SbModelStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_trigrams", "sum_s_x1e9")

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["sb-v1"], "SbModelStore")

    # -- model reads (sum across snapshot files: the additive merge) --

    def uni_counts(self) -> DataFrame:
        return (
            self._table("uni", "w string, c1 long")
            .groupBy("w")
            .agg(F.sum("c1").cast("long").alias("c1"))
        )

    def bi_counts(self) -> DataFrame:
        return (
            self._table("bi", "w1 string, w2 string, c2 long")
            .groupBy("w1", "w2")
            .agg(F.sum("c2").cast("long").alias("c2"))
        )

    def tri_counts(self) -> DataFrame:
        return (
            self._table(
                "tri", "w1 string, w2 string, w3 string, c3 long"
            )
            .groupBy("w1", "w2", "w3")
            .agg(F.sum("c3").cast("long").alias("c3"))
        )

    # -- scoring (pure read) ------------------------------------------

    def score(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Score documents under the CURRENT summed counts — the batch
        operator's arithmetic verbatim (shared helper). Documents with
        fewer than three tokens have no trigram and are omitted; an
        empty model scores every position 0 (all joins miss)."""
        uni = self.uni_counts()
        n_total = uni.agg(
            F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("n")
        )
        return sb_score_with_counts(
            docs, id_col, text_col,
            uni, self.bi_counts(), self.tri_counts(), n_total,
        )

    # -- absorb (score under the old counts, then add) -----------------

    def absorb(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Online-evaluation absorb: emit the increment's scores under
        the PRE-update counts, then commit the increment's three count
        tables as one appended file each. Exactly-once under
        ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            scores = self.score(docs, id_col, text_col)
            emit = scores.select(
                F.col(id_col).alias("id"), *self._EMIT_COLS
            )
            uni, bi, tri = sb_count_tables(
                docs.select(F.col(id_col), F.col(text_col)), text_col
            )
            return self._commit_increment(
                meta,
                [("surv", emit), ("uni", uni), ("bi", bi), ("tri", tri)],
                id_col,
                batch_id,
            )

    # -- maintenance -----------------------------------------------------

    def fold(self) -> int:
        """Semantic compaction: rewrite each count table to one row per
        n-gram (addition folds; fold-then-absorb == absorb). Returns
        the new snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [
                ("uni", self.uni_counts().select("w", "c1")),
                ("bi", self.bi_counts().select("w1", "w2", "c2")),
                ("tri", self.tri_counts().select("w1", "w2", "w3", "c3")),
            ]
        )

    # -- streaming twin ---------------------------------------------------

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch``: each micro-batch is scored
        under the counts-so-far and absorbed under its batch id."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, id_col, text_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
