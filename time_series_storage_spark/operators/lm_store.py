"""Persisted INCREMENTAL bigram language model — the store-family
member with ADDITIVE-merge semantics.

The set-semantics stores (fingerprints, MinHash bands, LSH buckets,
image hashes) absorb by unioning immutable membership rows. A count
model is different: its state is three aggregates — bigram counts,
unigram counts, vocabulary size — and the natural incremental merge is
ADDITION. The snapshot protocol supports that without modification:
each absorb appends ONE file of increment counts per table (hard-links
history beside it, O(increment) I/O), and the READ path sums across
files (``groupBy.sum`` over the snapshot dir). Because addition is
associative and commutative, the summed model equals the model fit on
the concatenated corpus — property-tested — and the base ``compact()``
maintenance (which rewrites rows unchanged into fewer files) preserves
it trivially.

Scoring semantics are the online-evaluation convention: ``absorb``
scores the increment under the PRE-update model (what did yesterday's
model think of today's data?) and then adds today's counts, all under
the shared exactly-once ``batch_id`` replay contract; ``score`` is the
pure read. Unseen words/bigrams take add-one smoothing with count 0 —
the one divergence from the batch :func:`~.text.lm_doc_likelihood`
(which fits on the corpus it scores, so nothing is unseen); the
degenerate empty-model denominator clamps at 1.

Reference scope: the reference engine has no text/model surface at all
(SURVEY.md section 2.3) — this extends the training-data-pipeline
family (CCNet-style LM filtering, Wenzek et al. 2020) to the
daily-ingest regime the other stores serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .text import tokens


class LmModelStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_bigrams", "sum_p_x1e9")

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["lm-bigram-v1"], "LmModelStore")

    @staticmethod
    def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(id, w1, w2) — one row per bigram OCCURRENCE, zero-shuffle
        projection (tokenize + zip-with-next + explode)."""
        toks = docs.select(
            F.col(id_col), tokens(text_col).alias("_t")
        ).where(F.size("_t") >= 2)
        return toks.select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice("_t", 1, F.size("_t") - 1),
                    F.slice("_t", 2, F.size("_t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("_bg"),
        ).select(F.col(id_col), F.col("_bg.w1"), F.col("_bg.w2"))

    # -- model reads (sum across snapshot files: the additive merge) --

    def bigram_counts(self) -> DataFrame:
        return (
            self._table("big", "w1 string, w2 string, c long")
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c12"))
        )

    def unigram_counts(self) -> DataFrame:
        return (
            self._table("uni", "w string, c long")
            .groupBy("w")
            .agg(F.sum("c").cast("long").alias("c1"))
        )

    def vocab_size(self) -> DataFrame:
        """One-row (v) frame — V for the smoothing denominator = count
        of distinct words ever absorbed (derivable from the summed
        unigram table; no third artifact needed)."""
        return self.unigram_counts().agg(
            F.count(F.lit(1)).cast("long").alias("v")
        )

    # -- scoring (pure read) ------------------------------------------

    def score(
        self, docs: DataFrame, id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Score documents under the CURRENT model: per-bigram
        add-one-smoothed probability quantized to 1e9 fixed point
        BEFORE the long summation (same exactness discipline as the
        batch scorer — no float fold crosses an engine boundary).
        Unseen bigrams/words count 0; an empty model's denominator
        clamps at 1. Output: (id, n_bigrams, sum_p_x1e9); documents
        with fewer than two tokens are omitted.

        Scale shape: the model joins are keyed (w1, w2) / (w1) with
        partial-aggregated build sides; V rides as a broadcast scalar.
        """
        bi = self._doc_bigrams(docs, id_col, text_col)
        uni = self.unigram_counts().withColumnRenamed("w", "_uw")
        p = F.round(
            (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
            * 1e9
            / F.greatest(
                F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"), F.lit(1)
            )
        ).cast("long")
        return (
            bi.join(self.bigram_counts(), ["w1", "w2"], "left")
            .join(uni, F.col("w1") == F.col("_uw"), "left")
            .crossJoin(F.broadcast(self.vocab_size()))
            .select(F.col(id_col), p.alias("_p"))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum("_p").cast("long").alias("sum_p_x1e9"),
            )
        )

    # -- absorb (score under the old model, then add the counts) ------

    def absorb(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Online-evaluation absorb: emit the increment's scores under
        the PRE-update model, then commit the increment's bigram and
        unigram counts as one new file per table (history hard-linked
        beside them). Exactly-once under ``batch_id`` replay — a
        replayed batch re-reads its committed emission and never
        re-adds its counts (double-adding counts would corrupt the
        model silently, the additive store's version of the
        double-emission bug)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            scores = self.score(docs, id_col, text_col)
            norm = scores.select(
                F.col(id_col).alias("id"), "n_bigrams", "sum_p_x1e9"
            )
            big = (
                self._doc_bigrams(docs, id_col, text_col)
                .groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            uni = (
                docs.select(F.explode(tokens(text_col)).alias("w"))
                .groupBy("w")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            return self._commit_increment(
                meta, [("surv", norm), ("big", big), ("uni", uni)],
                id_col, batch_id,
            )

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch is
        scored under the model-so-far and absorbed under its batch id;
        ``emit(scored_df, batch_id)`` receives the committed emission."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, id_col, text_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
