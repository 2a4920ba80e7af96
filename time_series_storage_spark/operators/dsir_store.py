"""Persisted INCREMENTAL DSIR model — the second ADDITIVE-merge member
of the store family (the first is :class:`~.lm_store.LmModelStore`,
whose module docstring derives the pattern).

DSIR (Xie et al. 2023) scores documents by how much their hashed
n-gram features look drawn from a TARGET distribution rather than the
RAW corpus. Both models are bucket-count tables — pure aggregates —
so the incremental merge is ADDITION: each absorb appends ONE file of
increment counts per table (raw buckets; target buckets), hard-links
history beside it (O(increment) I/O), and the read path sums across
files. Addition is associative and commutative, so the summed model
equals the model fit on the concatenated corpus — property-tested —
and both scalar totals (corpus term count, target term count) derive
from the summed tables, so no extra artifact rides the commit.

Scoring semantics are the online-evaluation convention shared with the
LM store: ``absorb`` scores the increment under the PRE-update model
(what did yesterday's models think of today's data?) and then adds
today's counts, all under the exactly-once ``batch_id`` replay
contract; ``score`` is the pure read. Buckets never seen take count 0
under the same add-one smoothing as the batch scorer; an empty model
scores every term at exactly ratio 1.0 (1e9 fixed point) — the
uninformative prior, since the smoothing denominators carry the bucket
count.

Reference scope: the reference engine has no text/model surface
(SURVEY.md section 2.3) — this extends the importance-resampling
curation step to the daily-ingest regime the other stores serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .text import DSIR_BUCKETS, dsir_term_buckets


class DsirModelStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_terms", "sum_ratio_x1e9")

    def __init__(self, spark, path: str, buckets: int = DSIR_BUCKETS):
        # the bucket count is part of the artifact: counts hashed into
        # a different bucket space are not mergeable, so it rides the
        # params pin and a mismatched reopen is refused
        self.buckets = buckets
        super().__init__(
            spark, path, ["dsir-v1", buckets], "DsirModelStore"
        )

    # -- model reads (sum across snapshot files: the additive merge) --

    def raw_counts(self) -> DataFrame:
        return (
            self._table("raw", "b long, c long")
            .groupBy("b")
            .agg(F.sum("c").cast("long").alias("cr"))
        )

    def target_counts(self) -> DataFrame:
        return (
            self._table("tgt", "b long, c long")
            .groupBy("b")
            .agg(F.sum("c").cast("long").alias("ct"))
        )

    def totals(self) -> DataFrame:
        """One-row (nr, nt) frame — both smoothing totals derived from
        the summed tables (no third artifact)."""
        nr = self.raw_counts().agg(
            F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("nr")
        )
        nt = self.target_counts().agg(
            F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("nt")
        )
        return nr.crossJoin(nt)

    # -- scoring (pure read) ------------------------------------------

    def score(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Score documents under the CURRENT models: per term,
        ``round(1e9 * (ct+1)(nr+B) / ((cr+1)(nt+B)))`` — the batch
        :func:`~.text.dsir_importance` formula with stored counts and
        count-0 smoothing for never-seen buckets; quantized per term
        BEFORE the long summation (no float fold crosses an engine
        boundary). Output: (id, n_terms, sum_ratio_x1e9); documents
        with fewer than two tokens are omitted.

        Scale shape: both model joins are broadcast (<= ``buckets``
        rows however much history was absorbed); the totals ride as
        one broadcast row."""
        terms = dsir_term_buckets(
            docs.select(F.col(id_col), F.col(text_col)).withColumn(
                "_t", F.lit(False)
            ),
            id_col, text_col, "_t", self.buckets,
        )
        t_x1e9 = F.round(
            (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
            * (F.col("nr") + self.buckets)
            * 1e9
            / (
                (F.coalesce(F.col("cr"), F.lit(0)) + 1)
                * (F.col("nt") + self.buckets)
            )
        ).cast("long")
        raw = self.raw_counts().withColumnRenamed("b", "_b")
        tgt = self.target_counts().withColumnRenamed("b", "_b")
        return (
            terms.join(F.broadcast(raw), "_b", "left")
            .join(F.broadcast(tgt), "_b", "left")
            .crossJoin(F.broadcast(self.totals()))
            .select(F.col(id_col), t_x1e9.alias("_r"))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_terms"),
                F.sum("_r").cast("long").alias("sum_ratio_x1e9"),
            )
        )

    # -- absorb (score under the old model, then add the counts) ------

    def absorb(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        target_col: str = "_is_target",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Online-evaluation absorb: emit the increment's scores under
        the PRE-update models, then commit the increment's raw and
        target bucket counts as one new file per table (history
        hard-linked beside them). Exactly-once under ``batch_id``
        replay — a replayed batch re-reads its committed emission and
        never re-adds counts (the additive store's double-emission
        bug)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            scores = self.score(docs, id_col, text_col)
            norm = scores.select(
                F.col(id_col).alias("id"), "n_terms", "sum_ratio_x1e9"
            )
            terms = dsir_term_buckets(
                docs, id_col, text_col, target_col, self.buckets
            )
            raw = terms.groupBy(F.col("_b").alias("b")).agg(
                F.count(F.lit(1)).cast("long").alias("c")
            )
            tgt = (
                terms.where(F.col("_t"))
                .groupBy(F.col("_b").alias("b"))
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            return self._commit_increment(
                meta, [("surv", norm), ("raw", raw), ("tgt", tgt)],
                id_col, batch_id,
            )

    def foreach_batch(self, id_col: str, text_col: str, target_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch is
        scored under the models-so-far and absorbed under its batch
        id; ``emit(scored_df, batch_id)`` receives the committed
        emission."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(
                batch_df, id_col, text_col, target_col, batch_id=batch_id
            )
            emit(out, batch_id)

        return _fn
