"""Persisted INCREMENTAL per-label embedding centroids — the fourth
ADDITIVE-merge member of the store family (LM counts, DSIR buckets,
histograms, now prototype sums).

State is the raw per-(label, dimension) component SUM and COUNT of
x1e6-quantized embeddings — pure aggregates, so the incremental merge
is ADDITION (one appended file per absorb, history hard-linked,
O(increment) I/O) and the merged state equals the one-shot aggregation
of the concatenated corpus. Centroids are derived AT READ —
``floor(sum / n)`` per component — so no rounding ever enters the
persisted state and merge-exactness is unconditional (the driver
gate's oracle recomputes the sums from scratch over both absorbed
slices).

What the store is FOR is prototype maintenance and drift: a labeled
embedding corpus ingested daily keeps per-class prototypes for
nearest-centroid serving (:func:`~.similarity.centroid_confusion`) and
wants to know how much each class prototype MOVED under today's data.
``drift`` reports, per label the increment touches, the fixed-point
cosine between the CURRENT centroid and the centroid the merged state
would have after absorbing the probe — ``cos_shift_x1e6`` near 1e6
means the prototype is stable, lower means the class is drifting;
labels with no history emit -1 (no baseline — the store-family
convention). ``absorb`` emits exactly that drift against the
PRE-update state (online evaluation), then commits the increment's
sums; exactly-once under ``batch_id``.

Scale shape: state is L x d longs per absorb (``fold()`` compacts back
to one row per (label, dim)); the drift probe touches history for the
increment's labels only; nothing is keyed on corpus size.

Reference scope: the reference engine has no vector surface (SURVEY.md
section 2.3) — this is the labeled-corpus maintenance twin of the
IVF/codebook machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore

_SUM_SCHEMA = "lb long, d long, s long, n long"


class CentroidStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_hist", "n_inc", "cos_shift_x1e6")

    def __init__(self, spark, path: str, dim: int = 64):
        if not 2 <= dim <= 4096:
            raise ValueError(f"dim must be in [2, 4096], got {dim}")
        self.dim = int(dim)
        super().__init__(
            spark, path, [f"centroid-v1:d={dim}"], "CentroidStore"
        )

    def _sums(self, rows: DataFrame, label_col: str, vec_col: str):
        """(lb, d, s, n) component sums of one slice, x1e6-quantized."""
        return (
            rows.select(
                F.col(label_col).cast("long").alias("lb"),
                F.posexplode(
                    F.transform(
                        F.col(vec_col).cast("array<double>"),
                        lambda x: F.round(x * F.lit(1e6)).cast("long"),
                    )
                ).alias("d", "_v"),
            )
            .groupBy("lb", "d")
            .agg(
                F.sum("_v").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    # -- pure reads ----------------------------------------------------

    def sums(self) -> DataFrame:
        """Merged (lb, d, s, n) — the additive sum across absorbs."""
        return (
            self._table("sum", _SUM_SCHEMA)
            .groupBy("lb", "d")
            .agg(
                F.sum("s").cast("long").alias("s"),
                F.sum("n").cast("long").alias("n"),
            )
        )

    def centroids(self, label_col: str = "label") -> DataFrame:
        """(label, centroid array<long>, n_members) — components are
        floor(sum/n), derived at read so the state stays exact."""
        comp = self.sums().withColumn("_c", F.expr("s div n"))
        return (
            comp.groupBy("lb")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "_c"))),
                    lambda st: st["_c"],
                ).alias("centroid"),
                F.max("n").cast("long").alias("n_members"),
            )
            .select(F.col("lb").alias(label_col), "centroid", "n_members")
        )

    def drift(
        self, rows: DataFrame, label_col: str, vec_col: str
    ) -> DataFrame:
        """Prototype shift of ``rows`` against the CURRENT store, one
        row per touched label: (lb, n_hist, n_inc, cos_shift_x1e6) —
        the fixed-point cosine between the pre-update centroid and the
        post-merge centroid (x1e6; 1e6 = unmoved, -1 = new label).

        The cosine accumulates via unordered groupBy sums of doubles —
        safe HERE (unlike the ordered folds :func:`~.similarity.dot`
        needs) because every term is a product of two integer centroid
        components bounded well below 2^26, so each partial sum is an
        integer-valued double under 2^53: double addition of such
        values is exact, hence associative, hence order-independent in
        any engine."""
        inc = self._sums(rows, label_col, vec_col)
        keys = inc.select("lb").distinct()
        hist = self.sums().join(F.broadcast(keys), "lb", "semi").select(
            "lb", "d", F.col("s").alias("hs"), F.col("n").alias("hn")
        )
        j = inc.select(
            "lb", "d", F.col("s").alias("is_"), F.col("n").alias("in_")
        ).join(hist, ["lb", "d"], "left").select(
            "lb",
            "d",
            F.coalesce("hs", F.lit(0)).alias("hs"),
            F.coalesce("hn", F.lit(0)).alias("hn"),
            "is_",
            "in_",
        )
        comp = j.select(
            "lb",
            "d",
            F.expr("case when hn > 0 then hs div hn else 0 end").alias(
                "_pre"
            ),
            F.expr("(hs + is_) div (hn + in_)").alias("_post"),
            "hn",
            "in_",
        )
        agg = comp.groupBy("lb").agg(
            F.max("hn").cast("long").alias("n_hist"),
            F.max("in_").cast("long").alias("n_inc"),
            F.sum(
                F.col("_pre").cast("double") * F.col("_post").cast("double")
            ).alias("_dot"),
            F.sum(
                F.col("_pre").cast("double") * F.col("_pre").cast("double")
            ).alias("_na"),
            F.sum(
                F.col("_post").cast("double")
                * F.col("_post").cast("double")
            ).alias("_nb"),
        )
        return agg.select(
            "lb",
            "n_hist",
            "n_inc",
            F.when(
                F.col("n_hist") > 0,
                F.round(
                    F.col("_dot")
                    / (F.sqrt("_na") * F.sqrt("_nb"))
                    * 1e6
                ).cast("long"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("cos_shift_x1e6"),
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        rows: DataFrame,
        label_col: str,
        vec_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Emit the increment's prototype shift against the PRE-update
        store, then commit the increment's component sums. Exactly-once
        under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, label_col)
            if replay is not None:
                return replay
            shift = self.drift(rows, label_col, vec_col)
            emit = shift.select(
                F.col("lb").alias("id"), *self._EMIT_COLS
            )
            inc = self._sums(rows, label_col, vec_col)
            return self._commit_increment(
                meta, [("surv", emit), ("sum", inc)], label_col, batch_id
            )

    # -- maintenance -----------------------------------------------------

    def fold(self) -> int:
        """Semantic compaction: rewrite the sums table to one row per
        (label, dim). fold-then-absorb == absorb (addition folds)."""
        return self._rewrite_snapshot(
            lambda: [("sum", self.sums().select("lb", "d", "s", "n"))]
        )

    # -- streaming twin ---------------------------------------------------

    def foreach_batch(self, label_col: str, vec_col: str, emit):
        """Exactly-once ``foreachBatch``: each micro-batch is
        drift-scored against the prototypes-so-far and absorbed under
        its batch id."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, label_col, vec_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
