"""Persisted INCREMENTAL KMV distinct-count sketch — the store-family
member with KEEP-MIN merge semantics.

The snapshot stores so far merge by set UNION (fingerprints, bands,
image hashes: immutable membership rows), by ADDITION (LM / DSIR count
models: ``groupBy.sum`` at read), or LATEST-WINS (the cluster map).
A distinct-count sketch introduces the fourth natural discipline:
KEEP-MIN. Each absorb appends the increment's own per-key k-minima
(``kmv_minima`` — <= k longs per key, the sketch property), and the
read path re-runs the selection over everything appended: union the
candidate minima, drop duplicates, keep the k smallest per key.

That merge is EXACT, not approximate-on-approximate: if a hash h is
among the k smallest distinct hashes of the union corpus, then fewer
than k distinct hashes anywhere are below it — in particular fewer
than k within h's own increment — so h survived its increment's local
selection and is present in the store. Union-of-slice-minima therefore
CONTAINS the union corpus's true k-minima, and the read-time
reselection recovers them bit-for-bit (property-tested; the driver
gate's oracle recomputes the sketch from scratch over the full corpus
and must hash-match the two-absorb store read).

Emission contract (exactly-once under ``batch_id`` like every family
member): absorb emits the POST-merge estimate rows for the keys the
increment touched — "here is each affected group's distinct estimate
as of this batch" — computed from history minima (filtered to touched
keys, a semi-join probe) + the increment's minima before the commit,
and re-read from the committed files afterward, so a replayed batch
returns the identical rows without re-appending state.

Maintenance: the generic ``compact()`` (rewrite rows unchanged into
fewer files) applies, but keep-min has a stronger option the additive
stores lack: :meth:`prune` rewrites the minima table to exactly the
current per-key k-minima — the persisted state shrinks back to its
semantic floor (k rows per key FOREVER, however many absorbs happen),
because dominated candidates can never re-enter any future selection.
Prune-then-absorb equals absorb-without-prune (property-tested).

Scale shape: absorb cost is O(increment) — the two-phase local
selection bounds every sort by partition size, the commit appends one
file per table and hard-links history. Reads shuffle <= k rows x
absorbs-since-prune per key (k rows per key after prune); estimates
ride out as one row per key. Nothing anywhere is keyed on corpus size.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3 — its one distinct-ish read is exact COUNT upserts); this
extends the training-data-pipeline family (per-source unique-content
accounting at 100 TB, where exact COUNT(DISTINCT) shuffles billions of
values per group) to the daily-ingest regime the other stores serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _SnapshotArtifactStore
from .sketch import DEFAULT_K, kmv_aggregate, kmv_minima

_MIN_SCHEMA = "gk string, h long"


class KmvSketchStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_mins", "kth_min", "est_distinct")

    def __init__(self, spark, path: str, k: int = DEFAULT_K):
        if not 2 < k <= 255:
            raise ValueError(f"k must be in (2, 255], got {k}")
        super().__init__(spark, path, [f"kmv-v1:k={k}"], "KmvSketchStore")
        self.k = k

    # keys are group labels (source, lang, ...), naturally strings —
    # the long-id emission schema of the dedup stores does not fit
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _reselect(self, candidates: DataFrame) -> DataFrame:
        """The keep-min merge: k smallest distinct hashes per key over
        whatever candidate rows exist. One exchange on the key; the
        input is already sketch-sized (<= k rows per key per absorb),
        so no two-phase bound is needed here — the per-key row count
        is capped by construction, not by data."""
        w = Window.partitionBy("gk").orderBy("h")
        return (
            candidates.dropDuplicates(["gk", "h"])
            .withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= self.k)
            .drop("_rank")
        )

    # -- pure reads ----------------------------------------------------

    def minima(self) -> DataFrame:
        """Current per-key k-minima: (gk, h) — the merged sketch."""
        return self._reselect(self._table("min", _MIN_SCHEMA))

    def estimates(self, key_name: str = "gk") -> DataFrame:
        """One row per key ever absorbed: (key, n_mins, kth_min,
        est_distinct) — exact below k distinct, the integer KMV
        estimator above it, identical arithmetic to the in-plan
        :func:`~.sketch.kmv_estimate`."""
        out = kmv_aggregate(self.minima(), ["gk"], self.k)
        return out.withColumnRenamed("gk", key_name)

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        elements: DataFrame,
        key_col: str,
        elem_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Merge one increment of (key, element) rows into the sketch
        and emit the POST-merge estimates for the touched keys.
        Exactly-once under ``batch_id`` replay — re-absorbing a
        committed batch re-reads its committed emission and never
        re-appends minima (appending twice is harmless to the
        estimates — reselection ignores duplicates — but would defeat
        the O(increment) state bound prune() exists to keep)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, key_col)
            if replay is not None:
                return replay
            inc = kmv_minima(
                elements.select(
                    F.col(key_col).cast("string").alias("gk"),
                    F.col(elem_col).alias("_e"),
                ),
                ["gk"],
                "_e",
                self.k,
            ).select("gk", "h")
            touched = inc.select("gk").distinct()
            hist = self._table("min", _MIN_SCHEMA).join(
                F.broadcast(touched), "gk", "semi"
            )
            merged = self._reselect(hist.unionByName(inc))
            emit = kmv_aggregate(merged, ["gk"], self.k).select(
                F.col("gk").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta, [("surv", emit), ("min", inc)], key_col, batch_id
            )

    # -- maintenance -------------------------------------------------------

    def prune(self) -> int:
        """Semantic compaction: rewrite the minima table to exactly the
        current per-key k-minima (dominated candidates can never
        re-enter a future selection, so dropping them changes nothing —
        prune-then-absorb == absorb). State returns to k rows per key
        no matter how many absorbs accumulated. Same quiesced-
        maintenance contract as compact(): the batch watermark
        survives, the pruned batch's emission files do not. Returns
        the new snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("min", self.minima().select("gk", "h"))]
        )

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, key_col: str, elem_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        (key, element) rows merge under its batch id;
        ``emit(estimates_df, batch_id)`` receives the committed
        post-merge estimates for the touched keys."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, key_col, elem_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
