"""Persisted INCREMENTAL per-key histogram + distribution-drift probe
— the third ADDITIVE-merge member of the store family (after
:class:`~.lm_store.LmModelStore` and
:class:`~.dsir_store.DsirModelStore`, whose docstrings derive the
pattern).

The monitored quantity is a bounded equi-width histogram per group key:
``bucket = min(value // bucket_width, n_buckets - 1)``, counts per
(key, bucket). Histograms are pure aggregates, so the incremental merge
is ADDITION — each absorb appends ONE file of increment counts,
hard-links history beside it (O(increment) I/O), and the read path sums
across files; the summed table equals the histogram of the concatenated
corpus (associativity/commutativity, property-tested, and the driver
gate's oracle recomputes the merged histogram from scratch).

What the store is FOR is the drift probe: the question a 100-TB
ingest asks every day is "does today's slice still look like the
corpus?" — per key, the L1 distance between today's bucket SHARES and
the persisted history's bucket shares, in exact integer fixed point::

    share(c, n)  = (c * 1_000_000) div n          -- floor, n > 0
    l1_x1e6(key) = sum_b |share(o_b, N_o) - share(h_b, N_h)|

(2x the total-variation distance of the bucketed distributions, up to
the flooring). All counts are nonnegative longs and every division is
integer floor, so the statistic is bit-identical in any engine — no
chi-square float, no log. Keys with NO history emit -1 (no baseline:
distinguishable from "perfectly matching" = 0, the
``doc_novelty_incremental`` convention).

Emission contract (exactly-once under ``batch_id`` like every family
member): ``absorb`` emits the increment's drift against the PRE-update
histogram — "what did the corpus-so-far think of today's slice?", the
online-evaluation convention of the LM/DSIR stores — then commits the
increment's counts; a replayed batch re-reads its committed emission
and never re-adds counts (the additive store's double-emission bug).

Scale shape: state is <= n_buckets rows per key per absorb (compact()
folds them), reads shuffle only that bounded table, the drift join
touches history for the increment's keys ONLY (semi-join probe), and
the increment histogram is one partial-aggregated exchange over the
slice. Nothing is keyed on corpus size.

Reference scope: the reference engine has no histogram persistence (its
histogram fact type is a stub — SURVEY.md section 2.4); this is the
data-quality-monitoring twin the training-pipeline stores need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _SnapshotArtifactStore

_HIST_SCHEMA = "gk string, b long, c long"


class HistogramStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_hist", "n_inc", "l1_x1e6")

    def __init__(
        self,
        spark,
        path: str,
        bucket_width: int = 256,
        n_buckets: int = 32,
    ):
        if bucket_width < 1 or not 2 <= n_buckets <= 4096:
            raise ValueError(
                f"bucket_width >= 1 and n_buckets in [2, 4096] required,"
                f" got {bucket_width}, {n_buckets}"
            )
        self.bucket_width = int(bucket_width)
        self.n_buckets = int(n_buckets)
        super().__init__(
            spark,
            path,
            [f"hist-v1:w={bucket_width}:nb={n_buckets}"],
            "HistogramStore",
        )

    # keys are group labels (source, lang, ...) — string emission ids
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _bucketize(self, rows: DataFrame, key_col: str, val_col: str):
        """(gk, b, c) histogram of one slice. The clamp is top-side
        only: the monitored quantity is a nonnegative measure (length,
        count, size) by contract; a negative value would land in a
        negative bucket id — visible, deterministic, and mirrored by
        the oracle, not silently folded into bucket 0."""
        b = F.least(
            F.expr(
                f"CAST({val_col} AS BIGINT) div {self.bucket_width}"
            ),
            F.lit(self.n_buckets - 1),
        ).cast("long")
        return (
            rows.select(
                F.col(key_col).cast("string").alias("gk"), b.alias("b")
            )
            .groupBy("gk", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    # -- pure reads ----------------------------------------------------

    def histogram(self, key_name: str = "gk") -> DataFrame:
        """Merged per-key histogram: (key, b, c) — the additive sum
        across every absorbed file."""
        out = (
            self._table("hist", _HIST_SCHEMA)
            .groupBy("gk", "b")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        return out.withColumnRenamed("gk", key_name)

    def drift(
        self, rows: DataFrame, key_col: str, val_col: str
    ) -> DataFrame:
        """Drift of ``rows`` against the CURRENT persisted histogram,
        one row per key the increment touches: (key, n_hist, n_inc,
        l1_x1e6). History is probed for the increment's keys only."""
        inc = self._bucketize(rows, key_col, val_col)
        keys = inc.select("gk").distinct()
        hist = self.histogram().join(F.broadcast(keys), "gk", "semi")
        j = (
            hist.select("gk", "b", F.col("c").alias("ch"))
            .join(
                inc.select("gk", "b", F.col("c").alias("co")),
                ["gk", "b"],
                "full_outer",
            )
            .select(
                "gk",
                "b",
                F.coalesce("ch", F.lit(0)).alias("ch"),
                F.coalesce("co", F.lit(0)).alias("co"),
            )
        )
        w = Window.partitionBy("gk")
        t = j.select(
            "gk",
            "ch",
            "co",
            F.sum("ch").over(w).alias("nh"),
            F.sum("co").over(w).alias("no"),
        )
        share_h = F.coalesce(
            F.expr("(ch * 1000000) div nullif(nh, 0)"), F.lit(0)
        )
        share_o = F.coalesce(
            F.expr("(co * 1000000) div nullif(no, 0)"), F.lit(0)
        )
        per_key = t.select(
            "gk",
            "nh",
            "no",
            F.abs(share_o - share_h).alias("_d"),
        ).groupBy("gk").agg(
            F.max("nh").cast("long").alias("n_hist"),
            F.max("no").cast("long").alias("n_inc"),
            F.sum("_d").cast("long").alias("_l1"),
        )
        return per_key.select(
            "gk",
            "n_hist",
            "n_inc",
            F.when(F.col("n_hist") > 0, F.col("_l1"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("l1_x1e6"),
        )

    # -- absorb (drift under the old histogram, then add the counts) ----

    def absorb(
        self,
        rows: DataFrame,
        key_col: str,
        val_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Online-evaluation absorb: emit the increment's drift against
        the PRE-update histogram, then commit the increment's counts as
        one appended file (history hard-linked beside it). Exactly-once
        under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, key_col)
            if replay is not None:
                return replay
            scores = self.drift(rows, key_col, val_col)
            emit = scores.select(
                F.col("gk").alias("id"), *self._EMIT_COLS
            )
            inc = self._bucketize(rows, key_col, val_col)
            return self._commit_increment(
                meta, [("surv", emit), ("hist", inc)], key_col, batch_id
            )

    # -- maintenance -----------------------------------------------------

    def fold(self) -> int:
        """Semantic compaction: rewrite the counts table to the summed
        per-(key, bucket) rows — state returns to <= n_buckets rows per
        key no matter how many absorbs accumulated (addition has no
        dominated rows to drop, only equal-key rows to fold; fold-then-
        absorb == absorb, property-tested). Same quiesced-maintenance
        contract as compact(). Returns the new snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("hist", self.histogram().select("gk", "b", "c"))]
        )

    # -- streaming twin ---------------------------------------------------

    def foreach_batch(self, key_col: str, val_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        rows are drift-scored against the histogram-so-far and absorbed
        under its batch id; ``emit(drift_df, batch_id)`` receives the
        committed emission."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, key_col, val_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
