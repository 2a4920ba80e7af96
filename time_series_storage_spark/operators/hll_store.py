"""Persisted INCREMENTAL HyperLogLog sketch — the store-family member
with MAX-merge semantics.

The snapshot stores merge by UNION (fingerprints, bands, image
hashes), by ADDITION (LM / DSIR / Stupid-Backoff count models,
histograms), by LATEST-WINS (the cluster map), or by KEEP-MIN (the
KMV sketch). HLL completes the algebra with element-wise MAX: each
absorb appends the increment's own register table (``(gk, r, rho)``
— at most m = 256 rows per key, the sketch property), and the read
path takes ``max(rho)`` per (key, register) across everything
appended.

The merge is EXACT by the same argument as keep-min: a register's
value over the union corpus is the max rho over all its elements,
max is associative/commutative over any slicing, so max-of-slice-
registers equals the one-shot register — property-tested, and the
driver gate's oracle recomputes the sketch from scratch over the full
corpus and must hash-match the two-absorb store read. Max adds one
property no other discipline has: IDEMPOTENCE. Re-absorbing the very
same data changes nothing by ALGEBRA (max(a, a) = a), not by replay
bookkeeping — pinned in pytest as the merge-level complement to the
``batch_id`` exactly-once contract (which still matters: it keeps
emission rows stable and the appended state O(increment)).

Emission contract (exactly-once under ``batch_id``): absorb emits the
POST-merge estimates for the keys the increment touched — history
registers filtered to touched keys via a broadcast semi-join, merged
with the increment's registers, estimated in the exact integer
arithmetic of :mod:`.hll` — and a replayed batch re-reads its
committed emission without re-appending state.

Maintenance: :meth:`prune` rewrites the register table to the current
per-(key, register) max — dominated rows can never influence any
future max, so state returns to <= m rows per key FOREVER
(prune-then-absorb == absorb, property-tested), the same semantic
floor the KMV store's prune provides.

Scale shape: absorb cost is O(increment) — register building is one
partial-aggregated exchange bounded at m rows per key per partition,
the commit appends one file per table and hard-links history. Reads
shuffle <= m rows x absorbs-since-prune per key; estimates ride out
as one row per key. Nothing is keyed on corpus size — the fixed-size
property that makes HLL the production default at 100 TB.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3); see :mod:`.hll` for the published-estimator provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .hll import hll_aggregate, hll_registers

_REG_SCHEMA = "gk string, r int, rho int"


class HllSketchStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_regs", "harm_num", "v_zero", "est_distinct")

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["hll-v1:p=8"], "HllSketchStore")

    # keys are group labels (source, lang, ...), naturally strings
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _remax(self, candidates: DataFrame) -> DataFrame:
        """The max merge: one partial-aggregated exchange over rows
        already bounded at m per key per absorb."""
        return candidates.groupBy("gk", "r").agg(F.max("rho").alias("rho"))

    # -- pure reads ----------------------------------------------------

    def registers(self) -> DataFrame:
        """Current merged register table: (gk, r, rho)."""
        return self._remax(self._table("reg", _REG_SCHEMA))

    def estimates(self, key_name: str = "gk") -> DataFrame:
        """One row per key ever absorbed: (key, n_regs, harm_num,
        v_zero, est_distinct) — identical arithmetic to the in-plan
        :func:`~.hll.hll_aggregate`."""
        out = hll_aggregate(self.registers(), ["gk"])
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
        re-appends registers (harmless to estimates — max is
        idempotent — but it would defeat the O(increment) state bound
        prune() exists to keep)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, key_col)
            if replay is not None:
                return replay
            inc = hll_registers(
                elements.select(
                    F.col(key_col).cast("string").alias("gk"),
                    F.col(elem_col).alias("_e"),
                ),
                ["gk"],
                "_e",
            )
            touched = inc.select("gk").distinct()
            hist = self._table("reg", _REG_SCHEMA).join(
                F.broadcast(touched), "gk", "semi"
            )
            merged = self._remax(hist.unionByName(inc))
            emit = hll_aggregate(merged, ["gk"]).select(
                F.col("gk").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta, [("surv", emit), ("reg", inc)], key_col, batch_id
            )

    # -- maintenance -------------------------------------------------------

    def prune(self) -> int:
        """Semantic compaction: rewrite the register table to the
        current per-(key, register) max (dominated rows can never
        change a future max — prune-then-absorb == absorb). State
        returns to <= m rows per key no matter how many absorbs
        accumulated. Same quiesced-maintenance contract as compact().
        Returns the new snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("reg", self.registers().select("gk", "r", "rho"))]
        )

    # -- time travel ---------------------------------------------------------

    def registers_as_of(self, version: str) -> DataFrame:
        """Point-in-time register table: the merged sketch exactly as
        it stood when ``version`` was committed (later absorbs and
        prunes invisible) — the lakehouse time-travel read the
        hard-linked snapshot protocol gives for free. Versions come
        from :meth:`snapshot_versions`; a vacuumed version raises
        loudly."""
        return self._remax(self.as_of_table(version, "reg", _REG_SCHEMA))

    def estimates_as_of(
        self, version: str, key_name: str = "gk"
    ) -> DataFrame:
        """Point-in-time estimates — "what did we believe each key's
        cardinality was as of that commit", the audit question a
        monitoring pipeline asks when an estimate moved."""
        out = hll_aggregate(self.registers_as_of(version), ["gk"])
        return out.withColumnRenamed("gk", key_name)

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
