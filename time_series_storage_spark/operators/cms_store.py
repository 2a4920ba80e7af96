"""Persisted INCREMENTAL Count-Min sketch — an ADDITIVE-merge store
(the discipline of the LM / DSIR / histogram members) holding the
``d x w`` frequency counters of :mod:`.cms`.

Counter tables are pure sums, so the incremental merge is ADDITION:
each absorb appends ONE file of the increment's own counters (at most
``d * w`` rows — the sketch property), hard-links history beside it
(O(increment) I/O), and the read path sums across files. Addition is
associative and commutative, so the summed sketch equals the sketch
built on the concatenated corpus EXACTLY — not approximately —
property-tested, and the driver gate's oracle recomputes the sketch
from scratch over the full corpus and must hash-match the two-absorb
store read, estimates included.

Emission contract (exactly-once under ``batch_id``): absorb emits the
POST-merge frequency estimates for the increment's DISTINCT elements
— "here is each touched token's corpus frequency as of this batch" —
and a replayed batch re-reads its committed emission without re-adding
counts (the additive store's double-emission bug, guarded the same
way as the LM/DSIR members).

Scale shape: absorb cost is O(increment) — counter building is one
partial-aggregated exchange bounded at d*w rows per partition, the
commit appends one file and hard-links history. The merged sketch is
d*w longs however much history was absorbed, so reads BROADCAST it;
probing any candidate set never shuffles. compact() (the generic
snapshot rewrite) re-sums to the semantic floor of d*w rows total.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3); see :mod:`.cms` for the published-sketch provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cms import CMS_D, CMS_W, cms_counters, cms_estimate
from .dedup import _SnapshotArtifactStore

_CNT_SCHEMA = "i int, b int, c long"


class CmsStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("est_cnt",)

    def __init__(self, spark, path: str, d: int = CMS_D, w: int = CMS_W):
        if d < 1 or w < 2:
            raise ValueError(f"need d >= 1 and w >= 2, got d={d} w={w}")
        # depth/width are part of the artifact: counters hashed into a
        # different geometry are not mergeable, so they ride the params
        # pin and a mismatched reopen is refused
        self.d = d
        self.w = w
        super().__init__(spark, path, [f"cms-v1:d={d}:w={w}"], "CmsStore")

    # emission ids are the probed elements — naturally strings
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    # -- pure reads ----------------------------------------------------

    def counters(self) -> DataFrame:
        """Current merged counter table (i, b, c): the additive merge,
        one partial-aggregated exchange over <= d*w rows per absorb."""
        return (
            self._table("cnt", _CNT_SCHEMA)
            .groupBy("i", "b")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    def estimate(self, probes: DataFrame, elem_col: str) -> DataFrame:
        """Point-frequency estimates for a probe frame under the
        CURRENT sketch — broadcast counters, no probe shuffle."""
        return cms_estimate(
            self.counters(), probes, elem_col, self.d, self.w
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        elements: DataFrame,
        elem_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Add one increment of element occurrences into the sketch
        and emit the POST-merge estimates for the increment's distinct
        elements. Exactly-once under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, elem_col)
            if replay is not None:
                return replay
            elems = elements.select(
                F.col(elem_col).cast("string").alias("_e")
            )
            inc = cms_counters(elems, "_e", self.d, self.w)
            merged = (
                self._table("cnt", _CNT_SCHEMA)
                .unionByName(inc)
                .groupBy("i", "b")
                .agg(F.sum("c").cast("long").alias("c"))
            )
            emit = cms_estimate(
                merged, elems.distinct(), "_e", self.d, self.w
            ).select(F.col("_e").alias("id"), *self._EMIT_COLS)
            return self._commit_increment(
                meta, [("surv", emit), ("cnt", inc)], elem_col, batch_id
            )

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, elem_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        element occurrences add under its batch id;
        ``emit(estimates_df, batch_id)`` receives the committed
        post-merge touched-element estimates."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, elem_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
