"""Persisted INCREMENTAL Bloom filter — the store-family member with
BITWISE-OR merge semantics.

Decontamination (dropping training documents that overlap an eval
suite — dedup.py:bloom_contamination) is an inherently INCREMENTAL
problem in production: benchmarks are added one release at a time,
and rebuilding the probe artifact from every suite ever registered on
each addition is exactly the rescan the store family exists to kill.
A Bloom filter absorbs increments by BITWISE OR: each absorb appends
the increment's packed words (wi, bits) — <= m_bits/63 + 1 rows no
matter how large the suite — and the read path ORs across appended
rows (``groupBy(wi).agg(bit_or)``). OR is associative, commutative
and idempotent, so the merged bitmap equals the bitmap built from the
concatenated benchmark in one shot (property-tested; the driver gate's
oracle builds that one-shot bitmap from scratch in SQL and must
hash-match a probe through the two-absorb store).

Idempotence is the discipline's distinguishing property: replaying an
increment's words cannot corrupt the artifact (unlike the additive
stores, where double-adding counts is the failure mode) — the
``batch_id`` replay contract here protects the EMISSION exactly-once
guarantee and the O(increment) state bound, not the bitmap's truth.

Emission contract: absorb emits one row per benchmark document added —
(id, n_shingles) — the registration receipt, re-read from committed
files on replay like every family member.

Maintenance: :meth:`prune` rewrites the words table to the OR-merged
form (one row per distinct wi, <= 16K rows forever) — like the KMV
store's keep-min prune, the state has a semantic floor the generic
file-count compact() can't reach; prune-then-absorb == absorb.

Scale shape: the persisted state is ~130 KiB per absorb before prune
and ~130 KiB TOTAL after — always broadcastable; probes are two
broadcast hash joins + a codegen bit test per shingle, the corpus side
never shuffles on anything benchmark-sized. False positives only
over-flag (no false negatives), the property decontamination needs.

Reference scope: the reference engine has no text/benchmark surface
(SURVEY.md section 2.3) — this extends the published decontamination
practice (GPT-3 appendix C / PaLM-style n-gram overlap) to the
suite-by-suite registration regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import (
    BLOOM_M_BITS,
    _SnapshotArtifactStore,
    bloom_build,
    bloom_probe,
    hashed_shingles,
)

_BLM_SCHEMA = "wi long, bits long"


class BloomFilterStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_shingles",)

    def __init__(
        self, spark, path: str, k: int = 8, m_bits: int = BLOOM_M_BITS
    ):
        if k < 1 or m_bits < 63:
            raise ValueError(f"bad bloom params k={k}, m_bits={m_bits}")
        super().__init__(
            spark, path, [f"bloom-v1:m={m_bits},k={k}"], "BloomFilterStore"
        )
        self.k = k
        self.m_bits = m_bits

    # -- pure reads ----------------------------------------------------

    def words(self) -> DataFrame:
        """The OR-merge: current packed bitmap, one row per distinct
        word index touched by any absorbed suite."""
        return (
            self._table("blm", _BLM_SCHEMA)
            .groupBy("wi")
            .agg(F.bit_or("bits").alias("bits"))
        )

    def probe(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold_x1000: int = 500,
    ) -> DataFrame:
        """Contamination probe of ``docs`` against every benchmark ever
        absorbed: (id, n_shingles, n_hit, contam_x1000,
        is_contaminated) — dedup.py:bloom_probe against the merged
        words, identical plan and semantics to the batch operator."""
        return bloom_probe(
            docs,
            self.words(),
            id_col,
            text_col,
            k=self.k,
            m_bits=self.m_bits,
            threshold_x1000=threshold_x1000,
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        benchmark: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Register one benchmark increment: append its packed bloom
        words and emit the per-document registration receipt
        (id, n_shingles). Exactly-once under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            sh = hashed_shingles(benchmark, id_col, text_col, self.k)
            inc_words = bloom_build(sh, self.m_bits)
            receipt = sh.groupBy(id_col).agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles")
            ).select(F.col(id_col).alias("id"), "n_shingles")
            return self._commit_increment(
                meta, [("surv", receipt), ("blm", inc_words)],
                id_col, batch_id,
            )

    # -- maintenance -------------------------------------------------------

    def prune(self) -> int:
        """Semantic compaction: rewrite the words table to the
        OR-merged bitmap — <= m_bits/63 + 1 rows forever, however many
        suites were absorbed (OR idempotence makes this invisible to
        every future read and absorb; property-tested). Same quiesced
        contract as compact(): the batch watermark survives, the
        pruned batch's emission files do not. Returns the new
        snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("blm", self.words().select("wi", "bits"))]
        )

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch of
        benchmark documents registers under its batch id;
        ``emit(receipt_df, batch_id)`` receives the committed
        registration receipt."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, id_col, text_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
