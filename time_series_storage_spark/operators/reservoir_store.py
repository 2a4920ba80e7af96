"""Persisted INCREMENTAL fixed-k uniform reservoir sample — a
KEEP-MIN store-family member whose state is the SAMPLE itself.

The sketch-store family (HLL max-merge, KMV keep-min, CMS/histogram/
LM additive, cluster latest-wins, fingerprint/band union) summarizes;
this member RETAINS ROWS: per key, a uniform-without-replacement
sample of at most ``k`` population rows, maintained across absorbs.
It is the classic reservoir of Vitter (1985, Algorithm R) DERANDOMIZED
the way every sampler in this repo is (operators/split.py): each row's
"random" tag is the portable 60-bit md5 of its salted id, and the
reservoir is the bottom-k rows by (tag, id) per key. Bottom-k by a
fixed per-row hash IS a uniform reservoir — any k-subset of distinct
ids is equally likely under the hash-as-random model — and, unlike
Algorithm R's RNG state, it is a pure function of the row SET:

* MERGEABLE, exactly: if a row is among the union's bottom-k, fewer
  than k rows anywhere rank below it — in particular within its own
  increment — so it survived its increment's local selection and is
  present in the appended state. Union-of-slice-reservoirs therefore
  contains the union's true reservoir, and read-time reselection
  recovers it bit-for-bit (the KMV exactness argument, row-valued).
  The driver gate's oracle recomputes the sample from scratch over
  the full corpus in SQL and must hash-match the two-absorb read.
* IDEMPOTENT: re-offering the same rows changes nothing by algebra
  (``dropDuplicates`` on (key, id) before the reselection), the
  max-merge property the HLL member pinned — here it additionally
  makes the store safe under at-least-once upstream delivery.
* Weighted variant: :class:`WeightedReservoirStore` below — the
  replication reduction (min-of-w-copy-hashes rank) rather than
  A-ES's hash^(1/w), because the integer rank is the one an SQL
  oracle can replay bit-for-bit.

Emission contract (exactly-once under ``batch_id``): absorb emits one
row per key the increment touched — (key, n_sample, kth_rank,
sum_val): the post-merge reservoir size, its selection threshold (the
largest retained tag — the quantity that lets a reader reject
"would this row have been sampled?" without the store), and the
sample's payload sum (sum_val / n_sample is the sample-mean estimate
the reservoir exists to serve). A replayed batch re-reads its
committed emission without re-appending state.

Maintenance: :meth:`prune` rewrites the sample table to the current
per-key reservoir — dominated rows can never re-enter any future
selection (ranks never reshuffle; the stratified_sample monotonicity
argument), so state returns to <= k rows per key FOREVER.

Scale shape: absorb cost is O(increment) — the local selection is the
exact two-phase top-k of operators/split.py (per-partition bound
first, so a hot key never funnels one task), the commit appends one
file per table and hard-links history. Reads shuffle <= k rows x
absorbs-since-prune per key; emissions ride out one row per key.
Nothing is keyed on corpus size — at 100 TB the reservoir answers
"show me 64 uniformly-chosen documents per source, kept current
against daily ingest" without ever rescanning history.

Reference scope: the reference engine has no sampling surface
(SURVEY.md section 2.3); this is the missing sampler shape of the
store family (r10 verdict item 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _SnapshotArtifactStore, md5_long

DEFAULT_K = 64

_RES_SCHEMA = "gk string, rk long, id string, val long"


class ReservoirStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_sample", "kth_rank", "sum_val")

    def __init__(
        self, spark, path: str, k: int = DEFAULT_K, salt: str = "v1"
    ):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.salt = str(salt)
        super().__init__(
            spark, path, [f"res-v1:k={self.k}:salt={self.salt}"],
            "ReservoirStore",
        )

    # keys are group labels (source, lang, ...), naturally strings
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _dedup(self, candidates: DataFrame) -> DataFrame:
        """Collapse (gk, id) duplicates. For the uniform store every
        duplicate row is IDENTICAL (rank and payload are pure
        functions of the id), so dropDuplicates is deterministic;
        subclasses whose rows can differ across absorbs override this
        with an explicit deterministic pick."""
        return candidates.dropDuplicates(["gk", "id"])

    def _reselect(self, candidates: DataFrame) -> DataFrame:
        """The keep-min merge: bottom-k rows per key by (tag, id) over
        whatever candidate rows exist. Input is already sketch-sized
        (<= k rows per key per absorb), so the window is bounded by
        construction; (gk, id) duplicates collapse first so replayed
        or re-offered rows cannot occupy two slots."""
        w = Window.partitionBy("gk").orderBy("rk", "id")
        return (
            self._dedup(candidates)
            .withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= self.k)
            .drop("_rank")
        )

    def _tagged(
        self, rows: DataFrame, key_col: str, id_col: str, val_col: str
    ) -> DataFrame:
        return rows.select(
            F.col(key_col).cast("string").alias("gk"),
            md5_long(
                F.concat(
                    F.lit(f"{self.salt}:"),
                    F.col(id_col).cast("string"),
                )
            ).alias("rk"),
            F.col(id_col).cast("string").alias("id"),
            F.col(val_col).cast("long").alias("val"),
        )

    @staticmethod
    def _summarize(sample: DataFrame) -> DataFrame:
        # kth_rank is max(rk) over the CURRENT sample. It is a valid
        # "would this row have been sampled?" rejection threshold ONLY
        # when n_sample == k (reservoir full): while the reservoir is
        # unfull, ANY new row is admitted regardless of rank, so
        # readers must gate threshold use on n_sample — compare
        # candidate_rank < kth_rank only where n_sample == k, admit
        # unconditionally otherwise. Emitting max(rk) (not NULL) for
        # unfull keys is deliberate: it keeps the column a pure
        # function of the sample rows (merge = one-shot under the
        # hash gate) and still answers "largest rank currently held".
        return sample.groupBy("gk").agg(
            F.count(F.lit(1)).cast("long").alias("n_sample"),
            F.max("rk").cast("long").alias("kth_rank"),
            F.sum("val").cast("long").alias("sum_val"),
        )

    # -- pure reads ----------------------------------------------------

    def sample(self) -> DataFrame:
        """Current merged reservoir: (gk, rk, id, val), <= k rows per
        key — the rows themselves, ready to join back to the corpus
        for full records."""
        return self._reselect(self._table("res", _RES_SCHEMA))

    def summaries(self, key_name: str = "gk") -> DataFrame:
        """One row per key ever absorbed: (key, n_sample, kth_rank,
        sum_val) — the same arithmetic the absorb emission uses.
        kth_rank is a selection threshold only when n_sample == k;
        see :meth:`_summarize` for the unfull-reservoir contract."""
        return self._summarize(self.sample()).withColumnRenamed(
            "gk", key_name
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        rows: DataFrame,
        key_col: str,
        id_col: str,
        val_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Offer one increment of (key, id, payload) rows to the
        reservoir and emit the POST-merge summaries for the touched
        keys. Exactly-once under ``batch_id`` replay — a replayed
        batch re-reads its committed emission and never re-appends
        rows (harmless to the sample — reselection dedups — but it
        would defeat the O(increment) state bound prune() keeps)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, key_col)
            if replay is not None:
                return replay
            # local selection: the increment's OWN bottom-k per key,
            # two-phase so a hot key sorts per-partition first.
            # (gk, id) dedup comes FIRST: duplicate rows inside one
            # increment (at-least-once upstream delivery) would
            # otherwise occupy multiple local top-k slots and starve
            # true members out of the appended state — the one place
            # the read-time dedup in _reselect cannot repair
            tagged = self._tagged(rows, key_col, id_col, val_col)
            tagged = tagged.dropDuplicates(["gk", "id"])
            wp = Window.partitionBy(F.spark_partition_id(), "gk").orderBy(
                "rk", "id"
            )
            local = (
                tagged.withColumn("_pr", F.row_number().over(wp))
                .where(F.col("_pr") <= self.k)
                .drop("_pr")
            )
            inc = self._reselect(local)
            touched = inc.select("gk").distinct()
            hist = self._table("res", _RES_SCHEMA).join(
                F.broadcast(touched), "gk", "semi"
            )
            merged = self._reselect(hist.unionByName(inc))
            emit = self._summarize(merged).select(
                F.col("gk").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta, [("surv", emit), ("res", inc)], key_col, batch_id
            )

    # -- maintenance -------------------------------------------------------

    def prune(self) -> int:
        """Semantic compaction: rewrite the sample table to the
        current per-key reservoir (dominated rows can never re-enter —
        ranks are fixed per id, so prune-then-absorb == absorb).
        State returns to <= k rows per key no matter how many absorbs
        accumulated. Returns the new snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("res", self.sample().select("gk", "rk", "id", "val"))]
        )

    # -- time travel ---------------------------------------------------------

    def sample_as_of(self, version: str) -> DataFrame:
        """Point-in-time reservoir: the sample exactly as it stood
        when ``version`` committed (later absorbs invisible) — the
        hard-linked snapshot protocol's free as-of read."""
        return self._reselect(self.as_of_table(version, "res", _RES_SCHEMA))

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, key_col: str, id_col: str, val_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        rows are offered under its batch id; ``emit(summaries_df,
        batch_id)`` receives the committed post-merge summaries for
        the touched keys."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(
                batch_df, key_col, id_col, val_col, batch_id=batch_id
            )
            emit(out, batch_id)

        return _fn


class WeightedReservoirStore(ReservoirStore):
    """Persisted INCREMENTAL *weighted* reservoir — the keep-min
    member completing the sampler pair (uniform above, weighted
    here): per key, a fixed-k sample whose inclusion odds scale with
    each item's integer weight, by the replication reduction of
    operators/split.weighted_reservoir (w salted copies, effective
    rank = MIN copy hash, bottom-k by (rank, id)). The rank is a pure
    function of (id, weight), so every property the uniform store
    proves carries over verbatim: exact keep-min merge under any
    slicing, algebraic idempotence, prune to the <= k floor,
    hard-linked time travel, exactly-once batch replay.

    Contract: WEIGHT IS AN ATTRIBUTE OF THE ID (like content for the
    fingerprint stores). Re-offering an id with a different weight is
    a caller contract breach; the store's dedup keeps the smallest
    (rank, weight) row ever committed for the id (an explicit
    deterministic pick — see :meth:`_dedup` — because unlike the
    uniform store, duplicate (key, id) rows here can carry DIFFERENT
    ranks, and an arbitrary dropDuplicates would flap between them
    across runs), and the stored ``val`` column carries the weight
    the surviving rank was computed from.

    The stored ``val`` is the item's weight; summaries() therefore
    emits ``sum_val`` = the sample's total weight — the denominator a
    weighted estimator reports beside its sample.

    Scale shape: the only cost over the uniform store is the
    generator explode of O(weight) copies per increment row (no
    shuffle — it collapses back to one row per (key, id) in the same
    stage's partial aggregate), bounded by ``max_weight`` which rides
    the params pin and is enforced IN-PLAN with a loud raise_error.
    """

    FORMAT = 1

    def __init__(
        self,
        spark,
        path: str,
        k: int = DEFAULT_K,
        max_weight: int = 64,
        salt: str = "v1",
    ):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if max_weight < 1:
            raise ValueError(
                f"max_weight must be >= 1, got {max_weight}"
            )
        self.k = int(k)
        self.max_weight = int(max_weight)
        self.salt = str(salt)
        _SnapshotArtifactStore.__init__(
            self,
            spark,
            path,
            [f"wres-v1:k={self.k}:mw={self.max_weight}:salt={self.salt}"],
            "WeightedReservoirStore",
        )

    def _dedup(self, candidates: DataFrame) -> DataFrame:
        """Deterministic duplicate pick: the smallest (rk, val) row
        per (gk, id). Duplicate rows can only arise from a weight
        that changed across absorbs (a contract breach the store must
        still stay deterministic under); min-rank is also monotone —
        a row once in the reservoir can only be displaced by GLOBAL
        competition, never by its own re-offer."""
        w0 = Window.partitionBy("gk", "id").orderBy("rk", "val")
        return (
            candidates.withColumn("_dr", F.row_number().over(w0))
            .where(F.col("_dr") == 1)
            .drop("_dr")
        )

    def _tagged(
        self, rows: DataFrame, key_col: str, id_col: str, w_col: str
    ) -> DataFrame:
        # the guard and the copy-rank formula are the SHARED helpers
        # of operators/split.py — one definition for the batch sampler
        # and this store, so salt format / bound semantics cannot
        # drift between the twins
        from .split import checked_weight, copy_rank

        checked = checked_weight(
            w_col, self.max_weight, "WeightedReservoirStore"
        )
        copies = rows.select(
            F.col(key_col).cast("string").alias("gk"),
            F.col(id_col).cast("string").alias("id"),
            checked.alias("_w"),
            F.explode(F.sequence(F.lit(1), checked)).alias("_j"),
        )
        return copies.select(
            "gk",
            "id",
            "_w",
            copy_rank("id", "_j", self.salt).alias("_r"),
        ).groupBy("gk", "id").agg(
            F.min("_r").alias("rk"),
            F.max("_w").cast("long").alias("val"),
        ).select("gk", "rk", "id", "val")
