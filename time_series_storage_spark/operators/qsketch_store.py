"""Persisted INCREMENTAL rank-quantile sketch — the ADDITIVE-merge
store member serving mergeable percentiles (p50/p95/p99).

State is the log2 sub-bucketed histogram of :mod:`.qsketch` (the
HdrHistogram/DDSketch family — see that module's docstring for why
the family's rank-quantile member is this deterministic sketch and
not KLL/t-digest, whose randomized merge-order-dependent state cannot
satisfy the store family's merge-equals-one-shot hash discipline).
Bucket counts are pure sums, so the incremental merge is ADDITION
exactly like the CMS / LM / DSIR / histogram members: each absorb
appends ONE file of the increment's own (key, bucket, count) rows —
at most ~1600 buckets per key at sub_bits = 5, the sketch property —
hard-links history beside it (O(increment) I/O), and the read path
sums across files. Addition is associative and commutative, so the
summed sketch equals the sketch built on the concatenated corpus
EXACTLY; the driver gate's oracle recomputes it from scratch over the
full corpus and must hash-match the two-absorb store read, served
percentiles included.

This is the store production metrics engines lean on hardest: per
(service, day) latency percentiles maintained against daily ingest,
re-aggregable to weekly/monthly by summing bucket counts — never by
re-reading raw events, and never by averaging percentiles (the
classic wrong answer this store exists to prevent).

Emission contract (exactly-once under ``batch_id``): absorb emits the
POST-merge (n_total, p50_lb, p95_lb, p99_lb) for the keys the
increment touched, and a replayed batch re-reads its committed
emission without re-adding counts (the additive store's double-count
hazard, guarded like the CMS/LM/DSIR members).

Maintenance: :meth:`prune` rewrites the bucket table to the current
per-(key, bucket) sums — state returns to <= ~1600 rows per key
FOREVER (prune-then-absorb == absorb: addition is associative).

Scale shape: absorb cost is O(increment) — bucketing is one
partial-aggregated exchange bounded at sketch size per key per
partition; reads shuffle <= sketch-size x absorbs-since-prune per
key; percentiles ride out one row per key. Nothing is keyed on
corpus size.

Reference scope: the reference's only quantile surface is its
unimplemented histogram stub (SURVEY.md section 2.4); this completes
the sketch-store family's rank-quantile gap (r10 verdict, missing #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .qsketch import QSK_QS, QSK_SUB_BITS, qsk_counters, qsk_quantiles

_QB_SCHEMA = "gk string, b int, c long"


class QuantileSketchStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_total", "p50_lb", "p95_lb", "p99_lb")

    def __init__(self, spark, path: str, sub_bits: int = QSK_SUB_BITS):
        if not 1 <= sub_bits <= 10:
            raise ValueError(f"sub_bits must be in [1, 10], got {sub_bits}")
        # geometry is part of the artifact: counts bucketed at a
        # different resolution are not mergeable, so sub_bits rides
        # the params pin and a mismatched reopen is refused
        self.sub_bits = int(sub_bits)
        super().__init__(
            spark, path, [f"qsk-v1:s={self.sub_bits}"],
            "QuantileSketchStore",
        )

    # keys are group labels (service, source, day, ...) — strings
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _resum(self, candidates: DataFrame) -> DataFrame:
        """The additive merge: one partial-aggregated exchange over
        rows already bounded at sketch size per key per absorb."""
        return candidates.groupBy("gk", "b").agg(
            F.sum("c").cast("long").alias("c")
        )

    def _percentiles(self, counters: DataFrame) -> DataFrame:
        return qsk_quantiles(
            counters, ["gk"], qs=QSK_QS, sub_bits=self.sub_bits
        )

    # -- pure reads ----------------------------------------------------

    def counters(self) -> DataFrame:
        """Current merged sketch state: (gk, b, c)."""
        return self._resum(self._table("qb", _QB_SCHEMA))

    def quantiles(self, key_name: str = "gk") -> DataFrame:
        """One row per key ever absorbed: (key, n_total, p50_lb,
        p95_lb, p99_lb) — identical arithmetic to the in-plan
        :func:`~.qsketch.qsk_quantiles`."""
        out = self._percentiles(self.counters())
        return out.withColumnRenamed("gk", key_name)

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        elements: DataFrame,
        key_col: str,
        value_col: str,
        batch_id: int | None = None,
        weight_col: str | None = None,
    ) -> DataFrame:
        """Add one increment of (key, integer value >= 1) observations
        and emit the POST-merge percentiles for the touched keys.
        Exactly-once under ``batch_id`` replay. ``weight_col`` makes
        the increment WEIGHTED (bucket counts sum integer weights —
        qsk_counters' weighted form); weighted and unweighted absorbs
        compose freely since both append plain non-negative counts."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, key_col)
            if replay is not None:
                return replay
            # loud in-plan boundary guard (the maxmatch/bm25 guard
            # discipline, enforced where it matters most — persisted
            # state): a value < 1 has NO bucket under the sketch
            # contract, and Spark's conv() and DuckDB's printf('%b')
            # render negatives differently, so letting one through
            # would poison the store with state the oracle can never
            # reproduce. The UPPER bound is the documented exactness
            # ceiling (qsk_bucket's floor(v / 2^sh) rides IEEE
            # doubles, exact only below 2^53): an epoch-nanos long
            # above it would bucket differently here than in the
            # DuckDB oracle's exact integer division — the same
            # irreproducible-state poisoning, from the other side.
            # raise_error fails the absorb job with the offending
            # value instead of committing it.
            v = F.col(value_col).cast("long")
            checked = F.when((v >= 1) & (v < F.lit(1 << 53)), v).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "QuantileSketchStore: values must be in "
                            "[1, 2^53) (scale to fixed-point first), "
                            "got "
                        ),
                        F.coalesce(v.cast("string"), F.lit("NULL")),
                    )
                )
            )
            cols = [
                F.col(key_col).cast("string").alias("gk"),
                checked.alias("_v"),
            ]
            if weight_col is not None:
                # the value guard's twin: a negative weight would
                # commit a NEGATIVE bucket count into additive state
                # (irreparable — cumulative walks regress forever) and
                # a NULL one would silently drop its row from the sum;
                # zero-weight rows are legal no-ops and are filtered
                # below rather than persisted as c=0 state
                wv = F.col(weight_col).cast("long")
                wchecked = F.when(wv >= 0, wv).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "QuantileSketchStore: weights must be "
                                ">= 0 and non-null, got "
                            ),
                            F.coalesce(
                                wv.cast("string"), F.lit("NULL")
                            ),
                        )
                    )
                )
                cols.append(wchecked.alias("_w"))
            rows = elements.select(*cols)
            if weight_col is not None:
                # _w is guaranteed non-null >= 0 by the guard above
                # (NULL takes the otherwise/raise_error branch: NULL
                # >= 0 is NULL, not true); drop the legal zero-weight
                # no-ops so they never persist as c=0 state rows
                rows = rows.where(F.col("_w") > 0)
            inc = qsk_counters(
                rows,
                ["gk"],
                "_v",
                self.sub_bits,
                weight_col="_w" if weight_col is not None else None,
            )
            touched = inc.select("gk").distinct()
            hist = self._table("qb", _QB_SCHEMA).join(
                F.broadcast(touched), "gk", "semi"
            )
            merged = self._resum(hist.unionByName(inc))
            emit = self._percentiles(merged).select(
                F.col("gk").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta, [("surv", emit), ("qb", inc)], key_col, batch_id
            )

    # -- maintenance -------------------------------------------------------

    def prune(self) -> int:
        """Semantic compaction: rewrite the bucket table to the
        current per-(key, bucket) sums (addition is associative, so
        prune-then-absorb == absorb). State returns to sketch size per
        key no matter how many absorbs accumulated. Returns the new
        snapshot's file count."""
        return self._rewrite_snapshot(
            lambda: [("qb", self.counters().select("gk", "b", "c"))]
        )

    # -- time travel ---------------------------------------------------------

    def counters_as_of(self, version: str) -> DataFrame:
        """Point-in-time sketch state (later absorbs and prunes
        invisible) — the hard-linked snapshot protocol's free as-of
        read; a vacuumed version raises loudly."""
        return self._resum(self.as_of_table(version, "qb", _QB_SCHEMA))

    def quantiles_as_of(
        self, version: str, key_name: str = "gk"
    ) -> DataFrame:
        """Point-in-time percentiles — "what did we believe p99 was as
        of that commit", the audit read an SLO postmortem asks for."""
        out = self._percentiles(self.counters_as_of(version))
        return out.withColumnRenamed("gk", key_name)

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, key_col: str, value_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        observations add under its batch id; ``emit(quantiles_df,
        batch_id)`` receives the committed post-merge percentiles for
        the touched keys."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, key_col, value_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
