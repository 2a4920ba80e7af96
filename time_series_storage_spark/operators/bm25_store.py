"""Persisted INCREMENTAL BM25 index statistics — the lexical-search
counterpart to the model stores (LM / DSIR): an ADDITIVE-merge member
holding exactly the corpus statistics the Okapi formula needs.

BM25 scores are a pure function of (per-term document frequency,
corpus document count, corpus token count) plus the candidate
document's own tf/dl — and all three corpus statistics are SUMS, so
the incremental merge is ADDITION: each absorb appends ONE file of
the increment's per-term df rows and one single-row totals file,
hard-links history beside them (O(increment) I/O), and the read path
sums across files. Addition is associative/commutative, so the summed
statistics equal the statistics of the concatenated corpus EXACTLY —
the driver gate's oracle recomputes BM25 from scratch over the full
corpus and must hash-match the ranking served from the two-absorb
store (ranks, scores and hit counts all).

This is how a production search index actually lives: postings/stats
absorb daily increments; queries never re-scan history. Scoring here
follows the exact-integer arithmetic of the batch gate
(queries_extensions.q_search_bm25_topk — k1/b as rationals, per-term
floor quantization, rational IDF with the documented ln divergence).

Emission contract (exactly-once under ``batch_id``): absorb emits the
POST-merge document frequency for each term the increment touched —
"here is each term's corpus df as of this batch" — and a replayed
batch re-reads its committed emission without re-adding counts (the
additive store's double-count bug, guarded like the LM/DSIR/CMS
members).

Scale shape: absorb cost is O(increment) — the df aggregate is one
partial-aggregated exchange on terms, totals one scalar pass. The df
table is vocabulary-sized (never corpus-sized); query-time reads
filter it to the query's terms (a handful of rows) and broadcast.

Reference scope: the reference engine has no text surface (SURVEY.md
section 2.3) — this extends the retrieval family (BM25 batch gate,
dense rankings, RRF/hybrid fusion) to the daily-ingest regime the
other stores serve.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _SnapshotArtifactStore
from .text import tokens

_DF_SCHEMA = "tok string, c long"
_TOT_SCHEMA = "nd long, tl long"


class Bm25StatsStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("df",)

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["bm25-v1"], "Bm25StatsStore")

    # emission ids are terms — naturally strings
    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} string, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    # -- pure reads ----------------------------------------------------

    def df_counts(self) -> DataFrame:
        """Per-term corpus document frequency: the additive merge."""
        return (
            self._table("df", _DF_SCHEMA)
            .groupBy("tok")
            .agg(F.sum("c").cast("long").alias("df"))
        )

    def totals(self) -> DataFrame:
        """One row: (n_docs, total_len) — both summed across absorbs."""
        return self._table("tot", _TOT_SCHEMA).agg(
            F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("_n"),
            F.coalesce(F.sum("tl"), F.lit(0)).cast("long").alias("_tl"),
        )

    def topk(
        self,
        docs: DataFrame,
        query_terms: Sequence[str],
        k: int = 20,
        id_col: str = "doc_id",
        text_col: str = "text",
        k1_x10: int = 12,
        b_x4: int = 3,
    ) -> DataFrame:
        """BM25 ranking of ``docs`` for ``query_terms`` under the
        PERSISTED corpus statistics — the serving read. Identical
        exact-integer arithmetic to the batch gate (per-term floors,
        rational IDF); df rows for the query terms broadcast, the
        candidate docs ride one explode + filter. Output:
        (id, rank, score_x1e6, n_hit_terms)."""
        from .analytics import floor_div

        # materialize ONCE: a one-pass iterable consumed by the guard
        # would otherwise reach isin() empty
        query_terms = list(query_terms)
        if not query_terms:
            # isin() with zero arguments is a TypeError deep inside the
            # plan; surface the contract violation at the API boundary
            # like the other parameter guards (hll_rolling_estimate,
            # mmr_topk)
            raise ValueError("query_terms must be non-empty")
        toks = docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        dl = toks.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("_dl")
        )
        qterms = toks.where(F.col("tok").isin(*query_terms))
        tf = qterms.groupBy(id_col, "tok").agg(
            F.count(F.lit(1)).cast("long").alias("_tf")
        )
        df_ = self.df_counts().where(
            F.col("tok").isin(*query_terms)
        )
        idf = floor_div(
            (2 * F.col("_n") - 2 * F.col("df") + 1) * 1_000_000,
            2 * F.col("df") + 1,
        )
        norm_x1e4 = F.lit(10_000 - b_x4 * 2_500) + floor_div(
            F.lit(b_x4 * 2_500) * F.col("_dl") * F.col("_n"),
            F.col("_tl"),
        )
        sat_x1e6 = floor_div(
            F.col("_tf") * F.lit((k1_x10 + 10) * 10_000_000_000),
            F.col("_tf") * 100_000 + F.lit(k1_x10) * norm_x1e4,
        )
        scored = (
            tf.join(F.broadcast(df_), "tok")
            .join(dl, id_col)
            .crossJoin(F.broadcast(self.totals()))
            .select(
                F.col(id_col),
                floor_div(idf * sat_x1e6, F.lit(1_000_000)).alias("_s"),
            )
            .groupBy(id_col)
            .agg(
                F.sum("_s").cast("long").alias("score_x1e6"),
                F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
            )
        )
        w = Window.orderBy(F.desc("score_x1e6"), F.asc(id_col))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(id_col, "rank", "score_x1e6", "n_hit_terms")
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Add one document increment's statistics and emit the
        POST-merge per-term df for the terms the increment touched.
        Exactly-once under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, "tok")
            if replay is not None:
                return replay
            toks = docs.select(
                F.col(id_col).alias("_id"),
                F.explode(tokens(F.col(text_col))).alias("tok"),
            )
            inc_df = (
                toks.select("_id", "tok")
                .distinct()
                .groupBy("tok")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            inc_tot = docs.select(F.lit(0).alias("_t")).unionByName(
                toks.select(F.lit(1).alias("_t"))
            ).agg(
                F.sum((F.col("_t") == 0).cast("long")).alias("nd"),
                F.sum((F.col("_t") == 1).cast("long")).alias("tl"),
            )
            touched = inc_df.select("tok")
            hist = self._table("df", _DF_SCHEMA).join(
                F.broadcast(touched), "tok", "semi"
            )
            merged = (
                hist.unionByName(inc_df)
                .groupBy("tok")
                .agg(F.sum("c").cast("long").alias("df"))
            )
            emit = merged.select(F.col("tok").alias("id"), "df")
            return self._commit_increment(
                meta,
                [("surv", emit), ("df", inc_df), ("tot", inc_tot)],
                "tok",
                batch_id,
            )

    # -- streaming twin ------------------------------------------------------

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch`` function: each micro-batch's
        documents add their statistics under the batch id;
        ``emit(df_emission, batch_id)`` receives the committed
        post-merge touched-term document frequencies."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(batch_df, id_col, text_col, batch_id=batch_id)
            emit(out, batch_id)

        return _fn
