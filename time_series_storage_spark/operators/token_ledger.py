"""Persisted per-document TOKEN LEDGER under a FROZEN tokenizer — the
bookkeeping artifact every token-budgeted pipeline actually maintains.

Token-budget allocation (operators/split.py:token_budget_mix) needs a
``(doc_id, source, n_tokens)`` table. Computing it from raw text means
refitting the tokenizer and re-segmenting the whole corpus per query —
fine once, wrong as the daily serving read. Production pipelines do
the opposite: the tokenizer is FIT ONCE and frozen (retraining it
re-prices every historical document and silently shifts every
downstream budget), and each ingest batch is PRICED under that frozen
model and appended to a ledger. This store is that contract on the
repo's versioned-snapshot protocol (:class:`~.dedup._SnapshotArtifactStore`):

* ``fit_base(docs)`` — the one-time model build: Viterbi-EM unigram
  fit (operators/unigram.py, exact-integer log2 costs, so the frozen
  MODEL itself is hash-gateable) on the base corpus, base documents
  priced under it, ``model`` + ``led`` tables committed together.
* ``absorb(docs)`` — the daily read: segment ONLY the increment's
  distinct words against the stored cost table (one broadcast-sized
  collect of the model, one shuffle-free Viterbi projection, one
  broadcast join onto the increment — O(increment) compute and I/O,
  hard-linked history), append the priced rows. Exactly-once under
  the shared ``batch_id`` replay contract.
* ``ledger()`` — the union read the budget mixer consumes; cost is a
  scan of one small parquet table however the budgets are then used
  (quota sweeps, re-mixes, audits — none of them touch raw text).

Words longer than the model's ``max_word`` are excluded from pricing
in both engines (the :func:`~.unigram.unigram_viterbi` contract);
surface the count with :func:`~.unigram.unigram_excluded` before
trusting ledger sums — an excluded word deflates every budget built
on the ledger.

Reference scope: the reference engine has no text/tokenizer surface
(SURVEY.md section 2.3); this extends the training-data-pipeline
store family (FingerprintStore, LmModelStore, Bm25StatsStore) with
the token-accounting artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore

_MODEL_SCHEMA = "piece string, c long, cost long"
_LED_SCHEMA = "doc_id long, source string, n_tokens long"


class TokenLedgerStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("n_tokens",)

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["tok-ledger-v1"], "TokenLedgerStore")

    # -- pure reads ----------------------------------------------------

    def model(self) -> DataFrame:
        """The frozen unigram model (piece, c, cost) — written once by
        :meth:`fit_base`, immutable across absorbs."""
        return self._table("model", _MODEL_SCHEMA)

    def ledger(self) -> DataFrame:
        """(doc_id, source, n_tokens) — the additive union across
        absorbs; the frame :func:`~.split.token_budget_mix` consumes."""
        return self._table("led", _LED_SCHEMA)

    # -- shared pricing projection --------------------------------------

    @staticmethod
    def _price(
        docs: DataFrame,
        costs: DataFrame,
        id_col: str,
        source_col: str,
        text_col: str,
    ) -> DataFrame:
        """(doc_id, source, n_tokens) of ``docs`` under ``costs`` —
        Viterbi once per DISTINCT word of the slice, documents
        broadcast-join the segmented word table (the
        unigram_doc_tokens discipline: cost is slice words + one
        broadcast join, never slice x DP)."""
        from .bpe import words_with_counts
        from .unigram import unigram_viterbi

        wc = words_with_counts(docs, text_col)
        segs = unigram_viterbi(wc, costs).select("w", "n_pieces")
        words = docs.select(
            F.col(id_col),
            F.col(source_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w"),
        ).where(F.col("w") != "")
        return (
            words.join(F.broadcast(segs), "w")
            .groupBy(id_col, source_col)
            .agg(F.sum("n_pieces").cast("long").alias("n_tokens"))
            .select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.col(source_col).alias("source"),
                "n_tokens",
            )
        )

    # -- writes ----------------------------------------------------------

    def fit_base(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        source_col: str = "source",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """One-time model build + base pricing. Refusing to refit an
        already-fit store is deliberate: silently re-training would
        re-price history out from under every budget already served
        (drop the store to retrain — the loud path)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, "doc_id")
            if replay is not None:
                return replay
            if meta is not None:
                raise ValueError(
                    f"TokenLedgerStore at {self.path} is already fit; "
                    "absorb() increments against the frozen model, or "
                    "drop() to retrain (re-pricing history is never "
                    "implicit)"
                )
            from .bpe import words_with_counts
            from .unigram import unigram_fit

            model = unigram_fit(words_with_counts(docs, text_col)).select(
                "piece",
                F.col("c").cast("long").alias("c"),
                F.col("cost").cast("long").alias("cost"),
            )
            # the model is collect-sized by construction (vocab_size +
            # alphabet rows); localCheckpoint so pricing and the commit
            # don't re-run the EM
            model = model.localCheckpoint()
            led = self._price(docs, model, id_col, source_col, text_col)
            emit = led.select(
                F.col("doc_id").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta,
                [("surv", emit), ("model", model), ("led", led)],
                "doc_id",
                batch_id,
            )

    def absorb(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        source_col: str = "source",
        text_col: str = "text",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Price the increment under the FROZEN stored model and
        append it to the ledger — O(increment) compute and I/O."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, "doc_id")
            if replay is not None:
                return replay
            if meta is None:
                raise ValueError(
                    f"TokenLedgerStore at {self.path} has no model — "
                    "fit_base() before absorbing increments"
                )
            led = self._price(
                docs, self.model(), id_col, source_col, text_col
            )
            emit = led.select(
                F.col("doc_id").alias("id"), *self._EMIT_COLS
            )
            return self._commit_increment(
                meta, [("surv", emit), ("led", led)], "doc_id", batch_id
            )

    # -- maintenance -----------------------------------------------------

    def fold(self) -> int:
        """Semantic compaction: rewrite both tables into one file set
        (rows unchanged — the ledger is immutable facts, not counts)."""
        return self._rewrite_snapshot(
            lambda: [
                ("model", self.model()),
                ("led", self.ledger()),
            ]
        )

    # -- streaming twin ---------------------------------------------------

    def foreach_batch(self, id_col: str, source_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch``: each micro-batch priced under
        the frozen model and absorbed under its batch id."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            out = self.absorb(
                batch_df, id_col, source_col, text_col, batch_id=batch_id
            )
            emit(out, batch_id)

        return _fn
