"""TokenLedgerStore (operators/token_ledger.py) — the persisted
per-document token ledger under a FROZEN unigram tokenizer.

The driver-level oracle row is tokmix_incremental
(queries_extensions.py), whose SQL refits the base-slice model and
prices the whole corpus from raw text; these tests pin what that
oracle can't see: the FROZEN-model contract (absorbing an increment
never changes the stored model nor re-prices history), pricing parity
with the engine-level fit+viterbi composition, the loud
refit-refusal and fit-before-absorb errors, exactly-once batch
replay, per-stage commit-crash recovery through the shared
_SnapshotArtifactStore seam, reopen persistence, fold invariance,
and the long-word exclusion surface composing with unigram_excluded.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.token_ledger import (
    TokenLedgerStore,
)

DOCS_SCHEMA = "doc_id long, source string, text string"

BASE = [
    (1, "a", "the cat sat on the mat"),
    (2, "a", "the dog sat on the log"),
    (3, "b", "cats and dogs and cats"),
    (4, "b", "mat dog log cat the the"),
]
INC = [
    (10, "a", "the newt sat on the newest log"),
    (11, "c", "dogs chase cats on mats"),
]


def _df(spark, docs):
    return spark.createDataFrame(docs, DOCS_SCHEMA)


def _expected_prices(spark, fit_docs, price_docs):
    """Engine-level reference: fit on ``fit_docs``, Viterbi-price
    ``price_docs`` — what the store must reproduce through its
    persisted model."""
    from time_series_storage_spark.operators.bpe import words_with_counts
    from time_series_storage_spark.operators.unigram import (
        unigram_fit,
        unigram_viterbi,
    )

    model = unigram_fit(words_with_counts(_df(spark, fit_docs)))
    wc = words_with_counts(_df(spark, price_docs))
    segs = unigram_viterbi(wc, model).select("w", "n_pieces")
    words = _df(spark, price_docs).select(
        "doc_id",
        "source",
        F.explode(F.split("text", r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    rows = (
        words.join(F.broadcast(segs), "w")
        .groupBy("doc_id", "source")
        .agg(F.sum("n_pieces").cast("long").alias("n_tokens"))
        .collect()
    )
    return {(r["doc_id"], r["source"]): r["n_tokens"] for r in rows}


def _ledger(store):
    return {
        (r["doc_id"], r["source"]): r["n_tokens"]
        for r in store.ledger().collect()
    }


def test_frozen_pricing_matches_engine_composition(spark, tmp_path):
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE))
    store.absorb(_df(spark, INC))
    want = _expected_prices(spark, BASE, BASE + INC)
    assert _ledger(store) == want


def test_absorb_never_touches_model_or_history(spark, tmp_path):
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE))
    model_before = sorted(map(tuple, store.model().collect()))
    base_prices = _ledger(store)
    store.absorb(_df(spark, INC))
    assert sorted(map(tuple, store.model().collect())) == model_before
    led = _ledger(store)
    for k, v in base_prices.items():
        assert led[k] == v  # history re-priced = frozen contract broken


def test_refit_refused_and_absorb_requires_fit(spark, tmp_path):
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    with pytest.raises(ValueError, match="no model"):
        store.absorb(_df(spark, INC))
    store.fit_base(_df(spark, BASE))
    with pytest.raises(ValueError, match="already fit"):
        store.fit_base(_df(spark, INC))


def test_replay_exactly_once(spark, tmp_path):
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE), batch_id=0)
    out1 = store.absorb(_df(spark, INC), batch_id=1)
    got1 = {r["doc_id"]: r["n_tokens"] for r in out1.collect()}
    led1 = _ledger(store)
    # replaying the same batch returns the committed emission and
    # appends nothing (double-priced docs = double-counted budgets)
    out2 = store.absorb(_df(spark, INC), batch_id=1)
    got2 = {r["doc_id"]: r["n_tokens"] for r in out2.collect()}
    assert got1 == got2
    assert _ledger(store) == led1
    # an older batch returns empty
    assert store.absorb(_df(spark, INC), batch_id=0).count() == 0


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_commit_crash_replay_exactly_once(spark, tmp_path, stage):
    store = TokenLedgerStore(spark, str(tmp_path / "c"))
    store.fit_base(_df(spark, BASE), batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, INC), batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _ledger(store) == _expected_prices(spark, BASE, BASE)

    store.absorb(_df(spark, INC), batch_id=1)
    assert _ledger(store) == _expected_prices(spark, BASE, BASE + INC)
    assert not [
        n
        for n in os.listdir(tmp_path / "c")
        if n.startswith(".staging-")
    ]


def test_reopen_persists_and_pins_format(spark, tmp_path):
    p = str(tmp_path / "s")
    store = TokenLedgerStore(spark, p)
    store.fit_base(_df(spark, BASE))
    led = _ledger(store)
    again = TokenLedgerStore(spark, p)
    assert _ledger(again) == led
    meta_path = os.path.join(p, "_current")
    meta = json.load(open(meta_path))
    meta["format"] = 99
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="format"):
        TokenLedgerStore(spark, p)


def test_fold_preserves_ledger_and_model(spark, tmp_path):
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE))
    store.absorb(_df(spark, INC[:1]))
    store.absorb(_df(spark, INC[1:]))
    led = _ledger(store)
    model = sorted(map(tuple, store.model().collect()))
    store.fold()
    assert _ledger(store) == led
    assert sorted(map(tuple, store.model().collect())) == model


def test_long_word_excluded_from_prices_and_countable(spark, tmp_path):
    from time_series_storage_spark.operators.bpe import words_with_counts
    from time_series_storage_spark.operators.unigram import (
        UNI_MAX_WORD,
        unigram_excluded,
    )

    long_word = "z" * (UNI_MAX_WORD + 1)
    inc = [(20, "a", f"the cat {long_word} sat")]
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE))
    store.absorb(_df(spark, inc))
    # the long word priced nothing: the doc's tokens = its other words'
    want = _expected_prices(spark, BASE, inc)
    assert _ledger(store)[(20, "a")] == want[(20, "a")]
    row = unigram_excluded(
        words_with_counts(_df(spark, inc))
    ).collect()[0]
    assert row["n_excluded_words"] == 1  # the silent-deflation guard


def test_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: a file stream priced-then-absorbed through the
    FROZEN model via foreachBatch — two real micro-batches, each
    emission carrying its batch's prices, final ledger equal to the
    batch-built one and the model untouched throughout."""
    store = TokenLedgerStore(spark, str(tmp_path / "s"))
    store.fit_base(_df(spark, BASE))
    model_before = sorted(map(tuple, store.model().collect()))

    src = str(tmp_path / "feed")
    _df(spark, INC[:1]).coalesce(1).write.parquet(src + "/f0")
    _df(spark, INC[1:]).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {r.doc_id: r.n_tokens for r in df.collect()}

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            store.foreach_batch("doc_id", "source", "text", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(emitted) == 2
    by_doc = {}
    for prices in emitted.values():
        by_doc.update(prices)
    want = _expected_prices(spark, BASE, INC)
    assert by_doc == {d: t for (d, _s), t in want.items()}
    assert _ledger(store) == _expected_prices(spark, BASE, BASE + INC)
    # frozen contract survives the stream: model bit-identical
    assert sorted(map(tuple, store.model().collect())) == model_before
