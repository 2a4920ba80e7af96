"""LmModelStore (operators/lm_store.py) — the persisted incremental
bigram language model, the ADDITIVE-merge member of the snapshot
store family.

The driver-level oracle row is lm_score_incremental
(queries_extensions.py), whose SQL refits the history model from
scratch; these tests pin what the oracle can't see: the additive-merge
property (absorb in any split = fit on the concatenation), exact
equivalence with the batch scorer when nothing is unseen, the
documented unseen/empty-model smoothing semantics against a pure-
Python model, exactly-once batch replay (double-adding counts is the
additive store's double-emission bug), per-stage commit-crash replay
through the shared _SnapshotArtifactStore seam, and reopen/format
pinning.

Reference scope: the reference engine has no text/model surface
(SURVEY.md section 2.3) — this is training-data-pipeline surface
(CCNet-style LM filtering, Wenzek et al. 2020) in daily-ingest form.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.lm_store import LmModelStore

DOCS_SCHEMA = "doc_id long, text string"


def _toks(text: str) -> list[str]:
    return [w for w in text.split(" ") if w != ""]


def _round_half_up(v: float) -> int:
    return int(math.floor(v + 0.5))


def _fit(docs: list[tuple[int, str]]):
    """Pure-Python model: (bigram counts, unigram counts, vocab size).
    Unigrams/vocab count EVERY token (even docs with < 2 tokens);
    bigrams need two — both exactly as the store absorbs."""
    bc: dict[tuple[str, str], int] = {}
    uc: dict[str, int] = {}
    for _, text in docs:
        t = _toks(text)
        for w in t:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    return bc, uc, len(uc)


def _score(model, docs: list[tuple[int, str]]):
    """{doc_id: (n_bigrams, sum_p_x1e9)} under the store's documented
    semantics: add-one smoothing with unseen counts 0, denominator
    clamped at 1, per-bigram HALF_UP quantization to 1e9 fixed point
    with the multiply-then-divide IEEE order of the Spark expression."""
    bc, uc, v = model
    out = {}
    for i, text in docs:
        t = _toks(text)
        if len(t) < 2:
            continue
        n, s = 0, 0
        for a, b in zip(t, t[1:]):
            num = (bc.get((a, b), 0) + 1) * 1e9
            den = max(uc.get(a, 0) + v, 1)
            s += _round_half_up(num / den)
            n += 1
        out[i] = (n, s)
    return out


def _df(spark, docs):
    return spark.createDataFrame(docs, DOCS_SCHEMA)


def _model_rows(store):
    big = sorted(
        (r.w1, r.w2, r.c12) for r in store.bigram_counts().collect()
    )
    uni = sorted((r.w, r.c1) for r in store.unigram_counts().collect())
    v = store.vocab_size().collect()[0].v
    return big, uni, v


DAY1 = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on a log"),
    (3, "a cat and a dog"),
    (4, "solo"),
    (5, ""),
]
DAY2 = [
    (10, "the cat sat quietly"),          # mixes seen and unseen
    (11, "zebra quagga zebra"),           # fully unseen
    (12, "on the mat the cat sat"),       # fully seen, new order
    (13, "x"),                            # too short — omitted
]


def test_lm_additive_merge(spark, tmp_path):
    """absorb(day1); absorb(day2) == absorb(day1 + day2): the summed
    model tables are identical — addition is the store's merge."""
    split = LmModelStore(spark, str(tmp_path / "a"))
    split.absorb(_df(spark, DAY1), "doc_id", "text")
    split.absorb(_df(spark, DAY2), "doc_id", "text")
    whole = LmModelStore(spark, str(tmp_path / "b"))
    whole.absorb(_df(spark, DAY1 + DAY2), "doc_id", "text")
    assert _model_rows(split) == _model_rows(whole)


def test_lm_self_score_equals_batch(spark, tmp_path):
    """After absorbing corpus X, score(X) is bit-identical to the
    batch lm_doc_likelihood(X): nothing is unseen, so the store's
    COALESCE/GREATEST smoothing never fires and the two formulas
    coincide — the documented divergence is unseen-only."""
    from time_series_storage_spark.operators.text import (
        lm_doc_likelihood,
    )

    store = LmModelStore(spark, str(tmp_path / "s"))
    docs = _df(spark, DAY1)
    store.absorb(docs, "doc_id", "text")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.sum_p_x1e9)
        for r in store.score(docs, "doc_id", "text").collect()
    )
    want = sorted(
        (r.doc_id, r.n_bigrams, r.sum_p_x1e9)
        for r in lm_doc_likelihood(docs, "doc_id", "text").collect()
    )
    assert got == want


def test_lm_unseen_scoring_matches_model(spark, tmp_path):
    """Day-2 scoring under the day-1 model — unseen bigrams, unseen
    words, and the short-doc omission all match the pure-Python
    model."""
    store = LmModelStore(spark, str(tmp_path / "u"))
    store.absorb(_df(spark, DAY1), "doc_id", "text")
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_x1e9)
        for r in store.score(_df(spark, DAY2), "doc_id", "text").collect()
    }
    assert got == _score(_fit(DAY1), DAY2)
    assert 13 not in got


def test_lm_empty_model_score(spark, tmp_path):
    """A fresh store scores every bigram at the clamped-denominator
    ceiling: p = round((0+1)*1e9 / max(0+0, 1)) = 1e9."""
    store = LmModelStore(spark, str(tmp_path / "e"))
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_x1e9)
        for r in store.score(_df(spark, DAY2), "doc_id", "text").collect()
    }
    assert got == {10: (3, 3 * 10**9), 11: (2, 2 * 10**9), 12: (5, 5 * 10**9)}


def test_lm_absorb_emits_pre_update_scores(spark, tmp_path):
    """absorb() emission = the increment scored under the PRE-update
    model (online evaluation), and the counts land only after."""
    store = LmModelStore(spark, str(tmp_path / "p"))
    store.absorb(_df(spark, DAY1), "doc_id", "text", batch_id=0)
    out = store.absorb(_df(spark, DAY2), "doc_id", "text", batch_id=1)
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_x1e9) for r in out.collect()
    }
    assert got == _score(_fit(DAY1), DAY2)
    assert _model_rows(store)[2] == _fit(DAY1 + DAY2)[2]


def test_lm_replay_exactly_once(spark, tmp_path):
    """Re-absorbing a committed batch_id returns the committed
    emission WITHOUT re-adding its counts; an older batch_id returns
    empty."""
    store = LmModelStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, DAY1), "doc_id", "text", batch_id=0)
    first = sorted(
        (r.doc_id, r.n_bigrams, r.sum_p_x1e9)
        for r in store.absorb(
            _df(spark, DAY2), "doc_id", "text", batch_id=1
        ).collect()
    )
    before = _model_rows(store)
    replay = sorted(
        (r.doc_id, r.n_bigrams, r.sum_p_x1e9)
        for r in store.absorb(
            _df(spark, DAY2), "doc_id", "text", batch_id=1
        ).collect()
    )
    assert replay == first
    assert _model_rows(store) == before  # counts NOT double-added
    assert (
        store.absorb(_df(spark, DAY1), "doc_id", "text", batch_id=0).count()
        == 0
    )
    assert _model_rows(store) == before


def test_lm_reopen_persists(spark, tmp_path):
    """A reopened store serves the same model; format/params are
    pinned in the committed meta."""
    p = str(tmp_path / "o")
    store = LmModelStore(spark, p)
    store.absorb(_df(spark, DAY1), "doc_id", "text")
    rows = _model_rows(store)
    again = LmModelStore(spark, p)
    assert _model_rows(again) == rows
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == LmModelStore.FORMAT
    assert meta["params"] == ["lm-bigram-v1"]


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_lm_commit_crash_replay_exactly_once(spark, tmp_path, stage):
    """Per-stage crash inside the shared snapshot commit leaves the
    model on the old version; the retry under the same batch_id
    produces the day-1 scores and adds the counts exactly once."""
    store = LmModelStore(spark, str(tmp_path / "c"))
    store.absorb(_df(spark, DAY1), "doc_id", "text", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), "doc_id", "text", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _model_rows(store) == _model_rows_of(_fit(DAY1))

    out = store.absorb(_df(spark, DAY2), "doc_id", "text", batch_id=1)
    got = {r.doc_id: (r.n_bigrams, r.sum_p_x1e9) for r in out.collect()}
    assert got == _score(_fit(DAY1), DAY2)
    assert _model_rows(store) == _model_rows_of(_fit(DAY1 + DAY2))
    assert not [
        n
        for n in os.listdir(tmp_path / "c")
        if n.startswith(".staging-")
    ]


def _model_rows_of(model):
    bc, uc, v = model
    return (
        sorted((a, b, c) for (a, b), c in bc.items()),
        sorted(uc.items()),
        v,
    )


def test_lm_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: a file stream scored-then-absorbed through the
    persisted model via foreachBatch — each micro-batch is evaluated
    under the model-so-far (pre-stream history for batch 0, history +
    batch 0 for batch 1), and the final model equals the pure-Python
    fit on everything."""
    store = LmModelStore(spark, str(tmp_path / "lm"))
    store.absorb(_df(spark, DAY1), "doc_id", "text")

    b0 = [(10, "the cat sat quietly"), (11, "zebra quagga zebra")]
    b1 = [(12, "on the mat the cat sat"), (13, "zebra quagga here")]
    src = str(tmp_path / "feed")
    _df(spark, b0).coalesce(1).write.parquet(src + "/f0")
    _df(spark, b1).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {
            r.doc_id: (r.n_bigrams, r.sum_p_x1e9) for r in df.collect()
        }

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            store.foreach_batch("doc_id", "text", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(emitted) == 2
    # map batch ids to content (file order is an ingestion detail)
    by_doc = {}
    for scores in emitted.values():
        by_doc.update(scores)
    first, second = (
        (b0, b1) if 10 in emitted[min(emitted)] else (b1, b0)
    )
    assert {
        k: v for k, v in by_doc.items() if k in dict(first)
    } == _score(_fit(DAY1), first)
    assert {
        k: v for k, v in by_doc.items() if k in dict(second)
    } == _score(_fit(DAY1 + first), second)
    assert _model_rows(store) == _model_rows_of(_fit(DAY1 + b0 + b1))


def test_lm_compact_preserves_model(spark, tmp_path):
    """Base-class compact() rewrites count rows unchanged into fewer
    files; because the read path SUMS across files, the model is
    invariant — the additive store's maintenance contract."""
    store = LmModelStore(spark, str(tmp_path / "k"))
    store.absorb(_df(spark, DAY1), "doc_id", "text")
    store.absorb(_df(spark, DAY2), "doc_id", "text")
    before = _model_rows(store)
    assert store.compact(target_files=1) > 0
    assert _model_rows(store) == before
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_x1e9)
        for r in store.score(_df(spark, DAY2), "doc_id", "text").collect()
    }
    assert got == _score(_fit(DAY1 + DAY2), DAY2)


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.sampled_from("a b c dd ee".split()), min_size=0, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    cut=st.integers(min_value=0, max_value=10),
)
def test_lm_store_property(spark, tmp_path_factory, data, cut):
    """Property: for any corpus and any split point, (1) two absorbs
    equal one absorb of the concatenation, and (2) scoring the second
    slice under the first slice's model matches the pure-Python
    model."""
    docs = [(i, t) for i, t in enumerate(data)]
    cut = min(cut, len(docs))
    d1, d2 = docs[:cut], docs[cut:]
    base = tmp_path_factory.mktemp("lmprop")
    split = LmModelStore(spark, str(base / "a"))
    if d1:
        split.absorb(_df(spark, d1), "doc_id", "text")
    if d2:
        got = {
            r.doc_id: (r.n_bigrams, r.sum_p_x1e9)
            for r in split.score(
                _df(spark, d2), "doc_id", "text"
            ).collect()
        }
        assert got == _score(_fit(d1), d2)
        split.absorb(_df(spark, d2), "doc_id", "text")
    whole = LmModelStore(spark, str(base / "b"))
    whole.absorb(_df(spark, docs), "doc_id", "text")
    assert _model_rows(split) == _model_rows(whole)
