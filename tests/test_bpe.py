"""BPE tokenizer (operators/bpe.py): fit + encode semantics.

The driver-level oracle rows are bpe_fit_merges / bpe_encode_docs
(queries_extensions.py — the oracle replays the full merge sequence
with an unrolled CTE chain); these tests pin the algorithm against an
INDEPENDENT pure-Python sequential model (counter-based fit, greedy
left-to-right fold encode) on adversarial inputs the corpus doesn't
produce: overlap chains ('aaa' under merge (a,a)), alternating chains
('babab' under (b,a)), merges whose right side is itself a merged
token, and tie-breaking.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from time_series_storage_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_words,
    bpe_fit,
)


# -- independent sequential model -------------------------------------------

def _py_apply(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right fold: the reference semantics the
    sentinel-wrapped literal replace must equal."""
    out: list = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_fit(word_counts: dict, n_merges: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        vocab = {w: _py_apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


# -- deterministic pins ------------------------------------------------------

def test_bpe_fit_textbook(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new lower"),
         (3, "wide wider widest low new")], ["doc_id", "text"])
    m = [(r.rank, r.left, r.right, r.n)
         for r in bpe_fit(docs, num_merges=4).orderBy("rank").collect()]
    assert m == [(1, "l", "o", 7), (2, "lo", "w", 7),
                 (3, "e", "w", 5), (4, "n", "ew", 5)]
    enc = bpe_encode(docs, bpe_fit(docs, num_merges=8))
    got = {(r.doc_id, r.word_idx): (list(r.tokens), r.n_toks)
           for r in enc.collect()}
    assert got[(1, 1)] == (["low", "er"], 2)
    assert got[(3, 2)] == (["w", "id", "est"], 3)


def test_bpe_merge_overlap_chains(spark):
    """The sentinel-wrapped replace must equal the greedy fold on
    overlap chains — the exact spot where naive space-joined replace
    diverges (consumed delimiters break adjacency)."""
    words = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("aaaaa",), ("babab",), ("ababa",)], ["w"]
    )
    got = {
        r.w: r.bpe_s
        for r in bpe_encode_words(words, "w", [("a", "a")]).collect()
    }

    def toks(s):
        return s[1:-1].split("\x02\x01") if s else []

    assert toks(got["aaa"]) == ["aa", "a"]
    assert toks(got["aaaa"]) == ["aa", "aa"]
    assert toks(got["aaaaa"]) == ["aa", "aa", "a"]
    got2 = {
        r.w: r.bpe_s
        for r in bpe_encode_words(words, "w", [("b", "a")]).collect()
    }
    assert toks(got2["babab"]) == ["ba", "ba", "b"]
    assert toks(got2["ababa"]) == ["a", "ba", "ba"]


def test_bpe_merge_with_merged_right_side(spark):
    """A later merge whose operands are earlier merged tokens."""
    words = spark.createDataFrame([("abab",), ("ababab",)], ["w"])
    out = bpe_encode_words(words, "w", [("a", "b"), ("ab", "ab")])
    got = {r.w: (r.bpe_s[1:-1].split("\x02\x01"), r.n_toks)
           for r in out.collect()}
    assert got["abab"] == (["abab"], 1)
    assert got["ababab"] == (["abab", "ab"], 2)


# -- property: Spark pipeline == sequential model ---------------------------

corpora = st.dictionaries(
    keys=st.text(alphabet="ab", min_size=1, max_size=6),
    values=st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=6,
)


@given(wc=corpora, n_merges=st.integers(min_value=1, max_value=6))
@settings(max_examples=5, deadline=None)
def test_bpe_matches_sequential_model(spark, wc, n_merges):
    """For ANY word-count corpus, distributed fit must produce the
    identical merge sequence (values AND counts AND order) and encode
    must produce the identical tokenization as the pure-Python
    sequential model. 'ab'-alphabet words maximize overlap chains and
    ties."""
    text = " ".join(w for w, c in sorted(wc.items()) for _ in range(c))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    m = bpe_fit(docs, num_merges=n_merges)
    got_merges = [
        (r.left, r.right, r.n) for r in m.orderBy("rank").collect()
    ]
    want_merges, want_vocab = _py_fit(wc, n_merges)
    assert got_merges == want_merges
    words = spark.createDataFrame([(w,) for w in wc], ["w"])
    enc = bpe_encode_words(
        words, "w", [(a, b) for a, b, _ in want_merges]
    )
    got_vocab = {
        r.w: r.bpe_s[1:-1].split("\x02\x01") for r in enc.collect()
    }
    assert got_vocab == want_vocab


# -- production encode path (broadcast merges + mapInPandas) ----------------

arbitrary_merges = st.lists(
    st.tuples(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.text(alphabet="ab", min_size=1, max_size=3),
    ),
    min_size=0,
    max_size=64,
)


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    merges=arbitrary_merges,
)
@settings(max_examples=5, deadline=None)
def test_bpe_prod_equals_chained_replace(spark, words, merges):
    """bpe_encode_words_prod (broadcast table + mapInPandas fold) must
    be byte-identical to bpe_encode_words (chained literal replaces)
    for ARBITRARY merge tables up to N=64 — including invalid/synthetic
    tables where the textbook min-rank-priority shortcut diverges from
    the rank-order fold."""
    from time_series_storage_spark.operators.bpe import (
        bpe_encode_words_prod,
    )

    df = spark.createDataFrame([(w,) for w in words], ["w"])
    a = {
        r.w: (r.bpe_s, r.n_toks)
        for r in bpe_encode_words(df, "w", merges).collect()
    }
    b = {
        r.w: (r.bpe_s, r.n_toks)
        for r in bpe_encode_words_prod(df, "w", merges).collect()
    }
    assert a == b


def test_bpe_prod_corpus_twin(spark):
    """bpe_encode_prod == bpe_encode on a fitted corpus (full output
    rows: positions, tokens arrays, counts)."""
    from time_series_storage_spark.operators.bpe import bpe_encode_prod

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new lower"),
         (3, "wide wider widest low new")], ["doc_id", "text"])
    merges = bpe_fit(docs, num_merges=8)
    key = lambda r: (r.doc_id, r.word_idx)
    a = {key(r): (r.word, list(r.tokens), r.n_toks)
         for r in bpe_encode(docs, merges).collect()}
    b = {key(r): (r.word, list(r.tokens), r.n_toks)
         for r in bpe_encode_prod(docs, merges).collect()}
    assert a == b and len(a) == 15


def test_bpe_prod_4k_merges_scale(spark):
    """The production path must hold at a vocabulary size where the
    chained-replace plan breaks codegen: a 4096-merge table over the
    sf0.01 documents corpus completes in one mapInPandas stage (the
    plan is vocabulary-size independent) and agrees with the
    pure-Python fold on every distinct word."""
    from time_series_storage_spark.operators.bpe import (
        bpe_encode_prod,
        fold_encode_word,
    )

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # synthetic-but-valid 4096-merge table: every a-z char pair in a
    # deterministic order (rank monotone; applicability is sparse,
    # exactly the production profile of a large vocab vs short words)
    pairs = [
        (chr(97 + i), chr(97 + j)) for i in range(26) for j in range(26)
    ]
    extra = [
        (a + b, c)
        for (a, b) in pairs[:132]
        for c in "abcdefghijklmnopqrstuvwxyz"
    ]
    table = (pairs + extra)[:4096]
    assert len(table) == 4096
    merges_df = spark.createDataFrame(
        [(i + 1, l, r, 0) for i, (l, r) in enumerate(table)],
        "rank long, left string, right string, n long",
    )
    enc = bpe_encode_prod(docs, merges_df)
    rows = enc.collect()
    assert len(rows) > 0
    by_word = {}
    for r in rows:
        by_word.setdefault(r.word, (list(r.tokens), r.n_toks))
    for w, (toks, n) in list(by_word.items())[:50]:
        want = fold_encode_word(w, table)
        assert toks == want and n == len(want), w


def test_bpe_fit_degenerate_inputs(spark):
    """r11 verdict #7: the documented merge-count ceiling's edge
    cases. num_merges=0 must return an empty merge table WITHOUT
    running any argmax jobs, and a corpus whose words are all single
    characters (no adjacent pairs anywhere) must stop early and
    return empty regardless of the requested merge count — the loop's
    only other exit."""
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c c a")], "doc_id long, text string"
    )
    zero = bpe_fit(docs, num_merges=0)
    assert zero.count() == 0
    assert zero.columns == ["rank", "left", "right", "n"]
    # single-char words: _pair_counts is empty on round 1 -> early stop
    singles = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    none = bpe_fit(singles, num_merges=50)
    assert none.count() == 0
    # encode with an empty merge table degrades to chars (not a crash)
    enc = bpe_encode(singles, none)
    rows = {(r.doc_id, r.word_idx): r.n_toks for r in enc.collect()}
    assert rows == {(1, 0): 1, (1, 1): 1, (1, 2): 1, (2, 0): 1, (2, 1): 1}
