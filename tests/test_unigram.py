"""Unigram-LM tokenizer (operators/unigram.py): exact-integer log2
costs, Viterbi DP, and the fixed-round Viterbi-EM fit, pinned against
an INDEPENDENT pure-Python sequential model (its own bigints, its own
dict-based Viterbi) on adversarial corpora — the test discipline of
test_bpe.py. The driver gate rows are unigram_fit_pieces /
unigram_segment (queries_extensions.py — the oracle replays seed, EM
and DP as unrolled CTEs)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from time_series_storage_spark.operators import unigram as U


# -- independent model --------------------------------------------------------

def _py_log2fix(T, c, B=U.UNI_FRAC_BITS):
    m = (T << 30) // c
    e = m.bit_length() - 31
    m >>= e
    f = 0
    for _ in range(B):
        m = (m * m) >> 30
        b = 1 if m >= (1 << 31) else 0
        m >>= b
        f = f * 2 + b
    return e * (1 << B) + f


def _py_seed(words, L, V):
    freq = {}
    for w, cnt in words.items():
        for p in range(len(w)):
            for l in range(1, min(L, len(w) - p) + 1):
                piece = w[p:p + l]
                freq[piece] = freq.get(piece, 0) + cnt
    singles = {p: c for p, c in freq.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in freq.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:V]
    return {**singles, **dict(multis)}


def _py_viterbi(w, costs, L):
    dp = [(0, "")] + [None] * len(w)
    for i in range(1, len(w) + 1):
        best = None
        for j in range(max(0, i - L), i):
            piece = w[j:i]
            if piece in costs and dp[j] is not None:
                comp = (dp[j][0] + costs[piece]) * 64 + j
                if best is None or comp < best[0]:
                    best = (comp, dp[j][1] + "|" + piece)
        dp[i] = (best[0] // 64, best[1])
    return dp[len(w)]


def _py_fit_segment(words, L, V, R):
    vocab = _py_seed(words, L, V)
    singles = {p for p in vocab if len(p) == 1}
    for _ in range(R):
        T = sum(vocab.values())
        costs = {p: _py_log2fix(T, c) for p, c in vocab.items()}
        used = {}
        for w, cnt in words.items():
            _, seg = _py_viterbi(w, costs, L)
            for piece in seg[1:].split("|"):
                used[piece] = used.get(piece, 0) + cnt
        vocab = {p: max(used.get(p, 0), 1) for p in singles}
        vocab.update({p: c for p, c in used.items() if p not in singles})
    T = sum(vocab.values())
    costs = {p: _py_log2fix(T, c) for p, c in vocab.items()}
    segs = {}
    for w, cnt in words.items():
        cost, seg = _py_viterbi(w, costs, L)
        segs[w] = (cnt, seg[1:].count("|") + 1, seg[1:], cost)
    return costs, vocab, segs


def _wc_df(spark, words: dict):
    return spark.createDataFrame(
        list(words.items()), "w string, cnt long"
    )


# -- log2_fix ----------------------------------------------------------------

def test_log2_fix_tracks_true_log2():
    """The exact-integer log2 must sit within 2 ulp-of-2^-8 of the
    true log2 across the whole (c, T) domain the trainer sees."""
    cases = [
        (1, 1), (1, 2), (1, 3), (7, 7), (3, 100), (999, 1000),
        (1, 10**9), (123457, 10**9), ((1 << 33) - 2, (1 << 33) - 1),
    ]
    for c, T in cases:
        got = U.log2_fix(T, c)
        want = math.log2(T / c) * (1 << U.UNI_FRAC_BITS)
        assert abs(got - want) <= 2, (T, c, got, want)
        assert got == _py_log2fix(T, c)


def test_log2_fix_domain_errors():
    with pytest.raises(ValueError, match="2\\^33"):
        U.log2_fix(1 << 33, 1)
    with pytest.raises(ValueError):
        U.log2_fix(10, 0)
    with pytest.raises(ValueError):
        U.log2_fix(10, 11)  # c > total


# -- fit + segment vs the independent model ----------------------------------

WORDS = ["ab", "abc", "abcd", "xy", "xyxy", "q", "qab", "dcba"]


@given(
    st.dictionaries(
        st.sampled_from(WORDS),
        st.integers(min_value=1, max_value=500),
        min_size=2,
        max_size=8,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fit_and_segment_match_python_model(spark, words):
    wc = _wc_df(spark, words)
    py_costs, py_vocab, py_segs = _py_fit_segment(
        words, U.UNI_MAX_PIECE, U.UNI_VOCAB, U.UNI_EM_ROUNDS
    )
    model = {
        r["piece"]: (r["c"], r["cost"])
        for r in U.unigram_fit(wc).collect()
    }
    assert {p: cc[0] for p, cc in model.items()} == py_vocab
    assert {p: cc[1] for p, cc in model.items()} == py_costs
    got = {
        r["w"]: (r["cnt"], r["n_pieces"], r["seg"], r["cost"])
        for r in U.unigram_segment(wc).collect()
    }
    assert got == py_segs


def test_skewed_corpus_keeps_whole_word_piece(spark):
    """A dominant long word must survive as ONE piece: its count
    makes the whole-word cost beat any multi-piece split — the
    behavior that makes unigram-LM a subword model rather than a
    character model."""
    words = {"internationalization": 5000, "go": 3, "on": 2}
    # max_piece must cover the word for a single-piece segmentation,
    # and the vocab budget must admit it: repeated short substrings
    # of the dominant word (e.g. 'at' x3) carry multiplicity-scaled
    # counts that outrank the whole word under a tiny budget — the
    # budget is a real hyperparameter, not a formality
    wc = _wc_df(spark, words)
    segs = {
        r["w"]: r["seg"]
        for r in U.unigram_segment(
            wc, max_piece=20, vocab_size=300, max_word=24
        ).collect()
    }
    assert segs["internationalization"] == "internationalization"


def test_unknown_char_surfaces_loud_cost(spark):
    """Serving a word whose character never appeared in the fit
    corpus must not silently drop it: the UNK sentinel puts a
    >= 2^34 cost on the output row."""
    fit_wc = _wc_df(spark, {"abc": 10, "bca": 5})
    model = U.unigram_fit(fit_wc)
    out = U.unigram_viterbi(_wc_df(spark, {"azb": 1}), model).collect()
    assert len(out) == 1
    assert out[0]["cost"] >= (1 << 34)
    assert "z" in out[0]["seg"]


def test_max_word_exclusion_matches_both_engines(spark):
    wc = _wc_df(spark, {"short": 4, "x" * (U.UNI_MAX_WORD + 1): 9})
    got = {r["w"] for r in U.unigram_segment(wc).collect()}
    assert got == {"short"}


@given(
    st.integers(min_value=1, max_value=(1 << 33) - 1).flatmap(
        lambda t: st.tuples(st.just(t), st.integers(min_value=1, max_value=t))
    )
)
@settings(max_examples=300, deadline=None)
def test_log2_fix_accuracy_over_full_domain(tc):
    """Hypothesis sweep of the whole legal (total, c) domain: the
    exact-integer log2 must stay within 2/256 of true log2 and match
    the independent bigint model bit-for-bit."""
    total, c = tc
    got = U.log2_fix(total, c)
    assert got == _py_log2fix(total, c)
    want = math.log2(total / c) * (1 << U.UNI_FRAC_BITS)
    assert abs(got - want) <= 2, (total, c, got, want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=(1 << 33) - 1),
            st.integers(min_value=1, max_value=(1 << 33) - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_log2_fix_cte_matches_python_in_duckdb(rows):
    """The SQL mirror run IN DUCKDB must equal the Python spec on
    random inputs — the unit-level form of the cross-engine claim the
    gated queries make end-to-end (no Spark needed: this pins the
    DuckDB half alone, fast)."""
    import duckdb

    data = [
        (i, max(c, 1), max(t, c, 1))
        for i, (c, t) in enumerate(rows)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE inp (k BIGINT, c BIGINT, t BIGINT)")
    con.executemany("INSERT INTO inp VALUES (?, ?, ?)", data)
    sql = U.log2_fix_cte("SELECT k, c, t AS _T FROM inp", keys="k")
    got = {k: cost for k, _c, cost in con.execute(sql).fetchall()}
    for k, c, t in data:
        assert got[k] == U.log2_fix(t, c), (k, c, t)
