"""ppjoin_pairs (operators/dedup.py) — exact prefix-filtered set-
similarity join. The driver gate proves losslessness on the synthetic
corpus by brute-force oracle hash; this pins it on ADVERSARIAL random
corpora (hypothesis): for any small document set and any threshold,
the prefix-filtered join returns EXACTLY the brute-force pair set —
same pairs, same intersections, same fixed-point Jaccard — including
corpora engineered for ties (shared rare tokens, identical docs,
singleton docs) where an off-by-one in the prefix length would drop
pairs silently.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from time_series_storage_spark.operators.dedup import ppjoin_pairs

WORDS = [f"w{i}" for i in range(12)]


def _brute(docs: dict, t_x1000: int):
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = docs[a], docs[b]
            inter = len(sa & sb)
            if not inter:
                continue
            j = (1000 * inter) // (len(sa) + len(sb) - inter)
            if j >= t_x1000:
                out[(a, b)] = (inter, j)
    return out


@given(
    st.lists(
        st.sets(st.sampled_from(WORDS), min_size=1, max_size=8),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([300, 500, 700, 900, 1000]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ppjoin_equals_brute_force(spark, doc_sets, t_x1000):
    docs = {i: s for i, s in enumerate(doc_sets)}
    df = spark.createDataFrame(
        [(i, " ".join(sorted(s))) for i, s in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r.d1, r.d2): (r.inter, r.jacc_x1000)
        for r in ppjoin_pairs(df, "doc_id", "text", t_x1000).collect()
    }
    assert got == _brute(docs, t_x1000)


def test_ppjoin_identical_and_disjoint_docs(spark):
    """The tie-heavy corners: exact copies (Jaccard 1000 must
    survive any threshold) and fully disjoint docs (no pair ever)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z"), (4, "p q")],
        "doc_id long, text string",
    )
    got = {
        (r.d1, r.d2): r.jacc_x1000
        for r in ppjoin_pairs(df, "doc_id", "text", 1000).collect()
    }
    assert got == {(1, 2): 1000}
    with pytest.raises(ValueError, match="threshold_x1000"):
        ppjoin_pairs(df, "doc_id", "text", 0)


def test_ppjoin_filters_fire_without_changing_output(spark):
    """r12 (verdict #3): the length + positional filters prune
    provably-subthreshold candidates BEFORE verification without
    changing the result. Corpus engineered so both fire:

    - (1, 2): share prefix token 'r' but |1|=2 vs |2|=10 — the length
      filter kills the candidate (J <= 2/10 < 0.5).
    - (3, 4): same size, share only their LAST-ordered prefix token,
      disjoint otherwise — the positional bound 1 + min(i-1,j-1) +
      min(n-i, n-j) sits below alpha and kills it.
    - (5, 6): true near-dups that must survive everything.
    """
    docs = {
        1: {"r", "a"},
        2: {"r"} | {f"z{i}" for i in range(9)},
        3: {"q", "b", "c", "d"},
        4: {"q", "e", "f", "g"},
        5: {"h", "i", "j", "k"},
        6: {"h", "i", "j", "k", "m"},
    }
    df = spark.createDataFrame(
        [(i, " ".join(sorted(s))) for i, s in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r.d1, r.d2): (r.inter, r.jacc_x1000)
        for r in ppjoin_pairs(df, "doc_id", "text", 500).collect()
    }
    assert got == _brute(docs, 500)
    assert (5, 6) in got and (1, 2) not in got and (3, 4) not in got
