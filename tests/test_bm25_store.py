"""Bm25StatsStore (operators/bm25_store.py) — persisted incremental
BM25 index statistics, an additive-merge member of the store family.

The driver-level oracle row is bm25_incremental, whose SQL is the
BATCH BM25 oracle verbatim (sum-of-slice-stats == one-shot stats
through the whole scoring pipeline); these tests pin what that can't
see: the additive merge at the stats level (df + totals), the
served-ranking equivalence against the batch gate on the same data,
emission contract, exactly-once batch replay, per-stage commit-crash
replay through the shared _SnapshotArtifactStore seam, and
reopen/format pinning.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest

from time_series_storage_spark.operators.bm25_store import Bm25StatsStore

SCHEMA = "doc_id long, text string"
DOCS = [
    (0, "spark table fast fast"),
    (1, "spark engine"),
    (2, "table table table pad"),
    (3, "pad pad pad"),
    (4, "fast table"),
]
QUERY = ("spark", "table", "fast")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _model_df(rows):
    c: Counter = Counter()
    for _, t in rows:
        for w in set(t.split()):
            c[w] += 1
    return dict(c)


def _read_df(store):
    return {r.tok: r.df for r in store.df_counts().collect()}


def _read_tot(store):
    r = store.totals().collect()[0]
    return (r._n, r._tl)


def test_bm25_store_additive_merge(spark, tmp_path):
    """absorb in two slices == one-shot statistics: per-term df and
    both totals."""
    store = Bm25StatsStore(spark, str(tmp_path / "a"))
    store.absorb(_df(spark, DOCS[:2]), "doc_id", "text")
    store.absorb(_df(spark, DOCS[2:]), "doc_id", "text")
    assert _read_df(store) == _model_df(DOCS)
    assert _read_tot(store) == (
        len(DOCS), sum(len(t.split()) for _, t in DOCS)
    )


def test_bm25_store_topk_equals_batch_gate(spark, tmp_path):
    """The ranking served from two-absorb stats equals the batch BM25
    ranking computed from scratch on the same corpus (same exact
    integer arithmetic end to end)."""
    import os
    import tempfile

    from time_series_storage_spark.queries_extensions import (
        q_search_bm25_topk,
    )

    store = Bm25StatsStore(spark, str(tmp_path / "t"))
    store.absorb(_df(spark, DOCS[:3]), "doc_id", "text")
    store.absorb(_df(spark, DOCS[3:]), "doc_id", "text")
    served = sorted(
        (r.doc_id, r.rank, r.score_x1e6, r.n_hit_terms)
        for r in store.topk(_df(spark, DOCS), QUERY, k=20).collect()
    )
    sf_dir = tempfile.mkdtemp(prefix="bm25s_")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    batch = sorted(
        (r.doc_id, r.rank, r.score_x1e6, r.n_hit_terms)
        for r in q_search_bm25_topk(spark, sf_dir).collect()
    )
    assert served == batch


def test_bm25_store_emission_and_replay(spark, tmp_path):
    """absorb emits POST-merge df for exactly the increment's terms;
    replaying a committed batch re-reads the emission and never
    re-adds counts."""
    store = Bm25StatsStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, DOCS[:3]), "doc_id", "text", batch_id=0)
    out = store.absorb(
        _df(spark, [(9, "spark new")]), "doc_id", "text", batch_id=1
    )
    got = {r.tok: r.df for r in out.collect()}
    assert got == {"spark": 3, "new": 1}  # post-merge, touched only
    files_before = sorted(os.listdir(store._current_dir()))
    replay = {
        r.tok: r.df
        for r in store.absorb(
            _df(spark, [(9, "spark new")]), "doc_id", "text", batch_id=1
        ).collect()
    }
    assert replay == got
    assert sorted(os.listdir(store._current_dir())) == files_before
    assert _read_df(store) == _model_df(DOCS[:3] + [(9, "spark new")])


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_bm25_store_commit_crash_replay(spark, tmp_path, stage):
    store = Bm25StatsStore(spark, str(tmp_path / "c"))
    store.absorb(_df(spark, DOCS[:3]), "doc_id", "text", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DOCS[3:]), "doc_id", "text", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read_df(store) == _model_df(DOCS[:3])

    store.absorb(_df(spark, DOCS[3:]), "doc_id", "text", batch_id=1)
    assert _read_df(store) == _model_df(DOCS)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_bm25_store_reopen_and_pins(spark, tmp_path):
    p = str(tmp_path / "o")
    store = Bm25StatsStore(spark, p)
    store.absorb(_df(spark, DOCS), "doc_id", "text")
    stats = (_read_df(store), _read_tot(store))
    again = Bm25StatsStore(spark, p)
    assert (_read_df(again), _read_tot(again)) == stats
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == Bm25StatsStore.FORMAT
    assert meta["params"] == ["bm25-v1"]
