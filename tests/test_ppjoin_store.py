"""PrefixJoinStore (operators/dedup.py) — incremental EXACT-Jaccard
near-dup on the pinned hash-order prefix index. The driver gate row is
ppjoin_incremental (from-scratch SQL replay of the sequential model);
these tests pin what it can't see: the two-day sequential semantics
against a pure-Python exact model ON A CORPUS WHOSE TOKEN DOCUMENT
FREQUENCIES INVERT between days (the df-drift case that breaks a
df-ordered prefix index and motivates the pinned universal hash
order), exactly-once batch replay, commit-crash recovery, and
threshold/params pinning.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from time_series_storage_spark.operators.dedup import (
    PrefixJoinStore,
    hashed_token_sets,
)

T = 600  # Jaccard >= 0.6


def _py_model(day1: dict, day2: dict, t=T):
    """Sequential exact model: day-1 pairs + union-find min-id ->
    survivors; day-2 drop anything with Jaccard >= t to a RETAINED
    survivor; cluster the remainder."""

    def jacc(a, b):
        inter = len(a & b)
        return (1000 * inter) // (len(a) + len(b) - inter)

    def cluster(docs: dict) -> dict:
        parent = {i: i for i in docs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(docs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if jacc(docs[a], docs[b]) >= t:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        out: dict = {}
        for i in docs:
            out.setdefault(find(i), []).append(i)
        return {min(v): len(v) for v in out.values()}

    s1 = cluster(day1)
    kept = {
        i: s
        for i, s in day2.items()
        if not any(jacc(s, day1[x]) >= t for x in s1)
    }
    return s1, cluster(kept)


# day 1: token 'q' is RARE (df=1); day 2 floods 'q' so a df-order
# would now put 'q' LAST where day 1 put it FIRST — the drift case
DAY1 = {
    1: {"a", "b", "c", "d"},
    2: {"a", "b", "c", "e"},   # jacc(1,2)=3/5=600 -> dup of 1
    3: {"q", "x", "y", "z"},
    4: {"m", "n", "o", "p"},
}
DAY2 = {
    10: {"q", "x", "y", "w"},  # jacc vs 3 = 3/5 = 600 -> history dup
    11: {"q", "r", "s", "t"},
    12: {"q", "r", "s", "u"},  # jacc(11,12)=600 -> within-day cluster
    13: {"f", "g", "h"},
}


def _df(spark, day):
    return spark.createDataFrame(
        [(i, " ".join(sorted(s))) for i, s in day.items()],
        "doc_id long, text string",
    )


def test_ppjoin_store_sequential_model_under_df_drift(spark, tmp_path):
    want1, want2 = _py_model(DAY1, DAY2)
    assert any(n > 1 for n in want1.values())  # day-1 cluster exists
    assert 10 not in want2  # a history dup exists
    assert want2.get(11) == 2  # a within-day cluster exists
    store = PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T)
    got1 = {
        r.doc_id: r.n_members
        for r in store.absorb(_df(spark, DAY1), "doc_id", "text").collect()
    }
    assert got1 == want1
    got2 = {
        r.doc_id: r.n_members
        for r in store.absorb(_df(spark, DAY2), "doc_id", "text").collect()
    }
    assert got2 == want2
    # pure read == absorb emission; state holds survivors only
    assert store.sets().count() == len(want1) + len(want2)
    # the prefix index is a pure function of each doc's own tokens:
    # every retained doc has exactly n - ceil(t*n) + 1 prefix rows
    import math

    sizes = {r.id: r.n for r in store.sets().collect()}
    prefs: dict = {}
    for r in store.prefixes().collect():
        prefs[r.id] = prefs.get(r.id, 0) + 1
    assert prefs == {
        i: n - math.ceil(T * n / 1000) + 1 for i, n in sizes.items()
    }


def test_ppjoin_store_replay_and_crash(spark, tmp_path):
    store = PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T)
    store.absorb(_df(spark, DAY1), "doc_id", "text", batch_id=0)

    def boom(stage):
        if stage == "post_write":
            raise RuntimeError("injected")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), "doc_id", "text", batch_id=1)
    store._commit_fault = None
    meta = json.load(open(os.path.join(tmp_path / "p", "_current")))
    assert meta["batch"] == 0

    want1, want2 = _py_model(DAY1, DAY2)
    first = {
        r.doc_id: r.n_members
        for r in store.absorb(
            _df(spark, DAY2), "doc_id", "text", batch_id=1
        ).collect()
    }
    assert first == want2
    n_files = len(os.listdir(store._current_dir()))
    replay = {
        r.doc_id: r.n_members
        for r in store.absorb(
            _df(spark, DAY2), "doc_id", "text", batch_id=1
        ).collect()
    }
    assert replay == first
    assert len(os.listdir(store._current_dir())) == n_files
    assert not [
        n for n in os.listdir(tmp_path / "p") if n.startswith(".staging-")
    ]


def test_ppjoin_store_params_pinning(spark, tmp_path):
    store = PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T)
    store.absorb(_df(spark, DAY1), "doc_id", "text")
    with pytest.raises(ValueError, match="params"):
        PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T + 1)
    with pytest.raises(ValueError, match="threshold"):
        PrefixJoinStore(spark, str(tmp_path / "x"), threshold_x1000=0)


def test_hashed_token_sets_sorted_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "b a b  c a")], "doc_id long, text string"
    )
    row = hashed_token_sets(df, "doc_id", "text").collect()[0]
    want = sorted(
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for t in ("a", "b", "c")
    )
    assert row.tok_set == want and row.n == 3


def test_ppjoin_store_foreach_batch_streaming(spark, tmp_path):
    """End-to-end file stream through the store's foreachBatch sink:
    pre-stream history suppresses its exact-Jaccard near-dups, batch-2
    docs dedup against batch-1 SURVIVORS (cross-micro-batch state),
    and the emitted survivor stream equals the sequential model."""
    store = PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T)
    store.absorb(_df(spark, DAY1), "doc_id", "text")
    src = str(tmp_path / "feed")
    _df(spark, {k: DAY2[k] for k in (10, 11)}).coalesce(1).write.parquet(
        src + "/f0"
    )
    _df(spark, {k: DAY2[k] for k in (12, 13)}).coalesce(1).write.parquet(
        src + "/f1"
    )
    emitted: dict = {}

    def emit(df, bid):
        emitted[bid] = sorted(r.doc_id for r in df.collect())

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
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
    # batch 0: doc 10 is a history dup of survivor 3; 11 survives.
    # batch 1: doc 12 dedups against RETAINED SURVIVOR 11
    # (jacc(11,12) = 600 >= T) across micro-batches; 13 survives.
    assert emitted[0] == [11]
    assert emitted[1] == [13]


def test_ppjoin_store_whitespace_only_doc_is_singleton(spark, tmp_path):
    """r11 review finding: a whitespace-only doc has no tokens, pairs
    with nothing, and must flow through as a SINGLETON SURVIVOR (the
    from-scratch replay seeds clustering from the full doc list) —
    not silently vanish from survivors and state."""
    store = PrefixJoinStore(spark, str(tmp_path / "p"), threshold_x1000=T)
    day = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_members
        for r in store.absorb(day, "doc_id", "text").collect()
    }
    assert got.get(2) == 1  # the empty doc survives as a singleton
    assert store.sets().where("id = 2").collect()[0].n == 0
    # and a second empty doc on day 2 also survives (jaccard with the
    # stored empty set is never evaluated — no shared prefix token)
    day2 = spark.createDataFrame(
        [(10, " ")], "doc_id long, text string"
    )
    got2 = {
        r.doc_id: r.n_members
        for r in store.absorb(day2, "doc_id", "text").collect()
    }
    assert got2 == {10: 1}
