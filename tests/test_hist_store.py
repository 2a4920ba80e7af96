"""HistogramStore (operators/hist_store.py) — the persisted
incremental per-key histogram + drift probe, the third ADDITIVE-merge
member of the snapshot store family.

The driver-level oracle row is quality_drift_incremental
(queries_extensions.py), whose SQL recomputes the merged histogram and
the L1 drift from scratch; these tests pin what that oracle can't see:
the additive merge property (absorb in any split = one-shot histogram
of the concatenation), the drift semantics (exact integer L1 of bucket
shares; -1 with no history; 0 for an identical distribution; the
online-evaluation emission scores against the PRE-update state),
fold() semantics (state shrinks to one row per (key, bucket);
fold-then-absorb == absorb), exactly-once batch replay, per-stage
commit-crash replay through the shared _SnapshotArtifactStore seam,
reopen/format/params pinning, and the streaming foreachBatch twin.

Reference scope: the reference's histogram fact type is a stub
(SURVEY.md section 2.4) — this is the persisted data-quality twin.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.hist_store import HistogramStore

SCHEMA = "gk string, v long"
W, NB = 10, 4  # tiny buckets so the clamp path exercises


def _mk(spark, tmp_path, name):
    return HistogramStore(
        spark, str(tmp_path / name), bucket_width=W, n_buckets=NB
    )


def _bucket(v):
    return min(v // W, NB - 1)


def _hist_model(rows):
    c = Counter()
    for gk, v in rows:
        c[(gk, _bucket(v))] += 1
    return dict(c)


def _drift_model(hist_rows, inc_rows):
    """Pure-Python replay of the drift contract."""
    h = _hist_model(hist_rows)
    o = _hist_model(inc_rows)
    out = {}
    for gk in {k for k, _ in o}:
        hb = {b: c for (k, b), c in h.items() if k == gk}
        ob = {b: c for (k, b), c in o.items() if k == gk}
        nh, no = sum(hb.values()), sum(ob.values())
        if nh == 0:
            out[gk] = (0, no, -1)
            continue
        l1 = sum(
            abs(ob.get(b, 0) * 1_000_000 // no
                - hb.get(b, 0) * 1_000_000 // nh)
            for b in set(hb) | set(ob)
        )
        out[gk] = (nh, no, l1)
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_hist(store):
    return {
        (r.gk, r.b): r.c for r in store.histogram().collect()
    }


DAY1 = [("a", v) for v in (1, 3, 12, 25, 99)] + [("b", 5), ("b", 7)]
DAY2 = [("a", v) for v in (2, 14, 14, 200)] + [("c", 33)]
DAY3 = [("a", v) for v in (1, 13, 27, 95)] + [("c", 35), ("d", 8)]


def test_hist_additive_merge(spark, tmp_path):
    """Two absorbs == the histogram of the concatenation (the additive
    property the oracle also checks, pinned here at store grain)."""
    store = _mk(spark, tmp_path, "m")
    store.absorb(_df(spark, DAY1), "gk", "v")
    store.absorb(_df(spark, DAY2), "gk", "v")
    assert _read_hist(store) == _hist_model(DAY1 + DAY2)


def test_hist_drift_semantics(spark, tmp_path):
    """drift(): -1 with no history; 0 for an identical distribution;
    matches the pure-Python model on a key-overlapping increment and
    emits only the increment's keys."""
    store = _mk(spark, tmp_path, "d")
    pre = {
        r.gk: (r.n_hist, r.n_inc, r.l1_x1e6)
        for r in store.drift(_df(spark, DAY1), "gk", "v").collect()
    }
    assert pre == _drift_model([], DAY1)
    assert all(v[2] == -1 for v in pre.values())
    store.absorb(_df(spark, DAY1), "gk", "v")
    store.absorb(_df(spark, DAY2), "gk", "v")
    got = {
        r.gk: (r.n_hist, r.n_inc, r.l1_x1e6)
        for r in store.drift(_df(spark, DAY3), "gk", "v").collect()
    }
    assert got == _drift_model(DAY1 + DAY2, DAY3)
    assert set(got) == {"a", "c", "d"}  # increment keys only
    assert got["d"][2] == -1  # key with no baseline
    # identical distribution -> exactly 0
    same = {
        r.gk: r.l1_x1e6
        for r in store.drift(
            _df(spark, DAY1 + DAY2), "gk", "v"
        ).collect()
    }
    assert same["a"] == 0 and same["b"] == 0 and same["c"] == 0


def test_hist_absorb_scores_pre_update(spark, tmp_path):
    """The emission is the increment's drift against the PRE-update
    histogram — absorbing DAY2 emits drift vs DAY1 only."""
    store = _mk(spark, tmp_path, "p")
    store.absorb(_df(spark, DAY1), "gk", "v", batch_id=0)
    emitted = {
        r.gk: (r.n_hist, r.n_inc, r.l1_x1e6)
        for r in store.absorb(
            _df(spark, DAY2), "gk", "v", batch_id=1
        ).collect()
    }
    assert emitted == _drift_model(DAY1, DAY2)


def test_hist_replay_exactly_once(spark, tmp_path):
    store = _mk(spark, tmp_path, "r")
    store.absorb(_df(spark, DAY1), "gk", "v", batch_id=0)
    first = sorted(
        tuple(r)
        for r in store.absorb(
            _df(spark, DAY2), "gk", "v", batch_id=1
        ).collect()
    )
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        tuple(r)
        for r in store.absorb(
            _df(spark, DAY2), "gk", "v", batch_id=1
        ).collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before
    assert store.absorb(_df(spark, DAY1), "gk", "v", batch_id=0).count() == 0


def test_hist_reopen_and_pins(spark, tmp_path):
    p = str(tmp_path / "o")
    store = HistogramStore(spark, p, bucket_width=W, n_buckets=NB)
    store.absorb(_df(spark, DAY1), "gk", "v")
    h = _read_hist(store)
    again = HistogramStore(spark, p, bucket_width=W, n_buckets=NB)
    assert _read_hist(again) == h
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == HistogramStore.FORMAT
    assert meta["params"] == [f"hist-v1:w={W}:nb={NB}"]
    with pytest.raises(ValueError, match="params"):
        HistogramStore(spark, p, bucket_width=W + 1, n_buckets=NB)


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_hist_commit_crash_replay_exactly_once(spark, tmp_path, stage):
    store = _mk(spark, tmp_path, "c")
    store.absorb(_df(spark, DAY1), "gk", "v", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), "gk", "v", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read_hist(store) == _hist_model(DAY1)

    store.absorb(_df(spark, DAY2), "gk", "v", batch_id=1)
    assert _read_hist(store) == _hist_model(DAY1 + DAY2)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_hist_fold_is_semantically_invisible(spark, tmp_path):
    """fold() rewrites state to one row per (key, bucket); the
    histogram, a subsequent drift probe and a subsequent absorb are
    unchanged."""
    store = _mk(spark, tmp_path, "f")
    store.absorb(_df(spark, DAY1), "gk", "v")
    store.absorb(_df(spark, DAY2), "gk", "v")
    before_h = _read_hist(store)
    before_d = sorted(
        tuple(r) for r in store.drift(_df(spark, DAY3), "gk", "v").collect()
    )
    store.fold()
    rows = store._table("hist", "gk string, b long, c long").collect()
    assert len(rows) == len(before_h)  # one row per (key, bucket)
    assert _read_hist(store) == before_h
    after_d = sorted(
        tuple(r) for r in store.drift(_df(spark, DAY3), "gk", "v").collect()
    )
    assert after_d == before_d
    store.absorb(_df(spark, DAY3), "gk", "v")
    assert _read_hist(store) == _hist_model(DAY1 + DAY2 + DAY3)


def test_hist_foreach_batch_streaming(spark, tmp_path):
    """The foreachBatch twin: two micro-batches absorb exactly-once
    and emit the committed drift rows."""
    src = str(tmp_path / "src")
    for i, day in enumerate((DAY1, DAY2)):
        _df(spark, day).coalesce(1).write.parquet(f"{src}/f{i}")
    store = _mk(spark, tmp_path, "s")
    got = []
    fn = store.foreach_batch(
        "gk", "v", lambda df, bid: got.append((bid, df.count()))
    )
    q = (
        spark.readStream.schema(SCHEMA.replace(",", " ,"))
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert _read_hist(store) == _hist_model(DAY1 + DAY2)
    assert len(got) == 2 and all(n > 0 for _, n in got)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(min_value=0, max_value=30),
)
def test_hist_store_property(spark, tmp_path_factory, rows, cut):
    """Any split of the stream into two absorbs yields the one-shot
    histogram of the concatenation, and the drift read matches the
    pure-Python model."""
    cut = min(cut, len(rows))
    a, b = rows[:cut], rows[cut:]
    tmp = tmp_path_factory.mktemp("histprop")
    store = HistogramStore(
        spark, str(tmp / "h"), bucket_width=W, n_buckets=NB
    )
    if a:
        store.absorb(_df(spark, a), "gk", "v")
    if b:
        store.absorb(_df(spark, b), "gk", "v")
    assert _read_hist(store) == _hist_model(rows)
    probe = [("a", 5), ("a", 50), ("z", 1)]
    got = {
        r.gk: (r.n_hist, r.n_inc, r.l1_x1e6)
        for r in store.drift(_df(spark, probe), "gk", "v").collect()
    }
    assert got == _drift_model(rows, probe)


# -- retain_recent (the shared retention-horizon primitive) -------------------

def test_retain_recent_first_seen_expiry(spark, tmp_path):
    """FingerprintStore cut to a 1-commit horizon keeps exactly the
    fingerprints FIRST SEEN in the newest commit: day-2
    re-presentations of day-1 content age out with day 1, and a day-3
    probe treats expired content as fresh again."""
    from time_series_storage_spark.operators.dedup import (
        FingerprintStore,
        normalized_fingerprint,
    )

    store = FingerprintStore(spark, str(tmp_path / "fpr"))
    d1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    d2 = spark.createDataFrame(
        [(3, "alpha"), (4, "gamma")], "doc_id long, text string"
    )
    store.absorb(d1, "doc_id", "text")
    store.absorb(d2, "doc_id", "text")
    assert store.seen().count() == 3  # alpha, beta, gamma
    store.retain_recent(1)
    kept = {r.fp for r in store.seen().collect()}
    gamma_fp = d2.select(
        normalized_fingerprint("text").alias("f")
    ).collect()[1].f
    assert kept == {gamma_fp}  # only day-2-FIRST-SEEN survives
    # day-3 probe: alpha (expired) is fresh again; gamma still dup
    d3 = spark.createDataFrame(
        [(5, "alpha"), (6, "gamma")], "doc_id long, text string"
    )
    surv = {r.doc_id for r in
            store.dedup_increment(d3, "doc_id", "text").collect()}
    assert surv == {5}


def test_retain_recent_counts_rewrites_as_one_commit(spark, tmp_path):
    """A retention rewrite consolidates survivors into one version
    that counts as ONE commit toward later horizons (log-compaction
    semantics); absorb-after-retention then probes retained + new."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fpl"))
    for i, txt in enumerate(("a", "b", "c")):
        store.absorb(
            spark.createDataFrame(
                [(i, txt)], "doc_id long, text string"
            ),
            "doc_id",
            "text",
        )
    store.retain_recent(2)  # keeps b, c — consolidated as ONE commit
    assert store.seen().count() == 2
    store.absorb(
        spark.createDataFrame([(9, "d")], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    # horizon 2 now = {consolidated(b,c)} + {d}
    store.retain_recent(2)
    assert store.seen().count() == 3
    # ...and that retention consolidated all three into one commit, so
    # a horizon of 1 keeps them until a NEW absorb ages them together
    store.retain_recent(1)
    assert store.seen().count() == 3
    store.absorb(
        spark.createDataFrame([(10, "e")], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    store.retain_recent(1)  # newest commit = {e} alone
    assert store.seen().count() == 1


def test_retain_recent_validates_and_watermark_survives(spark, tmp_path):
    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fpw"))
    with pytest.raises(ValueError, match="k_commits"):
        store.retain_recent(0)
    store.absorb(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        "doc_id", "text", batch_id=0,
    )
    store.retain_recent(1)
    # the batch watermark survives the rewrite: replaying batch 0
    # returns empty (already absorbed), never a re-absorb
    out = store.absorb(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        "doc_id", "text", batch_id=0,
    )
    assert out.count() == 0
    assert store.seen().count() == 1


def test_retain_recent_cross_family_histogram(spark, tmp_path):
    """retain_recent lives on the shared base: an ADDITIVE store
    (HistogramStore) cut to a 1-commit horizon keeps only the newest
    commit's counts — the drift baseline follows the recent corpus."""
    store = _mk(spark, tmp_path, "rr")
    store.absorb(_df(spark, DAY1), "gk", "v")
    store.absorb(_df(spark, DAY2), "gk", "v")
    store.retain_recent(1)
    assert _read_hist(store) == _hist_model(DAY2)
    # drift probe now measures against DAY2 only
    got = {
        r.gk: (r.n_hist, r.n_inc, r.l1_x1e6)
        for r in store.drift(_df(spark, DAY3), "gk", "v").collect()
    }
    assert got == _drift_model(DAY2, DAY3)
