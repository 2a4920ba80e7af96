"""KmvSketchStore (operators/sketch_store.py) — the persisted
incremental distinct-count sketch, the KEEP-MIN-merge member of the
snapshot store family.

The driver-level oracle row is distinct_incremental
(queries_extensions.py), whose SQL recomputes the sketch from scratch
over the full corpus; these tests pin what that oracle can't see: the
keep-min merge property (absorb in any split = one-shot sketch on the
concatenation), the emission contract (post-merge estimates for
exactly the touched keys), prune() semantics (state shrinks to k rows
per key; prune-then-absorb == absorb), exactly-once batch replay,
per-stage commit-crash replay through the shared
_SnapshotArtifactStore seam, reopen/format/params pinning, and the
streaming foreachBatch twin.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3) — training-data-pipeline accounting in daily-ingest form.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.sketch_store import KmvSketchStore

SCHEMA = "gk string, e string"
K = 5  # tiny sketch so the estimator path exercises with small data


def _h(e: str) -> int:
    return int(hashlib.md5(e.encode()).hexdigest()[:12], 16)


def _model(rows, k=K):
    """Pure-Python sketch: {key: sorted k smallest distinct hashes}."""
    by_key: dict[str, set] = {}
    for gk, e in rows:
        by_key.setdefault(gk, set()).add(_h(e))
    return {gk: sorted(hs)[:k] for gk, hs in by_key.items()}


def _est(mins, k=K):
    n = len(mins)
    kth = max(mins)
    if n < k:
        return (n, kth, n)
    m = 1 << 48
    return (n, kth, (k - 1) * (m // kth) + ((k - 1) * (m % kth)) // kth)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_minima(store):
    return {
        gk: sorted(r.h for r in rows)
        for gk, rows in __import__("itertools").groupby(
            sorted(store.minima().collect(), key=lambda r: r.gk),
            key=lambda r: r.gk,
        )
    }


def _read_est(store):
    return {
        r.gk: (r.n_mins, r.kth_min, r.est_distinct)
        for r in store.estimates().collect()
    }


DAY1 = [("a", f"x{i}") for i in range(8)] + [("b", "only"), ("b", "only")]
DAY2 = (
    [("a", f"x{i}") for i in range(4, 12)]  # overlaps day1
    + [("b", "two"), ("c", "fresh")]
)


def test_kmv_keep_min_merge(spark, tmp_path):
    """absorb(day1); absorb(day2) == one-shot sketch on day1+day2,
    key by key, hash by hash."""
    split = KmvSketchStore(spark, str(tmp_path / "a"), k=K)
    split.absorb(_df(spark, DAY1), "gk", "e")
    split.absorb(_df(spark, DAY2), "gk", "e")
    assert _read_minima(split) == _model(DAY1 + DAY2)
    assert _read_est(split) == {
        gk: _est(m) for gk, m in _model(DAY1 + DAY2).items()
    }


def test_kmv_emission_touched_keys_post_merge(spark, tmp_path):
    """absorb emits POST-merge estimates for exactly the increment's
    keys: day2 touches a/b/c, so the emission carries the merged
    day1+day2 state for those keys (here: all three)."""
    store = KmvSketchStore(spark, str(tmp_path / "e"), k=K)
    store.absorb(_df(spark, DAY1), "gk", "e")
    out = store.absorb(_df(spark, [("a", "x999"), ("c", "new")]), "gk", "e")
    got = {r.gk: (r.n_mins, r.kth_min, r.est_distinct) for r in out.collect()}
    merged = _model(DAY1 + [("a", "x999"), ("c", "new")])
    assert set(got) == {"a", "c"}  # b untouched -> not emitted
    assert got == {gk: _est(merged[gk]) for gk in ("a", "c")}


def test_kmv_replay_exactly_once(spark, tmp_path):
    """Re-absorbing a committed batch_id returns the committed
    emission without re-appending minima; an older batch_id returns
    empty."""
    store = KmvSketchStore(spark, str(tmp_path / "r"), k=K)
    store.absorb(_df(spark, DAY1), "gk", "e", batch_id=0)
    first = sorted(
        (r.gk, r.n_mins, r.kth_min, r.est_distinct)
        for r in store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
        .collect()
    )
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        (r.gk, r.n_mins, r.kth_min, r.est_distinct)
        for r in store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
        .collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before
    assert (
        store.absorb(_df(spark, DAY1), "gk", "e", batch_id=0).count() == 0
    )


def test_kmv_reopen_and_pins(spark, tmp_path):
    """Reopen serves the same sketch; format + k-params pinned; a
    different k on the same path is rejected loudly."""
    p = str(tmp_path / "o")
    store = KmvSketchStore(spark, p, k=K)
    store.absorb(_df(spark, DAY1), "gk", "e")
    mins = _read_minima(store)
    again = KmvSketchStore(spark, p, k=K)
    assert _read_minima(again) == mins
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == KmvSketchStore.FORMAT
    assert meta["params"] == [f"kmv-v1:k={K}"]
    with pytest.raises(ValueError, match="params"):
        KmvSketchStore(spark, p, k=K + 1)


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_kmv_commit_crash_replay_exactly_once(spark, tmp_path, stage):
    """Per-stage crash inside the shared snapshot commit leaves the
    sketch on the old version; the retry under the same batch_id
    converges to the merged state with no stray staging dirs."""
    store = KmvSketchStore(spark, str(tmp_path / "c"), k=K)
    store.absorb(_df(spark, DAY1), "gk", "e", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read_minima(store) == _model(DAY1)

    store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
    assert _read_minima(store) == _model(DAY1 + DAY2)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_kmv_prune_is_semantically_invisible(spark, tmp_path):
    """prune() shrinks the persisted minima table to exactly k rows
    per key while estimates stay identical, and a post-prune absorb
    equals the never-pruned twin (dominated candidates can never
    re-enter a selection)."""
    pruned = KmvSketchStore(spark, str(tmp_path / "p"), k=K)
    plain = KmvSketchStore(spark, str(tmp_path / "q"), k=K)
    for s in (pruned, plain):
        s.absorb(_df(spark, DAY1), "gk", "e")
        s.absorb(_df(spark, DAY2), "gk", "e")
    before = _read_est(pruned)
    assert pruned.prune() > 0
    assert _read_est(pruned) == before
    raw = pruned._table("min", "gk string, h long")
    per_key = {
        r.gk: r.n
        for r in raw.groupBy("gk").count().withColumnRenamed("count", "n")
        .collect()
    }
    assert all(n <= K for n in per_key.values())
    day3 = [("a", "zz1"), ("c", "zz2"), ("d", "brand-new")]
    pruned.absorb(_df(spark, day3), "gk", "e")
    plain.absorb(_df(spark, day3), "gk", "e")
    assert _read_minima(pruned) == _read_minima(plain)
    assert _read_est(pruned) == _read_est(plain)


def test_kmv_foreach_batch_streaming(spark, tmp_path):
    """File-stream twin: micro-batches merge exactly once through
    foreachBatch; emissions carry post-merge touched-key estimates and
    the final store equals the one-shot sketch on everything."""
    store = KmvSketchStore(spark, str(tmp_path / "s"), k=K)
    store.absorb(_df(spark, DAY1), "gk", "e")

    b0 = [("a", "s0"), ("c", "s1")]
    b1 = [("b", "s2"), ("c", "s3")]
    src = str(tmp_path / "feed")
    _df(spark, b0).coalesce(1).write.parquet(src + "/f0")
    _df(spark, b1).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {
            r.gk: (r.n_mins, r.kth_min, r.est_distinct)
            for r in df.collect()
        }

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(store.foreach_batch("gk", "e", emit))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(emitted) == 2
    assert _read_minima(store) == _model(DAY1 + b0 + b1)
    # every emission row equals the pure-Python post-merge estimate of
    # some prefix ordering; the final state check above pins the union,
    # and each batch emitted only its own keys
    keysets = sorted(frozenset(v) for v in emitted.values())
    assert keysets == sorted(
        [frozenset({"a", "c"}), frozenset({"b", "c"})]
    )


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.text("abcdef", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(min_value=0, max_value=30),
)
def test_kmv_store_property(spark, tmp_path_factory, rows, cut):
    """Property: any corpus, any split point — two absorbs equal the
    one-shot pure-Python sketch on the concatenation, minima and
    estimates both."""
    cut = min(cut, len(rows))
    d1, d2 = rows[:cut], rows[cut:]
    root = str(tmp_path_factory.mktemp("kmv"))
    store = KmvSketchStore(spark, root, k=K)
    if d1:
        store.absorb(_df(spark, d1), "gk", "e")
    if d2:
        store.absorb(_df(spark, d2), "gk", "e")
    assert _read_minima(store) == _model(rows)
    assert _read_est(store) == {
        gk: _est(m) for gk, m in _model(rows).items()
    }
