"""Count-Min sketch (operators/cms.py) + CmsStore
(operators/cms_store.py) — frequency sketching with the one-sided
error guarantee, and its additive-merge incremental store.

The driver-level oracle rows are cms_heavy_hitters / cms_incremental
(queries_extensions.py), whose SQL recomputes counters and estimates
from scratch; these tests pin what that oracle can't see: the
OVERESTIMATE-ONLY guarantee (est >= true for every element, always),
exactness when nothing collides, the no-false-negative heavy-hitter
selection, the additive merge property (absorb in any split = one-shot
sketch on the concatenation, exactly), emission contract, exactly-once
batch replay, per-stage commit-crash replay through the shared
_SnapshotArtifactStore seam, reopen/format/params pinning, and the
streaming foreachBatch twin.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3) — training-data-pipeline accounting in daily-ingest form.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.cms import (
    CMS_D,
    CMS_W,
    cms_counters,
    cms_estimate,
)
from time_series_storage_spark.operators.cms_store import CmsStore

SCHEMA = "e string"


def _bucket(i: int, e: str, w: int = CMS_W) -> int:
    return int(hashlib.md5(f"{i}:{e}".encode()).hexdigest()[:12], 16) % w


def _model_counters(elems, d=CMS_D, w=CMS_W):
    cnt: Counter = Counter()
    for e in elems:
        for i in range(d):
            cnt[(i, _bucket(i, e, w))] += 1
    return dict(cnt)


def _model_est(counters, e, d=CMS_D, w=CMS_W):
    return min(counters.get((i, _bucket(i, e, w)), 0) for i in range(d))


def _df(spark, elems):
    return spark.createDataFrame([(e,) for e in elems], SCHEMA)


def _read_counters(store):
    return {(r.i, r.b): r.c for r in store.counters().collect()}


ELEMS = (
    ["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5 + ["durian"]
    + [f"tail{i}" for i in range(30)]
)


def test_cms_counters_match_model(spark):
    got = {
        (r.i, r.b): r.c
        for r in cms_counters(_df(spark, ELEMS), "e").collect()
    }
    assert got == _model_counters(ELEMS)


def test_cms_overestimate_only_and_exact_without_collision(spark):
    """est >= true for EVERY element (the structural guarantee); with
    this tiny vocabulary over 512 buckets nothing collides in all 4
    rows, so estimates are exactly the true counts."""
    true = Counter(ELEMS)
    counters = cms_counters(_df(spark, ELEMS), "e")
    probes = _df(spark, sorted(true))
    got = {
        r.e: r.est_cnt
        for r in cms_estimate(counters, probes, "e").collect()
    }
    assert all(got[e] >= c for e, c in true.items())
    model = _model_counters(ELEMS)
    assert got == {e: _model_est(model, e) for e in true}


def test_cms_overestimate_under_forced_collisions(spark):
    """With w=2 everything collides: estimates still never undercount,
    and match the pure-Python model exactly."""
    true = Counter(ELEMS)
    counters = cms_counters(_df(spark, ELEMS), "e", d=2, w=2)
    probes = _df(spark, sorted(true))
    got = {
        r.e: r.est_cnt
        for r in cms_estimate(counters, probes, "e", d=2, w=2).collect()
    }
    model = _model_counters(ELEMS, d=2, w=2)
    assert got == {e: _model_est(model, e, d=2, w=2) for e in true}
    assert all(got[e] >= c for e, c in true.items())
    assert any(got[e] > c for e, c in true.items())  # collisions real


def test_cms_heavy_hitters_no_false_negatives(spark):
    """Sketch-side selection keeps every TRUE heavy hitter: any
    element with true share >= threshold has est >= true, so it
    passes the sketch threshold too — even under forced collisions."""
    n = len(ELEMS)
    true = Counter(ELEMS)
    for d, w in ((CMS_D, CMS_W), (2, 2)):
        counters = cms_counters(_df(spark, ELEMS), "e", d=d, w=w)
        est = {
            r.e: r.est_cnt
            for r in cms_estimate(
                counters, _df(spark, sorted(true)), "e", d=d, w=w
            ).collect()
        }
        kept = {e for e, v in est.items() if v * 100 >= n * 10}
        truly_heavy = {e for e, c in true.items() if c * 100 >= n * 10}
        assert truly_heavy <= kept


def test_cms_store_additive_merge(spark, tmp_path):
    """absorb(day1); absorb(day2) == one-shot sketch on day1+day2 —
    counters exactly equal (addition is exact, not approximate)."""
    store = CmsStore(spark, str(tmp_path / "a"))
    store.absorb(_df(spark, ELEMS[:40]), "e")
    store.absorb(_df(spark, ELEMS[40:]), "e")
    assert _read_counters(store) == _model_counters(ELEMS)


def test_cms_store_emission_touched_post_merge(spark, tmp_path):
    """absorb emits POST-merge estimates for exactly the increment's
    distinct elements."""
    store = CmsStore(spark, str(tmp_path / "e"))
    store.absorb(_df(spark, ELEMS), "e")
    out = store.absorb(_df(spark, ["apple", "apple", "newone"]), "e")
    got = {r.e: r.est_cnt for r in out.collect()}
    model = _model_counters(ELEMS + ["apple", "apple", "newone"])
    assert set(got) == {"apple", "newone"}
    assert got == {e: _model_est(model, e) for e in ("apple", "newone")}


def test_cms_store_replay_exactly_once(spark, tmp_path):
    store = CmsStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, ELEMS[:40]), "e", batch_id=0)
    first = sorted(
        (r.e, r.est_cnt)
        for r in store.absorb(_df(spark, ELEMS[40:]), "e", batch_id=1)
        .collect()
    )
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        (r.e, r.est_cnt)
        for r in store.absorb(_df(spark, ELEMS[40:]), "e", batch_id=1)
        .collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before
    # double-absorb would have doubled counters; replay did not
    assert _read_counters(store) == _model_counters(ELEMS)
    assert store.absorb(_df(spark, ELEMS[:1]), "e", batch_id=0).count() == 0


def test_cms_store_reopen_and_pins(spark, tmp_path):
    p = str(tmp_path / "o")
    store = CmsStore(spark, p)
    store.absorb(_df(spark, ELEMS), "e")
    cnt = _read_counters(store)
    again = CmsStore(spark, p)
    assert _read_counters(again) == cnt
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == CmsStore.FORMAT
    assert meta["params"] == [f"cms-v1:d={CMS_D}:w={CMS_W}"]
    with pytest.raises(ValueError, match="params"):
        CmsStore(spark, p, d=2, w=2)


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_cms_store_commit_crash_replay(spark, tmp_path, stage):
    """Per-stage crash leaves the sketch on the old version (no
    half-added counts — the additive store's torn-commit hazard);
    retry under the same batch_id converges exactly."""
    store = CmsStore(spark, str(tmp_path / "c"))
    store.absorb(_df(spark, ELEMS[:40]), "e", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, ELEMS[40:]), "e", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read_counters(store) == _model_counters(ELEMS[:40])

    store.absorb(_df(spark, ELEMS[40:]), "e", batch_id=1)
    assert _read_counters(store) == _model_counters(ELEMS)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_cms_store_foreach_batch_streaming(spark, tmp_path):
    """File-stream twin: micro-batches add exactly once; the final
    sketch equals the one-shot sketch on everything."""
    store = CmsStore(spark, str(tmp_path / "s"))
    store.absorb(_df(spark, ELEMS), "e")

    b0 = ["apple", "s0"]
    b1 = ["banana", "s1", "s1"]
    src = str(tmp_path / "feed")
    _df(spark, b0).coalesce(1).write.parquet(src + "/f0")
    _df(spark, b1).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {r.e: r.est_cnt for r in df.collect()}

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(store.foreach_batch("e", emit))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(emitted) == 2
    assert _read_counters(store) == _model_counters(ELEMS + b0 + b1)
    keysets = sorted(frozenset(v) for v in emitted.values())
    assert keysets == sorted(
        [frozenset({"apple", "s0"}), frozenset({"banana", "s1"})]
    )


@settings(max_examples=8, deadline=None)
@given(
    elems=st.lists(
        st.text("abc", min_size=1, max_size=2), min_size=1, max_size=30
    ),
    cut=st.integers(min_value=0, max_value=30),
)
def test_cms_store_property(spark, tmp_path_factory, elems, cut):
    """Property: any corpus, any split point — two absorbs equal the
    one-shot pure-Python sketch, counters and estimates both."""
    cut = min(cut, len(elems))
    d1, d2 = elems[:cut], elems[cut:]
    root = str(tmp_path_factory.mktemp("cms"))
    store = CmsStore(spark, root)
    if d1:
        store.absorb(_df(spark, d1), "e")
    if d2:
        store.absorb(_df(spark, d2), "e")
    assert _read_counters(store) == _model_counters(elems)
    model = _model_counters(elems)
    got = {
        r.e: r.est_cnt
        for r in store.estimate(
            _df(spark, sorted(set(elems))), "e"
        ).collect()
    }
    assert got == {e: _model_est(model, e) for e in set(elems)}


def test_cms_join_estimate_overestimates_and_exact_when_sparse(spark):
    """Inner-product join estimate: >= the true join size always
    (collision cross terms are non-negative), and EXACTLY the true
    size when the key sets are too small to collide."""
    from time_series_storage_spark.operators.cms import (
        cms_counters,
        cms_join_estimate,
    )

    # A has keys k0 x3, k1 x2; B has k0 x2, k2 x5 -> true join = 3*2
    a = _df(spark, ["k0"] * 3 + ["k1"] * 2)
    b = _df(spark, ["k0"] * 2 + ["k2"] * 5)
    est = cms_join_estimate(
        cms_counters(a, "e"), cms_counters(b, "e")
    ).collect()[0].est_join
    assert est == 6  # no collisions at w=512 with 3 keys

    # forced collisions at w=2: still never an undercount
    est2 = cms_join_estimate(
        cms_counters(a, "e", d=2, w=2), cms_counters(b, "e", d=2, w=2), d=2
    ).collect()[0].est_join
    assert est2 >= 6


def test_cms_join_estimate_disjoint_keys(spark):
    """Disjoint key sets at full width: estimate is 0 (no shared
    buckets in at least one row, min picks it)... at w=512 with 4
    distinct keys no row collides, so every row's inner product is 0."""
    from time_series_storage_spark.operators.cms import (
        cms_counters,
        cms_join_estimate,
    )

    a = _df(spark, ["x1", "x2"])
    b = _df(spark, ["y1", "y2"])
    est = cms_join_estimate(
        cms_counters(a, "e"), cms_counters(b, "e")
    ).collect()[0].est_join
    assert est == 0
