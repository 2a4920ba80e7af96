"""HyperLogLog sketch (operators/hll.py) + HllSketchStore
(operators/hll_store.py) — the MAX-merge member of the snapshot store
family.

The driver-level oracle rows are hll_distinct_by_lang /
hll_distinct_incremental (queries_extensions.py), whose SQL recomputes
registers AND the exact-integer estimator from scratch; these tests
pin what that oracle can't see: the max-merge property (absorb in any
split = one-shot sketch on the concatenation), merge IDEMPOTENCE
(re-absorbing identical data is a no-op by algebra — the property
unique to max among the store disciplines), the estimator's two
branches against a pure-Python model (linear-counting small-range and
the alpha_256 raw branch), accuracy against true cardinalities,
emission contract, prune() semantics, exactly-once batch replay,
per-stage commit-crash replay through the shared
_SnapshotArtifactStore seam, reopen/format pinning, and the streaming
foreachBatch twin.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3) — training-data-pipeline accounting in daily-ingest form.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.hll import (
    ALPHA_X1E4,
    HLL_M,
    HLL_RHO_BITS,
    HLL_RHO_MAX,
    LC_TABLE,
    LC_THRESHOLD,
    hll_distinct,
)
from time_series_storage_spark.operators.hll_store import HllSketchStore

SCHEMA = "gk string, e string"


def _regs(elems):
    """Pure-Python register model: {r: rho}."""
    regs: dict[int, int] = {}
    for e in elems:
        h = int(hashlib.md5(e.encode()).hexdigest()[:12], 16)
        r = h >> HLL_RHO_BITS
        s = h & ((1 << HLL_RHO_BITS) - 1)
        rho = HLL_RHO_MAX if s == 0 else HLL_RHO_MAX - s.bit_length()
        regs[r] = max(regs.get(r, 0), rho)
    return regs


def _est(regs):
    """Pure-Python estimator: (n_regs, harm_num, v_zero, est)."""
    n = len(regs)
    v = HLL_M - n
    harm = sum(1 << (HLL_RHO_MAX - rho) for rho in regs.values()) + (
        v << HLL_RHO_MAX
    )
    raw = (ALPHA_X1E4 * ((1 << 57) // harm)) // 10_000
    est = LC_TABLE[v - 1] if (raw <= LC_THRESHOLD and v > 0) else raw
    return (n, harm, v, est)


def _model(rows):
    by_key: dict[str, list] = {}
    for gk, e in rows:
        by_key.setdefault(gk, []).append(e)
    return {gk: _est(_regs(es)) for gk, es in by_key.items()}


def _model_regs(rows):
    by_key: dict[str, list] = {}
    for gk, e in rows:
        by_key.setdefault(gk, []).append(e)
    return {gk: _regs(es) for gk, es in by_key.items()}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read_regs(store):
    out: dict[str, dict] = {}
    for r in store.registers().collect():
        out.setdefault(r.gk, {})[r.r] = r.rho
    return out


def _read_est(store):
    return {
        r.gk: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in store.estimates().collect()
    }


DAY1 = [("a", f"x{i}") for i in range(8)] + [("b", "only"), ("b", "only")]
DAY2 = (
    [("a", f"x{i}") for i in range(4, 12)]  # overlaps day1
    + [("b", "two"), ("c", "fresh")]
)


def test_hll_batch_matches_model_both_branches(spark):
    """hll_distinct == the pure-Python model, with the small group on
    the linear-counting branch and the 40k group on the alpha raw
    branch (both branches must actually execute)."""
    rows = [("small", f"s{i}") for i in range(40)] + [
        ("big", f"b{i}") for i in range(40_000)
    ]
    got = {
        r.gk: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in hll_distinct(_df(spark, rows), ["gk"], "e").collect()
    }
    assert got == _model(rows)
    # branch coverage: small has zero registers (LC), big saturates
    assert got["small"][2] > 0 and got["small"][3] <= LC_THRESHOLD
    assert got["big"][3] > LC_THRESHOLD


def test_hll_accuracy_band(spark):
    """Estimates land inside ~4 standard errors (1.04/sqrt(256) ~ 6.5%
    per sigma -> 26% hard bound; observed errors are far smaller) for
    cardinalities across both estimator branches."""
    for n in (100, 1_000, 5_000, 40_000):
        rows = [("g", f"n{n}-e{i}") for i in range(n)]
        est = _model(rows)["g"][3]
        assert abs(est - n) / n < 0.26, (n, est)
        got = hll_distinct(_df(spark, rows), ["gk"], "e").collect()[0]
        assert got.est_distinct == est


def test_hll_max_merge(spark, tmp_path):
    """absorb(day1); absorb(day2) == one-shot sketch on day1+day2,
    registers and estimates both."""
    store = HllSketchStore(spark, str(tmp_path / "a"))
    store.absorb(_df(spark, DAY1), "gk", "e")
    store.absorb(_df(spark, DAY2), "gk", "e")
    assert _read_regs(store) == _model_regs(DAY1 + DAY2)
    assert _read_est(store) == _model(DAY1 + DAY2)


def test_hll_merge_idempotent(spark, tmp_path):
    """Absorbing the SAME data twice (fresh batch ids) leaves merged
    registers and estimates unchanged — max(a, a) = a at the algebra
    level, the discipline's distinguishing property."""
    store = HllSketchStore(spark, str(tmp_path / "i"))
    store.absorb(_df(spark, DAY1), "gk", "e")
    before_regs, before_est = _read_regs(store), _read_est(store)
    store.absorb(_df(spark, DAY1), "gk", "e")  # same rows, new batch
    assert _read_regs(store) == before_regs
    assert _read_est(store) == before_est


def test_hll_emission_touched_keys_post_merge(spark, tmp_path):
    """absorb emits POST-merge estimates for exactly the increment's
    keys."""
    store = HllSketchStore(spark, str(tmp_path / "e"))
    store.absorb(_df(spark, DAY1), "gk", "e")
    out = store.absorb(_df(spark, [("a", "x999"), ("c", "new")]), "gk", "e")
    got = {
        r.gk: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in out.collect()
    }
    merged = _model(DAY1 + [("a", "x999"), ("c", "new")])
    assert set(got) == {"a", "c"}  # b untouched -> not emitted
    assert got == {gk: merged[gk] for gk in ("a", "c")}


def test_hll_replay_exactly_once(spark, tmp_path):
    """Re-absorbing a committed batch_id returns the committed
    emission without re-appending registers; an older batch_id returns
    empty."""
    store = HllSketchStore(spark, str(tmp_path / "r"))
    store.absorb(_df(spark, DAY1), "gk", "e", batch_id=0)
    first = sorted(
        (r.gk, r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
        .collect()
    )
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        (r.gk, r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
        .collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before
    assert (
        store.absorb(_df(spark, DAY1), "gk", "e", batch_id=0).count() == 0
    )


def test_hll_reopen_and_pins(spark, tmp_path):
    """Reopen serves the same sketch; format + params pinned."""
    p = str(tmp_path / "o")
    store = HllSketchStore(spark, p)
    store.absorb(_df(spark, DAY1), "gk", "e")
    regs = _read_regs(store)
    again = HllSketchStore(spark, p)
    assert _read_regs(again) == regs
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == HllSketchStore.FORMAT
    assert meta["params"] == ["hll-v1:p=8"]


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_hll_commit_crash_replay_exactly_once(spark, tmp_path, stage):
    """Per-stage crash inside the shared snapshot commit leaves the
    sketch on the old version; the retry under the same batch_id
    converges to the merged state with no stray staging dirs."""
    store = HllSketchStore(spark, str(tmp_path / "c"))
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
    assert _read_regs(store) == _model_regs(DAY1)

    store.absorb(_df(spark, DAY2), "gk", "e", batch_id=1)
    assert _read_regs(store) == _model_regs(DAY1 + DAY2)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_hll_prune_is_semantically_invisible(spark, tmp_path):
    """prune() shrinks the persisted register table to the current
    per-(key, register) max while estimates stay identical, and a
    post-prune absorb equals the never-pruned twin."""
    pruned = HllSketchStore(spark, str(tmp_path / "p"))
    plain = HllSketchStore(spark, str(tmp_path / "q"))
    for s in (pruned, plain):
        s.absorb(_df(spark, DAY1), "gk", "e")
        s.absorb(_df(spark, DAY2), "gk", "e")
    before = _read_est(pruned)
    assert pruned.prune() > 0
    assert _read_est(pruned) == before
    raw = pruned._table("reg", "gk string, r int, rho int")
    dup = (
        raw.groupBy("gk", "r").count().where("count > 1").count()
    )
    assert dup == 0  # state at its semantic floor: one row per (gk, r)
    day3 = [("a", "zz1"), ("c", "zz2"), ("d", "brand-new")]
    pruned.absorb(_df(spark, day3), "gk", "e")
    plain.absorb(_df(spark, day3), "gk", "e")
    assert _read_regs(pruned) == _read_regs(plain)
    assert _read_est(pruned) == _read_est(plain)


def test_hll_foreach_batch_streaming(spark, tmp_path):
    """File-stream twin: micro-batches merge exactly once through
    foreachBatch; emissions carry post-merge touched-key estimates and
    the final store equals the one-shot sketch on everything."""
    store = HllSketchStore(spark, str(tmp_path / "s"))
    store.absorb(_df(spark, DAY1), "gk", "e")

    b0 = [("a", "s0"), ("c", "s1")]
    b1 = [("b", "s2"), ("c", "s3")]
    src = str(tmp_path / "feed")
    _df(spark, b0).coalesce(1).write.parquet(src + "/f0")
    _df(spark, b1).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {r.gk: r.est_distinct for r in df.collect()}

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
    assert _read_regs(store) == _model_regs(DAY1 + b0 + b1)
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
def test_hll_store_property(spark, tmp_path_factory, rows, cut):
    """Property: any corpus, any split point — two absorbs equal the
    one-shot pure-Python sketch on the concatenation, registers and
    estimates both."""
    cut = min(cut, len(rows))
    d1, d2 = rows[:cut], rows[cut:]
    root = str(tmp_path_factory.mktemp("hll"))
    store = HllSketchStore(spark, root)
    if d1:
        store.absorb(_df(spark, d1), "gk", "e")
    if d2:
        store.absorb(_df(spark, d2), "gk", "e")
    assert _read_regs(store) == _model_regs(rows)
    assert _read_est(store) == _model(rows)


def test_hll_rolling_equals_oneshot_per_window(spark):
    """Rolling in-plan merge == one-shot sketch of each trailing
    window's elements (max-merge algebra), on synthetic multi-day
    traffic with gaps."""
    import datetime as dt

    from time_series_storage_spark.operators.hll import (
        hll_distinct,
        hll_rolling_estimate,
    )

    rows = []
    days = [0, 1, 2, 5, 9]  # gaps on purpose: range frame, not rows
    by_day = {}
    for d in days:
        elems = [f"u{d}-{i}" for i in range(3 + d)] + ["shared"]
        by_day[d] = elems
        for i, e in enumerate(elems):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=d, seconds=i)
            rows.append(("g", ts, e))
    df = spark.createDataFrame(rows, "gk string, ts timestamp, e string")
    got = {
        r.bucket_idx: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in hll_rolling_estimate(
            df, ["gk"], "e", "ts", 86_400, window_buckets=3
        ).collect()
    }
    base = min(got)  # epoch-day of day 0
    for d in days:
        win = [
            e for dd in days if d - 2 <= dd <= d for e in by_day[dd]
        ]
        wdf = spark.createDataFrame([("g", e) for e in win], "gk string, e string")
        want = hll_distinct(wdf, ["gk"], "e").collect()[0]
        assert got[base + d] == (
            want.n_regs, want.harm_num, want.v_zero, want.est_distinct
        ), d


def test_hll_time_travel_as_of(spark, tmp_path):
    """Every retained snapshot is an independently readable
    point-in-time image: estimates_as_of(v_i) equals a twin store
    stopped after i absorbs, later absorbs and prune() stay invisible,
    and a vacuumed version raises loudly instead of serving the wrong
    snapshot."""
    days = [DAY1, DAY2, [("a", "zzz"), ("d", "late")]]
    store = HllSketchStore(spark, str(tmp_path / "t"))
    for d in days:
        store.absorb(_df(spark, d), "gk", "e")
    versions = store.snapshot_versions()
    assert len(versions) == 3

    for i, v in enumerate(versions, start=1):
        got = {
            r.gk: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
            for r in store.estimates_as_of(v).collect()
        }
        assert got == _model(sum(days[:i], [])), v

    # prune rewrites the CURRENT snapshot; older versions still serve
    store.prune()
    v2 = versions[1]
    got2 = {
        r.gk: (r.n_regs, r.harm_num, r.v_zero, r.est_distinct)
        for r in store.estimates_as_of(v2).collect()
    }
    assert got2 == _model(days[0] + days[1])

    # vacuum trims the tail; reading a vacuumed version is a loud error
    store.vacuum(keep=1)
    with pytest.raises(ValueError, match="not retained"):
        store.registers_as_of(versions[0]).collect()


def test_hll_union_algebra_matches_oneshot(spark):
    """Register-wise max of two groups' sketches == the sketch of the
    concatenated elements (union algebra is exact at the sketch
    level), and the inclusion-exclusion intersection estimate tracks
    the true overlap on a controlled corpus."""
    a = [f"shared{i}" for i in range(300)] + [f"a{i}" for i in range(700)]
    b = [f"shared{i}" for i in range(300)] + [f"b{i}" for i in range(700)]
    union_model = _est(_regs(a + b))
    ra, rb = _regs(a), _regs(b)
    merged = {
        r: max(ra.get(r, 0), rb.get(r, 0)) for r in set(ra) | set(rb)
    }
    assert _est(merged) == union_model  # exact sketch algebra
    est_a, est_b = _est(ra)[3], _est(rb)[3]
    inter = est_a + est_b - union_model[3]
    assert abs(inter - 300) / 300 < 0.5  # overlap recovered to sketch error
