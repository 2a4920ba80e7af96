"""ReservoirStore (operators/reservoir_store.py) — the derandomized
fixed-k uniform reservoir as a keep-min snapshot store.

The driver-level oracle rows are sample_reservoir_members /
reservoir_incremental / reservoir_as_of (queries_extensions.py), whose
SQL recomputes the bottom-k-by-md5 sample from scratch; these tests
pin what that oracle can't see: the MERGE property (absorb in any
split = the one-shot reservoir on the concatenation, exactly — any
slicing, any order), idempotence (re-offering rows is a no-op by
algebra), prune-then-absorb == absorb, the monotone-threshold
property (kth_rank never increases as more rows are offered), the
emission contract, exactly-once batch replay, per-stage commit-crash
replay through the shared _SnapshotArtifactStore seam,
reopen/params pinning, time travel, and the streaming foreachBatch
twin.

Reference scope: the reference engine has no sampling surface
(SURVEY.md section 2.3).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from time_series_storage_spark.operators.reservoir_store import (
    ReservoirStore,
)

SCHEMA = "k string, id long, v long"
K = 4


def _rank(i: int, salt: str = "v1") -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)


def _model(rows, k=K):
    """Reference reservoir: bottom-k by (md5 rank, string id) per key
    over DISTINCT (key, id)."""
    byk: dict = {}
    for key, i, v in rows:
        byk.setdefault(key, {})[str(i)] = v
    out = {}
    for key, ids in byk.items():
        ordered = sorted(ids, key=lambda s: (_rank(int(s)), s))[:k]
        out[key] = {(s, _rank(int(s)), ids[s]) for s in ordered}
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _read(store):
    out: dict = {}
    for r in store.sample().collect():
        out.setdefault(r.gk, set()).add((r.id, r.rk, r.val))
    return out


ROWS = [(f"s{i % 3}", i, i * 10) for i in range(40)]


def test_reservoir_matches_model_one_shot(spark, tmp_path):
    st = ReservoirStore(spark, str(tmp_path / "r"), k=K)
    st.absorb(_df(spark, ROWS), "k", "id", "v")
    assert _read(st) == _model(ROWS)


def test_reservoir_merge_equals_one_shot_any_split(spark, tmp_path):
    """The keep-min merge property, sliced three ways including an
    interleaved and a skewed split."""
    splits = [
        [ROWS[:13], ROWS[13:]],
        [ROWS[::2], ROWS[1::2]],
        [ROWS[:1], ROWS[1:3], ROWS[3:]],
    ]
    for n, parts in enumerate(splits):
        st = ReservoirStore(spark, str(tmp_path / f"m{n}"), k=K)
        for p in parts:
            st.absorb(_df(spark, p), "k", "id", "v")
        assert _read(st) == _model(ROWS), f"split {n}"


def test_reservoir_idempotent_and_threshold_monotone(spark, tmp_path):
    st = ReservoirStore(spark, str(tmp_path / "r"), k=K)
    st.absorb(_df(spark, ROWS[:20]), "k", "id", "v")
    th1 = {r.gk: r.kth_rank for r in st.summaries().collect()}
    # re-offering the exact same rows changes nothing (no batch_id —
    # this is the ALGEBRAIC idempotence, not replay bookkeeping)
    st.absorb(_df(spark, ROWS[:20]), "k", "id", "v")
    assert _read(st) == _model(ROWS[:20])
    st.absorb(_df(spark, ROWS[20:]), "k", "id", "v")
    th2 = {r.gk: r.kth_rank for r in st.summaries().collect()}
    # once a key's reservoir is full, offering more rows can only
    # LOWER its selection threshold
    for k, t2 in th2.items():
        assert t2 <= th1[k]
    assert _read(st) == _model(ROWS)


def test_reservoir_prune_then_absorb_equals_absorb(spark, tmp_path):
    a = ReservoirStore(spark, str(tmp_path / "a"), k=K)
    b = ReservoirStore(spark, str(tmp_path / "b"), k=K)
    for stc in (a, b):
        stc.absorb(_df(spark, ROWS[:25]), "k", "id", "v")
    a.prune()
    for stc in (a, b):
        stc.absorb(_df(spark, ROWS[25:]), "k", "id", "v")
    assert _read(a) == _read(b) == _model(ROWS)
    # prune's semantic floor: <= k rows per key in the raw table
    raw = a._table("res", "gk string, rk long, id string, val long")
    per_key = raw.groupBy("gk").count().collect()
    # one pruned snapshot + one absorb appended after it
    assert all(r["count"] <= 2 * K for r in per_key)


def test_reservoir_emission_and_exactly_once_replay(spark, tmp_path):
    st = ReservoirStore(spark, str(tmp_path / "r"), k=K)
    st.absorb(_df(spark, ROWS[:20]), "k", "id", "v", batch_id=0)
    out1 = st.absorb(_df(spark, ROWS[20:]), "k", "id", "v", batch_id=1)
    want = {
        key: (
            len(members),
            max(rk for _, rk, _ in members),
            sum(v for _, _, v in members),
        )
        for key, members in _model(ROWS).items()
    }
    got = {
        r.k: (r.n_sample, r.kth_rank, r.sum_val) for r in out1.collect()
    }
    assert got == want
    # replay: same emission back, no state re-append
    n_files = len(os.listdir(st._current_dir()))
    replay = st.absorb(_df(spark, ROWS[20:]), "k", "id", "v", batch_id=1)
    assert {
        r.k: (r.n_sample, r.kth_rank, r.sum_val) for r in replay.collect()
    } == want
    assert len(os.listdir(st._current_dir())) == n_files
    # an OLDER batch returns empty without touching state
    assert st.absorb(
        _df(spark, ROWS[:5]), "k", "id", "v", batch_id=0
    ).count() == 0


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_reservoir_commit_crash_replay(spark, tmp_path, stage):
    st = ReservoirStore(spark, str(tmp_path / "c"), k=K)
    st.absorb(_df(spark, ROWS[:20]), "k", "id", "v", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    st._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        st.absorb(_df(spark, ROWS[20:]), "k", "id", "v", batch_id=1)
    st._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "c", "_current")))
    assert meta["batch"] == 0
    assert _read(st) == _model(ROWS[:20])

    st.absorb(_df(spark, ROWS[20:]), "k", "id", "v", batch_id=1)
    assert _read(st) == _model(ROWS)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_reservoir_time_travel_and_reopen_pinning(spark, tmp_path):
    st = ReservoirStore(spark, str(tmp_path / "r"), k=K)
    st.absorb(_df(spark, ROWS[:20]), "k", "id", "v")
    v0 = st.snapshot_versions()[0]
    st.absorb(_df(spark, ROWS[20:]), "k", "id", "v")
    asof = {}
    for r in st.sample_as_of(v0).collect():
        asof.setdefault(r.gk, set()).add((r.id, r.rk, r.val))
    assert asof == _model(ROWS[:20])
    # reopen with the same params works; different k refuses
    ReservoirStore(spark, str(tmp_path / "r"), k=K)
    with pytest.raises(ValueError, match="params"):
        ReservoirStore(spark, str(tmp_path / "r"), k=K + 1)
    with pytest.raises(ValueError):
        ReservoirStore(spark, str(tmp_path / "x"), k=0)


def test_reservoir_foreach_batch_streaming(spark, tmp_path):
    st = ReservoirStore(spark, str(tmp_path / "s"), k=K)
    seen: list = []
    fn = st.foreach_batch(
        "k", "id", "v", lambda df, bid: seen.append((bid, df.count()))
    )
    fn(_df(spark, ROWS[:20]), 0)
    fn(_df(spark, ROWS[20:]), 1)
    fn(_df(spark, ROWS[20:]), 1)  # replayed micro-batch
    assert [b for b, _ in seen] == [0, 1, 1]
    assert seen[1] == seen[2]  # replay saw the identical emission
    assert _read(st) == _model(ROWS)


def test_reservoir_duplicate_rows_in_one_increment(spark, tmp_path):
    """r11 review finding: duplicate (key, id) rows inside ONE
    increment (at-least-once upstream delivery) must not occupy
    multiple local top-k slots and starve true members out of the
    appended state. With k copies of the lowest-ranked id in one
    partition, the store must still retain the full reservoir."""
    lowest = min(range(40), key=_rank)
    dup_rows = [("s0", lowest, lowest * 10)] * (K + 2) + [
        ("s0", i, i * 10) for i in range(40) if i != lowest
    ]
    st = ReservoirStore(spark, str(tmp_path / "d"), k=K)
    # one partition forces every duplicate into the same local top-k
    st.absorb(_df(spark, dup_rows).coalesce(1), "k", "id", "v")
    want = _model([("s0", i, i * 10) for i in range(40)])
    assert _read(st) == want
    assert len(_read(st)["s0"]) == K


def test_weighted_reservoir_properties(spark):
    """operators/split.weighted_reservoir — the oracle replays rank
    and selection; this pins what it can't see: (a) the weight guard
    fires loudly in-plan, (b) weights actually TILT inclusion (a
    max-weight item is sampled far more often than weight-1 peers
    across salts — the replication reduction working as designed),
    (c) weight-1 everywhere degenerates to the uniform bottom-k."""
    import pytest as _pt

    from time_series_storage_spark.operators.dedup import md5_long
    from time_series_storage_spark.operators.split import (
        weighted_reservoir,
    )
    from pyspark.sql import functions as F

    rows = [("s", i, 64 if i == 0 else 1) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, id long, w long")
    # (b): across 12 salts, the weight-64 item should be selected in
    # a clear majority of k=4 reservoirs; any single weight-1 item
    # should not be
    hits = 0
    for t in range(12):
        got = {
            r.id
            for r in weighted_reservoir(
                df, ["k"], "id", "w", 4, salt=f"t{t}"
            ).collect()
        }
        hits += 0 in got
    assert hits >= 8, hits
    # (c): all-1 weights == uniform stratified bottom-k
    uni = spark.createDataFrame(
        [("s", i, 1) for i in range(60)], "k string, id long, w long"
    )
    got = sorted(
        r.id for r in weighted_reservoir(uni, ["k"], "id", "w", 5).collect()
    )
    want = sorted(
        sorted(
            range(60),
            key=lambda i: (
                int(
                    __import__("hashlib")
                    .md5(f"v1:{i}:1".encode())
                    .hexdigest()[:15],
                    16,
                ),
                i,
            ),
        )[:5]
    )
    assert got == want
    # (a): out-of-range weight fails the job loudly
    bad = spark.createDataFrame(
        [("s", 1, 0)], "k string, id long, w long"
    )
    with _pt.raises(Exception, match="weight must be in"):
        weighted_reservoir(bad, ["k"], "id", "w", 4).collect()
    with _pt.raises(ValueError, match="k must be"):
        weighted_reservoir(uni, ["k"], "id", "w", 0)


def test_weighted_store_merge_equals_one_shot(spark, tmp_path):
    """WeightedReservoirStore: the keep-min merge holds for weighted
    ranks exactly as for uniform ones (rank = min-of-w-copy-hashes is
    a pure function of (id, weight)); weight guard rides in-plan;
    params pin includes the weight bound."""
    from time_series_storage_spark.operators.reservoir_store import (
        WeightedReservoirStore,
    )

    wrows = [(f"s{i % 2}", i, (i % 5) + 1) for i in range(30)]

    def _wrank(i, w):
        return min(
            int(
                __import__("hashlib")
                .md5(f"v1:{i}:{j}".encode())
                .hexdigest()[:15],
                16,
            )
            for j in range(1, w + 1)
        )

    def _wmodel(rows, k=K):
        byk: dict = {}
        for key, i, w in rows:
            byk.setdefault(key, {})[str(i)] = w
        out = {}
        for key, ids in byk.items():
            ordered = sorted(
                ids, key=lambda s: (_wrank(int(s), ids[s]), s)
            )[:k]
            out[key] = {
                (s, _wrank(int(s), ids[s]), ids[s]) for s in ordered
            }
        return out

    one = WeightedReservoirStore(spark, str(tmp_path / "o"), k=K)
    one.absorb(_df(spark, wrows), "k", "id", "v")
    split = WeightedReservoirStore(spark, str(tmp_path / "s"), k=K)
    split.absorb(_df(spark, wrows[::2]), "k", "id", "v")
    split.absorb(_df(spark, wrows[1::2]), "k", "id", "v")
    assert _read(one) == _read(split) == _wmodel(wrows)
    # weight guard
    bad = _df(spark, [("s0", 99, 0)])
    with pytest.raises(Exception, match="weight must be in"):
        one.absorb(bad, "k", "id", "v")
    # params pin includes the bound
    with pytest.raises(ValueError, match="params"):
        WeightedReservoirStore(
            spark, str(tmp_path / "o"), k=K, max_weight=32
        )


def test_weighted_store_weight_drift_is_deterministic(spark, tmp_path):
    """r11 review finding: re-offering an id with a CHANGED weight (a
    contract breach) must still read back deterministically — the
    dedup keeps the smallest (rank, weight) row, never an arbitrary
    partition-order pick."""
    from time_series_storage_spark.operators.reservoir_store import (
        WeightedReservoirStore,
    )

    st = WeightedReservoirStore(spark, str(tmp_path / "d"), k=K)
    st.absorb(_df(spark, [("s", 1, 1), ("s", 2, 1)]), "k", "id", "v")
    st.absorb(_df(spark, [("s", 1, 5)]), "k", "id", "v")  # weight drift

    def _wrank(i, w):
        return min(
            int(
                __import__("hashlib")
                .md5(f"v1:{i}:{j}".encode())
                .hexdigest()[:15],
                16,
            )
            for j in range(1, w + 1)
        )

    want_rk = min(_wrank(1, 1), _wrank(1, 5))
    want_val = 1 if _wrank(1, 1) <= _wrank(1, 5) else 5
    for _ in range(3):  # stable across repeated reads
        got = {r.id: (r.rk, r.val) for r in st.sample().collect()}
        assert got["1"] == (want_rk, want_val)
