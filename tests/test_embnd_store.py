"""EmbNearDupStore (operators/dedup.py) — the persisted
hyperplane-LSH bucket + vector artifact for incremental
embedding-cosine near-dup.

Reference behavior: the whole-corpus path is
similarity.embedding_cosine_dedup (gated as dedup_embedding_cosine);
the store is its daily-ingest form — probe today's increment against
the persisted bucket index of RETAINED survivors, never re-bucketing
corpus history. The driver-level oracle row is emb_near_incremental
(queries_extensions.py), whose SQL recomputes the whole sequence from
scratch; these tests pin the store mechanics the oracle can't see
(replay exactly-once, parameter pinning, reopen persistence, the
first-day-wins divergence from batch clustering) and check the full
pipeline against an independent pure-Python sequential model.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.dedup import EmbNearDupStore
from time_series_storage_spark.operators.similarity import (
    EMBED_DIM,
    LSH_BITS,
    LSH_PLANES,
    lsh_similar_pairs,
)

THR = 300_000  # cosine >= 0.3, the batch operator's bar


def _chain():
    """A, B, C with cos(A,B) = cos(B,C) ~ 0.79 (>= 0.3) but
    cos(A,C) = 0.25 (< 0.3), all three in the same LSH bucket — found
    by deterministic search over numpy seeds (seed 8 under the fixed
    LSH_PLANES); the precondition test below re-asserts every fact."""
    rng = np.random.RandomState(8)
    A = rng.randn(EMBED_DIM)
    Cr = rng.randn(EMBED_DIM)
    Cperp = Cr - (Cr @ A) / (A @ A) * A
    C = 0.25 * A / np.linalg.norm(A) + math.sqrt(1 - 0.25**2) * (
        Cperp / np.linalg.norm(Cperp)
    )
    B = A / np.linalg.norm(A) + C
    return [x.tolist() for x in (A, B, C)]


def _fresh(seed: int):
    return np.random.RandomState(seed).randn(EMBED_DIM).tolist()


def _bucket(v) -> int:
    """The model's bucket: ordered-fold projection sign per plane,
    exactly the Spark expression's arithmetic."""
    out = 0
    for t, plane in enumerate(LSH_PLANES):
        acc = 0.0
        for x, s in zip(v, plane):
            acc = acc + x * float(s)
        if acc > 0:
            out += 1 << t
    return out


def _sim_x1e6(a, b) -> int:
    """Ordered-fold cosine scaled to x1e6, HALF_UP like F.round —
    bit-compatible with the store's comparison."""

    def fold(xs):
        acc = 0.0
        for x in xs:
            acc = acc + x
        return acc

    dot = fold([x * y for x, y in zip(a, b)])
    na = math.sqrt(fold([x * x for x in a]))
    nb = math.sqrt(fold([x * x for x in b]))
    v = dot / (na * nb) * 1e6
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _model_day(stored: dict[int, list], day: list[tuple[int, list]]):
    """Sequential-model dedup of one increment against the retained
    corpus: history probe (bucket-mates of stored survivors at cosine
    >= THR), then min-id connected components of the same-bucket pair
    graph within the remainder. Returns {survivor_id: n_members} and
    mutates ``stored``."""
    ok = []
    for i, v in day:
        hit = any(
            _bucket(v) == _bucket(w) and _sim_x1e6(v, w) >= THR
            for w in stored.values()
        )
        if not hit:
            ok.append((i, v))
    parent = {i: i for i, _ in ok}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, v in ok:
        for j, w in ok:
            if i < j and _bucket(v) == _bucket(w) and _sim_x1e6(v, w) >= THR:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, int] = {}
    for i, _ in ok:
        r = find(i)
        clusters[r] = clusters.get(r, 0) + 1
    for i, v in ok:
        if find(i) == i:
            stored[i] = v
    return clusters


def test_embnd_chain_preconditions(spark):
    """The crafted chain A~B, B~C, A!~C must hold under the BATCH LSH
    operator (fixed planes, so this is a fixed fact) — the divergence
    assertions below build on it."""
    A, B, C = _chain()
    assert _bucket(A) == _bucket(B) == _bucket(C)
    assert _sim_x1e6(A, B) >= THR and _sim_x1e6(B, C) >= THR
    assert _sim_x1e6(A, C) < THR
    emb = spark.createDataFrame(
        [(1, A), (2, B), (3, C)], "vec_id long, embedding array<double>"
    )
    pairs = {
        (r.v1, r.v2)
        for r in lsh_similar_pairs(emb, threshold_x1e6=THR).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs


def test_embnd_store_two_day_flow(spark, tmp_path):
    """Daily-ingest contract: history near-dups suppressed via the
    persisted bucket index, within-increment clusters keep the min id,
    and the A~B~C chain shows the first-day-wins divergence (C
    survives because B — its only near neighbor — was dropped against
    A, never stored)."""
    A, B, C = _chain()
    V = _fresh(10000)
    W = _fresh(10001)
    store = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    s1 = store.absorb(
        spark.createDataFrame(
            [(10, A), (11, V)], "vec_id long, embedding array<double>"
        ),
        "vec_id",
        "embedding",
    )
    assert sorted((r.vec_id, r.n_members) for r in s1.collect()) == [
        (10, 1),
        (11, 1),
    ]
    day2 = spark.createDataFrame(
        [
            (20, B),  # history dup of stored 10 (cos 0.79)
            (21, C),  # survives: cos(A,C)=0.25 < thr; B was never stored
            (22, [x * 2.0 for x in V]),  # history dup of 11 (cos 1)
            (23, W),
            (24, [x * 1.5 for x in W]),  # within-increment dup of 23
        ],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r.vec_id, r.n_members)
        for r in store.dedup_increment(day2, "vec_id", "embedding").collect()
    )
    assert got == [(21, 1), (23, 2)]
    s2 = store.absorb(day2, "vec_id", "embedding")
    assert sorted(
        (r.vec_id, r.n_members) for r in s2.collect()
    ) == [(21, 1), (23, 2)]
    assert sorted(r.id for r in store.vectors().select("id").collect()) == [
        10, 11, 21, 23,
    ]
    # day 3: C is stored now, so its scaled copy IS a history dup
    s3 = store.dedup_increment(
        spark.createDataFrame(
            [(30, [x * 1.1 for x in C])],
            "vec_id long, embedding array<double>",
        ),
        "vec_id",
        "embedding",
    )
    assert s3.count() == 0


def test_embnd_store_params_pinned(spark, tmp_path):
    store = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    store.absorb(
        spark.createDataFrame(
            [(1, _fresh(10000))], "vec_id long, embedding array<double>"
        ),
        "vec_id",
        "embedding",
    )
    with pytest.raises(ValueError, match="incompatible artifact"):
        EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=500_000)
    # same params reopen reads the committed artifact
    again = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    assert [r.id for r in again.buckets().select("id").collect()] == [1]
    assert again.buckets().collect()[0].bucket == _bucket(_fresh(10000))


def test_embnd_store_replay_exactly_once(spark, tmp_path):
    """The batch-id watermark: same batch returns the committed
    survivors without re-absorbing, an older batch returns empty, and
    a manual (batch-less) absorb in between does not erase the
    watermark."""
    A, _, _ = _chain()
    V = _fresh(10000)
    store = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    df0 = spark.createDataFrame(
        [(1, A)], "vec_id long, embedding array<double>"
    )
    s0 = store.absorb(df0, "vec_id", "embedding", batch_id=0)
    assert [(r.vec_id, r.n_members) for r in s0.collect()] == [(1, 1)]
    # manual daily absorb between stream batches
    store.absorb(
        spark.createDataFrame(
            [(2, V)], "vec_id long, embedding array<double>"
        ),
        "vec_id",
        "embedding",
    )
    # replay of batch 0 after the manual absorb: emits batch 0's
    # committed survivors again, absorbs nothing
    r0 = store.absorb(df0, "vec_id", "embedding", batch_id=0)
    assert [(r.vec_id, r.n_members) for r in r0.collect()] == [(1, 1)]
    assert sorted(r.id for r in store.vectors().select("id").collect()) == [
        1, 2,
    ]
    # an older (already-superseded) batch id yields empty
    s1 = store.absorb(df0, "vec_id", "embedding", batch_id=1)
    assert s1.count() == 0  # duplicate of batch 0's vector
    assert store.absorb(df0, "vec_id", "embedding", batch_id=0).count() == 0


def test_embnd_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: a file stream near-deduped through the persisted
    store via foreachBatch — pre-stream history suppresses its
    near-duplicates, cross-batch near-dups are suppressed by the
    store's growth, within-batch clusters keep the min id."""
    A, _, _ = _chain()
    V = _fresh(10000)
    W = _fresh(10001)
    store = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    store.absorb(
        spark.createDataFrame(
            [(100, A)], "vec_id long, embedding array<double>"
        ),
        "vec_id",
        "embedding",
    )
    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [
            (1, [x * 3.0 for x in A]),  # suppressed by history
            (2, V),
            (3, [x * 0.5 for x in V]),  # within-batch dup of 2
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(src + "/f0")
    spark.createDataFrame(
        [
            (4, [x * 2.0 for x in V]),  # suppressed by batch-0 survivor 2
            (5, W),
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(src + "/f1")
    emitted = []

    def emit(df, bid):
        emitted.extend((r.vec_id, r.n_members) for r in df.collect())

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            store.foreach_batch("vec_id", "embedding", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert sorted(emitted) == [(2, 2), (5, 1)]
    assert sorted(r.id for r in store.vectors().select("id").collect()) == [
        2, 5, 100,
    ]


# deterministic vector pool for the property test: 4 independent
# directions plus scaled clones (cos 1) and the chain members
def _pool():
    A, B, C = _chain()
    out = [A, B, C, _fresh(10000), _fresh(10001), _fresh(10002)]
    out.append([x * 2.0 for x in A])
    out.append([x * 0.25 for x in out[3]])
    out.append([x * 4.0 for x in out[4]])
    return out


POOL = _pool()


@given(
    picks=st.lists(
        st.integers(min_value=0, max_value=len(POOL) - 1),
        min_size=2,
        max_size=7,
    ),
    cuts=st.sets(st.integers(min_value=1, max_value=6), max_size=2),
)
@settings(max_examples=4, deadline=None)
def test_embnd_store_matches_sequential_model(spark, tmp_path_factory, picks, cuts):
    """Whole-pipeline equivalence with an independent pure-Python
    sequential model (ordered-fold cosine + bucket + union-find CC)
    across an arbitrary multi-day split of an arbitrary vector
    sequence."""
    root = tmp_path_factory.mktemp("embnd")
    store = EmbNearDupStore(spark, str(root / "s"), threshold_x1e6=THR)
    rows = [(100 + i, POOL[p]) for i, p in enumerate(picks)]
    bounds = sorted(c for c in cuts if c < len(rows))
    days, prev = [], 0
    for c in bounds + [len(rows)]:
        if c > prev:
            days.append(rows[prev:c])
            prev = c
    stored: dict[int, list] = {}
    for day in days:
        want = _model_day(stored, day)
        df = spark.createDataFrame(
            day, "vec_id long, embedding array<double>"
        )
        got = dict(
            (r.vec_id, r.n_members)
            for r in store.absorb(df, "vec_id", "embedding").collect()
        )
        assert got == want


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_embnd_store_commit_crash_replay_exactly_once(
    spark, tmp_path, stage
):
    """Same per-stage crash/replay contract as the MinHash store,
    through the same shared _SnapshotArtifactStore commit path — the
    flip is the single commit point for the embedding artifact too."""
    import json
    import os

    A, B, _ = _chain()
    V = _fresh(10000)
    W = _fresh(10001)
    store = EmbNearDupStore(spark, str(tmp_path / "es"), threshold_x1e6=THR)
    b0 = spark.createDataFrame(
        [(1, A), (2, V)], "vec_id long, embedding array<double>"
    )
    s0 = store.absorb(b0, "vec_id", "embedding", batch_id=0)
    assert sorted(r.vec_id for r in s0.collect()) == [1, 2]

    b1 = spark.createDataFrame(
        [(3, B), (4, W)], "vec_id long, embedding array<double>"
    )

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(b1, "vec_id", "embedding", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "es", "_current")))
    assert meta["batch"] == 0
    assert sorted(
        r.id for r in store.vectors().select("id").collect()
    ) == [1, 2]
    # replay: 3 is a cosine near-dup of stored 1; 4 survives
    s1 = store.absorb(b1, "vec_id", "embedding", batch_id=1)
    assert sorted(r.vec_id for r in s1.collect()) == [4]
    assert sorted(
        r.id for r in store.vectors().select("id").collect()
    ) == [1, 2, 4]
    vdirs = [n for n in os.listdir(tmp_path / "es") if n.startswith("v")]
    s1r = store.absorb(b1, "vec_id", "embedding", batch_id=1)
    assert sorted(r.vec_id for r in s1r.collect()) == [4]
    assert [
        n for n in os.listdir(tmp_path / "es") if n.startswith("v")
    ] == vdirs
    assert not [
        n for n in os.listdir(tmp_path / "es") if n.startswith(".staging-")
    ]
