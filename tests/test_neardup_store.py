"""NearDupStore (operators/dedup.py) — the persisted MinHash
band-table artifact for incremental near-dup.

Reference behavior: the whole-corpus path is minhash_lsh_pairs +
connected-components (gated as dedup_minhash_lsh / dedup_clusters);
the store is its daily-ingest form — probe today's increment against
the persisted band index of RETAINED survivors, never re-running LSH
over corpus history. The driver-level oracle row is
dedup_near_incremental (queries_extensions.py), whose SQL recomputes
the whole sequence from scratch; these tests pin the store mechanics
the oracle can't see (crash atomicity, replay exactly-once, parameter
pinning, the first-day-wins divergence from batch clustering) and
check the full pipeline against an independent pure-Python sequential
model.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    MINHASH_P,
    NearDupStore,
    minhash_coeffs,
    minhash_lsh_pairs,
)


def _part(seed: str, n: int = 64) -> str:
    """Deterministic pseudo-random text block (varied content, so the
    distinct-shingle count tracks length)."""
    rng = random.Random(seed)
    return "".join(rng.choices("abcdefghijklmnopqrstuvwxyz ", k=n))


# seed set found by deterministic search: A~B and B~C are LSH
# candidates with jacc 0.66, A!~C has jacc 0.42 (< 0.5) — all fixed
# facts of the md5 shingle pipeline, re-asserted by the precondition
# test below
X1, X2, X3, X4, PQ, PR = (_part(f"t0-{i}") for i in range(6))
PS = _part("t0-s")
DOC_A = X1 + X2 + X3 + X4 + PQ
DOC_B = X1 + X2 + X3 + X4 + PR  # shares 4/5 with A -> jacc ~0.66
DOC_C = PS + X2 + X3 + X4 + PR  # shares 4/5 with B; 3/5 with A (<0.5)


def test_neardup_chain_preconditions(spark):
    """The crafted chain A~B, B~C, A!~C must hold under the BATCH LSH
    operator (deterministic md5 shingles, so this is a fixed fact, not
    a probabilistic one) — the divergence test below builds on it."""
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], ["doc_id", "text"]
    )
    pairs = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs


def test_neardup_store_two_day_flow(spark, tmp_path):
    """Daily-ingest contract: history near-dups suppressed via the
    persisted band index, within-increment clusters keep the min id,
    docs without signatures (null text) survive as singletons, and
    earlier absorb results stay readable after later commits."""
    import os

    store = NearDupStore(spark, str(tmp_path / "nds"))
    day1 = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (5, _part("other", 200))],
        ["doc_id", "text"],
    )
    s1 = store.absorb(day1, "doc_id", "text")
    assert sorted((r.doc_id, r.n_members) for r in s1.collect()) == [
        (1, 2), (5, 1),
    ]
    day2 = spark.createDataFrame(
        [(10, DOC_A + "x"),  # near-dup of stored 1
         (11, _part("fresh", 200)),
         (12, _part("fresh", 200) + "y"),  # near-dup of 11
         (13, None)],
        "doc_id long, text string",
    )
    s2 = store.absorb(day2, "doc_id", "text")
    assert sorted((r.doc_id, r.n_members) for r in s2.collect()) == [
        (11, 2), (13, 1),
    ]
    # s1 still readable (snapshot-until-vacuum)
    assert sorted(r.doc_id for r in s1.collect()) == [1, 5]
    # stored artifact covers exactly the survivors
    assert sorted(r.id for r in store.sets().select("id").collect()) == [
        1, 5, 11, 13,
    ]
    # null-text survivor: its signature is all-null, so its band keys
    # (concat_ws skips nulls -> "") can only ever match ANOTHER
    # null-text doc — the same "all nulls collapse to one survivor"
    # semantics as exact dedup, and identical to the batch LSH path
    assert store.bands().where("id = 13").count() == DEFAULT_BANDS
    s3 = store.absorb(
        spark.createDataFrame([(20, None)], "doc_id long, text string"),
        "doc_id", "text",
    )
    assert s3.count() == 0  # suppressed by the stored null survivor
    # vacuum keeps the current snapshot
    removed = store.vacuum(keep=1)
    assert removed
    assert sorted(
        r.id for r in store.sets().select("id").collect()
    ) == [1, 5, 11, 13]
    vdirs = [n for n in os.listdir(tmp_path / "nds") if n.startswith("v")]
    assert len(vdirs) == 1


def test_neardup_store_first_day_wins_vs_batch(spark, tmp_path):
    """Near-dup is NOT transitive, so the sequential
    survivors-as-targets contract can legitimately differ from batch
    clustering over the concatenated corpus: with A~B, B~C, A!~C,
    batch CC puts all three in one cluster, while the store (having
    dropped B on day 1) RETAINS C on day 2 — C never near-matches a
    stored doc. This is the documented contract, not a bug."""
    from time_series_storage_spark.operators.dedup import (
        connected_components,
    )

    store = NearDupStore(spark, str(tmp_path / "nds"))
    s1 = store.absorb(
        spark.createDataFrame([(1, DOC_A), (2, DOC_B)], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert [(r.doc_id, r.n_members) for r in s1.collect()] == [(1, 2)]
    s2 = store.absorb(
        spark.createDataFrame([(3, DOC_C)], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert [(r.doc_id, r.n_members) for r in s2.collect()] == [(3, 1)]
    # batch over the concatenated corpus: ONE cluster {1,2,3}
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], ["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    cc = connected_components(
        pairs.select("d1", "d2"), docs.select("doc_id"), "doc_id"
    )
    assert {r.cluster for r in cc.collect()} == {1}


def test_neardup_store_crash_leaves_old_version_readable(
    spark, tmp_path, monkeypatch
):
    """A crash at the pointer flip leaves readers on the old complete
    artifact; the retry absorbs the same increment cleanly."""
    store = NearDupStore(spark, str(tmp_path / "nds"))
    store.absorb(
        spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"]),
        "doc_id", "text",
    )
    day2 = spark.createDataFrame(
        [(2, _part("fresh2", 150))], ["doc_id", "text"]
    )
    real_flip = NearDupStore._flip

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(NearDupStore, "_flip", boom)
    with pytest.raises(RuntimeError):
        store.absorb(day2, "doc_id", "text")
    monkeypatch.setattr(NearDupStore, "_flip", real_flip)
    assert sorted(r.id for r in store.sets().select("id").collect()) == [1]
    s = store.absorb(day2, "doc_id", "text")
    assert [r.doc_id for r in s.collect()] == [2]
    assert sorted(r.id for r in store.sets().select("id").collect()) == [1, 2]


def test_neardup_store_batch_replay_exactly_once(spark, tmp_path):
    """foreachBatch replay contract, including a MANUAL absorb
    interleaved between stream batches (the r6 ADVICE shape): the
    watermark and the batch's own survivor files both survive, so a
    replay re-emits exactly the original survivors with no new
    commit."""
    import os

    store = NearDupStore(spark, str(tmp_path / "nds"))
    b0 = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], ["doc_id", "text"]
    )
    s0 = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert [(r.doc_id, r.n_members) for r in s0.collect()] == [(1, 2)]
    # manual absorb between batches — no batch id
    sm = store.absorb(
        spark.createDataFrame([(50, _part("manual", 150))], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert [r.doc_id for r in sm.collect()] == [50]

    def vcount():
        return len(
            [n for n in os.listdir(tmp_path / "nds") if n.startswith("v")]
        )

    n_versions = vcount()
    s0r = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert [(r.doc_id, r.n_members) for r in s0r.collect()] == [(1, 2)]
    assert vcount() == n_versions
    # below the watermark: empty
    assert store.absorb(b0, "doc_id", "text", batch_id=-1).count() == 0
    # the next batch dedups against stream AND manual history
    b1 = spark.createDataFrame(
        [(60, _part("manual", 150) + "z"), (61, _part("b1fresh", 150))],
        ["doc_id", "text"],
    )
    s1 = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert [r.doc_id for r in s1.collect()] == [61]


def test_neardup_store_param_pin(spark, tmp_path):
    """Probing with different shingle/signature params than the stored
    artifact was built with is silent nonsense — reopening with
    changed params must fail loudly."""
    store = NearDupStore(spark, str(tmp_path / "nds"))
    store.absorb(
        spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"]),
        "doc_id", "text",
    )
    with pytest.raises(ValueError, match="params"):
        NearDupStore(spark, str(tmp_path / "nds"), k=5)
    with pytest.raises(ValueError, match="params"):
        NearDupStore(spark, str(tmp_path / "nds"), threshold_x1000=700)
    # same params reopen fine
    NearDupStore(spark, str(tmp_path / "nds"))


# -- independent sequential model -------------------------------------------

K = 8


def _hs(text: str) -> frozenset:
    npos = max(len(text) - (K - 1), 1)
    return frozenset(
        int(hashlib.md5(text[p:p + K].encode()).hexdigest()[:15], 16)
        for p in range(npos)
    )


_COEFFS = minhash_coeffs(DEFAULT_NUM_HASHES)
_R = DEFAULT_NUM_HASHES // DEFAULT_BANDS


def _bands_of(hset) -> frozenset:
    hms = [h % MINHASH_P for h in hset]
    sig = [min((a * hm + b) % MINHASH_P for hm in hms) for a, b in _COEFFS]
    return frozenset(
        (band, tuple(sig[band * _R:(band + 1) * _R]))
        for band in range(DEFAULT_BANDS)
    )


def _jacc(s1, s2) -> int:
    c = len(s1 & s2)
    return (c * 1000) // (len(s1) + len(s2) - c)


def _model_absorb(stored: dict, day: list) -> list:
    """One sequential-model absorb: returns sorted (id, n_members)
    survivors and updates ``stored`` (id -> (hset, bands))."""
    day_sets = {i: _hs(t) for i, t in day}
    day_bands = {i: _bands_of(s) for i, s in day_sets.items()}
    ok = [
        i
        for i in day_sets
        if not any(
            (day_bands[i] & sb) and _jacc(day_sets[i], ss) >= 500
            for ss, sb in stored.values()
        )
    ]
    # within-day clusters: union-find over verified LSH pairs
    parent = {i: i for i in ok}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ok:
        for b in ok:
            if a < b and (day_bands[a] & day_bands[b]) and _jacc(
                day_sets[a], day_sets[b]
            ) >= 500:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters: dict = {}
    for i in ok:
        clusters.setdefault(find(i), []).append(i)
    out = sorted((root, len(members)) for root, members in clusters.items())
    for root in clusters:
        stored[root] = (day_sets[root], day_bands[root])
    return out


nd_days = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.text(alphabet="ab", min_size=0, max_size=12),
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=3,
)


@given(days=nd_days)
@settings(max_examples=5, deadline=None)
def test_neardup_store_matches_sequential_model(
    spark, tmp_path_factory, days
):
    """For ANY partition of a corpus into daily increments, the store
    must equal the sequential model: a doc is dropped iff it
    LSH-candidates AND exact-Jaccard-matches (>= 0.5) a RETAINED
    survivor; within-day clusters are connected components of the
    verified pair graph keeping the min id. The model recomputes the
    ENTIRE MinHash/band/Jaccard pipeline independently in pure Python
    (md5 shingles, 64 permutations, 16 bands), so a pass pins the
    whole numeric chain, not just the bookkeeping. Short 'ab' texts
    collide aggressively, exercising cross-day suppression, within-day
    clustering, and singleton paths."""
    seen_ids = set()
    uniq_days = []
    for day in days:
        cur = {}
        for i, t in day:
            if i not in seen_ids:
                seen_ids.add(i)
                cur[i] = t
        uniq_days.append(sorted(cur.items()))

    store = NearDupStore(spark, str(tmp_path_factory.mktemp("nds") / "s"))
    stored: dict = {}
    for day in uniq_days:
        want = _model_absorb(stored, day)
        if not day:
            continue
        df = spark.createDataFrame(day, "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.n_members)
            for r in store.absorb(df, "doc_id", "text").collect()
        )
        assert got == want


def test_neardup_store_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: a file stream near-deduped through the persisted
    store via foreachBatch — history absorbed BEFORE the stream
    started suppresses its near-duplicates, cross-batch near-dups are
    suppressed by the store's growth, and within-batch clusters keep
    the min id."""
    store = NearDupStore(spark, str(tmp_path / "nds"))
    store.absorb(
        spark.createDataFrame([(100, DOC_A)], ["doc_id", "text"]),
        "doc_id", "text",
    )
    src = str(tmp_path / "feed")
    fresh1 = _part("feed1", 200)
    fresh2 = _part("feed2", 200)
    spark.createDataFrame(
        [(1, DOC_A + "z"), (2, fresh1), (3, fresh1 + "q")],
        ["doc_id", "text"],
    ).coalesce(1).write.parquet(src + "/f0")
    spark.createDataFrame(
        [(4, fresh1 + "zz"), (5, fresh2)], ["doc_id", "text"]
    ).coalesce(1).write.parquet(src + "/f1")
    emitted = []

    def emit(df, bid):
        emitted.extend((r.doc_id, r.n_members) for r in df.collect())

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
    # 1 suppressed by pre-stream history; 3 clusters with 2; 4
    # suppressed by batch-0's committed survivor 2; 5 fresh
    assert sorted(emitted) == [(2, 2), (5, 1)]
    assert sorted(
        r.id for r in store.sets().select("id").collect()
    ) == [2, 5, 100]


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_neardup_store_commit_crash_replay_exactly_once(
    spark, tmp_path, stage
):
    """Fault injection at every commit stage of the shared snapshot
    protocol (survivor write, first history hard-link, post-link
    pre-publish, post-publish pre-flip): the flip is the single commit
    point, so a crash anywhere before it leaves readers on the
    previous complete snapshot and the streaming replay re-absorbs and
    emits the crashed batch's survivors EXACTLY ONCE."""
    import json
    import os

    store = NearDupStore(spark, str(tmp_path / "nds"))
    b0 = spark.createDataFrame(
        [(1, DOC_A), (2, _part("crash-v", 200))], ["doc_id", "text"]
    )
    s0 = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert sorted(r.doc_id for r in s0.collect()) == [1, 2]

    b1 = spark.createDataFrame(
        [(3, DOC_B), (4, _part("crash-w", 200))], ["doc_id", "text"]
    )

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(b1, "doc_id", "text", batch_id=1)
    store._commit_fault = None

    meta = json.load(open(os.path.join(tmp_path / "nds", "_current")))
    assert meta["batch"] == 0
    assert sorted(r.id for r in store.sets().select("id").collect()) == [1, 2]
    # replay: 3 is a near-dup of stored 1 (DOC_A ~ DOC_B); 4 survives
    s1 = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r.doc_id for r in s1.collect()) == [4]
    assert sorted(
        r.id for r in store.sets().select("id").collect()
    ) == [1, 2, 4]
    # second replay re-emits without a new commit
    vdirs = [n for n in os.listdir(tmp_path / "nds") if n.startswith("v")]
    s1r = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r.doc_id for r in s1r.collect()) == [4]
    assert [
        n for n in os.listdir(tmp_path / "nds") if n.startswith("v")
    ] == vdirs
    assert not [
        n
        for n in os.listdir(tmp_path / "nds")
        if n.startswith(".staging-")
    ]
