"""Persisted IVF index: build/read parity with the per-query recompute
path, staleness-gated refresh, snapshot isolation of the commit, and
the dynamic-partition-pruned query plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.similarity import ivf_topk
from time_series_storage_spark.operators.vector_index import (
    IvfIndexStore,
    files_fingerprint,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def store(spark, tmp_path):
    return IvfIndexStore(spark, str(tmp_path / "ivf"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topk_from_store_equals_recompute(spark, store):
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(emb, kmeans_iters=2, fingerprint="fp")
    assert _rows(store.topk(q, k=5)) == _rows(
        ivf_topk(q, emb, k=5, kmeans_iters=2)
    )


def test_topk_sampled_codebook_parity(spark, store):
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(emb, kmeans_iters=0, fingerprint="fp")
    assert _rows(store.topk(q, k=5)) == _rows(ivf_topk(q, emb, k=5))


def test_refresh_only_on_fingerprint_or_param_change(spark, store):
    emb = spark.read.parquet(EMB)
    store.build(emb, fingerprint="fp1")
    assert store._meta()["version"] == "v00000000"
    # same fingerprint + params: no rebuild
    assert store.refresh_if_stale(emb, fingerprint="fp1") is False
    assert store._meta()["version"] == "v00000000"
    # changed corpus fingerprint: rebuild
    assert store.refresh_if_stale(emb, fingerprint="fp2") is True
    assert store._meta()["version"] == "v00000001"
    # changed build params: rebuild
    assert store.refresh_if_stale(emb, fingerprint="fp2", kmeans_iters=1)
    assert store._meta()["params"]["kmeans_iters"] == 1


def test_reader_isolated_from_unpublished_build(spark, store):
    """A version directory without a published pointer flip (a build
    that crashed mid-write) must be invisible to readers."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(emb, fingerprint="fp")
    before = _rows(store.topk(q, k=5))
    # simulate a crashed next-version build: directory exists, no flip
    os.makedirs(os.path.join(store.path, "v00000001", "centroids"))
    assert store._meta()["version"] == "v00000000"
    assert _rows(store.topk(q, k=5)) == before


def test_query_plan_prunes_assignment_partitions(spark, store):
    """The probe join must dynamically prune the cell_id-partitioned
    assignment scan — only probed cells are read, the on-disk form of
    IVF's sublinear-scan promise — and stay broadcast (the corpus side
    never shuffles for the similarity computation)."""
    emb = spark.read.parquet(EMB)
    store.build(emb, fingerprint="fp")
    plan = (
        store.topk(emb.where(F.col("vec_id") < 4), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_files_fingerprint_tracks_content_changes(tmp_path):
    f = tmp_path / "data.parquet"
    f.write_bytes(b"aaa")
    fp1 = files_fingerprint(str(tmp_path))
    assert fp1 == files_fingerprint(str(tmp_path))
    f.write_bytes(b"aaaa")
    assert files_fingerprint(str(tmp_path)) != fp1
    # underscore/hidden files (e.g. _SUCCESS) don't affect it
    (tmp_path / "_SUCCESS").write_bytes(b"")
    fp2 = files_fingerprint(str(tmp_path))
    assert fp2 == files_fingerprint(str(tmp_path))


# -- build crash atomicity (fault injection at every stage boundary) --------

class _Boom(RuntimeError):
    pass


def _crash_at(target_stage):
    def hook(stage):
        if stage == target_stage:
            raise _Boom(stage)
    return hook


@pytest.mark.parametrize(
    "stage", ["after_centroids", "after_assignment", "after_rename"]
)
def test_build_crash_never_trusts_partial_state(spark, store, stage):
    """Kill the build at each boundary: between the two Spark writes,
    after both writes but before the staging rename, and after the
    rename but before the pointer flip. In every case the store must
    report no committed index, refresh_if_stale must rebuild, and the
    rebuilt index must serve queries identical to a clean build."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    clean = IvfIndexStore(spark, store.path + "_clean")
    clean.build(emb, fingerprint="fp")
    want = _rows(clean.topk(q, k=5))

    store._build_fault = _crash_at(stage)
    with pytest.raises(_Boom):
        store.build(emb, fingerprint="fp")
    store._build_fault = None

    # nothing committed: no current pointer, not "exists"
    assert store._meta() is None
    assert store.exists() is False
    with pytest.raises(FileNotFoundError):
        store.centroids()

    # refresh must treat the wreck as absent and rebuild fully
    assert store.refresh_if_stale(emb, fingerprint="fp") is True
    assert store.exists()
    assert _rows(store.topk(q, k=5)) == want
    # no staging orphan survives the successful rebuild
    leftovers = [
        n for n in os.listdir(store.path) if n.startswith(".staging-")
    ]
    assert leftovers == []


def test_crashed_build_invisible_to_live_readers(spark, store):
    """A crash while REBUILDING on top of a committed version must
    leave readers on the old version untouched (the snapshot-commit
    promise), including when the wreck is a renamed-but-unpublished
    next version."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(emb, fingerprint="fp1")
    before = _rows(store.topk(q, k=5))

    for stage in ["after_centroids", "after_assignment", "after_rename"]:
        store._build_fault = _crash_at(stage)
        with pytest.raises(_Boom):
            store.build(emb, fingerprint="fp2")
        store._build_fault = None
        assert store._meta()["fingerprint"] == "fp1"
        assert _rows(store.topk(q, k=5)) == before

    # and a later successful refresh picks up cleanly
    assert store.refresh_if_stale(emb, fingerprint="fp2") is True
    assert _rows(store.topk(q, k=5)) == before  # same corpus, same answer


def test_absorb_equals_from_scratch_assignment(spark, store):
    """Frozen-codebook absorb: base build + increment absorb serves
    top-k identical to a from-scratch build over the grown corpus
    AGAINST THE SAME CODEBOOK (base-fitted centroids), and the new
    version hard-links history (O(increment) new bytes)."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    base = emb.where(F.col("vec_id") < 300)
    inc = emb.where(F.col("vec_id") >= 300)

    store.build(base, kmeans_iters=2, fingerprint="fp-base")
    cents_before = _rows(store.centroids())
    v1 = store.absorb(inc, fingerprint="fp-grown")
    assert store._meta()["version"] == v1
    # codebook FROZEN, assignment grown to the full corpus
    assert _rows(store.centroids()) == cents_before
    assert store.assignment().count() == emb.count()

    # from-scratch twin: assign the grown corpus to the same codebook
    from time_series_storage_spark.operators.similarity import (
        ivf_assign,
        ivf_probe_topk,
    )

    cents = store.centroids()
    want = _rows(
        ivf_probe_topk(q, cents, ivf_assign(emb, cents), k=5)
    )
    assert _rows(store.topk(q, k=5)) == want


def test_absorb_requires_committed_base(spark, store):
    emb = spark.read.parquet(EMB)
    with pytest.raises(FileNotFoundError, match="build"):
        store.absorb(emb.where(F.col("vec_id") >= 300))


@pytest.mark.parametrize(
    "stage", ["after_assignment", "after_link", "after_rename"]
)
def test_absorb_crash_leaves_readers_on_base(spark, store, stage):
    """Kill the absorb at each boundary: readers stay on the complete
    base version; the retry converges to the grown index."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    base = emb.where(F.col("vec_id") < 300)
    inc = emb.where(F.col("vec_id") >= 300)
    store.build(base, kmeans_iters=2, fingerprint="fp-base")
    want_base = _rows(store.topk(q, k=5))
    base_meta = store._meta()

    store._build_fault = _crash_at(stage)
    with pytest.raises(_Boom):
        store.absorb(inc, fingerprint="fp-grown")
    store._build_fault = None

    # reader untouched mid-wreck
    assert store._meta() == base_meta
    assert _rows(store.topk(q, k=5)) == want_base

    v = store.absorb(inc, fingerprint="fp-grown")
    assert store._meta()["version"] == v
    assert store.assignment().count() == emb.count()
    leftovers = [
        n for n in os.listdir(store.path) if n.startswith(".staging-")
    ]
    assert leftovers == []


def test_absorb_batch_replay_exactly_once(spark, store):
    """Re-absorbing a committed batch id is a no-op returning the
    committed version — the assignment is never double-appended."""
    emb = spark.read.parquet(EMB)
    base = emb.where(F.col("vec_id") < 300)
    b0 = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b1 = emb.where(F.col("vec_id") >= 400)
    store.build(base, kmeans_iters=0, fingerprint="fp")
    v1 = store.absorb(b0, batch_id=0)
    n1 = store.assignment().count()
    # replay of batch 0: same version, same row count
    assert store.absorb(b0, batch_id=0) == v1
    assert store.assignment().count() == n1
    # an older batch id is also a no-op
    assert store.absorb(b1, batch_id=-3) == v1
    assert store.assignment().count() == n1
    # the next batch advances and the watermark moves
    v2 = store.absorb(b1, batch_id=1)
    assert v2 != v1
    assert store.assignment().count() == emb.count()
    assert store._meta()["batch"] == 1
    # a manual (batch-less) absorb PRESERVES the watermark
    store.absorb(b1.limit(0), fingerprint="fp2")
    assert store._meta()["batch"] == 1


def test_absorb_foreach_batch_streaming(spark, store, tmp_path):
    """End-to-end: a vector file stream absorbed into the index via
    foreachBatch; the final index equals base + both batches and
    serves top-k identical to a from-scratch assignment against the
    frozen codebook."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(
        emb.where(F.col("vec_id") < 300), kmeans_iters=0,
        fingerprint="fp",
    )
    src = str(tmp_path / "feed")
    emb.where(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).coalesce(1).write.parquet(src + "/f0")
    emb.where(F.col("vec_id") >= 400).coalesce(1).write.parquet(
        src + "/f1"
    )
    seen = []
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sq = (
        stream.writeStream.foreachBatch(
            store.foreach_batch(emit=lambda v, b: seen.append((b, v)))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)
    assert sq.exception() is None
    assert len(seen) == 2
    assert store.assignment().count() == emb.count()

    from time_series_storage_spark.operators.similarity import (
        ivf_assign,
        ivf_probe_topk,
    )

    cents = store.centroids()
    assert _rows(store.topk(q, k=5)) == _rows(
        ivf_probe_topk(q, cents, ivf_assign(emb, cents), k=5)
    )


def test_compact_preserves_index_and_shrinks_files(spark, store):
    """After two absorbs, compaction consolidates each cell's
    accumulated file sets, preserves every row / the watermark / the
    served top-k, and readers crash-safely stay on the old version
    mid-compaction."""
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    store.build(
        emb.where(F.col("vec_id") < 300), kmeans_iters=0,
        fingerprint="fp",
    )
    store.absorb(
        emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)),
        batch_id=0,
    )
    store.absorb(emb.where(F.col("vec_id") >= 400), batch_id=1)
    want = _rows(store.topk(q, k=5))
    rows_before = _rows(store.assignment())

    def nfiles():
        d = os.path.join(store._version_dir(), "assignment")
        return sum(
            1
            for dp, _dn, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    files_before = nfiles()

    # mid-compaction crash leaves readers on the complete old version
    store._build_fault = _crash_at("after_rename")
    with pytest.raises(_Boom):
        store.compact()
    store._build_fault = None
    assert _rows(store.topk(q, k=5)) == want

    v = store.compact()
    assert store._meta()["version"] == v
    assert store._meta()["batch"] == 1  # watermark preserved
    assert _rows(store.assignment()) == rows_before
    assert _rows(store.topk(q, k=5)) == want
    assert nfiles() < files_before


def test_format_stamp_refuses_incompatible_store(spark, store):
    """A committed index whose format stamp differs from what this
    code writes is refused on open (loud, not silent misread)."""
    import json

    emb = spark.read.parquet(EMB)
    store.build(emb, fingerprint="fp")
    cur = os.path.join(store.path, "_current")
    meta = json.load(open(cur))
    assert meta["format"] == IvfIndexStore.FORMAT
    meta["format"] = 0
    json.dump(meta, open(cur, "w"))
    with pytest.raises(ValueError, match="format"):
        IvfIndexStore(spark, store.path)


def test_concurrent_absorbs_serialize_and_lose_nothing(spark, store):
    """Two writers racing absorb() on one store path must SERIALIZE on
    the store flock: both increments commit (in either order), no
    staging dir is swept from under a live writer, and the final
    assignment is the full grown corpus."""
    import threading

    emb = spark.read.parquet(EMB)
    store.build(emb.where(F.col("vec_id") < 300), fingerprint="fp")
    inc1 = emb.where((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    inc2 = emb.where(F.col("vec_id") >= 400)
    errs = []

    def run(inc):
        try:
            # separate handle per writer, as two drivers would have
            IvfIndexStore(spark, store.path).absorb(inc)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=run, args=(i,)) for i in (inc1, inc2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    assert store.assignment().count() == emb.count()
    assert store.assignment().select("vec_id").distinct().count() == emb.count()
    assert [
        n for n in os.listdir(store.path) if n.startswith(".staging-")
    ] == []


def test_publish_retains_previous_version_until_vacuum(spark, store):
    """Serve-while-ingest: the version a reader resolved BEFORE an
    absorb flip must stay complete on disk through the flip
    (KEEP_VERSIONS retention), so its files never vanish mid-query;
    vacuum() reclaims explicitly."""
    emb = spark.read.parquet(EMB)
    store.build(emb.where(F.col("vec_id") < 300), fingerprint="fp")
    v0_dir = store._version_dir()
    # reader resolves the current version, then an absorb flips
    old_assignment = spark.read.parquet(os.path.join(v0_dir, "assignment"))
    store.absorb(emb.where(F.col("vec_id") >= 300))
    assert os.path.exists(v0_dir)  # retained, not GC'd at the flip
    assert old_assignment.count() == 300  # old reader still whole
    removed = store.vacuum(keep=1)
    assert removed == [os.path.basename(v0_dir)]
    assert not os.path.exists(v0_dir)
    # and a third flip GCs the oldest beyond KEEP_VERSIONS on its own
    v1_dir = store._version_dir()
    store.absorb(emb.limit(0))
    v2_dir = store._version_dir()
    store.compact()
    assert not os.path.exists(v1_dir)
    assert os.path.exists(v2_dir)


def test_compact_target_files_per_cell_scales_file_count(spark, store):
    """The knob means what it says: a larger target_files_per_cell
    yields MORE files per cell (sized from the measured rows-per-cell
    estimate), never fewer."""
    emb = spark.read.parquet(EMB)
    store.build(emb, kmeans_iters=0, fingerprint="fp")

    def nfiles():
        d = os.path.join(store._version_dir(), "assignment")
        return sum(
            1
            for _dp, _dn, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    store.compact(target_files_per_cell=1)
    one = nfiles()
    store.compact(target_files_per_cell=4)
    four = nfiles()
    assert four > one


def _drift_corpus(spark):
    """Base: two clusters living in dims (0,1). Increment: a drifted
    distribution in dims (2,3) whose vectors carry a small alternating
    dim-0/dim-1 component, so the FROZEN base codebook splits each
    drifted cluster across both cells — a drifted query's true
    neighbors then span cells its nprobe=1 probe can't all reach."""
    rows = []
    for i in range(10):  # base cluster A ~ e0, ids 0..9
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(10):  # base cluster B ~ e1, ids 10..19
        rows.append((10 + i, [0.01 * i, 1.0, 0.0, 0.0]))
    for i in range(12):  # drifted cluster C ~ e2, ids 100..111
        a, b = (0.2, 0.0) if i % 2 == 0 else (0.0, 0.2)
        rows.append((100 + i, [a, b, 1.0, 0.01 * i]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_recall_probe_and_drift_triggered_rebuild(spark, store, tmp_path):
    """The drift loop end to end: absorbing a drifted increment against
    the frozen codebook degrades measured recall; rebuild_if_drifted
    with a threshold above it re-Lloyds on the grown corpus and equals
    a from-scratch build (same params, same corpus), preserves the
    batch watermark and fingerprint, and records the recall on the
    pointer. A threshold at or below the measured recall is a no-op."""
    emb = _drift_corpus(spark)
    base = emb.where(F.col("vec_id") < 100)
    inc = emb.where(F.col("vec_id") >= 100)
    q = inc  # probe with the drifted slice, where the loss lives

    store.build(base, n_cells=2, kmeans_iters=1, fingerprint="fp")
    store.absorb(inc, fingerprint="fp", batch_id=7)
    before = store.recall_probe(q, k=8, nprobe=1)
    assert before < 1_000_000  # drift measurably hurts

    # below-threshold recall: no-op path records and keeps the version
    v_now = store._meta()["version"]
    rebuilt, b0, a0 = store.rebuild_if_drifted(
        before, queries=q, k=8, nprobe=1
    )
    assert (rebuilt, b0, a0) == (False, before, before)
    assert store._meta()["version"] == v_now
    assert store._meta()["recall_x1e6"] == before

    # above-threshold: rebuild on the grown corpus
    rebuilt, b1, a1 = store.rebuild_if_drifted(
        before + 1, queries=q, k=8, nprobe=1
    )
    assert rebuilt and b1 == before
    meta = store._meta()
    assert meta["batch"] == 7  # watermark survived the rebuild
    assert meta["fingerprint"] == "fp"
    assert meta["recall_x1e6"] == a1

    # the rebuild IS a from-scratch build of the grown corpus
    twin = IvfIndexStore(spark, str(tmp_path / "twin"))
    twin.build(emb, n_cells=2, kmeans_iters=1, fingerprint="fp")
    assert _rows(store.centroids()) == _rows(twin.centroids())
    assert _rows(store.assignment()) == _rows(twin.assignment())
    assert _rows(store.topk(q, k=8, nprobe=1)) == _rows(
        twin.topk(q, k=8, nprobe=1)
    )
    # and a replayed pre-rebuild batch still no-ops
    n = store.assignment().count()
    store.absorb(inc, fingerprint="fp", batch_id=7)
    assert store.assignment().count() == n


# -- IVF-PQ: product-quantized codes (r12) -----------------------------------


def _pq_store(spark, tmp_path, name="ivfpq"):
    st = IvfIndexStore(spark, str(tmp_path / name))
    return st


def _build_pq(st, emb, fingerprint="fp"):
    return st.build(
        emb,
        n_cells=16,
        kmeans_iters=2,
        pq_m=8,
        pq_codes=16,
        pq_iters=2,
        fingerprint=fingerprint,
    )


def test_pq_topk_adc_parity_with_recompute(spark, tmp_path):
    """topk_adc(refine=1) from the committed artifacts must equal the
    inline ivfpq_probe_topk recompute over the same corpus — the
    store-parity contract every other artifact here honors."""
    from time_series_storage_spark.operators import similarity as S

    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb)
    cents = S.ivf_kmeans_centroids(emb, n_cells=16, n_iter=2)
    assigned = S.ivf_assign(emb, cents)
    cb = S.pq_kmeans_codebook(emb, m=8, n_codes=16, n_iter=2)
    codes = S.pq_encode(emb, cb, m=8, n_codes=16).join(
        assigned.select("vec_id", "cell_id"), "vec_id"
    )
    want = S.ivfpq_probe_topk(q, cents, cb, codes, k=5, nprobe=12, m=8)
    assert _rows(
        st.topk_adc(q, k=5, nprobe=12, refine=1)
    ) == _rows(want.select("q_id", "vec_id", "rank", "adc_x1e6"))


def test_pq_rerank_scores_are_exact_cosine(spark, tmp_path):
    """With refine > 1 the output scores must be EXACT cosine — every
    (q, vec) the rerank returns carries the same sim_x1e6 brute force
    computes for that pair (the shortlist only restricts WHICH pairs
    appear, never their scores)."""
    from time_series_storage_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb)
    got = st.topk_adc(q, k=10, nprobe=12, refine=8).collect()
    exact = {
        (r["q_id"], r["vec_id"]): r["sim_x1e6"]
        for r in brute_force_topk(q, emb, k=500).collect()
    }
    assert len(got) == 4 * 10
    for r in got:
        assert exact[(r["q_id"], r["vec_id"])] == r["sim_x1e6"]


def test_pq_rerank_recall_pinned(spark, tmp_path):
    """Measured floor for the IVF-PQ serving path on the synthetic
    corpus (measured 68/80 = 85% at nprobe=12, refine=8 on sf0.001;
    91% on sf0.1): pinned at >= 80% so a silent regression in probe,
    encode, or rerank order trips loudly while leaving noise room."""
    from time_series_storage_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 8)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb)
    exact = brute_force_topk(q, emb, k=10)
    got = st.topk_adc(q, k=10, nprobe=12, refine=8)
    hit = (
        exact.select("q_id", "vec_id")
        .join(got.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .count()
    )
    assert hit >= 64, f"recall@10 regressed: {hit}/80"


def test_pq_absorb_encodes_against_frozen_codebook(spark, tmp_path):
    """Absorbed codes must equal a from-scratch encode of the GROWN
    corpus against the stored (frozen) codebook — the bit-identity the
    gated oracle recomputes."""
    from time_series_storage_spark.operators.similarity import pq_encode

    emb = spark.read.parquet(EMB)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb.where(F.col("vec_id") < 300))
    st.absorb(emb.where(F.col("vec_id") >= 300))
    want = pq_encode(emb, st.pq_codebook_df(), m=8, n_codes=16)
    assert _rows(st.pqcodes().select("vec_id", "s", "code")) == _rows(want)
    # and the packed artifact covers exactly the corpus
    assert st.pqcodes_packed().count() == emb.count()


@pytest.mark.parametrize("stage", ["after_pqcodes"])
def test_pq_build_crash_never_trusts_partial_state(spark, tmp_path, stage):
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    clean = _pq_store(spark, tmp_path, "clean")
    _build_pq(clean, emb)
    want = _rows(clean.topk_adc(q, k=5, nprobe=12))

    st = _pq_store(spark, tmp_path)
    st._build_fault = _crash_at(stage)
    with pytest.raises(_Boom):
        _build_pq(st, emb)
    st._build_fault = None
    assert not st.exists()
    _build_pq(st, emb)
    assert _rows(st.topk_adc(q, k=5, nprobe=12)) == want


def test_pq_refresh_tracks_pq_params(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb, fingerprint="fp1")
    assert (
        st.refresh_if_stale(
            emb, n_cells=16, kmeans_iters=2, fingerprint="fp1",
            pq_m=8, pq_codes=16, pq_iters=2,
        )
        is False
    )
    # changed PQ geometry: stale
    assert (
        st.refresh_if_stale(
            emb, n_cells=16, kmeans_iters=2, fingerprint="fp1",
            pq_m=4, pq_codes=16, pq_iters=2,
        )
        is True
    )
    assert st._meta()["params"]["pq_m"] == 4
    # a PQ-less refresh of a PQ store is also a param change
    assert (
        st.refresh_if_stale(
            emb, n_cells=16, kmeans_iters=2, fingerprint="fp1"
        )
        is True
    )
    assert "pq_m" not in st._meta()["params"]


def test_topk_adc_refuses_store_without_pq(spark, store):
    emb = spark.read.parquet(EMB)
    store.build(emb, fingerprint="fp")
    with pytest.raises(ValueError, match="no PQ artifacts"):
        store.topk_adc(emb.where(F.col("vec_id") < 2))


def test_pq_codes_artifact_is_fraction_of_assignment(spark, tmp_path):
    """The point of PQ: the codes tree an ADC query scans must be a
    small fraction of the full-vector assignment tree (measured 7.4x
    at this corpus size, 16.8x at sf0.1 where parquet overhead
    amortizes; pinned at >= 4x)."""
    emb = spark.read.parquet(EMB)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb)

    def du(sub):
        base = os.path.join(st._version_dir(), sub)
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(base)
            for f in fs
            if f.endswith(".parquet")
        )

    assert du("assignment") >= 4 * du("pqcodes")


def test_pq_compact_preserves_codes_and_serving(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb.where(F.col("vec_id") < 300))
    st.absorb(emb.where(F.col("vec_id") >= 300))
    before = _rows(st.topk_adc(q, k=5, nprobe=12))
    packed_before = _rows(st.pqcodes_packed())
    st.compact()
    assert _rows(st.pqcodes_packed()) == packed_before
    assert _rows(st.topk_adc(q, k=5, nprobe=12)) == before


def test_pq_absorb_foreach_batch_streaming(spark, tmp_path):
    """The ANN-ingest sink on a PQ store: two streamed micro-batches
    absorbed via foreachBatch must leave a codes tree identical to a
    from-scratch encode of the grown corpus against the frozen PQ
    codebook, and the ADC serving path identical to the recompute."""
    from time_series_storage_spark.operators.similarity import pq_encode

    emb = spark.read.parquet(EMB)
    q = emb.where(F.col("vec_id") < 4)
    st = _pq_store(spark, tmp_path)
    _build_pq(st, emb.where(F.col("vec_id") < 300))
    src = str(tmp_path / "feed")
    emb.where(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).coalesce(1).write.parquet(src + "/f0")
    emb.where(F.col("vec_id") >= 400).coalesce(1).write.parquet(
        src + "/f1"
    )
    seen = []
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sq = (
        stream.writeStream.foreachBatch(
            st.foreach_batch(emit=lambda v, b: seen.append((b, v)))
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)
    assert sq.exception() is None
    assert len(seen) == 2
    assert st.pqcodes_packed().count() == emb.count()
    want = pq_encode(emb, st.pq_codebook_df(), m=8, n_codes=16)
    assert _rows(st.pqcodes().select("vec_id", "s", "code")) == _rows(want)
