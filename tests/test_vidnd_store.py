"""VideoNearDupStore (operators/video.py): the FIFTH incremental
near-dup store — clip-signature semantics pinned against an
independent pure-Python model (per-frame dhash + temporal majority +
brute-force Hamming pairs + union-find), plus the store mechanics the
oracle can't see (replay, params pinning, crash seam). Everything
below the hash hook is inherited from ImgNearDupStore, so this suite
focuses on the hook and re-pins the shared contracts once each.
The driver-level oracle row is video_near_incremental
(queries_extensions.py — from-scratch SQL replay of the same model).
"""

from __future__ import annotations

import pytest

from time_series_storage_spark.operators.jpeg_codec import (
    bytes_to_mosaic,
)
from time_series_storage_spark.operators.phash import dhash_strip
from time_series_storage_spark.operators.video import (
    VideoNearDupStore,
    encode_video,
    sample_indices,
)

MAXH = 8
CHUNK = 48
NSAMP = 4


def _clip(text: str) -> bytearray:
    b = text.encode()
    return bytearray(
        encode_video(
            [
                bytes_to_mosaic(b[i : i + CHUNK])
                for i in range(0, len(b), CHUNK)
            ]
        )
    )


def _py_sig(text: str) -> int:
    b = text.encode()
    chunks = [b[i : i + CHUNK] for i in range(0, len(b), CHUNK)]
    hashes = []
    for k in sample_indices(len(chunks), NSAMP):
        c = chunks[k]
        strip = [c[(i * len(c)) // 64] for i in range(64)]
        hashes.append(dhash_strip(strip))
    s = 0
    for bit in range(63):
        if 2 * sum((h >> bit) & 1 for h in hashes) > len(hashes):
            s |= 1 << bit
    return s


def _py_model(day1: dict, day2: dict):
    def ham(a, b):
        return bin(a ^ b).count("1")

    def cluster(hs: dict) -> dict:
        parent = {i: i for i in hs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(hs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if ham(hs[a], hs[b]) <= MAXH:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        out: dict = {}
        for i in hs:
            out.setdefault(find(i), []).append(i)
        return {min(v): len(v) for v in out.values()}

    h1 = {i: _py_sig(t) for i, t in day1.items()}
    surv1 = cluster(h1)
    h2 = {i: _py_sig(t) for i, t in day2.items()}
    kept = {
        i: h
        for i, h in h2.items()
        if not any(ham(h, h1[s]) <= MAXH for s in surv1)
    }
    return surv1, cluster(kept)


T_A = "the quick brown fox jumps over the lazy dog " * 6
T_A2 = T_A[:200] + "EDITED FRAME CONTENT XX XX XXX" + T_A[230:]
T_C = "completely different content made of other words here " * 5
T_C2 = T_C[:100] + "one frame edit XYZ" + T_C[118:]
T_D = "numbers 0123 4567 89ab cdef repeated in a pattern row " * 5
T_E = "short single frame clip"

DAY1 = {1: T_A, 2: T_A2, 3: T_C}
DAY2 = {10: T_C2, 11: T_D, 12: T_E}


def _df(spark, day: dict):
    return spark.createDataFrame(
        [(i, _clip(t)) for i, t in day.items()],
        "id long, payload binary",
    )


def test_vidnd_sequential_two_day_model(spark, tmp_path):
    want1, want2 = _py_model(DAY1, DAY2)
    # the fixture must exercise both paths: a day-1 within-day cluster
    # and a day-2 history near-duplicate
    assert any(n > 1 for n in want1.values())
    assert len(want2) < len(DAY2)
    store = VideoNearDupStore(
        spark, str(tmp_path / "vids"), max_hamming=MAXH, n_samples=NSAMP
    )
    got1 = {
        r.id: r.n_members
        for r in store.absorb(_df(spark, DAY1), "id", "payload").collect()
    }
    assert got1 == want1
    got2 = {
        r.id: r.n_members
        for r in store.absorb(_df(spark, DAY2), "id", "payload").collect()
    }
    assert got2 == want2
    assert store.hashes().count() == len(want1) + len(want2)
    # stored hashes ARE the clip signatures of the python model
    sigs = {**{i: _py_sig(t) for i, t in DAY1.items()},
            **{i: _py_sig(t) for i, t in DAY2.items()}}
    assert {r.id: r.phash for r in store.hashes().collect()} == {
        i: sigs[i] for i in list(want1) + list(want2)
    }


def test_vidnd_replay_and_params(spark, tmp_path):
    import os

    store = VideoNearDupStore(
        spark, str(tmp_path / "vids"), max_hamming=MAXH, n_samples=NSAMP
    )
    s0 = store.absorb(_df(spark, DAY1), "id", "payload", batch_id=0)
    first = sorted(r.id for r in s0.collect())
    vdirs = sorted(
        n for n in os.listdir(tmp_path / "vids") if n.startswith("v")
    )
    s0r = store.absorb(_df(spark, DAY1), "id", "payload", batch_id=0)
    assert sorted(r.id for r in s0r.collect()) == first
    assert sorted(
        n for n in os.listdir(tmp_path / "vids") if n.startswith("v")
    ) == vdirs
    # reopening with different sampling params is a DIFFERENT artifact
    with pytest.raises(ValueError, match="incompatible artifact"):
        VideoNearDupStore(
            spark, str(tmp_path / "vids"), max_hamming=MAXH, n_samples=2
        )
    # and an image store cannot open a video artifact (identity pin)
    from time_series_storage_spark.operators.phash import ImgNearDupStore

    with pytest.raises(ValueError, match="incompatible artifact"):
        ImgNearDupStore(spark, str(tmp_path / "vids"), max_hamming=MAXH)


def test_vidnd_foreach_batch_streaming(spark, tmp_path):
    """End-to-end: a clip file stream near-deduped through the
    persisted store via the INHERITED foreachBatch — pre-stream
    history suppresses its near-dups, cross-batch dups are suppressed
    by the store's growth. (The hook subclasses share foreach_batch;
    this pins it once at the video modality.)"""
    store = VideoNearDupStore(
        spark, str(tmp_path / "vids"), max_hamming=MAXH, n_samples=NSAMP
    )
    store.absorb(_df(spark, {1: T_A, 3: T_C}), "id", "payload")

    src = str(tmp_path / "feed")
    _df(spark, {10: T_A2, 11: T_D}).coalesce(1).write.parquet(src + "/f0")
    _df(spark, {20: T_C2, 21: T_E}).coalesce(1).write.parquet(src + "/f1")

    emitted = []

    def emit(df, bid):
        emitted.extend(r.id for r in df.collect())

    q = (
        spark.readStream.schema("id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(
            store.foreach_batch("id", "payload", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    # 10 ~ stored 1, 20 ~ stored 3 (one-frame edits); 11 and 21 are
    # fresh — exactly those survive, in either file order
    assert sorted(emitted) == [11, 21]
    assert sorted(r.id for r in store.hashes().collect()) == [1, 3, 11, 21]


def test_vidnd_crash_recovery_via_shared_fault_seam(spark, tmp_path):
    store = VideoNearDupStore(
        spark, str(tmp_path / "vids"), max_hamming=MAXH, n_samples=NSAMP
    )
    store.absorb(_df(spark, DAY1), "id", "payload")
    before = {r.id for r in store.hashes().collect()}

    def boom(stage):
        if stage == "post_link":
            raise RuntimeError("injected crash")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.absorb(_df(spark, DAY2), "id", "payload")
    store._commit_fault = None
    assert {r.id for r in store.hashes().collect()} == before
    got = {
        r.id
        for r in store.absorb(_df(spark, DAY2), "id", "payload").collect()
    }
    _, want2 = _py_model(DAY1, DAY2)
    assert got == set(want2)
