"""ImgNearDupStore (operators/phash.py): the fourth incremental
near-dup store — sequential two-day semantics pinned against an
independent pure-Python model (dhash + brute-force Hamming pairs +
union-find), the exactly-once batch replay contract, crash recovery
through the shared snapshot protocol's fault seam, and params/format
pinning. The driver-level oracle row is img_near_incremental
(queries_extensions.py — from-scratch SQL replay of the same model).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.jpeg_codec import (
    bytes_to_mosaic,
    encode_jpeg,
)
from time_series_storage_spark.operators.phash import (
    PHASH_SAMPLES,
    ImgNearDupStore,
    dhash_strip,
)

MAXH = 8


def _py_hash(payload: bytes) -> int:
    n = len(payload)
    return dhash_strip(
        [payload[(i * n) // PHASH_SAMPLES] for i in range(PHASH_SAMPLES)]
    )


def _py_model(day1: dict, day2: dict):
    """Sequential store model: day-1 brute pairs + union-find -> min-id
    survivors; day-2 drop anything within MAXH of a RETAINED survivor,
    then cluster the remainder. Returns (day1_surv, day2_surv) as
    {survivor_id: n_members}."""

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

    h1 = {i: _py_hash(p) for i, p in day1.items()}
    surv1 = cluster(h1)
    h2 = {i: _py_hash(p) for i, p in day2.items()}
    kept = {
        i: h
        for i, h in h2.items()
        if not any(ham(h, h1[s]) <= MAXH for s in surv1)
    }
    return surv1, cluster(kept)


def _payloads():
    rng = np.random.RandomState(8)
    a = bytes(rng.randint(0, 256, size=96, dtype=np.uint8))
    # near-dup of a: flip one byte's low bits (small brightness nudge
    # moves few strip comparisons)
    a2 = bytearray(a)
    a2[10] ^= 1
    a2 = bytes(a2)
    c = bytes(rng.randint(0, 256, size=96, dtype=np.uint8))
    d = bytes(rng.randint(0, 256, size=80, dtype=np.uint8))
    # near-dup of c arriving on day 2
    c2 = bytearray(c)
    c2[3] ^= 1
    c2 = bytes(c2)
    e = bytes(rng.randint(0, 256, size=64, dtype=np.uint8))
    day1 = {1: a, 2: a2, 3: c}
    day2 = {10: c2, 11: d, 12: e}
    return day1, day2


def _df(spark, day: dict):
    return spark.createDataFrame(
        [(i, bytearray(encode_jpeg(bytes_to_mosaic(p)))) for i, p in day.items()],
        "id long, payload binary",
    )


def test_imgnd_sequential_two_day_model(spark, tmp_path):
    day1, day2 = _payloads()
    want1, want2 = _py_model(day1, day2)
    # the fixture must actually exercise both paths: a day-1 cluster
    # and a day-2 history duplicate
    assert any(n > 1 for n in want1.values())
    assert len(want2) < len(day2)
    store = ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=MAXH)
    got1 = {
        r.id: r.n_members
        for r in store.absorb(_df(spark, day1), "id", "payload").collect()
    }
    assert got1 == want1
    got2 = {
        r.id: r.n_members
        for r in store.absorb(_df(spark, day2), "id", "payload").collect()
    }
    assert got2 == want2
    # pure read equals the absorb emission it would produce (and the
    # store state is day1+day2 survivors now)
    assert store.hashes().count() == len(want1) + len(want2)


def test_imgnd_batch_replay_exactly_once(spark, tmp_path):
    import os

    day1, day2 = _payloads()
    store = ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=MAXH)
    s0 = store.absorb(_df(spark, day1), "id", "payload", batch_id=0)
    first = sorted(r.id for r in s0.collect())
    vdirs = sorted(
        n for n in os.listdir(tmp_path / "imgs") if n.startswith("v")
    )
    # replay of the committed batch re-emits the SAME survivors from
    # the SAME files — no new version
    s0r = store.absorb(_df(spark, day1), "id", "payload", batch_id=0)
    assert sorted(r.id for r in s0r.collect()) == first
    assert sorted(
        n for n in os.listdir(tmp_path / "imgs") if n.startswith("v")
    ) == vdirs
    # an older batch returns empty
    s_old = store.absorb(_df(spark, day2), "id", "payload", batch_id=-1)
    assert s_old.count() == 0
    # the next batch advances
    s1 = store.absorb(_df(spark, day2), "id", "payload", batch_id=1)
    assert s1.count() > 0


def test_imgnd_crash_recovery_via_shared_fault_seam(spark, tmp_path):
    day1, day2 = _payloads()
    store = ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=MAXH)
    store.absorb(_df(spark, day1), "id", "payload")
    before = {r.id for r in store.hashes().collect()}

    def boom(stage):
        if stage == "post_link":
            raise RuntimeError("injected crash")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.absorb(_df(spark, day2), "id", "payload")
    store._commit_fault = None
    # reader still on the old complete snapshot
    assert {r.id for r in store.hashes().collect()} == before
    # retry lands cleanly and emits the full increment survivors
    got = {r.id for r in store.absorb(_df(spark, day2), "id", "payload").collect()}
    _, want2 = _py_model(day1, day2)
    assert got == set(want2)


def test_imgnd_params_pinned(spark, tmp_path):
    day1, _ = _payloads()
    store = ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=MAXH)
    store.absorb(_df(spark, day1), "id", "payload")
    with pytest.raises(ValueError, match="incompatible artifact"):
        ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=3)


def test_imgnd_compact_preserves_tables_per_prefix(spark, tmp_path):
    """Base-class compact on a multi-table store: each table prefix
    consolidates SEPARATELY (hash rows never mix into band rows), the
    store reads identically after, and a later absorb still dedups
    against the compacted history."""
    import os

    day1, day2 = _payloads()
    store = ImgNearDupStore(spark, str(tmp_path / "imgs"), max_hamming=MAXH)
    store.absorb(_df(spark, day1), "id", "payload")
    store.absorb(_df(spark, day2), "id", "payload")
    hashes_before = {(r.id, r.phash) for r in store.hashes().collect()}
    bands_before = {
        (r.id, r.band_id, r.band_key) for r in store.bands().collect()
    }
    n = store.compact()
    cur = store._current_dir()
    files = sorted(f for f in os.listdir(cur) if f.endswith(".parquet"))
    # one file per table (hash, band, surv)
    assert n == 3 and len(files) == 3
    assert {f.split("-", 1)[0] for f in files} == {"hash", "band", "surv"}
    assert {(r.id, r.phash) for r in store.hashes().collect()} == hashes_before
    assert {
        (r.id, r.band_id, r.band_key) for r in store.bands().collect()
    } == bands_before
    # an exact re-send of a stored image is a history dup after compact
    first_id, first_payload = next(iter(day1.items()))
    again = _df(spark, {99: first_payload})
    out = store.absorb(again, "id", "payload")
    assert out.count() == 0
