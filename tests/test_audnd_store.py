"""AudioNearDupStore (operators/phash.py): the SIXTH incremental
near-dup store — the energy-hash modality on the shared
ImgNearDupStore machinery via the `_hash_increment` hook. The shared
contracts (replay, crash seam, compact) are pinned once in
test_imgnd_store / test_vidnd_store; this suite pins the hook's
sequential two-day semantics against a pure-Python model and the
params identity between the three hook subclasses. The driver-level
oracle row is audio_near_incremental (queries_extensions.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from time_series_storage_spark.operators.phash import (
    AudioNearDupStore,
    ImgNearDupStore,
    energy_hash_samples,
)
from time_series_storage_spark.operators.wav_codec import encode_wav

MAXH = 8


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

    h1 = {i: energy_hash_samples(p) for i, p in day1.items()}
    surv1 = cluster(h1)
    h2 = {i: energy_hash_samples(p) for i, p in day2.items()}
    kept = {
        i: h
        for i, h in h2.items()
        if not any(ham(h, h1[s]) <= MAXH for s in surv1)
    }
    return surv1, cluster(kept)


def _signals():
    rng = np.random.RandomState(8)
    a = rng.randint(0, 256, size=96, dtype=np.uint8)
    a2 = a.copy()
    a2[10] ^= 1  # tiny envelope nudge -> near-dup of a
    c = rng.randint(0, 256, size=96, dtype=np.uint8)
    d = rng.randint(0, 256, size=80, dtype=np.uint8)
    c2 = c.copy()
    c2[3] ^= 1  # day-2 near-dup of day-1 c
    e = rng.randint(0, 256, size=64, dtype=np.uint8)
    return {1: a, 2: a2, 3: c}, {10: c2, 11: d, 12: e}


def _df(spark, day: dict):
    return spark.createDataFrame(
        [
            (i, bytearray(encode_wav(p, sample_rate=8_000)))
            for i, p in day.items()
        ],
        "id long, payload binary",
    )


def test_audnd_sequential_two_day_model(spark, tmp_path):
    day1, day2 = _signals()
    want1, want2 = _py_model(day1, day2)
    assert any(n > 1 for n in want1.values())  # within-day cluster
    assert len(want2) < len(day2)  # history near-dup suppressed
    store = AudioNearDupStore(
        spark, str(tmp_path / "auds"), max_hamming=MAXH
    )
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
    # stored hashes ARE the decoded-PCM envelope hashes of the model
    sigs = {
        **{i: energy_hash_samples(p) for i, p in day1.items()},
        **{i: energy_hash_samples(p) for i, p in day2.items()},
    }
    assert {r.id: r.phash for r in store.hashes().collect()} == {
        i: sigs[i] for i in list(want1) + list(want2)
    }


def test_audnd_modality_identity_pinned(spark, tmp_path):
    """An audio artifact cannot be reopened as an image store and
    vice versa — the hook subclasses pin DISTINCT params."""
    day1, _ = _signals()
    store = AudioNearDupStore(
        spark, str(tmp_path / "auds"), max_hamming=MAXH
    )
    store.absorb(_df(spark, day1), "id", "payload")
    with pytest.raises(ValueError, match="incompatible artifact"):
        ImgNearDupStore(spark, str(tmp_path / "auds"), max_hamming=MAXH)
    with pytest.raises(ValueError, match="incompatible artifact"):
        AudioNearDupStore(spark, str(tmp_path / "auds"), max_hamming=3)
    # same params reopen serves the same artifact
    again = AudioNearDupStore(
        spark, str(tmp_path / "auds"), max_hamming=MAXH
    )
    assert again.hashes().count() == store.hashes().count()
