"""Image perceptual near-dup (operators/phash.py): dHash semantics,
decode integration, and the perfect-recall pigeonhole guarantee of the
Hamming-band join.

The driver-level oracle row is img_near_dup (queries_extensions.py —
the oracle recomputes hash + bands + verify from source bytes in SQL);
these tests pin the pieces independently: the strip hash against a
bit-by-bit model, the decoded-image hash against the payload bytes
(mosaic construction makes them equal exactly), and banded candidate
generation against brute-force all-pairs on random hash sets —
including the hot-bucket guard and the recall bound."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.jpeg_codec import (
    bytes_to_mosaic,
    encode_jpeg,
)
from time_series_storage_spark.operators.phash import (
    PHASH_BANDS,
    PHASH_BITS,
    dhash_gray_image,
    dhash_strip,
    decode_jpeg_dhash,
    hamming_near_dup_pairs,
)


def test_dhash_strip_bits():
    # strictly increasing strip: no bit set; strictly decreasing: all
    strip_up = list(range(64))
    strip_down = list(range(64, 0, -1))
    assert dhash_strip(strip_up) == 0
    assert dhash_strip(strip_down) == (1 << PHASH_BITS) - 1
    # single descent at position k sets exactly bit k
    for k in (0, 31, 62):
        s = [0] * 64
        s[k] = 5
        assert dhash_strip(s) == 1 << k


def test_dhash_gray_image_equals_byte_model():
    """For a constant-tile mosaic the column means ARE the payload
    bytes, so the image hash must equal the strip hash over sampled
    bytes — the exact identity the SQL oracle relies on."""
    rng = np.random.RandomState(8)
    payload = bytes(rng.randint(0, 256, size=100, dtype=np.uint8))
    img = bytes_to_mosaic(payload)
    n = len(payload)
    strip = [payload[(i * n) // 64] for i in range(64)]
    assert dhash_gray_image(img) == dhash_strip(strip)
    with pytest.raises(ValueError, match="2-D"):
        dhash_gray_image(np.zeros((2, 2, 2)))


def test_decode_jpeg_dhash_roundtrip(spark):
    """encode -> real decode -> hash == hash of the source bytes, on
    the Spark mapInPandas path."""
    rng = np.random.RandomState(8)
    rows = []
    for i in range(6):
        payload = bytes(rng.randint(0, 256, size=64 + i, dtype=np.uint8))
        rows.append((i, payload, bytearray(encode_jpeg(bytes_to_mosaic(payload)))))
    df = spark.createDataFrame(
        [(i, j) for i, _p, j in rows], "id long, payload binary"
    )
    got = {r.id: r.phash for r in decode_jpeg_dhash(df).collect()}
    for i, payload, _j in rows:
        n = len(payload)
        strip = [payload[(k * n) // 64] for k in range(64)]
        want = dhash_strip(strip)
        # phash is int64; 63-bit hashes are always non-negative
        assert got[i] == want and got[i] >= 0


def _brute_pairs(hs: dict, thr: int) -> set:
    out = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hs[a] ^ hs[b]).count("1") <= thr:
                out.add((a, b, bin(hs[a] ^ hs[b]).count("1")))
    return out


@given(
    hs=st.lists(
        st.integers(min_value=0, max_value=(1 << PHASH_BITS) - 1),
        min_size=2,
        max_size=12,
    ),
    thr=st.integers(min_value=0, max_value=PHASH_BANDS - 1),
)
@settings(max_examples=5, deadline=None)
def test_banded_pairs_equal_brute_force(spark, hs, thr):
    """Pigeonhole perfect recall: for max_hamming <= bands - 1 the
    banded equi-join must return EXACTLY the brute-force pair set
    (LSH here is lossless, unlike the probabilistic MinHash bands)."""
    hd = dict(enumerate(hs))
    df = spark.createDataFrame(list(hd.items()), "id long, phash long")
    got = {
        (r.id1, r.id2, r.hamming)
        for r in hamming_near_dup_pairs(df, max_hamming=thr).collect()
    }
    assert got == _brute_pairs(hd, thr)


def test_near_dup_guards(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "id long, phash long")
    with pytest.raises(ValueError, match="perfect recall"):
        hamming_near_dup_pairs(df, max_hamming=PHASH_BANDS)
    # hot-bucket guard: 5 identical hashes all share every band; cap 4
    # drops the bucket entirely -> no pairs (boilerplate handled by
    # exact dedup instead)
    many = spark.createDataFrame(
        [(i, 7) for i in range(5)] + [(10, 1 << 40), (11, 1 << 40)],
        "id long, phash long",
    )
    got = {
        (r.id1, r.id2)
        for r in hamming_near_dup_pairs(
            many, max_hamming=0, max_bucket_size=4
        ).collect()
    }
    assert got == {(10, 11)}


def test_energy_hash_model_and_short_signals():
    """energy_hash_samples vs a direct per-window model, including
    signals shorter than 64 samples (empty windows carry (0,0): the
    cross-multiplied compare is False on both sides)."""
    from time_series_storage_spark.operators.phash import (
        energy_hash_samples,
    )

    rng = np.random.RandomState(8)
    for n in (3, 40, 64, 100, 256):
        a = rng.randint(0, 256, size=n).astype(np.int64)
        sums = [0] * 64
        cnts = [0] * 64
        for i, v in enumerate(a):
            w = (i * 64) // n
            sums[w] += int(v)
            cnts[w] += 1
        want = 0
        for w in range(63):
            if sums[w] * cnts[w + 1] > sums[w + 1] * cnts[w]:
                want |= 1 << w
        assert energy_hash_samples(a) == want, n
        assert 0 <= energy_hash_samples(a) < (1 << PHASH_BITS)
    with pytest.raises(ValueError, match="empty"):
        energy_hash_samples(np.array([]))


def test_decode_wav_ehash_roundtrip(spark):
    """encode -> RIFF parse -> PCM decode -> hash == hash of the
    source bytes, on the Spark mapInPandas path."""
    from time_series_storage_spark.operators.phash import (
        decode_wav_ehash,
        energy_hash_samples,
    )
    from time_series_storage_spark.operators.wav_codec import encode_wav

    rng = np.random.RandomState(8)
    rows = []
    for i in range(5):
        payload = rng.randint(0, 256, size=50 + 40 * i, dtype=np.uint8)
        rows.append((i, payload, bytearray(encode_wav(payload, 8000))))
    df = spark.createDataFrame(
        [(i, w) for i, _p, w in rows], "id long, payload binary"
    )
    got = {r.id: r.ahash for r in decode_wav_ehash(df).collect()}
    for i, payload, _w in rows:
        assert got[i] == energy_hash_samples(payload)


def test_perceptual_family_refuses_non_integral_ids(spark, tmp_path):
    """The family's persisted schemas and min-id winner rule are
    long-keyed; a string/UUID id must fail LOUDLY at every API
    boundary instead of being silently miscast downstream."""
    import pytest as _pytest

    from time_series_storage_spark.operators.phash import (
        AudioNearDupStore,
        ImgNearDupStore,
        decode_jpeg_dhash,
        decode_wav_ehash,
    )
    from time_series_storage_spark.operators.video import (
        VideoNearDupStore,
        video_frame_sample,
    )

    media = spark.createDataFrame(
        [("doc-a", bytearray(b"\x00"))], "id string, payload binary"
    )
    for fn in (decode_jpeg_dhash, decode_wav_ehash, video_frame_sample):
        with _pytest.raises(TypeError, match="integral id"):
            fn(media, "id", "payload")
    for cls in (ImgNearDupStore, AudioNearDupStore, VideoNearDupStore):
        store = cls(spark, str(tmp_path / cls.__name__))
        with _pytest.raises(TypeError, match="integral id"):
            store.dedup_increment(media, "id", "payload")
        with _pytest.raises(TypeError, match="integral id"):
            store.absorb(media, "id", "payload")
    # integral ids of any width pass the boundary check
    ok = spark.createDataFrame([(3, bytearray(b"x"))],
                               "id int, payload binary")
    decode_jpeg_dhash(ok, "id", "payload")  # lazy: schema check only
