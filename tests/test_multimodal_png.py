"""Real PNG decode behind the multimodal seam (VERDICT r4 item 7).

Pillow is absent from the container, so the "real decode" path is the
pure-stdlib codec in operators/png_codec.py. These tests prove it is a
real decode — actual compressed PNGs in, exact pixels out, through
every scanline filter — and that `decode_stub=False` drives it through
the same Arrow mapInPandas plumbing the stub path uses.
"""

from __future__ import annotations

import numpy as np
import pytest

from time_series_storage_spark.operators.multimodal import (
    _fake_frame_hashes,
    attach_media,
    extract_features,
    extract_frames,
)
from time_series_storage_spark.operators.png_codec import (
    decode_png,
    encode_png,
    is_png,
)


def _img(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(channels, filter_type):
    img = _img(13, 7, channels, seed=channels * 10 + filter_type)
    data = encode_png(img, filter_type=filter_type)
    assert is_png(data)
    out = decode_png(data)
    assert out.shape == (13, 7, channels)
    assert np.array_equal(out, img)


def test_png_roundtrip_mixed_filters_per_row():
    img = _img(10, 5, 3, seed=42)
    data = encode_png(img, filter_type=[y % 5 for y in range(10)])
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_corruption():
    img = _img(6, 6, 3, seed=1)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(data[4:]))
    flipped = data.copy()
    flipped[40] ^= 0xFF  # somewhere inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError):
        decode_png(bytes(data[: len(data) // 2]))  # truncated


def test_extract_frames_real_decode(spark):
    """decode_stub=False decodes real PNGs inside mapInPandas: the
    frame hashes equal the stub hash function applied to the DECODED
    pixel bytes, not the compressed payload."""
    imgs = {i: _img(8, 25, 3, seed=i) for i in range(4)}
    rows = [(i, bytearray(encode_png(img))) for i, img in imgs.items()]
    media = attach_media(
        spark.createDataFrame(rows, ["doc_id", "payload"]),
        "doc_id", "payload", fmt="png",
    )
    got: dict[int, list[int]] = {}
    for r in extract_frames(media, decode_stub=False).collect():
        got.setdefault(r["id"], []).append((r["frame_id"], r["frame_hash"]))
    for i, img in imgs.items():
        want = list(enumerate(_fake_frame_hashes(img.tobytes())))
        assert sorted(got[i]) == want, i
        # and differs from hashing the compressed bytes (stub path)
        stub = list(enumerate(_fake_frame_hashes(encode_png(img))))
        assert sorted(got[i]) != stub


def test_extract_features_real_decode(spark):
    img = _img(9, 11, 3, seed=7)
    media = attach_media(
        spark.createDataFrame(
            [(1, bytearray(encode_png(img)))], ["doc_id", "payload"]
        ),
        "doc_id", "payload", fmt="png",
    )
    [row] = extract_features(media, decode_stub=False).collect()
    raw = np.frombuffer(img.tobytes(), dtype=np.uint8).astype(np.int64)
    pad = (-len(raw)) % 8
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, dtype=np.int64)])
    want = [float(v) for v in raw.reshape(-1, 8).sum(axis=0) % 1000]
    assert row["feature"] == want


def test_unsupported_payload_still_raises(spark):
    """The seam's contract for formats without an in-container codec
    is unchanged: a loud NotImplementedError, not silent garbage.
    (WAV grew a real codec — wav_codec.py — so the no-codec case is
    now an MP3-ish payload; a malformed RIFF container instead raises
    the codec's own loud ValueError, tested in test_multimodal_wav.)"""
    media = attach_media(
        spark.createDataFrame([(1, bytearray(b"ID3\x04mp3-ish-payload"))],
                              ["doc_id", "payload"]),
        "doc_id", "payload", fmt="mp3",
    )
    with pytest.raises(Exception, match="NotImplementedError|PCM WAV only"):
        extract_frames(media, decode_stub=False).collect()
