"""Real PCM WAV decode behind the multimodal seam.

torchaudio/soundfile are absent from the container, so the "real
decode" audio path is the pure-stdlib codec in operators/wav_codec.py.
These tests prove it is a real decode — actual RIFF containers in,
exact samples out, across bit depths and channel counts — that corrupt
and compressed payloads fail loudly, and that ``decode_stub=False``
drives it through the same Arrow mapInPandas plumbing as the PNG path.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from time_series_storage_spark.operators.multimodal import (
    _fake_frame_hashes,
    attach_media,
    extract_features,
    extract_frames,
)
from time_series_storage_spark.operators.wav_codec import (
    decode_wav,
    encode_wav,
    is_wav,
)


def _samples(n, channels, dtype, seed):
    rng = np.random.RandomState(seed)
    info = np.iinfo(dtype)
    return rng.randint(
        info.min, int(info.max) + 1, (n, channels)
    ).astype(dtype)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32])
@pytest.mark.parametrize("channels", [1, 2, 6])
def test_wav_roundtrip_depths_and_channels(dtype, channels):
    s = _samples(441, channels, dtype, seed=channels)
    data = encode_wav(s, sample_rate=44_100)
    assert is_wav(data)
    out, rate = decode_wav(data)
    assert rate == 44_100
    assert out.dtype == np.dtype(dtype) and out.shape == s.shape
    assert np.array_equal(out, s)


def test_wav_chunk_order_agnostic_and_skips_unknown_chunks():
    s = _samples(100, 1, np.int16, seed=7)
    data = bytearray(encode_wav(s, sample_rate=8_000))
    # splice an unknown (odd-sized, word-padded) chunk between fmt and data
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"
    fmt_end = 12 + 8 + 16
    patched = bytes(data[:fmt_end]) + junk + bytes(data[fmt_end:])
    patched = (
        b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    )
    out, rate = decode_wav(patched)
    assert rate == 8_000 and np.array_equal(out, s)


def test_wav_rejects_garbage_truncation_and_compressed():
    s = _samples(64, 1, np.int16, seed=1)
    good = encode_wav(s)
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 64)  # not RIFF
    with pytest.raises(ValueError):
        decode_wav(good[: len(good) // 2])  # truncated data chunk
    mangled = bytearray(good)
    mangled[20] = 2  # format tag 2 = ADPCM (compressed)
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(mangled))
    odd = bytearray(good)
    odd[32] = 3  # block align inconsistent with channels*width
    with pytest.raises(ValueError, match="layout"):
        decode_wav(bytes(odd))


def test_real_wav_decode_through_frame_extraction(spark):
    """decode_stub=False on WAV media: frame hashes are computed over
    the DECODED PCM sample bytes (not the RIFF container), through the
    same mapInPandas plumbing as the stub and PNG paths."""
    clips = {
        1: _samples(300, 1, np.int16, seed=11),
        2: _samples(80, 2, np.int16, seed=22),
    }
    rows = [(i, bytearray(encode_wav(s))) for i, s in clips.items()]
    media = attach_media(
        spark.createDataFrame(rows, ["doc_id", "raw"]), "doc_id", "raw",
        fmt="wav",
    )
    got = {}
    for r in extract_frames(media, decode_stub=False).collect():
        got.setdefault(r["id"], []).append((r["frame_id"], r["frame_hash"]))
    for i, s in clips.items():
        want = list(enumerate(_fake_frame_hashes(s.tobytes())))
        assert sorted(got[i]) == want
    # corrupt payload fails the job loudly instead of hashing garbage
    bad = attach_media(
        spark.createDataFrame([(9, bytearray(b"RIFF\x00\x00\x00\x00WAVE"))],
                              ["doc_id", "raw"]),
        "doc_id", "raw", fmt="wav",
    )
    with pytest.raises(Exception):
        extract_frames(bad, decode_stub=False).collect()


def test_real_wav_decode_through_feature_extraction(spark):
    """decode_stub=False feature vectors summarize decoded samples —
    mixed PNG/WAV media batches route each payload to its codec."""
    from time_series_storage_spark.operators.png_codec import encode_png

    wav = _samples(200, 1, np.int16, seed=5)
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (9, 9, 3), dtype=np.uint8)
    rows = [(1, bytearray(encode_wav(wav))), (2, bytearray(encode_png(img)))]
    media = attach_media(
        spark.createDataFrame(rows, ["doc_id", "raw"]), "doc_id", "raw",
    )
    out = {
        r["id"]: r["feature"]
        for r in extract_features(media, dim=4, decode_stub=False).collect()
    }
    def expect(raw_bytes):
        raw = np.frombuffer(raw_bytes, dtype=np.uint8).astype(np.int64)
        pad = (-len(raw)) % 4
        if pad:
            raw = np.concatenate([raw, np.zeros(pad, dtype=np.int64)])
        return [float(v) for v in raw.reshape(-1, 4).sum(axis=0) % 1000]
    assert out[1] == expect(wav.tobytes())
    assert out[2] == expect(img.tobytes())


def test_skip_mode_quarantines_corrupt_payloads(spark):
    """on_error='skip': corrupt payloads drop without killing the job,
    good items still decode exactly, and decode_errors() lists each
    dropped id with a reason — the 100 TB bad-records contract."""
    from time_series_storage_spark.operators.multimodal import decode_errors

    good = _samples(150, 1, np.int16, seed=3)
    rows = [
        (1, bytearray(encode_wav(good))),
        (2, bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk")),   # no data chunk
        (3, bytearray(b"\x00\x01\x02not-a-container")),    # unknown format
    ]
    media = attach_media(
        spark.createDataFrame(rows, ["doc_id", "raw"]), "doc_id", "raw",
    )
    got = {}
    for r in extract_frames(media, decode_stub=False, on_error="skip").collect():
        got.setdefault(r["id"], []).append((r["frame_id"], r["frame_hash"]))
    assert sorted(got) == [1]
    assert sorted(got[1]) == list(enumerate(_fake_frame_hashes(good.tobytes())))
    errs = {r["id"]: r["error"] for r in decode_errors(media).collect()}
    assert sorted(errs) == [2, 3]
    assert "data chunk" in errs[2] and "NotImplementedError" in errs[3]
    # raise mode still fails loudly on the same input
    with pytest.raises(Exception):
        extract_frames(media, decode_stub=False, on_error="raise").collect()
