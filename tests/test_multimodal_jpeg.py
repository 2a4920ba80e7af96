"""Baseline grayscale JPEG codec (operators/jpeg_codec.py) and its
integration with the multimodal real-decode seam.

The driver-level oracle row is jpeg_gray_decode (the tile-mosaic
construction whose flat-Q DC path is exactly invertible, hash-gated
corpus-wide); these tests pin the codec itself: lossy-but-bounded
reconstruction on arbitrary images, exact mosaic recovery, every DC
difference category, EOB/ZRL entropy paths, loud rejection of
unsupported variants and corruption, and mixed-format routing through
``extract_frames(decode_stub=False)`` alongside PNG and WAV payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from time_series_storage_spark.operators.jpeg_codec import (
    FLAT_Q,
    bytes_to_mosaic,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
    mosaic_to_bytes,
)


def test_jpeg_mosaic_roundtrip_exact():
    """All 256 byte values through encode -> entropy decode -> IDCT:
    the flat-Q DC path must recover every byte exactly (this is the
    gate's invariant). Covers every DC difference category (byte
    jumps up to +/-255 -> categories 0..9) and EOB on every block."""
    payload = bytes(range(256)) + bytes(reversed(range(256)))
    img = bytes_to_mosaic(payload)
    enc = encode_jpeg(img)
    assert is_jpeg(enc)
    assert mosaic_to_bytes(decode_jpeg(enc)) == payload


def test_jpeg_lossy_bounded_on_general_images():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (37, 53)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    # AC step 16 bounds per-coefficient error; reconstruction error on
    # uncorrelated noise stays well inside a quant step's reach
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 40
    # smooth gradient: near-exact
    x = np.linspace(0, 255, 64)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dsm = decode_jpeg(encode_jpeg(smooth))
    assert np.abs(dsm.astype(int) - smooth.astype(int)).max() <= 8


def test_jpeg_nonmultiple_of_8_dims_and_zrl_path():
    # 9x17 forces edge padding + crop; a sparse image with one hot
    # pixel far into the zigzag exercises ZRL (16-zero runs)
    img = np.zeros((9, 17), dtype=np.uint8)
    img[8, 16] = 255
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (9, 17)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 40


def test_jpeg_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")
    enc = encode_jpeg(bytes_to_mosaic(b"abc"))
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])  # truncated scan
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), qtable=[0] * 64)
    with pytest.raises(ValueError, match="non-constant"):
        mosaic_to_bytes(np.arange(64, dtype=np.uint8).reshape(8, 8))


def test_jpeg_size_bounds_loud():
    # SOF0 packs dims as >H: oversize must raise ValueError, not a
    # struct.error from the packer
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(np.zeros((1, 65536), dtype=np.uint8))
    with pytest.raises(ValueError, match="8191"):
        bytes_to_mosaic(b"x" * 8192)
    # the documented max payload still encodes (width 8*8191=65528)
    assert bytes_to_mosaic(b"x" * 8191).shape == (8, 65528)


def test_jpeg_zrl_past_block_end_rejected():
    """A corrupt scan whose ZRL symbols run past coefficient 63 must
    fail loudly (reject-loudly contract), not silently drop
    coefficients and desync the bitstream."""
    from time_series_storage_spark.operators.jpeg_codec import (
        _AC_ENC,
        _BitWriter,
        _DC_ENC,
    )

    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    sos = good.find(b"\xff\xda")
    assert sos > 0
    seg_len = int.from_bytes(good[sos + 2 : sos + 4], "big")
    head = good[: sos + 2 + seg_len]
    bw = _BitWriter()
    bw.write(*_DC_ENC[0])  # DC diff category 0 (no magnitude bits)
    for _ in range(4):  # 4 x ZRL: k = 1+16*4 = 65 > 63
        bw.write(*_AC_ENC[0xF0])
    corrupt = head + bw.flush() + b"\xff\xd9"
    with pytest.raises(ValueError, match="ZRL"):
        decode_jpeg(corrupt)


def test_jpeg_custom_qtable_roundtrip():
    """The decoder must use the DQT from the STREAM, not assume
    FLAT_Q: a coarser table still roundtrips the constant-tile mosaic
    when its DC step divides 8*delta... use DC step 4 (finer) to keep
    exactness and prove the table travels."""
    q = np.asarray(FLAT_Q).copy()
    q[0] = 4
    payload = b"spark"
    enc = encode_jpeg(bytes_to_mosaic(payload), qtable=q)
    assert mosaic_to_bytes(decode_jpeg(enc)) == payload


def test_mixed_format_routing_through_extract_frames(spark):
    """One media frame with PNG, WAV and JPEG payloads in the SAME
    batch: extract_frames(decode_stub=False) must route each payload
    to its codec by magic bytes and hash the decoded bytes."""
    from time_series_storage_spark.operators import multimodal as M
    from time_series_storage_spark.operators.png_codec import encode_png
    from time_series_storage_spark.operators.wav_codec import encode_wav

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    samples = np.arange(40, dtype=np.uint8)
    jm = bytes_to_mosaic(b"jpeg!")
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(encode_wav(samples, sample_rate=8000))),
        (3, bytearray(encode_jpeg(jm))),
    ]
    media = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        (r.id, r.frame_id): r.frame_hash
        for r in M.extract_frames(media, decode_stub=False).collect()
    }
    # expected: stub hash over each codec's DECODED bytes
    exp = {}
    for i, raw in (
        (1, img.tobytes()),
        (2, samples.tobytes()),
        (3, decode_jpeg(encode_jpeg(jm)).tobytes()),
    ):
        for fid, h in enumerate(M._fake_frame_hashes(raw)):
            exp[(i, fid)] = h
    assert got == exp
