"""Bitwise-equality suite for the jpeg_codec fast paths (r13
optimization): the constant-tile encode path (DCT skipped), the
table-driven entropy reader, and the DC-only IDCT path must produce
BYTE-IDENTICAL output to the general einsum + sequential-reader paths
(toggled via jpeg_codec._DISABLE_FAST) on every input — and identical
errors on corrupt streams."""

from __future__ import annotations

import numpy as np
import pytest

from time_series_storage_spark.operators import jpeg_codec as jc


@pytest.fixture
def general_path(monkeypatch):
    """Callable that runs fn with the fast paths disabled."""

    def run(fn, *args, **kw):
        monkeypatch.setattr(jc, "_DISABLE_FAST", True)
        try:
            return fn(*args, **kw)
        finally:
            monkeypatch.setattr(jc, "_DISABLE_FAST", False)

    return run


def test_mosaic_encode_bitwise_exhaustive_values(general_path):
    # every byte value appears; payload spans multiple widths
    for L in (1, 2, 7, 48, 255, 256, 384):
        payload = bytes((i * 37 + L) % 256 for i in range(L))
        img = jc.bytes_to_mosaic(payload)
        assert jc.encode_jpeg(img) == general_path(jc.encode_jpeg, img)
    payload = bytes(range(256))
    img = jc.bytes_to_mosaic(payload)
    assert jc.encode_jpeg(img) == general_path(jc.encode_jpeg, img)


def test_mosaic_decode_bitwise(general_path):
    for L in (1, 48, 384, 1024):
        payload = bytes((i * 101 + 13) % 256 for i in range(L))
        enc = jc.encode_jpeg(jc.bytes_to_mosaic(payload))
        fast = jc.decode_jpeg(enc)
        slow = general_path(jc.decode_jpeg, enc)
        assert (fast == slow).all()
        # and the mosaic roundtrip invariant that the oracle gates
        # depend on survives the fast paths
        assert jc.mosaic_to_bytes(fast[:, : 8 * L]) == payload


def test_general_images_bitwise_fuzz(general_path):
    rng = np.random.default_rng(987)
    for _ in range(25):
        h = int(rng.integers(1, 33))
        w = int(rng.integers(1, 129))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        e_fast = jc.encode_jpeg(img)
        e_slow = general_path(jc.encode_jpeg, img)
        assert e_fast == e_slow
        d_fast = jc.decode_jpeg(e_fast)
        d_slow = general_path(jc.decode_jpeg, e_fast)
        assert (d_fast == d_slow).all()


def test_non_flat_dc_qtable_takes_general_path(general_path):
    # q[0] != 8 must not take the constant-tile shortcut (the DC
    # ratio can land on a .5 rounding boundary there)
    q2 = np.full(64, 16, dtype=np.int32)
    img = jc.bytes_to_mosaic(bytes(range(64)))
    assert jc.encode_jpeg(img, q2) == general_path(jc.encode_jpeg, img, q2)


def test_corrupt_streams_same_errors(general_path):
    enc = jc.encode_jpeg(jc.bytes_to_mosaic(bytes(range(100))))

    def outcome(fn, data):
        try:
            fn(data)
            return None
        except ValueError as ex:
            return str(ex)

    for mut in (enc[: len(enc) // 2], enc[:-4], b"zz" + enc[2:]):
        fast = outcome(jc.decode_jpeg, mut)
        slow = outcome(lambda d: general_path(jc.decode_jpeg, d), mut)
        assert fast == slow
        assert fast is not None or mut == enc


def test_bad_stuffing_falls_back_to_sequential_reader():
    # a 0xFF not followed by 0x00 inside the scan must still raise the
    # sequential reader's error (lazy placement preserved)
    enc = bytearray(jc.encode_jpeg(jc.bytes_to_mosaic(bytes(range(32)))))
    # find the SOS payload start and plant a bare 0xFF 0x01 in the scan
    sos = bytes(enc).find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + int.from_bytes(enc[sos + 2 : sos + 4], "big")
    enc[scan_start : scan_start + 2] = b"\xff\x01"
    with pytest.raises(ValueError, match="stuffing|marker"):
        jc.decode_jpeg(bytes(enc))


def test_vectorized_entropy_encode_stuffing_dense(general_path):
    # max-magnitude DC diffs (0 <-> 255) produce 0xFF-dense entropy
    # bytes — the vectorized encoder's byte-stuffing and 1-padding
    # must match the writer loop bit for bit
    for L in (1, 2, 3, 64, 255):
        payload = bytes(([0, 255] * ((L + 1) // 2))[:L])
        img = jc.bytes_to_mosaic(payload)
        enc = jc.encode_jpeg(img)
        assert enc == general_path(jc.encode_jpeg, img)
        fast = jc.decode_jpeg(enc)
        assert (fast == general_path(jc.decode_jpeg, enc)).all()
        assert jc.mosaic_to_bytes(fast[:, : 8 * L]) == payload


def test_speculative_decode_bails_on_mixed_stream(general_path):
    # one non-constant tile forces an AC coefficient: the DC-only
    # speculation must fall back to the general reader and still
    # produce bit-identical pixels
    img = jc.bytes_to_mosaic(bytes(range(48))).copy()
    img[0, 0] = 255  # break tile 0's constancy (encoder takes the
    # general einsum path, stream carries AC symbols)
    enc = jc.encode_jpeg(img)
    assert enc == general_path(jc.encode_jpeg, img)
    d_fast = jc.decode_jpeg(enc)
    d_slow = general_path(jc.decode_jpeg, enc)
    assert (d_fast == d_slow).all()


def test_dc_only_idct_grouping_pinned():
    # the fast IDCT's product grouping must match the einsum term
    # grouping bit-for-bit: (C00 * dc) * C00
    rng = np.random.default_rng(5)
    dc = (rng.integers(-255, 256, size=(3, 17)) * 8).astype(np.float64)
    coef = np.zeros((3, 17, 8, 8))
    coef[:, :, 0, 0] = dc
    pix = np.einsum("ji,bcjk,kl->bcil", jc._C, coef, jc._C)
    fast = (jc._C[0, 0] * dc) * jc._C[0, 0]
    for i in range(8):
        for l in range(8):
            assert (pix[:, :, i, l] == fast).all()
