"""Pure-stdlib PNG codec — a REAL image decode behind the multimodal
seam, no external codec dependency.

The container ships no PIL/pyav, but PNG needs neither: the format is
zlib (stdlib) over byte-filtered scanlines plus CRC-checked chunks
(struct + zlib.crc32). This module implements the subset a test/data
pipeline generates itself — 8-bit depth, greyscale / RGB / RGBA, no
interlace — with all five scanline filters (None/Sub/Up/Average/Paeth)
on both the encode and decode side, so the decoder is exercised
against every filter path, not just the trivial one.

Scope note: the per-scanline unfilter loops are written for clarity
and correctness, not throughput — swapping in PIL/libpng behind
``multimodal.extract_frames(decode_stub=False)`` is a one-line change
and every schema/partitioning/batch contract around it stays as
tested. The point of this module is that the "real decode" path is a
real decode: actual compressed image bytes in, actual pixels out,
verified by round-trip and by rejecting corrupt input.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 3: 2, 4: 6}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (RFC 2083 section 6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img, filter_type=0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a PNG.

    ``filter_type`` is an int applied to every scanline or a per-row
    sequence — exposing the filter choice lets tests drive the decoder
    through every unfilter path with known pixels.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = _CHANNELS_TO_COLOR[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        line = img[y].astype(np.int64).reshape(-1)
        f = int(filter_type if isinstance(filter_type, int) else filter_type[y])
        left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if f == 0:
            out = line
        elif f == 1:
            out = line - left
        elif f == 2:
            out = line - prev
        elif f == 3:
            out = line - (left + prev) // 2
        elif f == 4:
            out = line - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array.

    Supports 8-bit greyscale/RGB/RGBA, non-interlaced — the subset
    :func:`encode_png` emits. Chunk CRCs are verified; corrupt or
    truncated input raises ``ValueError``, unsupported-but-valid PNG
    variants raise ``NotImplementedError``.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = channels = None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color not in _COLOR_TO_CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG variant (depth={depth}, "
                    f"color={color}, interlace={interlace})"
                )
            channels = _COLOR_TO_CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    bpp = channels
    img = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = np.frombuffer(raw[p : p + stride], np.uint8).astype(np.int64)
        p += stride
        if f == 0:
            cur = line.copy()
        elif f == 1:
            # Sub: cur[i] = line[i] + cur[i-bpp] — a per-channel
            # cumulative sum mod 256
            cur = line.copy()
            for r in range(bpp):
                cur[r::bpp] = np.cumsum(line[r::bpp]) % 256
        elif f == 2:
            cur = (line + prev) % 256
        elif f == 3:
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif f == 4:
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        img[y] = cur
        prev = cur
    return img.reshape(h, w, channels).astype(np.uint8)
