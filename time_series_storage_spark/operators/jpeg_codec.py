"""Pure-numpy baseline JPEG codec (grayscale) — the third REAL media
decode behind the multimodal seam, no external codec dependency.

The container ships no PIL/libjpeg, but baseline sequential JPEG for a
single grayscale component needs only struct + numpy: 8x8 DCT-II as a
matrix product, quantization, zigzag + DC DPCM, canonical Huffman
coding with the interchange-format tables (ITU-T T.81 Annex K), and
JFIF segment framing with 0xFF byte stuffing. Implemented on BOTH
sides — encode and decode — so the decoder is exercised against real
entropy-coded data covering every DC difference category and the
EOB/ZRL AC paths, not just trivial streams.

Scope (exactly the baseline subset a test/data pipeline generates
itself): SOF0, 8-bit precision, one component, 1x1 sampling, one DQT
and one DC+AC Huffman table pair, no restart markers. Everything else
— progressive (SOF2), multi-component color, 12-bit — is rejected
LOUDLY, the same contract as png_codec (unsupported variants are
errors, not garbage pixels).

Like the scanline loops in png_codec, the per-block entropy loops are
written for clarity; swapping in libjpeg behind
``multimodal.extract_frames(decode_stub=False)`` keeps every
schema/partitioning/batch contract as tested.
"""

from __future__ import annotations

import struct

import numpy as np

SOI, EOI, SOS, DQT, DHT, SOF0, SOF2, APP0 = (
    0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xC0, 0xC2, 0xE0,
)

# zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient
_Z = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZR = np.array([r * 8 + c for r, c in _Z])

# ITU-T T.81 Annex K.3 — luminance DC: BITS (codes per length 1..16)
# and HUFFVAL (symbols in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3 — luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# flat quantization table: DC step 8 makes the DC path exactly
# invertible for constant blocks (the mosaic gate's property); AC step
# 16 is an ordinary lossy step
FLAT_Q = np.full(64, 16, dtype=np.int32)
FLAT_Q[0] = 8


def _dct_mat() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    m = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m


_C = _dct_mat()


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def is_jpeg(data) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


def encode_jpeg(img, qtable=None) -> bytes:
    """Encode an (H, W) uint8 array as a baseline grayscale JPEG.

    ``qtable`` is 64 ints in ZIGZAG order (default :data:`FLAT_Q`)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg: grayscale (H, W) arrays only")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    if h > 65535 or w > 65535:
        # SOF0 packs dimensions as '>H'; oversize must be a loud
        # ValueError, not an opaque struct.error from the packer
        raise ValueError(
            f"encode_jpeg: dimensions {h}x{w} exceed the 65535 JPEG "
            "baseline limit"
        )
    q = np.asarray(qtable if qtable is not None else FLAT_Q, dtype=np.int32)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("encode_jpeg: qtable must be 64 ints in 1..255")
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    padded -= 128.0
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    # all blocks in one einsum: (bh, bw, 8, 8) DCT
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,bcjk,lk->bcil", _C, blocks, _C)
    zz = coef.reshape(bh, bw, 64)[:, :, _ZR]
    quant = np.round(zz / q).astype(np.int64)

    bw_ = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = quant[by, bx]
            diff = int(blk[0]) - prev_dc
            prev_dc = int(blk[0])
            cat = _category(diff)
            code, length = _DC_ENC[cat]
            bw_.write(code, length)
            if cat:
                mag = diff if diff > 0 else diff + (1 << cat) - 1
                bw_.write(mag, cat)
            run = 0
            last_nz = int(np.max(np.nonzero(blk)[0])) if blk.any() else 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    if k > last_nz:
                        code, length = _AC_ENC[0x00]  # EOB
                        bw_.write(code, length)
                        break
                    run += 1
                    if run == 16:
                        code, length = _AC_ENC[0xF0]  # ZRL
                        bw_.write(code, length)
                        run = 0
                    continue
                cat = _category(v)
                code, length = _AC_ENC[(run << 4) | cat]
                bw_.write(code, length)
                mag = v if v > 0 else v + (1 << cat) - 1
                bw_.write(mag, cat)
                run = 0
    data = bw_.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff" + bytes([SOI]))
    out += seg(APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(DQT, bytes([0x00]) + bytes(int(x) for x in q))
    out += seg(
        SOF0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    out += seg(
        DHT,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS),
    )
    out += seg(SOS, bytes([1, 1, 0x00, 0, 63, 0]))
    out += data
    out += b"\xff" + bytes([EOI])
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("jpeg: bad stuffing/marker in scan")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_table(bits, vals):
    """((length, code) -> symbol) canonical decode map."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): sym for sym, (code, length) in enc.items()}


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(mag: int, cat: int) -> int:
    if cat == 0:
        return 0
    return mag if mag >= (1 << (cat - 1)) else mag - (1 << cat) + 1


def decode_jpeg(data) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (H, W) uint8 array.
    Rejects progressive / multi-component / 12-bit input loudly."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict = {}
    dc_tab = ac_tab = None
    h = w = None
    qid = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == EOI:
            raise ValueError("jpeg: EOI before scan data")
        if marker == SOF2:
            raise ValueError(
                "progressive JPEG unsupported (baseline decoder) — "
                "plug libjpeg/PIL into multimodal._decoded_bytes"
            )
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if pos + seglen > len(data):
            raise ValueError("jpeg: truncated segment body")
        body = data[pos + 2:pos + seglen]
        if marker == DQT:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit qtables unsupported")
                qtables[tq] = np.frombuffer(
                    body[b + 1:b + 65], dtype=np.uint8
                ).astype(np.int32)
                b += 65
        elif marker == SOF0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError(
                    "jpeg: only single-component grayscale supported"
                )
            if body[7] != 0x11:
                raise ValueError("jpeg: subsampling unsupported")
            qid = body[8]
        elif marker == DHT:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("jpeg: truncated DHT segment")
                if tc == 0:
                    dc_tab = _decode_table(bits, vals)
                else:
                    ac_tab = _decode_table(bits, vals)
                b += 17 + n
        elif marker == SOS:
            scan = data[pos + seglen:]
            break
        pos += seglen
    else:
        raise ValueError("jpeg: no scan found")
    if h is None or dc_tab is None or ac_tab is None or qid not in qtables:
        raise ValueError("jpeg: missing SOF/DHT/DQT before SOS")
    # strip trailing EOI
    end = scan.rfind(b"\xff" + bytes([EOI]))
    if end < 0:
        raise ValueError("jpeg: missing EOI")
    br = _BitReader(scan[:end])
    q = qtables[qid]
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh, bw, 64), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = np.zeros(64, dtype=np.int64)
            cat = _read_symbol(br, dc_tab)
            diff = _extend(br.read_bits(cat), cat)
            prev_dc += diff
            blk[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    # ZRL promises 16 zeros AND at least one following
                    # coefficient index inside the block; a corrupt
                    # stream with ZRL near k=63 must fail loudly, not
                    # silently drop coefficients and desync the reader
                    if k > 63:
                        raise ValueError("jpeg: ZRL run past block end")
                    continue
                run, cat = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC run past block end")
                blk[k] = _extend(br.read_bits(cat), cat)
                k += 1
            out[by, bx] = blk * q
    coef = np.zeros((bh, bw, 64))
    coef[:, :, _ZR] = out
    coef = coef.reshape(bh, bw, 8, 8)
    pixels = np.einsum("ji,bcjk,kl->bcil", _C, coef, _C)
    img = pixels.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    img = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return img[:h, :w]


def bytes_to_mosaic(payload: bytes) -> np.ndarray:
    """One 8x8 constant tile per byte, in a single row: the encode
    shape whose DC-only blocks make the flat-Q DC path exactly
    invertible (gate construction; see FLAT_Q)."""
    b = np.frombuffer(bytes(payload), dtype=np.uint8)
    if b.size == 0:
        raise ValueError("bytes_to_mosaic: empty payload")
    if b.size > 8191:
        # mosaic width is 8*len(payload) and encode_jpeg caps width at
        # 65535, so payloads are bounded at 8191 bytes
        raise ValueError(
            f"bytes_to_mosaic: payload of {b.size} bytes exceeds the "
            "8191-byte bound (mosaic width 8*len must fit JPEG's 65535)"
        )
    return np.repeat(np.repeat(b.reshape(1, -1), 8, axis=0), 8, axis=1)


def mosaic_to_bytes(img: np.ndarray) -> bytes:
    """Inverse of :func:`bytes_to_mosaic` with verification: every
    tile must be constant (a decode corruption fails loudly, not
    silently)."""
    if img.ndim != 2 or img.shape[0] != 8 or img.shape[1] % 8:
        raise ValueError("mosaic_to_bytes: expected (8, 8n) image")
    tiles = img.reshape(8, -1, 8)
    first = tiles[0, :, 0]
    if not (tiles == first[None, :, None]).all():
        raise ValueError("mosaic_to_bytes: non-constant tile (corrupt decode)")
    return bytes(first.astype(np.uint8).tobytes())
