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

# test hook: True routes encode/decode through the general einsum +
# sequential-reader paths even where a fast path applies, so the
# bitwise-equality suites can compare both (the fast paths' contract
# is byte-identical output)
_DISABLE_FAST = False


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


# vectorized support tables for the constant-tile entropy encoder:
# DC code/length per category (baseline DC categories are 0..11), the
# EOB symbol, and a |diff| -> category LUT (DC diffs of 8-bit samples
# are bounded at 255)
_DC_CODE_ARR = np.array([_DC_ENC[c][0] for c in range(12)], dtype=np.int64)
_DC_LEN_ARR = np.array([_DC_ENC[c][1] for c in range(12)], dtype=np.int64)
_EOB_CODE, _EOB_LEN = _AC_ENC[0x00]
_CAT_LUT = np.array([int(v).bit_length() for v in range(256)], dtype=np.int64)


def _entropy_encode_dc_only(dcs: np.ndarray) -> bytes:
    """Entropy-code blocks of the exact form ``[dc, 0 x 63]`` (scan
    order) in one numpy pass — bit-identical to the general per-block
    loop on that input, which emits per block: DC category code, the
    magnitude bits (skipped at category 0, where the loop writes
    nothing), then EOB. Bits concatenate MSB-first, the final byte is
    1-padded, and every emitted 0xFF byte gets a stuffed 0x00 — the
    same stream :class:`_BitWriter` produces (stuffed zeros are not
    part of the bit stream in either form). Pinned against the general
    path by tests/test_jpeg_fastpath.py's bitwise-equality suite."""
    dcs = dcs.astype(np.int64)
    diffs = np.empty_like(dcs)
    diffs[0] = dcs[0]
    np.subtract(dcs[1:], dcs[:-1], out=diffs[1:])
    cats = _CAT_LUT[np.abs(diffs)]
    mags = np.where(diffs > 0, diffs, diffs + (np.int64(1) << cats) - 1)
    n = dcs.shape[0]
    vals = np.empty(3 * n, dtype=np.int64)
    lens = np.empty(3 * n, dtype=np.int64)
    vals[0::3] = _DC_CODE_ARR[cats]
    lens[0::3] = _DC_LEN_ARR[cats]
    vals[1::3] = mags
    lens[1::3] = cats
    vals[2::3] = _EOB_CODE
    lens[2::3] = _EOB_LEN
    total = int(lens.sum())
    ends = np.cumsum(lens)
    item = np.repeat(np.arange(vals.shape[0]), lens)
    bitpos = np.arange(total, dtype=np.int64) - (ends - lens)[item]
    bits = (vals[item] >> (lens[item] - 1 - bitpos)) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.int64)])
    by = np.packbits(bits.astype(np.uint8))
    ff = np.nonzero(by == 0xFF)[0]
    if ff.size:
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


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
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    flat = blocks.reshape(bh, bw, 64)
    if (
        not _DISABLE_FAST
        and int(q[0]) == 8
        and bool((flat == flat[:, :, :1]).all())
    ):
        # constant-tile fast path (the mosaic shape): for a block that
        # is a single value v' = v - 128, the exact DCT is DC-only with
        # DC = 8*v'. In float, the einsum's DC is 8*v'*(1 + d) with
        # |d| ~ 1e-14 (order-dependent, stride-sensitive), and every AC
        # is |ac| < 1e-11. round(ac/q) = 0 for any q >= 1, and with
        # q[0] == 8 round(8*v'*(1+d)/8) = v' exactly (v' integral, the
        # perturbation can never reach the .5 boundary) — so the
        # quantized block is [v', 0 x 63] REGARDLESS of einsum
        # evaluation order, and skipping the DCT is bit-identical.
        # (For q[0] != 8 the DC ratio can land on a .5 boundary where
        # the 1e-14 perturbation decides the round — general path.)
        # The entropy stream of DC-only blocks is likewise a closed
        # form (DC code + mag + EOB per block), so it is emitted in
        # one numpy pass instead of the per-block writer loop.
        data = _entropy_encode_dc_only(flat[:, :, 0].astype(np.int64).ravel())
    else:
        # all blocks in one einsum: (bh, bw, 8, 8) DCT
        coef = np.einsum("ij,bcjk,lk->bcil", _C, blocks, _C)
        zz = coef.reshape(bh, bw, 64)[:, :, _ZR]
        quant = np.round(zz / q).astype(np.int64)

        # per-block bookkeeping vectorized once (plain-int rows, any-AC
        # flag, last nonzero index) — the emitted symbol/bit sequence is
        # identical to the per-block numpy version this replaces
        qrows = quant.reshape(-1, 64)
        nz = qrows != 0
        anyv = nz.any(axis=1)
        last_arr = np.where(anyv, 63 - np.argmax(nz[:, ::-1], axis=1), 0)
        qlist = qrows.tolist()
        lastl = last_arr.tolist()
        bw_ = _BitWriter()
        prev_dc = 0
        for bi, blk in enumerate(qlist):
            diff = blk[0] - prev_dc
            prev_dc = blk[0]
            cat = _category(diff)
            code, length = _DC_ENC[cat]
            bw_.write(code, length)
            if cat:
                mag = diff if diff > 0 else diff + (1 << cat) - 1
                bw_.write(mag, cat)
            run = 0
            last_nz = lastl[bi]
            for k in range(1, 64):
                v = blk[k]
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


_SEQ_TABLES: dict = {}


def _decode_table(bits, vals):
    """((length, code) -> symbol) canonical decode map. Cached on the
    (bits, vals) content — streams all carrying the Annex K tables
    rebuild nothing after the first decode of the process."""
    key = (tuple(bits), tuple(vals))
    cached = _SEQ_TABLES.get(key)
    if cached is not None:
        return cached
    enc = _canonical_codes(bits, vals)
    out = {(length, code): sym for sym, (code, length) in enc.items()}
    _SEQ_TABLES[key] = out
    return out


_FAST_TABLES: dict = {}


def _fast_decode_table(bits, vals):
    """(len16, sym16): 65536-entry first-match tables — entry p holds
    the length and symbol of the unique prefix-free code that prefixes
    the 16-bit window p (0 length = no code within 16 bits). One
    lookup replaces up to 16 bit-by-bit reads; the matched (symbol,
    length) is identical to the sequential reader's because the code
    set is prefix-free. Cached on the (bits, vals) content — streams
    all carrying the Annex K tables build this once per process."""
    key = (tuple(bits), tuple(vals))
    cached = _FAST_TABLES.get(key)
    if cached is not None:
        return cached
    len16 = [0] * 65536
    sym16 = [0] * 65536
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        for p in range(lo, lo + (1 << (16 - length))):
            len16[p] = length
            sym16[p] = sym
    _FAST_TABLES[key] = (len16, sym16)
    return len16, sym16


_FAST_TABLES_NP: dict = {}


def _fast_decode_table_np(bits, vals):
    """int64 numpy mirrors of :func:`_fast_decode_table`'s 65536-entry
    (length, symbol) tables, for the vectorized speculative decoder.
    Same per-process cache discipline."""
    key = (tuple(bits), tuple(vals))
    cached = _FAST_TABLES_NP.get(key)
    if cached is not None:
        return cached
    len16, sym16 = _fast_decode_table(bits, vals)
    out = (
        np.array(len16, dtype=np.int64),
        np.array(sym16, dtype=np.int64),
    )
    _FAST_TABLES_NP[key] = out
    return out


def _entropy_decode_dc_only_vec(data, dc_np, ac_np, n_blocks, q0):
    """SPECULATIVE vectorized decode of ``n_blocks`` DC-only blocks
    from pre-unstuffed entropy bytes: returns the dequantized DC
    values (int64, scan order) when every block is exactly
    ``DC symbol + magnitude + EOB`` within bounds, else ``None`` —
    the caller falls back to the general reader, which re-decodes
    from scratch and raises the exact errors corrupt streams owe.

    How: the per-bit-position window tables make "length of a DC-only
    block starting at bit p" a pure array function of p, computed for
    EVERY position at once; the block starts are then the orbit of 0
    under that step map (one cheap scalar walk), and the DC diffs are
    extracted vectorized at those starts. Categories above 11 (not a
    baseline DC class) or any non-EOB follower abort the speculation.
    Bit-for-bit the consumption order of the sequential reader on the
    accepting inputs (pinned by tests/test_jpeg_fastpath.py)."""
    dc_len16, dc_sym16 = dc_np
    ac_len16, ac_sym16 = ac_np
    total = 8 * len(data)
    if total == 0:
        return None
    buf = np.frombuffer(
        bytes(data) + b"\x00\x00\x00\x00", dtype=np.uint8
    ).astype(np.int64)
    w32 = (buf[:-3] << 24) | (buf[1:-2] << 16) | (buf[2:-1] << 8) | buf[3:]
    # scalar probe of block 0 before paying the full-stream precompute
    # (non-mosaic streams bail here at ~zero cost)
    w16p = int(w32[0] >> 16) & 0xFFFF
    dl = int(dc_len16[w16p])
    cat0 = int(dc_sym16[w16p])
    if dl == 0 or cat0 > 11 or dl + cat0 > total:
        return None
    am0 = dl + cat0
    w16b = int(w32[am0 >> 3] >> (16 - (am0 & 7))) & 0xFFFF
    if int(ac_len16[w16b]) == 0 or int(ac_sym16[w16b]) != 0:
        return None
    pos_all = np.arange(total + 1, dtype=np.int64)
    w16 = (w32[pos_all >> 3] >> (16 - (pos_all & 7))) & 0xFFFF
    dlen = dc_len16[w16]
    cat = dc_sym16[w16]
    after_mag = pos_all + dlen + cat
    valid_dc = (dlen > 0) & (cat <= 11) & (after_mag <= total)
    am_safe = np.where(valid_dc, after_mag, 0)
    w16a = (w32[am_safe >> 3] >> (16 - (am_safe & 7))) & 0xFFFF
    alen = ac_len16[w16a]
    nxt = am_safe + alen
    ok_step = (
        valid_dc & (alen > 0) & (ac_sym16[w16a] == 0) & (nxt <= total)
    )
    starts = np.empty(n_blocks, dtype=np.int64)
    p = 0
    for b in range(n_blocks):
        if not ok_step[p]:
            return None
        starts[b] = p
        p = int(nxt[p])
    s16 = w16[starts]
    cats = dc_sym16[s16]
    mpos = starts + dc_len16[s16]
    mags = (w32[mpos >> 3] >> (32 - (mpos & 7) - cats)) & (
        (np.int64(1) << cats) - 1
    )
    half = np.int64(1) << np.maximum(cats - 1, 0)
    diffs = np.where(
        cats == 0,
        0,
        np.where(mags >= half, mags, mags - (np.int64(1) << cats) + 1),
    )
    return np.cumsum(diffs) * q0


def _has_bad_stuffing(raw: bytes) -> bool:
    """True iff any 0xFF in ``raw`` is not followed by a stuffed 0x00
    (including a trailing 0xFF) — the condition under which the lazy
    bit-by-bit reader's error placement differs from eager unstuffing,
    so the decoder falls back to the sequential reader."""
    start = 0
    while True:
        i = raw.find(0xFF, start)
        if i < 0:
            return False
        if i + 1 >= len(raw) or raw[i + 1] != 0x00:
            return True
        start = i + 2


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
                    dc_tab = (
                        _decode_table(bits, vals),
                        _fast_decode_table(bits, vals),
                        _fast_decode_table_np(bits, vals),
                    )
                else:
                    ac_tab = (
                        _decode_table(bits, vals),
                        _fast_decode_table(bits, vals),
                        _fast_decode_table_np(bits, vals),
                    )
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
    raw = scan[:end]
    q = qtables[qid]
    bh, bw = (h + 7) // 8, (w + 7) // 8
    if not _DISABLE_FAST and not _has_bad_stuffing(raw):
        unstuffed = raw.replace(b"\xff\x00", b"\xff")
        dcs = _entropy_decode_dc_only_vec(
            unstuffed, dc_tab[2], ac_tab[2], bh * bw, int(q[0])
        )
        if dcs is not None:
            # the DC-only closed form below, applied straight to the
            # speculatively decoded DC array (same dequantized values
            # the reader loop would put in out[:, :, 0], same float
            # ops in the same order — bit-identical pixels)
            t = (_C[0, 0] * dcs.astype(np.float64).reshape(bh, bw)) * _C[0, 0]
            tiles = np.clip(np.round(t + 128.0), 0, 255).astype(np.uint8)
            img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
            return img[:h, :w]
        out, all_dc = _entropy_decode_fast(
            unstuffed, dc_tab[1], ac_tab[1],
            bh, bw, q,
        )
    else:
        out, all_dc = _entropy_decode_seq(
            raw, dc_tab[0], ac_tab[0], bh, bw, q
        )
    if all_dc and not _DISABLE_FAST:
        # DC-only fast path: every non-DC coefficient is an exact
        # float 0.0, so each output element of the IDCT einsum is its
        # single nonzero term (_C[0,i] * dc) * _C[0,l] — adding exact
        # zeros never changes a float — and _C[0,:] is one repeated
        # value, making the whole 8x8 block the same pixel. The
        # product grouping (left-to-right over the einsum operands)
        # is pinned by test_multimodal_jpeg's bitwise-equality fuzz.
        t = (_C[0, 0] * out[:, :, 0]) * _C[0, 0]
        tiles = np.clip(np.round(t + 128.0), 0, 255).astype(np.uint8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        return img[:h, :w]
    coef = np.zeros((bh, bw, 64))
    coef[:, :, _ZR] = out
    coef = coef.reshape(bh, bw, 8, 8)
    pixels = np.einsum("ji,bcjk,kl->bcil", _C, coef, _C)
    img = pixels.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    img = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return img[:h, :w]


def _entropy_decode_seq(raw, dc_map, ac_map, bh, bw, q):
    """Sequential bit-by-bit entropy decode (the original reader) —
    kept verbatim as the fallback for streams with malformed byte
    stuffing, whose lazy error placement it preserves exactly.
    Returns (out, all_dc): the dequantized (bh, bw, 64) zigzag
    coefficients and whether every block was DC-only."""
    br = _BitReader(raw)
    out = np.empty((bh, bw, 64), dtype=np.float64)
    prev_dc = 0
    all_dc = True
    for by in range(bh):
        for bx in range(bw):
            blk = np.zeros(64, dtype=np.int64)
            cat = _read_symbol(br, dc_map)
            diff = _extend(br.read_bits(cat), cat)
            prev_dc += diff
            blk[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_map)
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
                all_dc = False
            out[by, bx] = blk * q
    return out, all_dc


def _entropy_decode_fast(data, dc_fast, ac_fast, bh, bw, q):
    """Table-driven entropy decode over pre-unstuffed bytes: one
    16-bit-window lookup per Huffman symbol instead of up to 16
    bit-level reads. Decodes the identical (symbol, length) sequence
    as the sequential reader (prefix-free codes), raises the same
    errors at the same logical positions (exhaustion checked against
    the true bit count before any consume). Returns (out, all_dc)."""
    dc_len, dc_sym = dc_fast
    ac_len, ac_sym = ac_fast
    total = 8 * len(data)
    padded = data + b"\x00\x00\x00\x00"
    qi = [int(x) for x in q]
    pos = 0
    rows = []
    prev_dc = 0
    all_dc = True
    n_blocks = bh * bw
    for _ in range(n_blocks):
        blk = [0] * 64
        # --- DC symbol ---
        i, sh = pos >> 3, pos & 7
        w16 = (
            int.from_bytes(padded[i:i + 3], "big") >> (8 - sh)
        ) & 0xFFFF
        ln = dc_len[w16]
        if ln == 0:
            raise ValueError(
                "jpeg: entropy data exhausted"
                if total - pos < 16
                else "jpeg: invalid Huffman code"
            )
        if pos + ln > total:
            raise ValueError("jpeg: entropy data exhausted")
        cat = dc_sym[w16]
        pos += ln
        if cat:
            if pos + cat > total:
                raise ValueError("jpeg: entropy data exhausted")
            i, sh = pos >> 3, pos & 7
            mag = (
                int.from_bytes(padded[i:i + 4], "big")
                >> (32 - sh - cat)
            ) & ((1 << cat) - 1)
            pos += cat
            diff = mag if mag >= (1 << (cat - 1)) else mag - (1 << cat) + 1
        else:
            diff = 0
        prev_dc += diff
        blk[0] = prev_dc * qi[0]
        # --- AC run ---
        k = 1
        while k < 64:
            i, sh = pos >> 3, pos & 7
            w16 = (
                int.from_bytes(padded[i:i + 3], "big") >> (8 - sh)
            ) & 0xFFFF
            ln = ac_len[w16]
            if ln == 0:
                raise ValueError(
                    "jpeg: entropy data exhausted"
                    if total - pos < 16
                    else "jpeg: invalid Huffman code"
                )
            if pos + ln > total:
                raise ValueError("jpeg: entropy data exhausted")
            rs = ac_sym[w16]
            pos += ln
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                if k > 63:
                    raise ValueError("jpeg: ZRL run past block end")
                continue
            run, cat = rs >> 4, rs & 0xF
            k += run
            if k > 63:
                raise ValueError("jpeg: AC run past block end")
            if cat:
                if pos + cat > total:
                    raise ValueError("jpeg: entropy data exhausted")
                i, sh = pos >> 3, pos & 7
                mag = (
                    int.from_bytes(padded[i:i + 4], "big")
                    >> (32 - sh - cat)
                ) & ((1 << cat) - 1)
                pos += cat
                v = (
                    mag
                    if mag >= (1 << (cat - 1))
                    else mag - (1 << cat) + 1
                )
            else:
                v = 0
            blk[k] = v * qi[k]
            k += 1
            all_dc = False
        rows.append(blk)
    out = np.asarray(rows, dtype=np.float64).reshape(bh, bw, 64)
    return out, all_dc


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
