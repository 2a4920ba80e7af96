"""Pure-stdlib WAV codec — a REAL audio decode behind the multimodal
seam, no external codec dependency.

The container ships no torchaudio/soundfile, but PCM WAV needs
neither: the format is a RIFF container (struct) holding a ``fmt ``
chunk and raw little-endian PCM samples. This module implements the
subset a test/data pipeline generates itself — uncompressed PCM
(format tag 1), 8/16/32-bit, any channel count, chunk-order-agnostic
parsing — and REJECTS compressed formats and truncated payloads
loudly, so the "real decode" path is a real decode: actual container
bytes in, actual samples out, verified by round-trip and by corrupt
input.

Scope note: like the PNG codec (png_codec.py), the point is the seam,
not throughput — swapping in torchaudio behind
``multimodal.extract_frames(decode_stub=False)`` is a one-line change
and every schema/partitioning/batch contract around it stays as
tested.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an (n,) or (n, channels) integer array as PCM WAV.

    dtype picks the bit depth: uint8 -> 8-bit, int16 -> 16-bit,
    int32 -> 32-bit (the three PCM layouts the decoder accepts).
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {arr.ndim}-D")
    bits = arr.dtype.itemsize * 8
    if bits not in _DTYPES or arr.dtype != _DTYPES[bits]:
        raise ValueError(
            f"dtype must be one of {sorted(_DTYPES.values(), key=str)}, "
            f"got {arr.dtype}"
        )
    n_ch = arr.shape[1]
    block = n_ch * bits // 8
    data = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to ((n, channels) array, sample_rate).

    Walks the RIFF chunk list (any chunk order, unknown chunks
    skipped), demands an uncompressed-PCM ``fmt `` chunk before
    ``data``, and validates sizes — a truncated or compressed payload
    raises instead of yielding garbage samples.
    """
    data = bytes(data)
    if not is_wav(data) or len(data) < 12:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body_end = pos + 8 + size
        if body_end > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        body = data[pos + 8 : body_end]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, n_ch, rate, _, block, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise ValueError(
                    f"only uncompressed PCM supported (format tag 1), "
                    f"got {audio_format}"
                )
            if bits not in _DTYPES:
                raise ValueError(f"unsupported bit depth {bits}")
            if n_ch < 1 or block != n_ch * bits // 8:
                raise ValueError("inconsistent channel/block layout")
            fmt = (n_ch, rate, bits)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            n_ch, rate, bits = fmt
            width = bits // 8
            if size % (n_ch * width):
                raise ValueError("data size not a whole sample frame")
            arr = np.frombuffer(
                body, dtype=np.dtype(_DTYPES[bits]).newbyteorder("<")
            ).astype(_DTYPES[bits])
            return arr.reshape(-1, n_ch), rate
        # unknown chunks (LIST, cue, ...) skip; chunks are word-aligned
        pos = body_end + (size & 1)
    raise ValueError("no data chunk found")
