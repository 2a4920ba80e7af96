"""Multimodal (image/audio/video) column plumbing.

Design for opaque media at 100 TB: the payload is a ``binary`` column
travelling next to a typed metadata struct, and all per-item decode /
feature-extract work runs in Arrow-batched ``mapInPandas`` — one Python
worker per partition, zero driver involvement, schema declared up front
so Catalyst can prune everything the consumer doesn't read.

Decode paths: ``decode_stub=True`` (default) substitutes a
deterministic fake decoder (byte-derived, reproducible,
oracle-checkable). ``decode_stub=False`` runs a REAL decode for PNG
payloads via the pure-stdlib image codec (``png_codec`` — zlib inflate
+ CRC-checked chunks + all five scanline unfilters; no PIL needed) and
for PCM WAV payloads via the pure-stdlib audio codec (``wav_codec`` —
RIFF chunk walk to raw samples; no torchaudio needed), for baseline
grayscale JPEG via the pure-numpy codec (``jpeg_codec`` — Huffman
entropy decode + dequant + IDCT), and raises ``NotImplementedError``
at the exact point other codecs (PIL for color/progressive JPEG, pyav
for video) would be called. Frame hashes / features in real
mode are computed over the DECODED PIXELS, so corrupt payloads fail
loudly instead of hashing garbage. Everything around the decode —
schemas, batch iteration, partitioning, explode of per-frame rows — is
identical in both modes and tested.

Schema conventions:

    media:   (id long, payload binary, meta struct<format string,
              n_bytes long, checksum string>)
    frames:  (id long, frame_id long, frame_hash long)
    feature: (id long, feature array<double>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .parallel import cpu_partitions
from .jpeg_codec import decode_jpeg, is_jpeg
from .png_codec import decode_png, is_png
from .wav_codec import decode_wav, is_wav

FRAME_BYTES = 100  # fake decoder: one "frame" per 100 payload bytes
FEATURE_DIM = 8  # stub encoder output dimensionality
_HASH_MOD = 2147483647
# 31^j mod M for j < FRAME_BYTES, descending-power dot products below
_POW31 = np.empty(FRAME_BYTES, dtype=np.int64)
_POW31[0] = 1
for _j in range(1, FRAME_BYTES):
    _POW31[_j] = (_POW31[_j - 1] * 31) % _HASH_MOD
del _j

MEDIA_META_SCHEMA = (
    "meta struct<format: string, n_bytes: bigint, checksum: string>"
)


def _decoded_bytes(payload: bytes) -> bytes:
    """The real-decode seam: PNG payloads decode to raw pixel bytes
    via the stdlib image codec, WAV payloads to raw PCM sample bytes
    via the stdlib audio codec; any other format is where
    PIL/torchaudio/pyav would plug in."""
    if is_png(payload):
        return decode_png(payload).tobytes()
    if is_wav(payload):
        return decode_wav(payload)[0].tobytes()
    if is_jpeg(payload):
        return decode_jpeg(payload).tobytes()
    raise NotImplementedError(
        "real decode implemented in-container for PNG, PCM WAV and "
        "baseline grayscale JPEG only (operators/png_codec.py, "
        "wav_codec.py, jpeg_codec.py); other codecs (PIL/torchaudio/"
        "pyav) plug in here — or run with decode_stub=True"
    )
FRAMES_SCHEMA = "id bigint, frame_id bigint, frame_hash bigint"
FEATURE_SCHEMA = "id bigint, feature array<double>"


def attach_media(
    df: DataFrame, id_col: str, payload_col, fmt: str = "bin"
) -> DataFrame:
    """Normalize to the media schema: (id, payload, meta).

    ``meta`` is computed JVM-side (length + sha256) — the metadata path
    never touches Python even when the decode path does.
    """
    payload = (
        F.col(payload_col) if isinstance(payload_col, str) else payload_col
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("checksum"),
        ).alias("meta"),
    )


def _fake_frame_hashes(payload: bytes) -> list[int]:
    """Deterministic stand-in for a video/audio frame decode: one
    "frame" per FRAME_BYTES bytes, hashed by a byte-sum polynomial
    h = sum(b_i * 31^(k-1-i)) mod 2^31-1 — the iterative
    ``h = h*31 + b`` Horner form, numpy-vectorized as a dot product
    against precomputed powers (bounded: 255 * 2^31 * 100 < 2^63).
    Reproducible in SQL, so the plumbing is oracle-checkable end-to-end.
    """
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    if len(arr) < FRAME_BYTES:
        k = len(arr)
        if k == 0:
            return [0]
        return [int(arr @ _POW31[k - 1 :: -1] % _HASH_MOD)]
    n = len(arr) // FRAME_BYTES
    mat = arr[: n * FRAME_BYTES].reshape(n, FRAME_BYTES)
    return (mat @ _POW31[::-1] % _HASH_MOD).tolist()


def extract_frames(
    media: DataFrame, decode_stub: bool = True, on_error: str = "raise"
) -> DataFrame:
    """Per-item frame extraction via Arrow-batched mapInPandas.

    Output: (id, frame_id, frame_hash) — one row per decoded frame.
    Real pipeline shape: the UDF receives Arrow record batches of
    (id, payload), decodes each payload, and yields the exploded frame
    rows; partitioning of the input is preserved (no shuffle).

    ``on_error``: ``"raise"`` (default) fails the job on the first
    undecodable payload — right for curated corpora where corruption
    means an upstream bug. ``"skip"`` drops the bad item and keeps
    the job alive — at 100 TB a handful of corrupt blobs is CERTAIN
    and one must not kill a thousand-executor pipeline; pair with
    :func:`decode_errors` to quarantine and audit what was dropped.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip': {on_error}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_ids, hashes = [], [], []
            for doc_id, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload)
                if not decode_stub:
                    try:
                        raw = _decoded_bytes(raw)  # real decode or raise
                    except Exception:
                        if on_error == "raise":
                            raise
                        continue  # quarantined via decode_errors()
                for fid, h in enumerate(_fake_frame_hashes(raw)):
                    ids.append(doc_id)
                    frame_ids.append(fid)
                    hashes.append(h)
            yield pd.DataFrame(
                {"id": ids, "frame_id": frame_ids, "frame_hash": hashes}
            )

    # pinned repartition before the Python stage: media sources are
    # often few large files (all decode work on one Python worker), and
    # AQE would coalesce a by-column repartition back down by bytes
    return (
        media.select("id", "payload")
        .repartition(cpu_partitions(media), F.col("id"))
        .mapInPandas(decode, FRAMES_SCHEMA)
    )


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, decode_stub: bool = True
) -> DataFrame:
    """Per-item feature vector via mapInPandas (embedding-model shape).

    The stub derives ``dim`` doubles from payload byte statistics; a real
    pipeline would run the encoder model per Arrow batch here.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["id"], pdf["payload"]):
                src = bytes(payload)
                if not decode_stub:
                    src = _decoded_bytes(src)  # feature over real pixels
                raw = np.frombuffer(src, dtype=np.uint8).astype(
                    np.int64
                )
                # column j of the (ceil(n/dim) x dim) matrix is raw[j::dim];
                # zero-pad the tail so the strided sums are one reshape+sum
                pad = (-len(raw)) % dim
                if pad:
                    raw = np.concatenate([raw, np.zeros(pad, dtype=np.int64)])
                sums = raw.reshape(-1, dim).sum(axis=0) % 1000
                feats.append([float(v) for v in sums])
                ids.append(doc_id)
            yield pd.DataFrame({"id": ids, "feature": feats})

    return (
        media.select("id", "payload")
        .repartition(cpu_partitions(media), F.col("id"))
        .mapInPandas(encode, FEATURE_SCHEMA)
    )


ERRORS_SCHEMA = "id bigint, error string"


def decode_errors(media: DataFrame) -> DataFrame:
    """The quarantine listing: (id, error) for every payload the real
    decode rejects — corrupt containers, truncated chunks, compressed
    formats with no in-container codec. Run it over the same media
    frame as an ``on_error="skip"`` extraction to audit exactly what
    was dropped and why (the two passes share the parquet scan shape;
    at 100 TB this is the standard bad-records side channel — the
    error row is tiny, the payload stays in place for reprocessing).
    """

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, errs = [], []
            for doc_id, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    _decoded_bytes(bytes(payload))
                except Exception as exc:  # noqa: BLE001 — the audit row
                    ids.append(doc_id)
                    errs.append(f"{type(exc).__name__}: {exc}"[:500])
            yield pd.DataFrame({"id": ids, "error": errs})

    return (
        media.select("id", "payload")
        .repartition(cpu_partitions(media), F.col("id"))
        .mapInPandas(probe, ERRORS_SCHEMA)
    )
