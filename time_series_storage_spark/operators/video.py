"""Video: an indexed MJPEG-style container, index-driven frame
sampling, and a temporal-majority perceptual signature for video
near-dup — the video corner of the multimodal family.

Reference scope: the reference engine has no multimodal surface at
all (SURVEY.md section 2.3); this extends the training-data-pipeline
media family (jpeg_codec/wav_codec/phash) to the modality a video
corpus needs on day one: sample a few frames per clip, hash them,
dedup clips.

Container (``TSV1``): a deterministic, loudly-validated format so the
plumbing — not a third-party demuxer — is what's under test::

    magic 'TSV1' | u16 n_frames | n_frames x u32 frame byte-length
    | concatenated baseline-JPEG frame payloads

The length table IS the point: frame sampling seeks straight to the
sampled frames' byte ranges and decodes ONLY those, so per-clip cost
is O(sampled frames), not O(duration) — the property that survives a
100 TB video corpus. (Real containers carry the same affordance —
AVI's idx1 chunk / MP4's stbl — this one keeps it honest in ~30
lines and fails loudly on any malformation.)

Frame sampling picks ``(j * n_frames) // n_samples`` for j in
0..n_samples-1, de-duplicated — the same equally-spaced integer
convention as phash's column sampling, so the SQL oracle reproduces
the exact pick.

Video signature: per sampled frame the 63-bit dHash
(phash.dhash_gray_image), then a TEMPORAL MAJORITY vote per bit —
bit i of the signature is set iff a strict majority of sampled
frames set bit i. Gradients stable across most of the clip survive;
a single edited frame cannot flip the signature. Near-dup pairs ride
the SAME Hamming-band engine as images/audio
(phash.hamming_near_dup_pairs): pigeonhole-perfect recall at
hamming <= 8, never all-pairs.

100-TB posture: parse + sample + decode + hash is ONE Arrow
``mapInPandas`` pass (payload bytes never leave the executor, only
sampled frames are decoded); the majority vote is a pure-codegen
aggregate over (video, bit) — two partial-aggregated exchanges; the
pair search is the banded equi-join. No row-at-a-time Python, no
driver collect anywhere.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F

from .dedup import _SnapshotArtifactStore
from .phash import (
    PHASH_BANDS,
    PHASH_BITS,
    ImgNearDupStore,
    dhash_gray_image,
)

MAGIC = b"TSV1"
MAX_FRAMES = 65_535


def encode_video(frames) -> bytes:
    """Container-encode a list of decoded grayscale frames (each a
    2-D uint8 array) — every frame becomes a real baseline JPEG
    (jpeg_codec.encode_jpeg) behind the length index."""
    from .jpeg_codec import encode_jpeg

    if not frames:
        raise ValueError("encode_video: at least one frame required")
    if len(frames) > MAX_FRAMES:
        raise ValueError(
            f"encode_video: {len(frames)} frames exceeds the "
            f"{MAX_FRAMES} u16 bound"
        )
    payloads = [encode_jpeg(f) for f in frames]
    head = MAGIC + struct.pack(">H", len(payloads))
    index = b"".join(struct.pack(">I", len(p)) for p in payloads)
    return head + index + b"".join(payloads)


def parse_video_index(payload: bytes):
    """[(offset, length), ...] for every frame — validates the
    container LOUDLY (magic, index bounds, total size) without
    touching any frame payload."""
    b = bytes(payload)
    if len(b) < 6 or b[:4] != MAGIC:
        raise ValueError("parse_video_index: bad magic (not a TSV1 clip)")
    (n,) = struct.unpack(">H", b[4:6])
    if n == 0:
        raise ValueError("parse_video_index: zero-frame clip")
    if len(b) < 6 + 4 * n:
        raise ValueError("parse_video_index: truncated frame index")
    off = 6 + 4 * n
    out = []
    for i in range(n):
        (ln,) = struct.unpack(">I", b[6 + 4 * i : 10 + 4 * i])
        out.append((off, ln))
        off += ln
    if off != len(b):
        raise ValueError(
            f"parse_video_index: container size mismatch "
            f"(index says {off} bytes, payload is {len(b)})"
        )
    return out


def sample_indices(n_frames: int, n_samples: int):
    """The de-duplicated equally-spaced frame picks, shared by the
    Spark path, the tests and (re-expressed) the SQL oracle."""
    return sorted({(j * n_frames) // n_samples for j in range(n_samples)})


def video_frame_sample(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    n_samples: int = 4,
) -> DataFrame:
    """(id, n_frames, frame_idx, frame_h, frame_w, phash) — one row
    per SAMPLED frame: parse the index, seek to the sampled frames
    only, decode each with the real baseline JPEG decoder, and dHash
    the pixels. One Arrow ``mapInPandas`` pass; corrupt containers or
    frames fail loudly (pre-filter with multimodal's quarantine path
    for skip semantics)."""
    import pandas as pd

    from .jpeg_codec import decode_jpeg
    from .phash import require_integral_id

    require_integral_id(df, id_col, "video_frame_sample")

    def sample(batches):
        for pdf in batches:
            ids, nfs, idxs, hs, ws, phs = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                index = parse_video_index(b)
                for k in sample_indices(len(index), n_samples):
                    off, ln = index[k]
                    img = decode_jpeg(b[off : off + ln])
                    ids.append(i)
                    nfs.append(len(index))
                    idxs.append(k)
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    phs.append(dhash_gray_image(img))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nfs, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_h": pd.Series(hs, dtype="int64"),
                    "frame_w": pd.Series(ws, dtype="int64"),
                    "phash": pd.Series(phs, dtype="int64"),
                }
            )

    return df.mapInPandas(
        sample,
        "id long, n_frames long, frame_idx long, frame_h long, "
        "frame_w long, phash long",
    )


def video_signatures_fused(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    n_samples: int = 4,
) -> DataFrame:
    """(id, sig): parse + sample + decode + hash + temporal-majority
    fold in ONE Arrow ``mapInPandas`` pass — bit-identical to
    ``video_signature(video_frame_sample(df, ...))`` (the composed
    path that stays for the per-frame gate query and tests).

    Why the fusion is free: every sampled frame of a clip comes out
    of that clip's OWN payload row, so the per-bit majority vote is
    row-local — the composed path's (id, bit) exchange plus 63 SUM
    aggregates buy distribution the data never needs. Arithmetic is
    identical exact-integer work (``bit_i = 2 * ones_i > n_frames``
    on the same 63-bit dHashes), just in Python ints instead of Spark
    longs; consumers (the Hamming band engine, the store probe) see
    one row per clip instead of ``n_samples``."""
    import pandas as pd

    from .phash import require_integral_id

    require_integral_id(df, id_col, "video_signatures_fused")

    def sample(batches):
        from .jpeg_codec import decode_jpeg

        for pdf in batches:
            ids, sigs = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                index = parse_video_index(b)
                hs = []
                for k in sample_indices(len(index), n_samples):
                    off, ln = index[k]
                    hs.append(dhash_gray_image(decode_jpeg(b[off : off + ln])))
                n = len(hs)
                sig = 0
                for bit in range(PHASH_BITS):
                    ones = sum((h >> bit) & 1 for h in hs)
                    if 2 * ones > n:
                        sig |= 1 << bit
                ids.append(i)
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return df.mapInPandas(sample, "id long, sig long")


def video_signature(
    frame_hashes: DataFrame, id_col: str = "id", hash_col: str = "phash"
) -> DataFrame:
    """(id, sig): the 63-bit temporal-majority signature — bit i set
    iff a STRICT majority of the video's sampled frames set bit i.
    ONE partial-aggregated exchange keyed (id): 63 per-bit ones-count
    aggregate columns (shift amounts are literals, so every count is
    pure codegen) fold into the signature in a single projection —
    no row blowup, no second exchange (an exploded (id, bit) shape
    would 63x the frame rows through two shuffles for nothing)."""
    ones = [
        F.sum(
            F.shiftright(F.col(hash_col), b)
            .bitwiseAND(F.lit(1))
            .cast("long")
        ).alias(f"_o{b}")
        for b in range(PHASH_BITS)
    ]
    agg = frame_hashes.groupBy(F.col(id_col).alias("id")).agg(
        *ones, F.count(F.lit(1)).alias("_n")
    )
    # summing distinct powers of two in exact long arithmetic (never
    # pow(): doubles lose exactness approaching 2^63-1)
    sig = None
    for b in range(PHASH_BITS):
        term = F.when(
            F.col(f"_o{b}") * 2 > F.col("_n"),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select("id", sig.cast("long").alias("sig"))


def video_near_dup_pairs(
    videos: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    n_samples: int = 4,
    max_hamming: int = 8,
    max_bucket_size: int = 1_000,
) -> DataFrame:
    """(id1, id2, hamming) — clip-level near-dup: sample + hash
    frames, majority-fold to the clip signature, then the shared
    Hamming-band engine (pigeonhole-perfect recall at
    ``max_hamming <= 8``, hot-bucket guarded, never all-pairs)."""
    from .phash import hamming_near_dup_pairs

    sigs = video_signatures_fused(videos, id_col, payload_col, n_samples)
    return hamming_near_dup_pairs(
        sigs,
        "id",
        "sig",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


class VideoNearDupStore(ImgNearDupStore):
    """Persisted clip-signature + Hamming-band artifact for
    INCREMENTAL video near-dup — the FIFTH modality on the shared
    snapshot store protocol (exact / MinHash / embedding / image /
    video). Everything — band probe, exact verify, first-day-wins
    winner semantics, within-increment min-id clustering, exactly-once
    ``batch_id`` replay, commit protocol — is inherited from
    :class:`~.phash.ImgNearDupStore`; the one override is the hash
    hook: a clip hashes to its temporal-majority signature over
    ``n_samples`` index-seeked frames (:func:`video_frame_sample` +
    :func:`video_signature`), so the daily probe decodes only sampled
    frames of the increment and NEVER re-touches stored clips'
    bytes."""

    def __init__(
        self,
        spark,
        path: str,
        max_hamming: int = 8,
        n_samples: int = 4,
        id_kind: str = "long",
    ):
        from .phash import _check_id_kind, _id_params

        self.max_hamming = max_hamming
        self.n_samples = n_samples
        self.id_kind = _check_id_kind(id_kind)
        # bypass the parent __init__ — its params pin carries the
        # image identity; the base validates THESE params against the
        # stored meta on reopen
        _SnapshotArtifactStore.__init__(
            self,
            spark,
            path,
            ["video-sig-v1", PHASH_BANDS, max_hamming, n_samples,
             *_id_params(id_kind)],
            "VideoNearDupStore",
        )

    def _hash_increment(self, new_media, id_col, payload_col):
        sigs = video_signatures_fused(
            new_media, id_col, payload_col, self.n_samples
        )
        return sigs.select(
            F.col("id").alias(id_col), F.col("sig").alias("phash")
        )
