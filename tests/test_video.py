"""operators/video.py — TSV1 container, index-driven frame sampling,
temporal-majority signature, clip near-dup.

The driver-level oracle rows are video_frame_sample / video_near_dup
(queries_extensions.py — SQL recomputes everything from source
bytes); these tests pin what the oracle can't see: the container's
reject-loudly contract, that sampling decodes ONLY the picked frames,
the signature's majority semantics against a pure-Python model, and
the band engine's recall guarantee at the clip level.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from time_series_storage_spark.operators.jpeg_codec import (
    bytes_to_mosaic,
)
from time_series_storage_spark.operators.video import (
    MAGIC,
    encode_video,
    parse_video_index,
    sample_indices,
    video_frame_sample,
    video_near_dup_pairs,
    video_signature,
)


def _clip(text: str, chunk: int = 48) -> bytearray:
    b = text.encode()
    return bytearray(
        encode_video(
            [bytes_to_mosaic(b[i : i + chunk]) for i in range(0, len(b), chunk)]
        )
    )


def _sig_model(hashes: list[int]) -> int:
    s = 0
    for b in range(63):
        if 2 * sum((h >> b) & 1 for h in hashes) > len(hashes):
            s |= 1 << b
    return s


# -- container contract (pure python, no spark) ----------------------


def test_container_roundtrip_index():
    clip = bytes(_clip("x" * 100, chunk=30))
    idx = parse_video_index(clip)
    assert len(idx) == 4  # 30+30+30+10
    # offsets tile the payload exactly
    assert idx[0][0] == 6 + 4 * 4
    for (o1, l1), (o2, _) in zip(idx, idx[1:]):
        assert o1 + l1 == o2
    assert idx[-1][0] + idx[-1][1] == len(clip)


def test_container_rejects_loudly():
    clip = bytes(_clip("hello world this is a clip"))
    with pytest.raises(ValueError, match="bad magic"):
        parse_video_index(b"AVI " + clip[4:])
    with pytest.raises(ValueError, match="truncated frame index"):
        parse_video_index(clip[:8])
    with pytest.raises(ValueError, match="size mismatch"):
        parse_video_index(clip + b"junk")
    with pytest.raises(ValueError, match="size mismatch"):
        parse_video_index(clip[:-1])
    with pytest.raises(ValueError, match="zero-frame"):
        parse_video_index(MAGIC + struct.pack(">H", 0))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_video([])


@settings(max_examples=200, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_container_fuzz_only_valueerror(junk):
    """Arbitrary bytes either parse (iff they are a well-formed clip)
    or raise ValueError — never struct.error/IndexError; the
    reject-loudly contract holds under fuzz."""
    try:
        idx = parse_video_index(junk)
    except ValueError:
        return
    # anything that parsed must tile the payload exactly
    assert idx and idx[-1][0] + idx[-1][1] == len(junk)


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_container_fuzz_prefixed_magic(junk):
    """Junk behind a valid magic + plausible count still fails with
    ValueError, not an unbounded read."""
    blob = MAGIC + struct.pack(">H", 3) + junk
    try:
        idx = parse_video_index(blob)
        assert idx[-1][0] + idx[-1][1] == len(blob)
    except ValueError:
        pass


def test_sample_indices_convention():
    assert sample_indices(8, 4) == [0, 2, 4, 6]
    assert sample_indices(6, 4) == [0, 1, 3, 4]
    assert sample_indices(2, 4) == [0, 1]   # de-duplicated
    assert sample_indices(1, 4) == [0]


# -- spark paths ------------------------------------------------------


def test_frame_sample_decodes_only_picked_frames(spark):
    """Corrupt an UNSAMPLED frame's payload bytes: sampling must
    succeed (it never touches that byte range) — the index-seek
    property that makes per-clip cost O(sampled)."""
    clip = bytearray(_clip("a" * 48 * 6))  # 6 frames, picks 0,1,3,4
    idx = parse_video_index(bytes(clip))
    off, ln = idx[2]  # frame 2 is never sampled at n_samples=4
    clip[off : off + ln] = b"\x00" * ln
    df = spark.createDataFrame([(1, clip)], "id long, payload binary")
    rows = video_frame_sample(df, "id", "payload", 4).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 1, 3, 4]
    # and sampling a corrupted SAMPLED frame fails loudly
    clip2 = bytearray(_clip("a" * 48 * 6))
    off0, ln0 = parse_video_index(bytes(clip2))[0]
    clip2[off0 : off0 + ln0] = b"\x00" * ln0
    df2 = spark.createDataFrame([(2, clip2)], "id long, payload binary")
    with pytest.raises(Exception):
        video_frame_sample(df2, "id", "payload", 4).collect()


def test_signature_matches_python_model(spark):
    t1 = "the quick brown fox jumps over the lazy dog " * 6
    t2 = t1[:200] + "EDITED FRAME CONTENT XX XX XXX" + t1[230:]
    t3 = "completely different content made of other words " * 5
    df = spark.createDataFrame(
        [(1, _clip(t1)), (2, _clip(t2)), (3, _clip(t3))],
        "id long, payload binary",
    )
    fs = video_frame_sample(df, "id", "payload", 4)
    by = {}
    for r in fs.collect():
        by.setdefault(r.id, []).append(r.phash)
    got = {r.id: r.sig for r in video_signature(fs).collect()}
    assert got == {i: _sig_model(hs) for i, hs in by.items()}
    assert 0 <= min(got.values()) and max(got.values()) < 1 << 63


def test_fused_signatures_match_composed_path(spark):
    """video_signatures_fused (one mapInPandas pass, r13 optimization)
    must be bit-identical to video_signature(video_frame_sample(...))
    — the composed path it replaced in video_near_dup_pairs and the
    store's hash hook."""
    from time_series_storage_spark.operators.video import (
        video_signatures_fused,
    )

    t1 = "the quick brown fox jumps over the lazy dog " * 6
    t2 = t1[:200] + "EDITED FRAME CONTENT XX XX XXX" + t1[230:]
    t3 = "completely different content made of other words " * 5
    t4 = "x"  # single short frame
    df = spark.createDataFrame(
        [(1, _clip(t1)), (2, _clip(t2)), (3, _clip(t3)), (4, _clip(t4))],
        "id long, payload binary",
    )
    composed = {
        r.id: r.sig
        for r in video_signature(
            video_frame_sample(df, "id", "payload", 4)
        ).collect()
    }
    fused = {
        r.id: r.sig
        for r in video_signatures_fused(df, "id", "payload", 4).collect()
    }
    assert fused == composed


def test_near_dup_pairs_edit_tolerant(spark):
    """An edited middle frame leaves the majority signature within
    the Hamming bar; an unrelated clip stays out."""
    t1 = "the quick brown fox jumps over the lazy dog " * 6
    t2 = t1[:200] + "EDITED FRAME CONTENT XX XX XXX" + t1[230:]
    t3 = "completely different content made of other words " * 5
    df = spark.createDataFrame(
        [(1, _clip(t1)), (2, _clip(t2)), (3, _clip(t3))],
        "id long, payload binary",
    )
    pairs = {
        (r.id1, r.id2): r.hamming
        for r in video_near_dup_pairs(df, "id", "payload").collect()
    }
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs)


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdefgh ",
            min_size=1,
            max_size=200,
        ).filter(lambda t: len(t.strip()) > 0),
        min_size=1,
        max_size=5,
    )
)
def test_near_dup_recall_exhaustive(spark, texts):
    """Property: the banded pair search finds EXACTLY the pairs an
    all-pairs scan over python-model signatures finds (perfect recall
    at hamming <= 8 by pigeonhole)."""
    clips = [(i, _clip(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(clips, "id long, payload binary")
    fs = video_frame_sample(df, "id", "payload", 4)
    by = {}
    for r in fs.collect():
        by.setdefault(r.id, []).append(r.phash)
    sigs = {i: _sig_model(hs) for i, hs in by.items()}
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 8
    }
    got = {
        (r.id1, r.id2): r.hamming
        for r in video_near_dup_pairs(df, "id", "payload").collect()
    }
    assert got == want
