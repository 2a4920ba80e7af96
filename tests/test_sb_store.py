"""SbModelStore (operators/sb_store.py) — the persisted incremental
Stupid-Backoff trigram LM, the fifth ADDITIVE-merge store.

The driver-level oracle row is sb_score_incremental; these tests pin
what it can't see: additive merge (absorb in any split = one-shot
counts; store score == batch stupid_backoff_score bit-for-bit), the
online-evaluation emission (absorb scores under the PRE-update
counts), exactly-once replay, commit-crash replay, fold()
invisibility, reopen pinning, and the streaming foreachBatch twin.
"""

from __future__ import annotations

import json
import os

import pytest

from time_series_storage_spark.operators.sb_store import SbModelStore
from time_series_storage_spark.operators.text import (
    stupid_backoff_score,
)

SCHEMA = "doc_id long, text string"
DAY1 = [(1, "a b c a b c"), (2, "b c d")]
DAY2 = [(3, "a b d b c"), (4, "c a b")]
PROBE = [(9, "a b c"), (10, "d b c"), (11, "q q q")]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _counts(store):
    return (
        sorted(tuple(r) for r in store.uni_counts().collect()),
        sorted(tuple(r) for r in store.bi_counts().collect()),
        sorted(tuple(r) for r in store.tri_counts().collect()),
    )


def test_sb_additive_merge_equals_batch(spark, tmp_path):
    """Two absorbs == counts of the concatenation, and the store's
    score equals batch stupid_backoff_score fit on the concatenation
    bit-for-bit (shared arithmetic helper + additive counts)."""
    store = SbModelStore(spark, str(tmp_path / "m"))
    store.absorb(_df(spark, DAY1))
    store.absorb(_df(spark, DAY2))
    got = sorted(
        tuple(r) for r in store.score(_df(spark, PROBE)).collect()
    )
    want = sorted(
        tuple(r)
        for r in stupid_backoff_score(
            _df(spark, DAY1 + DAY2), _df(spark, PROBE)
        ).collect()
    )
    assert got == want and len(got) == 3


def test_sb_absorb_scores_pre_update_and_replay(spark, tmp_path):
    store = SbModelStore(spark, str(tmp_path / "p"))
    store.absorb(_df(spark, DAY1), batch_id=0)
    first = sorted(
        tuple(r)
        for r in store.absorb(_df(spark, DAY2), batch_id=1).collect()
    )
    want = sorted(
        tuple(r)
        for r in stupid_backoff_score(
            _df(spark, DAY1), _df(spark, DAY2)
        ).collect()
    )
    assert first == want  # scored under the PRE-update counts
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        tuple(r)
        for r in store.absorb(_df(spark, DAY2), batch_id=1).collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before


def test_sb_empty_model_scores_zero(spark, tmp_path):
    store = SbModelStore(spark, str(tmp_path / "z"))
    rows = store.score(_df(spark, PROBE)).collect()
    assert {r.sum_s_x1e9 for r in rows} == {0}


@pytest.mark.parametrize("stage", ["post_write", "post_publish"])
def test_sb_commit_crash_replay(spark, tmp_path, stage):
    store = SbModelStore(spark, str(tmp_path / "c"))
    store.absorb(_df(spark, DAY1), batch_id=0)
    before = _counts(store)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), batch_id=1)
    store._commit_fault = None
    assert _counts(store) == before
    store.absorb(_df(spark, DAY2), batch_id=1)
    oneshot = SbModelStore(spark, str(tmp_path / "o"))
    oneshot.absorb(_df(spark, DAY1 + DAY2))
    assert _counts(store) == _counts(oneshot)


def test_sb_fold_invisible_and_reopen(spark, tmp_path):
    p = str(tmp_path / "f")
    store = SbModelStore(spark, p)
    store.absorb(_df(spark, DAY1))
    store.absorb(_df(spark, DAY2))
    before = _counts(store)
    store.fold()
    assert _counts(store) == before
    again = SbModelStore(spark, p)
    assert _counts(again) == before
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == SbModelStore.FORMAT
    assert meta["params"] == ["sb-v1"]


def test_sb_foreach_batch_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, day in enumerate((DAY1, DAY2)):
        _df(spark, day).coalesce(1).write.parquet(f"{src}/f{i}")
    store = SbModelStore(spark, str(tmp_path / "s"))
    got = []
    fn = store.foreach_batch(
        "doc_id", "text", lambda df, bid: got.append((bid, df.count()))
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    oneshot = SbModelStore(spark, str(tmp_path / "o"))
    oneshot.absorb(_df(spark, DAY1 + DAY2))
    assert _counts(store) == _counts(oneshot)
    assert len(got) == 2
