"""DsirModelStore — the second additive-merge store: summed increment
counts must equal the one-shot model, scoring is online (pre-update),
replay is exactly-once, and commit crashes leave readers whole."""

from __future__ import annotations

import json
import os

import pytest

from time_series_storage_spark.operators import text as T
from time_series_storage_spark.operators.dsir_store import DsirModelStore

SCHEMA = "doc_id long, text string, _is_target boolean"

DAY1 = [
    (1, "alpha beta gamma alpha beta", True),
    (2, "zeta eta theta zeta", False),
]
DAY2 = [
    (10, "alpha beta gamma", True),
    (11, "zeta eta theta zeta", False),  # day-1 RAW-only n-grams
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_additive_merge_equals_one_shot_fit(spark, tmp_path):
    """Two absorbs sum to the model fit on the concatenated corpus:
    scoring any document set under the incrementally-built store
    equals the batch dsir_importance over the full corpus."""
    inc = DsirModelStore(spark, str(tmp_path / "inc"))
    inc.absorb(_df(spark, DAY1))
    inc.absorb(_df(spark, DAY2))
    both = _df(spark, DAY1 + DAY2)
    assert _rows(inc.score(both.drop("_is_target"))) == _rows(
        T.dsir_importance(both)
    )
    # and equals a one-shot store too
    one = DsirModelStore(spark, str(tmp_path / "one"))
    one.absorb(both)
    assert _rows(inc.raw_counts()) == _rows(one.raw_counts())
    assert _rows(inc.target_counts()) == _rows(one.target_counts())


def test_absorb_scores_under_pre_update_model(spark, tmp_path):
    """Online evaluation: the absorb emission is the score under the
    model BEFORE today's counts land — for the first batch that is
    the uninformative empty-model prior (ratio exactly 1.0 per term),
    and for the second batch the day-1 model's verdict."""
    store = DsirModelStore(spark, str(tmp_path / "m"))
    out1 = {r.doc_id: (r.n_terms, r.sum_ratio_x1e9)
            for r in store.absorb(_df(spark, DAY1)).collect()}
    assert out1[1] == (4, 4_000_000_000)  # empty model: 1e9 per term
    assert out1[2] == (3, 3_000_000_000)
    day1_scores = _rows(store.score(_df(spark, DAY2).drop("_is_target")))
    out2 = _rows(store.absorb(_df(spark, DAY2)))
    assert out2 == day1_scores
    # the target-vocabulary doc outranks the raw-only-vocabulary doc
    # under the day-1 model (its buckets have ct ~ cr, the raw-only
    # buckets have ct = 0 against cr >= 1)
    d = {r[0]: r[2] / r[1] for r in out2}
    assert d[10] > d[11]


def test_batch_replay_is_exactly_once(spark, tmp_path):
    """A replayed batch id re-reads its committed emission and never
    re-adds counts; an older id returns empty; a manual absorb keeps
    the watermark."""
    store = DsirModelStore(spark, str(tmp_path / "m"))
    first = _rows(store.absorb(_df(spark, DAY1), batch_id=0))
    raw_after = _rows(store.raw_counts())
    assert _rows(store.absorb(_df(spark, DAY1), batch_id=0)) == first
    assert _rows(store.raw_counts()) == raw_after  # no double-add
    assert store.absorb(_df(spark, DAY1), batch_id=-1).count() == 0
    store.absorb(_df(spark, DAY2))  # manual: watermark survives
    meta = json.load(open(os.path.join(store.path, "_current")))
    assert meta["batch"] == 0


def test_commit_crash_leaves_readers_on_old_model(spark, tmp_path):
    store = DsirModelStore(spark, str(tmp_path / "m"))
    store.absorb(_df(spark, DAY1))
    before = _rows(store.raw_counts())

    def boom(stage):
        if stage == "post_write":
            raise RuntimeError("injected dsir crash")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="dsir crash"):
        store.absorb(_df(spark, DAY2))
    store._commit_fault = None
    assert _rows(store.raw_counts()) == before
    store.absorb(_df(spark, DAY2))  # retry converges
    one = DsirModelStore(spark, str(tmp_path / "one"))
    one.absorb(_df(spark, DAY1 + DAY2))
    assert _rows(store.raw_counts()) == _rows(one.raw_counts())


def test_bucket_params_pinned_on_reopen(spark, tmp_path):
    store = DsirModelStore(spark, str(tmp_path / "m"), buckets=256)
    store.absorb(_df(spark, DAY1))
    with pytest.raises(ValueError, match="params"):
        DsirModelStore(spark, str(tmp_path / "m"), buckets=128)
