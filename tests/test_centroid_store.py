"""CentroidStore (operators/centroid_store.py) — persisted incremental
per-label embedding prototypes, the fourth ADDITIVE-merge member of
the snapshot store family.

The driver-level oracle row is centroid_drift_incremental; these tests
pin what it can't see: the additive merge property (absorb in any
split = one-shot sums; centroids derived at read), drift semantics
(cos 1e6 for an unmoved prototype, -1 for a new label, the
online-evaluation emission against the PRE-update state), fold()
invisibility, exactly-once replay, per-stage commit-crash replay,
reopen/params pinning, and the streaming foreachBatch twin.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from time_series_storage_spark.operators.centroid_store import (
    CentroidStore,
)

D = 4
SCHEMA = "vec_id long, embedding array<float>, label long"


def _mk(spark, tmp_path, name):
    return CentroidStore(spark, str(tmp_path / name), dim=D)


def _q(v):
    import decimal

    import numpy as np

    out = []
    for x in v:
        d = decimal.Decimal(float(np.float32(x))) * 1_000_000
        out.append(int(d.quantize(0, rounding=decimal.ROUND_HALF_UP)))
    return out


def _sums_model(rows):
    s = {}
    for _, v, lb in rows:
        q = _q(v)
        for d, c in enumerate(q):
            k = (lb, d)
            cs, cn = s.get(k, (0, 0))
            s[k] = (cs + c, cn + 1)
    return s


def _centroid_model(rows):
    s = _sums_model(rows)
    labels = {lb for lb, _ in s}
    out = {}
    for lb in labels:
        comps = []
        for d in range(D):
            cs, cn = s[(lb, d)]
            q = abs(cs) // cn
            comps.append(q if cs >= 0 else -q)
        out[lb] = comps
    return out


def _drift_model(hist_rows, inc_rows):
    h = _sums_model(hist_rows)
    i = _sums_model(inc_rows)
    out = {}
    for lb in {lb for lb, _ in i}:
        hn = max((n for (l, _), (_, n) in h.items() if l == lb), default=0)
        inn = max(n for (l, _), (_, n) in i.items() if l == lb)
        if hn == 0:
            out[lb] = (0, inn, -1)
            continue

        def td(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        pre = [td(h[(lb, d)][0], h[(lb, d)][1]) for d in range(D)]
        post = [
            td(
                h.get((lb, d), (0, 0))[0] + i[(lb, d)][0],
                h.get((lb, d), (0, 0))[1] + i[(lb, d)][1],
            )
            for d in range(D)
        ]
        dot = sum(a * b for a, b in zip(pre, post))
        na = math.sqrt(sum(a * a for a in pre))
        nb = math.sqrt(sum(b * b for b in post))
        v = dot / (na * nb) * 1e6
        f = math.floor(v)
        out[lb] = (hn, inn, int(f + (1 if v - f >= 0.5 else 0)))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lb) for i, v, lb in rows], SCHEMA
    )


DAY1 = [
    (0, [1.0, 0.1, -0.2, 0.0], 0),
    (1, [0.9, 0.2, -0.1, 0.1], 0),
    (2, [-0.5, 0.8, 0.3, -0.4], 1),
]
DAY2 = [
    (3, [1.1, 0.0, -0.3, 0.2], 0),
    (4, [-0.6, 0.7, 0.2, -0.5], 1),
]
DAY3 = [
    (5, [0.8, 0.3, -0.2, 0.1], 0),
    (6, [0.0, 0.0, 1.0, 0.0], 7),  # new label: no baseline
]


def _read_centroids(store):
    return {
        r.label: list(r.centroid) for r in store.centroids().collect()
    }


def test_centroid_additive_merge(spark, tmp_path):
    store = _mk(spark, tmp_path, "m")
    store.absorb(_df(spark, DAY1), "label", "embedding")
    store.absorb(_df(spark, DAY2), "label", "embedding")
    assert _read_centroids(store) == _centroid_model(DAY1 + DAY2)


def test_centroid_drift_semantics(spark, tmp_path):
    store = _mk(spark, tmp_path, "d")
    store.absorb(_df(spark, DAY1), "label", "embedding")
    store.absorb(_df(spark, DAY2), "label", "embedding")
    got = {
        r.lb: (r.n_hist, r.n_inc, r.cos_shift_x1e6)
        for r in store.drift(
            _df(spark, DAY3), "label", "embedding"
        ).collect()
    }
    assert got == _drift_model(DAY1 + DAY2, DAY3)
    assert got[7] == (0, 1, -1)  # new label
    # an increment equal to the history centroid direction: cos = 1e6
    same = {
        r.lb: r.cos_shift_x1e6
        for r in store.drift(
            _df(spark, DAY1 + DAY2), "label", "embedding"
        ).collect()
    }
    # re-absorbing the same distribution barely moves the prototype
    assert all(v > 990_000 for v in same.values())


def test_centroid_absorb_scores_pre_update_and_replay(spark, tmp_path):
    store = _mk(spark, tmp_path, "p")
    store.absorb(_df(spark, DAY1), "label", "embedding", batch_id=0)
    first = sorted(
        tuple(r)
        for r in store.absorb(
            _df(spark, DAY2), "label", "embedding", batch_id=1
        ).collect()
    )
    want = _drift_model(DAY1, DAY2)
    assert sorted((k, *v) for k, v in want.items()) == first
    files_before = sorted(os.listdir(store._current_dir()))
    replay = sorted(
        tuple(r)
        for r in store.absorb(
            _df(spark, DAY2), "label", "embedding", batch_id=1
        ).collect()
    )
    assert replay == first
    assert sorted(os.listdir(store._current_dir())) == files_before


def test_centroid_reopen_and_pins(spark, tmp_path):
    p = str(tmp_path / "o")
    store = CentroidStore(spark, p, dim=D)
    store.absorb(_df(spark, DAY1), "label", "embedding")
    c = _read_centroids(store)
    again = CentroidStore(spark, p, dim=D)
    assert _read_centroids(again) == c
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == CentroidStore.FORMAT
    with pytest.raises(ValueError, match="params"):
        CentroidStore(spark, p, dim=D + 1)


@pytest.mark.parametrize("stage", ["post_write", "post_publish"])
def test_centroid_commit_crash_replay(spark, tmp_path, stage):
    store = _mk(spark, tmp_path, "c")
    store.absorb(_df(spark, DAY1), "label", "embedding", batch_id=0)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, DAY2), "label", "embedding", batch_id=1)
    store._commit_fault = None
    assert _read_centroids(store) == _centroid_model(DAY1)
    store.absorb(_df(spark, DAY2), "label", "embedding", batch_id=1)
    assert _read_centroids(store) == _centroid_model(DAY1 + DAY2)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_centroid_fold_invisible(spark, tmp_path):
    store = _mk(spark, tmp_path, "f")
    store.absorb(_df(spark, DAY1), "label", "embedding")
    store.absorb(_df(spark, DAY2), "label", "embedding")
    before = _read_centroids(store)
    store.fold()
    rows = store._table("sum", "lb long, d long, s long, n long").collect()
    assert len(rows) == 2 * D  # one row per (label, dim)
    assert _read_centroids(store) == before
    store.absorb(_df(spark, DAY3), "label", "embedding")
    assert _read_centroids(store) == _centroid_model(DAY1 + DAY2 + DAY3)


def test_centroid_foreach_batch_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, day in enumerate((DAY1, DAY2)):
        _df(spark, day).coalesce(1).write.parquet(f"{src}/f{i}")
    store = _mk(spark, tmp_path, "s")
    got = []
    fn = store.foreach_batch(
        "label", "embedding", lambda df, bid: got.append((bid, df.count()))
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
    assert _read_centroids(store) == _centroid_model(DAY1 + DAY2)
    assert len(got) == 2 and all(n > 0 for _, n in got)
