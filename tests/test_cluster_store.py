"""ClusterStore: incremental connected components — sequential
contract vs from-scratch CC, O(affected) commit shape, exactly-once
crash/replay, loud input validation.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.cluster_store import ClusterStore
from time_series_storage_spark.operators.dedup import connected_components


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _pairs(spark, ps):
    return spark.createDataFrame(ps or [], "d1 long, d2 long")


def _scratch(spark, ids, ps):
    return {
        r.node: r.cluster
        for r in connected_components(
            _pairs(spark, ps), _nodes(spark, ids), "doc_id"
        ).collect()
    }


def _assign(store):
    return {r.node: r.cluster for r in store.clusters().collect()}


def test_incremental_equals_scratch_across_three_days(spark, tmp_path):
    """Three absorbs — growing a component, merging two old components
    through a new bridge node, and adding singletons — always equal a
    from-scratch CC over the union graph."""
    st = ClusterStore(spark, str(tmp_path / "cc"))
    d1_ids, d1_ps = [1, 2, 3, 4, 5], [(1, 2), (3, 4)]
    st.absorb(_nodes(spark, d1_ids), _pairs(spark, d1_ps))
    assert _assign(st) == _scratch(spark, d1_ids, d1_ps)

    # day 2: 10 joins {1,2}; 11 is a singleton
    d2_ids, d2_ps = [10, 11], [(2, 10)]
    out = {
        r.doc_id: r.cluster
        for r in st.absorb(
            _nodes(spark, d2_ids), _pairs(spark, d2_ps)
        ).collect()
    }
    want = _scratch(spark, d1_ids + d2_ids, d1_ps + d2_ps)
    assert _assign(st) == want
    assert out == {i: want[i] for i in d2_ids}  # emission = new nodes

    # day 3: 20 bridges the {1,2,10} and {3,4} components
    d3_ids, d3_ps = [20], [(10, 20), (20, 3)]
    st.absorb(_nodes(spark, d3_ids), _pairs(spark, d3_ps))
    want = _scratch(
        spark, d1_ids + d2_ids + d3_ids, d1_ps + d2_ps + d3_ps
    )
    assert _assign(st) == want
    assert want[20] == want[1] == want[3] == 1  # merged to the min id


def test_unaffected_components_are_not_rewritten(spark, tmp_path):
    """The changed-row log grows by the AFFECTED membership only: an
    absorb touching one component appends no row for the others."""
    st = ClusterStore(spark, str(tmp_path / "cc"))
    st.absorb(_nodes(spark, [1, 2, 3, 4]), _pairs(spark, [(1, 2), (3, 4)]))
    st.absorb(_nodes(spark, [10]), _pairs(spark, [(2, 10)]))
    log = st._table("clu", "node long, cluster long, _seq long")
    by_seq = {
        r["_seq"]: r["n"]
        for r in log.groupBy("_seq").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # seq 0: all four day-1 nodes; seq 1: only {1,2} + the new 10 —
    # the {3,4} component never rewrites
    assert by_seq == {0: 4, 1: 3}
    assert _assign(st)[3] == 3 and _assign(st)[4] == 3


def test_unknown_endpoint_raises(spark, tmp_path):
    st = ClusterStore(spark, str(tmp_path / "cc"))
    st.absorb(_nodes(spark, [1, 2]), _pairs(spark, [(1, 2)]))
    with pytest.raises(ValueError, match="neither.*absorbed nodes"):
        st.absorb(_nodes(spark, [3]), _pairs(spark, [(3, 99)]))


def test_crash_replay_converges_to_no_crash_twin(spark, tmp_path):
    """A commit crash during day 2 leaves day 1 intact; the replay
    commits once and a further replay is a pure read — emissions and
    both tables equal a never-crashed twin."""

    def run(tag, crash=False):
        st = ClusterStore(spark, str(tmp_path / f"cc{tag}"))
        outs = {}

        def absorb(bid, ids, ps):
            outs[bid] = sorted(
                (r.doc_id, r.cluster)
                for r in st.absorb(
                    _nodes(spark, ids), _pairs(spark, ps), batch_id=bid
                ).collect()
            )

        absorb(0, [1, 2, 3, 4], [(1, 2), (3, 4)])
        if crash:
            def boom(stage):
                if stage == "post_write":
                    raise RuntimeError("injected cluster crash")
            st._commit_fault = boom
            with pytest.raises(RuntimeError, match="cluster crash"):
                absorb(1, [10], [(10, 3)])
            st._commit_fault = None
            assert json.load(
                open(os.path.join(str(tmp_path), f"cc{tag}", "_current"))
            )["batch"] == 0
        absorb(1, [10], [(10, 3)])
        if crash:  # pure-read replay of the converged batch
            absorb(1, [10], [(10, 3)])
        edges = sorted((r.a, r.b) for r in st.edges().collect())
        return outs, _assign(st), edges

    want = run("t")
    got = run("c", crash=True)
    assert got == want
    assert want[0][1] == [(10, 3)]  # 10 joined {3,4} at label 3


def test_cluster_stream_foreach_batch_end_to_end(spark, tmp_path):
    """File-stream through ClusterStore.foreach_batch: each
    micro-batch's nodes absorb with the pairs a (static, deterministic)
    pair source yields for them; the final map equals from-scratch CC
    and the emissions carry each batch's own assignments."""
    st = ClusterStore(spark, str(tmp_path / "ccs"))
    st.absorb(_nodes(spark, [1, 2, 3]), _pairs(spark, [(1, 2)]))

    pair_src = spark.createDataFrame(
        [(2, 10), (3, 11), (10, 20)], "d1 long, d2 long"
    )

    def pair_fn(batch_df):
        ids = batch_df.select(F.col("doc_id").alias("d2"))
        return pair_src.join(ids, "d2", "left_semi")

    src = str(tmp_path / "feed")
    _nodes(spark, [10, 11]).coalesce(1).write.parquet(src + "/f0")
    _nodes(spark, [20, 21]).coalesce(1).write.parquet(src + "/f1")
    emitted = {}
    stream = spark.readStream.schema("doc_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        stream.writeStream.foreachBatch(
            st.foreach_batch(
                pair_fn, "doc_id",
                lambda df, b: emitted.__setitem__(
                    b, sorted((r.doc_id, r.cluster) for r in df.collect())
                ),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    all_ids = [1, 2, 3, 10, 11, 20, 21]
    all_ps = [(1, 2), (2, 10), (3, 11), (10, 20)]
    assert _assign(st) == _scratch(spark, all_ids, all_ps)
    # whichever file order ran, each emission holds that batch's nodes
    assert sorted(sum(emitted.values(), [])) == sorted(
        (i, _scratch(spark, all_ids, all_ps)[i]) for i in [10, 11, 20, 21]
    )


def test_cluster_store_reopen_keeps_latest_wins(spark, tmp_path):
    """A fresh handle on a committed store reads the same latest-wins
    map (the _seq precedence is in the rows, not handle state), and
    the inherited format stamp rides every commit."""
    path = str(tmp_path / "cc")
    st = ClusterStore(spark, path)
    st.absorb(_nodes(spark, [1, 2]), _pairs(spark, [(1, 2)]))
    st.absorb(_nodes(spark, [3]), _pairs(spark, [(2, 3)]))
    want = _assign(st)
    reopened = ClusterStore(spark, path)
    assert _assign(reopened) == want == {1: 1, 2: 1, 3: 1}
    meta = json.load(open(os.path.join(path, "_current")))
    assert meta["format"] == ClusterStore.FORMAT
    assert meta["params"] == ["cc-v1"]
