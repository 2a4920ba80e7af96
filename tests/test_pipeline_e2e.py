"""The end-to-end curation pipeline (quality filter -> exact dedup ->
MinHash near-dup removal -> decontamination -> weighted mix) as ONE
lazy DAG.

Correctness of the composed VALUES is gated by the DuckDB oracle
(tests/test_extensions_oracle.py runs ``pipeline_e2e`` like every other
registry query); this file pins the structural claims that gate can't
see: construction is action-free, the plan is a single DAG with the
expected stage operators, and the stage contracts survive chaining.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_storage_spark.queries_extensions import (
    MIX_DEFAULT,
    MIX_QUOTAS,
    PIPE_QUALITY_MIN,
    q_pipeline_e2e,
    q_text_quality,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_build_runs_zero_jobs(spark):
    """Composing the five stages must not trigger Spark jobs beyond
    the parquet-footer read the source load itself costs: no stage
    collects, checkpoints, or otherwise materializes — the whole chain
    reaches Catalyst as one lazy plan."""
    from time_series_storage_spark.sources.testdata import read_table

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # baseline: a bare source read runs N metadata jobs (parquet footer
    # listing) and nothing else
    sc.setJobGroup("e2e_baseline", "bare source read probe")
    try:
        read_table(spark, SF_DIR, "documents")
    finally:
        sc.setJobGroup(None, None)
    baseline = len(tracker.getJobIdsForGroup("e2e_baseline"))

    sc.setJobGroup("e2e_build", "pipeline construction probe")
    try:
        df = q_pipeline_e2e(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None)
    jobs = list(tracker.getJobIdsForGroup("e2e_build"))
    assert len(jobs) == baseline, (
        f"construction ran {len(jobs)} jobs vs {baseline} for a bare "
        f"source read — some stage materialized mid-chain: {jobs}"
    )
    assert df.columns == [
        "doc_id", "source", "lang", "quality_x1000", "mix_rank",
    ]


def test_pipeline_plan_is_one_dag(spark):
    """The executed plan contains every stage's signature operator —
    proof the chain optimized as one plan rather than five detached
    queries — and no Python-side evaluation (no BatchEvalPython /
    mapInPandas in the curation path)."""
    df = q_pipeline_e2e(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan          # near-dup drop + decontamination drop
    assert "Window" in plan            # weighted-mix rank
    assert "Generate" in plan          # shingle / token-gram explode
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_pipeline_stage_contracts_survive_chaining(spark):
    """Output-level invariants of the composition: every selected doc
    passed the quality floor, ids are unique, and no source exceeds its
    mixture quota."""
    out = q_pipeline_e2e(spark, SF_DIR).collect()
    assert out, "pipeline selected nothing at sf0.001"
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    assert all(r["quality_x1000"] >= PIPE_QUALITY_MIN for r in out)
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    for src, n in per_source.items():
        assert n <= MIX_QUOTAS.get(src, MIX_DEFAULT), (src, n)
    # the mix stage orders within source: ranks are 1..n per source
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["mix_rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src

    # chaining did not resurrect filtered docs: everything selected is
    # in the standalone quality query's passing set
    passing = {
        r["doc_id"]
        for r in q_text_quality(spark, SF_DIR)
        .where(F.col("quality_x1000") >= PIPE_QUALITY_MIN)
        .collect()
    }
    assert set(ids) <= passing


def test_pipeline_output_lands_in_curated_store(spark, tmp_path):
    """The chain's last mile: pipeline output written through the
    versioned curated sink — committed count matches the query, reads
    come back partition-pruned by source, provenance rides the
    pointer."""
    from time_series_storage_spark.sources.curated import (
        CuratedDatasetStore,
    )

    out = q_pipeline_e2e(spark, SF_DIR)
    want = out.count()
    store = CuratedDatasetStore(spark, str(tmp_path / "curated"))
    store.write(
        out, partition_by=["source"],
        provenance={"pipeline": "e2e", "quality_min": PIPE_QUALITY_MIN},
    )
    meta = store._meta()
    assert meta["count"] == want and meta["quality_min"] == PIPE_QUALITY_MIN
    assert store.read().count() == want
    got_srcs = {r["source"] for r in store.read().select("source").distinct().collect()}
    want_srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert got_srcs == want_srcs


def test_tokenize_pack_build_runs_zero_jobs(spark):
    """pipeline_tokenize_pack (curation -> vocab -> encode -> chunk ->
    pack) must also construct as one lazy DAG: no stage materializes
    during composition (the survivor-set persist is a lazy hint)."""
    from time_series_storage_spark.queries_extensions import (
        q_pipeline_tokenize_pack,
    )
    from time_series_storage_spark.sources.testdata import read_table

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("tp_baseline", "bare source read probe")
    try:
        read_table(spark, SF_DIR, "documents")
    finally:
        sc.setJobGroup(None, None)
    baseline = len(tracker.getJobIdsForGroup("tp_baseline"))

    sc.setJobGroup("tp_build", "tokenize-pack construction probe")
    try:
        df = q_pipeline_tokenize_pack(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None)
    jobs = list(tracker.getJobIdsForGroup("tp_build"))
    # the composition opens the documents source TWICE (the survivor
    # pipeline's read, and the text re-attach join) — each open costs
    # one parquet-footer metadata job; anything beyond that means a
    # stage materialized mid-chain
    assert len(jobs) <= 2 * baseline, (
        f"construction ran {len(jobs)} jobs vs {baseline} per bare "
        f"source read — some stage materialized mid-chain: {jobs}"
    )
    assert df.columns == [
        "source", "shard", "bin_id", "n_chunks", "bin_tokens",
        "bin_ids_sum",
    ]


def test_tokenize_pack_plan_and_invariants(spark):
    """One plan end-to-end: the vocab probe is a BroadcastHashJoin (the
    vocabulary is bounded by construction), the pack window partitions
    by (source, shard) — never a global Window over the chunk stream —
    and interior bins carry >= budget tokens."""
    from time_series_storage_spark.queries_extensions import (
        CHUNK_PACK_BUDGET,
        q_pipeline_tokenize_pack,
    )

    df = q_pipeline_tokenize_pack(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # vocab + survivor probes
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

    rows = df.collect()
    assert rows, "no bins produced"
    # per (source, shard): every bin except the last holds >= budget
    by_group = {}
    for r in rows:
        by_group.setdefault((r["source"], r["shard"]), []).append(r)
    from time_series_storage_spark.queries_extensions import CHUNK_W

    for (_, _), bins in by_group.items():
        bins.sort(key=lambda r: r["bin_id"])
        # cumulative-cut bound: an interior bin's first chunk can start
        # up to (chunk width - 1) tokens past the boundary, so it holds
        # at least budget - (CHUNK_W - 1) tokens
        for b in bins[:-1]:
            assert b["bin_tokens"] >= CHUNK_PACK_BUDGET - (CHUNK_W - 1), b
        # token ids are bounded by the vocab size, so a bin's id-sum
        # can't exceed bin_tokens * VOCAB_SIZE
        from time_series_storage_spark.queries_extensions import VOCAB_SIZE

        for b in bins:
            assert 0 <= b["bin_ids_sum"] <= b["bin_tokens"] * VOCAB_SIZE, b
