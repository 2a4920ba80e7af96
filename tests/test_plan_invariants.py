"""Registry-wide physical-plan invariants.

test_plan_quality.py pins per-query load-bearing features; this suite
sweeps EVERY registry query's executed plan for the global invariants
that must hold at 100 TB regardless of operator:

* no ``BatchEvalPython`` anywhere — Python touches data only through
  Arrow (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsIn
  Pandas``); one row-at-a-time evaluator in a hot path is a 10-100x
  regression that a correctness gate cannot see;
* no ``CartesianProduct`` anywhere — a non-broadcast cross join means
  some join lost its keys (the broadcast single-row scalar pattern
  plans as BroadcastNestedLoopJoin, which is allowed and bounded);
* ``BroadcastNestedLoopJoin`` appears at most twice per plan, and only
  where a scalar/threshold broadcast is the intended shape.

A new query that violates one of these fails HERE with its name, not
at cluster scale.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"

# queries whose plan intentionally carries >0 BroadcastNestedLoopJoin
# (single-row scalar broadcasts: thresholds, vocab size, corpus
# totals). The sweep caps them at 2 per plan, except the SemDeDup /
# recall-audit family whose fixed-point k-means chains a THIRD bounded
# broadcast (the collected centroid array rides as one keyless
# broadcast row per assignment pass — similarity.py documents the
# shape; build sides are k centroids / one scalar by construction).
_NLJ_BUDGET = 2
_NLJ_OVERRIDES = {
    "semantic_dedup": 3,
    "text_semantic_dedup": 3,
    "sim_recall_audit": 3,
    # the modern pipeline embeds DSIR's single-row corpus-totals
    # broadcast (one bounded scalar NLJ by construction) under
    # exact_substring_dedup, whose words/windows/reattach branches
    # each replan the upstream — the same ONE scalar join printed
    # four times, never a wide build side
    "pipeline_modern_curation": 4,
    # the ANN serving audits union one topk_adc plan PER SWEPT
    # SETTING; every branch carries the same keyless broadcast of the
    # 16-row centroid table (the coarse-probe join — build side is
    # n_cells rows by construction) plus the sweep-literal cross join
    # (4 rows / 16 rows). Wide per-branch work is the ADC equi-join;
    # the NLJs are all constant-size build sides
    "ivfpq_nprobe_audit": 5,
    "ivfpq_serving_grid": 9,
}


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_registry_plan_invariants(spark):
    qs = _registry()
    violations: list[str] = []
    for name, fn in sorted(qs.items()):
        try:
            # per-query cache isolation, matching bench.py's
            # clearCache-between-queries methodology: queries that
            # register in-query persists would otherwise stack
            # InMemoryRelation layers from EVERY previously planned
            # query into later plans, repeating each cached subtree's
            # scalar-broadcast text and inflating the NLJ counts with
            # occurrences no real (per-query) execution contains
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # construction failure is its own bug
            violations.append(f"{name}: failed to plan ({exc})")
            continue
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time BatchEvalPython")
        if "CartesianProduct" in plan:
            violations.append(f"{name}: CartesianProduct (keyless join)")
        nlj = plan.count("BroadcastNestedLoopJoin")
        budget = _NLJ_OVERRIDES.get(name, _NLJ_BUDGET)
        if nlj > budget:
            violations.append(
                f"{name}: {nlj} BroadcastNestedLoopJoins (> {budget}"
                " — is a scalar broadcast actually a wide join?)"
            )
    assert not violations, "\n".join(violations)
