"""Round-13 operators: token-budgeted mixture sampling, the IVF-PQ
nprobe serving-knob audit, the skew-bounded cluster sampler window,
and the unigram long-word exclusion surface.

The mixer/sampler tests pin the EXACT-two-phase windows against a
brute-force single-pass Python reference (the same role the DuckDB
oracles play at the gate, but with pathological skew the gate corpus
doesn't have), and assert the PLAN carries the two-phase shape (a
``spark_partition_id``-keyed local window before the global one) so a
refactor back to the single mega-sort window fails loudly.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.split import token_budget_mix


def _h(i, salt="v1"):
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)


def _cbal_h(i):
    return int(hashlib.md5(f"cbal:{i}".encode()).hexdigest()[:15], 16)


def _ref_token_mix(rows, budget, temperature=2):
    """Single-pass reference: tempered token quotas + greedy prefix
    admission in (md5, id) order — the naive one-window semantics the
    two-phase operator must reproduce bit for bit."""
    import math

    by_key: dict[str, list[tuple[int, int]]] = {}
    for key, i, tok in rows:
        by_key.setdefault(key, []).append((i, tok))
    totals = {k: sum(t for _, t in v) for k, v in by_key.items()}
    if temperature == 1:
        w = {k: n * 1_000_000 for k, n in totals.items()}
    elif temperature == 2:
        w = {k: math.floor(math.sqrt(n) * 1e6) for k, n in totals.items()}
    else:
        w = {
            k: math.floor(math.sqrt(math.sqrt(n)) * 1e6)
            for k, n in totals.items()
        }
    tw = sum(w.values())
    quota = {k: (budget * w[k]) // tw for k in w}
    out = {}
    for k, members in by_key.items():
        members.sort(key=lambda it: (_h(it[0]), it[0]))
        cum = 0
        for rank, (i, tok) in enumerate(members, start=1):
            if cum >= quota[k]:
                break
            cum += tok
            out[(k, i)] = (rank, cum, quota[k])
    return out


def _mix_df(spark, rows):
    return spark.createDataFrame(
        [(k, i, t) for k, i, t in rows], "src string, id long, tok long"
    )


def test_token_budget_mix_matches_naive_reference(spark):
    rows = [
        (f"s{g}", g * 1000 + i, 1 + (i * 7 + g) % 40)
        for g in range(5)
        for i in range((g + 1) * 30)
    ]
    got = {
        (r["src"], r["id"]): (r["mix_rank"], r["cum_tokens"], r["quota"])
        for r in token_budget_mix(
            _mix_df(spark, rows).repartition(8), "src", "id", "tok", 900
        ).collect()
    }
    assert got == _ref_token_mix(rows, 900)


def test_token_budget_mix_boundary_doc_admitted(spark):
    # one source, quota = budget (single key takes the whole budget):
    # the doc whose cumulative sum CROSSES the quota must be admitted
    rows = [("a", i, 10) for i in range(20)]
    sel = token_budget_mix(
        _mix_df(spark, rows), "src", "id", "tok", 35
    ).collect()
    # quota 35, docs of 10 tokens: prefixes 0,10,20,30 < 35 -> 4 docs
    assert len(sel) == 4
    assert max(r["cum_tokens"] for r in sel) == 40  # crossed, admitted
    assert all(
        r["cum_tokens"] - 10 < r["quota"] == 35 for r in sel
    )


def test_token_budget_mix_positive_quota_yields_a_doc(spark):
    # a tiny source beside a huge one: tempered weights keep its quota
    # positive and the boundary rule admits its first (huge) document
    rows = [("big", i, 5) for i in range(400)] + [("tiny", 9000, 500)]
    sel = token_budget_mix(
        _mix_df(spark, rows).repartition(6), "src", "id", "tok", 600
    )
    by_src = {
        r["src"]: r["n"]
        for r in sel.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("tiny", 0) == 1
    assert by_src["big"] >= 1
    assert {
        (r["src"], r["id"]): (r["mix_rank"], r["cum_tokens"], r["quota"])
        for r in sel.collect()
    } == _ref_token_mix(rows, 600)


def test_token_budget_mix_skewed_key_and_plan_shape(spark):
    # one source holds ~95% of the corpus spread over many input
    # partitions: output still exact, and the executed plan carries
    # the two-phase shape (a spark_partition_id-keyed local window)
    rows = [("hot", i, 1 + i % 9) for i in range(3000)] + [
        (f"cold{g}", 100_000 + g * 100 + i, 3)
        for g in range(4)
        for i in range(20)
    ]
    df = _mix_df(spark, rows).repartition(16)
    sel = token_budget_mix(df, "src", "id", "tok", 2000)
    assert {
        (r["src"], r["id"]): (r["mix_rank"], r["cum_tokens"], r["quota"])
        for r in sel.collect()
    } == _ref_token_mix(rows, 2000)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_token_budget_mix_rejects_inexact_temperature(spark):
    with pytest.raises(ValueError, match="temperature"):
        token_budget_mix(
            _mix_df(spark, [("a", 1, 1)]), "src", "id", "tok", 10,
            temperature=3,
        )


# -- cluster sampler: two-phase per-cell window ------------------------------


def _ref_cluster_pick(assign, k):
    n = len(assign)
    by_cell: dict[int, list[int]] = {}
    for cell, vid in assign:
        by_cell.setdefault(cell, []).append(vid)
    out = {}
    for cell, members in by_cell.items():
        q = max(1, k * len(members) // n)
        members.sort(key=lambda v: (_cbal_h(v), v))
        for rank, vid in enumerate(members[:q], start=1):
            out[(cell, vid)] = (rank, q)
    return out


def test_cluster_quota_pick_skewed_cell_exact_and_two_phase(spark):
    from time_series_storage_spark.queries_extensions import (
        CBAL_K,
        _cluster_quota_pick,
    )

    # one mega-cell with 90% of the rows across 16 input partitions
    assign = [(0, v) for v in range(2700)] + [
        (c, 10_000 + c * 1000 + v) for c in range(1, 7) for v in range(50)
    ]
    df = spark.createDataFrame(
        assign, "cell_id long, vec_id long"
    ).repartition(16)
    got = {
        (r["cell_id"], r["vec_id"]): (r["pick_rank"], r["quota"])
        for r in _cluster_quota_pick(spark, df).collect()
    }
    assert got == _ref_cluster_pick(assign, CBAL_K)
    plan = (
        _cluster_quota_pick(spark, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SPARK_PARTITION_ID" in plan.upper()


# -- IVF-PQ nprobe audit ------------------------------------------------------


def test_ivfpq_nprobe_audit_shape_and_tradeoff(spark):
    """The audit's contract on the gate corpus: probed fraction
    strictly increases with nprobe (more cells = more work, always),
    recall stays above the store's 80% pin at every setting, and
    recall is monotone across the UNSATURATED low settings (4 -> 8).
    Past the knee the FIXED k*refine ADC shortlist gets crowded by
    extra candidates whose quantized scores outrank true neighbors,
    so recall can DIP at nprobe=16 — that saturation is exactly what
    the audit exists to measure (it is why IVFPQ_NPROBE=12 is pinned
    rather than 'probe everything')."""
    from time_series_storage_spark.queries_extensions import (
        IVFPQ_NPROBE_SWEEP,
        q_ivfpq_nprobe_audit,
    )

    rows = sorted(
        q_ivfpq_nprobe_audit(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == list(IVFPQ_NPROBE_SWEEP)
    probed = [r["probed_x1e6"] for r in rows]
    assert probed == sorted(probed) and len(set(probed)) == len(probed)
    assert probed[-1] == 1_000_000  # nprobe = all 16 cells
    recalls = {r["nprobe"]: r["recall_x1e6"] for r in rows}
    assert all(v >= 800_000 for v in recalls.values())
    assert recalls[8] >= recalls[4]
    for r in rows:
        assert r["recall_x1e6"] * (r["n_queries"] * 10) // 1_000_000 <= r[
            "hits"
        ]


# -- unigram long-word exclusion ---------------------------------------------


def test_unigram_long_word_excluded_loudly(spark):
    from time_series_storage_spark.operators.unigram import (
        UNI_MAX_WORD,
        unigram_excluded,
        unigram_segment,
    )

    long_word = "x" * (UNI_MAX_WORD + 3)
    wc = spark.createDataFrame(
        [("alpha", 4), ("beta", 2), (long_word, 5)], "w string, cnt long"
    )
    segs = unigram_segment(wc)
    segged = {r["w"] for r in segs.collect()}
    assert "alpha" in segged and "beta" in segged
    assert long_word not in segged  # excluded from the DP...
    row = unigram_excluded(wc).collect()[0]  # ...but surfaced, not silent
    assert row["n_excluded_words"] == 1
    assert row["n_excluded_occurrences"] == 5
    # both-engine mirror: the documented SQL counts the same exclusion
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE words (w VARCHAR, cnt BIGINT);"
        f"INSERT INTO words VALUES ('alpha', 4), ('beta', 2), "
        f"('{long_word}', 5)"
    )
    nw, nocc = con.execute(
        "SELECT COUNT(*), COALESCE(SUM(cnt), 0) FROM words "
        f"WHERE length(w) > {UNI_MAX_WORD}"
    ).fetchone()
    assert (nw, nocc) == (1, 5)


def test_unigram_excluded_zero_when_all_words_fit(spark):
    from time_series_storage_spark.operators.unigram import (
        unigram_excluded,
    )

    wc = spark.createDataFrame([("ok", 3)], "w string, cnt long")
    row = unigram_excluded(wc).collect()[0]
    assert row["n_excluded_words"] == 0
    assert row["n_excluded_occurrences"] == 0


# -- epochs plan --------------------------------------------------------------


def _ref_epochs(rows, budget, temperature=2):
    import math

    by_key: dict[str, list[tuple[int, int]]] = {}
    for key, i, tok in rows:
        by_key.setdefault(key, []).append((i, tok))
    totals = {k: sum(t for _, t in v) for k, v in by_key.items()}
    assert temperature == 2
    w = {k: math.floor(math.sqrt(n) * 1e6) for k, n in totals.items()}
    tw = sum(w.values())
    out = {}
    for k, members in by_key.items():
        quota = (budget * w[k]) // tw
        full = quota // totals[k]
        rem = quota - full * totals[k]
        members.sort(key=lambda it: (_h(it[0]), it[0]))
        pd = pt = cum = 0
        for i, tok in members:
            if cum >= rem:
                break
            cum += tok
            pd += 1
            pt += tok
        out[k] = (
            len(members), totals[k], quota, full, pd, pt,
            full * totals[k] + pt,
        )
    return out


def test_epochs_plan_matches_naive_reference(spark):
    from time_series_storage_spark.operators.split import epochs_plan

    rows = [
        (f"s{g}", g * 1000 + i, 1 + (i * 5 + g) % 30)
        for g in range(4)
        for i in range((g + 1) * 25)
    ]
    got = {
        r["src"]: (
            r["n_docs"], r["n_tokens"], r["quota"], r["epochs_full"],
            r["partial_docs"], r["partial_tokens"], r["served_tokens"],
        )
        for r in epochs_plan(
            _mix_df(spark, rows).repartition(8), "src", "id", "tok", 9000
        ).collect()
    }
    assert got == _ref_epochs(rows, 9000)
    # replication is active somewhere and never undershoots the quota
    # by a full division step
    assert any(v[3] >= 1 for v in got.values())
    for n_docs, n_tok, quota, full, pd, pt, served in got.values():
        rem = quota - full * n_tok
        assert (served >= quota) if rem > 0 else (served == quota)


def test_epochs_plan_exact_division_serves_exactly(spark):
    from time_series_storage_spark.operators.split import epochs_plan

    # one key, quota an exact multiple of the mass: rem = 0, no
    # partial epoch, served == quota
    rows = [("a", i, 10) for i in range(10)]  # mass 100
    r = epochs_plan(_mix_df(spark, rows), "src", "id", "tok", 300).collect()
    assert len(r) == 1
    row = r[0]
    assert (
        row["quota"], row["epochs_full"], row["partial_docs"],
        row["partial_tokens"], row["served_tokens"],
    ) == (300, 3, 0, 0, 300)


def test_epochs_plan_subunit_quota_is_mixer_prefix(spark):
    from time_series_storage_spark.operators.split import (
        epochs_plan,
        token_budget_mix,
    )

    # when quota < mass for every key (epochs_full = 0), the partial
    # epoch IS the mixer's admitted set — the two operators agree on
    # the shared prefix semantics
    rows = [
        (f"s{g}", g * 100 + i, 2 + (i + g) % 7)
        for g in range(3)
        for i in range(40)
    ]
    budget = 90
    plan = {
        r["src"]: (r["partial_docs"], r["partial_tokens"])
        for r in epochs_plan(
            _mix_df(spark, rows), "src", "id", "tok", budget
        ).collect()
    }
    mix = token_budget_mix(
        _mix_df(spark, rows), "src", "id", "tok", budget
    )
    agg = {
        r["src"]: (r["n"], r["t"])
        for r in mix.groupBy("src")
        .agg(
            F.count("*").alias("n"), F.sum("tok").alias("t")
        )
        .collect()
    }
    assert plan == agg


# -- token waterfill ----------------------------------------------------------


def _ref_token_waterfill(rows, budget):
    """Closed-form UniMax waterfill on token masses + prefix
    admission, replicated via the paper's iterate-smallest-first
    loop (the independent formulation the closed form must equal)."""
    by_key: dict[str, list[tuple[int, int]]] = {}
    for key, i, tok in rows:
        by_key.setdefault(key, []).append((i, tok))
    masses = {k: sum(t for _, t in v) for k, v in by_key.items()}
    # iterative water-filling: smallest source first
    todo = sorted(masses, key=lambda k: (masses[k], k))
    alloc = {}
    b = budget
    while todo:
        share = b // len(todo)
        k = todo[0]
        if masses[k] <= share:
            alloc[k] = masses[k]
            b -= masses[k]
            todo.pop(0)
        else:
            # everyone left is capped at the equal share; the floor
            # remainder goes to the LAST keys in sort order
            r = b - share * len(todo)
            for j, kk in enumerate(todo):
                alloc[kk] = share + (1 if j >= len(todo) - r else 0)
            todo = []
    out = {}
    for k, members in by_key.items():
        members.sort(key=lambda it: (_h(it[0]), it[0]))
        cum = 0
        for rank, (i, tok) in enumerate(members, start=1):
            if cum >= alloc[k]:
                break
            cum += tok
            out[(k, i)] = (rank, cum, alloc[k])
    return out


def test_token_waterfill_matches_iterative_unimax(spark):
    from time_series_storage_spark.operators.split import (
        token_waterfill_mix,
    )

    # masses straddle the equal share: small keys fit entirely
    # (redistribution live), large keys capped, remainder nonzero
    rows = (
        [("tiny", i, 3) for i in range(10)]          # mass 30
        + [("small", 100 + i, 5) for i in range(20)]  # mass 100
        + [("mid", 200 + i, 7) for i in range(50)]    # mass 350
        + [("big", 300 + i, 9) for i in range(100)]   # mass 900
    )
    for budget in (200, 500, 997, 1380, 2000):
        got = {
            (r["src"], r["id"]): (r["mix_rank"], r["cum_tokens"], r["alloc"])
            for r in token_waterfill_mix(
                _mix_df(spark, rows).repartition(8),
                "src", "id", "tok", budget,
            ).collect()
        }
        assert got == _ref_token_waterfill(rows, budget), budget


def test_token_waterfill_fitting_key_admits_all_exactly(spark):
    from time_series_storage_spark.operators.split import (
        token_waterfill_mix,
    )

    rows = [("a", i, 4) for i in range(5)] + [
        ("b", 100 + i, 50) for i in range(40)
    ]
    sel = token_waterfill_mix(
        _mix_df(spark, rows), "src", "id", "tok", 600
    )
    a_rows = [r for r in sel.collect() if r["src"] == "a"]
    # source a (mass 20 <= share) fits: every doc admitted, allocation
    # equals mass, no boundary overshoot
    assert len(a_rows) == 5
    assert all(r["alloc"] == 20 for r in a_rows)
    assert max(r["cum_tokens"] for r in a_rows) == 20


# -- context packing ----------------------------------------------------------


def test_pack_contexts_layout_invariants(spark):
    from time_series_storage_spark.queries_extensions import (
        CTX_LEN,
        q_tokmix_pack_contexts,
    )

    rows = q_tokmix_pack_contexts(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    rows.sort(key=lambda r: r["train_pos"])
    cum = 0
    for i, r in enumerate(rows, start=1):
        assert r["train_pos"] == i  # dense positions
        # placement arithmetic: start/offset recover the prefix sum
        assert r["ctx_start"] * CTX_LEN + r["ctx_offset"] == cum
        assert 0 <= r["ctx_offset"] < CTX_LEN
        cum += r["n_tokens"]
        last_tok = cum - 1
        assert (
            r["n_ctx_spanned"]
            == last_tok // CTX_LEN - r["ctx_start"] + 1
        )
    # the packed stream is gap-free: every context index up to the
    # last is touched by some document
    touched = set()
    for r in rows:
        touched.update(
            range(r["ctx_start"], r["ctx_start"] + r["n_ctx_spanned"])
        )
    assert touched == set(range((cum - 1) // CTX_LEN + 1))
