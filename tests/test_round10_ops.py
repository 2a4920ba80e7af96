"""Round-10 operator semantics vs pure-Python models: PageRank over
the dup graph, Holt linear smoothing, MIPS top-k, temperature mixture
allocation, canonical-per-cluster selection, multi-probe range search.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators import similarity as S
from time_series_storage_spark.operators.analytics import holt_linear
from time_series_storage_spark.operators.dedup import (
    canonical_per_cluster,
    pagerank,
)
from time_series_storage_spark.operators.split import temperature_mix


# -- PageRank -----------------------------------------------------------------

def _pr_model(nodes, pairs, n_iter, damping_x100=85):
    nbrs, deg = defaultdict(list), defaultdict(int)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
        deg[a] += 1
        deg[b] += 1
    r = {v: 1_000_000 for v in nodes}
    one_minus_d = (100 - damping_x100) * 10_000
    for _ in range(n_iter):
        inc = defaultdict(int)
        for u, vs in nbrs.items():
            share = r[u] // deg[u]
            for v in vs:
                inc[v] += share
    # fmt: off
        r = {
            v: one_minus_d + (damping_x100 * inc.get(v, 0)) // 100
            for v in nodes
        }
    # fmt: on
    return r


def test_pagerank_matches_python_model(spark):
    """Chain + triangle + star + singleton, 3 rounds: every node's
    fixed-point rank equals the integer power-iteration model,
    singletons settle at (1-d) = 150000."""
    nodes = list(range(1, 12))
    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain
        (5, 6), (6, 7), (5, 7),          # triangle
        (8, 9), (8, 10),                 # star centered on 8
    ]                                    # 11 isolated
    want = _pr_model(nodes, pairs, n_iter=3)
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {
        r.node: r.rank_x1e6
        for r in pagerank(pdf, ndf, "doc_id", n_iter=3).collect()
    }
    assert got == want
    assert got[11] == 150_000
    # the triangle is the densest structure: strictly above the chain ends
    assert got[5] > got[1] and got[5] > got[4]


# -- Holt linear trend --------------------------------------------------------

def _holt_model(xs):
    out = []
    l, b = xs[0], 0
    out.append((l, b))
    for x in xs[1:]:
        nl = int((x + l + b) / 2.0)
        nb = int((nl - l + b) / 2.0)
        l, b = nl, nb
        out.append((l, b))
    return out


@pytest.mark.parametrize(
    "xs",
    [
        [7],                               # single point: level=x, trend=0
        [0, 0, 0, 0],
        [1, 2, 3, 4, 5, 6, 7, 8],          # rising trend
        [90, 70, 50, 30, 10, 0],           # falling: negative trend halving
        [5, 100, 3, 88, 1, 77, 2],         # sawtooth: sign flips in b
    ],
)
def test_holt_linear_matches_python_model(spark, xs):
    scaled = [x * 1_000_000 for x in xs]
    df = spark.createDataFrame(
        [("s", i * 3600, v) for i, v in enumerate(scaled)],
        "k string, ep long, x long",
    )
    rows = (
        holt_linear(df, ["k"], "ep", "x")
        .orderBy("ep")
        .collect()
    )
    got = [(r.level_x1e6, r.trend_x1e6) for r in rows]
    assert got == _holt_model(scaled)
    assert [r.x for r in rows] == scaled  # observations ride along


# -- MIPS ---------------------------------------------------------------------

def test_mips_topk_matches_inner_product_model(spark):
    rng = random.Random(7)
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(8)]
        for i in range(20)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = S.mips_topk(
        df.where(F.col("vec_id") < 3), df, k=5
    ).collect()
    by_q = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.q_id, r.rank)):
        by_q[r.q_id].append(r)
    for q in (0, 1, 2):
        # exact model: ordered left-fold dot, rounded at 1e6
        want = sorted(
            (
                (-_ip_x1e6(vecs[q], vecs[c]), c)
                for c in vecs
                if c != q
            ),
        )[:5]
        got = [(-r.ip_x1e6, r.vec_id) for r in by_q[q]]
        assert got == want
        # augmented cosine is monotone in the inner product per query
        mips = [r.mips_x1e6 for r in by_q[q]]
        assert mips == sorted(mips, reverse=True)


def _dot_left(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _ip_x1e6(a, b):
    v = _dot_left(a, b) * 1e6
    # Spark round() = HALF_UP on the double
    f = math.floor(v)
    return int(f + (1 if v - f >= 0.5 else 0))


# -- temperature mixture ------------------------------------------------------

def test_temperature_mix_allocations_and_caps(spark):
    rows = (
        [(i, "big") for i in range(100)]
        + [(1000 + i, "mid") for i in range(25)]
        + [(2000 + i, "tail") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for t in (1, 2, 4):
        out = temperature_mix(df, "source", "doc_id", 30, temperature=t)
        counts = {
            r.source: r.c
            for r in out.groupBy("source")
            .agg(F.count(F.lit(1)).alias("c"), F.max("alloc").alias("a"))
            .collect()
        }
        w = {
            s: int(math.floor(n ** (1.0 / t) * 1e6))
            for s, n in (("big", 100), ("mid", 25), ("tail", 4))
        }
        tw = sum(w.values())
        sizes = {"big": 100, "mid": 25, "tail": 4}
        # a group never yields more rows than it has — the UniMax
        # single-epoch cap falls out of the selection for free
        want = {s: min((30 * ws) // tw, sizes[s]) for s, ws in w.items()}
        assert counts == {s: n for s, n in want.items() if n > 0}
    # T=2 flattens vs T=1: the head source gives up budget to the tail
    out1 = temperature_mix(df, "source", "doc_id", 30, temperature=1)
    out2 = temperature_mix(df, "source", "doc_id", 30, temperature=2)
    big1 = out1.where(F.col("source") == "big").count()
    big2 = out2.where(F.col("source") == "big").count()
    assert big2 < big1
    with pytest.raises(ValueError, match="temperatures are 1, 2 and 4"):
        temperature_mix(df, "source", "doc_id", 30, temperature=3)


# -- canonical per cluster ----------------------------------------------------

def test_canonical_per_cluster_keep_longest_semantics(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5)], "node long, cluster long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (5, 7)], "doc_id long, n_chars long"
    )
    got = {
        r.cluster: (r.keep_doc_id, r.keep_score, r.n_members)
        for r in canonical_per_cluster(clusters, docs).collect()
    }
    # argmax n_chars; tie between 2 and 3 breaks to the smaller id;
    # singleton keeps itself
    assert got == {1: (2, 30, 3), 5: (5, 7, 1)}


# -- multi-probe range search -------------------------------------------------

def _py_bucket(v):
    b = 0
    for t, plane in enumerate(S.LSH_PLANES):
        acc = 0.0
        for x, sgn in zip(v, plane):
            acc = acc + x * float(sgn)
        if acc > 0:
            b += 1 << t
    return b


def test_lsh_range_search_matches_probe_model(spark):
    rng = random.Random(13)
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(S.EMBED_DIM)]
        for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    thr = 100_000
    got = {
        (r.q_id, r.vec_id): r.sim_x1e6
        for r in S.lsh_range_search(
            df.where(F.col("vec_id") < 4), df, threshold_x1e6=thr
        ).collect()
    }
    buckets = {i: _py_bucket(v) for i, v in vecs.items()}
    want = {}
    for q in range(4):
        probe = {buckets[q] ^ m for m in [0] + [1 << t for t in range(S.LSH_BITS)]}
        for c, v in vecs.items():
            if c == q or buckets[c] not in probe:
                continue
            na = math.sqrt(_dot_left(vecs[q], vecs[q]))
            nb = math.sqrt(_dot_left(v, v))
            sim = _dot_left(vecs[q], v) / (na * nb) * 1e6
            f = math.floor(sim)
            sim_i = int(f + (1 if sim - f >= 0.5 else 0))
            if sim_i >= thr:
                want[(q, c)] = sim_i
    assert got == want
    assert want  # the model actually produced in-radius neighbors


# -- UniMax water-filling -------------------------------------------------------

def _waterfill_loop(sizes, budget):
    """The paper's iterative form: smallest keys first, each takes
    min(its size, equal share of what remains)."""
    items = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    alloc, remaining = {}, budget
    for j, (k, n) in enumerate(items):
        share = remaining // (len(items) - j)
        take = min(n, share)
        alloc[k] = take
        remaining -= take
    return alloc


@pytest.mark.parametrize(
    "budget", [1, 2, 3, 5, 7, 11, 13, 30, 73, 120, 133, 10_000]
)
def test_waterfill_closed_form_equals_iterative_loop(spark, budget):
    from time_series_storage_spark.operators.split import waterfill_mix

    sizes = {"a": 100, "b": 25, "c": 4, "d": 4, "e": 1}
    rows = [
        (k_i * 1000 + j, k)
        for k_i, (k, n) in enumerate(sorted(sizes.items()))
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = waterfill_mix(df, "source", "doc_id", budget)
    got = {
        r.source: r.c
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    want = {
        k: v for k, v in _waterfill_loop(sizes, budget).items() if v > 0
    }
    assert got == want
    # never overspends; spends the whole budget when the corpus allows
    assert sum(got.values()) <= budget
    if budget <= sum(sizes.values()):
        # the loop (and therefore the closed form) spends exactly the
        # budget when the corpus can absorb it
        assert sum(got.values()) == budget


# -- triangle counting (degree-ordered orientation) ---------------------------

def _tri_model(nodes, pairs):
    """Pure-Python: {node: (degree, n_triangles, clustering_x1e6)}."""
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    for v in nodes:
        nb = adj[v]
        d = len(nb)
        t = sum(
            1
            for y in nb
            for z in nb
            if y < z and z in adj[y]
        )
        c = (2 * t * 1_000_000) // (d * (d - 1)) if d >= 2 else 0
        out[v] = (d, t, c)
    return out


def test_triangle_counts_matches_python_model(spark):
    """Clique (coefficient 1e6) + chain (0) + diamond (partial) +
    singleton on a random graph: the oriented-wedge count equals the
    brute-force neighborhood model node by node."""
    from time_series_storage_spark.operators.dedup import triangle_counts

    rng = random.Random(7)
    nodes = list(range(1, 26))
    pairs = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}  # K4
    pairs |= {(5, 6), (6, 7), (7, 8)}                          # chain
    pairs |= {(9, 10), (9, 11), (10, 12), (11, 12), (10, 11)}  # diamond+
    while len(pairs) < 40:  # random edges across 13..24
        a, b = rng.sample(range(13, 25), 2)
        pairs.add((min(a, b), max(a, b)))
    want = _tri_model(nodes, pairs)
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    # feed pairs both ways round and duplicated: the operator
    # normalizes orientation and dedups
    feed = list(pairs) + [(b, a) for a, b in list(pairs)[:10]]
    pdf = spark.createDataFrame(feed, "d1 long, d2 long")
    got = {
        r.node: (r.degree, r.n_triangles, r.clustering_x1e6)
        for r in triangle_counts(pdf, ndf, "doc_id").collect()
    }
    assert got == want
    assert got[1] == (3, 3, 1_000_000)  # K4 member: fully clustered
    assert got[6][2] == 0               # chain interior: no closure
    assert got[25] == (0, 0, 0)         # isolated


# -- margin-based pair mining --------------------------------------------------

def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_margin_mine_matches_python_model(spark):
    """Ratio-margin mining on a 2-corpus split: per-pair margin equals
    the pure-Python model (forward top-k, backward top-k over the
    candidates, integer division), and the hubness correction demotes
    the hub: a candidate close to EVERYTHING scores a lower margin
    than an exclusive pair of equal raw cosine."""
    from time_series_storage_spark.operators.similarity import margin_mine

    rng = random.Random(11)
    K = 3
    # even ids = queries/backward corpus; odd ids = forward corpus.
    # id 101 is a HUB: mid-way between both query directions, so every
    # query ranks it high, but its own neighborhood sum is large too.
    vecs = {
        0: [1.0, 0.0, 0.0, 0.1],
        2: [0.0, 1.0, 0.0, 0.1],
        4: [0.7, 0.7, 0.0, 0.0],
        101: [0.6, 0.6, 0.2, 0.1],            # hub
        103: [0.98, 0.05, 0.0, 0.1],          # exclusive partner of 0
        105: [0.05, 0.98, 0.0, 0.1],          # exclusive partner of 2
        107: [rng.random() for _ in range(4)],
        109: [rng.random() for _ in range(4)],
    }
    rows = [(i, v) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    even = df.where(F.col("vec_id") % 2 == 0)
    odd = df.where(F.col("vec_id") % 2 == 1)
    got = {
        (r.q_id, r.vec_id): (r.sim_x1e6, r.margin_x1e6)
        for r in margin_mine(even, odd, even, k=K).collect()
    }

    # pure-Python replay
    evens = sorted(i for i in vecs if i % 2 == 0)
    odds = sorted(i for i in vecs if i % 2 == 1)

    def topk(src, pool):
        sims = sorted(
            ((round(_cos(vecs[src], vecs[c]) * 1e6), c) for c in pool
             if c != src),
            key=lambda t: (-t[0], t[1]),
        )
        return sims[:K]

    fwd = {q: topk(q, odds) for q in evens}
    cands = sorted({c for lst in fwd.values() for _, c in lst})
    sx = {q: sum(s for s, _ in lst) for q, lst in fwd.items()}
    sy = {c: sum(s for s, _ in topk(c, evens)) for c in cands}
    want = {}
    for q, lst in fwd.items():
        for s, c in lst:
            den = sx[q] + sy[c]
            if s >= 0 and den > 0:
                want[(q, c)] = (s, (s * 2 * K * 1_000_000) // den)
    assert got == want
    # hubness correction: 0-103 is an exclusive pair, 0-101 rides the
    # hub — raw cosines are comparable but the margin separates them
    assert got[(0, 103)][1] > got[(0, 101)][1]


# -- Holt-Winters seasonal ----------------------------------------------------

def _hw_model(xs, m):
    """Pure-Python replay of the holt_winters contract: first-season
    integer-mean init, alpha=gamma=delta=1/2 halving with truncation
    toward zero, length-m ring."""
    if len(xs) <= m:
        return [], None
    l = sum(xs[:m]) // m
    b = 0
    s = [x - l for x in xs[:m]]
    out = []
    for t in range(m, len(xs)):
        j = t % m
        sm = s[j]
        nl = int((xs[t] - sm + l + b) / 2.0)
        nb = int((nl - l + b) / 2.0)
        ns = int((xs[t] - nl + sm) / 2.0)
        s[j] = ns
        l, b = nl, nb
        out.append((t, xs[t], l, b, ns))
    return out, (l, b, s, len(xs))


@pytest.mark.parametrize(
    "xs, m",
    [
        ([5, 9, 5, 9, 5, 9, 5, 9, 5], 2),            # pure period-2 cycle
        ([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], 3),        # trend, no season
        ([90, 10, 80, 5, 70, 0, 60, 2, 50, 1], 2),   # falling + cycle
        ([0, 0, 0, 0, 0], 2),                        # all-zero
        ([7, 7, 7], 4),                              # too short: dropped
        ([3, 100, 4, 90, 120, 2, 80, 7, 6, 110, 95, 1, 2, 3], 4),
    ],
)
def test_holt_winters_matches_python_model(spark, xs, m):
    from time_series_storage_spark.operators.analytics import holt_winters

    scaled = [x * 1_000_000 for x in xs]
    df = spark.createDataFrame(
        [("s", i * 3600, v) for i, v in enumerate(scaled)],
        "k string, ep long, x long",
    )
    rows = (
        holt_winters(df, ["k"], "ep", "x", season=m)
        .orderBy("ep")
        .collect()
    )
    got = [
        (r.ep // 3600, r.x, r.level_x1e6, r.trend_x1e6, r.seasonal_x1e6)
        for r in rows
    ]
    exp, _ = _hw_model(scaled, m)
    assert got == exp


def test_holt_winters_forecast_final_state(spark):
    """Forecasts come from the FINAL (l, b, ring) state: yhat(t+h) =
    l + h*b + ring[(t+h-1) mod m], negative seasonal entries
    included."""
    from time_series_storage_spark.operators.analytics import (
        holt_winters_forecast,
    )

    random.seed(11)
    m = 4
    xs = [
        abs(100 + 60 * ((i % m) - 2) + random.randint(-9, 9)) * 1_000_000
        for i in range(17)
    ]
    df = spark.createDataFrame(
        [("s", i * 3600, v) for i, v in enumerate(xs)],
        "k string, ep long, x long",
    )
    _, fin = _hw_model(xs, m)
    l, b, s, n = fin
    assert any(v < 0 for v in s)  # the contract's negative-ring case
    rows = (
        holt_winters_forecast(df, ["k"], "ep", "x", season=m, horizon=3)
        .orderBy("h")
        .collect()
    )
    assert [r.forecast_x1e6 for r in rows] == [
        l + h * b + s[(n + h - 1) % m] for h in (1, 2, 3)
    ]
    assert [r.forecast_ep for r in rows] == [
        (len(xs) - 1) * 3600 + h * 3600 for h in (1, 2, 3)
    ]


def test_holt_winters_horizon_bound():
    from time_series_storage_spark.operators.analytics import (
        holt_winters_forecast,
    )

    with pytest.raises(ValueError, match="horizon"):
        holt_winters_forecast(None, ["k"], season=4, horizon=5)


# -- JL sign projection -------------------------------------------------------

def test_rp_project_exact_integer(spark):
    """The JL projection is pure integer arithmetic on x1e6-quantized
    components: matches a Python replay exactly, any row order."""
    from time_series_storage_spark.operators.similarity import (
        EMBED_DIM, RP_DIM, RP_SIGNS, rp_project,
    )

    random.seed(3)
    vecs = [
        [random.uniform(-1, 1) for _ in range(EMBED_DIM)] for _ in range(6)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.p)
        for r in df.select(
            "vec_id", rp_project("embedding").alias("p")
        ).collect()
    }

    def pyround(x):  # Spark round: HALF_UP on the double value
        import decimal
        return int(
            decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    for i, v in enumerate(vecs):
        q = [pyround(float(__import__("numpy").float32(x)) * 1e6) for x in v]
        want = [
            sum(s * qi for s, qi in zip(RP_SIGNS[j], q))
            for j in range(RP_DIM)
        ]
        assert got[i] == want


def test_rp_topk_contract(spark):
    """rp_topk keeps brute_force_topk's output contract: k rows per
    query, ranks 1..k, sims weakly decreasing, and every returned sim
    equals the exact cosine (rerank stage is exact by construction)."""
    from time_series_storage_spark.operators.similarity import (
        EMBED_DIM, brute_force_topk, rp_topk,
    )

    random.seed(5)
    vecs = [
        [random.uniform(-1, 1) for _ in range(EMBED_DIM)]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    qs = df.where(F.col("vec_id") < 2)
    got = rp_topk(qs, df, k=5, prefilter_k=39).orderBy(
        "q_id", "rank"
    ).collect()
    # prefilter covers the whole corpus -> must equal exact brute force
    exact = brute_force_topk(qs, df, k=5).orderBy("q_id", "rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    narrow = rp_topk(qs, df, k=5, prefilter_k=8).collect()
    assert {r.q_id for r in narrow} == {0, 1}
    for q in (0, 1):
        sims = [r.sim_x1e6 for r in sorted(
            (x for x in narrow if x.q_id == q), key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True) and len(sims) == 5


# -- k-core peeling -----------------------------------------------------------

def _kcore_model(n_nodes, pairs, k, rounds):
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    alive = set(range(n_nodes))
    removed_round = {}
    for r in range(1, rounds + 1):
        rm = {u for u in alive if len(nbrs[u] & alive) < k}
        for u in rm:
            removed_round[u] = r
        alive -= rm
    return {
        u: (len(nbrs[u]), removed_round.get(u, 0), 1 if u in alive else 0)
        for u in range(n_nodes)
    }


@pytest.mark.parametrize(
    "pairs, n, k",
    [
        # triangle + pendant chain: core survives, chain peels by round
        ([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)], 7, 2),
        # 4-clique plus spokes
        ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
          (0, 4), (1, 5), (2, 6)], 8, 3),
        # pure chain: everything eventually peels (needs the rounds)
        ([(0, 1), (1, 2), (2, 3), (3, 4)], 5, 2),
        ([], 4, 2),  # edgeless: all removed round 1
    ],
)
def test_kcore_matches_python_model(spark, pairs, n, k):
    from time_series_storage_spark.operators.dedup import kcore_peel

    rounds = 4
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "d1 long, d2 long"
    )
    if not pairs:
        pdf = pdf.where(F.col("d1") != F.col("d2"))
    got = {
        r.node: (r.degree, r.removed_round, r.in_core)
        for r in kcore_peel(pdf, nodes, "doc_id", k=k, n_rounds=rounds)
        .collect()
    }
    assert got == _kcore_model(n, pairs, k, rounds)


def test_kcore_extra_rounds_noop_after_convergence(spark):
    """Once a round removes nothing, later rounds are no-ops: the
    round-R result equals the true k-core for converged graphs."""
    from time_series_storage_spark.operators.dedup import kcore_peel

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    a = sorted(
        tuple(r)
        for r in kcore_peel(pdf, nodes, "doc_id", k=2, n_rounds=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in kcore_peel(pdf, nodes, "doc_id", k=2, n_rounds=5).collect()
    )
    assert a == b


# -- Stupid Backoff -----------------------------------------------------------

def test_stupid_backoff_levels(spark):
    """Each backoff level fires where it should: seen trigram ->
    c3/c2; unseen trigram with seen (w2,w3) bigram -> 0.4-discounted;
    bigram-unseen but w3 known -> 0.16-discounted unigram; OOV -> 0.
    Expected values computed by hand from the model slice counts."""
    from time_series_storage_spark.operators.text import (
        stupid_backoff_score,
    )

    model = spark.createDataFrame(
        [(0, "a b c a b c"), (2, "b c d")], "doc_id long, text string"
    )
    # counts: c3(a,b,c)=2, c3(b,c,a)=1, c3(b,c,d)=1, c2(a,b)=2,
    # c2(b,c)=3, c2(c,a)=1, c2(c,d)=1, c1: a=2 b=3 c=3 d=1, N=9
    scored = spark.createDataFrame(
        [
            (1, "a b c"),      # level 3: (2*1e9) div 2 = 1e9
            (3, "d b c"),      # unseen tri (d,b,c); (b,c) seen c2=3,
                               # c1(b)=3: (3*2e9) div (3*5) = 4e8
            (5, "d d c"),      # (d,d,c): no tri, no (d,c) bigram,
                               # c known: (3*4e9) div (9*25)
            (7, "q q q"),      # OOV everywhere: 0
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_trigrams, r.sum_s_x1e9)
        for r in stupid_backoff_score(model, scored).collect()
    }
    assert got == {
        1: (1, 1_000_000_000),
        3: (1, (3 * 2 * 10**9) // (3 * 5)),
        5: (1, (3 * 4 * 10**9) // (9 * 25)),
        7: (1, 0),
    }


# -- label-quality audits -----------------------------------------------------

def _unit(d, hot, val=1.0):
    v = [0.0] * d
    v[hot] = val
    return v


def test_knn_label_audit_flags_noise(spark):
    """A vector whose label disagrees with its tight neighborhood is
    flagged; coherent vectors are not; vote ties break on smaller
    label."""
    from time_series_storage_spark.operators.similarity import (
        knn_label_audit,
    )

    rows = []
    # cluster A around dim 0 (label 1), cluster B around dim 1
    # (label 2); vec 0 sits in cluster A but carries label 2 (noise)
    for i in range(4):
        rows.append((i, [1.0, 0.05 * i] + [0.0] * 6, 2 if i == 0 else 1))
    for i in range(4, 8):
        rows.append((i, [0.05 * (i - 4), 1.0] + [0.0] * 6, 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    got = {
        r.q_id: (r.pred_label, r.is_mismatch)
        for r in knn_label_audit(
            df.where(F.col("vec_id") < 4), df, k=3
        ).collect()
    }
    assert got[0] == (1, 1)  # noisy label flagged
    assert all(got[i] == (1, 0) for i in (1, 2, 3))


def test_centroid_confusion_separable_labels_diagonal(spark):
    """Perfectly separable labels produce a purely diagonal confusion
    matrix; centroids are exact integer floor-means."""
    from time_series_storage_spark.operators.similarity import (
        centroid_confusion,
        label_centroids,
    )

    rows = []
    for i in range(5):
        rows.append((i, _unit(8, 0, 1.0 + 0.1 * i), 0))
        rows.append((10 + i, _unit(8, 3, 2.0 + 0.1 * i), 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = {
        r.label: list(r.centroid)
        for r in label_centroids(df).collect()
    }
    # floor-mean of [1.0..1.4] x1e6 on dim 0
    assert cents[0][0] == sum(
        round(__import__("numpy").float32(1.0 + 0.1 * i) * 10**6)
        for i in range(5)
    ) // 5
    assert cents[0][1:] == [0] * 7
    got = {
        (r.label, r.pred_label): r.n
        for r in centroid_confusion(df).collect()
    }
    assert got == {(0, 0): 5, (1, 1): 5}


# -- classical decomposition ----------------------------------------------------

def _decomp_model(obs, m=4):
    """obs: list of (ep, x). Returns {ep: (trend, seas, resid)}."""
    h = m // 2
    n = len(obs)

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    rows = []
    for t in range(n):
        if t + 1 > h and t + 1 <= n - h:
            sa = sum(x for _, x in obs[t - h:t + h])
            sb = sum(x for _, x in obs[t - h + 1:t + h + 1])
            ep = obs[t][0]
            trend = trunc_div(sa + sb, 2 * m)
            det = obs[t][1] - trend
            rows.append((ep, obs[t][1], trend, det, (ep // 3600) % m))
    seas = {}
    for ph in {r[4] for r in rows}:
        ds = [r[3] for r in rows if r[4] == ph]
        seas[ph] = trunc_div(sum(ds), len(ds))
    return {
        ep: (tr, seas[ph], det - seas[ph])
        for ep, x, tr, det, ph in rows
    }


def test_classical_decompose_matches_python_model(spark):
    from time_series_storage_spark.operators.analytics import (
        classical_decompose,
    )

    random.seed(13)
    m = 4
    obs = [
        (i * 3600, (50 + 40 * ((i % m) - 1) + random.randint(-60, 10))
         * 1_000_000)
        for i in range(18)
    ]
    df = spark.createDataFrame(
        [("s", ep, x) for ep, x in obs], "k string, ep long, x long"
    )
    got = {
        r.ep: (r.trend_x1e6, r.seasonal_x1e6, r.residual_x1e6)
        for r in classical_decompose(
            df, ["k"], "ep", "x", season=m
        ).collect()
    }
    want = _decomp_model(obs, m)
    assert got == want
    # negative detrended values exercised (trunc-toward-zero contract)
    assert any(v[1] < 0 for v in got.values())


def test_classical_decompose_rejects_odd_season():
    from time_series_storage_spark.operators.analytics import (
        classical_decompose,
    )

    with pytest.raises(ValueError, match="even"):
        classical_decompose(None, ["k"], season=5)


# -- readability ----------------------------------------------------------------

def test_readability_hand_computed(spark):
    """Hand-computed Flesch / FK on known sentences, incl. the
    no-punctuation one-sentence clamp and 1-syllable-minimum words."""
    from time_series_storage_spark.operators.text import readability

    docs = spark.createDataFrame(
        [
            (0, "the cat sat. the dog ran!"),   # 6 words, 2 sents, 6 syll
            (1, "xyz qqq"),                      # no vowels: clamp 1 each
            (2, "beautiful extraordinary"),      # multi-syllable words
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_words, r.n_sentences, r.n_syllables,
            r.flesch_x1000, r.fk_grade_x1000,
        )
        for r in readability(docs).collect()
    }

    def flesch(w, s, y):
        return (
            206835 - (1015 * w) // s - (84600 * y) // w,
            (390 * w) // s + (11800 * y) // w - 15590,
        )

    # "beautiful" = eau+i+u? vowel runs: eau, i, u -> 3; check model:
    # b(eau)t(i)f(u)l -> 3 runs; (e)xtr(ao)rd(i)n(a)r(y) -> 5 runs
    assert got[0] == (6, 2, 6, *flesch(6, 2, 6))
    assert got[1] == (2, 1, 2, *flesch(2, 1, 2))
    assert got[2] == (2, 1, 8, *flesch(2, 1, 8))


# -- Kneser-Ney ----------------------------------------------------------------

def test_kneser_ney_hand_computed(spark):
    """Hand-computed interpolated KN on a tiny model: discounted term
    + continuation backoff for a seen bigram; pure backoff weight for
    an unseen continuation; OOV context scores 0."""
    from time_series_storage_spark.operators.text import kneser_ney_score

    model = spark.createDataFrame(
        [(0, "a b a b a c")], "doc_id long, text string"
    )
    # c12: ab=2 ba=2 ac=1; c1: a=3 b=2; B=3 distinct bigrams;
    # n1w1: a=2 b=1; ncont: a=1 b=1 c=1
    scored = spark.createDataFrame(
        [
            (1, "a b"),   # (3*3 + 2*1)*1e9 / 18
            (3, "a q"),   # unseen cont: (0*3 + 2*0)/18 = 0
            (5, "q a"),   # OOV context -> 0
            (7, "b a"),   # (3*3 + 1*1)*1e9 / (2*2*3)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_x1e9)
        for r in kneser_ney_score(model, scored).collect()
    }
    assert got == {
        1: (1, round((3 * 3 + 2 * 1) * 1e9 / 18)),
        3: (1, 0),
        5: (1, 0),
        7: (1, round((3 * 3 + 1 * 1) * 1e9 / 12)),
    }


# -- power iteration ------------------------------------------------------------

def test_power_iteration_matches_python_model(spark):
    """3 rounds of the integer power iteration equal a pure-Python
    replay (trunc rescale, max-abs renorm, double trunc), and the
    dominant synthetic direction carries the largest components."""
    import numpy as np

    from time_series_storage_spark.operators.similarity import (
        power_iteration_top_component,
    )

    random.seed(9)
    D = 6
    vecs = []
    for i in range(40):
        a = random.uniform(-1, 1)
        base = [0.0, a * 0.9, a * 0.8, 0.0, 0.0, 0.0]
        vecs.append(
            (i, [base[d] + random.uniform(-0.05, 0.05) for d in range(D)])
        )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.dim: r.v_x1e6
        for r in power_iteration_top_component(df, n_iter=3).collect()
    }
    q = [[round(float(np.float32(x)) * 1e6) for x in v] for _, v in vecs]
    v = [1_000_000] + [0] * (D - 1)

    def td(a, b):
        s = abs(a) // b
        return s if a >= 0 else -s

    for _ in range(3):
        s = [
            td(sum(q[r][d] * v[d] for d in range(D)), 1_000_000)
            for r in range(len(q))
        ]
        w = [
            sum(s[r] * q[r][d] for r in range(len(q)))
            for d in range(D)
        ]
        m = max(abs(x) for x in w)
        v = [math.trunc(float(x) * 1e6 / float(m)) for x in w]
    assert got == {d: v[d] for d in range(D)}
    assert abs(got[1]) == 1_000_000 and abs(got[2]) > 800_000


def test_power_iteration_two_components_deflation(spark):
    """Deflation by the rescaled squared norm: v2 matches the Python
    replay and lands on the SECOND synthetic direction (the
    under-deflation bug — dividing by 1e6 instead of |v1|^2/1e6 —
    left v2 ~= v1; this pins the fix)."""
    import numpy as np

    from time_series_storage_spark.operators.similarity import (
        power_iteration_two_components,
    )

    random.seed(21)
    D = 6
    vecs = []
    for i in range(60):
        a = random.uniform(-1, 1)
        b = random.uniform(-1, 1)
        base = [a, a * 0.9, b * 0.5, b * 0.45, 0.0, 0.0]
        vecs.append(
            (i, [base[d] + random.uniform(-0.02, 0.02) for d in range(D)])
        )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.dim: (r.v1_x1e6, r.v2_x1e6)
        for r in power_iteration_two_components(df, n_iter=3).collect()
    }
    q = [[round(float(np.float32(x)) * 1e6) for x in v] for _, v in vecs]

    def td(a, b):
        s = abs(a) // b
        return s if a >= 0 else -s

    def loop(qm):
        v = [1_000_000] + [0] * (D - 1)
        for _ in range(3):
            s = [
                td(sum(qm[r][d] * v[d] for d in range(D)), 10**6)
                for r in range(len(qm))
            ]
            w = [
                sum(s[r] * qm[r][d] for r in range(len(qm)))
                for d in range(D)
            ]
            m = max(abs(x) for x in w)
            if m == 0:
                break
            v = [math.trunc(float(x) * 1e6 / float(m)) for x in w]
        return v

    v1 = loop(q)
    s1 = [
        td(sum(q[r][d] * v1[d] for d in range(D)), 10**6)
        for r in range(len(q))
    ]
    m2 = sum(x * x for x in v1) // 10**6
    q2 = [
        [q[r][d] - td(s1[r] * v1[d], m2) for d in range(D)]
        for r in range(len(q))
    ]
    v2 = loop(q2)
    assert got == {d: (v1[d], v2[d]) for d in range(D)}
    assert max(abs(got[0][0]), abs(got[1][0])) == 1_000_000
    assert max(abs(got[2][1]), abs(got[3][1])) == 1_000_000


# -- Label propagation ---------------------------------------------------------

def _lpa_model(nodes, pairs, n_iter):
    """Pure-Python synchronous LPA: argmax neighbor-label count,
    ties to the smallest label, isolated nodes keep their own."""
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in nodes:
            if not nbrs[v]:
                nxt[v] = lab[v]
                continue
            cnt = defaultdict(int)
            for u in nbrs[v]:
                cnt[lab[u]] += 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt
    return lab


def test_labelprop_matches_python_model(spark):
    """Chain + two cliques + star + singleton, 4 synchronous rounds:
    every label equals the deterministic pure-Python model."""
    from time_series_storage_spark.operators.dedup import label_propagation

    nodes = list(range(1, 13))
    pairs = [
        (1, 2), (2, 3), (3, 4),                  # chain
        (5, 6), (6, 7), (5, 7),                  # triangle
        (8, 9), (8, 10), (9, 10), (10, 11),      # clique + pendant
    ]                                            # 12 isolated
    want = _lpa_model(nodes, pairs, n_iter=4)
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {
        r.node: r.community
        for r in label_propagation(pdf, ndf, "doc_id", n_iter=4).collect()
    }
    assert got == want
    assert got[12] == 12  # isolated keeps its own label


def test_labelprop_random_graphs_match_model(spark):
    """Randomized audit: labels equal the synchronous model on
    arbitrary graphs (seeded, several shapes and densities)."""
    from time_series_storage_spark.operators.dedup import label_propagation

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(5, 14)
        nodes = list(range(n))
        pairs = sorted(
            {
                (a, b)
                for a in nodes
                for b in nodes
                if a < b and rng.random() < 0.25
            }
        )
        want = _lpa_model(nodes, pairs, n_iter=4)
        ndf = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
        pdf = (
            spark.createDataFrame(pairs, "d1 long, d2 long")
            if pairs
            else spark.createDataFrame([], "d1 long, d2 long")
        )
        got = {
            r.node: r.community
            for r in label_propagation(
                pdf, ndf, "doc_id", n_iter=4
            ).collect()
        }
        assert got == want, (trial, pairs)


def test_labelprop_bridge_separates_where_cc_glues(spark):
    """The semantic point of LPA over CC: two 4-cliques joined by ONE
    bridge edge — connected components returns a single 8-member
    cluster (transitive closure must), while label propagation keeps
    the two dense families under distinct labels."""
    from time_series_storage_spark.operators.dedup import (
        connected_components,
        label_propagation,
    )

    a = [1, 2, 3, 4]
    b = [5, 6, 7, 8]
    clique = lambda vs: [(x, y) for x in vs for y in vs if x < y]
    pairs = clique(a) + clique(b) + [(4, 5)]  # one bridge
    ndf = spark.createDataFrame([(v,) for v in a + b], "doc_id long")
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")

    cc = {
        r["node"]: r["cluster"]
        for r in connected_components(pdf, ndf, "doc_id").collect()
    }
    assert len(set(cc.values())) == 1  # CC glues across the bridge

    lpa = {
        r.node: r.community
        for r in label_propagation(pdf, ndf, "doc_id", n_iter=4).collect()
    }
    assert lpa == _lpa_model(a + b, pairs, n_iter=4)
    comm_a = {lpa[v] for v in a}
    comm_b = {lpa[v] for v in b}
    assert comm_a == {1} and comm_b == {5}  # families stay separate


# -- Reciprocal-rank fusion -----------------------------------------------------

def test_rrf_fuse_matches_hand_model(spark):
    """Two tiny rankings: fused scores equal the exact integer
    floor(1e9/(60+rank)) sums; a doc present in BOTH lists outranks a
    doc that leads only one; ties break toward the smaller vec_id."""
    from time_series_storage_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "q_id long, vec_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "q_id long, vec_id long, rank long",
    )
    got = {
        r.vec_id: (r.rrf_x1e9, r.rank)
        for r in rrf_fuse([a, b], k=4).collect()
    }
    p = lambda rk: 1_000_000_000 // (60 + rk)
    want_scores = {
        10: p(1) + p(3),
        11: p(2) + p(1),
        12: p(3),
        13: p(2),
    }
    order = sorted(want_scores, key=lambda v: (-want_scores[v], v))
    want = {
        v: (want_scores[v], i + 1) for i, v in enumerate(order)
    }
    assert got == want
    # both-lists docs (10, 11) outrank single-list docs (12, 13)
    assert {got[10][1], got[11][1]} == {1, 2}


def test_rrf_fuse_missing_contributes_zero_and_k_bounds(spark):
    from time_series_storage_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(7, i, i) for i in range(1, 6)],
        "q_id long, vec_id long, rank long",
    )
    out = rrf_fuse([a], k=3).collect()
    assert len(out) == 3
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


# -- SAX symbolization ----------------------------------------------------------

def test_sax_ntile_symbols_match_model(spark):
    """Daily-count series -> quartile symbols: equal-frequency NTILE
    with (cnt, day) total order, string in day order — vs a
    pure-Python model on a crafted series with ties."""
    import datetime as dt

    from time_series_storage_spark.queries_extensions import (
        SAX_ALPHABET,
        SAX_EPOCH0,
        q_ts_sax_daily,
    )

    # craft events: one type, 8 days with counts [3,1,4,1,5,9,2,6]
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for j in range(c):
            ts = dt.datetime.utcfromtimestamp(
                SAX_EPOCH0 + day * 86_400 + j
            )
            rows.append((eid, ts, 1, "click", 0.0, "{}"))
            eid += 1
    import os
    import tempfile

    sf_dir = tempfile.mkdtemp(prefix="sax_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    got = {r.event_type: (r.n_days, r.sax)
           for r in q_ts_sax_daily(spark, sf_dir).collect()}

    # model: ntile over (cnt, day) ascending
    order = sorted(range(len(counts)), key=lambda d: (counts[d], d))
    n = len(order)
    q, rem = divmod(n, SAX_ALPHABET)
    sym = {}
    pos = 0
    for b in range(SAX_ALPHABET):
        size = q + (1 if b < rem else 0)
        for d in order[pos:pos + size]:
            sym[d] = chr(97 + b)
        pos += size
    want = "".join(sym[d] for d in range(n))
    assert got == {"click": (n, want)}


# -- MMR diversified top-k -------------------------------------------------------

def _mmr_model(rel, psim, k, lam=700_000):
    """Pure-Python greedy MMR with the exact fixed-point arithmetic:
    rel = {cand: sim_x1e6 to query}, psim = {(a, b): sim_x1e6}."""
    lam1 = 1_000_000 - lam
    sel, out = [], []
    rem = set(rel)
    for step in range(1, k + 1):
        best = None
        for c in sorted(rem):
            ms = max((psim[(c, s)] for s in sel), default=0)
            score = lam * rel[c] - lam1 * ms
            if best is None or score > best[1]:
                best = (c, score)
        sel.append(best[0])
        rem.discard(best[0])
        out.append((best[0], step, best[1]))
    return out


def test_mmr_diversifies_and_matches_model(spark):
    """Corpus with a tight near-duplicate pair at the top: plain
    top-2 returns both copies, MMR's second pick skips the duplicate
    for the diverse candidate; every pick and score matches the
    pure-Python greedy model."""
    import math

    from time_series_storage_spark.operators.similarity import (
        brute_force_topk,
        mmr_topk,
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = {
        0: unit([1.0, 0.0, 0.0, 0.0]),          # the query
        1: unit([0.98, 0.17, 0.0, 0.0]),        # near the query
        2: unit([0.97, 0.18, 0.05, 0.0]),       # near-duplicate of 1
        3: unit([0.7, -0.7, 0.1, 0.0]),         # relevant but diverse
        4: unit([0.5, 0.0, 0.86, 0.0]),         # diverse, less relevant
        5: unit([-1.0, 0.0, 0.0, 0.0]),         # irrelevant
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") == 0)

    plain = [
        r.vec_id
        for r in brute_force_topk(q, emb, k=2).orderBy("rank").collect()
    ]
    assert set(plain) == {1, 2}  # the duplicate pair dominates

    got = sorted(
        (r.vec_id, r.step, r.mmr_x1e12)
        for r in mmr_topk(q, emb, k=3, prefilter_k=5,
                          lambda_x1e6=500_000).collect()
    )

    sim = lambda a, b: round(
        sum(x * y for x, y in zip(vecs[a], vecs[b])) * 1e6
    )
    cands = [1, 2, 3, 4, 5]
    rel = {c: sim(0, c) for c in cands}
    psim = {(a, b): sim(a, b) for a in cands for b in cands if a != b}
    want = sorted(
        (c, s, m) for c, s, m in _mmr_model(rel, psim, 3, lam=500_000)
    )
    assert got == want
    by_step = {s: c for c, s, _ in want}
    assert by_step[1] == 1      # most relevant first
    assert by_step[2] == 3      # NOT the near-duplicate 2: diversity won


# -- DTW ------------------------------------------------------------------------

def _dtw_model(x, y):
    n, m = len(x), len(y)
    D = [[0] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(x[i] - y[j])
            if i == 0 and j == 0:
                D[i][j] = c
            elif i == 0:
                D[i][j] = c + D[i][j - 1]
            elif j == 0:
                D[i][j] = c + D[i - 1][j]
            else:
                D[i][j] = c + min(
                    D[i - 1][j], D[i - 1][j - 1], D[i][j - 1]
                )
    return D[-1][-1]


def test_dtw_matches_model_on_random_series(spark):
    """Nested-array-fold DTW equals the full-DP Python model on
    random series of uneven lengths, including length-1 edges."""
    from time_series_storage_spark.operators.analytics import dtw_distance

    rng = random.Random(3)
    rows = []
    for t in range(8):
        x = [rng.randint(0, 40) for _ in range(rng.randint(1, 14))]
        y = [rng.randint(0, 40) for _ in range(rng.randint(1, 14))]
        rows.append((t, x, y))
    rows.append((98, [5], [5]))
    rows.append((99, [7], [1, 2, 3]))
    df = spark.createDataFrame(rows, "t long, x array<long>, y array<long>")
    got = {
        r.t: r.d
        for r in df.select("t", dtw_distance("x", "y").alias("d")).collect()
    }
    assert got == {t: _dtw_model(x, y) for t, x, y in rows}


def test_dtw_shift_tolerance_vs_lockstep(spark):
    """The semantic reason DTW exists here: a one-step shifted copy of
    a spiky series is FAR in lockstep (sum |x_i - y_i|) but near-zero
    in DTW."""
    from time_series_storage_spark.operators.analytics import dtw_distance

    x = [0, 0, 50, 0, 0, 50, 0, 0, 50, 0]
    y = x[1:] + [0]  # shifted by one
    lockstep = sum(abs(a - b) for a, b in zip(x, y))
    df = spark.createDataFrame([(x, y)], "x array<long>, y array<long>")
    d = df.select(dtw_distance("x", "y").alias("d")).collect()[0].d
    assert d == _dtw_model(x, y)
    assert lockstep >= 250
    assert d <= 50  # warping absorbs the shift


# -- Theil-Sen -------------------------------------------------------------------

def test_theilsen_robust_where_ols_breaks(spark):
    """A clean +2/day trend with ONE 1000-high spike day: the median
    pairwise slope stays 2.0 x1e6 while the OLS slope is dragged an
    order of magnitude away — the breakdown-point argument for having
    both statistics, checked end to end through the gated query."""
    import datetime as dt
    import os
    import tempfile

    from time_series_storage_spark.queries_extensions import (
        SAX_EPOCH0,
        q_ts_theilsen_slope,
    )

    counts = [10 + 2 * d for d in range(15)]
    counts[14] = 1000  # the outlier day (at the end: max OLS leverage)
    rows, eid = [], 0
    for day, c in enumerate(counts):
        for j in range(c):
            ts = dt.datetime.utcfromtimestamp(SAX_EPOCH0 + day * 86_400 + j)
            rows.append((eid, ts, 1, "click", 0.0, "{}"))
            eid += 1
    sf_dir = tempfile.mkdtemp(prefix="theil_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    got = q_ts_theilsen_slope(spark, sf_dir).collect()[0]
    n = len(counts)
    assert got.n_pairs == n * (n - 1) // 2

    # pure-python model: lower median of floor-scaled pairwise slopes
    slopes = sorted(
        (
            ((counts[j] - counts[i]) * 1_000_000) // (j - i),
            i, j,
        )
        for i in range(n) for j in range(i + 1, n)
    )
    want = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert got.slope_med_x1e6 == want
    assert got.slope_med_x1e6 == 2_000_000  # the true trend, spike ignored

    # OLS on the same series is dragged far off by the single spike
    xs = list(range(n))
    mx = sum(xs) / n
    my = sum(counts) / n
    ols = sum((x - mx) * (y - my) for x, y in zip(xs, counts)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(ols - 2.0) > 5  # OLS off by >5 counts/day


# -- MaxMatch segmentation --------------------------------------------------------

def test_maxmatch_matches_greedy_model(spark):
    """Greedy longest-match segmentation equals the pure-Python
    maximal-munch model over an adversarial vocab (overlapping pieces,
    char fallback, full-word piece), and the TRUNC marker fires when
    rounds are undersized."""
    from time_series_storage_spark.operators.text import maxmatch_segment

    vocab = ["ab", "abc", "bcd", "cd", "dede", "de"]
    words = ["abcd", "abcde", "dedede", "xyz", "abcdabcd", "a"]

    def model(w):
        pos, pieces = 0, []
        while pos < len(w):
            for L in (4, 3, 2):
                if w[pos:pos + L] in vocab and len(w[pos:pos + L]) == L:
                    pieces.append(w[pos:pos + L])
                    pos += L
                    break
            else:
                pieces.append(w[pos])
                pos += 1
        return pieces

    wc = spark.createDataFrame(
        [(w, 1) for w in words], "word string, n_occurrences long"
    )
    vdf = spark.createDataFrame([(p,) for p in vocab], "piece string")
    got = {
        r.word: (r.n_pieces, r.seg)
        for r in maxmatch_segment(
            wc, vdf, min_len=2, max_len=4, max_rounds=8
        ).collect()
    }
    want = {w: (len(model(w)), "|".join(model(w))) for w in words}
    assert got == want
    # lossless: pieces reassemble the word exactly (fallbacks included)
    assert all(seg.replace("|", "") == w for w, (_, seg) in got.items())
    # greedy is greedy: 'abcd' -> abc|d (longest-first), not ab|cd
    assert got["abcd"][1] == "abc|d"

    # undersized rounds: the truncation is loud, never silent
    short = {
        r.word: r.seg
        for r in maxmatch_segment(
            wc, vdf, min_len=2, max_len=4, max_rounds=1
        ).collect()
    }
    assert short["dedede"].endswith("|<TRUNC>")
    assert short["a"] == "a"  # one round suffices for 1-char words


# -- k-center coreset -------------------------------------------------------------

def test_kcenter_matches_model_and_radius_monotone(spark):
    """Greedy farthest-point picks equal the pure-Python model on a
    crafted corpus (three tight clusters + one outlier: the coreset
    visits every cluster before densifying any), and the coverage
    radius is non-increasing across picks."""
    import math

    from time_series_storage_spark.operators.similarity import (
        kcenter_coreset,
    )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = {
        0: unit([1.0, 0.01, 0.0, 0.0]),
        1: unit([1.0, -0.01, 0.0, 0.0]),   # cluster A with 0
        2: unit([0.0, 1.0, 0.01, 0.0]),
        3: unit([0.0, 1.0, -0.01, 0.0]),   # cluster B
        4: unit([0.0, 0.0, 0.0, 1.0]),     # cluster C (singleton)
        5: unit([-1.0, -1.0, -1.0, -1.0]), # outlier
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r.step, r.vec_id, r.mind_x1e6)
        for r in kcenter_coreset(emb, k=5).collect()
    )

    sim = lambda a, b: round(
        sum(x * y for x, y in zip(vecs[a], vecs[b])) * 1e6
    )
    dist = lambda a, b: 1_000_000 - sim(a, b)
    sel = [0]  # smallest id seeds
    out = [(1, 0, 2_000_000)]
    cands = set(vecs) - {0}
    for step in range(2, 6):
        best = max(
            sorted(cands),
            key=lambda c: (min(dist(c, s) for s in sel), -c),
        )
        out.append((step, best, min(dist(best, s) for s in sel)))
        sel.append(best)
        cands.discard(best)
    assert got == sorted(out)
    # radius is non-increasing after the seed sentinel
    radii = [m for _, _, m in sorted(out)][1:]
    assert radii == sorted(radii, reverse=True)
    # the first four picks cover all four groups (A, B, C, outlier)
    first4 = {v for s, v, _ in out if s <= 4}
    groups = [{0, 1}, {2, 3}, {4}, {5}]
    assert all(first4 & g for g in groups)


# -- BM25 ---------------------------------------------------------------------------

def test_bm25_semantics_on_crafted_corpus(spark):
    """BM25's load-bearing behaviors on a controlled corpus: rarer
    query terms outweigh common ones (IDF), repeated terms saturate
    (a 10x tf is nowhere near 10x score), and longer documents are
    penalized at equal tf (length normalization)."""
    import os
    import tempfile

    from time_series_storage_spark.queries_extensions import (
        q_search_bm25_topk,
    )

    filler = " ".join(["pad"] * 30)
    docs = [
        # 'spark' appears in just these two docs (rare); 'table' in many
        (0, "spark table", "en", "s", 11),
        (1, "spark " + filler, "en", "s", 11),        # rare term, long doc
        (2, "table " + " ".join(["table"] * 9), "en", "s", 11),  # tf=10
        (3, "table", "en", "s", 11),                  # tf=1, short
        (4, "table pad", "en", "s", 11),
        (5, filler, "en", "s", 11),                   # no hits
        (6, "fast table pad pad", "en", "s", 11),
    ]
    sf_dir = tempfile.mkdtemp(prefix="bm25_")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    rows = {r.doc_id: r for r in q_search_bm25_topk(spark, sf_dir).collect()}

    assert 5 not in rows  # no matching term, no row
    # the unique 'fast' (df=1, the rarest term) tops the ranking; the
    # two-term doc 0 (rare 'spark' + common 'table') comes second
    assert rows[6].rank == 1
    assert rows[0].rank == 2 and rows[0].n_hit_terms == 2
    # IDF: doc 1 (one RARE term, long) still beats doc 3 (one common)
    assert rows[1].score_x1e6 > rows[3].score_x1e6
    # saturation: tf=10 scores well under 10x the tf=1 score at
    # comparable length... doc 2 is also longer, both effects shrink it
    assert rows[2].score_x1e6 < 4 * rows[3].score_x1e6
    # length normalization: same tf=1 of 'table', doc 4 (2 tokens)
    # scores below doc 3 (1 token)
    assert rows[4].score_x1e6 < rows[3].score_x1e6


# -- Mann-Kendall ----------------------------------------------------------------

def test_mann_kendall_signs_on_crafted_series(spark):
    """S-statistic semantics: a strictly rising series has S =
    n_pairs (all concordant); a flat series has S = 0 (all tied);
    the query's counts reconcile (conc + disc + tied = pairs,
    S = conc - disc)."""
    import datetime as dt
    import os
    import tempfile

    from time_series_storage_spark.queries_extensions import (
        SAX_EPOCH0,
        q_ts_mann_kendall,
    )

    series = {"up": [1, 2, 3, 4, 5], "flat": [3, 3, 3, 3]}
    rows, eid = [], 0
    for et, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                ts = dt.datetime.utcfromtimestamp(
                    SAX_EPOCH0 + day * 86_400 + j
                )
                rows.append((eid, ts, 1, et, 0.0, "{}"))
                eid += 1
    sf_dir = tempfile.mkdtemp(prefix="mk_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    got = {r.event_type: r for r in q_ts_mann_kendall(spark, sf_dir).collect()}
    up = got["up"]
    assert (up.n_pairs, up.s_stat, up.n_conc, up.n_disc, up.n_tied) == (
        10, 10, 10, 0, 0
    )
    flat = got["flat"]
    assert (flat.n_pairs, flat.s_stat, flat.n_tied) == (6, 0, 6)
    for r in got.values():
        assert r.n_conc + r.n_disc + r.n_tied == r.n_pairs
        assert r.s_stat == r.n_conc - r.n_disc
