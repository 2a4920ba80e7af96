"""Similarity search over embedding columns (``array<float>``).

The reference has no vector operations; these are the
similarity-search operators a training-data pipeline needs at 100 TB:

* brute-force cosine top-k   — the exact baseline: broadcast the (small)
                               query set against the corpus, one shuffle
                               for the per-query top-k window.
* LSH-bucketed pair search   — the scale path: random-hyperplane
                               (Rademacher +-1 signs) bucketing; only
                               vectors sharing a bucket are compared, so
                               the candidate join is a plain equi-join on
                               the bucket key instead of a cross join.

Float discipline (so a SQL oracle can reproduce results bit-for-bit):
all arithmetic is double precision, and every reduction is an *ordered*
left fold over the array (``F.aggregate`` folds sequentially; the oracle
mirrors it with an explicit left-associative sum) — identical operation
order means identical IEEE results, no epsilon needed. The hyperplane
signs come from a seeded PRNG at import time and are baked into both the
Spark plan and the oracle SQL as literals.

At cluster scale the query side of the top-k is broadcast (it is small
by construction) and the corpus never shuffles for the similarity
computation itself — only the final per-query top-k reduction moves
(corpus_partitions x k) rows.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F

EMBED_DIM = 64
LSH_BITS = 8
_rng = random.Random(42)
# LSH_BITS hyperplanes of EMBED_DIM Rademacher signs each (deterministic)
LSH_PLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(EMBED_DIM)] for _ in range(LSH_BITS)
]


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    """Ordered left-fold dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _spread(df: DataFrame) -> DataFrame:
    """Parallelism floor for a frame about to do heavy PER-PAIR work
    (a broadcast-query scan computing O(dim) folds per corpus row per
    query): when the input has fewer partitions than the session's
    cores — the gate corpus is ONE parquet file, so its scan is ONE
    task and the whole pair stage serializes on it — round-robin
    repartition to ``defaultParallelism``. Scale-adaptive by
    construction: derived from the session, not a constant, and a
    corpus already wider than the core count (any real corpus) passes
    through untouched, so no shuffle is added at scale."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (q_id, vec_id, rank, sim_x1e6).

    ``queries`` is broadcast (it is the small side by construction), so
    the corpus scan stays shuffle-free; the only shuffle is the
    per-query top-k window, which AQE sizes to q-count partitions.
    Ties break on candidate id (deterministic).

    Per-pair arithmetic is the hoisted form: each side's norm is
    computed ONCE per row (queries in the broadcast projection, corpus
    before the join) and the pair expression is ``dot / (qn * cn)`` —
    the same doubles in the same order as ``cosine()`` (which evaluates
    norm(q) * norm(c) afresh per pair), so scores are bit-identical
    while per-pair work drops from three O(dim) folds to one.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(vec_col).alias("_qn"),
        )
    )
    c = _spread(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
        )
    ).select("vec_id", "c_vec", norm("c_vec").alias("_cn"))
    sims = (
        c.join(q, F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot("q_vec", "c_vec") / (F.col("_qn") * F.col("_cn")) * 1e6
            ).cast("long").alias("sim_x1e6"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_x1e6").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "sim_x1e6")
    )


def lsh_bucket(vec_col) -> Column:
    """Random-hyperplane bucket id: bit t = sign(<plane_t, v>).

    Rademacher (+-1) planes make the projection an ordered signed sum —
    exactly reproducible in any engine, no float literals needed beyond
    the input values themselves.
    """
    v = _as_double(vec_col)
    bucket = F.lit(0)
    for t, plane in enumerate(LSH_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in plane])
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << t)).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_similar_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1e6: int = 300_000,
) -> DataFrame:
    """Approximate near-neighbor pairs via hyperplane-LSH bucketing.

    Output (v1, v2, sim_x1e6), v1 < v2, cosine >= threshold, restricted
    to pairs in the same bucket. The bucket equi-join replaces the cross
    join: expected bucket occupancy is n / 2^LSH_BITS, so compared pairs
    scale ~n^2 / 2^LSH_BITS — tune LSH_BITS to the corpus size (more
    bits = faster + lower recall). Skewed buckets are handled by AQE
    skew-join splitting.
    """
    # persisted: the bucket equi-join reads this twice, and the bucket
    # expression (LSH_BITS ordered folds per row) is worth not re-running
    withb = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(vec_col).alias("bucket")
    ).persist()
    a = withb.select(
        F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"), "bucket"
    )
    b = withb.select(
        F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("v1") < F.col("v2"))
        .select(
            "v1",
            "v2",
            F.round(cosine("e1", "e2") * 1e6).cast("long").alias("sim_x1e6"),
        )
        .where(F.col("sim_x1e6") >= threshold_x1e6)
    )


IVF_CELLS = 16
IVF_NPROBE = 4


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
) -> DataFrame:
    """Deterministic sampled codebook: the ``n_cells`` lowest-id corpus
    vectors. Sampling the corpus is a standard (if crude) IVF codebook
    build; determinism keeps every downstream assignment reproducible
    in any engine — a k-means refinement would slot in here without
    changing the query path. Output: (cell_id, c_vec)."""
    return (
        corpus.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("c_vec"))
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties -> lowest
    cell id). The centroid table is broadcast (it is tiny by
    construction), so assignment is a map-side join + per-vector
    argmax. The argmax is a ``min_by`` on the (-sim, cell_id)
    composite — a PARTIAL aggregation, so the n_cells candidate rows
    per vector collapse map-side (the broadcast join leaves them in
    one partition) and the exchange carries one row per vector
    instead of n_cells rows plus a sort (the old row_number window).
    Same argmax rule — max sim, ties to the lowest cell — hence the
    same output: (cell_id, vec_id, embedding).

    Per-pair arithmetic is the hoisted form (the brute_force_topk
    discipline): each centroid's norm is computed once in the
    broadcast projection, each vector's norm once before the join,
    and the pair expression is ``dot / (en * cn)`` — the same doubles
    in the same order as ``cosine()``, so sims are bit-identical
    while per-pair work drops from three O(dim) interpreted folds to
    one. The corpus side goes through ``_spread`` first: the n_cells
    x O(dim) fold work per corpus row is exactly the heavy per-pair
    stage that a one-file scan would serialize into a single task.
    Pass ``spread=False`` when the corpus is NOT a plain scan (e.g. an
    aggregate output): it already has shuffle-partition parallelism,
    and ``_spread``'s partition probe would materialize the upstream
    query stages eagerly under AQE — a measured extra full evaluation
    per call."""
    cen = centroids.select(
        "cell_id", "c_vec", norm("c_vec").alias("_cn")
    )
    base = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if spread:
        base = _spread(base)
    sims = base.withColumn("_en", norm("embedding")).join(F.broadcast(cen)).select(
        "cell_id",
        "vec_id",
        "embedding",
        F.round(
            dot("embedding", "c_vec") / (F.col("_en") * F.col("_cn")) * 1e6
        ).cast("long").alias("sim_x1e6"),
    )
    best = sims.groupBy("vec_id").agg(
        F.min_by(
            F.struct("cell_id", "embedding"),
            F.struct(
                (-F.col("sim_x1e6")).alias("_ns"),
                F.col("cell_id").alias("_c"),
            ),
        ).alias("_w")
    )
    return best.select(
        F.col("_w.cell_id").alias("cell_id"),
        "vec_id",
        F.col("_w.embedding").alias("embedding"),
    )


def ivf_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    n_iter: int = 2,
) -> DataFrame:
    """Lloyd-refined IVF codebook in exact fixed-point arithmetic.

    Starts from the deterministic sampled codebook
    (:func:`ivf_centroids`) and runs ``n_iter`` Lloyd steps: assign
    every vector to its max-cosine centroid (ties -> lowest cell), then
    recompute each cell's centroid as the component-wise mean.  The
    mean is fixed-point: components quantize to 1e-6 (long), sum as
    longs (exact and commutative — no float-accumulation-order
    sensitivity across engines or partitionings), and the division is
    floored — so the refined codebook, and every query served from it,
    stays bit-reproducible and oracle-checkable.  Empty cells drop out
    of the codebook.

    Per iteration: one broadcast join + argmax window (assignment), one
    posexplode + (cell, dim) partial-aggregated mean — the tall-skinny
    all-long shape that scales linearly.  The finished codebook
    (``n_cells`` rows) is collected and re-created as a literal frame:
    like any ANN coarse quantizer it is a driver-side artifact by
    design, and inlining it keeps downstream probe/assign plans from
    re-running the whole refinement once per use.
    Output: (cell_id, c_vec array<double>).
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_cells).select(
        "cell_id", _as_double("c_vec").alias("c_vec")
    )
    base = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )

    def _literal(cents_df):
        # the codebook is a bounded driver-side artifact (n_cells
        # rows) EVERY iteration, not just at the end: collecting it
        # per Lloyd step keeps each step a flat self-contained job
        # over a literal centroid frame instead of nesting the whole
        # previous refinement (broadcast-of-aggregate subtrees,
        # superlinear planning) into one deep plan. Exact round-trip:
        # components are m/1e6 doubles and survive the Python hop
        # bit-identically.
        rows = [(r["cell_id"], list(r["c_vec"])) for r in cents_df.collect()]
        return corpus.sparkSession.createDataFrame(
            rows, "cell_id: long, c_vec: array<double>"
        )

    if n_iter <= 0:
        return _literal(cents)
    for _ in range(n_iter):
        assigned = ivf_assign(base, cents, "vec_id", "embedding")
        comp = assigned.select(
            "cell_id", F.posexplode(_as_double("embedding")).alias("j", "x")
        ).select(
            "cell_id", "j", F.round(F.col("x") * 1e6).cast("long").alias("q")
        )
        means = comp.groupBy("cell_id", "j").agg(
            F.floor(F.sum("q") / F.count("*")).alias("m")
        )
        cents = _literal(
            means.groupBy("cell_id").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "m"))),
                    lambda s: s["m"] / F.lit(1e6),
                ).alias("c_vec")
            )
        )
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Approximate cosine top-k via IVF: probe the ``nprobe`` nearest
    cells per query and rank only those cells' vectors.

    Output matches :func:`brute_force_topk` — (q_id, vec_id, rank,
    sim_x1e6) — but each query scans ~``nprobe / n_cells`` of the
    corpus instead of all of it: the scale path when the query set is
    too large to broadcast-scan the corpus per query. Both the centroid
    table and the probe list are broadcast; the corpus is partitioned by
    its (precomputable, persistable) cell assignment, so a query touches
    only matching cells' partitions. Deterministic end-to-end, so the
    approximation itself is oracle-checkable, and recall against
    brute-force is a measurable, testable quantity.

    ``kmeans_iters > 0`` swaps the sampled codebook for the
    fixed-point Lloyd-refined one (:func:`ivf_kmeans_centroids`) —
    same query path, better-balanced cells.
    """
    if kmeans_iters > 0:
        centroids = ivf_kmeans_centroids(
            corpus, id_col, vec_col, n_cells, kmeans_iters
        )
    else:
        centroids = ivf_centroids(corpus, id_col, vec_col, n_cells)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    return ivf_probe_topk(
        queries, centroids, assigned, id_col, vec_col, k, nprobe
    )


def ivf_probe_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """The IVF query path against an already-built index: probe the
    ``nprobe`` max-cosine cells per query, rank only those cells'
    vectors. ``centroids`` is (cell_id, c_vec); ``assigned`` is
    (cell_id, vec_id, embedding) — typically read from a persisted
    :class:`~..operators.vector_index.IvfIndexStore` version, in which
    case the broadcast probe join dynamically prunes the
    cell_id-partitioned assignment scan to the probed cells only."""
    qsims = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).join(F.broadcast(centroids)).select(
        "q_id",
        "q_vec",
        "cell_id",
        F.round(cosine("q_vec", "c_vec") * 1e6).cast("long").alias("c_sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("c_sim").desc(), F.col("cell_id")
    )
    probes = (
        qsims.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("q_id", "q_vec", "cell_id")
    )
    cands = assigned.join(F.broadcast(probes), "cell_id").where(
        F.col("q_id") != F.col("vec_id")
    )
    sims = cands.select(
        "q_id",
        "vec_id",
        F.round(cosine("q_vec", "embedding") * 1e6).cast("long").alias("sim_x1e6"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_x1e6").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "sim_x1e6")
    )


def lsh_range_search(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1e6: int = 150_000,
) -> DataFrame:
    """Radius (range) search with MULTI-PROBE LSH (Lv et al.,
    VLDB'07): return every corpus vector within cosine >=
    ``threshold_x1e6``/1e6 of each query, searching only the query's
    hyperplane bucket plus its ``LSH_BITS`` Hamming-1 neighbors — the
    buckets a near-miss sign flip would land a true neighbor in. The
    candidate set is exactly defined (all vectors whose bucket differs
    from the query's in <= 1 bit), so an oracle reproduces it
    verbatim; candidates verify with the exact fixed-point cosine.

    This is the third query shape of the ANN family: ``*_topk`` ranks
    a fixed k, ``lsh_similar_pairs`` enumerates all close pairs
    (self-join), range search answers "everything within tau of these
    queries" — the dedup-threshold / recall-audit primitive.

    Plan shape: each query explodes into ``LSH_BITS + 1`` probe rows
    (tiny — queries are the small side) broadcast onto the
    bucket-keyed corpus scan: zero shuffle of the corpus, one bucket
    hash join, per-probe buckets are disjoint so no candidate dedup
    pass is needed. At web scale the corpus side is written
    bucket-partitioned, so the broadcast probe join prunes to the
    probed buckets' files only.

    Output: (q_id, vec_id, sim_x1e6), one row per in-radius candidate.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(vec_col).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col).alias("_qb"),
    )
    masks = [0] + [1 << t for t in range(LSH_BITS)]
    probes = q.select(
        "q_id",
        "q_vec",
        F.explode(
            F.array(*[
                F.col("_qb").bitwiseXOR(F.lit(m)).cast("long")
                for m in masks
            ])
        ).alias("bucket"),
    )
    cands = c.join(F.broadcast(probes), "bucket").where(
        F.col("q_id") != F.col("vec_id")
    )
    return cands.select(
        "q_id",
        "vec_id",
        F.round(cosine("q_vec", "c_vec") * 1e6).cast("long").alias("sim_x1e6"),
    ).where(F.col("sim_x1e6") >= threshold_x1e6)


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact maximum-inner-product top-k (MIPS) with the
    norm-augmentation reduction surfaced (Bachrach et al., RecSys'14):
    append sqrt(M^2 - ||c||^2) to every corpus vector (M = max corpus
    norm) and 0 to every query, and MIPS becomes cosine search —
    cos(q_hat, c_hat) = <q,c> / (||q|| * M), strictly monotone in the
    inner product per query. We never materialize the extra dimension:
    ``mips_x1e6`` is that augmented cosine by its closed form, which is
    what any cosine ANN structure (the LSH buckets / IVF cells here)
    would bucket on at scale; ranking uses the exact fixed-point inner
    product so order never rides float division.

    Plan shape: M is a ONE-ROW aggregate broadcast onto the query side
    (a replicated scalar, never collected to the driver), queries
    broadcast onto the corpus scan — the corpus is read once with zero
    shuffle; the only exchange is the per-query top-k window.

    Output: (q_id, vec_id, rank, ip_x1e6, mips_x1e6).
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
    )
    max_norm = c.agg(F.max(norm("c_vec")).alias("_max_norm"))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ).crossJoin(F.broadcast(max_norm))
    )
    sims = c.join(q, F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        "vec_id",
        F.round(dot("q_vec", "c_vec") * 1e6).cast("long").alias("ip_x1e6"),
        F.round(
            dot("q_vec", "c_vec") / (norm("q_vec") * F.col("_max_norm")) * 1e6
        ).cast("long").alias("mips_x1e6"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("ip_x1e6").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "ip_x1e6", "mips_x1e6")
    )


def margin_mine(
    queries: DataFrame,
    fwd_corpus: DataFrame,
    bwd_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Margin-based candidate-pair mining (Artetxe & Schwenk, ACL'19 —
    the scoring CCMatrix/CCAligned used to mine parallel text): raw
    cosine over-selects in dense neighborhoods (hub vectors look
    similar to everything), so each pair is scored RELATIVE to both
    endpoints' neighborhoods — the ratio margin

        margin(x, y) = cos(x, y) / ((S_k(x) + S_k(y)) / 2k)

    where ``S_k(v)`` sums v's top-k neighbor cosines in the OTHER
    corpus. A pair scores high only when x and y are much closer to
    each other than either is to its k-neighborhood — the hubness
    correction that made mined bitext usable.

    Integer contract: cosines ride as the repo's x1e6 longs;
    ``margin_x1e6 = (cos_xy_x1e6 * 2k * 1e6) div (S_x + S_y)`` with
    candidates restricted to ``cos >= 0`` and ``S_x + S_y > 0``
    (mining thresholds are > 1.0 in practice, far above both guards),
    so every division is floor-of-nonnegative — bit-identical in any
    engine.

    Plan shape: two broadcast-query brute-force passes — forward
    (queries over ``fwd_corpus``) and backward (the <= |queries| * k
    distinct forward candidates over ``bwd_corpus``) — each a
    shuffle-free corpus scan plus one bounded top-k window; the margin
    join keys on the candidate id against the <= Qk-row backward
    aggregate, broadcastable by construction. At 100 TB the published
    systems swap each brute-force pass for the IVF index
    (sim_topk_ivf's shape) — the margin algebra on top is unchanged.

    Output: (q_id, vec_id, sim_x1e6, margin_x1e6, rank) — rank by
    margin per query, ties on candidate id.
    """
    # STAGE the forward result (localCheckpoint — the repo's
    # multi-consumer recipe): it is <= |queries| * k rows and feeds
    # three branches (S_x, the candidate semi-join, the margin join);
    # lazy, each branch would replan the corpus-scan BNLJ
    fwd = brute_force_topk(
        queries, fwd_corpus, id_col, vec_col, k
    ).localCheckpoint()
    s_x = fwd.groupBy("q_id").agg(
        F.sum("sim_x1e6").cast("long").alias("_sx")
    )
    cand_vecs = fwd_corpus.select(
        F.col(id_col), F.col(vec_col)
    ).join(
        fwd.select(F.col("vec_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    bwd = brute_force_topk(cand_vecs, bwd_corpus, id_col, vec_col, k)
    s_y = bwd.groupBy("q_id").agg(
        F.sum("sim_x1e6").cast("long").alias("_sy")
    ).select(F.col("q_id").alias("vec_id"), "_sy")
    den = F.col("_sx") + F.col("_sy")
    from .analytics import floor_div

    margin = floor_div(
        F.col("sim_x1e6") * (2 * k) * 1_000_000, den
    ).cast("long")
    scored = (
        fwd.join(F.broadcast(s_x), "q_id")
        .join(F.broadcast(s_y), "vec_id")
        .where((F.col("sim_x1e6") >= 0) & (den > 0))
        .select("q_id", "vec_id", "sim_x1e6", margin.alias("margin_x1e6"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("margin_x1e6").desc(), F.col("vec_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("q_id", "vec_id", "sim_x1e6", "margin_x1e6", "rank")


def embedding_cosine_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1e6: int = 300_000,
) -> DataFrame:
    """Embedding-cosine near-dup collapse: drop every vector that has a
    lower-id near-duplicate (cosine >= threshold within its LSH bucket).

    Output: (vec_id, is_kept) for all vectors — survivors keep
    ``is_kept = 1``. One LSH-bucketed pair search + one left anti
    semantics via join: no iterative connected components, which keeps
    it a two-shuffle plan at any scale (transitive chains collapse to
    their least member only when pairs bridge buckets — the standard
    LSH-dedup tradeoff).
    """
    pairs = lsh_similar_pairs(df, id_col, vec_col, threshold_x1e6)
    dups = pairs.select(F.col("v2").alias(id_col)).distinct()
    return df.select(F.col(id_col)).join(
        dups.withColumn("_dup", F.lit(1)), id_col, "left"
    ).select(
        F.col(id_col),
        F.when(F.col("_dup").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_kept"),
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x1e6: int = 300_000,
    pair_fanout: int | None = None,
    spread: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cells are the blocking buckets; within
    a cell, every vector with a LOWER-id neighbor at cosine >=
    threshold is dropped (deterministic keep-lowest-id rule — the
    paper keeps the vector farthest from the centroid; lowest-id is
    the hash-stable equivalent and is the same rule the MinHash/LSH
    dedup family here uses).

    Contrast with :func:`embedding_cosine_dedup`: the blocking
    structure is a LEARNED partition (Lloyd-refined codebook) instead
    of random hyperplanes, which is the published SemDeDup design
    point — semantically close vectors land in the same cell with far
    higher probability than under random projections, so the within-
    bucket pair search sees the true near-dup pairs.

    Scale: assignment is a broadcast-join argmax (centroids are tiny
    by construction); the pair search is a self equi-join keyed on
    cell_id, so the cost is sum(|cell|^2) — at 100 TB the paper's own
    regime applies: n_cells grows with the corpus (they use ~100k
    clusters) keeping cells bounded, and the dominated-set aggregate
    plus one left join stays a three-shuffle plan. Never all-pairs.

    ``pair_fanout`` splits each cell's quadratic pair search into
    ``fanout`` deterministic hash buckets of the right side (the left
    side replicates ``fanout`` ways): with n_cells blocking buckets a
    plain cell_id self-join caps parallelism at n_cells tasks, so one
    giant cell serializes the stage (guide: skew). Size it so that
    n_cells x fanout ~ cluster parallelism; None = no split. Pair
    coverage is exact — every v2 lands in exactly one bucket.

    ``spread`` passes through to :func:`ivf_assign` — False when the
    corpus is an aggregate output, not a scan.

    Output: (vec_id, cell_id, is_kept) for every corpus vector.
    """
    # persisted (lazily): the assignment — a per-vector n_cells x
    # O(dim) argmax fold — feeds BOTH the pair search and the final
    # is_kept join, and nothing upstream dedups the fold across the
    # two consumers. One corpus-sized cache entry (MEMORY_AND_DISK —
    # spills rather than evicts at scale), exactly the assignment
    # table an IVF store would persist on disk for the same reason.
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, spread).persist()
    # per-vector norms once: cosine = dot / (n1 * n2) with n1, n2 the
    # identical doubles norm() yields — 3x fewer per-pair array ops,
    # bit-identical scores
    withn = assigned.select(
        "cell_id", "vec_id", "embedding", norm("embedding").alias("_n")
    )
    fanout = max(1, int(pair_fanout or 1))
    left = withn.select(
        "cell_id",
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        F.col("_n").alias("n1"),
        F.explode(
            F.sequence(F.lit(0), F.lit(fanout - 1))
        ).alias("_b"),
    )
    right = withn.select(
        "cell_id",
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        F.col("_n").alias("n2"),
        F.pmod(F.xxhash64("vec_id"), F.lit(fanout)).alias("_b"),
    )
    sim = F.round(
        dot("e1", "e2") / (F.col("n1") * F.col("n2")) * 1e6
    ).cast("long")
    dominated = (
        left.join(right, ["cell_id", "_b"])
        .where(F.col("v1") < F.col("v2"))
        .where(sim >= F.lit(threshold_x1e6))
        .select(F.col("v2").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(
            dominated, F.col("vec_id") == F.col("dup_id"), "left"
        )
        .select(
            F.col("vec_id").cast("long").alias(id_col),
            F.col("cell_id").cast("long").alias("cell_id"),
            F.when(F.col("dup_id").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_kept"),
        )
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/transport
    compression step of a vector pipeline (4x smaller than float32,
    8x smaller than float64, dot products stay integer SIMD).

    Per vector: scale ``s = max(|v_i|)``, code ``q_i = floor(v_i / s *
    127 + 0.5)`` (round-half-up in exact double arithmetic — float32
    inputs convert to float64 losslessly, and /,*,floor are IEEE-exact
    in any engine, so codes are bit-identical cross-engine with no
    float hashing involved). The all-zero vector quantizes to all-zero
    codes with scale 0.

    Output: (id, qvec array<long> with values in [-127, 127],
    scale_x1e9 long — the scale floored at nanoscale for exact
    comparison; dequantization uses q_i * s / 127).

    Shape: two chained zero-shuffle projections — at 100 TB this is a
    pure map stage that rewrites the embedding column in place. The
    scale is materialized as its own column BEFORE the code transform:
    an expression referenced inside a ``transform`` lambda is evaluated
    per ELEMENT, so an inline ``array_max`` scale would cost O(dim^2)
    per vector (measured ~4x the whole query at dim 64); as a bound
    attribute it is computed once per row.
    """
    v = _as_double(vec_col)
    base = emb.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_max(F.transform(v, F.abs)).alias("_s"),
    )
    s = F.col("_s")
    q = F.transform(
        F.col("_v"),
        lambda x: F.when(s > 0, F.floor(x / s * 127 + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return base.select(
        F.col(id_col),
        q.alias("qvec"),
        F.floor(s * 1_000_000_000).cast("long").alias("scale_x1e9"),
    )


def int8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k by INTEGER dot product over int8-quantized codes —
    :func:`brute_force_topk`'s shape (broadcast queries, shuffle-free
    corpus scan, one per-query window) running on :func:`quantize_int8`
    output instead of floats. Output: (q_id, vec_id, rank, qdot).

    This is the compressed-domain scoring a quantized vector store
    serves: the dot of two code vectors is exact 64-bit integer
    arithmetic (|q| <= 127, so 64 dims bound the sum at ~10^6 — far
    from overflow), bit-identical in any engine with no float in the
    compare path. Ranking approximates cosine ranking to quantization
    error; the float path stays available for exact reranking.
    """
    qq = F.broadcast(
        quantize_int8(queries, id_col, vec_col).select(
            F.col(id_col).alias("q_id"), F.col("qvec").alias("q_codes")
        )
    )
    cc = quantize_int8(
        _spread(corpus.select(F.col(id_col), F.col(vec_col))),
        id_col,
        vec_col,
    ).select(
        F.col(id_col).alias("vec_id"), F.col("qvec").alias("c_codes")
    )
    qdot = F.aggregate(
        F.zip_with("q_codes", "c_codes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = cc.join(qq, F.col("q_id") != F.col("vec_id")).select(
        "q_id", "vec_id", qdot.alias("qdot")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("qdot").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "qdot")
    )


def int8_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    prefilter_k: int = 50,
) -> DataFrame:
    """Two-stage ANN serving: compressed-domain prefilter
    (:func:`int8_topk`, integer dots over the whole corpus) keeps
    ``prefilter_k`` candidates per query, then ONLY those candidates
    are rescored with exact float cosine and re-ranked to the final
    ``k`` — the standard quantize-then-rerank pattern (the float read
    touches prefilter_k vectors per query instead of the corpus).

    Output: (q_id, vec_id, rank, sim_x1e6) — same contract as
    :func:`brute_force_topk`, so the caller can swap exact for staged
    retrieval without touching downstream code.
    """
    cand = int8_topk(queries, corpus, id_col, vec_col, k=prefilter_k)
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
    )
    rescored = (
        cand.select("q_id", "vec_id")
        .join(cv, "vec_id")
        .join(qv, "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(cosine("q_vec", "c_vec") * 1e6)
            .cast("long")
            .alias("sim_x1e6"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_x1e6").desc(), F.col("vec_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "sim_x1e6")
    )


def knn_label_audit(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Label-noise detection by k-NN disagreement — the
    confident-learning-style audit a labeled training corpus runs
    before trusting its labels: for each audited vector, take its k
    exact-cosine nearest neighbors (self excluded), majority-vote
    their labels (ties break on count DESC then label ASC — fully
    deterministic, no float tie-breaks), and flag vectors whose own
    label disagrees with the neighborhood vote.

    Built on :func:`brute_force_topk`'s exact ranking for the audited
    SAMPLE (audits run on samples — the dedup_lsh_audit argument); at
    corpus scale serve the neighbor search from the persisted IVF
    index instead and keep this vote stage unchanged.

    Output: (q_id, label, pred_label, n_agree, is_mismatch) —
    ``n_agree`` the winning vote count, ``is_mismatch`` 1 when the
    vote contradicts the stored label.
    """
    nn = brute_force_topk(queries, corpus, id_col, vec_col, k=k)
    return knn_label_vote(nn, queries, corpus, id_col, label_col)


def knn_label_vote(
    nn: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """The audit's VOTE STAGE alone, over any neighbor ranking
    ``nn`` (q_id, vec_id, ...) — exact (:func:`knn_label_audit`) or
    served from the persisted IVF index
    (queries_extensions.q_knn_label_audit_ivf). Factoring it out is
    the 100-TB recipe made code: the neighbor SOURCE changes with
    scale, the vote never does. Output contract matches
    :func:`knn_label_audit`."""
    lab = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).alias("_nl")
    )
    votes = (
        nn.select("q_id", "vec_id")
        .join(lab, "vec_id")
        .groupBy("q_id", "_nl")
        .agg(F.count(F.lit(1)).alias("_votes"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("_votes").desc(), F.col("_nl")
    )
    pred = (
        votes.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "q_id",
            F.col("_nl").cast("long").alias("pred_label"),
            F.col("_votes").cast("long").alias("n_agree"),
        )
    )
    own = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).cast("long").alias("label"),
    )
    return own.join(pred, "q_id").select(
        "q_id",
        "label",
        "pred_label",
        "n_agree",
        F.when(F.col("label") != F.col("pred_label"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_mismatch"),
    )


def label_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label integer centroid: each component is
    ``floor(sum(round(v_d * 1e6)) / n)`` — exact long arithmetic, so
    the prototype table is bit-identical in any engine. Output:
    (label, centroid array<long>, n_members). One posexplode + one
    (label, dim) aggregation; the result is L rows of d longs — a
    broadcast-sized prototype table at any corpus size."""
    q = corpus.select(
        F.col(label_col).alias("_l"),
        F.posexplode(
            F.transform(
                _as_double(vec_col),
                lambda x: F.round(x * F.lit(1e6)).cast("long"),
            )
        ).alias("_d", "_v"),
    )
    comp = q.groupBy("_l", "_d").agg(
        F.expr("sum(_v) div count(1)").alias("_c"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        comp.groupBy("_l")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_d", "_c"))
                ),
                lambda s: s["_c"],
            ).alias("centroid"),
            F.max("_n").cast("long").alias("n_members"),
        )
        .select(F.col("_l").alias(label_col), "centroid", "n_members")
    )


def centroid_confusion(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid-classifier confusion matrix — the one-pass
    label-coherence summary (how separable are the label clusters in
    embedding space?): assign every vector to its nearest per-label
    centroid by fixed-point cosine (ties break on label ASC) and
    count (label, pred_label) cells. The centroid table rides as a
    broadcast (L rows); the corpus never shuffles until the final
    L x L cell aggregation.

    Output: (label, pred_label, n).
    """
    cents = F.broadcast(
        label_centroids(corpus, vec_col, label_col).select(
            F.col(label_col).alias("_cl"), "centroid"
        )
    )
    qv = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("label"),
        F.transform(
            _as_double(vec_col),
            lambda x: F.round(x * F.lit(1e6)).cast("long"),
        ).alias("_q"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with(
                F.col("_q"),
                F.col("centroid"),
                lambda a, b: a.cast("double") * b.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.col("_q"),
                        lambda a: a.cast("double") * a.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * F.sqrt(
                F.aggregate(
                    F.transform(
                        F.col("centroid"),
                        lambda a: a.cast("double") * a.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        )
        * 1e6
    ).cast("long")
    w = Window.partitionBy("_id").orderBy(
        F.col("_cos").desc(), F.col("_cl")
    )
    assigned = (
        qv.join(cents, F.lit(True))
        .select("_id", "label", "_cl", cos.alias("_cos"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
    )
    return assigned.groupBy(
        "label", F.col("_cl").cast("long").alias("pred_label")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


# -- Johnson-Lindenstrauss sign projection (dimensionality reduction) --------

RP_DIM = 16  # 64 dims -> 16: 4x cheaper candidate dots
_rp_rng = random.Random(4242)
# RP_DIM rows of EMBED_DIM Rademacher signs — the Achlioptas dense +-1
# JL matrix, seeded at import and baked into BOTH the Spark plan and
# the oracle SQL as literals (the lsh_bucket discipline)
RP_SIGNS: list[list[int]] = [
    [_rp_rng.choice((-1, 1)) for _ in range(EMBED_DIM)]
    for _ in range(RP_DIM)
]


def rp_project(vec_col) -> Column:
    """JL sign-projection of an ``array<float>`` embedding to
    ``array<long>`` of RP_DIM EXACT fixed-point coordinates:
    ``p_j = sum_i signs[j][i] * round(v_i * 1e6)``.

    Components are quantized ONCE (x1e6 longs), then each projected
    coordinate is a signed integer sum — no float accumulation at all,
    so the projection is bit-identical in any engine and any fold
    order (integer addition commutes; contrast the ordered double
    folds :func:`dot` needs). Distances contract per
    Johnson-Lindenstrauss: with RP_DIM = 16 the projected dot is a
    candidate-stage score, never the final ranking.
    """
    q = F.transform(
        _as_double(vec_col),
        lambda x: F.round(x * F.lit(1e6)).cast("long"),
    )
    coords = []
    for j in range(RP_DIM):
        signs = F.array(
            *[F.lit(s).cast("long") for s in RP_SIGNS[j]]
        )
        coords.append(
            F.aggregate(
                F.zip_with(q, signs, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*coords)


def rp_project_table(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Corpus-grain JL projection: (id, p array<long>) with identical
    arithmetic to :func:`rp_project`, computed as posexplode + RP_DIM
    codegen sum-aggregates instead of RP_DIM higher-order array folds
    — the :func:`~.dedup.minhash_signatures` lesson again: HOF lambdas
    evaluate interpreted per element, while conditional sums after an
    explode run inside whole-stage codegen (measured ~5x faster at
    corpus grain). Costs one exchange carrying RP_DIM+1 longs per
    vector — the projected table a deployment would persist anyway."""
    signs = F.broadcast(
        df.sparkSession.createDataFrame(
            [
                (j, i, RP_SIGNS[j][i])
                for j in range(RP_DIM)
                for i in range(EMBED_DIM)
            ],
            "_j int, _i int, _s long",
        )
    )
    q = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "_i", "_x"
        ),
    ).select(
        F.col(id_col),
        F.col("_i"),
        F.round(F.col("_x") * F.lit(1e6)).cast("long").alias("_q"),
    )
    # the sign matrix rides as a 1024-row broadcast TABLE, not as
    # 1024 literal expression nodes — the literal form cost seconds
    # of Catalyst analysis per run (measured), dwarfing execution
    sums = (
        q.join(signs, "_i")
        .groupBy(id_col, "_j")
        .agg(F.sum(F.col("_q") * F.col("_s")).cast("long").alias("_ps"))
    )
    return (
        sums.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_j", "_ps"))),
                lambda s: s["_ps"],
            ).alias("p")
        )
    )


def rp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    prefilter_k: int = 50,
) -> DataFrame:
    """Two-stage ANN via JL dimensionality reduction: candidates are
    ranked by the EXACT INTEGER dot of the RP_DIM sign projections
    (a 4x-narrower scan than the raw vectors — the reduced table is
    what a 100-TB deployment persists next to the corpus), then only
    ``prefilter_k`` survivors per query are rescored with exact float
    cosine to the final ``k`` — :func:`int8_rerank_topk`'s contract
    with dimensionality reduction instead of scalar quantization as
    the compressed domain.

    Output: (q_id, vec_id, rank, sim_x1e6) — swap-compatible with
    :func:`brute_force_topk`.
    """
    # both sides project via the broadcast-sign-table form — the
    # literal-HOF rp_project costs seconds of plan analysis per run
    # (see rp_project_table); the query side stays broadcast-small
    qp = F.broadcast(
        rp_project_table(queries, id_col, vec_col).select(
            F.col(id_col).alias("q_id"), F.col("p").alias("q_p")
        )
    )
    cp = rp_project_table(corpus, id_col, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("p").alias("c_p")
    )
    pd_ = F.aggregate(
        F.zip_with(F.col("q_p"), F.col("c_p"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wc = Window.partitionBy("q_id").orderBy(
        F.col("proj_dot").desc(), F.col("vec_id")
    )
    cand = (
        cp.join(qp, F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", pd_.alias("proj_dot"))
        .withColumn("c_rank", F.row_number().over(wc))
        .where(F.col("c_rank") <= prefilter_k)
        .select("q_id", "vec_id")
    )
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
    )
    rescored = (
        cand.join(cv, "vec_id")
        .join(qv, "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(cosine("q_vec", "c_vec") * 1e6)
            .cast("long")
            .alias("sim_x1e6"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_x1e6").desc(), F.col("vec_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "sim_x1e6")
    )


def power_iteration_top_component(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 3,
) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix by FIXED-ITERATION power iteration — the classic
    distributed spectral primitive (PCA's first component, spectral
    embedding seeds), in the repo's deterministic-integer discipline:

    * components quantize once to x1e6 longs;
    * v starts at the FIRST BASIS VECTOR (x1e6) — a fixed start makes
      the iteration deterministic AND fixes the sign indeterminacy;
    * each round is two corpus aggregations:
      ``s_r = (sum_d q_rd * v_d) div 1e6`` (the per-row projection,
      rescaled by truncating integer division — negative projections
      truncate toward zero in any engine) and
      ``w_d = sum_r s_r * q_rd`` (the back-projection);
    * v renormalizes by MAX-ABS, not L2 — ``v_d = trunc(double(w_d) *
      1e6 / max|w|)``: one long->double conversion + one IEEE
      multiply/divide/trunc, bit-identical in any engine (|w| can pass
      2^53, where the conversion rounds — identically everywhere, so
      the contract stays hash-stable; the magnitude bound is
      |w| <= n_rows * 3.2e8 * max|q|, fine to ~1e6-row audit slices —
      rescale ``s`` harder for bigger ones).

    v rides the loop as a COLLECTED 64-long driver artifact (the IVF
    codebook precedent — bounded by the dimension, never the corpus);
    each round's heavy work is the two partial-aggregated corpus
    passes. Output: one row per dimension, (dim, v_x1e6) after
    ``n_iter`` rounds.
    """
    import math

    q = corpus.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_as_double(vec_col)).alias("d", "_x"),
    ).select(
        "_id",
        "d",
        F.round(F.col("_x") * F.lit(1e6)).cast("long").alias("q"),
    ).localCheckpoint()
    dim = q.agg(F.max("d")).collect()[0][0] + 1
    v = _power_loop(q, dim, int(n_iter))
    out = corpus.sparkSession.createDataFrame(
        [(i, int(v[i])) for i in range(dim)], "dim long, v_x1e6 long"
    )
    return out


def _row_projection(q: DataFrame, v: list):
    """Per-row rescaled projection onto ``v``:
    (_id, s = (sum_d q_rd * v_d) div 1e6)."""
    varr = F.array(*[F.lit(int(x)).cast("long") for x in v])
    return (
        q.select(
            "_id",
            (F.col("q") * F.element_at(varr, F.col("d") + 1)).alias("_p"),
        )
        .groupBy("_id")
        .agg(F.expr("CAST(sum(_p) AS BIGINT) div 1000000").alias("s"))
    )


def _power_loop(q: DataFrame, dim: int, n_iter: int):
    """The power-iteration rounds of
    :func:`power_iteration_top_component` over an explicit
    (_id, d, q) table — factored so the deflated second-component run
    reuses the identical arithmetic."""
    import math

    v = [1_000_000] + [0] * (dim - 1)
    for _ in range(n_iter):
        s = _row_projection(q, v)
        w_rows = (
            q.join(s, "_id")
            .groupBy("d")
            .agg(F.sum(F.col("q") * F.col("s")).cast("long").alias("w"))
            .collect()
        )
        w = [0] * dim
        for r in w_rows:
            w[r.d] = r.w
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [math.trunc(float(x) * 1e6 / float(m)) for x in w]
    return v


def power_iteration_two_components(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 3,
) -> DataFrame:
    """Top TWO principal directions by power iteration with
    DEFLATION — the textbook extension: run the fixed-iteration loop
    for v1, remove each row's v1-aligned part, and run the identical
    loop on the deflated table for v2. The true projection
    coefficient is (q.v1)/|v1|^2 — v1 is max-abs-normalized, NOT
    unit-L2 — so the integer deflation divides by the rescaled
    squared norm::

        s_r    = (sum_d q_rd * v1_d) div 1e6          -- ~ (q.v1)/1e6
        m2     = (sum_d v1_d^2)      div 1e6          -- ~ |v1|^2/1e6
        q'_rd  = q_rd - (s_r * v1_d) div m2

    (every division truncates toward zero on both signs — bit-
    identical in any engine; the two rescales bound every product
    under 2^62). Deflation is exact up to the x1e6 quantization —
    the gate pins the ARITHMETIC, the property test pins that v2
    lands on the second synthetic direction.

    Output: one row per dimension, (dim, v1_x1e6, v2_x1e6).
    """
    q = corpus.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_as_double(vec_col)).alias("d", "_x"),
    ).select(
        "_id",
        "d",
        F.round(F.col("_x") * F.lit(1e6)).cast("long").alias("q"),
    ).localCheckpoint()
    dim = q.agg(F.max("d")).collect()[0][0] + 1
    t = int(n_iter)
    v1 = _power_loop(q, dim, t)
    s1 = _row_projection(q, v1)
    v1arr = F.array(*[F.lit(int(x)).cast("long") for x in v1])
    m2 = sum(x * x for x in v1) // 1_000_000
    q2 = (
        q.join(s1, "_id")
        .withColumn(
            "_dq", F.col("s") * F.element_at(v1arr, F.col("d") + 1)
        )
        .select(
            "_id",
            "d",
            (F.col("q") - F.expr(f"CAST(_dq AS BIGINT) div {m2}"))
            .cast("long")
            .alias("q"),
        )
        .localCheckpoint()
    )
    v2 = _power_loop(q2, dim, t)
    return corpus.sparkSession.createDataFrame(
        [(i, int(v1[i]), int(v2[i])) for i in range(dim)],
        "dim long, v1_x1e6 long, v2_x1e6 long",
    )


# -- product quantization (PQ) with asymmetric-distance scoring --------------

PQ_M = 4  # subspaces: 64 dims -> 4 x 16
PQ_CODES = 16  # codewords per subspace -> 4 bits/subspace, 2 bytes/vector
PQ_SCALE = 1000  # component fixed point (x1000 longs)


def _pq_subq(vec_col, s, d_sub: int) -> Column:
    """Quantized subvector s of a double array: array<long>, x1000."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sliced = F.slice(v, s * d_sub + 1, d_sub) if isinstance(s, int) else (
        F.expr(f"slice({vec_col}, {s} * {d_sub} + 1, {d_sub})")
    )
    return F.transform(
        sliced, lambda x: F.round(x * PQ_SCALE).cast("long")
    )


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Deterministic PQ codebook: (s, code, cw array<long> x1000) —
    for each of the ``m`` subspaces, the ``n_codes`` codewords are the
    subvectors of the n_codes LOWEST-ID corpus vectors (code = id
    rank), the same crude-but-reproducible sampling as
    :func:`ivf_centroids`; a per-subspace k-means refinement would
    slot in here without changing the encode/score path. Tiny by
    construction (m * n_codes rows), always the broadcast side.
    """
    d_sub = dim // m
    w = Window.orderBy(F.col(id_col))
    base = (
        corpus.orderBy(F.col(id_col))
        .limit(n_codes)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("code"),
            _as_double(vec_col).alias("_v"),
        )
    )
    per_sub = [
        base.select(
            F.lit(s).cast("long").alias("s"),
            "code",
            _pq_subq("_v", s, d_sub).alias("cw"),
        )
        for s in range(m)
    ]
    out = per_sub[0]
    for p in per_sub[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Encode every vector as its per-subspace nearest codeword:
    (vec_id, s, code) — the tall form ADC scoring joins on; packing to
    ``m`` nibbles is a trivial projection on top when storing.

    Nearest = min integer squared L2 distance over the quantized
    subvectors, ties to the lowest code via the scalar composite
    ``d2 * n_codes + code`` (same single-BIGINT tiebreak discipline as
    the M4 first/last) inside ``min_by`` — so encoding is ONE
    partial-aggregated groupBy over a broadcast-joined explode:
    corpus x m subvectors x n_codes codewords, no window, no shuffle
    keyed on anything codebook-sized.

    Magnitudes: components x1000 (|q| <= ~10^4 for unit-ish
    embeddings), so d2 <= d_sub * (2*10^4)^2 ~ 6.4*10^9 and the
    composite stays far under 2^63.
    """
    d_sub = dim // m
    sub = (
        corpus.select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("_v")
        )
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            F.col("_v"),
        )
        .select(
            "vec_id",
            F.col("s").cast("long").alias("s"),
            _pq_subq("_v", "s", d_sub).alias("subq"),
        )
    )
    d2 = F.aggregate(
        F.zip_with("subq", "cw", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        sub.join(F.broadcast(codebook), "s")
        .select(
            "vec_id", "s", "code", (d2 * n_codes + F.col("code")).alias("_k")
        )
        .groupBy("vec_id", "s")
        .agg(F.min_by("code", F.col("_k")).cast("long").alias("code"))
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus vectors live ONLY as
    ``m``-code words; each query scores them through its lookup table
    of exact integer partial dots (query subvector x codeword, both
    x1000 -> x1e6 longs) — the classic ADC serving path (Jegou et al.,
    TPAMI'11) where the full-precision corpus is never touched at
    query time.

    Output: (q_id, vec_id, rank, adc_x1e6) — rank by approximate dot,
    ties to the lowest candidate id, self-matches excluded; same
    contract shape as the rest of the top-k family so callers can swap
    exact / int8 / IVF / PQ retrieval freely.

    Scale shape: the LUT is queries x m x n_codes rows (tiny: fixed
    query set, fixed codebook) and is BROADCAST; the corpus side is
    its (vec_id, s, code) encoding — m rows per vector regardless of
    dim — so scoring is one broadcast join + a partial-aggregated
    (q_id, vec_id) sum, and the only real shuffle is that sum plus the
    per-query top-k window. Integer end-to-end: no float enters the
    compare path.
    """
    d_sub = dim // m
    codebook = pq_codebook(corpus, id_col, vec_col, m, n_codes, dim)
    codes = pq_encode(corpus, codebook, id_col, vec_col, m, n_codes, dim)
    qsub = (
        queries.select(
            F.col(id_col).alias("q_id"), _as_double(vec_col).alias("_v")
        )
        .select(
            "q_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            F.col("_v"),
        )
        .select(
            "q_id",
            F.col("s").cast("long").alias("s"),
            _pq_subq("_v", "s", d_sub).alias("qsubq"),
        )
    )
    pdot = F.aggregate(
        F.zip_with("qsubq", "cw", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = qsub.join(F.broadcast(codebook), "s").select(
        "q_id", "s", "code", pdot.alias("pdot")
    )
    scored = (
        codes.join(
            F.broadcast(lut),
            ["s", "code"],
        )
        .where(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("pdot").cast("long").alias("adc_x1e6"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_x1e6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "adc_x1e6")
    )


def pq_kmeans_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    dim: int = EMBED_DIM,
    n_iter: int = 2,
) -> DataFrame:
    """Per-subspace Lloyd-refined PQ codebook in exact fixed-point
    arithmetic — the trained counterpart of :func:`pq_codebook`, same
    output shape (s, code, cw array<long> x1000) so
    :func:`pq_encode` and every ADC consumer work unchanged.

    Starts from the sampled codebook and runs ``n_iter`` Lloyd steps
    PER SUBSPACE, all m of them inside one plan (subspace is just a
    grouping column): assign every (vector, subspace) pair to its
    min-squared-L2 codeword (exact integer d2 over the x1000-quantized
    subvectors, ties to the lowest code via the composite
    ``d2 * n_codes + code`` inside ``min_by`` — the
    :func:`pq_encode` discipline), then recompute each codeword
    component as the FLOORED integer mean of its members' quantized
    components. Components never leave the x1000-long domain, so the
    refined codebook — and every code and ADC score derived from it —
    is bit-reproducible across engines and partitionings: the whole
    IVF-PQ index sits under the hash gate. Codewords that lose all
    members drop out (code ids keep their original values, exactly
    like empty IVF cells).

    Per iteration: one broadcast join + partial-aggregated ``min_by``
    (assignment — corpus x m x n_codes rows, but codebook-sized state
    only), one posexplode + (s, code, j) partial-aggregated mean. The
    finished codebook (<= m * n_codes rows) is collected and
    re-created as a literal frame, same rationale as
    :func:`ivf_kmeans_centroids`: an ANN codebook is a driver-side
    artifact by design, and inlining keeps downstream encode/score
    plans from re-running the refinement once per use.
    """
    d_sub = dim // m
    cents = pq_codebook(corpus, id_col, vec_col, m, n_codes, dim)
    sub = (
        corpus.select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("_v")
        )
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            F.col("_v"),
        )
        .select(
            "vec_id",
            F.col("s").cast("long").alias("s"),
            _pq_subq("_v", "s", d_sub).alias("subq"),
        )
    )
    d2 = F.aggregate(
        F.zip_with("subq", "cw", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    for _ in range(n_iter):
        assigned = (
            sub.join(F.broadcast(cents), "s")
            .select(
                "vec_id",
                "s",
                "code",
                "subq",
                (d2 * n_codes + F.col("code")).alias("_k"),
            )
            .groupBy("vec_id", "s")
            .agg(
                F.min_by("code", F.col("_k")).cast("long").alias("code"),
                F.first("subq").alias("subq"),
            )
        )
        comp = assigned.select(
            "s", "code", F.posexplode("subq").alias("j", "q")
        )
        means = comp.groupBy("s", "code", "j").agg(
            F.floor(F.sum("q") / F.count("*")).cast("long").alias("cq")
        )
        cents = means.groupBy("s", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "cq"))),
                lambda t: t["cq"],
            ).alias("cw")
        )
    rows = [
        (int(r["s"]), int(r["code"]), [int(x) for x in r["cw"]])
        for r in cents.collect()
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "s: long, code: long, cw: array<long>"
    )


def ivfpq_probe_topk(
    queries: DataFrame,
    centroids: DataFrame,
    pq_cb: DataFrame,
    codes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """IVF-PQ serving (Jegou et al., TPAMI'11): probe the ``nprobe``
    max-cosine coarse cells per query, then rank ONLY those cells'
    vectors by asymmetric distance through the query's exact-integer
    LUT — the corpus's full-precision vectors are never touched at
    query time; it exists only as ``m`` small codes per vector.

    ``centroids`` is the coarse codebook (cell_id, c_vec); ``pq_cb``
    the PQ codebook (s, code, cw x1000); ``codes`` the encoded corpus
    (cell_id, vec_id, s, code) — typically unpacked from a persisted
    :class:`~.vector_index.IvfIndexStore` PQ artifact, in which case
    the broadcast probe join dynamically prunes the
    cell_id-partitioned codes scan to the probed cells only (the same
    pruning contract as :func:`ivf_probe_topk`, at ~1/16th the bytes
    per pruned partition).

    Output: (q_id, vec_id, rank, adc_x1e6) — the :func:`pq_topk`
    contract, restricted to probed cells. Integer end-to-end past the
    probe step: no float enters the score compare path.
    """
    d_sub = dim // m
    # 1. coarse probes: tiny, per-query nprobe rows, broadcast
    qsims = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).join(F.broadcast(centroids)).select(
        "q_id",
        "q_vec",
        "cell_id",
        F.round(cosine("q_vec", "c_vec") * 1e6).cast("long").alias("c_sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("c_sim").desc(), F.col("cell_id")
    )
    probes = (
        qsims.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("q_id", "q_vec", "cell_id")
    )
    # 2. per-query LUT of exact-integer partial dots (q_count x m x
    #    n_codes rows — broadcast side by construction)
    qsub = queries.select(
        F.col(id_col).alias("q_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        _as_double(vec_col).alias("_v"),
    ).select(
        "q_id",
        F.col("s").cast("long").alias("s"),
        _pq_subq("_v", "s", d_sub).alias("qsubq"),
    )
    pdot = F.aggregate(
        F.zip_with("qsubq", "cw", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = qsub.join(F.broadcast(pq_cb), "s").select(
        "q_id", "s", "code", pdot.alias("pdot")
    )
    # 3. probed-cell candidates scored through the LUT: the only
    #    corpus-sized work, and it reads codes (m longs/vector), not
    #    vectors. cell_id rides along (functional on vec_id) so a
    #    rerank consumer can re-fetch the shortlist's full vectors
    #    with a partition-pruned (cell_id, vec_id) join instead of a
    #    full assignment scan.
    plist = probes.select("q_id", "cell_id")
    scored = (
        codes.join(F.broadcast(plist), "cell_id")
        .where(F.col("q_id") != F.col("vec_id"))
        .join(F.broadcast(lut), ["q_id", "s", "code"])
        .groupBy("q_id", "vec_id")
        .agg(
            F.sum("pdot").cast("long").alias("adc_x1e6"),
            F.first("cell_id").alias("cell_id"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_x1e6").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "adc_x1e6", "cell_id")
    )


def rrf_fuse(
    rankings: list,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    N retrieval rankings — the standard hybrid-search combiner (dense
    + sparse, exact + quantized): each list contributes
    ``1 / (rrf_k + rank)`` per hit, documents are re-ranked by the
    sum. rrf_k = 60 is the published constant; the score is evaluated
    as the EXACT integer ``floor(1e9 / (rrf_k + rank))`` per hit (rank
    is a small positive integer, so the quotient table is finite and
    identical in any engine) and summed as longs — no float crosses
    an engine boundary, so the fused ranking itself hash-gates.

    Inputs are (q_id, vec_id, rank) frames — the output contract every
    top-k operator in this module shares, which is what makes fusion
    compositional here. A document missing from one list contributes
    nothing from it (the standard convention). Ties break toward the
    smaller vec_id, like every ranking in the registry.

    Scale shape: one union of already-k-bounded lists (N * k rows per
    query), one partial-aggregated sum keyed on (q_id, vec_id), one
    per-query window over <= N * k rows. The corpus is never touched —
    fusion cost is independent of corpus size by construction.

    Output: (q_id, vec_id, rrf_x1e9, rank) — rank <= k by fused score.
    """
    from .analytics import floor_div

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    pts = None
    for r in rankings:
        scored = r.select(
            "q_id",
            "vec_id",
            floor_div(
                F.lit(1_000_000_000), F.lit(rrf_k) + F.col("rank")
            ).alias("_pts"),
        )
        pts = scored if pts is None else pts.unionByName(scored)
    fused = pts.groupBy("q_id", "vec_id").agg(
        F.sum("_pts").cast("long").alias("rrf_x1e9")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_x1e9"), F.asc("vec_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rrf_x1e9", "rank")
    )


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 8,
    prefilter_k: int = 20,
    lambda_x1e6: int = 700_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) — the rerank production retrieval uses when plain
    top-k returns k near-copies of one result: greedily pick the
    candidate maximizing ``lambda * rel(c) - (1-lambda) * max_{s in
    selected} sim(c, s)``, so each pick trades relevance against
    redundancy with what is already chosen.

    Determinism: relevance and candidate-pair similarities are the
    registry's rounded x1e6 fixed-point cosines; lambda is an x1e6
    integer, so every MMR score is the exact long ``lam * rel - (1e6 -
    lam) * maxsim`` (x1e12 scale, |score| <= 1e12); argmax ties break
    toward the smaller id; the selection over an empty set scores
    maxsim = 0 (so pick 1 is the plain relevance argmax). The greedy
    loop runs a FIXED k steps — the unrolled-CTE oracle replays every
    pick.

    Scale shape: stage 1 bounds the working set to ``prefilter_k``
    candidates per query (the exact top-k operator — swap in the int8
    or IVF ranking upstream at larger corpora; the MMR stage only
    needs SOME (q_id, vec_id, rel) candidate frame). The pair-sim
    table is <= prefilter_k^2 rows per query and persists across
    steps; each greedy step is one bounded join + partial-agg max +
    per-query window argmax over <= prefilter_k rows, with
    ``localCheckpoint`` truncating lineage — cost is O(k *
    prefilter_k^2) per query INDEPENDENT of corpus size.

    Output: (q_id, vec_id, step, mmr_x1e12) — step in 1..k, the pick
    order (step replaces rank: MMR's order IS its ranking).
    """
    if prefilter_k < k:
        raise ValueError(
            f"prefilter_k ({prefilter_k}) must be >= k ({k}): the "
            "greedy loop selects k of the prefiltered candidates"
        )
    lam = lambda_x1e6
    lam1 = 1_000_000 - lambda_x1e6
    cands = brute_force_topk(
        queries, corpus, id_col, vec_col, k=prefilter_k
    )
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )
    cand = cands.join(cv, "vec_id").select(
        "q_id", "vec_id", "sim_x1e6", "_v"
    ).localCheckpoint()
    a = cand.select(
        "q_id", F.col("vec_id").alias("_ca"), F.col("_v").alias("_va")
    )
    b = cand.select(
        "q_id", F.col("vec_id").alias("_cb"), F.col("_v").alias("_vb")
    )
    pair = (
        a.join(b, "q_id")
        .where(F.col("_ca") != F.col("_cb"))
        .select(
            "q_id",
            "_ca",
            "_cb",
            F.round(cosine("_va", "_vb") * 1e6).cast("long").alias("_psim"),
        )
    )
    # ---- greedy selection DRIVER-SIDE over bounded integer state ----
    # The relevance and pair-sim tables are BOUNDED BY CONSTRUCTION
    # (<= nq * prefilter_k and <= nq * prefilter_k^2 integer rows —
    # queries are a small serving/audit set by this operator's
    # contract, prefilter caps candidates), yet the old loop ran ~3
    # Spark jobs per greedy step (argmax + two checkpoint
    # materializations) x k steps on them — pure scheduling overhead
    # on literals, the same shape the unigram-EM fit shed. All FLOAT
    # work (cosines) stays distributed and bit-identical; only the
    # exact-integer greedy (long mul/sub/max, ties to smaller id) runs
    # here, so the result is provably the old fixpoint: identical
    # scores, identical argmax rule, step by step.
    rel_rows = cand.select("q_id", "vec_id", "sim_x1e6").collect()
    pair_rows = pair.collect()
    rel_by_q: dict = {}
    for r in rel_rows:
        rel_by_q.setdefault(r["q_id"], []).append(
            (r["vec_id"], r["sim_x1e6"])
        )
    psim = {
        (r["q_id"], r["_ca"], r["_cb"]): r["_psim"] for r in pair_rows
    }
    out_rows = []
    for qid in sorted(rel_by_q):
        remaining = dict(sorted(rel_by_q[qid]))
        selected: list = []
        for t in range(1, k + 1):
            if not remaining:
                break
            best_vid = best_score = None
            for vid, sim in remaining.items():
                if t == 1:
                    score = lam * sim
                else:
                    sims_sel = [
                        psim[(qid, vid, s)]
                        for s in selected
                        if (qid, vid, s) in psim
                    ]
                    msim = max(sims_sel) if sims_sel else 0
                    score = lam * sim - lam1 * msim
                if (
                    best_score is None
                    or score > best_score
                    or (score == best_score and vid < best_vid)
                ):
                    best_vid, best_score = vid, score
            out_rows.append((int(qid), int(best_vid), t, int(best_score)))
            selected.append(best_vid)
            del remaining[best_vid]
    return queries.sparkSession.createDataFrame(
        out_rows or [],
        "q_id long, vec_id long, step long, mmr_x1e12 long",
    )


def kcenter_coreset(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-Center-Greedy coreset selection (Gonzalez 1985; Sener &
    Savarese ICLR'18 for the training-data-selection use): pick the
    smallest-id point, then repeatedly the point FARTHEST from the
    selected set (max-min distance) — the 2-approximation to the
    k-center cover, and the standard diversity-first recipe for
    choosing which documents to label/train on when the budget is k.
    Where MMR diversifies a per-query ranking, this selects a global
    corpus coreset.

    Determinism: distances are ``1e6 - sim_x1e6`` over the registry's
    rounded fixed-point cosine (range [0, 2e6]); every argmax breaks
    ties toward the smaller id; the seed is the smallest id; the loop
    runs exactly k fixed steps — the unrolled-CTE oracle replays every
    pick. The emitted ``mind_x1e6`` is each pick's distance to the
    set selected before it (the coverage radius at that step —
    non-increasing, property-tested); the seed carries the 2e6
    sentinel (max possible distance, "uncovered").

    Scale shape: the classic O(n*k) incremental form — per step ONE
    bounded broadcast of the single new pick onto the candidate set
    (each candidate keeps a running min-distance; no pairwise
    materialization), one deterministic TakeOrdered(1), with
    ``localCheckpoint`` truncating lineage. Candidates never shuffle;
    at 100 TB run it over per-cell IVF representatives the way the
    paper runs it over features.

    Output: (vec_id, step, mind_x1e6) — step in 1..k, the pick order.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cands = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )
    seed = cands.orderBy(F.asc("vec_id")).limit(1).localCheckpoint()
    sel = seed.select(
        "vec_id",
        F.lit(1).cast("long").alias("step"),
        F.lit(2_000_000).cast("long").alias("mind_x1e6"),
    )
    dist_to_pick = (
        F.lit(1_000_000)
        - F.round(cosine("_v", "_pv") * 1e6).cast("long")
    )
    state = (
        cands.crossJoin(
            F.broadcast(
                seed.select(
                    F.col("vec_id").alias("_pid"), F.col("_v").alias("_pv")
                )
            )
        )
        .where(F.col("vec_id") != F.col("_pid"))
        .select("vec_id", "_v", dist_to_pick.alias("_mind"))
        .localCheckpoint()
    )
    for t in range(2, k + 1):
        pick = (
            state.orderBy(F.desc("_mind"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint()
        )
        sel = sel.unionByName(
            pick.select(
                "vec_id",
                F.lit(t).cast("long").alias("step"),
                F.col("_mind").alias("mind_x1e6"),
            )
        )
        state = (
            state.crossJoin(
                F.broadcast(
                    pick.select(
                        F.col("vec_id").alias("_pid"),
                        F.col("_v").alias("_pv"),
                    )
                )
            )
            .where(F.col("vec_id") != F.col("_pid"))
            .select(
                "vec_id",
                "_v",
                F.least(F.col("_mind"), dist_to_pick).alias("_mind"),
            )
            .localCheckpoint()
        )
    return sel
