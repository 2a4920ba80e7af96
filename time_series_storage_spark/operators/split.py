"""Deterministic dataset splitting for training pipelines.

Train/val/test assignment at 100 TB must be (a) a pure projection — no
shuffle, no sampling state, no driver randomness — and (b) stable
across reruns, engines and partitionings, so the same document lands in
the same split forever. Both fall out of hashing the stable id: the
split is ``md5(salt:id) mod 100`` bucketed into weighted ranges, the
same portable 60-bit md5 arithmetic the dedup operators use
(reproducible in any SQL engine bit-for-bit).

Changing ``salt`` re-deals the assignment wholesale; changing weights
only moves boundary buckets (ids keep their bucket, so growing the
train share never leaks test items into train retroactively beyond the
moved boundary range — the standard hash-split property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_long

DEFAULT_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("train", 98),
    ("val", 1),
    ("test", 1),
)


def split_bucket(id_col, salt: str = "v1") -> Column:
    """Stable bucket in [0, 100): md5('<salt>:<id>') mod 100."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(
        F.concat(F.lit(f"{salt}:"), c.cast("string"))
    ) % 100


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: tuple[tuple[str, int], ...] = DEFAULT_WEIGHTS,
    salt: str = "v1",
) -> DataFrame:
    """Assign each row a split label by hashed-id bucket.

    Output: input columns + ``bucket`` (0-99) + ``split``. Weights must
    sum to 100; ranges are cumulative in the given order
    (train=[0,98), val=[98,99), test=[99,100) by default).
    """
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = split_bucket(id_col, salt)
    expr = None
    lo = 0
    for name, w in weights:
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo += w
    return df.select(
        "*", bucket.cast("long").alias("bucket"), expr.alias("split")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep at most
    ``n_per_stratum`` rows per stratum, chosen by hashed-id order.

    The standard corpus-balancing step (cap each language / source /
    domain) with the properties sampling at 100 TB needs: no RNG state,
    stable across reruns and partitionings (the "random" order IS the
    id hash), and no hot-key bottleneck — selection runs as an exact
    two-phase top-k (:func:`_topk_per_key`), so a stratum holding half
    the corpus never funnels into one task. Growing the cap later only
    *adds* rows — every previously kept id stays kept, because ranks
    never reshuffle.
    """
    return _topk_per_key(
        df, list(strata_cols), id_col, F.lit(int(n_per_stratum)), salt
    ).drop("_rank")


def split_bucket_raw(id_col, salt: str = "v1") -> Column:
    """Full-range stable hash (no mod): the per-id sort key that makes
    hash-ordered sampling deterministic."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(F.concat(F.lit(f"{salt}:"), c.cast("string")))


def _topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    cap: Column,
    salt: str,
) -> DataFrame:
    """EXACT hot-key-safe top-``cap`` per key by hashed-id order,
    ranked in ``_rank``. ``cap`` is a per-row column (constant for
    :func:`stratified_sample`, a per-key CASE for
    :func:`weighted_mix`).

    A single rank window per key sorts each key's entire row set in one
    task — a key holding half a 100 TB corpus is a straggler by
    construction. Standard exact two-phase top-k instead:

    1. rank within (key, source-partition) — the hot key's rows are
       spread across its source partitions, so every sort is bounded by
       partition size — and keep each group's local top-``cap``. The
       global top-``cap`` of a key is contained in the union of its
       per-partition top-``cap``s (any row it excludes is beaten
       ``cap`` times within one partition alone).
    2. exact rank window over the surviving ~``cap x partitions`` rows
       per key — now small by construction.

    Output is deterministic and identical to the naive single window
    (phase 2 recomputes exact global ranks; ``spark_partition_id`` only
    influences which *non-selected* rows were pruned early).
    """
    from pyspark.sql import Window

    order = [split_bucket_raw(id_col, salt), F.col(id_col)]
    w_local = Window.partitionBy(
        *key_cols, F.spark_partition_id()
    ).orderBy(*order)
    survivors = (
        df.withColumn("_lrank", F.row_number().over(w_local))
        .where(F.col("_lrank") <= cap)
        .drop("_lrank")
    )
    w_global = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        survivors.withColumn(
            "_rank", F.row_number().over(w_global).cast("long")
        )
        .where(F.col("_rank") <= cap)
    )


def weighted_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic data-mixture selection: keep at most ``quotas[k]``
    rows per ``key_col`` value (``default_quota`` for unlisted keys) —
    the per-source mixture-weight step of a training-data pipeline
    (up-weight curated sources, cap crawl dumps, drop the rest).

    Same determinism contract as :func:`stratified_sample` (the
    "random" order is the id hash, so reruns, engines and
    partitionings pick identical rows, and raising a quota only adds
    rows), generalized from one global cap to a per-key quota map.
    The quota map is by construction small (one entry per source) and
    enters the plan as a literal CASE over the key, not a join; the
    selection itself is the exact two-phase top-k
    (:func:`_topk_per_key`), so an up-weighted crawl dump holding most
    of the corpus never sorts in a single task.

    Output: the selected input rows + ``mix_rank`` (1-based rank within
    the key's hash order).
    """
    quota = None
    for k, n in sorted(quotas.items()):
        cond = F.col(key_col) == F.lit(k)
        quota = (
            F.when(cond, F.lit(int(n)))
            if quota is None
            else quota.when(cond, F.lit(int(n)))
        )
    quota = (
        F.lit(int(default_quota))
        if quota is None
        else quota.otherwise(F.lit(int(default_quota)))
    )
    return _topk_per_key(
        df, [key_col], id_col, quota, salt
    ).withColumnRenamed("_rank", "mix_rank")


def temperature_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    total_target: int,
    temperature: int = 2,
    salt: str = "v1",
) -> DataFrame:
    """Temperature-scaled mixture sampling: allocate a ``total_target``
    budget across ``key_col`` groups proportionally to
    ``count ** (1/T)`` — the multilingual/source rebalancing rule of
    Arivazhagan et al. 2019 / UniMax (Chung et al. 2023): T=1 keeps
    the natural distribution, larger T flattens it toward uniform so
    head sources stop drowning the tail. Unlike :func:`weighted_mix`
    the quotas are DERIVED FROM THE DATA, not a static map.

    Exactness contract: T must be 1, 2 or 4 — those tempered weights
    are IEEE-exact in any engine (identity / one / two correctly-
    rounded ``sqrt`` calls, scaled to integer weights), so allocations
    are pure integer arithmetic: ``alloc_g = (total_target * w_g) //
    sum(w)``  with ``w_g = floor(count_g^(1/T) * 1e6)``. A general
    real temperature needs ``pow``, whose rounding is libm-dependent —
    rather than silently losing the oracle contract, unsupported T
    raises.

    Plan shape: the per-key count is one partial-aggregated exchange;
    the weight total is a ONE-ROW aggregate broadcast back onto the
    (small, one-row-per-source) weight table; the alloc table then
    broadcast-joins onto the corpus scan, and the selection is the
    exact two-phase hash-ordered top-k (:func:`_topk_per_key`) — no
    full-corpus sort, no driver collect. A group whose allocation
    exceeds its row count simply yields every row — UniMax's
    single-epoch cap falls out of the selection for free
    (property-pinned in tests).

    Output: selected rows + ``mix_rank`` (hash-order rank within the
    key) + ``alloc`` (the key's computed quota).
    """
    if temperature not in (1, 2, 4):
        raise ValueError(
            f"temperature_mix: temperature={temperature!r} is not "
            "cross-engine exact; supported temperatures are 1, 2 and 4 "
            "(identity or correctly-rounded sqrt chains)"
        )
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    if temperature == 1:
        w = F.col("_n") * F.lit(1_000_000)
    elif temperature == 2:
        w = F.floor(F.sqrt(F.col("_n")) * F.lit(1e6)).cast("long")
    else:
        w = F.floor(F.sqrt(F.sqrt(F.col("_n"))) * F.lit(1e6)).cast("long")
    from .analytics import floor_div

    weights = counts.select(F.col(key_col), w.alias("_w"))
    total = weights.agg(F.sum("_w").alias("_tw"))
    alloc = weights.crossJoin(F.broadcast(total)).select(
        F.col(key_col),
        floor_div(F.lit(int(total_target)) * F.col("_w"), F.col("_tw"))
        .cast("long")
        .alias("alloc"),
    )
    capped = df.join(F.broadcast(alloc), key_col)
    return (
        _topk_per_key(capped, [key_col], id_col, F.col("alloc"), salt)
        .withColumnRenamed("_rank", "mix_rank")
    )


def waterfill_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    total_budget: int,
    salt: str = "v1",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023) in closed form —
    the published successor to temperature sampling: give every key an
    EQUAL share of the ``total_budget``, capped at what the key
    actually has, redistributing what small keys can't use to the
    large ones (water-filling). Equivalent to the paper's
    iterate-smallest-first loop, computed without iteration: with
    sizes sorted ascending, k = the largest prefix whose keys fit
    entirely within an equal split (``prefix_{<k} + (G-k+1) * n_k <=
    B``); those keys take all their rows, the rest take the floor-
    equal share of the remaining budget, with the floor REMAINDER
    going to the last ``r`` keys in sort order — exactly where the
    iterative loop's per-step floor divisions concentrate it, so the
    closed form reproduces the loop bit-for-bit (property-pinned
    against the loop across budgets). All integer arithmetic.

    Plan shape: the size table is one row per key — the sort window
    over it is a deliberately single-partition frame over G dimension
    rows (never the corpus); the resulting alloc table broadcast-joins
    onto the scan and selection is the exact two-phase hash-ordered
    top-k. Undershoot from the floor division is documented behavior
    (same as :func:`temperature_mix`).

    Output: selected rows + ``mix_rank`` + ``alloc``.
    """
    from pyspark.sql import Window

    from .analytics import floor_div

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    wo = Window.orderBy(F.col("_n"), F.col(key_col))
    wall = Window.partitionBy()
    sized = counts.select(
        F.col(key_col),
        "_n",
        (F.sum("_n").over(wo) - F.col("_n")).alias("_prefix"),
        F.row_number().over(wo).alias("_i"),
        F.count(F.lit(1)).over(wall).alias("_g"),
        F.sum("_n").over(wo).alias("_cum"),
    )
    b = F.lit(int(total_budget))
    fits = sized.withColumn(
        "_fits",
        (F.col("_prefix") + (F.col("_g") - F.col("_i") + 1) * F.col("_n"))
        <= b,
    )
    # k = last ascending-sorted key whose full size fits an equal
    # split; prefix_k = rows those keys consume. One tiny aggregate.
    krow = fits.agg(
        F.coalesce(
            F.max(F.when(F.col("_fits"), F.col("_i"))), F.lit(0)
        ).alias("_k"),
        F.coalesce(
            F.max(F.when(F.col("_fits"), F.col("_cum"))), F.lit(0)
        ).alias("_prefix_k"),
    )
    rem = b - F.col("_prefix_k")
    m = F.col("_g") - F.col("_k")
    base = floor_div(rem, m)
    leftover = rem - base * m  # in [0, m): goes to the last keys
    alloc = fits.crossJoin(F.broadcast(krow)).select(
        F.col(key_col),
        F.when(F.col("_i") <= F.col("_k"), F.col("_n"))
        .otherwise(
            base
            + F.when(F.col("_i") > F.col("_g") - leftover, F.lit(1))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc"),
    )
    capped = df.join(F.broadcast(alloc), key_col)
    return _topk_per_key(
        capped, [key_col], id_col, F.col("alloc"), salt
    ).withColumnRenamed("_rank", "mix_rank")


def _tempered_token_quota(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    total_budget: int,
    temperature: int,
    ctx: str,
) -> DataFrame:
    """Shared tempered-TOKEN quota table of the token samplers
    (:func:`token_budget_mix`, :func:`epochs_plan`): one row per key
    with (key, n_docs, n_tokens, quota) where ``quota =
    (total_budget * w) // sum(w)``, ``w = floor(tokens^(1/T) * 1e6)``.
    T restricted to {1, 2, 4} — the exactness contract of
    :func:`temperature_mix` (identity / correctly-rounded sqrt
    chains); anything else raises loudly naming the caller. One
    partial-aggregated exchange + a one-row broadcast total."""
    if temperature not in (1, 2, 4):
        raise ValueError(
            f"{ctx}: temperature={temperature!r} is not cross-engine "
            "exact; supported temperatures are 1, 2 and 4 (identity "
            "or correctly-rounded sqrt chains)"
        )
    from .analytics import floor_div

    toks = F.col(tokens_col).cast("long")
    totals = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).alias("_tok"),
    )
    if temperature == 1:
        w = F.col("_tok") * F.lit(1_000_000)
    elif temperature == 2:
        w = F.floor(F.sqrt(F.col("_tok")) * F.lit(1e6)).cast("long")
    else:
        w = (
            F.floor(F.sqrt(F.sqrt(F.col("_tok"))) * F.lit(1e6))
            .cast("long")
        )
    weights = totals.select(
        F.col(key_col), "n_docs", F.col("_tok"), w.alias("_w")
    )
    total = weights.agg(F.sum("_w").alias("_tw"))
    return weights.crossJoin(F.broadcast(total)).select(
        F.col(key_col),
        "n_docs",
        F.col("_tok").cast("long").alias("n_tokens"),
        floor_div(F.lit(int(total_budget)) * F.col("_w"), F.col("_tw"))
        .cast("long")
        .alias("quota"),
    )


def token_budget_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    tokens_col: str,
    total_budget: int,
    temperature: int = 2,
    salt: str = "v1",
) -> DataFrame:
    """TOKEN-budgeted mixture sampling: allocate a ``total_budget``
    measured in TOKENS (not documents) across ``key_col`` groups
    proportionally to ``group_tokens ** (1/T)``, then admit each
    group's documents in derandomized hash order until the running
    token sum crosses the group's quota. This is what real
    training-data pipelines allocate by — a source of long documents
    must not get the same document count as a source of tweets
    (the token-level reading of the UniMax / temperature-sampling
    rules :func:`temperature_mix` applies to document counts).

    Exactness contract: same as :func:`temperature_mix` — T in
    {1, 2, 4} only (identity or correctly-rounded sqrt chains over
    integer token sums, scaled by 1e6), so the per-key quota is pure
    integer arithmetic: ``quota_g = (total_budget * w_g) // sum(w)``
    with ``w_g = floor(tokens_g^(1/T) * 1e6)``. Admission is the
    greedy prefix rule: a document enters iff the token sum of the
    documents BEFORE it (exclusive prefix in hash order) is still
    below the quota — so the boundary document that crosses the
    quota is admitted and every key with a positive quota yields at
    least one document (the diversity guarantee the cluster sampler's
    ``max(1, ...)`` floor encodes; here it falls out of the rule).

    Plan shape: per-key token totals are one partial-aggregated
    exchange; the quota table (one row per source) broadcast-joins
    onto the scan. The prefix-sum admission is EXACT TWO-PHASE like
    :func:`_topk_per_key` — a naive ``sum() OVER (PARTITION BY key
    ORDER BY hash)`` sorts a whole source in one task, a straggler by
    construction when one crawl dump holds most of the corpus.
    Instead: (1) a local cumulative sum within (key,
    source-partition) discards every row whose LOCAL exclusive
    prefix already reaches the quota — sound because the global
    exclusive prefix of a row is >= its local one (the global order
    interleaves other partitions' rows, never removes local
    predecessors), and complete for the admitted set because every
    hash-order predecessor of an admitted row is itself admitted
    (prefix sums are monotone, tokens are positive), so no admitted
    row's prefix loses a contribution to the pruning; (2) the exact
    global rank + cumulative sum runs over the survivors —
    ~quota/min_tokens rows per key, bounded by construction.
    Phase-2 output is bit-identical to the naive single window.

    Output: the admitted rows + ``mix_rank`` (1-based hash-order rank
    within the key), ``cum_tokens`` (inclusive running token sum —
    the quota-fill audit column), ``quota`` (the key's token quota).
    """
    quota = _tempered_token_quota(
        df, key_col, tokens_col, total_budget, temperature,
        ctx="token_budget_mix",
    )
    capped = df.join(F.broadcast(quota.select(key_col, "quota")), key_col)
    return _prefix_admit(capped, key_col, id_col, tokens_col, "quota", salt)


def _prefix_admit(
    capped: DataFrame,
    key_col: str,
    id_col: str,
    tokens_col: str,
    quota_col: str,
    salt: str,
) -> DataFrame:
    """Shared EXACT TWO-PHASE prefix admission of the token samplers:
    ``capped`` already carries the per-row token quota in
    ``quota_col``; admit rows in (salted-hash, id) order while the
    EXCLUSIVE token prefix is below the quota (boundary row admitted).
    Phase 1 prunes on the per-(key, input-partition) local prefix —
    sound because the global prefix dominates the local one, complete
    because every hash-order predecessor of an admitted row is itself
    admitted; phase 2 computes the exact global rank + running sum
    over the bounded survivors, bit-identical to the naive single
    window. Adds ``mix_rank`` and ``cum_tokens``."""
    from pyspark.sql import Window

    toks = F.col(tokens_col).cast("long")
    order = [split_bucket_raw(id_col, salt), F.col(id_col)]
    w_local = (
        Window.partitionBy(key_col, F.spark_partition_id())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors = (
        capped.withColumn("_lcum", F.sum(toks).over(w_local))
        .where(F.col("_lcum") - toks < F.col(quota_col))
        .drop("_lcum")
    )
    w_rank = Window.partitionBy(key_col).orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        survivors.withColumn(
            "mix_rank", F.row_number().over(w_rank).cast("long")
        )
        .withColumn("cum_tokens", F.sum(toks).over(w_cum).cast("long"))
        .where(F.col("cum_tokens") - toks < F.col(quota_col))
    )


def token_waterfill_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    tokens_col: str,
    total_budget: int,
    salt: str = "v1",
) -> DataFrame:
    """UniMax water-filling (Chung et al. 2023) in the paper's OWN
    budget unit — TOKENS: every key gets an equal share of the token
    budget capped at its actual token mass, with what small keys
    can't use redistributed to the large ones. :func:`waterfill_mix`
    is this rule over document counts; real UniMax allocates token
    budgets, and this operator is that — the same closed form
    (sorted-prefix threshold k over the G-row token-mass table, floor
    remainder concentrated on the last keys in sort order, pure
    integer arithmetic) evaluated on per-key TOKEN sums, followed by
    the boundary-inclusive hash-order prefix admission
    (:func:`_prefix_admit`) instead of a row-count top-k: a key's
    documents enter until their token prefix covers its allocation.

    A fully-fitting key (alloc = its whole mass) admits every
    document exactly; a capped key overshoots its allocation by at
    most one boundary document (the :func:`token_budget_mix`
    convention, so the two allocation rules compose with the same
    downstream packing/ordering steps).

    Output: admitted rows + ``mix_rank`` + ``cum_tokens`` + ``alloc``
    (the key's token allocation)."""
    from pyspark.sql import Window

    from .analytics import floor_div

    toks = F.col(tokens_col).cast("long")
    counts = df.groupBy(key_col).agg(F.sum(toks).alias("_n"))
    wo = Window.orderBy(F.col("_n"), F.col(key_col))
    wall = Window.partitionBy()
    sized = counts.select(
        F.col(key_col),
        "_n",
        (F.sum("_n").over(wo) - F.col("_n")).alias("_prefix"),
        F.row_number().over(wo).alias("_i"),
        F.count(F.lit(1)).over(wall).alias("_g"),
        F.sum("_n").over(wo).alias("_cum"),
    )
    b = F.lit(int(total_budget))
    fits = sized.withColumn(
        "_fits",
        (F.col("_prefix") + (F.col("_g") - F.col("_i") + 1) * F.col("_n"))
        <= b,
    )
    krow = fits.agg(
        F.coalesce(
            F.max(F.when(F.col("_fits"), F.col("_i"))), F.lit(0)
        ).alias("_k"),
        F.coalesce(
            F.max(F.when(F.col("_fits"), F.col("_cum"))), F.lit(0)
        ).alias("_prefix_k"),
    )
    rem = b - F.col("_prefix_k")
    m = F.col("_g") - F.col("_k")
    base = floor_div(rem, m)
    leftover = rem - base * m
    alloc = fits.crossJoin(F.broadcast(krow)).select(
        F.col(key_col),
        F.when(F.col("_i") <= F.col("_k"), F.col("_n"))
        .otherwise(
            base
            + F.when(F.col("_i") > F.col("_g") - leftover, F.lit(1))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc"),
    )
    capped = df.join(F.broadcast(alloc), key_col)
    return _prefix_admit(
        capped, key_col, id_col, tokens_col, "alloc", salt
    )


def epochs_plan(
    df: DataFrame,
    key_col: str,
    id_col: str,
    tokens_col: str,
    total_budget: int,
    temperature: int = 2,
    salt: str = "v1",
) -> DataFrame:
    """Per-key EPOCHS TABLE when the token quota EXCEEDS what a key
    has — the other half of token budgeting (:func:`token_budget_mix`
    handles quota < mass; this handles quota >= mass, where a pipeline
    REPLICATES the source). This is the 'epochs per source' table
    LLM data cards publish: a quota of 3.4x a source's token mass
    means 3 full passes plus a partial epoch holding the first docs
    (in the same derandomized hash order the mixer admits by) whose
    token prefix covers the remainder.

    All integer: ``epochs_full = quota // n_tokens``, ``rem = quota -
    epochs_full * n_tokens``; the partial epoch admits by the
    boundary-inclusive prefix rule (first doc crossing ``rem`` is in,
    so ``served_tokens = epochs_full * n_tokens + partial_tokens >=
    quota`` whenever ``rem > 0`` — replication never undershoots by
    more than the floor division; ``rem = 0`` serves exactly).

    Plan shape: the quota table is one row per key
    (:func:`_tempered_token_quota`); the partial-epoch admission is
    the same exact two-phase prefix prune as the mixer (survivors
    bounded by ~rem/min_tokens per key), and the final output is one
    aggregated row per key: (key, n_docs, n_tokens, quota,
    epochs_full, partial_docs, partial_tokens, served_tokens).
    """
    from pyspark.sql import Window

    from .analytics import floor_div

    quota = _tempered_token_quota(
        df, key_col, tokens_col, total_budget, temperature,
        ctx="epochs_plan",
    ).select(
        F.col(key_col),
        "n_docs",
        "n_tokens",
        "quota",
        floor_div(F.col("quota"), F.col("n_tokens"))
        .cast("long")
        .alias("epochs_full"),
        (
            F.col("quota")
            - floor_div(F.col("quota"), F.col("n_tokens"))
            * F.col("n_tokens")
        ).cast("long").alias("_rem"),
    )
    toks = F.col(tokens_col).cast("long")
    capped = df.join(
        F.broadcast(quota.select(key_col, "_rem")), key_col
    )
    order = [split_bucket_raw(id_col, salt), F.col(id_col)]
    w_local = (
        Window.partitionBy(key_col, F.spark_partition_id())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors = (
        capped.withColumn("_lcum", F.sum(toks).over(w_local))
        .where(F.col("_lcum") - toks < F.col("_rem"))
        .drop("_lcum")
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        survivors.withColumn("_cum", F.sum(toks).over(w_cum))
        .where(F.col("_cum") - toks < F.col("_rem"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("partial_docs"),
            F.sum(toks).cast("long").alias("partial_tokens"),
        )
    )
    return (
        quota.join(partial, key_col, "left")
        .select(
            F.col(key_col),
            "n_docs",
            "n_tokens",
            "quota",
            "epochs_full",
            F.coalesce("partial_docs", F.lit(0))
            .cast("long")
            .alias("partial_docs"),
            F.coalesce("partial_tokens", F.lit(0))
            .cast("long")
            .alias("partial_tokens"),
            (
                F.col("epochs_full") * F.col("n_tokens")
                + F.coalesce("partial_tokens", F.lit(0))
            ).cast("long").alias("served_tokens"),
        )
    )


def checked_weight(w_col, max_weight: int, ctx: str):
    """Shared in-plan weight guard of the replication-reduction
    samplers (weighted_reservoir here; WeightedReservoirStore in
    reservoir_store.py): integer weight in [1, max_weight] or a loud
    raise_error naming the caller — ONE definition so the bound
    semantics and message can never drift between the batch and store
    twins (r11 review finding)."""
    w = (F.col(w_col) if isinstance(w_col, str) else w_col).cast("long")
    return F.when((w >= 1) & (w <= max_weight), w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{ctx}: weight must be in [1, {max_weight}], got "),
                F.coalesce(w.cast("string"), F.lit("NULL")),
            )
        )
    )


def copy_rank(id_str, j, salt: str = "v1"):
    """Shared rank of one replication copy: md5('salt:id:j') as the
    portable 60-bit integer — the formula BOTH weighted samplers and
    every SQL oracle mirror; a salt-format change in one place is a
    silent exactness break, hence one definition."""
    i = F.col(id_str) if isinstance(id_str, str) else id_str
    jj = F.col(j) if isinstance(j, str) else j
    return md5_long(
        F.concat(
            F.lit(f"{salt}:"), i.cast("string"),
            F.lit(":"), jj.cast("string"),
        )
    )


def weighted_reservoir(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    max_weight: int = 64,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic WEIGHTED reservoir: per stratum, a fixed-k sample
    where an item's inclusion odds scale with its integer weight — by
    the classic replication reduction (Chao 1982's integer-weight
    special case; the exact-arithmetic sibling of
    Efraimidis-Spirakis A-ES, whose u^(1/w) keys need transcendental
    arithmetic no hash-gate oracle can replay): item i with weight w_i
    enters as w_i salted copies (hash(salt:id:j), j in 1..w_i), its
    effective rank is the MIN copy hash, and the reservoir is the
    bottom-k items by (rank, id). The sample is EXACTLY the uniform
    bottom-k over the weight-expanded multiset, deduped to items — a
    pure function of the (id, weight) set, so it shares every
    reservoir property the uniform sampler has: deterministic,
    order-free, mergeable, and recomputable in SQL.

    Weights must be integers in [1, max_weight] — the expansion costs
    O(w) rows per item (generator explode, no shuffle until the final
    per-key selection), so the cap is validated IN-PLAN and a weight
    outside it fails the job loudly rather than silently exploding
    cost or silently truncating odds.

    Output: strata_cols + (id_col, rank, smp_rank) — smp_rank in 1..k
    by (rank, id)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    checked = checked_weight(weight_col, max_weight, "weighted_reservoir")
    copies = df.select(
        *strata_cols,
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), checked)).alias("_j"),
    ).select(
        *strata_cols,
        id_col,
        copy_rank(id_col, "_j", salt).alias("_r"),
    )
    ranks = copies.groupBy(*strata_cols, id_col).agg(
        F.min("_r").alias("rank")
    )
    win = Window.partitionBy(*strata_cols).orderBy("rank", id_col)
    return (
        ranks.withColumn("smp_rank", F.row_number().over(win).cast("long"))
        .where(F.col("smp_rank") <= k)
        .select(*strata_cols, id_col, F.col("rank"), "smp_rank")
    )
