"""KMV (k-minimum-values) distinct-count sketch — approximate
COUNT(DISTINCT) as a bounded, mergeable, DETERMINISTIC artifact.

Exact distinct counting is the operation that breaks first at corpus
scale: ``COUNT(DISTINCT token)`` shuffles every distinct value, and a
100 TB corpus has billions of them per group. The standard fixes are
probabilistic sketches (HyperLogLog — Spark's
``approx_count_distinct``), but engine-native sketches are *opaque*:
their estimates differ engine to engine and run to run, so they can't
be oracle-gated, and their state can't be re-derived by another
system. KMV is the sketch with none of those costs (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002; the
well-known estimator is ``(k-1) * M / h_k``):

    hash every element into [0, M); keep the k SMALLEST distinct
    hashes; the k-th smallest h_k estimates density k/n ~= h_k/M,
    so n ~= (k-1) * M / h_k (the unbiased form).

Because the "randomness" is an md5 hash, the sketch is a pure function
of the data: the same k minima, the same estimate, in Spark, DuckDB,
or a hand rolled scanner — bit-for-bit. Relative error is
~1/sqrt(k-2) (~13% at k=64); groups with fewer than k distinct
elements are counted EXACTLY (their full hash set fits in the sketch).

Design constants: the hash domain is 48 bits (12 md5 hex chars), not
60 like the dedup shingle hashes, so the exact integer estimator

    est = (k-1) * (M div h_k)  +  ((k-1) * (M mod h_k)) div h_k

never leaves BIGINT range for any h_k >= 1 and k <= 255 (every term is
< 64 * 2^48 = 2^54): no doubles anywhere, no overflow cliff, no
engine-specific decimal semantics. The 48-bit birthday cost is
irrelevant at sketch accuracy (collisions fold into the ~13% band, and
identically in every engine).

Scale shape: per-group k-minima via the same EXACT two-phase selection
as split.py's samplers — rank within (group, source-partition), keep k,
re-rank the survivors — so a group holding half the corpus never sorts
in one task; the sketch state that crosses the wire is k longs per
group per partition, the whole point of sketching. Merging two sketches
is just "union the minima, keep the k smallest" — re-running the same
selection, which is how the estimates stay exact under re-partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

KMV_BITS = 48
KMV_M = 1 << KMV_BITS
DEFAULT_K = 64


def kmv_hash(col) -> Column:
    """Uniform 48-bit element hash: first 12 md5 hex chars as long.
    (12, not the repo's usual 15: see the overflow analysis above.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def kmv_minima(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The sketch itself: the k smallest distinct element hashes per
    key, ranked. Output: key_cols + ``h`` (long) + ``_rank``.

    Exact two-phase k-min (split.py:_topk_per_key's argument): a key's
    global k minima are contained in the union of its per-partition k
    minima, so phase 1 bounds every sort by partition size and phase 2
    ranks the ~k x partitions survivors exactly.
    """
    if not 2 < k <= 255:
        raise ValueError(f"k must be in (2, 255], got {k}")
    hashed = elements.select(
        *key_cols, kmv_hash(elem_col).alias("h")
    ).dropDuplicates([*key_cols, "h"])
    w_local = Window.partitionBy(
        *key_cols, F.spark_partition_id()
    ).orderBy("h")
    survivors = (
        hashed.withColumn("_lrank", F.row_number().over(w_local))
        .where(F.col("_lrank") <= k)
        .drop("_lrank")
    )
    w_global = Window.partitionBy(*key_cols).orderBy("h")
    return survivors.withColumn(
        "_rank", F.row_number().over(w_global).cast("long")
    ).where(F.col("_rank") <= k)


def kmv_estimate(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-key distinct estimate from the KMV sketch.

    Output: key_cols + ``n_mins`` (sketch fill, long) + ``kth_min``
    (long) + ``est_distinct`` (long) — EXACT count when the key has
    fewer than k distinct elements (``n_mins < k``), the integer KMV
    estimator otherwise. All arithmetic BIGINT; reproducible anywhere.
    """
    minima = kmv_minima(elements, key_cols, elem_col, k)
    return kmv_aggregate(minima, key_cols, k)


def kmv_aggregate(
    minima: DataFrame, key_cols: Sequence[str], k: int
) -> DataFrame:
    """Fold a per-key minima frame (key_cols + ``h``, <= k distinct
    rows per key) into the estimate row — the estimator half of
    :func:`kmv_estimate`, factored so artifacts that PERSIST minima
    (the incremental :class:`~.sketch_store.KmvSketchStore`) fold
    through the identical arithmetic as the in-plan sketch."""
    agg = minima.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_mins"),
        F.max("h").cast("long").alias("kth_min"),
    )
    # `div` is exact BIGINT floor-division on both engines (Spark div,
    # DuckDB //) — no double quotient ever exists, honoring the
    # all-integer contract above
    est = F.expr(
        f"{k - 1}L * ({KMV_M}L div kth_min)"
        f" + ({k - 1}L * ({KMV_M}L % kth_min)) div kth_min"
    )
    return agg.withColumn(
        "est_distinct",
        F.when(F.col("n_mins") < k, F.col("n_mins"))
        .otherwise(est)
        .cast("long"),
    )


# -- equi-width histogram quantile sketch ------------------------------------

def histogram_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    val_col: str,
    lo: int,
    hi: int,
    n_buckets: int = 64,
    percents: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Approximate per-group quantiles from an EQUI-WIDTH histogram —
    the mergeable, bounded-state alternative to exact rank selection
    (`analytics.grouped_percentiles` sorts each group; this never
    sorts anything).

    The sketch is ``n_buckets`` counts per group over the fixed domain
    ``[lo, hi)`` (values clamp to the edge buckets, so outliers land
    in a bucket instead of poisoning the state). The p-th quantile
    estimate is classic within-bucket linear interpolation, in EXACT
    integer arithmetic: with target rank ``t = ceil(p * n / 100)``,
    the first bucket whose cumulative count reaches ``t`` contributes

        est = bucket_lo + floor((t - cum_prev) * width / bucket_n)

    — deterministic in any engine (no float division; width and
    counts are longs). Error is bounded by one bucket width, the
    standard histogram-sketch contract; unlike t-digest/KLL there is
    no randomized compaction, which is what keeps it oracle-gateable.

    Scale shape: ONE partial-aggregated groupBy builds every group's
    histogram (the map-side combine reduces each task to <= n_buckets
    rows per group — the sketch property); the quantile extraction
    runs over (groups x buckets) rows, already tiny, with one
    cumulative window. Merging two histograms is adding counts —
    trivially incremental for streaming or partitioned builds.

    Output: one row per group: keys + n_rows + q<P> for each P.
    """
    width = (hi - lo) // n_buckets
    if width <= 0 or (hi - lo) % n_buckets != 0:
        raise ValueError(
            f"domain [{lo}, {hi}) must split evenly into {n_buckets} buckets"
        )
    v = F.col(val_col).cast("long")
    clamped = F.greatest(
        F.lit(lo), F.least(v, F.lit(hi - 1))
    )
    bucket = F.floor((clamped - lo) / width).cast("long")
    hist = (
        df.select(*keys, bucket.alias("_b"))
        .groupBy(*keys, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        "_b",
        "_n",
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_all).alias("_tot"),
    )
    from .analytics import ceil_div, floor_div

    aggs = [F.max("_tot").cast("long").alias("n_rows")]
    for p in percents:
        # rank/interpolation in EXACT BIGINT arithmetic (ceil_div /
        # floor_div) — double-quotient ceil/floor rounds once group
        # counts pass 2^53, and the sketch's pitch is engine-exactness
        t = ceil_div(F.col("_tot") * p, F.lit(100))
        # the first bucket reaching rank t; interpolate inside it
        est = (
            F.lit(lo)
            + F.col("_b") * width
            + floor_div(
                (t - (F.col("_cum") - F.col("_n"))) * width, F.col("_n")
            )
        )
        hit = (F.col("_cum") >= t) & ((F.col("_cum") - F.col("_n")) < t)
        aggs.append(
            F.max(F.when(hit, est)).cast("long").alias(f"q{p}")
        )
    return cum.groupBy(*keys).agg(*aggs)


def kmv_rolling_estimate(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
    window_buckets: int = 7,
    k: int = DEFAULT_K,
) -> DataFrame:
    """ROLLING distinct estimate — KMV sketch MERGE inside the plan:
    per (key, time bucket), the distinct-element estimate over the
    trailing ``window_buckets`` buckets (e.g. rolling weekly active
    users per key from daily sketches).

    This is the query exact distinct cannot serve at scale: a rolling
    COUNT(DISTINCT) re-scans every window, while the sketch form
    builds each bucket's k-minima ONCE and merges windows by set
    algebra — and because KMV merge is "union the minima, keep the k
    smallest", the merge is a codegen array expression
    (flatten -> array_distinct -> array_sort -> slice k) over a
    range-frame ``collect_list``, not a shuffle. Missing buckets cost
    nothing (range frame over the bucket index, not rows). Estimates
    are EXACT below k distinct and the standard integer KMV estimator
    above it; everything deterministic and oracle-checkable.

    Scale shape: the per-bucket sketch build is :func:`kmv_minima`'s
    two-phase selection (nothing sorts a hot key's full stream); what
    crosses the wire afterward is <= k longs per (key, bucket); the
    rolling merge is one window pass whose rows are already
    sketch-sized. Output: key_cols + ``bucket_idx`` (long,
    epoch-seconds div bucket_seconds) + ``n_mins``/``kth_min``/
    ``est_distinct`` (long).
    """
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1, got {window_buckets}")
    bidx = F.floor(
        F.unix_timestamp(F.col(ts_col)) / bucket_seconds
    ).cast("long")
    bucketed = elements.select(
        *key_cols, bidx.alias("bucket_idx"), F.col(elem_col).alias("_e")
    )
    minima = kmv_minima(bucketed, [*key_cols, "bucket_idx"], "_e", k)
    per_bucket = minima.groupBy(*key_cols, "bucket_idx").agg(
        F.array_sort(F.collect_list("h")).alias("_mins")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_idx")
        .rangeBetween(-(window_buckets - 1), 0)
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_mins").over(w)))),
        1,
        k,
    )
    rolled = per_bucket.select(
        *key_cols,
        F.col("bucket_idx").cast("long").alias("bucket_idx"),
        F.size(merged).cast("long").alias("n_mins"),
        F.array_max(merged).cast("long").alias("kth_min"),
    )
    est = F.expr(
        f"{k - 1}L * ({KMV_M}L div kth_min)"
        f" + ({k - 1}L * ({KMV_M}L % kth_min)) div kth_min"
    )
    return rolled.withColumn(
        "est_distinct",
        F.when(F.col("n_mins") < k, F.col("n_mins")).otherwise(est)
        .cast("long"),
    )
