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
    id hash), and one shuffle (the per-stratum rank window). Growing
    the cap later only *adds* rows — every previously kept id stays
    kept, because ranks never reshuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        split_bucket_raw(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def split_bucket_raw(id_col, salt: str = "v1") -> Column:
    """Full-range stable hash (no mod): the per-id sort key that makes
    hash-ordered sampling deterministic."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(F.concat(F.lit(f"{salt}:"), c.cast("string")))


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
    enters the plan as a literal CASE over the key, not a join — the
    whole selection stays one rank window on ``key_col``.

    Output: the selected input rows + ``mix_rank`` (1-based rank within
    the key's hash order).
    """
    from pyspark.sql import Window

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
    w = Window.partitionBy(key_col).orderBy(
        split_bucket_raw(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("mix_rank", F.row_number().over(w).cast("long"))
        .where(F.col("mix_rank") <= quota)
    )
