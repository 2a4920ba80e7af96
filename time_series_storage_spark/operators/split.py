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
