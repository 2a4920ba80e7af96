"""Skew hardening of the bucket/band equi-joins.

Two distinct mechanisms, matched to how each join actually skews:

* the hyperplane-LSH bucket join carries the embedding payload through
  the shuffle, so a hot bucket is byte-visible to AQE — pin that the
  skew-join split ENGAGES on a pathological hot-bucket corpus
  (``AQEShuffleRead .. skewed``, the runtime re-plan the operator
  docstrings promise);
* the MinHash band join shuffles only (id, band_key) rows whose
  identical keys compress to almost nothing, so byte-based skew
  detection under-fires by construction — there the guard is the
  standard LSH bucket-size cap (drop pathologically common bands),
  pinned separately.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.similarity import (
    LSH_PLANES,
    lsh_similar_pairs,
)

SKEW_CONF = {
    # force the shuffled-join path and make AQE's skew detector fire at
    # test-sized data; at cluster scale the defaults play the same role
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_lsh_bucket_join_splits_skewed_bucket(spark, skew_conf):
    """800 distinct vectors crammed into ONE hyperplane bucket (base
    vector + noise small enough that no projection sign flips — the
    min |plane . base| margin is checked, not assumed) against a
    varied background: the bucket self-join must complete AND the
    executed adaptive plan must show the skewed partition split."""
    base = np.full(64, 0.5)
    margin = np.abs(np.array(LSH_PLANES) @ base).min()
    assert margin >= 1.0  # noise below keeps every hot vector in-bucket
    # per-component noise amplitude 0.0025 -> worst-case projection
    # shift 64 * 0.0025 = 0.16 << margin
    hot = spark.range(800).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.lit(0.5)
            + (((F.col("id") * 31 + j * 17) % 101) - 50).cast("double")
            / 101.0 * 0.005,
        ).alias("embedding"),
    )
    bg = spark.range(800, 2000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: F.when(
                ((F.col("id") * 7 + j * 13) % 5) < 2, F.lit(-1.0)
            ).otherwise(F.lit(1.0)) * ((j + 1.0) / 64.0),
        ).alias("embedding"),
    )
    pairs = lsh_similar_pairs(
        hot.unionByName(bg), threshold_x1e6=999_000
    ).select("v1")
    n = len(pairs.collect())
    # every hot pair is near-identical (cosine ~ 1): all present
    assert n >= 800 * 799 // 2
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]


def test_sampler_two_phase_topk_is_exact_and_partition_local(spark):
    """The samplers' two-phase top-k: a stratum holding ~95% of the
    corpus, spread over many source partitions, must select EXACTLY
    the same rows as a naive single global rank window — and the plan
    must show the partition-local phase (spark_partition_id in the
    first window's keys) so no single task sorts the hot stratum."""
    from pyspark.sql import Window

    from time_series_storage_spark.operators.split import (
        split_bucket_raw,
        stratified_sample,
        weighted_mix,
    )

    docs = (
        spark.range(20_000)
        .repartition(16)  # hot key spread across source partitions
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 == 0, F.lit("rare"))
            .otherwise(F.lit("hot"))
            .alias("src"),
        )
    )
    got = stratified_sample(docs, ["src"], "doc_id", 25)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    assert plan.count("Window") >= 2  # local prune + exact global rank
    # naive reference: one global rank window
    w = Window.partitionBy("src").orderBy(
        split_bucket_raw("doc_id"), F.col("doc_id")
    )
    want = (
        docs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= 25)
        .drop("_r")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # weighted_mix: same equivalence including exact ranks
    mix = weighted_mix(docs, "src", "doc_id", {"hot": 40}, default_quota=7)
    naive = (
        docs.withColumn("mix_rank", F.row_number().over(w).cast("long"))
        .where(
            F.col("mix_rank")
            <= F.when(F.col("src") == "hot", F.lit(40)).otherwise(F.lit(7))
        )
    )
    assert sorted(map(tuple, mix.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_minhash_band_cap_bounds_pathological_bucket(spark):
    """A boilerplate-dominated corpus (400 near-identical docs sharing
    every band) makes the band bucket quadratic; the bucket-size cap
    drops those too-common bands while candidates from normal-sized
    buckets are untouched."""
    from time_series_storage_spark.operators.dedup import (
        hashed_shingle_sets,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.range(430).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 400,
            # 400 copies of the same boilerplate (one band bucket each)
            F.lit("the quick brown fox jumps over the lazy dog again and again"),
        )
        .when(
            F.col("id") < 415,
            # small near-dup family: shared prefix, unique tail
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa tail"),
                F.col("id").cast("string"),
            ),
        )
        .otherwise(  # unique background docs
            F.concat(
                F.lit("unique document number "),
                F.col("id").cast("string"),
                F.lit(" with completely different words entirely"),
            )
        )
        .alias("text"),
    )
    sets = hashed_shingle_sets(docs, "doc_id", "text", k=4)
    sig = minhash_signatures(
        sets.select("doc_id", F.explode("hs_set").alias("hs")), "doc_id"
    ).persist()
    uncapped = lsh_candidate_pairs(sig, "doc_id")
    capped = lsh_candidate_pairs(sig, "doc_id", max_bucket_size=50)
    n_unc = uncapped.count()
    n_cap = capped.count()
    # the boilerplate family alone is 400*399/2 = 79800 quadratic pairs
    assert n_unc >= 79_800
    # the cap removes them; the small near-dup family (15 docs, under
    # the cap) must be fully retained
    assert n_cap < 1_000
    fam = capped.where(
        (F.col("d1") >= 400) & (F.col("d1") < 415)
        & (F.col("d2") >= 400) & (F.col("d2") < 415)
    ).count()
    assert fam == 15 * 14 // 2
    sig.unpersist()


def test_salted_agg_equals_direct_agg(spark):
    """salted_agg must be bit-identical to the direct groupBy on a
    hot-key distribution (one key holding ~90% of rows), for every
    supported aggregate, and its plan must contain the two-stage
    (keys+salt, then keys) aggregate pair."""
    from pyspark.sql import functions as F

    from time_series_storage_spark.operators.parallel import salted_agg

    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") * 13 % 1000 - 500).alias("v"),
    )
    aggs = {
        "n": ("v", "count"),
        "total": ("v", "sum"),
        "lo": ("v", "min"),
        "hi": ("v", "max"),
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(df, ["k"], aggs, salt_buckets=8).collect()
    }
    direct = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").cast("long").alias("n"),
            F.sum("v").cast("long").alias("total"),
            F.min("v").cast("long").alias("lo"),
            F.max("v").cast("long").alias("hi"),
        )
        .collect()
    }
    assert salted == direct and len(direct) == 8
    plan = (
        salted_agg(df, ["k"], aggs, salt_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2  # salted stage + final stage
    assert "_salt" in plan


def test_salted_agg_rejects_unknown_aggregate(spark):
    import pytest

    from time_series_storage_spark.operators.parallel import salted_agg

    df = spark.range(3).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": ("v", "avg")})
