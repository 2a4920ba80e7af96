"""Streaming document scoring — benchmark decontamination on arriving
data.

Decontamination is the pipeline stage most naturally run on a stream:
the evaluation set is FIXED while training documents arrive
continuously, so the right plan shape is a stream-static join against
a benchmark artifact, not a batch replay.

The stateless trick: the batch operator's per-document aggregate
(explode shingles -> probe -> groupBy doc) would be a stateful
streaming aggregation needing watermarks and update mode. But every
shingle of a document lives in that document's single row, so the
whole probe collapses into per-row set algebra: build the row's
distinct shingle-hash set (``operators.dedup.shingle_hash_set``, the
same expression the batch path uses), attach the benchmark's distinct
hash set — ONE static row, broadcast — with a stream-static cross
join, and count hits with ``array_intersect``. No shuffle, no state,
no watermark; append mode works and results are row-for-row identical
to the batch operator (tests/test_streaming.py pins convergence).

At scale the benchmark side stays what it is in batch: eval sets are
fixed-size while the corpus grows, so the single benchmark-set row is
a few thousand longs however large the stream gets. The static side is
re-resolved per micro-batch by Structured Streaming; persist it (the
caller owns its lifecycle) to avoid re-reading the benchmark files
every trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import shingle_hash_set


def streaming_ngram_contamination(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold_x1000: int = 500,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.ngram_contamination`` —
    same output contract: (id, n_shingles, n_hit, contam_x1000,
    is_contaminated), one row per arriving document, append mode.

    ``stream_docs`` is a streaming DataFrame; ``benchmark`` is a STATIC
    DataFrame (the fixed eval set). The benchmark's distinct shingle
    set is aggregated to one array row and broadcast into a
    stream-static cross join; everything else is a per-row projection.
    """
    bench_set = (
        benchmark.select(
            F.explode(shingle_hash_set(text_col, k)).alias("hs")
        )
        .agg(F.array_sort(F.collect_set("hs")).alias("_bench_set"))
    )
    # NULL text needs no special case: shingle_hash_set yields the
    # 1-element [null] set (substr of NULL), exactly what the batch
    # explode produces, so both paths emit (id, 1, 0, 0, 0) for it
    probed = stream_docs.crossJoin(F.broadcast(bench_set)).select(
        F.col(id_col),
        shingle_hash_set(text_col, k).alias("_hs_set"),
        F.col("_bench_set"),
    )
    n = F.size("_hs_set").cast("long")
    h = F.size(F.array_intersect("_hs_set", "_bench_set")).cast("long")
    contam = F.floor((h * 1000) / n).cast("long")
    return probed.select(
        F.col(id_col),
        n.alias("n_shingles"),
        h.alias("n_hit"),
        contam.alias("contam_x1000"),
        (contam >= threshold_x1000).cast("long").alias("is_contaminated"),
    )


def streaming_token_ngram_contamination(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold_x1000: int = 500,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming twin of ``operators.dedup.token_ngram_contamination``
    — token n-grams as the overlap unit (the conventional eval-leakage
    granularity), same output contract, one row per arriving document,
    append mode. ``carry_cols`` pass through untouched so the probe
    composes mid-pipeline (quality scores ride along to the emit
    stage) without a stream-stream join."""
    from ..operators.dedup import token_ngram_hash_set

    bench_set = (
        benchmark.select(
            F.explode(token_ngram_hash_set(text_col, n)).alias("hs")
        )
        .agg(F.array_sort(F.collect_set("hs")).alias("_bench_set"))
    )
    probed = stream_docs.crossJoin(F.broadcast(bench_set)).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        token_ngram_hash_set(text_col, n).alias("_hs_set"),
        F.col("_bench_set"),
    )
    cnt = F.size("_hs_set").cast("long")
    h = F.size(F.array_intersect("_hs_set", "_bench_set")).cast("long")
    contam = F.floor((h * 1000) / cnt).cast("long")
    return probed.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        cnt.alias("n_shingles"),
        h.alias("n_hit"),
        contam.alias("contam_x1000"),
        (contam >= threshold_x1000).cast("long").alias("is_contaminated"),
    )


def streaming_contamination_report(
    stream_docs: DataFrame,
    suites: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Streaming twin of the multi-suite ``contamination_report``
    query: screen arriving documents against SEVERAL fixed eval suites
    at once. ``suites`` maps suite name -> STATIC benchmark DataFrame;
    each suite's distinct token-n-gram hash set becomes one array
    column of a single broadcast row (eval suites are fixed-size, so
    the broadcast stays constant as the stream grows), and every
    arriving document pays one per-row set intersection per suite —
    no shuffle, no state, no watermark, append mode. Output contract
    matches the batch query: (id, n_grams, hits_<suite>...,
    worst_suite), ties alphabetical, 'clean' when nothing hits."""
    from ..operators.dedup import token_ngram_hash_set

    names = sorted(suites)
    if not names:
        raise ValueError("suites must not be empty")
    sets = None
    for name in names:
        one = (
            suites[name]
            .select(F.explode(token_ngram_hash_set(text_col, n)).alias("hs"))
            .agg(F.array_sort(F.collect_set("hs")).alias(f"_set_{name}"))
        )
        sets = one if sets is None else sets.crossJoin(one)
    probed = stream_docs.crossJoin(F.broadcast(sets)).select(
        F.col(id_col),
        token_ngram_hash_set(text_col, n).alias("_hs"),
        *[F.col(f"_set_{s}") for s in names],
    )
    hits = {
        s: F.size(F.array_intersect("_hs", f"_set_{s}")).cast("long")
        for s in names
    }
    worst = F.greatest(*hits.values()) if len(hits) > 1 else next(
        iter(hits.values())
    )
    worst_name = F.coalesce(
        *[F.when(hits[s] == worst, F.lit(s)) for s in names]
    )
    return probed.select(
        F.col(id_col),
        F.size("_hs").cast("long").alias("n_grams"),
        *[hits[s].alias(f"hits_{s}") for s in names],
        F.when(worst > 0, worst_name).otherwise(F.lit("clean")).alias(
            "worst_suite"
        ),
    )


def streaming_bloom_contamination(
    stream_docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    m_bits: int | None = None,
    threshold_x1000: int = 500,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.bloom_contamination`` —
    the same output contract, with the static side shrunk from the
    benchmark's full shingle set to the ~130 KiB Bloom bitmap (one
    map row: word index -> 63-bit word), so the broadcast stays
    CONSTANT however large the eval-suite union grows. Bit tests run
    inside a per-row SQL lambda over the document's shingle-hash set
    — still no shuffle, no state, no watermark; append mode.

    Row-for-row identical to the batch bloom operator (convergence
    pinned in tests/test_streaming.py): both sides derive their
    positions from :func:`~..operators.dedup._bloom_positions`'s
    construction (hash mod m, hash shiftright log2(m) mod m) in exact
    integer arithmetic.
    """
    from ..operators.dedup import (
        BLOOM_M_BITS,
        BLOOM_WORD_BITS,
        bloom_build,
        bloom_position_sql,
    )

    m = BLOOM_M_BITS if m_bits is None else m_bits
    wb = BLOOM_WORD_BITS
    # positions generated beside the bitmap builder so probe and build
    # can never drift (also validates the power-of-two width)
    p1, p2 = bloom_position_sql("h", m)
    bench_sh = benchmark.select(
        F.explode(shingle_hash_set(text_col, k)).alias("hs")
    ).distinct()
    wmap = bloom_build(bench_sh, m).agg(
        F.map_from_entries(
            F.collect_list(F.struct("wi", "bits"))
        ).alias("_bloom")
    )
    # NULL text needs no special case (see the exact-set scorer): the
    # [null] shingle set behaves identically in batch and stream
    probed = stream_docs.crossJoin(F.broadcast(wmap)).select(
        F.col(id_col),
        shingle_hash_set(text_col, k).alias("_hs_set"),
        F.col("_bloom"),
    )
    bit = (
        "coalesce(shiftright(element_at(_bloom, ({p}) div {wb}),"
        " CAST(({p}) % {wb} AS INT)) & 1, 0) = 1"
    )
    hits = F.expr(
        "size(filter(_hs_set, h -> "
        + bit.format(p=p1, wb=wb)
        + " AND "
        + bit.format(p=p2, wb=wb)
        + "))"
    ).cast("long")
    n = F.size("_hs_set").cast("long")
    contam = F.floor((hits * 1000) / n).cast("long")
    return probed.select(
        F.col(id_col),
        n.alias("n_shingles"),
        hits.alias("n_hit"),
        contam.alias("contam_x1000"),
        (contam >= threshold_x1000).cast("long").alias("is_contaminated"),
    )
