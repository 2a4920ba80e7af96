"""Deduplication operators for large-scale document pipelines.

Beyond the reference's surface (it has no text processing at all), these
are the operators a training-data pipeline needs, built Spark-first:

* exact dedup           — hash-groupBy on a normalized fingerprint
* n-gram Jaccard        — exact all-pairs via shingle join (quadratic
                          baseline; correct at any scale but shuffles
                          the full shingle inverted index)
* MinHash + LSH         — the scale path: 64-perm signatures, 16x4
                          banding, candidates verified with exact
                          Jaccard. All candidate generation is
                          equality-join on band keys, so it shuffles
                          O(docs x bands) tiny rows instead of the
                          shingle index squared.
* SimHash               — 32-bit sign-of-votes signature, candidate
                          pairs via 8-bit chunk banding (Hamming <= 3
                          guarantees a shared chunk by pigeonhole).

Everything is built-in Catalyst expressions (md5/conv/substring/
aggregate) — no Python UDFs — and every randomized ingredient is a
deterministic literal (hash family seeds baked in), so results are
reproducible and oracle-checkable in any SQL engine.

Float discipline: Jaccard is computed in *integer* arithmetic
(``jacc_x1000 = common*1000 // (|A|+|B|-common)``) so thresholds never
hit float rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .parallel import cpu_partitions

# Mersenne prime 2^31-1; the classic universal-hash modulus
MINHASH_P = 2147483647
DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16


def minhash_coeffs(num_hashes: int = DEFAULT_NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P.

    Knuth-style multiplicative constants; a is never 0 mod P.
    """
    out = []
    for i in range(num_hashes):
        a = ((2 * i + 1) * 2654435761) % MINHASH_P
        b = (i * 40503 + 17) % MINHASH_P
        out.append((a or 1, b))
    return out


def md5_long(col) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    The same value is computable in any SQL engine
    (``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB), which keeps
    every downstream signature bit-for-bit reproducible off-Spark.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Distinct character k-grams per document: (id, shingle s).

    Texts shorter than k contribute their whole text as one shingle.
    The input is repartitioned on id before the ~length(text)-fold
    explode: document sources are often few large files, and exploding
    inside the scan partitioning would serialize the (hash-heavy)
    downstream work onto one core per file.
    """
    npos = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(cpu_partitions(df), F.col(id_col))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(1), npos)).alias("pos"),
        )
        .select(
            F.col(id_col),
            F.expr(f"substring({text_col}, pos, {k})").alias("s"),
        )
        .distinct()
    )


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Distinct 60-bit shingle hashes per document: (id, hs long).

    The working representation for MinHash/Jaccard: downstream shuffles
    move fixed-width longs instead of strings, and set semantics are
    identical up to 2^-60 hash collisions (which an oracle reproduces
    exactly by hashing the same way).

    Cost shape: one PINNED repartition on id (:func:`.parallel.
    cpu_partitions` — AQE's byte-based coalescing would otherwise run
    the whole md5 explode on one core, the actual bottleneck measured
    at sf0.1: 3.6 s serialized vs 0.4 s pinned), then a codegen'd
    explode + md5 projection, then a distinct that adds NO exchange:
    hash-partitioning on id already clusters (id, hs), so the
    deduplicating aggregate runs partition-local.
    """
    npos = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(cpu_partitions(df), F.col(id_col))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(1), npos)).alias("pos"),
        )
        .select(
            F.col(id_col),
            md5_long(F.expr(f"substring({text_col}, pos, {k})")).alias("hs"),
        )
        .distinct()
    )


def shingle_hash_set(text_col, k: int = 8) -> Column:
    """Per-row expression: the document's DISTINCT 60-bit char-k-gram
    hash set as ``array<long>`` — the whole shingling+hashing+dedup in
    one projection, usable anywhere a Column is (including a streaming
    projection, where per-row set algebra is the stateless form of the
    contamination probe)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    npos = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda p: F.conv(
                F.substring(F.md5(c.substr(p, F.lit(k))), 1, 15), 16, 10
            ).cast("long"),
        )
    )


def hashed_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-document distinct shingle-hash *set* as an array column:
    (id, hs_set array<long>, n int).

    The zero-shuffle twin of :func:`hashed_shingles`: because every
    shingle of a document derives from that document's single row,
    per-row ``array_distinct`` IS the global (id, hs) distinct — the
    shingling, hashing and dedup all happen inside one codegen'd
    projection, no exchange. Each array is bounded by the document
    length, so rows stay small at any corpus scale; downstream set
    algebra (``array_intersect`` for Jaccard, ``array_min`` of a
    permutation for MinHash) also stays shuffle-free.
    """
    # pinned repartition before the hash-heavy projection: document
    # sources are often few large files (one core per file), and AQE
    # would coalesce a by-column repartition back to one task by bytes
    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(cpu_partitions(df), F.col(id_col))
        .select(
            F.col(id_col),
            shingle_hash_set(text_col, k).alias("hs_set"),
        )
        .withColumn("n", F.size("hs_set"))
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold_x1000: int = 500,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that overlap
    an evaluation set before training on them. Per document: distinct
    k-gram shingle count, how many of those shingles appear anywhere in
    the benchmark, the x1000-floored contamination ratio, and the
    >= threshold flag.

    Output: (id, n_shingles, n_hit, contam_x1000, is_contaminated),
    one row per input document.

    Scale shape: the benchmark's distinct shingle-hash set is tiny next
    to the corpus (eval sets are fixed-size while the corpus grows), so
    it is BROADCAST and probed map-side against the corpus's exploded
    shingle projection (:func:`hashed_shingles` — codegen'd md5 over
    exploded positions at PINNED parallelism; AQE's byte-based
    coalescing would otherwise serialize the hash stage). Linear in
    corpus size, constant in benchmark count per shingle; the only
    exchanges are the corpus repartition and the final ``groupBy(id)``,
    the latter partial-aggregated.
    """
    corpus = hashed_shingles(docs, id_col, text_col, k)
    bench = hashed_shingles(benchmark, id_col, text_col, k)
    return _contamination_probe(corpus, bench, id_col, threshold_x1000)


def token_ngram_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Distinct hashed TOKEN n-grams per document: (id, hs).

    The token-level twin of :func:`hashed_shingles` (char k-grams) —
    the unit eval-set decontamination conventionally uses (n
    consecutive whitespace tokens, space-joined, hashed). Same shape
    and same pinned-parallelism discipline: explode gram positions,
    build each gram with codegen'd ``slice``/``concat_ws``, hash with
    the shared portable 60-bit md5, distinct on (id, hash) — exchange-
    free, the id partitioning already clusters it.
    """
    toks = F.split(F.col(text_col), " ")
    toks = F.filter(toks, lambda w: w != "")
    npos = F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(1))
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .repartition(cpu_partitions(df), F.col(id_col))
        .select(
            F.col(id_col),
            "_toks",
            F.explode(F.sequence(F.lit(1), npos)).alias("pos"),
        )
        .select(
            F.col(id_col),
            md5_long(
                F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos"), n))
            ).alias("hs"),
        )
        .distinct()
    )


def token_ngram_hash_set(text_col, n: int = 5) -> Column:
    """Per-row expression: the document's DISTINCT hashed token
    n-gram set as ``array<long>`` — the stateless (single-projection)
    twin of :func:`token_ngram_shingles`, bit-identical hashes (same
    space-joined slice through the shared portable 60-bit md5). This
    is what lets the token-level decontamination probe run on a
    stream with no shuffle, no state, and no watermark."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(c, " "), lambda w: w != "")
    npos = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda p: md5_long(F.concat_ws(" ", F.slice(toks, p, n))),
        )
    )


def token_ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold_x1000: int = 500,
) -> DataFrame:
    """:func:`ngram_contamination` with token n-grams as the overlap
    unit — the conventional eval-decontamination granularity (an
    n-token verbatim overlap is strong evidence of leakage; char
    k-grams over-fire on shared vocabulary). Same output contract and
    broadcast-probe scale shape."""
    corpus = token_ngram_shingles(docs, id_col, text_col, n)
    bench = token_ngram_shingles(benchmark, id_col, text_col, n)
    return _contamination_probe(corpus, bench, id_col, threshold_x1000)


def _contamination_probe(
    corpus: DataFrame, bench: DataFrame, id_col: str, threshold_x1000: int
) -> DataFrame:
    """Shared tail: broadcast the benchmark's distinct unit-hash set,
    probe the corpus units map-side, aggregate per document."""
    bench = bench.select("hs").distinct().withColumn("_hit", F.lit(1))
    probed = corpus.join(F.broadcast(bench), "hs", "left")
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
    )
    # floor, not cast: DuckDB's double->BIGINT cast rounds while
    # Spark's truncates — floor is identical in both engines
    contam = F.floor(
        (F.col("n_hit") * 1000) / F.col("n_shingles")
    ).cast("long")
    return per_doc.select(
        F.col(id_col),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hit").cast("long").alias("n_hit"),
        contam.alias("contam_x1000"),
        (contam >= threshold_x1000).cast("long").alias("is_contaminated"),
    )


def normalized_fingerprint(text_col) -> Column:
    """Whitespace-collapsed, lowercased md5 — the exact-dup key."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-identical collapse: one survivor (min id) per
    normalized fingerprint. Output: (id, dup_count).

    Scale: a single hash-aggregate on the fingerprint; Catalyst does
    map-side partial aggregation, so the shuffle carries one row per
    distinct document text per partition.
    """
    return (
        df.select(
            F.col(id_col), normalized_fingerprint(text_col).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )


def _pair_jaccard(
    shingles: DataFrame,
    id_col: str,
    pairs: DataFrame,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact integer Jaccard for candidate pairs (d1 < d2).

    Joins the candidate list back to the shingle sets — at scale the
    candidate list is far smaller than the shingle index, so both joins
    are candidate-driven. ``shingles`` is the hashed index from
    :func:`hashed_shingles` — set intersection on the 60-bit hash
    shuffles fixed-width keys and collisions are ~2^-60 per pair.
    """
    hashed = shingles
    if sizes is None:
        sizes = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    # broadcast the per-doc set sizes: one row per document, always the
    # small side of its joins
    sizes = F.broadcast(sizes)
    s1 = hashed.select(F.col(id_col).alias("d1"), "hs")
    s2 = hashed.select(F.col(id_col).alias("d2"), "hs")
    common = (
        pairs.join(s1, "d1")
        .join(s2, ["d2", "hs"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sizes.select(F.col(id_col).alias("d2"), F.col("n").alias("n2")), "d2")
        .select(
            "d1",
            "d2",
            # floor, not cast: DuckDB's double->BIGINT cast rounds while
            # Spark's truncates — floor is identical in both engines
            F.floor(
                (F.col("common") * 1000)
                / (F.col("n1") + F.col("n2") - F.col("common"))
            ).cast("long").alias("jacc_x1000"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    threshold_x1000: int = 500,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold. Output
    (d1, d2, jacc_x1000), d1 < d2.

    The quadratic-exact baseline: the shingle equi-join generates one
    row per co-occurring shingle. Fine to ~10^6 docs with pruning;
    beyond that use :func:`minhash_lsh_pairs`.
    """
    # the shingle index feeds pair generation AND both verification
    # joins — persist it instead of re-running the explode+distinct
    sh = hashed_shingles(df, id_col, text_col, k).persist()
    pairs = (
        sh.select(F.col(id_col).alias("d1"), "hs")
        .join(sh.select(F.col(id_col).alias("d2"), "hs"), "hs")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    return _pair_jaccard(sh, id_col, pairs).where(
        F.col("jacc_x1000") >= threshold_x1000
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(id, m0..m{n-1}) MinHash signature columns from a hashed (or
    string) shingle index.

    One hash-aggregate: per shingle the 64 permutation hashes are pure
    arithmetic on a shared 60-bit base hash; Catalyst evaluates them in
    one codegen'd projection and the groupBy keeps only the running
    minima (partial aggregation — the shuffle carries 64 longs per doc
    per partition).
    """
    base_hash = (
        F.col("hs") if "hs" in shingles.columns else md5_long("s")
    )
    base = shingles.select(F.col(id_col), (base_hash % MINHASH_P).alias("hm"))
    aggs = [
        F.min((F.lit(a) * F.col("hm") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    # shingle-set size rides along in the same aggregation pass — the
    # Jaccard denominator later needs it, and a separate count would be
    # one more full pass over the index
    aggs.append(F.count(F.lit(1)).alias("n"))
    return base.groupBy(id_col).agg(*aggs)


def band_rows(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """The exploded banded-LSH index: (id, band_id, band_key), one row
    per (document, band). rows-per-band r = num_hashes // bands; the
    band key is the string concat of the band's r signature values, so
    bucket membership is a plain equi-join key. This is both the
    in-flight shape of :func:`lsh_candidate_pairs` and the PERSISTED
    shape of :class:`NearDupStore`'s band table."""
    r = num_hashes // bands
    band_keys = F.array(
        *[
            F.concat_ws(
                "_", *[F.col(f"m{band * r + j}").cast("string") for j in range(r)]
            )
            for band in range(bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.posexplode(band_keys).alias("band_id", "band_key")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs (d1 < d2) from signature columns.

    rows-per-band r = num_hashes // bands; two docs are candidates iff
    some band's r signature values all match. The band key is a string
    concat so the join is a plain shuffled equi-join on
    (band_id, band_key) — no custom partitioner needed.

    ``max_bucket_size`` is the web-scale skew guard: a bucket of n docs
    contributes n^2 pairs, and a boilerplate-dominated corpus (error
    pages, templates) concentrates millions of docs in a handful of
    buckets. AQE's byte-based skew split cannot see this — the hot
    bucket's rows are identical (id, band_key) pairs that compress to
    almost nothing — so the standard LSH mitigation applies: drop
    buckets above the cap entirely (their members are boilerplate
    near-dups of each other that exact-dedup or a dedicated boilerplate
    pass handles at linear cost; genuine near-dup families are orders
    of magnitude smaller). Default None preserves exact semantics.
    """
    exploded = band_rows(signatures, id_col, num_hashes, bands)
    if max_bucket_size is not None:
        # one partial-aggregated count over the exploded index, then a
        # windowless semi-join-free filter: re-join the small over-cap
        # bucket list as a broadcast anti join
        over = (
            exploded.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket_size)
            .select("band_id", "band_key")
        )
        exploded = exploded.join(
            F.broadcast(over), ["band_id", "band_key"], "left_anti"
        )
    a = exploded.select(
        F.col(id_col).alias("d1"), "band_id", "band_key"
    )
    b = exploded.select(
        F.col(id_col).alias("d2"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold_x1000: int = 500,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash LSH near-dup pairs, LSH candidates verified with exact
    Jaccard. Output (d1, d2, jacc_x1000), d1 < d2, jacc >= threshold.
    ``max_bucket_size`` passes through to :func:`lsh_candidate_pairs`
    (the boilerplate-bucket skew guard; None = exact semantics).

    The scale path, built on the per-document shingle-set arrays of
    :func:`hashed_shingle_sets` so the only shuffles in the whole
    pipeline are the band-bucket equi-join and the two candidate
    verification joins:

    * signatures are a pure projection — ``array_min`` of each
      permutation hash over the set, no groupBy;
    * candidates come from the banded equi-join (linear in docs x bands);
    * verification joins the (tiny) candidate list back to the set table
      and computes exact Jaccard with ``array_intersect`` — per-pair set
      intersection instead of re-shuffling a shingle inverted index.

    The two persisted frames are per-document tables of a few hundred
    longs each (the set table and the 64-column signature table) —
    orders of magnitude smaller than the exploded shingle index they
    replace; at larger scale, write them to tables once instead.

    The signature aggregation deliberately goes through explode +
    groupBy rather than ``array_min(transform(...))`` projections:
    higher-order array lambdas are interpreted per element, while the
    64 min-aggregates after an explode run inside whole-stage codegen —
    measured ~3x faster end-to-end, and the shuffle it adds carries one
    65-long row per document.
    """
    sets = hashed_shingle_sets(df, id_col, text_col, k).persist()
    sig = minhash_signatures(
        sets.select(F.col(id_col), F.explode("hs_set").alias("hs")),
        id_col,
        num_hashes,
    ).persist()
    pairs = lsh_candidate_pairs(sig, id_col, num_hashes, bands, max_bucket_size)
    a = sets.select(
        F.col(id_col).alias("d1"), F.col("hs_set").alias("s1"),
        F.col("n").alias("n1"),
    )
    b = sets.select(
        F.col(id_col).alias("d2"), F.col("hs_set").alias("s2"),
        F.col("n").alias("n2"),
    )
    common = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
    return (
        pairs.join(a, "d1")
        .join(b, "d2")
        .select(
            "d1",
            "d2",
            # floor, not cast: DuckDB's double->BIGINT cast rounds while
            # Spark's truncates — floor is identical in both engines
            F.floor(
                (common * 1000) / (F.col("n1") + F.col("n2") - common)
            ).cast("long").alias("jacc_x1000"),
        )
        .where(F.col("jacc_x1000") >= threshold_x1000)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    max_iter: int = 20,
    round_counter: list | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components of the
    near-dup pair graph by iterative min-label propagation.
    Output: (node, cluster) — every node labeled with the smallest id
    reachable through pairs; singletons label themselves.

    This is the canonical *iterative* distributed algorithm the
    DataFrame API can't express in one query: a driver loop where each
    round is one (edges join labels) + min-aggregate, stopping early at
    fixpoint. Rounds needed = graph diameter (near-dup clusters are
    shallow — typically 2-4). Each round shuffles only (node, label)
    long pairs; ``localCheckpoint`` truncates the growing lineage so
    round N doesn't replay rounds 1..N-1 (on a multi-node cluster use
    a reliable ``checkpoint`` dir instead). NOTE: at scale prefer
    :func:`connected_components_star` — the 30x probe measured 5.99x
    time growth here vs star's 2.48x — or call
    :func:`duplicate_clusters`, which dispatches on measured edge
    count; this variant stays as the small-graph fast path and the
    comparison baseline.

    Exact and deterministic, so an oracle reproduces it with a
    recursive transitive-closure CTE.
    """
    e = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    lab = nodes.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").alias("label"),
    ).localCheckpoint()
    for _ in range(max_iter):
        # one shuffle per round: the previous label rides the SAME
        # aggregation as the propagation (rows tagged by source; a
        # node's old label = its unique lab-branch row), so the
        # fixpoint probe is a filter over the round's checkpoint
        # instead of a second join job. Labels are identical to the
        # join formulation: min over (own ∪ propagated) is unchanged,
        # and nodes reached only via edges have old = NULL, which the
        # != filter drops — exactly the rows the old inner join
        # dropped.
        prop = edges.join(lab, F.col("src") == F.col("node")).select(
            F.col("dst").alias("node"), F.col("label"), F.lit(0).alias("o")
        )
        new = (
            lab.select("node", "label", F.lit(1).alias("o"))
            .union(prop)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("o") == 1, F.col("label"))).alias(
                    "old"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new.where(F.col("label") != F.col("old")).limit(1).count()
        )
        lab = new.select("node", "label")
        if round_counter is not None:  # scale-probe diagnostics
            round_counter.append(1)
        if changed == 0:
            break
    edges.unpersist()
    return lab.select(F.col("node"), F.col("label").alias("cluster"))


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    max_iter: int = 25,
    round_counter: list | None = None,
) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the web-graph-scale successor to
    :func:`connected_components`: rounds grow like O(log n) instead of
    the graph diameter, and each round's shuffle is the current edge
    set (which only contracts — every emission re-points a node at a
    smaller label). Same output contract: (node, cluster = smallest id
    in the component), so the two are drop-in interchangeable and share
    one oracle.

    Large-star (per node u over its full neighborhood): link every
    strictly-larger neighbor to min(N(u) ∪ {u}).  Small-star (per node
    u over its smaller neighbors): link them — and u — to their min.
    Both preserve connectivity; the fixpoint is one star per component
    rooted at the component min.  Convergence is detected by an
    order-insensitive edge-set signature (count + xxhash64 XOR — XOR
    is commutative and cannot overflow), one tiny aggregate per round.  ``localCheckpoint`` truncates
    lineage per round (use a reliable ``checkpoint`` dir on a real
    cluster).
    """
    e = pairs.select(
        F.col("d1").cast("long").alias("a"), F.col("d2").cast("long").alias("b")
    )
    edges = (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame) -> tuple:
        r = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).first()
        return (r["n"], r["h"])

    sig = _sig(edges)
    converged = False
    for _ in range(max_iter):
        # large-star: closed-neighborhood min via both edge directions
        bidir = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        lmin = (
            bidir.groupBy("a")
            .agg(F.min("b").alias("nb"))
            .select("a", F.least("nb", F.col("a")).alias("m"))
        )
        large = (
            bidir.join(lmin, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("m").alias("a"), F.col("b"))  # m <= a < b
            .distinct()
            .localCheckpoint()
        )
        # small-star on the (min, larger)-oriented result: every smaller
        # neighbor of u — and u itself — links to their common min
        smin = large.groupBy("b").agg(F.min("a").alias("m"))
        small = (
            large.join(smin, "b")
            .select(F.col("m").alias("a"), F.col("a").alias("b"))  # (v -> m)
            .union(smin.select(F.col("m").alias("a"), F.col("b")))  # (u -> m)
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        edges = small
        if round_counter is not None:  # scale-probe diagnostics
            round_counter.append(1)
        new_sig = _sig(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint in {max_iter} rounds"
        )
    roots = edges.groupBy("b").agg(F.min("a").alias("root"))
    return (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .join(roots.withColumnRenamed("b", "node"), "node", "left")
        .select(
            "node", F.coalesce("root", F.col("node")).alias("cluster")
        )
    )


def kcore_peel(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    k: int = 2,
    n_rounds: int = 3,
) -> DataFrame:
    """Fixed-round k-core peeling over an undirected pair graph (the
    near-dup graph here): iteratively remove every node whose degree
    in the REMAINING subgraph is below ``k``. Nodes that survive all
    rounds form the round-``n_rounds`` k-core approximation — the
    dense heart of each duplication family (template farms, mirror
    sets), which is what canonical-selection and boilerplate triage
    want separated from peel-away chain copies.

    Like :func:`pagerank`, the round count is FIXED (no convergence
    probe) — that determinism is what makes an unrolled SQL oracle
    possible; peeling monotonically shrinks the alive set, so once a
    round removes nothing every later round is a no-op and the result
    EQUALS the true k-core (on bounded-diameter dup families a few
    rounds converge; raise ``n_rounds`` for adversarial chains).

    Plan shape: the iterative-DataFrame loop under the repo's loop
    discipline — the edge set is localCheckpoint-staged ONCE (the LSH
    pair DAG upstream evaluates exactly once), and each round runs
    exactly ONE eager job: the newly-removed set is the only state
    checkpointed per round (r13 — the old form also re-checkpointed
    the alive node set and the live edge set, 3 jobs per round);
    the alive set is derived lazily as ``base ANTI removed_so_far``
    and the live edge set as ``edges ANTI removed_so_far`` on both
    endpoints — both over checkpointed inputs, so the per-round plan
    stays bounded (the removed union holds at most ``n_rounds``
    checkpointed frames) and round N never replays rounds 1..N-1.
    Restriction equivalence: progressively filtering the edge set
    round by round equals one anti-join against the accumulated
    removed set, because edge restriction is idempotent and the
    removed sets are disjoint.

    Output: one row per node of ``nodes`` — (node, degree,
    removed_round, in_core): ``degree`` in the FULL graph,
    ``removed_round`` the 1-based peel round that killed the node
    (0 for core members), ``in_core`` 1/0.
    """
    e = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    deg0 = (
        base.join(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d")),
            base["node"] == F.col("src"),
            "left",
        )
        .select("node", F.coalesce("_d", F.lit(0)).cast("long").alias("degree"))
        .localCheckpoint()
    )
    alive0 = base.localCheckpoint()
    removed = None
    for r in range(1, n_rounds + 1):
        if removed is None:
            alive, live = alive0, edges
        else:
            alive = alive0.join(removed, "node", "left_anti")
            live = edges.join(
                removed.select(F.col("node").alias("src")),
                "src",
                "left_anti",
            ).join(
                removed.select(F.col("node").alias("dst")),
                "dst",
                "left_anti",
            )
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        rm = (
            alive.join(deg, alive["node"] == deg["src"], "left")
            .where(F.coalesce("_d", F.lit(0)) < k)
            .select("node")
            .withColumn("removed_round", F.lit(r).cast("long"))
            .localCheckpoint()
        )
        removed = rm if removed is None else removed.union(rm)
    out = deg0.join(removed, "node", "left").select(
        "node",
        "degree",
        F.coalesce("removed_round", F.lit(0)).cast("long").alias(
            "removed_round"
        ),
        F.when(F.col("removed_round").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("in_core"),
    )
    return out


STAR_EDGE_THRESHOLD = 250_000

# auto-dispatch collects the pair set and runs driver-side union-find
# below this edge count (see duplicate_clusters for the bounded-driver
# argument); at or above it the distributed variants take over
UF_EDGE_THRESHOLD = 50_000


def _unionfind_clusters(
    pairs: DataFrame, nodes: DataFrame, id_col: str
) -> DataFrame:
    """Driver-side connected components for a SMALL, ALREADY-COUNTED
    pair set: collect the edges, union-find in Python, re-attach the
    (node, cluster) map as a broadcast literal frame onto the node
    base. Output-identical to :func:`connected_components` /
    :func:`connected_components_star` (cluster = smallest id in the
    component; singletons label themselves — a node absent from the
    map coalesces to itself on the left join).

    Bounded-driver argument (the reason this is safe at 100 TB): the
    caller has ALREADY materialized the pair set and counted it with a
    bounded ``limit(threshold).count()`` probe — this path only runs
    when that exact count is <= UF_EDGE_THRESHOLD (50k edges = ~800 KB
    of longs collected, ~2x that many map rows broadcast back), the
    same order as the bounded artifacts the engine already collects
    (codebooks, vocabularies, BPE merge tables). Incremental-store
    graphs (daily increments minus history dups) sit far below the
    bound; anything larger takes the distributed min-label / star
    path exactly as before. The win is structural: min-label runs
    diameter-many rounds x (checkpoint + fixpoint probe) jobs — pure
    sequential scheduling latency on an increment-sized graph — while
    this is ONE collect of rows the checkpoint already holds."""
    rows = pairs.select(
        F.col("d1").cast("long"), F.col("d2").cast("long")
    ).collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min keeps the root the smallest id seen so far
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # only non-root members need map rows: a node whose cluster is
    # itself coalesces correctly from the left join's null
    mapping = [
        (n, find(n)) for n in list(parent) if find(n) != n
    ]
    spark = pairs.sparkSession
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    if not mapping:
        return base.select("node", F.col("node").alias("cluster"))
    mdf = spark.createDataFrame(mapping, "node: long, cluster: long")
    return base.join(F.broadcast(mdf), "node", "left").select(
        "node", F.coalesce("cluster", F.col("node")).alias("cluster")
    )


def duplicate_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    algorithm: str = "auto",
    star_edge_threshold: int = STAR_EDGE_THRESHOLD,
    round_counter: list | None = None,
) -> DataFrame:
    """THE duplicate-clustering entry point: connected components of a
    near-dup pair graph, dispatching between three identical-output
    strategies on measured edge count: driver-side union-find below
    ``UF_EDGE_THRESHOLD`` (increment-sized graphs — one bounded
    collect instead of a round loop; see :func:`_unionfind_clusters`),
    min-label propagation below ``star_edge_threshold``, and
    large-star/small-star above it.

    The 30x scale probe (SCALE_PROBE.md) is the reason this exists:
    min-label propagation grew 5.99x in time at 30x data vs
    large-star/small-star's 2.48x — min-label pays per-round shuffle
    growth AND more rounds on long chains, while star's edge set only
    contracts and its rounds grow O(log n). But on the small
    increment-sized graphs the persisted stores produce every day,
    min-label's single join+aggregate per round beats star's two
    phases + convergence signature. So: ``auto`` (the default) probes
    the edge count with a BOUNDED ``limit(threshold).count()`` — never
    a full count of a huge pair set — and picks min-label below the
    threshold, large-star/small-star at or above it (the 100-TB
    default). ``algorithm='minlabel'|'star'`` pins explicitly (the
    gated comparison queries do).

    Output contract (shared, oracle-interchangeable): (node, cluster)
    with cluster = smallest id in the component; singletons label
    themselves."""
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(
            f"duplicate_clusters: unknown algorithm {algorithm!r} "
            "(expected 'auto', 'minlabel' or 'star')"
        )
    if algorithm == "auto":
        # materialize the pair set ONCE (localCheckpoint) before the
        # probe: the pair search (an LSH band join + verify at every
        # call site) is the expensive stage at scale, and BOTH CC
        # variants immediately materialize their own edge snapshot
        # from it anyway — so a full one-job materialization here is
        # never wasted work, the bounded probe becomes a free read of
        # the checkpoint, and the chosen algorithm's snapshot job
        # reads checkpointed rows instead of re-running the pair DAG's
        # final stages (the old persist + limit().count() probe only
        # cached the partitions the limit touched).
        pairs = pairs.localCheckpoint()
        probed = pairs.limit(star_edge_threshold).count()
        if probed <= UF_EDGE_THRESHOLD:
            # exact count (probe cap not reached): increment-sized
            # graph — one bounded collect + union-find replaces the
            # whole round loop (see _unionfind_clusters)
            return _unionfind_clusters(pairs, nodes, id_col)
        algorithm = "star" if probed >= star_edge_threshold else "minlabel"
    if algorithm == "minlabel":
        return connected_components(
            pairs, nodes, id_col, round_counter=round_counter
        )
    return connected_components_star(
        pairs, nodes, id_col, round_counter=round_counter
    )


def pagerank(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 5,
    damping_x100: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph (the
    near-dup graph here): rank duplicated documents by how central
    they are in the duplication structure — hub pages that many
    near-copies orbit score high, chain-end copies low. Centrality
    over the dup graph is the signal web-dedup pipelines use to pick
    or weight canonical members beyond local attributes.

    Semantics: the standard power iteration with damping d
    (``d = damping_x100 / 100``), run a FIXED ``n_iter`` rounds (no
    convergence test — deterministic round count is what makes an
    unrolled SQL oracle possible), without dangling-mass
    redistribution (isolated nodes settle at ``1 - d`` — the same
    variant GraphX's standalone PageRank implements). All arithmetic
    is integer fixed-point at x1e6 scale: ``share(u) = r(u) //
    deg(u)``, ``r'(v) = (1-d)*1e6 + (d_x100 * sum(shares)) // 100`` —
    floor division of non-negative longs, bit-identical in any engine.

    Plan shape: the classic iterative-DataFrame loop. Degrees are
    joined onto the directed edge set ONCE and persisted; each round
    is one (edges >< ranks) hash join + one partial-aggregated sum
    shuffle on the destination id, with ``localCheckpoint`` truncating
    lineage so round N never replays rounds 1..N-1 (use a reliable
    ``checkpoint`` dir on a real cluster). Per-round shuffle volume is
    O(edges) long pairs — at web scale pre-bucket both sides by id.

    Output: (node, rank_x1e6).
    """
    e = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    # persist the directed edge set BEFORE deriving degrees: the
    # degree aggregate and the probe side of the degree join both
    # consume it, and without the cache the (expensive at scale) pair
    # DAG upstream would evaluate once per consumer — the same
    # double-evaluation duplicate_clusters' auto-probe once had
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    ed = edges.join(deg, "src").persist()
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    ranks = base.withColumn("rank_x1e6", F.lit(1_000_000).cast("long"))
    from .analytics import floor_div

    one_minus_d = (100 - damping_x100) * 10_000  # (1-d) at x1e6 scale
    for i in range(n_iter):
        contrib = ed.join(
            ranks, ed["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            floor_div(F.col("rank_x1e6"), F.col("_deg")).alias("_share"),
        )
        incoming = contrib.groupBy("node").agg(
            F.sum("_share").alias("_inc")
        )
        ranks = base.join(incoming, "node", "left").select(
            "node",
            (
                F.lit(one_minus_d)
                + floor_div(
                    F.lit(damping_x100) * F.coalesce(F.col("_inc"), F.lit(0)),
                    F.lit(100),
                )
            ).cast("long").alias("rank_x1e6"),
        )
        # checkpoint every SECOND round (and the last): there is no
        # convergence probe, so a round's only consumer is the next
        # round — un-checkpointed rounds fuse into the next
        # materialization job (same arithmetic, half the job count)
        # while the cadence still bounds lineage depth at 2
        if i % 2 == 1 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    ed.unpersist()
    edges.unpersist()
    return ranks


def label_propagation(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an undirected pair graph — the third graph read
    beside PageRank (member ranking) and triangles (cluster shape):
    LPA finds the community PARTITION without the transitive-closure
    semantics of connected components, so a thin bridge between two
    dense duplicate families does NOT glue them into one cluster the
    way CC must. That separation is the practical signal: template
    families connected by one chance collision keep distinct labels.

    Determinism (the property the oracle gate needs; vanilla LPA is
    famously order-dependent): updates are SYNCHRONOUS (every node
    votes on the PREVIOUS round's labels — no update-order
    sensitivity), the vote is argmax neighbor-label frequency with
    ties broken toward the SMALLEST label, the round count is FIXED
    (n_iter, no convergence test), and isolated nodes keep their own
    label. Initial label = own id. Every step is counting and integer
    comparison — bit-identical in any engine.

    Plan shape: the same iterative-DataFrame discipline as
    :func:`pagerank` — the directed edge set persists once; each round
    is one (edges >< labels) hash join, one partial-aggregated
    (node, label) count, one per-node window argmax, and a left join
    back onto the node base, with ``localCheckpoint`` truncating
    lineage so the final plan's join count does not grow with
    ``n_iter`` (use a reliable ``checkpoint`` dir on a real cluster).
    Per-round shuffle volume is O(edges) long pairs — at web scale
    pre-bucket both sides by id.

    Output: (node, community) — community is the converged (or
    n_iter-round) label, a member id of the community.
    """
    e = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    labels = base.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(
        F.desc("_c"), F.asc("label")
    )
    for _ in range(n_iter):
        votes = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label")
        counts = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("_c")
        )
        top = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        labels = (
            labels.join(top, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
            # per-round checkpoint stays: ``labels`` has TWO consumers
            # per round (the votes join and the carry-forward left
            # join), so pagerank's cadence-2 fusion would evaluate an
            # un-materialized round twice in the next job
            .localCheckpoint()
        )
    edges.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def triangle_counts(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    an undirected pair graph — the structure metric that separates
    CLIQUE-LIKE duplication (template families, mirror farms: every
    copy pairs with every other, coefficient ~1) from CHAIN-LIKE
    duplication (iterative edits: A~B~C but A!~C, coefficient ~0).
    PageRank ranks members; this classifies the cluster's shape, the
    other signal web-dedup analyses read off the dup graph.

    Scale shape: the naive wedge join explodes on hot nodes (a
    100k-member clique contributes deg^2 wedges per member). This
    implementation uses DEGREE-ORDERED ORIENTATION (the standard
    MapReduce triangle algorithm, Cohen 2009 / Suri & Vassilvitskii
    2011): orient every edge from its lower-(degree, id) endpoint to
    the higher one, build wedges only at each node's OUT-neighbors
    (out-degree <= sqrt(2m) for every node, however hot), and close
    them against the oriented edge list — sum of squared OUT-degrees
    is O(m^1.5) total work, each triangle found EXACTLY once. Three
    hash equi-joins, no CartesianProduct, every shuffle keyed on node
    ids. The orientation changes only the search order, never the
    triangle set, so a naive a<b<c SQL oracle gates it directly.

    Coefficient in x1e6 integer fixed-point: ``2 * T(v) * 1e6 div
    (deg(v) * (deg(v) - 1))``, 0 for degree < 2 — floor division of
    non-negative longs, bit-identical in any engine.

    Output: one row per node in ``nodes``: (node, degree,
    n_triangles, clustering_x1e6) — isolated nodes carry zeros.
    """
    from .analytics import floor_div

    # STAGE the normalized edge set (localCheckpoint — the repo's
    # multi-consumer recipe): deg, the orientation join and the
    # closing join all consume it, and the pair DAG upstream (an LSH
    # band join at scale) must evaluate exactly once
    e = pairs.select(
        F.least("d1", "d2").alias("a"), F.greatest("d1", "d2").alias("b")
    ).distinct().localCheckpoint()
    both = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # orient u -> v when (deg(u), u) < (deg(v), v): a total order, so
    # every undirected edge gets exactly one direction
    da = deg.select(F.col("a").alias("_u"), F.col("deg").alias("_du"))
    db = deg.select(F.col("a").alias("_v"), F.col("deg").alias("_dv"))
    oriented = (
        both.join(da, both["a"] == da["_u"])
        .join(db, both["b"] == db["_v"])
        .where(
            (F.col("_du") < F.col("_dv"))
            | ((F.col("_du") == F.col("_dv")) & (F.col("a") < F.col("b")))
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .localCheckpoint()
    )
    # wedges at the oriented source — (x -> y), (x -> z) with y < z so
    # each wedge forms once — closed against the UNDIRECTED edge set
    # keyed (min, max): every triangle has exactly one member with
    # out-edges to both others (the (deg, id)-minimum), so each
    # triangle materializes exactly once
    w1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    w2 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedges = w1.join(w2, "x").where(F.col("y") < F.col("z"))
    closing = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["y", "z"]).select("x", "y", "z")
    member = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    out = (
        base.join(
            deg.select(F.col("a").alias("node"), "deg"), "node", "left"
        )
        .join(member, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
        .withColumn(
            "clustering_x1e6",
            F.when(
                F.col("degree") >= 2,
                floor_div(
                    F.col("n_triangles") * 2_000_000,
                    F.col("degree") * (F.col("degree") - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return out


def canonical_per_cluster(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection: given a near-dup cluster
    assignment (``(node, cluster)`` — the :func:`duplicate_clusters`
    contract), keep ONE document per cluster — the highest-``score_col``
    member (keep-longest by default, the standard production rule),
    smallest id on ties — instead of the blind first-occurrence-wins
    rule exact/minhash dedup applies.

    This is the selection step production dedup pipelines run after
    clustering (keep the longest / highest-scoring / canonical-URL
    member; e.g. RefinedWeb keeps one representative per MinHash
    bucket): the cluster graph decides WHAT is duplicated, this
    operator decides WHICH copy survives.

    Plan shape: one hash join on the doc id (broadcast when the
    cluster table is small; at 100 TB both sides are huge but the join
    key is the id both tables are naturally bucketed by), then ONE
    exchange on ``cluster`` shared by the two window functions
    (row_number and the member count partition on the same key, so
    Catalyst plans a single sort+window over one shuffle). Quality is
    compared as the stored value — no arithmetic — so ordering is
    engine-exact.

    Output: (cluster, keep_doc_id, keep_quality, n_members).
    """
    members = clusters.join(
        docs.select(
            F.col(id_col).cast("long").alias("node"),
            F.col(score_col).alias("_q"),
        ),
        "node",
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("_q").desc(), F.col("node")
    )
    wc = Window.partitionBy("cluster")
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("node").cast("long").alias("keep_doc_id"),
            F.col("_q").alias("keep_score"),
            F.col("n_members"),
        )
    )


# -- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """32-bit word-frequency SimHash per document: (id, simhash).

    Word hash = first 8 md5 hex chars (32 bits); signature bit j is the
    sign of sum(freq * (bit_j ? +1 : -1)) over words.
    """
    words = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(cpu_partitions(df), F.col(id_col))
        .select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w32 = F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
    withh = words.select(F.col(id_col), F.col("cnt"), w32.alias("h32"))
    votes = [
        F.sum(
            F.col("cnt")
            * (F.shiftright(F.col("h32"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    sigs = withh.groupBy(id_col).agg(*votes)
    sig_expr = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig_expr = bit if sig_expr is None else sig_expr + bit
    return sigs.select(F.col(id_col), sig_expr.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Output (d1, d2, hamming). Candidates come from 8-bit chunk banding:
    for distance <= 3, at least one of the 4 chunks is untouched
    (pigeonhole), so the chunk equi-join finds every qualifying pair.
    """
    # persisted: the chunk-banding join reads the signatures twice
    sig = simhash_signatures(df, id_col, text_col).persist()
    chunk_keys = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * t).bitwiseAND(F.lit(255))
            for t in range(SIMHASH_CHUNKS)
        ]
    )
    exploded = sig.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(chunk_keys).alias("chunk_id", "chunk_key"),
    )
    a = exploded.select(
        F.col(id_col).alias("d1"), F.col("simhash").alias("sig1"),
        "chunk_id", "chunk_key",
    )
    b = exploded.select(
        F.col(id_col).alias("d2"), F.col("simhash").alias("sig2"),
        "chunk_id", "chunk_key",
    )
    ham = F.bit_count(
        F.col("sig1").bitwiseXOR(F.col("sig2"))
    ).cast("long").alias("hamming")
    return (
        a.join(b, ["chunk_id", "chunk_key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2", ham)
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# -- bloom-filter decontamination -------------------------------------------

BLOOM_M_BITS = 1 << 20  # filter width: 2^20 bits in 63-bit words (~130 KiB)
BLOOM_WORD_BITS = 63  # 63, not 64: a set sign bit would make the word
# negative, and engines disagree on BIGINT left-shift into the sign
# (DuckDB raises Overflow on 1<<63) — one dead bit per word buys a
# construction every engine evaluates identically


def _bloom_positions(hs: Column, m_bits: int) -> tuple[Column, Column]:
    """The two bloom bit positions of a 60-bit hash — the ONE place
    the double-hash construction lives (build and probe must agree
    bit-for-bit). Position 2 via shiftright, NOT floor(hs / m): double
    division rounds 60-bit hashes above 2^53 and would diverge from
    an oracle's exact BIGINT division. m_bits must be a power of two.
    """
    shift = m_bits.bit_length() - 1
    if m_bits != 1 << shift:
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return hs % m_bits, F.shiftright(hs, shift) % m_bits


def bloom_position_sql(var: str, m_bits: int = BLOOM_M_BITS) -> tuple[str, str]:
    """SQL-text twin of :func:`_bloom_positions` for probes that run
    inside ``F.expr`` lambdas (the streaming scorer) — generated here
    so the construction cannot drift from the bitmap builder."""
    shift = m_bits.bit_length() - 1
    if m_bits != 1 << shift:
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return f"{var} % {m_bits}", f"shiftright({var}, {shift}) % {m_bits}"


def bloom_build(
    bench_shingles: DataFrame, m_bits: int = BLOOM_M_BITS
) -> DataFrame:
    """Pack a benchmark's shingle-hash set into a Bloom-filter bitmap:
    (wi, bits) — word index and its 63-bit OR of set bits (see
    ``BLOOM_WORD_BITS``), at most ``m_bits / 63 + 1`` rows regardless
    of benchmark size.

    Two positions per shingle, both carved from the one 60-bit md5
    (``hs % m`` and ``(hs // m) % m`` — independent slices of the same
    uniform hash, the standard double-hashing construction), so the
    filter is DETERMINISTIC: any engine hashing the same way builds
    the identical bitmap, which is what makes an approximate structure
    oracle-checkable bit-for-bit.

    Scale shape: explode 2 positions per shingle, one partial-combined
    ``groupBy(wi).agg(bit_or)`` — the exchange carries at most 16K
    words per map task. The result is the broadcastable probe-side
    artifact: 128 KiB CONSTANT as the benchmark grows (a raw distinct
    hash set grows linearly and eventually stops fitting a broadcast;
    the bloom trades that for a documented false-positive rate).
    """
    p1, p2 = _bloom_positions(F.col("hs"), m_bits)
    return (
        bench_shingles.select(F.explode(F.array(p1, p2)).alias("pos"))
        .select(
            F.floor(F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("wi"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("wi")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    m_bits: int = BLOOM_M_BITS,
    threshold_x1000: int = 500,
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: like
    :func:`ngram_contamination` but the probe side is the fixed-size
    bitmap of :func:`bloom_build` instead of the exact shingle set —
    the constant-memory form for when the eval suite union grows past
    comfortable broadcast size (the bitmap stays 128 KiB forever).

    A shingle "hits" when BOTH its bloom bits are set; false positives
    (~(q/m)^2 per shingle for q set bits — at 2^20 bits and a 50K-
    shingle benchmark, ~0.8%) can only OVER-flag, never under-flag:
    every true overlap is caught (no false negatives, the property
    decontamination actually needs), and the flag threshold absorbs
    sub-percent over-count. Output contract matches
    :func:`ngram_contamination` (n_hit means bloom-hits).

    Scale shape: corpus side identical to the exact probe (pinned
    explode + md5, linear); the bitmap joins are TWO broadcast hash
    joins on word index (one per bloom position) followed by a codegen
    bit test — no shuffle is keyed on anything benchmark-sized.
    """
    bench = hashed_shingles(benchmark, id_col, text_col, k)
    return bloom_probe(
        docs, bloom_build(bench, m_bits), id_col, text_col,
        k=k, m_bits=m_bits, threshold_x1000=threshold_x1000,
    )


def bloom_probe(
    docs: DataFrame,
    words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    m_bits: int = BLOOM_M_BITS,
    threshold_x1000: int = 500,
) -> DataFrame:
    """The probe half of :func:`bloom_contamination`, against an
    ALREADY-BUILT words frame (wi, bits) — factored out so persisted
    bloom artifacts (:class:`~.bloom_store.BloomFilterStore`, whose
    OR-merged read IS such a frame) probe through the identical plan:
    two broadcast hash joins on word index plus a codegen bit test."""
    corpus = hashed_shingles(docs, id_col, text_col, k)
    p1, p2 = _bloom_positions(F.col("hs"), m_bits)
    probed = (
        corpus.select(
            F.col(id_col),
            p1.alias("_p1"),
            p2.alias("_p2"),
        )
        .withColumn(
            "_w1", F.floor(F.col("_p1") / BLOOM_WORD_BITS).cast("long")
        )
        .withColumn(
            "_w2", F.floor(F.col("_p2") / BLOOM_WORD_BITS).cast("long")
        )
        .join(
            F.broadcast(words.select(F.col("wi"), F.col("bits").alias("_b1"))),
            F.col("_w1") == F.col("wi"),
            "left",
        )
        .drop("wi")
        .join(
            F.broadcast(words.select(F.col("wi"), F.col("bits").alias("_b2"))),
            F.col("_w2") == F.col("wi"),
            "left",
        )
        .drop("wi")
    )
    bit1 = F.expr(f"shiftright(_b1, CAST(_p1 % {BLOOM_WORD_BITS} AS INT)) & 1")
    bit2 = F.expr(f"shiftright(_b2, CAST(_p2 % {BLOOM_WORD_BITS} AS INT)) & 1")
    hit = (
        F.col("_b1").isNotNull()
        & F.col("_b2").isNotNull()
        & (bit1 == 1)
        & (bit2 == 1)
    )
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(hit.cast("long")).alias("n_hit"),
    )
    contam = F.floor(
        (F.col("n_hit") * 1000) / F.col("n_shingles")
    ).cast("long")
    return per_doc.select(
        F.col(id_col),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hit").cast("long").alias("n_hit"),
        contam.alias("contam_x1000"),
        (contam >= threshold_x1000).cast("long").alias("is_contaminated"),
    )


# -- blocked fuzzy (edit-distance) matching ---------------------------------

def default_fuzzy_block(name_col: str):
    """Default blocking key for :func:`fuzzy_pairs`: the last
    whitespace token — for entity-ish strings ("red bolt", "blue
    widget") the head noun, which a <= small-edit-distance pair rarely
    disagrees on (an edit confined to the modifier leaves it intact).
    Callers with large blocks refine the key (add an initial, a
    length bucket) and/or union several blocking passes for recall.
    """
    c = F.col(name_col)
    return F.element_at(F.split(c, " "), -1)


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    block_expr=None,
) -> DataFrame:
    """Fuzzy self-match: every pair of rows whose names are within
    ``max_distance`` Levenshtein edits — the entity-resolution
    primitive (catalog dedup, vendor-name reconciliation) the n-gram/
    MinHash family does not cover (set similarity is blind to
    single-character typos in short strings).

    Scale shape: BLOCKED evaluation — rows equi-join on a cheap
    blocking key (default :func:`default_fuzzy_block`) and the
    quadratic edit-distance verify runs only within blocks, the
    standard record-linkage design; the pair space is sum_b |b|^2, not
    n^2, and the join is an ordinary hash equi-join any engine
    parallelizes by block. Like every blocked matcher this trades
    recall at the block boundary (a typo in the blocking key itself
    hides the pair) for the n^2 escape; callers needing higher recall
    union several blocking passes. Ties/order: pairs emit once with
    ``id1 < id2``.

    Output: (id1, id2, name1, name2, lev).
    """
    block = (
        default_fuzzy_block(name_col) if block_expr is None else block_expr
    )
    side = df.select(
        F.col(id_col), F.col(name_col), block.alias("_blk")
    )
    a = side.select(
        F.col(id_col).alias("id1"),
        F.col(name_col).alias("name1"),
        "_blk",
    )
    b = side.select(
        F.col(id_col).alias("id2"),
        F.col(name_col).alias("name2"),
        "_blk",
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("lev", F.levenshtein("name1", "name2").cast("long"))
        .where(F.col("lev") <= max_distance)
        .select("id1", "id2", "name1", "name2", "lev")
    )


class _SnapshotArtifactStore:
    """Shared versioned-snapshot machinery for incremental dedup
    artifacts (:class:`NearDupStore`, :class:`EmbNearDupStore`): the
    ``VersionedStore`` protocol of :class:`FingerprintStore` factored
    once — parquet tables addressed by filename prefix inside the
    current snapshot dir, hard-linked O(increment) commits, atomic
    ``_current`` flip, snapshot-until-vacuum reads, param pinning at
    first commit, and the exactly-once ``batch_id`` replay contract
    (the committed emission-file names ride the pointer flip).
    Subclasses supply the artifact tables and the increment-dedup
    logic; everything on this class is storage, not semantics."""

    # bump on any change to the persisted layout or meta contract; the
    # stamp rides every commit's meta and is validated on reopen, so a
    # store written by older code fails LOUDLY instead of silently
    # breaking replay/emission semantics (the class of bug a missing
    # 'batch_files' field caused before stamping existed)
    FORMAT = 1
    # emission-record columns after the id (subclass hook: what a
    # committed 'surv' row carries back to the caller)
    _EMIT_COLS = ("n_members",)

    def __init__(self, spark, path: str, params: list, kind: str):
        from ..plans.materialize import VersionedStore

        self.spark = spark
        self.path = path
        self.kind = kind
        self._store = VersionedStore(spark, path)
        # test seam: callable(stage_name) invoked at each commit stage
        # (fault-injection crash tests, same pattern as
        # ParquetEventStore._compact_fault)
        self._commit_fault = None
        # artifact params are part of the artifact: probing with
        # different params than the stored rows were built with is
        # silent nonsense, so they are pinned at first commit and
        # validated on reopen
        meta = self._store.current_meta(path)
        if meta is not None and meta.get("params") not in (None, params):
            raise ValueError(
                f"{kind} at {path} was built with params "
                f"{meta['params']}; reopening with {params} would probe "
                "an incompatible artifact"
            )
        if meta is not None and meta.get("format", 0) != self.FORMAT:
            raise ValueError(
                f"{kind} at {path} has store format "
                f"{meta.get('format', 0)} but this code writes format "
                f"{self.FORMAT}; rebuild the store (or migrate it) — "
                "reopening would silently break the replay/emission "
                "contract"
            )
        self._params = params

    def _locked(self):
        """Exclusive store-level lock held across a whole
        replay-check + build + commit sequence: concurrent writers on
        one store path SERIALIZE instead of sweeping each other's
        in-flight ``.staging-*`` dirs (the single-writer contract
        lives here, not in caller-side conventions). flock is
        advisory-but-atomic on every POSIX filesystem this runs on;
        the fd closes (releasing the lock) when the context exits."""
        import contextlib
        import os

        @contextlib.contextmanager
        def _ctx():
            os.makedirs(self.path, exist_ok=True)
            with open(os.path.join(self.path, ".lock"), "w") as fh:
                with contextlib.suppress(ImportError):
                    import fcntl

                    fcntl.flock(fh, fcntl.LOCK_EX)
                yield

        return _ctx()

    def is_stale(self, corpus_fp: str) -> bool:
        """True when the store was never committed or was pinned to a
        different corpus fingerprint — the public staleness probe for
        cache builders (no reaching into ``_store`` internals)."""
        meta = self._store.current_meta(self.path)
        return meta is None or meta.get("corpus_fp") != corpus_fp

    def pin_corpus(self, corpus_fp: str) -> None:
        """Record the corpus fingerprint the current snapshot was
        built from (rides the atomic pointer flip; every other meta
        field survives). Callers pair this with :meth:`is_stale` for
        rebuild-on-corpus-change cache lifecycles."""
        meta = self._store.current_meta(self.path)
        if meta is None:
            raise ValueError(
                f"{self.kind} at {self.path}: nothing committed yet — "
                "absorb before pinning a corpus fingerprint"
            )
        meta["corpus_fp"] = corpus_fp
        self._flip(meta.pop("version"), meta)

    def _current_dir(self):
        import os

        meta = self._store.current_meta(self.path)
        if meta is None:
            return None
        d = os.path.join(self.path, meta["version"])
        return d if os.path.exists(d) else None

    def _table(self, prefix: str, schema: str) -> DataFrame:
        import os

        d = self._current_dir()
        if d is None:
            return self.spark.createDataFrame([], schema)
        files = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.startswith(prefix + "-") and f.endswith(".parquet")
        ]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*files)

    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} long, " + ", ".join(
            f"{c} long" for c in self._EMIT_COLS
        )

    def _read_emission(self, paths: list, id_col: str) -> DataFrame:
        return self.spark.read.parquet(*paths).select(
            F.col("id").alias(id_col), *self._EMIT_COLS
        )

    def _replay_result(self, meta, batch_id, id_col):
        """Exactly-once replay check: the committed survivors for an
        already-absorbed ``batch_id`` (read from the files recorded in
        the flipped meta), an empty frame for an older batch, or None
        when the absorb should proceed."""
        import os

        if batch_id is None or meta is None or "batch" not in meta:
            return None
        committed = int(meta["batch"])
        if batch_id == committed:
            vdir0 = os.path.join(self.path, meta["version"])
            names = meta.get("batch_files") or []
            paths = [os.path.join(vdir0, n) for n in names]
            if paths and all(os.path.exists(p) for p in paths):
                return self._read_emission(paths, id_col)
            return self.spark.createDataFrame(
                [], self._emission_schema(id_col)
            )
        if batch_id < committed:
            return self.spark.createDataFrame(
                [], self._emission_schema(id_col)
            )
        return None

    def _commit_increment(self, meta, tables, id_col, batch_id):
        """Write the increment's rows for each ``(prefix, df)`` in
        ``tables`` into a staging dir, hard-link every file of the
        previous snapshot beside them, atomically publish, and flip
        ``_current``. The ``surv``-prefixed table is the emission
        record; returns it AS READ FROM THE COMMITTED FILES. Prior
        meta fields (the batch watermark above all) survive a manual
        absorb."""
        import os
        import shutil
        import uuid

        version = self._store.next_version(meta)
        vdir = os.path.join(self.path, version)
        if os.path.exists(vdir):  # orphan of a crashed commit
            shutil.rmtree(vdir, ignore_errors=True)
        for name in os.listdir(self.path) if os.path.isdir(self.path) else []:
            if name.startswith(".staging-"):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex[:8]}")
        os.makedirs(staging, exist_ok=True)
        inc_names: list[str] = []
        surv_names: list[str] = []
        try:
            for prefix, df in tables:
                tmp = os.path.join(staging, f"_{prefix}")
                df.write.mode("overwrite").parquet(tmp)
                i = 0
                for name in sorted(os.listdir(tmp)):
                    if name.endswith(".parquet"):
                        dst = f"{prefix}-{version}-{i}.parquet"
                        os.replace(
                            os.path.join(tmp, name), os.path.join(staging, dst)
                        )
                        inc_names.append(dst)
                        if prefix == "surv":
                            surv_names.append(dst)
                        i += 1
                shutil.rmtree(tmp, ignore_errors=True)
            if self._commit_fault is not None:
                self._commit_fault("post_write")
            prev = self._current_dir()
            if prev is not None:
                first = True
                for name in os.listdir(prev):
                    if not name.endswith(".parquet"):
                        continue
                    src = os.path.join(prev, name)
                    dst = os.path.join(staging, name)
                    try:
                        os.link(src, dst)
                    except OSError:
                        shutil.copy2(src, dst)
                    if first and self._commit_fault is not None:
                        self._commit_fault("mid_link")
                    first = False
            if self._commit_fault is not None:
                self._commit_fault("post_link")
            os.replace(staging, vdir)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        if self._commit_fault is not None:
            self._commit_fault("post_publish")
        extra = {
            k: v
            for k, v in (meta or {}).items()
            if k not in ("version", "inc_files")
        }
        extra["inc_files"] = inc_names
        extra["params"] = self._params
        extra["format"] = self.FORMAT
        if batch_id is not None:
            extra["batch"] = int(batch_id)
            extra["batch_files"] = surv_names
        self._flip(version, extra)
        if not surv_names:
            return self.spark.createDataFrame(
                [], self._emission_schema(id_col)
            )
        return self._read_emission(
            [os.path.join(vdir, n) for n in surv_names], id_col
        )

    def _flip(self, version: str, extra: dict | None = None) -> None:
        import json
        import os

        meta = dict(extra or {})
        meta["version"] = version
        tmp = os.path.join(self.path, self._store.CURRENT + "._tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(self.path, self._store.CURRENT))

    def snapshot_versions(self) -> list[str]:
        """All RETAINED snapshot versions, oldest first — the
        time-travel index. Every commit publishes a complete
        hard-linked snapshot dir, so each retained version is an
        independently readable point-in-time image of the whole store
        (the lakehouse time-travel property, for free from the commit
        protocol); :meth:`vacuum` trims the tail, :meth:`as_of_table`
        reads one."""
        import os

        if not os.path.isdir(self.path):
            return []
        return sorted(
            n
            for n in os.listdir(self.path)
            if n.startswith("v")
            and os.path.isdir(os.path.join(self.path, n))
        )

    def as_of_table(self, version: str, prefix: str, schema: str):
        """Point-in-time read of one artifact table: the ``prefix``
        rows exactly as they stood when ``version`` was committed —
        later absorbs, compactions and prunes are invisible. Raises
        loudly when the version was vacuumed (never silently serves
        the wrong snapshot)."""
        import os

        vdir = os.path.join(self.path, version)
        if not os.path.isdir(vdir):
            raise ValueError(
                f"{self.kind} at {self.path}: snapshot {version!r} is "
                f"not retained (vacuumed or never committed); available:"
                f" {self.snapshot_versions()}"
            )
        files = [
            os.path.join(vdir, f)
            for f in os.listdir(vdir)
            if f.startswith(prefix + "-") and f.endswith(".parquet")
        ]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*files)

    def vacuum(self, keep: int = 2) -> list[str]:
        """Remove all but the newest ``keep`` snapshot dirs (never the
        current one); shared data survives through hard links."""
        import os
        import shutil

        meta = self._store.current_meta(self.path)
        current = meta["version"] if meta else None
        versions = sorted(
            n for n in os.listdir(self.path) if n.startswith("v")
        )
        victims = [v for v in versions[:-keep] if v != current] if keep else [
            v for v in versions if v != current
        ]
        for v in victims:
            shutil.rmtree(os.path.join(self.path, v), ignore_errors=True)
        return victims

    def _compact_plan(self, prefixes: list) -> list:
        """[(out_prefix, [in_prefix, ...]), ...]: which file-name
        prefixes :meth:`compact` folds together. Default: each table
        prefix consolidates separately (multi-table stores must not
        mix band rows into hash rows). FingerprintStore overrides —
        its one logical table is spread across emission files."""
        return [(p, [p]) for p in prefixes]

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the accumulated per-increment files into
        ``target_files`` consolidated files PER TABLE, committed as a
        new snapshot under the same store lock + atomic flip — the
        periodic maintenance that keeps a year of daily absorbs from
        becoming 365 tiny files behind every probe join.
        Content-preserving and idempotent; earlier snapshots keep
        reading their own files until vacuumed; the batch watermark
        survives but the compacted batch's emission files do not (a
        post-compact replay returns empty — compaction is quiesced
        maintenance, see the absorb contract). Returns the new
        snapshot's file count."""
        import os
        import shutil
        import uuid

        with self._locked():
            cur = self._current_dir()
            if cur is None:
                return 0
            meta = self._store.current_meta(self.path)
            version = self._store.next_version(meta)
            vdir = os.path.join(self.path, version)
            if os.path.exists(vdir):  # orphan of a crashed commit
                shutil.rmtree(vdir, ignore_errors=True)
            staging = os.path.join(
                self.path, f".staging-{uuid.uuid4().hex[:8]}"
            )
            prefixes = sorted(
                {
                    f.split("-", 1)[0]
                    for f in os.listdir(cur)
                    if f.endswith(".parquet")
                }
            )
            n = 0
            try:
                os.makedirs(staging, exist_ok=True)
                for out_prefix, ins in self._compact_plan(prefixes):
                    files = [
                        os.path.join(cur, f)
                        for f in os.listdir(cur)
                        if f.endswith(".parquet")
                        and f.split("-", 1)[0] in ins
                    ]
                    if not files:
                        continue
                    out = os.path.join(staging, "_out")
                    self.spark.read.parquet(*files).coalesce(
                        target_files
                    ).write.mode("overwrite").parquet(out)
                    i = 0
                    for name in sorted(os.listdir(out)):
                        if name.endswith(".parquet"):
                            os.replace(
                                os.path.join(out, name),
                                os.path.join(
                                    staging,
                                    f"{out_prefix}-{version}-{i}.parquet",
                                ),
                            )
                            n += 1
                            i += 1
                    shutil.rmtree(out, ignore_errors=True)
                os.replace(staging, vdir)
            except BaseException:
                shutil.rmtree(staging, ignore_errors=True)
                raise
            extra = {
                k: v
                for k, v in (meta or {}).items()
                if k not in ("version", "inc_files", "batch_files")
            }
            extra["inc_files"] = []
            extra["format"] = self.FORMAT
            extra["params"] = self._params
            if "batch" in extra:
                extra["batch_files"] = []
            self._flip(version, extra)
            return n

    def retain_recent(self, k_commits: int) -> int:
        """RETENTION HORIZON — rewrite the store keeping only the rows
        introduced by the newest ``k_commits`` snapshot versions (every
        table prefix, version-consistent), dropping everything older.
        This is the bounded-history form every store in the family
        needs operationally: dedup against the last K ingest days
        instead of forever (content re-crawled after the horizon is
        eligible again), drift baselines that follow the recent corpus,
        and data-retention compliance for stores whose rows derive from
        expired source data.

        Expiry is by FIRST-SEEN commit: a union-merge store (e.g.
        :class:`FingerprintStore`) records a fingerprint only in the
        commit that introduced it, so a duplicate re-presented inside
        the horizon does NOT refresh its recency — refreshing would
        rewrite immutable history, the same tradeoff the first-day-wins
        emission contract documents. A maintenance rewrite (compact /
        fold / prune / an earlier retention) consolidates surviving
        rows into one version, which then counts as a single "commit"
        toward later horizons — log-compaction semantics.

        Runs under the store lock via the :meth:`_rewrite_snapshot`
        contract (atomic flip, batch watermark survives, dropped
        batches replay empty). Returns the new snapshot's file count.
        """
        import os

        if k_commits < 1:
            raise ValueError(
                f"retain_recent: k_commits must be >= 1, got {k_commits}"
            )

        def tables():
            cur = self._current_dir()
            files = [
                f for f in os.listdir(cur) if f.endswith(".parquet")
            ]
            versions = sorted({f.split("-")[1] for f in files})
            keep = set(versions[-k_commits:])
            out = []
            for p in sorted({f.split("-", 1)[0] for f in files}):
                kept = [
                    os.path.join(cur, f)
                    for f in files
                    if f.split("-", 1)[0] == p
                    and f.split("-")[1] in keep
                ]
                if kept:
                    out.append((p, self.spark.read.parquet(*kept)))
            return out

        return self._rewrite_snapshot(tables)

    def _rewrite_snapshot(self, tables_fn) -> int:
        """Publish a new snapshot containing ONLY the tables returned
        by ``tables_fn()`` — [(prefix, df)] — with no hard-linked
        history: the semantic-compaction primitive for stores whose
        merged state has a bounded closed form (keep-min minima,
        OR-merged bloom words). The callable runs UNDER the store lock
        so the merged frames list the snapshot files no concurrent
        absorb can be mid-flight over; this method handles staging,
        atomic flip, and the quiesced-maintenance meta contract (batch
        watermark survives, emission files do not). Returns the new
        snapshot's file count."""
        import os
        import shutil
        import uuid

        with self._locked():
            cur = self._current_dir()
            if cur is None:
                return 0
            tables = tables_fn()
            meta = self._store.current_meta(self.path)
            version = self._store.next_version(meta)
            vdir = os.path.join(self.path, version)
            if os.path.exists(vdir):  # orphan of a crashed commit
                shutil.rmtree(vdir, ignore_errors=True)
            staging = os.path.join(
                self.path, f".staging-{uuid.uuid4().hex[:8]}"
            )
            try:
                os.makedirs(staging, exist_ok=True)
                n = 0
                for prefix, df in tables:
                    out = os.path.join(staging, "_out")
                    df.coalesce(1).write.mode("overwrite").parquet(out)
                    i = 0
                    for name in sorted(os.listdir(out)):
                        if name.endswith(".parquet"):
                            os.replace(
                                os.path.join(out, name),
                                os.path.join(
                                    staging,
                                    f"{prefix}-{version}-{i}.parquet",
                                ),
                            )
                            n += 1
                            i += 1
                    shutil.rmtree(out, ignore_errors=True)
                os.replace(staging, vdir)
            except BaseException:
                shutil.rmtree(staging, ignore_errors=True)
                raise
            extra = {
                k: v
                for k, v in (meta or {}).items()
                if k not in ("version", "inc_files", "batch_files")
            }
            extra["inc_files"] = []
            extra["format"] = self.FORMAT
            extra["params"] = self._params
            if "batch" in extra:
                extra["batch_files"] = []
            self._flip(version, extra)
            return n


class FingerprintStore(_SnapshotArtifactStore):
    """Persisted corpus fingerprint set for INCREMENTAL exact dedup —
    the daily-ingest workflow at corpus scale: dedup today's increment
    against everything ever absorbed WITHOUT rescanning the historical
    corpus. The artifact is a parquet set of ``normalized_fingerprint``
    values (16-byte md5 hex per distinct document ever seen — never the
    text), committed under the shared :class:`_SnapshotArtifactStore`
    snapshot protocol: readers resolve the ``_current`` pointer,
    writers serialize on the store lock, build the next version
    completely and flip it with one ``os.replace``, so a crash
    mid-absorb leaves readers on the old complete set and a retry
    redoes the increment. (One commit protocol for all three
    incremental stores — this class adds only the fingerprint
    semantics plus ``seen()``/``compact()``.)

    Two scale properties make this the 100-TB shape:

    * the anti-join probes ONE fixed-width column of the store against
      the increment — cost scales with increment + fingerprint count,
      not corpus text bytes;
    * ``absorb`` never rewrites history: the next version HARD-LINKS
      the previous version's immutable parquet files and adds one new
      file for the increment's fresh fingerprints, so per-day I/O is
      O(increment), while version flips stay atomic (same technique as
      snapshot-by-hardlink backup tools; falls back to copy where the
      filesystem refuses links).

    Unlike the rollup store (whose publish GCs superseded versions
    immediately), absorb RETAINS old snapshots — each is just
    directory entries over the shared immutable files — so survivor
    DataFrames returned by earlier absorbs stay readable, exactly the
    snapshot-until-vacuum contract of a lakehouse table. ``vacuum``
    reclaims superseded versions explicitly.

    Winner semantics are FIRST-DAY-WINS: a fingerprint's survivor is
    the min id within the first increment that introduced it, and
    later increments re-presenting it emit nothing even with a smaller
    id (history is immutable — re-adjudicating winners would rewrite
    already-emitted data downstream). This can differ from batch
    ``exact_dedup`` over the concatenated corpus, whose winner is the
    GLOBAL min id; the sequential contract is property-tested.
    """

    # format 2 = normalized (id, fp, dup_count) survivor files +
    # 'batch_files' replay meta; stores written by format-less code
    # are REFUSED on open (reopening one silently broke the
    # exactly-once emission contract before the stamp existed)
    FORMAT = 2
    _EMIT_COLS = ("fp", "dup_count")

    def __init__(self, spark, path: str, normalize: bool = True):
        # normalize=True (the document default) fingerprints the
        # whitespace-collapsed lowercased text (exact_dedup's key);
        # normalize=False fingerprints the RAW text — the
        # chunk-granularity contract, where batch chunk_dedup
        # adjudicates on the exact chunk string and case-folding here
        # would silently dedup chunks the batch path keeps. The choice
        # is part of the artifact, so it rides the params pin.
        self.normalize = normalize
        params = ["fp-v2"] if normalize else ["fp-v2", "raw"]
        super().__init__(spark, path, params, "FingerprintStore")

    # legacy seam name: fault-injection tests predate the shared base
    @property
    def _absorb_fault(self):
        return self._commit_fault

    @_absorb_fault.setter
    def _absorb_fault(self, fn):
        self._commit_fault = fn

    def _emission_schema(self, id_col: str) -> str:
        return f"{id_col} long, fp string, dup_count long"

    def seen(self) -> DataFrame:
        """The committed fingerprint set (column ``fp``); empty if
        nothing was ever absorbed. Reads the whole current snapshot
        dir — increment (``surv-``) and consolidated (``compact-``)
        files share one normalized schema."""
        d = self._current_dir()
        if d is None:
            return self.spark.createDataFrame([], "fp string")
        return self.spark.read.parquet(d).select("fp")

    # NULL text fingerprints to NULL, and a NULL key NEVER matches in
    # the anti-join — without this sentinel a null-text document would
    # come back "fresh" every day forever, silently diverging from
    # batch exact_dedup (whose groupBy treats NULL as one key). The
    # sentinel cannot collide: real fingerprints are 32 hex chars.
    NULL_FP = "<null-text>"

    def dedup_increment(
        self, new_docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Survivors of ``new_docs`` against the store AND within the
        increment (min-id winner per fingerprint, the same rule as
        :func:`exact_dedup`, including NULL text collapsing to one
        survivor via the ``NULL_FP`` sentinel). Pure read — no state
        change. Output: (id, fp, dup_count) where dup_count counts the
        increment's internal copies."""
        fp_expr = (
            normalized_fingerprint(text_col)
            if self.normalize
            else F.md5(F.col(text_col))
        )
        inc = new_docs.select(
            F.col(id_col),
            F.coalesce(fp_expr, F.lit(self.NULL_FP)).alias("fp"),
        )
        fresh = inc.join(self.seen(), "fp", "left_anti")
        return (
            fresh.groupBy("fp")
            .agg(
                F.min(id_col).alias(id_col),
                F.count(F.lit(1)).alias("dup_count"),
            )
            .select(id_col, "fp", "dup_count")
        )

    def absorb(
        self,
        new_docs: DataFrame,
        id_col: str,
        text_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Dedup the increment, then commit it under the shared
        snapshot protocol: next version = hard links to every previous
        parquet file + one new ``surv`` file holding the increment's
        survivors (id, fp, dup_count — the fp column is what ``seen``
        reads; the id/count columns make the commit itself the
        survivor record, stored NORMALIZED so increments absorbed
        under different id column names never leave mixed schemas).
        Returns the survivors AS READ FROM THE COMMITTED FILES — never
        a lazy plan over the pre-commit store — so the result stays
        stable and re-readable across later absorbs (until a
        ``vacuum`` reclaims the snapshot).

        ``batch_id`` makes the commit EXACTLY-ONCE under streaming
        replay (the ``foreachBatch`` contract: a failed sink
        re-delivers the same batch with the same id). The id rides the
        atomic pointer flip — "survivors committed" and "batch
        recorded" are one event — so a replayed batch never
        re-absorbs: it re-reads the survivor files its original commit
        recorded (``batch_files``) and returns them again, and a batch
        below the committed watermark returns empty (its effects and
        emission already happened). A post-compact replay of the
        committed batch returns empty — compaction is quiesced
        maintenance. Same discipline as the rollup merge sink's
        high-watermark (streaming/ingest.py)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            survivors = self.dedup_increment(new_docs, id_col, text_col)
            norm = survivors.select(
                F.col(id_col).alias("id"), "fp", "dup_count"
            )
            return self._commit_increment(
                meta, [("surv", norm)], id_col, batch_id
            )

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """An exactly-once ``foreachBatch`` function: each micro-batch
        is absorbed under its batch id (replay-safe, see
        :meth:`absorb`) and the committed survivors handed to
        ``emit(survivors_df, batch_id)`` — streaming dedup of a live
        feed against the FULL persisted corpus history, not just the
        running query's own state (the complement of
        ``streaming_exact_dedup``, whose state store starts empty at
        every new checkpoint).

        Usage::

            stream.writeStream.foreachBatch(
                store.foreach_batch("doc_id", "text", emit)
            ).start()
        """

        def fn(batch_df, batch_id):
            survivors = self.absorb(
                batch_df, id_col, text_col, batch_id=int(batch_id)
            )
            emit(survivors, int(batch_id))

        return fn

    def _compact_plan(self, prefixes: list) -> list:
        """One logical table spread across ``surv`` emission files
        (plus any pre-unification ``compact`` outputs): fold them all
        into a single consolidated ``surv`` file set."""
        return [("surv", list(prefixes))]


class NearDupStore(_SnapshotArtifactStore):
    """Persisted MinHash band-table + shingle-set artifact for
    INCREMENTAL near-dup — the FingerprintStore pattern applied to LSH.
    Reference behavior: the whole-corpus path is
    :func:`minhash_lsh_pairs` (candidates from the banded equi-join,
    exact-Jaccard verification); a daily curation pipeline cannot
    re-run it over corpus history every ingest (linear in corpus text),
    so the store persists, per RETAINED document, exactly the two
    fixed-width tables that pipeline needs:

    * ``band``  — (id, band_id, band_key): the banded-LSH index.
      Probing an increment is ONE equi-join on (band_id, band_key)
      against this table — at cluster scale, write it bucketed by
      band_key so only the increment shuffles.
    * ``set``   — (id, hs_set array<long>, n): the hashed shingle sets
      for exact-Jaccard verification of the (small) candidate list —
      a candidate-driven join on id, never a corpus scan.

    Both carry a few hundred longs per document — orders of magnitude
    smaller than the text they index; per-day commit I/O is
    O(increment) (history rides as hard links under the same
    VersionedStore snapshot protocol as :class:`FingerprintStore`:
    atomic ``_current`` flip, snapshot-until-vacuum reads, crash
    mid-absorb leaves readers on the old complete artifact).

    Winner semantics are FIRST-DAY-WINS AGAINST RETAINED SURVIVORS:
    an increment document is a duplicate iff its exact Jaccard with
    some STORED document reaches the threshold; among the remainder,
    within-increment near-dup clusters (connected components of the
    verified pair graph, the same rule as ``dedup_clusters``) keep the
    min id. Only survivors are stored — dropped documents never become
    comparison targets, the standard "compare against the kept corpus"
    curation contract. Because near-dup is NOT transitive, this can
    differ from whole-corpus LSH + clustering over the concatenated
    history (a doc D may near-match a dropped dup of survivor S
    without near-matching S): the sequential model, not the batch
    recompute, is the contract, property-tested in tests.
    """

    def __init__(
        self,
        spark,
        path: str,
        k: int = 8,
        num_hashes: int = DEFAULT_NUM_HASHES,
        bands: int = DEFAULT_BANDS,
        threshold_x1000: int = 500,
        max_bucket_size: int | None = None,
    ):
        self.k = k
        self.num_hashes = num_hashes
        self.n_bands = bands
        self.threshold_x1000 = threshold_x1000
        self.max_bucket_size = max_bucket_size
        super().__init__(
            spark, path, [k, num_hashes, bands, threshold_x1000],
            "NearDupStore",
        )

    SET_SCHEMA = "id long, hs_set array<long>, n long"
    BAND_SCHEMA = "id long, band_id int, band_key string"
    SURV_SCHEMA = "id long, n_members long"

    def sets(self) -> DataFrame:
        """(id, hs_set, n) for every retained document."""
        return self._table("set", self.SET_SCHEMA)

    def bands(self) -> DataFrame:
        """(id, band_id, band_key) banded-LSH index of retained docs."""
        return self._table("band", self.BAND_SCHEMA)

    def _jacc(self, common, n1, n2):
        # floor, not cast: DuckDB's double->BIGINT cast rounds while
        # Spark's truncates — floor is identical in both engines
        return F.floor((common * 1000) / (n1 + n2 - common)).cast("long")

    def _increment_parts(self, new_docs: DataFrame, id_col: str, text_col: str):
        """(survivors, sets_inc, sig_inc) for one increment; sets_inc
        is persisted — the caller unpersists after consuming."""
        sets_inc = hashed_shingle_sets(
            new_docs, id_col, text_col, self.k
        ).persist()
        sig_inc = minhash_signatures(
            sets_inc.select(F.col(id_col), F.explode("hs_set").alias("hs")),
            id_col,
            self.num_hashes,
        ).persist()
        bands_inc = band_rows(sig_inc, id_col, self.num_hashes, self.n_bands)
        # --- history probe: equi-join on the persisted band index ----
        cand = (
            bands_inc.select(
                F.col(id_col).alias("d_new"), "band_id", "band_key"
            )
            .join(
                self.bands().select(
                    F.col("id").alias("d_old"), "band_id", "band_key"
                ),
                ["band_id", "band_key"],
            )
            .select("d_new", "d_old")
            .distinct()
        )
        a = sets_inc.select(
            F.col(id_col).alias("d_new"),
            F.col("hs_set").alias("s1"),
            F.col("n").alias("n1"),
        )
        b = self.sets().select(
            F.col("id").alias("d_old"),
            F.col("hs_set").alias("s2"),
            F.col("n").alias("n2"),
        )
        common = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
        hist_dup = (
            cand.join(a, "d_new")
            .join(b, "d_old")
            .where(
                self._jacc(common, F.col("n1"), F.col("n2"))
                >= self.threshold_x1000
            )
            .select(F.col("d_new").alias(id_col))
            .distinct()
            # shared ONCE: the dup-id list is bounded by the
            # increment, but its lineage is the whole history probe +
            # exact-Jaccard verify, and it feeds BOTH anti-joins below
            # (ok_sets and sig_ok). A lazy persist (r13: was an eager
            # localCheckpoint) lets the block cache dedup the two
            # consumers inside the pair-set materialization job
            # instead of paying a separate serial probe job up front.
            .persist()
        )
        # --- within-increment clusters among the remainder -----------
        ok_sets = sets_inc.join(hist_dup, id_col, "left_anti").persist()
        sig_ok = sig_inc.join(hist_dup, id_col, "left_anti")
        cand_in = lsh_candidate_pairs(
            sig_ok, id_col, self.num_hashes, self.n_bands,
            self.max_bucket_size,
        )
        p1 = ok_sets.select(
            F.col(id_col).alias("d1"),
            F.col("hs_set").alias("s1"),
            F.col("n").alias("n1"),
        )
        p2 = ok_sets.select(
            F.col(id_col).alias("d2"),
            F.col("hs_set").alias("s2"),
            F.col("n").alias("n2"),
        )
        pairs = (
            cand_in.join(p1, "d1")
            .join(p2, "d2")
            .where(
                self._jacc(common, F.col("n1"), F.col("n2"))
                >= self.threshold_x1000
            )
            .select("d1", "d2")
        )
        cc = duplicate_clusters(pairs, ok_sets.select(id_col), id_col)
        survivors = (
            cc.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
            .select(F.col("cluster").cast("long").alias(id_col), "n_members")
        )
        return survivors, sets_inc, sig_inc, ok_sets

    def dedup_increment(
        self, new_docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Survivors of ``new_docs`` against the stored corpus and
        within the increment. Pure read — no state change. Output:
        (id, n_members) where n_members counts the within-increment
        near-dup cluster the survivor represents (1 = unique).
        NOTE: runs the iterative CC driver loop — eager, like
        ``dedup_clusters``."""
        surv, sets_inc, sig_inc, ok_sets = self._increment_parts(
            new_docs, id_col, text_col
        )
        out = surv.localCheckpoint()
        for df in (sets_inc, sig_inc, ok_sets):
            df.unpersist()
        return out

    def absorb(
        self,
        new_docs: DataFrame,
        id_col: str,
        text_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Dedup the increment, then commit the survivors' band + set
        rows (plus the (id, n_members) emission record) as the next
        snapshot: hard links to every previous parquet file + new files
        for the increment only. Returns the survivors AS READ FROM THE
        COMMITTED FILES. ``batch_id`` gives the same exactly-once
        foreachBatch replay contract as
        :meth:`FingerprintStore.absorb` (the id and the committed
        emission-file names ride the atomic pointer flip)."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            surv, sets_inc, sig_inc, ok_sets = self._increment_parts(
                new_docs, id_col, text_col
            )
            # survivors drive three artifact writes — materialize once
            # so the CC result (already eager) isn't re-derived per
            # write
            surv = surv.persist()
            try:
                surv_ids = surv.select(F.col(id_col))
                new_sets = sets_inc.join(
                    surv_ids, id_col, "left_semi"
                ).select(
                    F.col(id_col).cast("long").alias("id"),
                    "hs_set",
                    F.col("n").cast("long").alias("n"),
                )
                new_bands = band_rows(
                    sig_inc.join(surv_ids, id_col, "left_semi"),
                    id_col,
                    self.num_hashes,
                    self.n_bands,
                ).select(
                    F.col(id_col).cast("long").alias("id"),
                    "band_id",
                    "band_key",
                )
                new_surv = surv.select(
                    F.col(id_col).cast("long").alias("id"), "n_members"
                )
                return self._commit_increment(
                    meta,
                    [
                        ("set", new_sets),
                        ("band", new_bands),
                        ("surv", new_surv),
                    ],
                    id_col,
                    batch_id,
                )
            finally:
                for df in (sets_inc, sig_inc, ok_sets, surv):
                    df.unpersist()

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch`` near-dup sink: each
        micro-batch absorbed under its batch id, committed survivors
        handed to ``emit(survivors_df, batch_id)`` — streaming near-dup
        curation against the FULL persisted corpus history."""

        def fn(batch_df, batch_id):
            survivors = self.absorb(
                batch_df, id_col, text_col, batch_id=int(batch_id)
            )
            emit(survivors, int(batch_id))

        return fn


class EmbNearDupStore(_SnapshotArtifactStore):
    """Persisted hyperplane-LSH bucket + vector artifact for
    INCREMENTAL embedding-cosine near-dup — the third member of the
    daily-ingest store family (:class:`FingerprintStore`: exact;
    :class:`NearDupStore`: MinHash/Jaccard; this: embedding cosine).
    The whole-corpus path is
    :func:`~.similarity.embedding_cosine_dedup` (LSH-bucketed pair
    search) — linear in corpus history per run; the store instead
    persists, per RETAINED vector, exactly what the daily probe needs:

    * ``bucket`` — (id, bucket): the random-hyperplane LSH bucket.
      Probing an increment is ONE equi-join on ``bucket`` — at cluster
      scale, lay the table out bucketed by ``bucket`` so only the
      increment shuffles.
    * ``vec``    — (id, embedding array<double>): exact-cosine
      verification targets for the (small) candidate list — a
      candidate-driven join on id, never a corpus scan.

    Winner semantics are FIRST-DAY-WINS AGAINST RETAINED SURVIVORS: an
    increment vector is a duplicate iff its exact cosine with some
    STORED vector reaches the threshold (candidates restricted to
    bucket-mates, the same recall contract as the batch operator);
    among the remainder, within-increment clusters (connected
    components of the verified same-bucket pair graph) keep the min
    id. Cosine near-dup is NOT transitive, so this sequential model is
    the contract — divergence from a whole-corpus batch recompute over
    concatenated history is documented and tested, exactly as for
    :class:`NearDupStore`. All arithmetic is ordered-fold double
    precision (`similarity` module float discipline), so a SQL oracle
    reproduces every comparison bit-for-bit.
    """

    BUCKET_SCHEMA = "id long, bucket long"
    VEC_SCHEMA = "id long, embedding array<double>"
    SURV_SCHEMA = "id long, n_members long"

    def __init__(self, spark, path: str, threshold_x1e6: int = 300_000):
        from .similarity import LSH_BITS

        self.threshold_x1e6 = threshold_x1e6
        # "planes-v1" pins the hyperplane family (seeded Rademacher
        # signs baked into similarity.LSH_PLANES) — regenerating the
        # planes differently is an artifact-format change
        super().__init__(
            spark, path, ["planes-v1", LSH_BITS, threshold_x1e6],
            "EmbNearDupStore",
        )

    def vectors(self) -> DataFrame:
        """(id, embedding) for every retained vector."""
        return self._table("vec", self.VEC_SCHEMA)

    def buckets(self) -> DataFrame:
        """(id, bucket) hyperplane-LSH index of retained vectors."""
        return self._table("bucket", self.BUCKET_SCHEMA)

    def _sim(self, a, b):
        from .similarity import cosine

        return F.round(cosine(a, b) * 1e6).cast("long")

    def _increment_parts(self, new_vecs: DataFrame, id_col: str, vec_col: str):
        """(survivors, inc, ok) for one increment; ``inc`` and ``ok``
        are persisted — the caller unpersists after consuming."""
        from .similarity import lsh_bucket

        inc = new_vecs.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_e"),
            lsh_bucket(vec_col).alias("_b"),
        ).persist()
        # --- history probe: equi-join on the persisted bucket index --
        cand = (
            inc.select(F.col(id_col).alias("d_new"), "_b")
            .join(
                self.buckets().select(
                    F.col("id").alias("d_old"), F.col("bucket").alias("_b")
                ),
                "_b",
            )
            .select("d_new", "d_old")
            .distinct()
        )
        a = inc.select(F.col(id_col).alias("d_new"), F.col("_e").alias("e1"))
        b = self.vectors().select(
            F.col("id").alias("d_old"), F.col("embedding").alias("e2")
        )
        hist_dup = (
            cand.join(a, "d_new")
            .join(b, "d_old")
            .where(self._sim(F.col("e1"), F.col("e2")) >= self.threshold_x1e6)
            .select(F.col("d_new").alias(id_col))
            .distinct()
        )
        # --- within-increment clusters among the remainder -----------
        ok = inc.join(hist_dup, id_col, "left_anti").persist()
        p1 = ok.select(
            F.col(id_col).alias("d1"), F.col("_e").alias("e1"), "_b"
        )
        p2 = ok.select(
            F.col(id_col).alias("d2"), F.col("_e").alias("e2"), "_b"
        )
        pairs = (
            p1.join(p2, "_b")
            .where(F.col("d1") < F.col("d2"))
            .where(self._sim(F.col("e1"), F.col("e2")) >= self.threshold_x1e6)
            .select("d1", "d2")
        )
        cc = duplicate_clusters(pairs, ok.select(id_col), id_col)
        survivors = (
            cc.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
            .select(F.col("cluster").cast("long").alias(id_col), "n_members")
        )
        return survivors, inc, ok

    def dedup_increment(
        self, new_vecs: DataFrame, id_col: str, vec_col: str
    ) -> DataFrame:
        """Survivors of ``new_vecs`` against the stored corpus and
        within the increment. Pure read — no state change. Output:
        (id, n_members) where n_members counts the within-increment
        near-dup cluster the survivor represents (1 = unique).
        NOTE: runs the iterative CC driver loop — eager, like
        ``dedup_clusters``."""
        surv, inc, ok = self._increment_parts(new_vecs, id_col, vec_col)
        out = surv.localCheckpoint()
        for df in (inc, ok):
            df.unpersist()
        return out

    def absorb(
        self,
        new_vecs: DataFrame,
        id_col: str,
        vec_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Dedup the increment, then commit the survivors' bucket +
        vector rows (plus the (id, n_members) emission record) as the
        next snapshot. Same exactly-once ``batch_id`` replay contract
        as :meth:`NearDupStore.absorb`."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            surv, inc, ok = self._increment_parts(new_vecs, id_col, vec_col)
            surv = surv.persist()
            try:
                surv_ids = surv.select(F.col(id_col))
                keep = inc.join(surv_ids, id_col, "left_semi")
                new_vec = keep.select(
                    F.col(id_col).cast("long").alias("id"),
                    F.col("_e").alias("embedding"),
                )
                new_bucket = keep.select(
                    F.col(id_col).cast("long").alias("id"),
                    F.col("_b").alias("bucket"),
                )
                new_surv = surv.select(
                    F.col(id_col).cast("long").alias("id"), "n_members"
                )
                return self._commit_increment(
                    meta,
                    [
                        ("vec", new_vec),
                        ("bucket", new_bucket),
                        ("surv", new_surv),
                    ],
                    id_col,
                    batch_id,
                )
            finally:
                for df in (inc, ok, surv):
                    df.unpersist()

    def foreach_batch(self, id_col: str, vec_col: str, emit):
        """Exactly-once ``foreachBatch`` embedding near-dup sink: each
        micro-batch absorbed under its batch id, committed survivors
        handed to ``emit(survivors_df, batch_id)``."""

        def fn(batch_df, batch_id):
            survivors = self.absorb(
                batch_df, id_col, vec_col, batch_id=int(batch_id)
            )
            emit(survivors, int(batch_id))

        return fn


def ppjoin_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold_x1000: int = 900,
) -> DataFrame:
    """EXACT set-similarity join by prefix filtering — the
    AllPairs/PPJoin family (Bayardo, Ma & Srikant WWW'07; Xiao et al.
    WWW'08): every document pair whose token-set Jaccard reaches the
    threshold, WITHOUT the all-pairs comparison and WITHOUT
    approximation. This is the exact counterpart to the MinHash-LSH
    operator: LSH trades recall for speed; prefix filtering keeps
    100% recall by a pigeonhole argument — order each document's
    tokens by ascending global document frequency (rarest first,
    ties by token), keep only the first ``|d| - ceil(t*|d|) + 1``
    as its PREFIX; any pair with Jaccard >= t shares at least
    ``ceil(t*max(|x|,|y|))`` tokens, so removing fewer than that
    many from either side must leave a shared token in BOTH prefixes.
    Candidates therefore come from ONE equi-join on prefix tokens
    only, and rarest-first ordering makes those join keys the
    LOW-frequency tokens — tiny buckets by construction, the skew
    story inverted in our favor. Survivors verify EXACTLY.

    The driver gate's oracle computes the same pair set by brute
    force: a green hash is a machine-checked proof that the prefix
    filter was LOSSLESS on this corpus, not just fast.

    Plan shape: token df is one partial-aggregated exchange
    (vocabulary-sized); per-doc ordering is a window partitioned BY
    DOCUMENT (no global sort anywhere — the (df, tok) pair IS the
    order key, so no global rank materializes); the candidate join
    and the two verification joins are all equi-joins keyed on
    prefix tokens / pair ids. Nothing is quadratic in the corpus;
    work scales with candidates, which the threshold controls.

    Candidate pruning (r11 verdict #3 — the filters that make the
    PPJoin name honest, Xiao et al. WWW'08 sections 3-4; both prune
    BEFORE the expensive verification joins and neither can change
    the output, because each rejects only pairs provably below
    threshold):

    - LENGTH filter: J(x,y) <= min|/max|, so J >= t forces
      ``1000*min(|x|,|y|) >= t_x1000 * max(|x|,|y|)`` — applied
      inside the candidate equi-join, before the pair dedup.
    - POSITIONAL filter: J >= t forces overlap
      ``O >= alpha = ceil(t*(|x|+|y|)/(1+t))``. For a shared prefix
      token at (1-based) ranks (i, j) under the GLOBAL token order,
      every OTHER shared token sorts either before it in BOTH docs
      (at most ``min(i-1, j-1)`` such) or after it in BOTH (at most
      ``min(|x|-i, |y|-j)``), so
      ``O <= 1 + min(i-1, j-1) + min(|x|-i, |y|-j)`` — a sound
      symmetric per-match form of the paper's scan-time bound that
      distributes as a projection. A pair survives only if SOME
      shared prefix token's bound reaches alpha (max-aggregated in
      the same groupBy that dedups candidate pairs).

    Output: (d1, d2, inter, jacc_x1000) — d1 < d2, exact floored
    fixed-point Jaccard, only pairs at or above the threshold.
    """
    from .analytics import ceil_div, floor_div

    if not 0 < threshold_x1000 <= 1000:
        raise ValueError(
            f"threshold_x1000 must be in (0, 1000], got {threshold_x1000}"
        )
    t = F.lit(int(threshold_x1000))
    toks = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "tok")
    pref = (
        toks.join(dfreq, "tok")
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, "_id")
        .where(
            F.col("_pos")
            <= F.col("_n") - ceil_div(t * F.col("_n"), F.lit(1000)) + 1
        )
        .select("_id", "tok", "_pos", "_n")
    )
    p1 = pref.select(
        F.col("_id").alias("d1"),
        "tok",
        F.col("_pos").alias("_i1"),
        F.col("_n").alias("_cn1"),
    )
    p2 = pref.select(
        F.col("_id").alias("d2"),
        "tok",
        F.col("_pos").alias("_i2"),
        F.col("_n").alias("_cn2"),
    )
    matches = (
        p1.join(p2, "tok")
        .where(F.col("d1") < F.col("d2"))
        # length filter: kills size-mismatched pairs at the join
        .where(
            F.lit(1000) * F.least("_cn1", "_cn2")
            >= t * F.greatest("_cn1", "_cn2")
        )
    )
    alpha = ceil_div(
        t * (F.col("_cn1") + F.col("_cn2")), F.lit(1000) + t
    )
    ubound = (
        F.lit(1)
        + F.least(F.col("_i1") - 1, F.col("_i2") - 1)
        + F.least(
            F.col("_cn1") - F.col("_i1"), F.col("_cn2") - F.col("_i2")
        )
    )
    cand = (
        matches.select(
            "d1", "d2", ubound.alias("_ub"), alpha.alias("_alpha")
        )
        # positional filter folded into the pair dedup: one groupBy
        # replaces the old .distinct(), so the filter costs no extra
        # shuffle — and candidates it rejects never reach the two
        # verification joins below
        .groupBy("d1", "d2")
        .agg(F.max("_ub").alias("_ub"), F.first("_alpha").alias("_alpha"))
        .where(F.col("_ub") >= F.col("_alpha"))
        .select("d1", "d2")
    )
    t1 = toks.select(F.col("_id").alias("d1"), "tok")
    t2 = toks.select(F.col("_id").alias("d2"), "tok")
    inter = (
        cand.join(t1, "d1")
        .join(t2, ["d2", "tok"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    s1 = sizes.select(F.col("_id").alias("d1"), F.col("_n").alias("_n1"))
    s2 = sizes.select(F.col("_id").alias("d2"), F.col("_n").alias("_n2"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "inter",
            floor_div(
                F.lit(1000) * F.col("inter"),
                F.col("_n1") + F.col("_n2") - F.col("inter"),
            ).alias("jacc_x1000"),
        )
        .where(F.col("jacc_x1000") >= threshold_x1000)
    )


def hashed_token_sets(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, tok_set, n): each document's DISTINCT whitespace tokens as
    an ASCENDING-sorted array of portable 60-bit md5 hashes — the
    exact-Jaccard unit of :func:`ppjoin_pairs`' incremental twin. The
    ascending hash order IS the prefix-filter total order (see
    :class:`PrefixJoinStore`: a fixed universal order is what makes
    prefixes stable across absorbs).

    EVERY input document gets a row — a whitespace-only / null-text
    doc carries an EMPTY set (n = 0). Dropping it instead would make
    the store silently lose the doc (it can never pair with anything,
    so the sequential model says: singleton survivor), diverging from
    any from-scratch replay that seeds clustering from the full doc
    list (r11 review finding)."""
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("_t"),
        )
        .where(F.col("_t") != "")
        .select("id", md5_long(F.col("_t")).alias("_h"))
        .distinct()
    )
    sets = toks.groupBy("id").agg(
        F.sort_array(F.collect_set("_h")).alias("tok_set"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(sets, "id", "left")
        .select(
            "id",
            F.coalesce(
                "tok_set", F.array().cast("array<long>")
            ).alias("tok_set"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


class PrefixJoinStore(_SnapshotArtifactStore):
    """Persisted prefix-filter index + token-set artifact for
    INCREMENTAL EXACT-Jaccard near-dup — the third member of the
    daily-ingest dedup trio (LSH bands = approximate-recall near-dup,
    exact-substring chunks = containment, THIS = exact-threshold set
    similarity), on the same snapshot protocol and the same
    first-day-wins sequential winner semantics as
    :class:`NearDupStore`.

    THE INCREMENTAL-PREFIX INSIGHT: batch PPJoin orders tokens by
    ascending document frequency (a performance heuristic — rare
    tokens make small candidate buckets), but df DRIFTS as the corpus
    grows, and the pigeonhole theorem requires BOTH compared prefixes
    under ONE total order — an old document's persisted df-order
    prefix can silently lose the completeness guarantee against a new
    document's prefix computed under the new df. The theorem holds
    for ANY fixed total order, so the store pins the order to the
    TOKEN HASH ITSELF (ascending md5 — a universal, corpus-independent
    order): every document's prefix is a pure function of its own
    token set, fixed forever at absorb time, and exactness survives
    arbitrarily many increments. The price is df-oblivious (random)
    prefix tokens instead of rare ones — candidate buckets are
    average-sized rather than minimal — which is the documented trade
    for a soundness guarantee no drifting order can give.

    Tables, per RETAINED document:

    * ``set``  — (id, tok_set ascending array<long>, n): exact-
      verification targets (candidate-driven join, never a scan).
    * ``pref`` — (id, h): the prefix index, ``|d| - ceil(t*|d|) + 1``
      rows per doc. Probing an increment is ONE equi-join on h.

    Winner semantics: an increment doc is a duplicate iff its exact
    token Jaccard with some STORED survivor reaches the threshold;
    the remainder min-id-clusters within the increment (connected
    components of the verified pair graph). Sequential, not
    batch-recompute — the NearDupStore contract, with NO approximation
    anywhere: the gate's oracle replays the same model from scratch
    and must hash-match exactly.
    """

    SET_SCHEMA = "id long, tok_set array<long>, n long"
    PREF_SCHEMA = "id long, h long"

    def __init__(self, spark, path: str, threshold_x1000: int = 900):
        if not 0 < threshold_x1000 <= 1000:
            raise ValueError(
                f"threshold_x1000 must be in (0, 1000], got "
                f"{threshold_x1000}"
            )
        self.threshold_x1000 = int(threshold_x1000)
        super().__init__(
            spark, path, [f"ppjoin-v1:t={self.threshold_x1000}"],
            "PrefixJoinStore",
        )

    def sets(self) -> DataFrame:
        """(id, tok_set, n) for every retained document."""
        return self._table("set", self.SET_SCHEMA)

    def prefixes(self) -> DataFrame:
        """(id, h) prefix index of retained documents."""
        return self._table("pref", self.PREF_SCHEMA)

    def _prefix_rows(self, sets: DataFrame) -> DataFrame:
        from .analytics import ceil_div

        p = F.col("n") - ceil_div(
            F.lit(self.threshold_x1000) * F.col("n"), F.lit(1000)
        ) + 1
        return sets.select(
            "id",
            F.explode(F.slice(F.col("tok_set"), F.lit(1), p)).alias("h"),
        )

    def _jacc(self, common, n1, n2):
        from .analytics import floor_div

        return floor_div(common * 1000, n1 + n2 - common)

    def _increment_parts(self, new_docs, id_col, text_col):
        sets_inc = hashed_token_sets(new_docs, id_col, text_col).persist()
        pref_inc = self._prefix_rows(sets_inc)
        # --- history probe: ONE equi-join on the persisted prefix ----
        cand = (
            pref_inc.select(F.col("id").alias("d_new"), "h")
            .join(
                self.prefixes().select(F.col("id").alias("d_old"), "h"),
                "h",
            )
            .select("d_new", "d_old")
            .distinct()
        )
        a = sets_inc.select(
            F.col("id").alias("d_new"),
            F.col("tok_set").alias("s1"),
            F.col("n").alias("n1"),
        )
        b = self.sets().select(
            F.col("id").alias("d_old"),
            F.col("tok_set").alias("s2"),
            F.col("n").alias("n2"),
        )
        common = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
        hist_dup = (
            cand.join(a, "d_new")
            .join(b, "d_old")
            .where(
                self._jacc(common, F.col("n1"), F.col("n2"))
                >= self.threshold_x1000
            )
            .select(F.col("d_new").alias("id"))
            .distinct()
        )
        # --- within-increment clusters among the remainder -----------
        ok_sets = sets_inc.join(hist_dup, "id", "left_anti").persist()
        pref_ok = self._prefix_rows(ok_sets)
        cand_in = (
            pref_ok.select(F.col("id").alias("d1"), "h")
            .join(pref_ok.select(F.col("id").alias("d2"), "h"), "h")
            .where(F.col("d1") < F.col("d2"))
            .select("d1", "d2")
            .distinct()
        )
        p1 = ok_sets.select(
            F.col("id").alias("d1"),
            F.col("tok_set").alias("s1"),
            F.col("n").alias("n1"),
        )
        p2 = ok_sets.select(
            F.col("id").alias("d2"),
            F.col("tok_set").alias("s2"),
            F.col("n").alias("n2"),
        )
        pairs = (
            cand_in.join(p1, "d1")
            .join(p2, "d2")
            .where(
                self._jacc(common, F.col("n1"), F.col("n2"))
                >= self.threshold_x1000
            )
            .select("d1", "d2")
        )
        cc = duplicate_clusters(pairs, ok_sets.select("id"), "id")
        survivors = (
            cc.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
            .select(F.col("cluster").cast("long").alias("id"), "n_members")
        )
        return survivors, sets_inc, ok_sets

    def dedup_increment(
        self, new_docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Survivors of ``new_docs`` against the stored corpus and
        within the increment — pure read, exact Jaccard end to end.
        Output: (id, n_members). NOTE: runs the iterative CC driver
        loop — eager, like ``dedup_clusters``."""
        surv, sets_inc, ok_sets = self._increment_parts(
            new_docs, id_col, text_col
        )
        out = surv.localCheckpoint()
        for df in (sets_inc, ok_sets):
            df.unpersist()
        return out.withColumnRenamed("id", id_col)

    def absorb(
        self,
        new_docs: DataFrame,
        id_col: str,
        text_col: str,
        batch_id: int | None = None,
    ) -> DataFrame:
        """Dedup the increment, then commit the survivors' set + prefix
        rows (plus the (id, n_members) emission) as the next snapshot.
        Exactly-once under ``batch_id`` replay."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            surv, sets_inc, ok_sets = self._increment_parts(
                new_docs, id_col, text_col
            )
            surv = surv.persist()
            try:
                keep = sets_inc.join(
                    surv.select("id"), "id", "left_semi"
                )
                return self._commit_increment(
                    meta,
                    [
                        ("set", keep.select("id", "tok_set", "n")),
                        ("pref", self._prefix_rows(keep)),
                        ("surv", surv.select("id", "n_members")),
                    ],
                    id_col,
                    batch_id,
                )
            finally:
                for df in (sets_inc, ok_sets, surv):
                    df.unpersist()

    def foreach_batch(self, id_col: str, text_col: str, emit):
        """Exactly-once ``foreachBatch`` exact-Jaccard dedup sink."""

        def fn(batch_df, batch_id):
            survivors = self.absorb(
                batch_df, id_col, text_col, batch_id=int(batch_id)
            )
            emit(survivors, int(batch_id))

        return fn
