"""Text-analysis operators for document pipelines.

The reference stores no text; these are the per-document scoring
operators a training-data pipeline runs before dedup/filtering, all
expressed as built-in Catalyst expressions (split / filter / aggregate /
regexp) so they run JVM-side inside whole-stage codegen — no Python in
the hot path. The per-row scorers are shuffle-free projections over the
scan; the frequency-based scorers (top-terms, repetition) go through
explode + partial-aggregated groupBys — linear in token count, never a
per-row fold over a growing structure.

* token counting      — whitespace tokens + a BPE-ish regex token count
* quality scoring     — length / punctuation / stopword / word-length
                        signals folded into one integer score
* language ID         — stopword-hit n-gram heuristic over a fixed
                        per-language marker list (argmax with a
                        deterministic precedence order)
* fingerprinting      — rolling polynomial hash over the token stream
                        (order-sensitive, unlike a bag-of-words hash)

Integer discipline: every score is scaled+floored to integers so a SQL
oracle reproduces values exactly (no float-rounding drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_long
from .parallel import cpu_partitions

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

# tiny per-language marker lists for the n-gram/stopword heuristic;
# precedence order below breaks ties deterministically
LANG_MARKERS = {
    "en": ("the", "a", "is", "of", "and"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "les", "est"),
}
LANG_ORDER = ("en", "de", "es", "fr")

FP_MOD = 2147483647  # 2^31 - 1
FP_MUL = 31


def tokens(text_col) -> Column:
    """Non-empty whitespace tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, " "), lambda w: w != "")


def ws_token_count(text_col) -> Column:
    return F.size(tokens(text_col)).cast("long")


def bpe_token_count(text_col) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0)).cast("long")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(*words))).cast("long")


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals + composite score.

    Columns added (all BIGINT, SQL-reproducible):
      n_chars, n_tokens, avg_word_len_x100 (floored),
      stop_ratio_x1000 (floored), punct_x1000 (punctuation chars per
      1000 chars, floored), quality_x1000 — a clamped composite:
      stopword presence up-weights, extreme word lengths and punctuation
      density down-weight.
    """
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = F.size(toks).cast("long")
    total_wlen = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    awl = F.floor(total_wlen * 100 / F.greatest(n_tokens, F.lit(1)))
    stop = F.floor(
        _count_in(toks, STOPWORDS) * 1000 / F.greatest(n_tokens, F.lit(1))
    )
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", ""))
    ).cast("long")
    punct = F.floor(n_punct * 1000 / F.greatest(n_chars, F.lit(1)))
    # composite: start at 500, reward stopword ratio in [5%, 40%],
    # penalize words shorter than 2 or longer than 12 chars on average
    # and punctuation-dense text; clamp to [0, 1000]
    raw = (
        F.lit(500)
        + F.when((stop >= 50) & (stop <= 400), F.lit(300)).otherwise(F.lit(0))
        + F.when((awl >= 200) & (awl <= 1200), F.lit(200)).otherwise(F.lit(0))
        - punct
    )
    quality = F.least(F.greatest(raw, F.lit(0)), F.lit(1000)).cast("long")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("n_tokens"),
        awl.cast("long").alias("avg_word_len_x100"),
        stop.cast("long").alias("stop_ratio_x1000"),
        punct.cast("long").alias("punct_x1000"),
        quality.alias("quality_x1000"),
    )


def lang_id(text_col) -> Column:
    """Predicted language by marker-stopword hit count, argmax with
    LANG_ORDER precedence (earlier wins ties); no hits at all -> 'und'.
    """
    toks = tokens(text_col)
    hits = {
        lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()
    }
    best = None
    for lang in LANG_ORDER:
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other == lang:
                continue
            # strictly greater than later langs, >= earlier langs
            if LANG_ORDER.index(other) > LANG_ORDER.index(lang):
                cond = cond & (hits[lang] >= hits[other])
            else:
                cond = cond & (hits[lang] > hits[other])
        rule = F.when((hits[lang] > 0) & cond, F.lit(lang))
        best = rule if best is None else best.when(
            (hits[lang] > 0) & cond, F.lit(lang)
        )
    return best.otherwise(F.lit("und"))


def fingerprint(text_col) -> Column:
    """Order-sensitive rolling hash: fold h = (h*31 + md5_60bit(w) % M) % M
    over the token stream. Two documents with the same words in a
    different order fingerprint differently (unlike bag-of-words md5).
    """
    hashed = F.transform(tokens(text_col), lambda w: md5_long(w) % FP_MOD)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MUL + x) % FP_MOD,
    )


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by inverse-frequency
    weight. Output: (id, rank, term, score_x1000).

    TF-IDF-shaped but deliberately *log-free*: ``score = floor(tf *
    1000 * N / df)`` (term frequency x inverse document frequency).
    ``ln`` is the one place TF-IDF touches transcendental floats, and
    libm implementations legally differ in the last ulp — integer
    rational weighting keeps every score bit-exact in any engine while
    preserving the ranking behavior (monotone in tf and 1/df).

    Plan shape at scale: one explode + (doc, term) count [one shuffle,
    map-side partial agg], a term document-frequency aggregate over it
    [second shuffle, vocabulary-sized], a term-keyed join to attach df
    (vocabulary is Zipf-small relative to the corpus; Spark broadcasts
    it when it fits, AQE handles the skewed head terms), and the
    per-doc top-k window. Ties: higher score, then lexicographic term.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.col(text_col)
    ).repartition(cpu_partitions(df), F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        F.col("term"),
        # integral `div`, not floor(double /): the numerator reaches
        # tf*1000*N where double-division rounding could cross the
        # floor boundary; div is exact like SQL's //
        F.expr(f"(tf * 1000L * {n_docs} ) div df")
        .cast("long")
        .alias("score_x1000"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_x1000").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "rank", "term", "score_x1000")
    )


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Most-frequent-token share of all tokens per document, x1000
    floored — the Gopher-style repetition filter signal (a page that is
    one token over and over scores 1000; diverse prose scores low).

    Output: (id_col, rep_x1000), one row per input row.

    Shape: explode -> groupBy(id, term).count -> groupBy(id) — both
    aggregations partial (map-side combine) and linear in token count,
    so a 100k-token web page costs 100k tall-skinny rows, not a per-row
    fold. (The previous per-row ``F.aggregate`` + ``map_zip_with``
    formulation was interpreted per element and O(tokens x distinct
    tokens) per document — a CPU bomb on long documents.)
    ``explode_outer`` keeps empty documents as a NULL-term row, so they
    survive to the output with score 0 and no re-join against the
    input is needed — one shuffle chain end-to-end.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode_outer(tokens(text_col)).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    real = F.when(F.col("term").isNotNull(), F.col("tf"))
    per_doc = tf.groupBy(id_col).agg(
        F.max(real).alias("_m"), F.sum(real).alias("_n")
    )
    # `div` is exact integral floor-division (like SQL's //) — no
    # double-division rounding across the floor boundary
    return per_doc.select(
        F.col(id_col),
        F.coalesce(F.expr("(_m * 1000L) div _n"), F.lit(0))
        .cast("long")
        .alias("rep_x1000"),
    )


# Default PII patterns. Dialect-portable subset only: no backreferences,
# no lookaround, no \p classes — the same pattern string must compile in
# Java regex (Spark) and RE2 (DuckDB/Go scanners) with identical
# semantics, so a redaction audit can be mirrored in any engine.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
    ("long_id", r"\d{6,}", "<ID>"),
)


def redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """PII scrubbing: replace every match of each (name, regex,
    replacement) rule and count what was removed — the
    redact-before-training pass of a data-curation pipeline.

    Rules apply IN ORDER, each against the previous rule's output (an
    email must be swallowed whole by the email rule, not have its
    digits re-matched by the id rule), and each count is taken on the
    text the rule actually saw — so the counts sum to the number of
    replacements performed, auditable per rule.

    Output: every input column EXCEPT ``text_col`` (replaced by
    ``clean``), plus n_<name> per rule and ``n_redactions`` total —
    passthrough columns survive so the scrub composes mid-pipeline.

    Scale shape: a pure per-row projection — zero shuffles, zero state,
    whole-stage-codegen'd JVM regex; linear in corpus bytes and
    embarrassingly parallel, the cheapest possible 100 TB shape. The
    same projection applies unchanged to a readStream (stateless), like
    streaming/scoring.py's quality filter.

    ``id_col`` is unused beyond a schema check (kept for signature
    symmetry with the other per-document operators).
    """
    if id_col not in df.columns:
        raise ValueError(f"redact: missing id column {id_col!r}")
    out = df.withColumn("_t0", F.col(text_col))
    names = []
    for i, (name, pat, repl) in enumerate(patterns):
        prev, nxt = f"_t{i}", f"_t{i + 1}"
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(prev), F.lit(pat)).cast("long"),
        ).withColumn(nxt, F.regexp_replace(F.col(prev), pat, repl))
        names.append(name)
    total = sum((F.col(f"n_{n}") for n in names[1:]), F.col(f"n_{names[0]}"))
    passthrough = [c for c in df.columns if c != text_col]
    return out.select(
        *passthrough,
        F.col(f"_t{len(patterns)}").alias("clean"),
        *[F.col(f"n_{n}") for n in names],
        total.cast("long").alias("n_redactions"),
    )


def dup_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Fraction (x1000, floored) of token n-gram positions covered by
    grams that occur MORE THAN ONCE in the same document — the Gopher
    "duplicated n-grams" quality signal, complementary to
    :func:`repetition_scores` (top-token share): a page that interleaves
    two alternating sentences scores low on top-token share but ~1000
    here.

    Output: (id_col, n_grams, n_dup_positions, dup_x1000).

    Shape: explode gram positions at pinned parallelism, hash each gram
    to a 60-bit long (narrow shuffle), count per (id, gram), then one
    per-doc aggregate where positions of grams with count >= 2 are
    summed — both aggregations map-side partial, linear in tokens.
    Documents shorter than n tokens contribute their whole token list
    as one gram (count 1, never "duplicated") — the short-text rule the
    shingle operators share.
    """
    toks = tokens(text_col)
    npos = F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(1))
    grams = (
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
            ).alias("g"),
        )
    )
    cnt = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
        ).alias("n_dup"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_dup").cast("long").alias("n_dup_positions"),
        F.expr("(n_dup * 1000L) div n_grams").cast("long").alias("dup_x1000"),
    )


# -- vocabulary build + id-sequence encoding ---------------------------------

def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 256,
) -> DataFrame:
    """Frequency vocabulary: the ``size`` most frequent whitespace
    tokens, ranked by (global count desc, term asc) — term_id 1..size,
    with 0 reserved for OOV by convention. Output: (term, term_id,
    n_occurrences).

    The tokenizer-artifact step of a training pipeline, built with the
    same EXACT two-phase top-k discipline as split.py's samplers: rank
    within source partition first and keep each partition's local
    top-``size`` (the global top-``size`` is contained in that union —
    any excluded term is beaten ``size`` times in one partition), then
    exact-rank the ~size x partitions survivors. The term-count
    aggregate partial-combines, so neither phase ever funnels the full
    vocabulary through one task; the deterministic tiebreak makes the
    artifact reproducible anywhere.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    order = [F.col("n_occurrences").desc(), F.col("term")]
    w_local = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    survivors = (
        counts.withColumn("_lrank", F.row_number().over(w_local))
        .where(F.col("_lrank") <= size)
        .drop("_lrank")
    )
    w_global = Window.orderBy(*order)  # ~size x partitions rows only
    return (
        survivors.withColumn(
            "term_id", F.row_number().over(w_global).cast("long")
        )
        .where(F.col("term_id") <= size)
        .select("term", "term_id", F.col("n_occurrences").cast("long").alias("n_occurrences"))
    )


def vocab_encode(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every document as its token-id sequence under a built
    vocabulary (OOV -> 0): (id, n_tokens, ids) where ``ids`` is the
    space-joined id string in token order — the corpus-to-tensor
    boundary, emitted as a string so any engine can compare it
    byte-for-byte.

    Scale shape: posexplode token positions, ONE broadcast left join
    against the (bounded-size) vocabulary, then a partial-aggregated
    per-doc collect re-ordered by position inside the projection —
    order is carried by the data (pos in the collected structs), not
    by any assumption about aggregation order, so the result is
    deterministic under any partitioning. Documents with zero tokens
    are omitted (inner explode; the caller's corpus stats already
    count empties).
    """
    carry = [F.col(c) for c in carry_cols]
    toks = docs.select(
        F.col(id_col),
        *carry,
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("term", "term_id")), "term", "left"
    ).select(
        F.col(id_col),
        *carry,
        "pos",
        F.coalesce(F.col("term_id"), F.lit(0)).cast("long").alias("_vid"),
    )
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "_vid"))),
        lambda s: s["_vid"].cast("string"),
    )
    # carry_cols ride in the group key (functionally dependent on the
    # id, so the grouping is unchanged — just a wider key, no extra
    # exchange) so downstream stages need no join back for them
    return joined.groupBy(id_col, *carry_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.concat_ws(" ", seq).alias("ids"),
    )


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding-window document chunking — split every document into
    token windows of ``window`` tokens advancing by ``stride`` (the
    pretraining prep that turns long documents into fixed-budget
    training sequences with ``window - stride`` tokens of overlap for
    context continuity).

    Chunk starts are 1, 1+stride, 1+2*stride, ... up to the last
    position that starts a NON-EMPTY window; the final chunk is short
    rather than dropped (losing the document tail would bias the
    corpus toward document heads). Documents shorter than one window
    yield exactly one chunk. Output: (id, chunk_id 0.., n_tokens,
    chunk) with ``chunk`` the space-rejoined token slice.

    Scale shape: one codegen'd projection — tokenize, explode the
    precomputed start sequence, slice — with NO shuffle at all; chunk
    rows inherit the scan's partitioning. Expansion is
    ~n_tokens/stride rows per document, the operator's whole output.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1: {window}/{stride}")
    n = F.size(F.col("_toks"))
    # last start: the largest 1 + k*stride <= n (n=0 -> single empty
    # chunk start at 1 so empty docs still appear)
    n_starts = F.greatest(
        F.floor((n - 1) / stride).cast("int") + 1, F.lit(1)
    )
    carry = [F.col(c) for c in carry_cols]
    return (
        docs.select(F.col(id_col), *carry, tokens(text_col).alias("_toks"))
        .select(
            F.col(id_col),
            *carry,
            "_toks",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_starts - 1),
                    lambda k: k * stride + 1,
                )
            ).alias("chunk_id", "_start"),
        )
        .select(
            F.col(id_col),
            *carry,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(F.slice("_toks", F.col("_start"), window))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("_toks", F.col("_start"), window)
            ).alias("chunk"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """Cross-document chunk-level exact dedup with reassembly — the
    C4-style "deduplicate repeated spans, keep the first occurrence"
    curation step (Raffel et al. 2020 dedup three-sentence spans; the
    unit here is a ``chunk_words``-word window, the whitespace-token
    equivalent). Every document is split into consecutive
    non-overlapping chunks; a chunk is KEPT iff it is the corpus-wide
    first occurrence of its exact text (lowest (doc_id, chunk_idx)
    wins — duplicates later in the SAME document drop too, as in C4);
    surviving chunks reassemble in original order.

    Output per document: (id, n_chunks, n_kept, new_n_chars,
    new_text_md5) — the md5 stands in for the reassembled text so the
    result stays narrow and engine-comparable.

    Scale shape: chunking is a shuffle-free projection
    (:func:`chunk_windows` with stride = window); first-occurrence
    detection is ONE partial-aggregated min over a composite position
    key (doc_id * 1e6 + idx — never a struct arg-min, which not every
    engine orders identically), keyed by chunk text; the verdict join
    is on the same key; reassembly is one per-doc aggregation whose
    order rides IN the collected structs, not in aggregation order.
    Three shuffles total at any corpus size, each on a
    partial-aggregable key. (The exact-substring twin switched to a
    window min in r13 because ITS projection — per-position md5 over
    stride-1 W-word windows — is expensive to evaluate twice; here
    the non-overlapping chunk projection is a cheap slice, and the
    A/B showed the sort a text-keyed window needs costs more than the
    second evaluation: 1.04 s groupBy+join vs 1.79 s window at
    sf0.1.)
    """
    chunks = position_keyed_chunks(docs, id_col, text_col, chunk_words)
    firsts = chunks.groupBy("chunk").agg(F.min("_pk").alias("_mk"))
    flagged = chunks.join(firsts, "chunk").withColumn(
        "_keep", F.col("_pk") == F.col("_mk")
    )
    return reassemble_chunks(flagged, id_col)


CHUNK_PK_LIMIT = 1_000_000  # max chunks per document in the scalar key


def position_keyed_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    pk_limit: int = CHUNK_PK_LIMIT,
) -> DataFrame:
    """Non-overlapping ``chunk_words``-word chunks with the composite
    position key the dedup family adjudicates on: (id, chunk_id,
    chunk, _pk = id * pk_limit + chunk_id). One shuffle-free
    projection.

    The scalar key is collision-free ONLY while every document has
    fewer than ``pk_limit`` chunks (the default bounds documents at
    ~1e7 words at the 10-word default); a document at or past the
    bound would alias into the next id's key space and silently
    corrupt first-occurrence adjudication, so the projection RAISES
    on it instead (same loud-bound discipline as the codecs)."""
    return chunk_windows(
        docs, id_col, text_col, window=chunk_words, stride=chunk_words
    ).select(
        F.col(id_col),
        "chunk_id",
        "chunk",
        F.when(
            F.col("chunk_id") >= pk_limit,
            F.raise_error(
                F.concat(
                    F.lit(
                        "position_keyed_chunks: document exceeds "
                        f"{pk_limit} chunks (id="
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(") — the scalar position key would collide"),
                )
            ).cast("long"),
        )
        .otherwise(F.col(id_col) * F.lit(pk_limit) + F.col("chunk_id"))
        .alias("_pk"),
    )


def reassemble_chunks(flagged: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document reassembly of kept chunks: input rows (id,
    chunk_id, chunk, _keep boolean); output (id, n_chunks, n_kept,
    new_n_chars, new_text_md5). One partial-aggregated groupBy whose
    order rides IN the collected structs, not in aggregation order."""
    new_text = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_keep"), F.struct("chunk_id", "chunk"))
                )
            ),
            lambda s: s["chunk"],
        ),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.length(new_text).cast("long").alias("new_n_chars"),
        F.md5(new_text).alias("new_text_md5"),
    )


def exact_substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 50,
    pk_limit: int = CHUNK_PK_LIMIT,
) -> DataFrame:
    """EXACT substring dedup — the suffix-array pipeline of Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better"):
    any ``window_words``-token span whose exact text occurs anywhere
    else in the corpus is removed from every occurrence EXCEPT the
    corpus-wide first (lowest (doc_id, position) wins). This is the
    published dedup :func:`chunk_dedup` approximates: C4's fixed
    non-overlapping chunks miss a duplicated span that straddles a
    chunk boundary or sits at a different word offset; stride-1
    windows catch every alignment, so a duplicated run of >= W words
    dies wherever it hides.

    Spark-first realization of the suffix-array step: a suffix array
    is a single-machine index — the distributed equivalent with the
    same detection power at span length W is the stride-1 window
    fingerprint (two spans of >= W words share a window iff they share
    a W-word alignment, by construction of sliding windows). Windows
    are keyed by md5 of the window text, so the first-occurrence
    shuffle carries one fixed-width 32-char key per token position —
    never the text itself.

    Semantics per word position: REMOVED iff covered by some window
    occurrence that is not its window's global first occurrence.
    Within one document a later repetition of the same span also dies
    (its window's first occurrence is earlier in the same doc).
    Documents shorter than ``window_words`` contribute no windows and
    survive verbatim — same guarantee as the published 50-token floor.

    Output per document (every input document appears): (id, n_words,
    n_kept, new_n_chars, new_text_md5) with the md5 standing in for
    the reassembled surviving text.

    Scale shape: the window projection is shuffle-free (tokenize +
    explode starts + slice, ~1 row per token); first-occurrence is ONE
    partial-aggregated min over the window hash; the verdict join is
    on the same hash key (AQE reuses the exchange); the xW coverage
    explode runs on DUPLICATE occurrences only — proportional to the
    duplicated volume, not the corpus; removal is one (id, position)
    join; reassembly one per-doc aggregation whose order rides in the
    collected structs. Every shuffle key is fixed-width.
    """
    wins = substring_windows(
        docs, id_col, text_col, window_words, pk_limit
    ).select(F.col(id_col), "_start", F.md5("_win").alias("_wh"), "_pk")
    # first-occurrence via ONE window min over the hash partition: the
    # old groupBy + join-back form evaluated the window projection
    # (tokenize + W-word concat + per-position md5, the dominant CPU
    # cost) TWICE — the planner broadcast the firsts aggregate, so the
    # intended exchange reuse never fired, and a broadcast of the
    # distinct-window table is corpus-sized at scale. One evaluation,
    # one fixed-width shuffle keyed _wh, no broadcast; rows where
    # _pk != min(_pk) over _wh are exactly the old join's output.
    from pyspark.sql import Window

    w_first = Window.partitionBy("_wh")
    dup_occ = (
        wins.withColumn("_mk", F.min("_pk").over(w_first))
        .where(F.col("_pk") != F.col("_mk"))
        .select(F.col(id_col), "_start")
    )
    return _remove_covered_and_reassemble(
        docs, dup_occ, id_col, text_col, window_words
    )


def substring_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 50,
    pk_limit: int = CHUNK_PK_LIMIT,
) -> DataFrame:
    """(id, _start, _win, _pk): the stride-1 full-window projection
    shared by batch :func:`exact_substring_dedup` and its incremental
    store form — ``_win`` is the W-word window text (fingerprinted by
    the consumer), ``_pk`` the scalar (id, start) adjudication key
    with the same loud collision bound as the chunk family."""
    return (
        chunk_windows(docs, id_col, text_col, window=window_words, stride=1)
        .where(F.col("n_tokens") == window_words)
        .select(
            F.col(id_col),
            F.col("chunk_id").alias("_start"),
            F.col("chunk").alias("_win"),
            F.when(
                F.col("chunk_id") >= pk_limit,
                F.raise_error(
                    F.lit(
                        "substring_windows: document exceeds "
                        f"{pk_limit} window starts — the scalar "
                        "position key would collide"
                    )
                ).cast("long"),
            )
            .otherwise(F.col(id_col) * F.lit(pk_limit) + F.col("chunk_id"))
            .alias("_pk"),
        )
    )


def _remove_covered_and_reassemble(
    docs: DataFrame,
    dup_occurrences: DataFrame,
    id_col: str,
    text_col: str,
    window_words: int,
) -> DataFrame:
    """Shared tail of the exact-substring family: expand duplicate
    window occurrences (id, _start) to covered word positions, drop
    those words, reassemble per document, and reattach zero-window
    documents verbatim. Output: (id, n_words, n_kept, new_n_chars,
    new_text_md5)."""
    words = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wpos", "word")
    )
    removed = (
        dup_occurrences.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.col("_start"),
                    F.col("_start") + F.lit(window_words - 1),
                )
            ).alias("wpos"),
        )
        .distinct()
        .withColumn("_r", F.lit(True))
    )
    flagged = words.join(removed, [id_col, "wpos"], "left").select(
        F.col(id_col),
        F.col("wpos").alias("chunk_id"),
        F.col("word").alias("chunk"),
        F.col("_r").isNull().alias("_keep"),
    )
    out = reassemble_chunks(flagged, id_col)
    return docs.select(F.col(id_col)).join(out, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("new_n_chars", F.lit(0)).cast("long").alias("new_n_chars"),
        F.coalesce("new_text_md5", F.md5(F.lit(""))).alias("new_text_md5"),
    )


def exact_substring_dedup_increment(
    store,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 50,
) -> DataFrame:
    """Daily-ingest exact substring dedup — :func:`exact_substring_dedup`
    in O(increment) form against a PERSISTED window-fingerprint set: a
    raw-mode :class:`~.dedup.FingerprintStore` holding one md5 per
    stride-1 window position ever retained is the distributed,
    incrementally-growable stand-in for the suffix array (the index
    Lee et al. rebuild per run). Today's windows probe the store in
    ONE anti-join on the fixed-width fingerprint column — history text
    is never rescanned — then first-occurrence-wins within the
    increment; covered positions of every non-winning occurrence are
    removed and survivors reassemble per document. Pure read — the
    caller absorbs the increment's windows separately when committing
    the day (the store family's usual read/commit split).

    Winner semantics are the family's FIRST-DAY-WINS sequential
    contract at window grain: a span absorbed on any earlier day
    suppresses today's occurrences even at a smaller doc_id, and
    history is never re-adjudicated. Output: (id, n_words, n_kept,
    new_n_chars, new_text_md5), every increment document present."""
    wins = substring_windows(
        new_docs, id_col, text_col, window_words
    )
    kept = store.dedup_increment(
        wins.select(F.col("_pk"), F.col("_win")), "_pk", "_win"
    ).select("_pk")
    dup_occ = wins.join(kept, "_pk", "left_anti").select(
        F.col(id_col), "_start"
    )
    return _remove_covered_and_reassemble(
        new_docs, dup_occ, id_col, text_col, window_words
    )


def lm_doc_likelihood(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model quality score — the
    CCNet-style "score every document under an n-gram LM and filter
    the tail" curation step (Wenzek et al. 2020 use a 5-gram KenLM;
    the word-bigram variant keeps the same pipeline shape with the
    model fit IN-ENGINE from the corpus itself).

    Model: add-one-smoothed conditional probability
    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``V`` the corpus
    vocabulary size. Each document scores as the sum of its bigram
    probabilities, quantized PER BIGRAM to 1e9 fixed point BEFORE
    summation — counts are exact integers, each quantized term is one
    IEEE divide+round (bit-identical in any engine), and the sum is
    long addition, so the score is hash-stable where a log-prob sum
    would drift in the last ulp across engines. Monotonicity, the
    property a quality FILTER needs, is preserved (higher mean
    probability = more in-distribution text).

    Output: (id, n_bigrams, sum_p_x1e9) — mean probability =
    sum_p_x1e9 / n_bigrams / 1e9, the caller's one float.

    Scale shape: bigram extraction is a zero-shuffle projection
    (tokenize + slide by zip-with-next); the model fit is two partial-
    aggregated counts (bigram table keyed (w1,w2), unigram keyed w1);
    scoring joins each document bigram against the model on the SAME
    (w1,w2) key — one exchange pair that AQE co-partitions — with the
    unigram counts rejoined on w1 and V a broadcast scalar. Every
    measure is a long; no Python touches data.
    """
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).where(F.size("_t") >= 2)
    bi = toks.select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("pos", "_bg"),
    ).select(F.col(id_col), "pos", F.col("_bg.w1"), F.col("_bg.w2"))
    bigram_c = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    unigram_c = (
        docs.select(F.explode(tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab_n = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    p_x1e9 = F.round(
        (F.col("c12") + 1).cast("double") * 1e9 / (F.col("c1") + F.col("v"))
    ).cast("long")
    scored = (
        bi.join(bigram_c, ["w1", "w2"])
        .join(unigram_c, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(F.col(id_col), p_x1e9.alias("_p"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_p").cast("long").alias("sum_p_x1e9"),
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stops: int = 2,
) -> DataFrame:
    """The Gopher quality-rule gate (Rae et al. 2021, Appendix A) —
    the published heuristic filter suite MassiveWeb/MassiveText used,
    as one shuffle-free projection: word-count bounds, mean word
    length in [3, 10], symbol-to-word ratio (# and ...) <= 0.1, >= 80%
    of words containing an alphabetic character, <= 90% bullet-point
    lines, <= 30% ellipsis-ending lines, and >= ``min_stops`` of the
    paper's eight required stop words (paper default 2). Every signal is scaled+floored to an integer
    (the repo's cross-engine discipline) and emitted alongside the
    composite ``keep`` verdict, so downstream can re-gate on any
    subset without recomputing.

    Scale shape: pure codegen over the scan — tokenize once, fold the
    per-token predicates as array expressions, zero shuffles; the
    filter's cost is the read itself, which is what lets the rule
    suite run as the FIRST pass of a 100-TB curation pipeline.
    """
    toks = tokens(text_col)
    c = F.col(text_col)
    n_words = F.size(toks).cast("long")
    denom_w = F.greatest(n_words, F.lit(1))
    total_wlen = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mwl_x100 = F.floor(total_wlen * 100 / denom_w).cast("long")
    n_hash = (F.length(c) - F.length(F.expr(f"replace({text_col}, '#', '')"))).cast("long")
    n_ell = (
        (F.length(c) - F.length(F.expr(f"replace({text_col}, '...', '')"))) / 3
    ).cast("long")
    symbol_x1000 = F.floor((n_hash + n_ell) * 1000 / denom_w).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    alpha_x1000 = F.floor(n_alpha * 1000 / denom_w).cast("long")
    lines = F.filter(F.split(c, "\n"), lambda s: s != "")
    denom_l = F.greatest(F.size(lines), F.lit(1)).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda s: s.startswith("-") | s.startswith("*"))
    ).cast("long")
    bullet_x1000 = F.floor(n_bullet * 1000 / denom_l).cast("long")
    n_ell_lines = F.size(F.filter(lines, lambda s: s.endswith("..."))).cast(
        "long"
    )
    ellipsis_x1000 = F.floor(n_ell_lines * 1000 / denom_l).cast("long")
    n_stops = sum(
        F.array_contains(toks, s).cast("long") for s in GOPHER_STOPS
    ).cast("long")
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mwl_x100 >= 300)
        & (mwl_x100 <= 1000)
        & (symbol_x1000 <= 100)
        & (alpha_x1000 >= 800)
        & (bullet_x1000 <= 900)
        & (ellipsis_x1000 <= 300)
        & (n_stops >= min_stops)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mwl_x100.alias("mwl_x100"),
        symbol_x1000.alias("symbol_x1000"),
        alpha_x1000.alias("alpha_x1000"),
        bullet_x1000.alias("bullet_x1000"),
        ellipsis_x1000.alias("ellipsis_x1000"),
        n_stops.alias("n_req_stops"),
        keep.cast("long").alias("keep"),
    )


DSIR_BUCKETS = 256


def dsir_term_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "_is_target",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, _t, _b) — one row per bigram occurrence with its md5
    feature-hash bucket, the zero-shuffle projection shared by the
    batch :func:`dsir_importance` and the incremental
    ``DsirModelStore`` (one derivation, so the persisted model and
    the batch score agree bit-for-bit)."""
    bi = docs.select(
        F.col(id_col),
        F.col(target_col).alias("_t"),
        tokens(text_col).alias("_w"),
    ).where(F.size("_w") >= 2)
    return bi.select(
        F.col(id_col),
        "_t",
        F.explode(
            F.zip_with(
                F.slice("_w", 1, F.size("_w") - 1),
                F.slice("_w", 2, F.size("_w") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("_term"),
    ).select(
        F.col(id_col),
        "_t",
        (
            F.conv(F.substring(F.md5("_term"), 1, 12), 16, 10).cast("long")
            % buckets
        ).alias("_b"),
    )


def dsir_importance(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "_is_target",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style hashed n-gram importance scoring (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    fit a TARGET bag-of-hashed-bigrams model (rows where
    ``target_col`` is true — the domain you want more of) and a RAW
    model (the whole corpus), then score every document by how much
    its hashed bigrams look like target rather than raw. Documents
    ranked by this score are what importance resampling draws.

    In-engine fixed-point form: bigrams hash to ``buckets`` md5
    buckets (pure function of the term — engine-portable); each model
    is add-one-smoothed bucket counts; each term contributes
    ``round(1e9 * (ct+1)(Nr+B) / ((cr+1)(Nt+B)))`` — counts are exact
    integers and the quantization is IEEE multiply/divide + round in
    a fixed expression shape, bit-identical in any engine (the same
    per-term-quantize-then-sum discipline as lm_doc_likelihood; a
    float log-sum would drift in the last ulp across engines, so the
    gated statistic sums quantized probability RATIOS — per-term
    ordering identical to the paper's log-ratio).

    Output: (id, n_terms, sum_ratio_x1e9) for every document with at
    least one bigram. Scale shape: bigram extraction is a zero-shuffle
    projection; each model is ONE partial-aggregated count over a
    <= ``buckets``-row key space (broadcastable however big the
    corpus); scoring joins doc terms to the two tiny models + two
    scalar totals — no shuffle wider than the bucket space.
    """
    terms = dsir_term_buckets(docs, id_col, text_col, target_col, buckets)
    raw_c = terms.groupBy("_b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_c = terms.where(F.col("_t")).groupBy("_b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = terms.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(F.col("_t").cast("long")).alias("nt"),
    )
    t_x1e9 = F.round(
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
        * (F.col("nr") + buckets)
        * 1e9
        / ((F.col("cr") + 1) * (F.col("nt") + buckets))
    ).cast("long")
    scored = (
        terms.join(F.broadcast(raw_c), "_b")
        .join(F.broadcast(tgt_c), "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), t_x1e9.alias("_r"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("_r").cast("long").alias("sum_ratio_x1e9"),
    )


def hashed_doc_embedding(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick,
    Weinberger et al. 2009): every token hashes to one of ``dim``
    components with a +/-1 sign from an independent hash bit, and the
    document vector is the signed occurrence sum — a fixed-width,
    vocabulary-free text representation produced ENTIRELY in-engine
    (no model download), good enough to drive semantic blocking /
    clustering / near-dup over raw text.

    All-integer output: (id, emb_str, l1) where ``emb_str`` is the
    space-joined component vector in index order (the same
    engine-portable convention as vocab_encode's id string) and ``l1``
    its L1 mass (0 = the degenerate all-cancelled vector — callers
    doing cosine must filter l1 > 0). Hashes are md5-derived (48-bit
    index hash, 4-bit sign hash), so the embedding is a pure function
    of the token — bit-identical in any engine.

    Scale shape: one explode + ONE partial-aggregated (id, component)
    sum + one per-doc assembly aggregation — two shuffles, both on
    partial-aggregable keys; components materialize sparse (absent =
    0) and densify only in the final projection.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
    sbit = F.conv(F.substring(F.md5("w"), 13, 1), 16, 10).cast("long")
    comp = tok.select(
        F.col(id_col),
        (h % dim).cast("int").alias("j"),
        F.when(sbit % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
    )
    per = comp.groupBy(id_col, "j").agg(F.sum("s").cast("long").alias("v"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(
            F.element_at(
                F.map_from_entries(F.collect_list(F.struct("j", "v"))), d
            ),
            F.lit(0).cast("long"),
        ),
    )
    return per.groupBy(id_col).agg(
        F.concat_ws(
            " ", F.transform(vec, lambda x: x.cast("string"))
        ).alias("emb_str"),
        F.aggregate(
            vec, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("l1"),
    )


def trigram_positions(docs: DataFrame, id_col: str, text_col):
    """(id, w1, w2, w3) — one row per trigram position, zero-shuffle
    projection (tokenize + two zip-with-next slides)."""
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).where(F.size("_t") >= 3)
    z12 = F.zip_with(
        F.slice("_t", 1, F.size("_t") - 2),
        F.slice("_t", 2, F.size("_t") - 2),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    z123 = F.zip_with(
        z12,
        F.slice("_t", 3, F.size("_t") - 2),
        lambda p, c: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
        ),
    )
    return toks.select(
        F.col(id_col), F.explode(z123).alias("_tg")
    ).select(
        F.col(id_col),
        F.col("_tg.w1"),
        F.col("_tg.w2"),
        F.col("_tg.w3"),
    )


def stupid_backoff_score(
    model_docs: DataFrame,
    score_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid Backoff trigram LM scoring (Brants et al., EMNLP 2007) —
    THE web-scale n-gram smoothing: designed at Google precisely so a
    distributed count-table LM needs no normalization pass. Per
    trigram position of a scored document::

        S(w3|w1,w2) = c3(w1w2w3) / c2(w1w2)              if c3 > 0
                    = 0.4 * c2(w2w3) / c1(w2)            elif c2 > 0
                    = 0.4^2 * c1(w3) / N                 elif c1 > 0
                    = 0                                  (OOV)

    with counts fit on ``model_docs`` (the history slice — scoring
    held-out text is what makes the backoff chain fire; a corpus
    scored under its own counts never leaves level 3). The 0.4
    backoff factor is the paper's constant and EXACTLY 2/5, so every
    level is one integer-rational floor division at x1e9 scale —
    ``(c*2*1e9) div (d*5)`` — bit-identical in any engine; per-position
    scores are longs summed per document (the
    :func:`lm_doc_likelihood` fixed-point discipline).

    Scale shape: the three count tables are partial-aggregated counts
    over the model slice; scoring is word-keyed equi-joins (trigram,
    two bigram probes, two unigram probes) that AQE co-partitions,
    with the token total N one broadcast row. No Python, no floats
    beyond one IEEE divide per position.

    Output: (id, n_trigrams, sum_s_x1e9).
    """
    uni, bi, tri = sb_count_tables(model_docs, text_col)
    n_total = uni.agg(F.sum("c1").cast("long").alias("n"))
    return sb_score_with_counts(
        score_docs, id_col, text_col, uni, bi, tri, n_total
    )


def sb_count_tables(docs: DataFrame, text_col: str = "text"):
    """The three Stupid-Backoff count tables of one slice:
    (w, c1), (w1, w2, c2), (w1, w2, w3, c3) — pure partial-aggregated
    counts, so they merge across slices by ADDITION (the property
    :class:`~.sb_store.SbModelStore` persists them under)."""
    mt = docs.select(tokens(text_col).alias("_t"))
    uni = (
        mt.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi_pos = mt.where(F.size("_t") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg")
    ).select(F.col("_bg.w1"), F.col("_bg.w2"))
    bi = bi_pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    tri = (
        trigram_positions(
            docs.select(F.lit(0).alias("_mid"), F.col(text_col)),
            "_mid",
            text_col,
        )
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    return uni, bi, tri


def sb_score_with_counts(
    score_docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    n_total: DataFrame,
) -> DataFrame:
    """Stupid-Backoff scoring joins against EXPLICIT count tables —
    the arithmetic of :func:`stupid_backoff_score` factored once so
    the batch operator and the persisted ``SbModelStore`` score
    bit-identically. ``n_total`` is a one-row (n) frame."""
    pos = trigram_positions(score_docs, id_col, text_col)
    c2a = bi.select(
        F.col("w1"), F.col("w2"), F.col("c2").alias("c2a")
    )
    c2b = bi.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("c2").alias("c2b"),
    )
    c1b = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b"))
    c1c = uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1c"))
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.expr("(c3 * 1000000000) div c2a"),
        )
        .when(
            F.col("c2b").isNotNull(),
            F.expr("(c2b * 2 * 1000000000) div (c1b * 5)"),
        )
        .when(
            F.col("c1c").isNotNull(),
            F.expr("(c1c * 4 * 1000000000) div (n * 25)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    scored = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(c2a, ["w1", "w2"], "left")
        .join(c2b, ["w2", "w3"], "left")
        .join(c1b, "w2", "left")
        .join(c1c, "w3", "left")
        .crossJoin(F.broadcast(n_total))
        .select(F.col(id_col), s.alias("_s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("_s").cast("long").alias("sum_s_x1e9"),
    )


def readability(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade as EXACT integer
    rationals — the classic readability gate a text-quality pipeline
    adds next to the Gopher rules (readability bands are a standard
    corpus-stratification signal). Counts:

    * words      = whitespace tokens;
    * sentences  = runs of sentence-ending punctuation ``[.!?]+``,
      clamped to >= 1 (fragment documents count as one sentence);
    * syllables  = per word, vowel-group runs ``[aeiouyAEIOUY]+``
      clamped to >= 1, summed.

    The published coefficients are decimal rationals, so both scores
    are single integer expressions at x1000 scale::

        flesch_x1000 = 206835 - (1015 * W) div S - (84600 * Y) div W
        fk_grade_x1000 = (390 * W) div S + (11800 * Y) div W - 15590

    — counts are nonnegative longs, every division truncating integer
    division, bit-identical in any engine. Zero-word documents are
    dropped (no denominator). Pure codegen: tokenize + two regexes +
    one array fold, no shuffle at all.

    Output: (id, n_words, n_sentences, n_syllables, flesch_x1000,
    fk_grade_x1000).
    """
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    n_sent = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)
        ),
        F.lit(1),
    ).cast("long")
    n_syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(
                    F.regexp_extract_all(
                        w, F.lit("[aeiouyAEIOUY]+"), 0
                    )
                ),
                F.lit(1),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).where(F.col("n_words") >= 1)
    return out.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206835)
            - F.expr("(1015 * n_words) div n_sentences")
            - F.expr("(84600 * n_syllables) div n_words")
        ).cast("long").alias("flesch_x1000"),
        (
            F.expr("(390 * n_words) div n_sentences")
            + F.expr("(11800 * n_syllables) div n_words")
            - F.lit(15590)
        ).cast("long").alias("fk_grade_x1000"),
    )


def kneser_ney_score(
    model_docs: DataFrame,
    score_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995,
    Chen & Goodman's interpolated form) — the canonical n-gram
    smoothing, completing the LM family (add-one bigram, Stupid
    Backoff trigram, now absolute discounting with continuation
    backoff). With discount D = 1/2 (exact — the same
    rational-constant discipline as Stupid Backoff's 2/5)::

        P(w2|w1) = max(c(w1w2) - 1/2, 0) / c(w1)
                 + (1/2) * N1+(w1,*) / c(w1) * Pcont(w2)
        Pcont(w2) = N1+(*,w2) / N1+(*,*)

    where N1+ are distinct-continuation counts — the celebrated
    Kneser-Ney insight that backoff mass should follow how many
    CONTEXTS a word completes, not its raw frequency. Over the common
    denominator ``2 * c(w1) * B`` (B = distinct bigram count) each
    per-position score is ONE fixed-point rounding::

        p_x1e9 = round((max(2*c12 - 1, 0) * B + n1w1 * ncont2) * 1e9
                       / (2 * c1 * B))

    — integer numerator and denominator converted to double for one
    IEEE divide+round, the :func:`lm_doc_likelihood` discipline, so
    the score is hash-stable in any engine. Model fit on
    ``model_docs`` (history slice); scored bigrams whose w1 was never
    seen have no distribution to draw from and score 0 (the OOV-context
    convention). Counts are word-keyed partial aggregates; scoring is
    the same equi-join shape as the other LM operators.

    Output: (id, n_bigrams, sum_p_x1e9).
    """
    mt = model_docs.select(tokens(text_col).alias("_t"))
    bi_pos = mt.where(F.size("_t") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg")
    ).select(F.col("_bg.w1"), F.col("_bg.w2"))
    bc = bi_pos.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c1 = bi_pos.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # distinct-continuation tables: types, not tokens
    n1w = bc.groupBy("w1").agg(F.count(F.lit(1)).alias("n1w1"))
    ncont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont2"))
    btot = bc.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    st = score_docs.select(
        F.col(id_col), tokens(text_col).alias("_t")
    ).where(F.size("_t") >= 2)
    pos = st.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg"),
    ).select(F.col(id_col), F.col("_bg.w1"), F.col("_bg.w2"))
    p = F.when(
        F.col("c1").isNotNull(),
        F.round(
            (
                F.greatest(
                    F.lit(2) * F.coalesce("c12", F.lit(0)) - 1, F.lit(0)
                ).cast("double")
                * F.col("bt")
                + F.col("n1w1").cast("double")
                * F.coalesce("ncont2", F.lit(0))
            )
            * 1e9
            / (F.lit(2).cast("double") * F.col("c1") * F.col("bt"))
        ).cast("long"),
    ).otherwise(F.lit(0))
    scored = (
        pos.join(bc, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(n1w, "w1", "left")
        .join(ncont, "w2", "left")
        .crossJoin(F.broadcast(btot))
        .select(F.col(id_col), p.alias("_p"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_p").cast("long").alias("sum_p_x1e9"),
    )


def maxmatch_segment(
    word_counts: DataFrame,
    vocab: DataFrame,
    min_len: int = 2,
    max_len: int = 4,
    max_rounds: int = 8,
) -> DataFrame:
    """Greedy longest-match (MaxMatch) subword segmentation — the
    WordPiece-style ENCODING rule (maximal munch: at each position
    take the longest vocabulary piece that matches; Wong & Chan 1996
    for the classic segmentation form, Schuster & Nakajima 2012 /
    BERT's tokenizer for the subword use): the third tokenizer family
    beside the BPE merge walk (bpe.py) and the fixed top-K vocabulary
    coder (vocab_encode). Positions with no vocabulary match fall back
    to the single character (the [UNK]-per-char convention), so every
    word always segments.

    Inputs: ``word_counts`` (word, n_occurrences) — the DISTINCT-WORD
    table (the bpe_encode_prod discipline: segmentation cost scales
    with the vocabulary of words, not corpus tokens; join the result
    back to occurrences for token-level views) — and ``vocab``
    (piece), pieces of length in [min_len, max_len].

    Determinism: candidate lengths are tried longest-first as a pure
    argmax over (length) per position — no tie possible (one candidate
    per length); the loop runs a FIXED ``max_rounds`` (each round
    consumes >= 1 char, so size it to the max word length — words
    still unfinished get a loud ``|<TRUNC>`` marker IN the output, so
    an under-sized round count can never silently pass a hash gate).

    Plan shape (r13): the vocabulary is a BOUNDED artifact (the
    caller's top-K piece table — the BPE-merge-table / unigram-vocab
    discipline), so it is collected once and the whole greedy walk is
    ONE ``F.aggregate`` fold over ``sequence(1, max_rounds)`` inside a
    single shuffle-free projection: per round the longest literal-set
    match at the cursor (a codegen'd longest-first ``isin`` CASE)
    advances the cursor, exactly the per-round broadcast-join + argmax
    the old driver loop ran as ``max_rounds`` checkpointed Spark jobs
    (2.9 s → one job; output proven identical by the unchanged
    oracle). Work is O(words x rounds); nothing is keyed on corpus
    size.

    Output: (word, n_occurrences, n_pieces, seg) — seg is the
    '|'-joined piece sequence.
    """
    if max_rounds < 1:
        # fail at the API boundary like hll_rolling_estimate /
        # mmr_topk (r10 advice)
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    pieces = [r["piece"] for r in vocab.select("piece").collect()]
    by_len = {
        L: sorted({p for p in pieces if len(p) == L})
        for L in range(max_len, min_len - 1, -1)
    }
    wlen = F.length(F.col("word"))

    def step(acc, r):
        pos, seg, n = acc["pos"], acc["seg"], acc["n"]
        # round 1 processes every word unconditionally (the old loop
        # seeded ALL words active); later rounds only while the
        # cursor is inside the word
        active = (pos <= wlen) | (r == F.lit(1))
        # longest match at the cursor: pieces have exactly length L,
        # so a substring running past the end (shorter than L) can
        # never equal one — same guard as the old length(_c) == _L
        match_l = None
        for L in range(max_len, min_len - 1, -1):
            ps = by_len.get(L) or []
            if not ps:
                continue
            cond = F.substring(F.col("word"), pos, F.lit(L)).isin(ps)
            match_l = (
                F.when(cond, F.lit(L))
                if match_l is None
                else match_l.when(cond, F.lit(L))
            )
        if match_l is None:
            match_l = F.lit(None).cast("int")
        piece = F.substring(
            F.col("word"), pos, F.coalesce(match_l, F.lit(1))
        )
        new = F.struct(
            (pos + F.coalesce(match_l, F.lit(1))).alias("pos"),
            F.when(seg == "", piece)
            .otherwise(F.concat(seg, F.lit("|"), piece))
            .alias("seg"),
            (n + F.lit(1).cast("long")).alias("n"),
        )
        return F.when(active, new).otherwise(acc)

    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_rounds)),
        F.struct(
            F.lit(1).alias("pos"),
            F.lit("").alias("seg"),
            F.lit(0).cast("long").alias("n"),
        ),
        step,
    )
    out = word_counts.select(
        "word", F.col("n_occurrences"), fold.alias("_f")
    )
    # anything still unfinished after max_rounds surfaces LOUDLY in
    # the hash — same |<TRUNC> contract as the old loop
    return out.select(
        "word",
        "n_occurrences",
        F.col("_f.n").alias("n_pieces"),
        F.when(F.col("_f.pos") > wlen, F.col("_f.seg"))
        .otherwise(F.concat(F.col("_f.seg"), F.lit("|<TRUNC>")))
        .alias("seg"),
    )
