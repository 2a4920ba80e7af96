"""Distributed byte-pair-encoding tokenizer: fit + encode.

Reference scope: the reference engine ships no tokenizer; this
completes the training-data pipeline story around
``text.build_vocab``/``encode_tokens`` (frequency top-N word vocab)
with a real subword tokenizer learned from the corpus — the operator a
100 TB curation pipeline runs between dedup and packing.

Algorithm (Sennrich et al. 2016, word-internal merges):

* FIT iterates on the DISTINCT-WORD AGGREGATE, never the corpus: one
  shuffle builds (word, count) — at 100 TB the corpus is petabytes but
  the distinct-word table is bounded (~100M rows) — then each of the N
  merge rounds is one explode+groupBy over that vocab-sized table plus
  a LIMIT-1 driver collect of the best pair (the same bounded
  iterative-driver shape as connected components; lineage truncated
  with ``localCheckpoint`` each round).
* ENCODE ships in two equivalent plans. :func:`bpe_encode` compiles N
  chained LITERAL ``replace`` calls — pure whole-stage-codegen JVM
  expressions, optimal at gate-sized N and mirror-able in ANSI SQL for
  the oracle, but expression-tree depth grows with N (a 32k-merge
  vocabulary breaks codegen/constant-pool limits).
  :func:`bpe_encode_prod` is the production path: the merge table
  travels as a broadcast variable into an Arrow ``mapInPandas`` greedy
  fold applied to the DISTINCT-WORD table only, joined back onto the
  corpus by word — a vocabulary-size-independent plan whose
  equivalence with the chained-replace path is property-pinned
  (tests/test_bpe.py).

Merge application uses a sentinel serialization that makes ONE literal
replace per merge exactly equal to the left-to-right greedy fold over
the symbol sequence: a word's tokenization is stored as
``\\x01tok\\x02\\x01tok\\x02...``. Because the pattern
``\\x01a\\x02\\x01b\\x02`` consumes both tokens WHOLE (boundaries
anchored by the sentinels, nothing shared with a neighboring
occurrence), standard non-overlapping left-to-right replace semantics
— identical in Spark's ``replace`` and DuckDB's ``replace`` — apply
every occurrence in one pass, and overlap chains (merge (a,a) on
"aaa") resolve to the greedy fold result ([aa, a]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# token wrappers: \x01 = token start, \x02 = token end. Corpus text
# containing these control chars would be ambiguous; fit/encode reject
# none (synthetic + real text corpora are sentinel-free; a production
# deployment would strip them in the cleaning pass).
T0 = "\x01"
T1 = "\x02"
SEP = T1 + T0  # the inter-token boundary inside a serialized word


def _serialize_chars(col: Column) -> Column:
    """word -> its character-level serialized tokenization
    (``\\x01c\\x02`` per char). One regexp_replace, codegen'd."""
    return F.regexp_replace(col, "(.)", T0 + "$1" + T1)


def words_with_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(w, cnt): whitespace-delimited words with corpus frequencies —
    the one corpus-wide shuffle of the whole fit."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(left, right, n): adjacent-token pair frequencies over the
    serialized vocab state, weighted by word counts."""
    toks = F.split(
        F.expr(f"substring(s, 2, length(s) - 2)"), SEP
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("left"),
            F.element_at(toks, i + 2).alias("right"),
        ),
    )
    return (
        state.where(F.size(toks) >= 2)
        .select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def apply_merge(s: Column, left: str, right: str) -> Column:
    """Apply one merge to a serialized tokenization — a single literal
    replace, exactly the greedy left-to-right fold (see module doc)."""
    return F.replace(
        s,
        F.lit(T0 + left + T1 + T0 + right + T1),
        F.lit(T0 + left + right + T1),
    )


def bpe_fit(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus. Output:
    (rank, left, right, n) — rank is 1-based application order, n the
    pair's weighted frequency when chosen. Deterministic: ties broken
    by (left, right) ascending (bytewise — both engines collate ASCII
    identically). Stops early (fewer rows) only if the vocab runs out
    of adjacent pairs.

    The returned frame is driver-materialized (num_merges rows — the
    merge table is a bounded artifact like a codebook, the documented
    small boundary).

    Practical ceiling (the hll.py magnitude-bound discipline): the
    fit loop collects ONE argmax row per merge — a driver round-trip
    per rank, inherent to sequential BPE (merge r+1's pair counts
    depend on merge r having been applied; no published formulation
    parallelizes across ranks without changing the learned vocab).
    Each round-trip is a tiny job over the DISTINCT-WORD table (not
    the corpus — words_with_counts aggregates first, so corpus size
    only affects round 0), but a production 32k-merge vocab means
    32k sequential jobs: at even ~0.2 s/job that is ~2 h of pure
    scheduling latency regardless of cluster size. Budget
    num_merges accordingly (hundreds are interactive; tens of
    thousands are a batch job you checkpoint and reuse via
    bpe_encode_words, whose cost is independent of this loop).
    num_merges <= 0 returns an empty merge table (no jobs run)."""
    spark = docs.sparkSession
    # ONE materialization (the corpus aggregate); each round then
    # evaluates the accumulated literal-replace chain over it inside
    # the round's own argmax job — round r is one job, not two (the
    # old per-round localCheckpoint doubled the scheduling latency
    # this loop's docstring budgets, and the replace chain is the
    # same codegen'd projection the encode side already runs)
    state0 = (
        words_with_counts(docs, text_col)
        .select("w", "cnt", _serialize_chars(F.col("w")).alias("s"))
        .localCheckpoint()
    )
    scol = F.col("s")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        state = state0.select("w", "cnt", scol.alias("s"))
        best = (
            _pair_counts(state)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, n = best[0]["left"], best[0]["right"], best[0]["n"]
        merges.append((rank, left, right, int(n)))
        scol = apply_merge(scol, left, right)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, n long"
    )


def bpe_encode_words(
    df: DataFrame,
    word_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Add ``bpe_s`` (serialized tokenization after applying the merge
    list in rank order) and ``n_toks`` to ``df``. All chained literal
    replaces — one codegen'd projection, no shuffle, no Python."""
    s = _serialize_chars(F.col(word_col))
    for left, right in merges:
        s = apply_merge(s, left, right)
    out = df.withColumn("bpe_s", s)
    # token count = number of \x01 sentinels
    return out.withColumn(
        "n_toks",
        (
            F.length("bpe_s")
            - F.length(F.replace(F.col("bpe_s"), F.lit(T0), F.lit("")))
        ).cast("long"),
    )


def fold_encode_word(word: str, merges: list) -> list:
    """Pure-Python reference fold: apply each ``(left, right)`` merge
    in list order as ONE greedy left-to-right non-overlapping pass —
    byte-identical to the sentinel-serialized literal-replace chain of
    :func:`bpe_encode_words`, for ARBITRARY merge tables (no
    monotone-rank assumption, so it stays exact even on synthetic or
    truncated tables where the textbook min-rank-priority shortcut
    diverges). The token-set membership check skips inapplicable
    merges in O(1), so per-word cost is O(num_merges) dict probes plus
    one O(len) pass per merge that might apply."""
    toks = list(word)
    if len(toks) < 2:
        return toks
    present = set(toks)
    for left, right in merges:
        if left not in present or right not in present:
            continue
        out: list = []
        i, n = 0, len(toks)
        merged = False
        while i < n:
            if i < n - 1 and toks[i] == left and toks[i + 1] == right:
                out.append(left + right)
                i += 2
                merged = True
            else:
                out.append(toks[i])
                i += 1
        if merged:
            toks = out
            if len(toks) < 2:
                break
            present = set(toks)
    return toks


def bpe_encode_words_prod(
    df: DataFrame,
    word_col: str,
    merges: list,
) -> DataFrame:
    """Production-scale twin of :func:`bpe_encode_words`: same output
    columns (``bpe_s``, ``n_toks``), but the merge table travels as a
    BROADCAST VARIABLE into an Arrow ``mapInPandas`` greedy fold
    instead of being compiled into a chained-replace projection.

    The chained-replace path is the optimal plan at gate-sized tables
    (whole-stage codegen, zero Python) but cannot hold at a real 32k
    merge vocabulary: one ``replace`` call per merge builds a
    32k-deep expression tree that breaks JVM codegen/constant-pool
    limits and recompiles per vocabulary. Here the plan is
    vocabulary-size independent — one fixed mapInPandas stage whose
    closure reads the broadcast list — so a 32k-merge encode is the
    same Spark plan as a 16-merge encode. Equivalence with the
    chained-replace path is property-pinned (tests/test_bpe.py) via
    the shared :func:`fold_encode_word` semantics."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))

    def enc(batches):
        table = bc.value
        for pdf in batches:
            toks = [
                fold_encode_word(w, table) for w in pdf[word_col].astype(str)
            ]
            out = pdf.copy()
            out["bpe_s"] = ["".join(T0 + t + T1 for t in ts) for ts in toks]
            out["n_toks"] = pd.Series(
                [len(ts) for ts in toks], index=pdf.index, dtype="int64"
            )
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(enc, f"{fields}, bpe_s string, n_toks long")


def bpe_encode_prod(
    docs: DataFrame,
    merges_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Production-scale twin of :func:`bpe_encode` (same output schema
    and values, property-pinned): tokenize a corpus against a merge
    table of ANY size.

    100-TB shape: Python touches only the DISTINCT-WORD table — the
    corpus explodes to (doc, word) rows JVM-side, distinct words are
    folded once each through the broadcast-merge ``mapInPandas``
    stage, and the encoded vocabulary joins back onto the exploded
    rows by word (an ordinary hash equi-join Spark parallelizes; AQE
    broadcasts it when the vocabulary is small). Corpus bytes never
    cross the Arrow boundary, so cost scales with |vocab| x |merges|
    for the Python stage and with corpus rows only for the join."""
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "word_idx", "word"
        ),
    ).where(F.length("word") > 0)
    vocab = exploded.select("word").distinct()
    encoded = bpe_encode_words_prod(vocab, "word", merges)
    return exploded.join(encoded, "word").select(
        F.col(id_col),
        F.col("word_idx").cast("long").alias("word_idx"),
        "word",
        F.split(
            F.expr("substring(bpe_s, 2, length(bpe_s) - 2)"), SEP
        ).alias("tokens"),
        "n_toks",
    )


def bpe_encode(
    docs: DataFrame,
    merges_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus with a fitted merge table. Output one row per
    (doc, word position): (id, word_idx, word, tokens array<string>,
    n_toks). The merge table is collected (bounded artifact) and
    compiled into the chained-replace projection."""
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "word_idx", "word"
        ),
    ).where(F.length("word") > 0)
    enc = bpe_encode_words(exploded, "word", merges)
    return enc.select(
        F.col(id_col),
        F.col("word_idx").cast("long").alias("word_idx"),
        "word",
        F.split(
            F.expr("substring(bpe_s, 2, length(bpe_s) - 2)"), SEP
        ).alias("tokens"),
        "n_toks",
    )
