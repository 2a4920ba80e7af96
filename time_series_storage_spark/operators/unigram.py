"""Unigram-LM subword tokenizer (SentencePiece family) — the third
canonical subword scheme beside the BPE merge walk (bpe.py) and
greedy MaxMatch/WordPiece (text.py:maxmatch_segment).

Kudo (ACL 2018) trains a unigram language model over subword pieces
and segments by Viterbi: the segmentation of a word is the piece
sequence maximizing the product of piece probabilities. This module
implements the deterministic hard-EM (Viterbi-EM) variant:

  seed   every substring of the corpus words up to ``max_piece_len``
         chars, occurrence-weighted; the vocabulary keeps ALL single
         characters (the UNK-per-char fallback that guarantees every
         word segments — maxmatch_segment's convention) plus the
         ``vocab_size`` highest-frequency multi-char pieces.
  E-step Viterbi-segment every DISTINCT word under the current piece
         costs (the bpe_encode_prod discipline: work scales with the
         word vocabulary, not corpus tokens).
  M-step re-count pieces from the Viterbi segmentations
         (occurrence-weighted); multi-char pieces that lost every
         occurrence drop out, single chars floor at count 1.
  repeat a FIXED ``em_rounds`` times, then emit final costs.

THE EXACT-INTEGER LOG: a unigram LM needs ADDITIVE costs
(-log p(piece)), and transcendental ``ln`` differs in the last ulp
across engines — the one thing a hash gate cannot absorb. The cost
here is an EXACT integer log2 in fixed point,
``cost = floor-ish(log2(T / c) * 2^frac_bits)``, computed by the
classical normalize + square-and-extract-bit algorithm using ONLY
integer ops both engines define identically:

    m = (T << 30) // c                      # exact rational fixpoint
    e = bitlen(m) - 31                      # integer part of log2
    m >>= e                                 # m in [2^30, 2^31)
    repeat frac_bits times:
        m = (m * m) >> 30                   # square: x in [1, 4)
        if m >= 2^31: m >>= 1; emit bit 1   # x in [2,4): log2 bit set
        else:                  emit bit 0
    cost = e * 2^frac_bits + bits

Every step is exact 64-bit integer arithmetic (``m*m < 2^62``; the
dynamic shift rides the same exact power-of-two division as
qsketch.py's bucket math), so the fitted model, the Viterbi costs,
and the final segmentations are bit-reproducible in any engine — the
whole trainer sits under the hash gate. Precision: 2^-frac_bits in
log2 units per piece (frac_bits=8 -> ~0.4% relative), far inside the
model-quality noise floor of a subword vocab.

Viterbi is a forward DP over character positions, evaluated as ONE
shuffle-free projection (:func:`unigram_viterbi`): ``F.aggregate``
over the position sequence carries the dp array of (cost, seg)
structs, at position i every predecessor j in
[i - max_piece_len, i - 1] offers ``substring(word, j+1, i-j)``
looked up in a LITERAL cost map, and the winner is ``array_min``
over the candidate structs keyed by the scalar composite
``(cost_j + cost(piece)) * 64 + j`` (single-BIGINT tiebreak
discipline — DuckDB's arg_min takes only scalar keys), which orders
by total cost then by earliest start. No join, no shuffle, no
driver loop; nothing is keyed on corpus size. The SQL oracle
replays the same DP as a fixed ``max_word_len``-deep unrolled CTE
chain with the identical composite. Words longer than
``max_word_len`` are excluded up front IN BOTH ENGINES (loudly
countable by the caller; the corpus tables' max word length is 8
against the default 16).

Magnitude bounds (the hll.py discipline): ``T < 2^33`` total
weighted piece occurrences (so ``T << 30`` stays under 2^63) —
enforced by :func:`log2_fix`'s loud ValueError at the point the
collected counts become costs; per-piece cost <= (33 + 1) * 256
< 2^14, times <= max_word_len pieces, times 64 for the composite:
< 2^25, no overflow anywhere (the >= 2^40 unknown-piece sentinel
band stays clear of real costs by 15 bits).

Serve-scale knobs — what grows where when the corpus isn't the gate
corpus:

* ``max_word`` (default 16 vs the gate corpus's max word length 8)
  bounds the DP positions. On the ENGINE side it is only the length
  of the per-row ``F.aggregate`` sequence — cost linear in
  ``max_word``, still one shuffle-free codegen'd projection, so
  raising it to 64 for real text is a constant-factor change to the
  same plan. On the ORACLE side it is the unrolled CTE DEPTH (one dp
  block per position per EM round) — the replay SQL grows linearly;
  it is the oracle, not the engine, that pays for long words. Words
  LONGER than ``max_word`` are excluded from segmentation in both
  engines — never silently: :func:`unigram_excluded` surfaces the
  dropped word/occurrence counts so a pipeline pins or budgets the
  exclusion before trusting downstream per-document token sums.
* ``vocab_size`` (UNI_VOCAB=24, sized to the tiny gate corpus) sets
  the multi-char piece budget. The fitted vocabulary rides the plan
  as a LITERAL cost map (codebook discipline: one collect of a
  model-sized artifact, never corpus-sized), so production values
  (32k-256k pieces, the SentencePiece range) stay driver-safe; the
  binding constraint at scale is the ``T < 2^33`` occurrence bound
  above, which :func:`log2_fix` checks loudly at fit time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

UNI_MAX_PIECE = 4     # candidate piece length 1..4
UNI_VOCAB = 24        # multi-char vocabulary budget (plus all chars)
UNI_EM_ROUNDS = 2     # fixed Viterbi-EM rounds
UNI_MAX_WORD = 16     # Viterbi DP positions (corpus max word len: 8)
UNI_FRAC_BITS = 8     # log2 fixed-point fractional bits


def log2_fix(total: int, c: int, frac_bits: int = UNI_FRAC_BITS) -> int:
    """Exact-integer ``round-down(log2(total / c) * 2^frac_bits)``
    (see module docstring) — pure Python ints, the canonical spec of
    the cost function. The vocabulary is a bounded artifact (alphabet
    + ``vocab_size`` rows), so costs are computed HERE on the
    collected count table and inlined as a literal frame — the
    ivf_kmeans_centroids / BPE-merge-table discipline. (An in-plan
    Column form exists in git history; its 8 chained squaring steps
    self-compose under Catalyst's projection collapsing into a
    ~4^8-leaf expression tree and OOM the driver — exactly the case
    where a bounded driver-side artifact is the CORRECT shape, not a
    shortcut.) The DuckDB oracle replays the identical integer steps
    via :func:`log2_fix_cte`; Python and DuckDB 64-bit integer ops
    agree exactly, so the hash gate covers the whole trainer."""
    if not 1 <= c <= total < (1 << 33):
        raise ValueError(
            f"log2_fix requires 1 <= c <= total < 2^33, got "
            f"c={c} total={total}"
        )
    m = (total << 30) // c
    e = m.bit_length() - 31
    m >>= e
    f = 0
    for _ in range(frac_bits):
        m = (m * m) >> 30
        bit = 1 if m >= (1 << 31) else 0
        m >>= bit
        f = f * 2 + bit
    return e * (1 << frac_bits) + f


def log2_fix_cte(
    inner: str,
    keys: str,
    total: str = "_T",
    c: str = "c",
    frac_bits: int = UNI_FRAC_BITS,
    out: str = "cost",
) -> str:
    """DuckDB mirror of :func:`log2_fix` as nested subselects over
    ``inner`` (a query exposing ``keys``, ``c`` and ``total``):
    returns a SELECT emitting ``keys, c, {out}``. Same integer ops,
    same order."""
    # CASTs matter: DuckDB SUM(BIGINT) yields HUGEINT, which
    # printf('%b') refuses — pin everything to BIGINT up front
    sel = (
        f"SELECT {keys}, CAST({c} AS BIGINT) AS c, "
        f"CAST({total} AS BIGINT) AS t, "
        f"(CAST({total} AS BIGINT) << 30) // CAST({c} AS BIGINT) AS m "
        f"FROM ({inner})"
    )
    sel = (
        f"SELECT {keys}, c, t, "
        f"(length(printf('%b', m)) - 31)::BIGINT AS e, "
        f"m // CAST(pow(2, length(printf('%b', m)) - 31) AS BIGINT) AS m, "
        f"0::BIGINT AS f FROM ({sel})"
    )
    for _ in range(frac_bits):
        sel = (
            f"SELECT {keys}, c, t, e, "
            f"CASE WHEN ((m * m) >> 30) >= {1 << 31} "
            f"THEN ((m * m) >> 31) ELSE ((m * m) >> 30) END AS m, "
            f"f * 2 + (CASE WHEN ((m * m) >> 30) >= {1 << 31} "
            f"THEN 1 ELSE 0 END) AS f FROM ({sel})"
        )
    return (
        f"SELECT {keys}, c, e * {1 << frac_bits} + f AS {out} FROM ({sel})"
    )




def unigram_seed(
    word_counts: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    vocab_size: int = UNI_VOCAB,
) -> DataFrame:
    """Seed vocabulary (piece, c): every substring of every word up
    to ``max_piece`` chars, occurrence-weighted; ALL single chars are
    kept, multi-char pieces compete for ``vocab_size`` slots by
    (frequency DESC, piece ASC). One explode + one partial-aggregated
    count; the top-K is a window over the (tiny) piece table."""
    from pyspark.sql import Window

    subs = word_counts.select(
        "cnt",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), p -> "
                f"transform(sequence(1, least({int(max_piece)}, "
                "length(w) - p + 1)), l -> substring(w, p, l))))"
            )
        ).alias("piece"),
    )
    freq = subs.groupBy("piece").agg(F.sum("cnt").cast("long").alias("c"))
    singles = freq.where(F.length("piece") == 1)
    w = Window.orderBy(F.desc("c"), F.asc("piece"))
    multis = (
        freq.where(F.length("piece") > 1)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(vocab_size))
        .drop("_rn")
    )
    return singles.unionByName(multis)


def _costed_rows(
    rows: list, frac_bits: int = UNI_FRAC_BITS
) -> list:
    """[(piece, c)] -> sorted [(piece, c, cost)]: exact-integer -log2
    fixed-point costs against the vocab's own total, computed with
    exact Python ints (:func:`log2_fix`, which also enforces the
    T < 2^33 magnitude bound loudly)."""
    total = sum(c for _, c in rows)
    return [
        (p, c, log2_fix(total, c, frac_bits)) for p, c in sorted(rows)
    ]


def _with_costs(vocab: DataFrame, frac_bits: int = UNI_FRAC_BITS) -> DataFrame:
    """(piece, c) -> (piece, c, cost): exact-integer -log2 fixed-
    point costs against the vocab's own total. The count table is a
    bounded artifact (alphabet + vocab_size rows) — collected,
    costed with exact Python ints (:func:`log2_fix`), and re-created
    as a literal frame so downstream Viterbi plans never re-run the
    fit lineage."""
    rows = [(r["piece"], int(r["c"])) for r in vocab.collect()]
    return vocab.sparkSession.createDataFrame(
        _costed_rows(rows, frac_bits), "piece: string, c: long, cost: long"
    )


# a candidate whose piece is not in the vocabulary gets this
# composite, so it can never beat a real candidate; a word whose
# character set escapes the fitted vocab entirely surfaces it LOUDLY
# as a >= 2^34 per-unknown-char cost in the output instead of being
# dropped (within fit this is unreachable — every char of every fit
# word is a retained single)
UNI_UNK_COMP = 1 << 40


def unigram_viterbi(
    word_counts: DataFrame,
    costs: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    max_word: int = UNI_MAX_WORD,
) -> DataFrame:
    """Exact Viterbi segmentation of every word under ``costs``
    (piece, cost): the forward DP over character positions runs as
    ONE shuffle-free projection — ``F.aggregate`` over the position
    sequence carries the dp array of (cost, seg) structs, each step
    takes ``array_min`` over the ``max_piece`` candidate structs
    keyed by the scalar composite ``(cost_j + cost(piece)) * 64 + j``
    (total cost, then earliest start — identical to the SQL oracle's
    min/arg_min), and the cost table rides as a LITERAL MAP (the
    vocabulary is a bounded artifact; see :func:`log2_fix`). No join,
    no shuffle, no driver loop: segmentation cost is one codegen'd
    pass over the distinct-word table. Words longer than ``max_word``
    are excluded IN BOTH ENGINES — count them with
    :func:`unigram_excluded` before trusting downstream token sums.
    Output: (w, cnt, n_pieces, seg, cost) — seg the '|'-joined
    winning piece sequence.

    ``costs`` is a (piece, c, cost) frame or an already-driver-side
    list of (piece, ..., cost) tuples (the fit loop's shape — saves
    the collect job on a table that is a bounded literal anyway)."""
    if isinstance(costs, DataFrame):
        pairs = sorted(
            (r["piece"], int(r["cost"])) for r in costs.collect()
        )
    else:
        pairs = sorted((t[0], int(t[-1])) for t in costs)
    cost_map = F.create_map(
        *[x for p, c in pairs for x in (F.lit(p), F.lit(c))]
    )
    words = word_counts.where(F.length("w") <= int(max_word))
    w = F.col("w")

    def step(acc, i):
        cands = []
        for back in range(1, int(max_piece) + 1):
            j = i - back
            prev = F.element_at(acc, (j + 1).cast("int"))
            piece = F.substring(w, (j + 1).cast("int"), back)
            comp = (
                prev["cost"] + F.element_at(cost_map, piece)
            ) * 64 + j
            cands.append(
                F.when(
                    j >= 0,
                    F.struct(
                        F.coalesce(
                            comp.cast("long"),
                            F.lit(UNI_UNK_COMP) + j,
                        ).alias("comp"),
                        F.concat(prev["seg"], F.lit("|"), piece).alias(
                            "seg"
                        ),
                    ),
                ).otherwise(
                    F.struct(
                        # out-of-range predecessor: an always-losing
                        # candidate (beyond even the unknown-piece
                        # sentinel band)
                        F.lit(UNI_UNK_COMP * 64).alias("comp"),
                        F.lit("").alias("seg"),
                    )
                )
            )
        win = F.array_min(F.array(*cands))
        return F.concat(
            acc,
            F.array(
                F.struct(
                    F.floor(win["comp"] / 64).cast("long").alias("cost"),
                    win["seg"].alias("seg"),
                )
            ),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("cost"),
                F.lit("").alias("seg"),
            )
        ),
        step,
    )
    last = F.element_at(dp, F.length(w) + 1)
    return words.select(
        "w",
        "cnt",
        (F.size(F.split(last["seg"], r"\|")) - 1)
        .cast("long")
        .alias("n_pieces"),
        # every append added exactly one leading '|'
        F.substring(last["seg"], 2, 1 << 20).alias("seg"),
        last["cost"].alias("cost"),
    )


def unigram_excluded(
    word_counts: DataFrame, max_word: int = UNI_MAX_WORD
) -> DataFrame:
    """The words :func:`unigram_viterbi` EXCLUDES (length >
    ``max_word``), surfaced as a one-row countable frame instead of a
    silent drop: (n_excluded_words, n_excluded_occurrences). A
    pipeline pins this to zero (or budgets it) before trusting
    per-document token counts — an excluded word contributes to NO
    downstream n_tokens sum in either engine, so an unnoticed
    long-word tail silently deflates every token budget built on the
    segmentation. SQL mirror: ``SELECT COUNT(*), COALESCE(SUM(cnt),
    0) FROM words WHERE length(w) > max_word``."""
    return word_counts.where(F.length("w") > int(max_word)).agg(
        F.count(F.lit(1)).cast("long").alias("n_excluded_words"),
        F.coalesce(F.sum("cnt"), F.lit(0))
        .cast("long")
        .alias("n_excluded_occurrences"),
    )


def unigram_fit(
    word_counts: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    vocab_size: int = UNI_VOCAB,
    em_rounds: int = UNI_EM_ROUNDS,
    max_word: int = UNI_MAX_WORD,
    *,
    assume_materialized: bool = False,
) -> DataFrame:
    """Fixed-round Viterbi-EM unigram fit. Output: the final
    vocabulary (piece, c, cost) — costs from the post-EM counts, the
    table :func:`unigram_viterbi` serves reads from.

    The vocabulary is a BOUNDED artifact (alphabet + vocab_size
    rows), so the whole EM state lives driver-side between rounds:
    each round is exactly ONE Spark job (the used-piece count
    collect over the Viterbi projection) instead of the old
    per-round localCheckpoint + collect pair — the arithmetic
    (greatest(count, 1) on seed singles, used multis kept verbatim)
    is the same exact-integer rule, applied to the collected counts.
    ``assume_materialized=True`` skips the defensive localCheckpoint
    when the caller already materialized ``word_counts``."""
    # materialize the distinct-word table ONCE: every DP step and EM
    # round re-actions it, and without this the corpus scan + count
    # shuffle re-runs inside each tiny job
    if not assume_materialized:
        word_counts = word_counts.localCheckpoint()
    spark = word_counts.sparkSession
    vocab_rows = [
        (r["piece"], int(r["c"]))
        for r in unigram_seed(word_counts, max_piece, vocab_size).collect()
    ]
    singles = sorted(p for p, _ in vocab_rows if len(p) == 1)
    singles_set = set(singles)
    for _ in range(int(em_rounds)):
        segs = unigram_viterbi(
            word_counts, _costed_rows(vocab_rows), max_piece, max_word
        )
        used = {
            r["piece"]: int(r["c"])
            for r in segs.select(
                "cnt", F.explode(F.split("seg", r"\|")).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("c"))
            .collect()
        }
        vocab_rows = [(p, max(used.get(p, 0), 1)) for p in singles] + [
            (p, c) for p, c in used.items() if p not in singles_set
        ]
    return spark.createDataFrame(
        _costed_rows(vocab_rows), "piece: string, c: long, cost: long"
    )


def unigram_segment(
    word_counts: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    vocab_size: int = UNI_VOCAB,
    em_rounds: int = UNI_EM_ROUNDS,
    max_word: int = UNI_MAX_WORD,
) -> DataFrame:
    """Fit + serve in one call: the corpus's distinct words Viterbi-
    segmented under the fitted unigram model. Output: (w, cnt,
    n_pieces, seg, cost)."""
    word_counts = word_counts.localCheckpoint()
    model = unigram_fit(
        word_counts,
        max_piece,
        vocab_size,
        em_rounds,
        max_word,
        assume_materialized=True,
    )
    return unigram_viterbi(word_counts, model, max_piece, max_word)
