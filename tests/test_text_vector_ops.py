"""Unit semantics for the round-5 pipeline additions:
duplicated-n-gram fraction (Gopher signal) and int8 embedding
quantization. Oracle parity runs in test_extensions_oracle; these pin
the operator-level contracts on crafted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_storage_spark.operators.similarity import quantize_int8
from time_series_storage_spark.operators.text import dup_ngram_fraction


def test_dup_ngram_fraction_semantics(spark):
    rows = [
        (1, "a b a b a b a b"),        # 3-grams alternate: all duplicated
        (2, "one two three four five"),  # all grams unique
        (3, "x y"),                      # shorter than n: one gram
        (4, ""),                         # empty: one (empty) gram
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_ngram_fraction(df, n=3).collect()}
    # doc 1: 6 gram positions, grams "a b a" x3 and "b a b" x3 — all dup
    assert out[1]["n_grams"] == 6
    assert out[1]["n_dup_positions"] == 6
    assert out[1]["dup_x1000"] == 1000
    # doc 2: 3 positions, all unique
    assert out[2]["n_grams"] == 3
    assert out[2]["dup_x1000"] == 0
    # short + empty docs survive with one never-duplicated gram
    assert out[3]["n_grams"] == 1 and out[3]["dup_x1000"] == 0
    assert out[4]["n_grams"] == 1 and out[4]["dup_x1000"] == 0


def test_dup_ngram_catches_what_top_token_misses(spark):
    """The signal is complementary to repetition_scores: alternating
    two phrases maxes dup-ngrams while no single token dominates."""
    from time_series_storage_spark.operators.text import repetition_scores

    text = " ".join(["red green blue", "cyan pink gold"] * 10)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    [dup] = dup_ngram_fraction(df, n=3).collect()
    [rep] = repetition_scores(df).collect()
    assert dup["dup_x1000"] >= 900        # nearly every gram repeats
    assert rep["rep_x1000"] <= 200        # no token exceeds 1/6 share


def test_quantize_int8_contract(spark):
    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-2.0, 1.0, 0.5, -0.25]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # max-|v| element codes to exactly +/-127; ratios preserved
    assert out[1]["qvec"] == [127, -63, 32, 0]  # floor(-63.5+0.5)=-63
    assert out[1]["scale_x1e9"] == 1_000_000_000
    # all-zero vector: zero codes, zero scale
    assert out[2]["qvec"] == [0, 0, 0, 0]
    assert out[2]["scale_x1e9"] == 0
    # negative max: scale is |v|max, sign preserved
    assert out[3]["qvec"][0] == -127
    # codes always within [-127, 127]
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r["qvec"])


def test_quantize_int8_dequant_error_bounded(spark):
    """Reconstruction q*s/127 is within half a quantization step of the
    original for every element (the correctness bound that makes int8
    storage usable for ANN)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(50)
    q = quantize_int8(emb)
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        F.arrays_zip(
            F.col("embedding").cast("array<double>"),
            F.transform(
                "qvec",
                lambda c: c.cast("double")
                * F.col("scale_x1e9") / 1e9 / 127,
            ),
        ).alias("z"),
        (F.col("scale_x1e9") / 1e9).alias("s"),
    )
    bad = joined.select(
        F.exists(
            "z",
            # half-step + nanoscale flooring slack on the scale itself
            lambda p: F.abs(p["0"] - p["1"])
            > F.col("s") / 254 + F.lit(1e-6),
        ).alias("bad")
    ).where("bad").count()
    assert bad == 0


def test_int8_topk_recall_vs_float(spark):
    """Quantized ranking must closely track float cosine ranking: for
    each query, >= 8 of the int8 top-10 appear in the float top-10 (the
    usual compressed-domain recall bar before exact reranking)."""
    from time_series_storage_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    exact = {}
    for r in brute_force_topk(q, emb, k=10).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx = {}
    for r in int8_topk(q, emb, k=10).collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert set(exact) == set(approx)
    for qid in exact:
        assert len(exact[qid] & approx[qid]) >= 8, qid


def test_build_vocab_and_encode_match_python_model(spark):
    """Vocabulary rank = (count desc, term asc); encode preserves token
    order with OOV -> 0; the two-phase top-k equals the naive global
    rank."""
    from time_series_storage_spark.operators.text import (
        build_vocab,
        vocab_encode,
    )

    rows = [
        (0, "b b b a a c"),
        (1, "a b d d"),
        (2, "e a  b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    vocab = {
        r["term"]: r["term_id"]
        for r in build_vocab(docs, "text", size=3).collect()
    }
    # counts: a=4 b=5 c=1 d=2 e=1 -> top3 = b(1), a(2), d(3)
    assert vocab == {"b": 1, "a": 2, "d": 3}
    enc = {
        r["doc_id"]: (r["n_tokens"], r["ids"])
        for r in vocab_encode(
            docs, build_vocab(docs, "text", size=3)
        ).collect()
    }
    assert enc[0] == (6, "1 1 1 2 2 0")  # c -> OOV 0
    assert enc[1] == (4, "2 1 3 3")
    assert enc[2] == (3, "0 2 1")  # e -> OOV; double space filtered


def test_vocab_encode_plan_broadcast_join_no_global_corpus_sort(spark):
    from time_series_storage_spark.queries_extensions import q_vocab_encode

    plan = (
        q_vocab_encode(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_chunk_windows_edges(spark):
    """Tail chunks are kept short (never dropped), short docs yield one
    chunk, overlap is window - stride, and the plan has no exchange."""
    from time_series_storage_spark.operators.text import chunk_windows

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (1, "a b"),  # shorter than one window
            (2, "solo"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunk_windows(docs, window=4, stride=3).collect()
    }
    # doc 0: starts 1,4,7,10 -> chunks of 4,4,4,1
    assert out[(0, 0)] == (4, "t0 t1 t2 t3")
    assert out[(0, 1)] == (4, "t3 t4 t5 t6")  # 1-token overlap
    assert out[(0, 2)] == (4, "t6 t7 t8 t9")
    assert out[(0, 3)] == (1, "t9")
    assert out[(1, 0)] == (2, "a b")
    assert out[(2, 0)] == (1, "solo")
    assert len(out) == 6
    plan = (
        chunk_windows(docs, window=4, stride=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
