"""Semantic checks for dedup/similarity/text operators on crafted data
(the oracle tests prove Spark<->SQL parity; these prove the operators
find what they claim to find)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators import dedup as D
from time_series_storage_spark.operators import multimodal as M
from time_series_storage_spark.operators import similarity as S
from time_series_storage_spark.operators import text as T

BASE = "the quick brown fox jumps over the lazy dog again and again " * 5
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit of a long text
FAR = "completely different content with no overlap whatsoever here " * 5


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "  the QUICK brown fox jumps over the lazy dog again and again " * 5),
        (3, NEAR),  # near dup of 0
        (4, FAR),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_collapses_normalized(spark, docs):
    # 0 and 1 identical; 2 differs only by case/whitespace -> same group
    out = {r["doc_id"]: r["dup_count"] for r in
           D.exact_dedup(docs, "doc_id", "text").collect()}
    assert out == {0: 3, 3: 1, 4: 1}


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r["d1"], r["d2"]): r["jacc_x1000"] for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                   threshold_x1000=500).collect()}
    assert pairs[(0, 1)] == 1000  # identical
    assert pairs[(0, 3)] >= 500  # one-word edit stays similar
    assert not any(4 in p for p in pairs)  # unrelated text filtered


def test_minhash_lsh_agrees_with_exact(spark, docs):
    lsh = {(r["d1"], r["d2"]) for r in
           D.minhash_lsh_pairs(docs, "doc_id", "text",
                               threshold_x1000=500).collect()}
    # LSH verifies candidates with *exact* jaccard, so any returned pair
    # is truly >= 0.5; the near-dup cluster must be recalled
    assert {(0, 1), (0, 3), (1, 3)} <= lsh
    assert not any(4 in p for p in lsh)


def test_simhash_near_dup_low_hamming(spark, docs):
    pairs = {(r["d1"], r["d2"]): r["hamming"] for r in
             D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0  # identical text, identical signature
    assert (0, 3) in pairs  # one-word edit flips few bits
    assert not any(4 in p for p in pairs)


def test_brute_force_topk_exact_neighbors(spark):
    # 3 clusters on coordinate axes: nearest neighbor = same axis
    vecs = []
    for i in range(12):
        axis = i % 3
        v = [0.0] * S.EMBED_DIM
        v[axis] = 1.0
        v[(axis + 3 + i) % S.EMBED_DIM] = 0.1  # small per-vector noise
        vecs.append((i, v))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    top = S.brute_force_topk(emb.where(F.col("vec_id") < 3), emb, k=3).collect()
    for r in top:
        assert r["vec_id"] % 3 == r["q_id"] % 3  # same-axis cluster wins
        assert r["sim_x1e6"] > 900_000


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF with a sampled codebook must recall same-cluster neighbors:
    on well-separated clusters (each with a sampled centroid) the probe
    set contains the true neighbors' cell, so recall@k vs brute force
    is 1.0. Also pins the output contract (same shape as brute force)."""
    import random

    rng = random.Random(7)
    vecs = []
    # 4 well-separated axis clusters; ids 0..15 cover every cluster, so
    # the 16-vector sampled codebook contains centroids for each
    for i in range(80):
        axis = i % 4
        v = [rng.uniform(-0.05, 0.05) for _ in range(S.EMBED_DIM)]
        v[axis] = 1.0
        vecs.append((i, v))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") < 4)
    exact = S.brute_force_topk(queries, emb, k=5).collect()
    approx = S.ivf_topk(queries, emb, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert set(exact_sets) == set(approx_sets) == {0, 1, 2, 3}
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9  # clustered data: IVF must not miss
    for r in approx:  # neighbors stay in the query's cluster
        assert r["vec_id"] % 4 == r["q_id"] % 4


def test_lsh_bucket_recalls_identical_vectors(spark):
    v = [(i, [float(j == i % 4) for j in range(S.EMBED_DIM)]) for i in range(8)]
    emb = spark.createDataFrame(v, ["vec_id", "embedding"])
    pairs = {(r["v1"], r["v2"]) for r in
             S.lsh_similar_pairs(emb, threshold_x1e6=990_000).collect()}
    # identical vectors always share every hyperplane side -> same bucket
    assert {(0, 4), (1, 5), (2, 6), (3, 7)} <= pairs


def test_connected_components_clusters(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["d1", "d2"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    got = {r["node"]: r["cluster"] for r in
           D.connected_components(pairs, nodes, "id").collect()}
    # chain 0-1-2 collapses to 0 (transitively, not just direct pairs);
    # 5-6 to 5; untouched nodes label themselves
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_star_matches_iterative(spark):
    """Large-star/small-star must produce the identical labeling as
    min-label propagation on an adversarial mix: random edges, a
    41-node path (high diameter — the case star alternation is built
    for), self-loops, duplicate/reversed edges, and singletons."""
    import random

    rng = random.Random(11)
    n = 250
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges += [(i, i + 1) for i in range(180, 220)]  # long path
    edges += [(7, 7), (3, 9), (9, 3)]  # self-loop + reversed dup
    pairs = spark.createDataFrame(edges, ["d1", "d2"])
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    want = sorted(
        map(tuple, D.connected_components(pairs, nodes, "id").collect())
    )
    got = sorted(
        map(tuple, D.connected_components_star(pairs, nodes, "id").collect())
    )
    assert got == want
    # every label is the component minimum: relabeling is idempotent
    labels = {node: c for node, c in got}
    for d1, d2 in edges:
        assert labels[d1] == labels[d2]


def test_connected_components_star_no_edges(spark):
    pairs = spark.createDataFrame([], "d1: long, d2: long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    got = {r["node"]: r["cluster"] for r in
           D.connected_components_star(pairs, nodes, "id").collect()}
    assert got == {i: i for i in range(5)}


def test_ivf_kmeans_codebook_deterministic_and_recalls(spark):
    """The Lloyd-refined codebook is exact fixed-point arithmetic:
    rebuilding it gives bit-identical centroids, and serving the
    clustered-data query through it keeps recall (the refined centroids
    move to the cluster means, so separation only improves)."""
    import random

    rng = random.Random(7)
    vecs = []
    for i in range(80):
        axis = i % 4
        v = [rng.uniform(-0.05, 0.05) for _ in range(S.EMBED_DIM)]
        v[axis] = 1.0
        vecs.append((i, v))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    c1 = sorted(map(tuple, S.ivf_kmeans_centroids(emb, n_iter=2).collect()))
    c2 = sorted(map(tuple, S.ivf_kmeans_centroids(emb, n_iter=2).collect()))
    assert c1 == c2  # exact fixed-point: no float-order wobble
    queries = emb.where(F.col("vec_id") < 4)
    exact = S.brute_force_topk(queries, emb, k=5).collect()
    approx = S.ivf_topk(queries, emb, k=5, kmeans_iters=2).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9


def test_hash_split_deterministic_and_weighted(spark):
    from time_series_storage_spark.operators.split import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id").collect()
    again = hash_split(df, "doc_id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert (r["bucket"] < 98) == (r["split"] == "train")
    assert counts["train"] > 1800 and counts["val"] > 0 and counts["test"] > 0


def test_weighted_mix_quota_semantics(spark):
    """Per-key quotas honored (short groups keep everything), unlisted
    keys get the default, and raising a quota only ADDS rows — the
    stability property that makes re-mixing a growing corpus safe."""
    from time_series_storage_spark.operators.split import weighted_mix

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
    )
    out = weighted_mix(
        docs, "src", "doc_id", {"s0": 10, "s1": 150}, default_quota=3
    ).collect()
    counts = {}
    for r in out:
        counts[r["src"]] = counts.get(r["src"], 0) + 1
        assert r["mix_rank"] <= {"s0": 10, "s1": 150}.get(r["src"], 3)
    # 100 rows per source: quota caps s0, short-group keeps all of s1,
    # default caps s2
    assert counts == {"s0": 10, "s1": 100, "s2": 3}
    kept_small = {r["doc_id"] for r in out if r["src"] == "s0"}
    grown = weighted_mix(
        docs, "src", "doc_id", {"s0": 30, "s1": 150}, default_quota=3
    ).collect()
    kept_big = {r["doc_id"] for r in grown if r["src"] == "s0"}
    assert kept_small < kept_big  # strict superset: growth only adds


def test_ngram_contamination_semantics(spark):
    """Benchmark members self-contaminate at exactly 1000; documents
    sharing no k-gram with the benchmark score 0; partial overlap lands
    strictly between and the flag follows the threshold."""
    docs = spark.createDataFrame(
        [
            (0, "aaaabbbbccccdddd"),  # benchmark member
            (1, "aaaabbbbccccdddd"),  # exact copy -> 1000
            (2, "zzzzyyyyxxxxwwww"),  # disjoint -> 0
            (3, "aaaabbbbcczzyyxx"),  # shares a prefix of shingles
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in D.ngram_contamination(
            docs, docs.where(F.col("doc_id") == 0), k=8, threshold_x1000=500
        ).collect()
    }
    assert len(out) == 4  # every input doc gets a row
    assert out[0]["contam_x1000"] == 1000 and out[0]["is_contaminated"] == 1
    assert out[1]["contam_x1000"] == 1000 and out[1]["is_contaminated"] == 1
    assert out[2]["contam_x1000"] == 0 and out[2]["is_contaminated"] == 0
    assert 0 < out[3]["contam_x1000"] < 1000
    # 16-char text -> 9 shingles; doc 3 shares the first 3 (prefix
    # "aaaabbbbcc" spans shingles at pos 1..3)
    assert out[3]["n_shingles"] == 9 and out[3]["n_hit"] == 3
    assert out[3]["is_contaminated"] == 0  # 333 < 500


def test_asof_join_semantics(spark):
    import datetime as dt

    from time_series_storage_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    left = spark.createDataFrame(
        [(100, "u1", t(10)), (101, "u1", t(30)), (102, "u2", t(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, "u1", t(10)), (2, "u1", t(10)), (3, "u1", t(25)),
         (4, "u2", t(50))],
        ["click_id", "user_id", "ts"],
    )
    out = {r["event_id"]: (r["asof_click_id"], r["asof_ts"]) for r in
           asof_join(left, right, on=["user_id"],
                     right_payload=["click_id"],
                     right_order="click_id").collect()}
    assert out[100] == (2, t(10))  # ts tie matches (<=), max id wins
    assert out[101] == (3, t(25))  # latest preceding, not just any
    assert out[102] == (None, None)  # u2's only click is in the future

    # tolerance bounds the lookback
    tol = {r["event_id"]: r["asof_click_id"] for r in
           asof_join(left, right, on=["user_id"],
                     right_payload=["click_id"], right_order="click_id",
                     tolerance_seconds=60).collect()}
    assert tol[100] == 2 and tol[101] is None  # 5 min lag > 60s

    # a non-castable order column must raise, not silently cast to
    # NULL and make the equal-ts tie-break non-deterministic
    right_str = right.withColumn(
        "click_tag", F.concat(F.lit("c"), F.col("click_id"))
    )
    with pytest.raises(TypeError, match="orderable"):
        asof_join(left, right_str, on=["user_id"],
                  right_payload=["click_tag"])
    # timestamp order columns are fine (ordered natively, no cast)
    asof_join(left, right, on=["user_id"],
              right_payload=["click_id"], right_order="ts").collect()


def test_interval_join_semantics(spark):
    """Containment edges: half-open by default ([start, end)),
    closed with inclusive_end; multi-interval overlap emits one row
    per containing interval; empty intervals and out-of-range points
    emit nothing; intervals spanning many bins still match exactly
    once per point."""
    import datetime as dt

    from time_series_storage_spark.operators.interval import interval_join

    t = lambda m: dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=m)
    points = spark.createDataFrame(
        [(1, "k", t(0)), (2, "k", t(30)), (3, "k", t(60)),
         (4, "k", t(90)), (5, "other", t(30))],
        ["pid", "key", "ts"],
    )
    intervals = spark.createDataFrame(
        [(10, "k", t(0), t(60)),    # [10:00, 11:00)
         (11, "k", t(25), t(35)),   # overlaps 10 around 10:30
         (12, "k", t(90), t(90)),   # empty
         (13, "k", t(-600), t(600))],  # spans many hourly bins
        ["iid", "key", "start_ts", "end_ts"],
    )
    out = interval_join(
        points, intervals, on=["key"], payload=["iid"], bucket_seconds=3600
    )
    got = sorted((r["pid"], r["iv_iid"]) for r in out.collect())
    # pid1: in 10 (start edge) + 13; pid2: 10, 11, 13; pid3: NOT 10
    # (end-exclusive) but in 13; pid4: not in empty 12, in 13;
    # pid5: different key -> only via no interval (none for "other")
    assert got == [(1, 10), (1, 13), (2, 10), (2, 11), (2, 13),
                   (3, 13), (4, 13)]
    closed = interval_join(
        points, intervals, on=["key"], payload=["iid"],
        bucket_seconds=3600, inclusive_end=True,
    )
    got_c = sorted((r["pid"], r["iv_iid"]) for r in closed.collect())
    # end now inclusive: pid3 in 10; the empty interval contains its
    # own instant but no point sits at it except pid4 at t(90) == [90,90]
    assert got_c == [(1, 10), (1, 13), (2, 10), (2, 11), (2, 13),
                     (3, 10), (3, 13), (4, 12), (4, 13)]
    # plan: a hash equi-join on (key, bin), never a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_funnel_greedy_chain(spark):
    import datetime as dt

    from time_series_storage_spark.operators.sessions import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    rows = [
        # u1 completes out of order then in order: purchase(5) before
        # view(10) must NOT count; chain = view(10)->click(20)->purchase(30)
        ("u1", "purchase", t(5)), ("u1", "view", t(10)),
        ("u1", "click", t(20)), ("u1", "purchase", t(30)),
        # u2 stalls after click (its purchase precedes the click)
        ("u2", "view", t(0)), ("u2", "purchase", t(1)), ("u2", "click", t(2)),
        # u3 never views
        ("u3", "click", t(0)), ("u3", "purchase", t(1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["user_id"]: (r["steps_completed"], r["t0"], r["t1"], r["t2"])
           for r in funnel(df, ["user_id"],
                           ["view", "click", "purchase"]).collect()}
    assert got["u1"] == (3, t(10), t(20), t(30))
    assert got["u2"] == (2, t(0), t(2), None)
    assert got["u3"] == (0, None, None, None)


def test_text_quality_and_lang(spark):
    rows = [
        (0, "the cat is on the mat and the dog is in the house"),
        (1, "zzzzzzzzzzzzzzzzzzzz !!!! #### $$$$ %%%%"),
        (2, "der hund und die katze das ist gut und schoen"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    q = {r["doc_id"]: r["quality_x1000"] for r in
         T.quality_signals(df, "text").collect()}
    # doc0: 69% stopwords (outside the [5%,40%] bonus band) + word-length
    # bonus = 700; doc1: junk = 500 + 200 - 400 punct = 300
    assert q[0] == 700 and q[1] == 300 and q[0] > q[1]
    langs = {r["doc_id"]: r[1] for r in
             df.select("doc_id", T.lang_id("text")).collect()}
    assert langs[0] == "en" and langs[2] == "de" and langs[1] == "und"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r[1] for r in
           df.select("doc_id", T.fingerprint("text")).collect()}
    assert fps[0] == fps[2] and fps[0] != fps[1]


def test_multimodal_decode_stub_raises(spark):
    media = M.attach_media(
        spark.createDataFrame([(1, "x" * 250)], ["doc_id", "text"])
        .select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id", "payload",
    )
    frames = M.extract_frames(media).collect()
    assert [r["frame_id"] for r in frames] == [0, 1]  # 250 bytes -> 2 frames
    with pytest.raises(Exception, match="NotImplementedError|real codec"):
        M.extract_frames(media, decode_stub=False).collect()


def test_bloom_contamination_superset_of_exact(spark):
    """Bloom probe vs exact probe on the same corpus/benchmark: the
    bloom can only OVER-count (false positives), never under-count —
    per-document n_hit_bloom >= n_hit_exact, every exact-flagged doc
    is bloom-flagged, and benchmark members still self-flag at 1000."""
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "pack my box with five dozen liquor jugs right now"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "a completely unrelated document about spark physical plans"),
            (4, "pack my box with five dozen liquor jugs right here"),
        ],
        ["doc_id", "text"],
    )
    bench = docs.where(F.col("doc_id") < 2)
    exact = {
        r["doc_id"]: r
        for r in D.ngram_contamination(docs, bench, "doc_id", "text").collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in D.bloom_contamination(docs, bench, "doc_id", "text").collect()
    }
    assert set(exact) == set(bloom) == {0, 1, 2, 3, 4}
    for i in exact:
        assert bloom[i]["n_shingles"] == exact[i]["n_shingles"]
        assert bloom[i]["n_hit"] >= exact[i]["n_hit"]
        if exact[i]["is_contaminated"]:
            assert bloom[i]["is_contaminated"] == 1
    for i in (0, 1, 2):  # benchmark members + verbatim copy
        assert bloom[i]["contam_x1000"] == 1000


def test_bloom_build_is_bounded_and_sign_safe(spark):
    """The bitmap never exceeds m_bits/63 + 1 words and no word has
    the sign bit set (the 63-bit-word contract that keeps shifts
    portable across engines)."""
    bench = spark.createDataFrame(
        [(i, f"document number {i} with some repeated shared text") for i in range(20)],
        ["doc_id", "text"],
    )
    shingles = D.hashed_shingles(bench, "doc_id", "text")
    words = D.bloom_build(shingles).collect()
    assert len(words) <= D.BLOOM_M_BITS // D.BLOOM_WORD_BITS + 1
    for r in words:
        assert r["bits"] > 0  # sign bit clear, at least one bit set
        assert 0 <= r["wi"] <= D.BLOOM_M_BITS // D.BLOOM_WORD_BITS


def test_pq_topk_recall_on_clustered_data(spark):
    """PQ/ADC with the sampled codebook on well-separated clusters:
    every neighbor the approximate ranking returns stays in the
    query's cluster and recall@k vs brute force is high — the encode
    step must map each cluster onto its own codewords. Also pins the
    family output contract and that ADC never returns self-matches."""
    import random

    rng = random.Random(11)
    vecs = []
    for i in range(80):
        axis = i % 4
        v = [rng.uniform(-0.05, 0.05) for _ in range(S.EMBED_DIM)]
        v[axis] = 1.0
        vecs.append((i, v))
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") < 4)
    exact = S.brute_force_topk(queries, emb, k=5).collect()
    approx = S.pq_topk(queries, emb, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
        assert r["vec_id"] != r["q_id"]
        assert 1 <= r["rank"] <= 5
    assert set(exact_sets) == set(approx_sets) == {0, 1, 2, 3}
    for r in approx:  # neighbors stay in the query's cluster
        assert r["vec_id"] % 4 == r["q_id"] % 4
    # within a cluster all members quantize to near-identical codes, so
    # intra-cluster order degenerates to the id tiebreak — recall@k
    # against exact ranking is bounded by quantization, not broken; the
    # hard invariant is cluster containment (asserted above). 2-byte
    # codes on 4 clusters still hit >= 40% of the exact top-5; the
    # rerank pattern (int8_rerank_topk) is the precision path.
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.4


def test_pq_encode_deterministic_and_bounded(spark):
    """pq_encode yields exactly one code per (vector, subspace), codes
    within [0, n_codes), and identical output across two runs (the
    composite-key tiebreak removes any ambiguity on distance ties)."""
    import random

    rng = random.Random(3)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(S.EMBED_DIM)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    cb = S.pq_codebook(emb)
    a = sorted(
        (r["vec_id"], r["s"], r["code"])
        for r in S.pq_encode(emb, cb).collect()
    )
    b = sorted(
        (r["vec_id"], r["s"], r["code"])
        for r in S.pq_encode(emb, cb).collect()
    )
    assert a == b
    assert len(a) == 40 * S.PQ_M
    for _, s, code in a:
        assert 0 <= s < S.PQ_M and 0 <= code < S.PQ_CODES


def test_fuzzy_pairs_blocked_levenshtein(spark):
    """fuzzy_pairs: within-block pairs under the distance cap emit once
    (id1 < id2) with the exact edit distance; cross-block near pairs
    are the documented blocking tradeoff (not emitted)."""
    rows = [
        (1, "red bolt"),
        (2, "ted bolt"),   # lev 1 from red bolt, same noun block
        (3, "red widget"), # different noun -> different block
        (4, "rad bolt"),   # lev 1 from red, 2 from ted
        (5, "totally different gear"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["id1"], r["id2"]): r["lev"]
        for r in D.fuzzy_pairs(df, "id", "name", max_distance=2).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 2}
    plan = (
        D.fuzzy_pairs(df, "id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan  # equi-join on the block key


def test_fingerprint_store_incremental_dedup(spark, tmp_path):
    """Daily-ingest contract: each absorb dedups the increment against
    everything ever absorbed (min-id winner within the increment),
    commits only O(increment) new bytes (history rides as hard links),
    and the returned survivors read from the COMMITTED files — stable
    after later absorbs. On this data the survivor union also equals
    exact_dedup over the concatenated corpus (later duplicates carry
    larger ids here; in general the store is FIRST-DAY-WINS, which can
    differ from the batch global-min winner when a later day brings a
    smaller id — that general contract is property-tested in
    test_properties.py::test_fingerprint_store_matches_sequential_model)."""
    import os

    from time_series_storage_spark.operators.dedup import (
        FingerprintStore,
        exact_dedup,
    )

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    day1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, " ALPHA   text ")],
        ["doc_id", "text"],
    )
    day2 = spark.createDataFrame(
        [(10, "beta text"),        # dup of absorbed 2
         (11, "gamma text"),       # fresh
         (12, "gamma  TEXT"),      # increment-internal dup of 11
         (13, "delta text")],      # fresh
        ["doc_id", "text"],
    )
    s1 = store.absorb(day1, "doc_id", "text")
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 2]
    s2 = store.absorb(day2, "doc_id", "text")
    got2 = {r["doc_id"]: r["dup_count"] for r in s2.collect()}
    assert got2 == {11: 2, 13: 1}
    # s1 still readable after the later commit GC'd its version dir
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 2]
    # union-of-survivors == batch exact_dedup over the whole corpus
    batch = {
        r["doc_id"]
        for r in exact_dedup(day1.unionByName(day2), "doc_id", "text").collect()
    }
    assert {1, 2, 11, 13} == batch
    # empty increment is a no-op commit with an empty survivor set
    s3 = store.absorb(day1, "doc_id", "text")
    assert s3.count() == 0
    # snapshots retained until vacuum; vacuum keeps the current one
    vdirs = [n for n in os.listdir(tmp_path / "fps") if n.startswith("v")]
    assert len(vdirs) == 3
    removed = store.vacuum(keep=1)
    assert len(removed) == 2
    vdirs = [n for n in os.listdir(tmp_path / "fps") if n.startswith("v")]
    assert vdirs == ["v00000002"]
    assert store.seen().count() == 4  # alpha beta gamma delta


def test_fingerprint_store_crash_leaves_old_version_readable(
    spark, tmp_path, monkeypatch
):
    """A crash between staging and publish must leave readers on the
    old complete fingerprint set, and a retry must absorb the same
    increment cleanly (no half-committed state)."""
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    day1 = spark.createDataFrame([(1, "alpha")], ["doc_id", "text"])
    store.absorb(day1, "doc_id", "text")
    day2 = spark.createDataFrame([(2, "beta")], ["doc_id", "text"])

    real_flip = FingerprintStore._flip

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(FingerprintStore, "_flip", boom)
    try:
        store.absorb(day2, "doc_id", "text")
    except RuntimeError:
        pass
    monkeypatch.setattr(FingerprintStore, "_flip", real_flip)
    # reader still sees only day1's fingerprint
    assert store.seen().count() == 1
    # retry succeeds and lands day2
    s = store.absorb(day2, "doc_id", "text")
    assert sorted(r["doc_id"] for r in s.collect()) == [2]
    assert store.seen().count() == 2


def test_fingerprint_store_compact_preserves_content(spark, tmp_path):
    """compact() folds the per-increment file accumulation into one
    consolidated snapshot: same fingerprint set, fewer files, absorbs
    after it still dedup correctly against the compacted history."""
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    for day, text in enumerate(["alpha", "beta", "gamma", "delta"]):
        store.absorb(
            spark.createDataFrame([(day, text)], ["doc_id", "text"]),
            "doc_id", "text",
        )
    before = {r["fp"] for r in store.seen().collect()}
    cur = store._current_dir()
    n_before = len([f for f in os.listdir(cur) if f.endswith(".parquet")])
    assert n_before >= 4  # one file per absorb accumulated
    n_after = store.compact()
    assert n_after == 1
    assert {r["fp"] for r in store.seen().collect()} == before
    # dedup against compacted history still works
    s = store.absorb(
        spark.createDataFrame([(9, "beta"), (10, "omega")], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert [r["doc_id"] for r in s.collect()] == [10]


def test_fingerprint_store_batch_replay_is_exactly_once(spark, tmp_path):
    """absorb(batch_id=...) under the foreachBatch replay contract:
    re-delivering the committed batch re-emits its survivors WITHOUT
    re-absorbing (version count and fingerprint set unchanged), and a
    batch below the watermark emits nothing."""
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    b1 = spark.createDataFrame([(3, "beta"), (4, "gamma")], ["doc_id", "text"])
    s0 = store.absorb(b0, "doc_id", "text", batch_id=0)
    s1 = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r["doc_id"] for r in s1.collect()) == [4]

    def vcount():
        return len([n for n in os.listdir(tmp_path / "fps") if n.startswith("v")])

    n_versions = vcount()
    # replay of the committed batch: same survivors, no new commit
    s1r = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r["doc_id"] for r in s1r.collect()) == [4]
    assert vcount() == n_versions
    # below the watermark: already absorbed AND already emitted -> empty
    s0r = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert s0r.count() == 0
    assert vcount() == n_versions
    assert store.seen().count() == 3
    assert sorted(r["doc_id"] for r in s0.collect()) == [1, 2]


def test_fingerprint_store_foreach_batch_streaming_dedup(spark, tmp_path):
    """End-to-end: a file stream deduped through the persisted store
    via foreachBatch — the union of emitted survivors equals batch
    exact_dedup over the whole feed, and history absorbed BEFORE the
    stream started (a prior day's corpus) suppresses its duplicates,
    which the checkpoint-scoped streaming_exact_dedup cannot do."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    # yesterday's corpus, absorbed before the stream exists
    store.absorb(
        spark.createDataFrame([(100, "old news")], ["doc_id", "text"]),
        "doc_id", "text",
    )
    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "old news"), (2, "fresh story")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(src + "/f0")
    spark.createDataFrame(
        [(3, "fresh story"), (4, "new angle")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(src + "/f1")
    emitted = []

    def emit(df, bid):
        emitted.extend(r["doc_id"] for r in df.collect())

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        stream.writeStream.foreachBatch(
            store.foreach_batch("doc_id", "text", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    # 1 suppressed by yesterday's corpus; 3 by 2 (cross-batch)
    assert sorted(emitted) == [2, 4]
    assert store.seen().count() == 3  # old news, fresh story, new angle


def test_fingerprint_store_null_text_cannot_resurface_daily(spark, tmp_path):
    """A NULL-text document must behave like batch exact_dedup's
    NULL-key group: one survivor ever, not a 'fresh' row every absorb
    (a NULL join key never matches an anti-join, so without the
    sentinel it would re-emit forever)."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    day1 = spark.createDataFrame(
        [(1, None), (2, "real text"), (3, None)], "doc_id long, text string"
    )
    s1 = store.absorb(day1, "doc_id", "text")
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 2]
    day2 = spark.createDataFrame(
        [(10, None), (11, "fresh")], "doc_id long, text string"
    )
    s2 = store.absorb(day2, "doc_id", "text")
    # the null-text doc was absorbed on day 1: only the fresh one survives
    assert sorted(r["doc_id"] for r in s2.collect()) == [11]


def test_fingerprint_store_manual_absorb_keeps_stream_watermark(
    spark, tmp_path
):
    """ADVICE r6 (medium): a MANUAL daily absorb (no batch_id)
    interleaved with the foreachBatch stream on the same store must not
    erase the committed batch watermark — a replayed micro-batch after
    the manual absorb must re-emit ITS OWN committed survivors (not the
    manual increment's, not a re-absorbed duplicate emission)."""
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    s0 = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert sorted(r["doc_id"] for r in s0.collect()) == [1, 2]
    # manual daily absorb between stream batches, no batch_id
    manual = spark.createDataFrame(
        [(50, "gamma"), (51, "alpha")], ["doc_id", "text"]
    )
    sm = store.absorb(manual, "doc_id", "text")
    assert sorted(r["doc_id"] for r in sm.collect()) == [50]

    def vcount():
        return len(
            [n for n in os.listdir(tmp_path / "fps") if n.startswith("v")]
        )

    n_versions = vcount()
    # replayed batch 0: exactly its original survivors, no new commit
    s0r = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert sorted(r["doc_id"] for r in s0r.collect()) == [1, 2]
    assert vcount() == n_versions
    # the next real batch dedups against BOTH the stream and manual history
    b1 = spark.createDataFrame(
        [(60, "gamma"), (61, "delta")], ["doc_id", "text"]
    )
    s1 = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r["doc_id"] for r in s1.collect()) == [61]
    assert store.seen().count() == 4  # alpha beta gamma delta


def test_fingerprint_store_mixed_id_col_schemas(spark, tmp_path):
    """ADVICE r6 (low): absorbing increments under DIFFERENT id column
    names must not leave mixed file schemas in one version dir — the
    stored schema is normalized (id, fp, dup_count) and survivors read
    back under each caller's own column name."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    s1 = store.absorb(
        spark.createDataFrame([(1, "alpha")], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert s1.columns == ["doc_id", "fp", "dup_count"]
    s2 = store.absorb(
        spark.createDataFrame([(7, "alpha"), (8, "beta")], ["uid", "text"]),
        "uid", "text",
    )
    assert s2.columns == ["uid", "fp", "dup_count"]
    assert sorted(r["uid"] for r in s2.collect()) == [8]
    # seen() reads EVERY file in the version dir: uniform schema
    assert store.seen().count() == 2
    # a third absorb still dedups against both histories
    s3 = store.absorb(
        spark.createDataFrame([(9, "beta"), (10, "gamma")], ["doc_id", "text"]),
        "doc_id", "text",
    )
    assert sorted(r["doc_id"] for r in s3.collect()) == [10]


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_fingerprint_store_absorb_crash_replay_exactly_once(
    spark, tmp_path, stage
):
    """Fault injection at EVERY absorb stage (survivor write, each
    history hard-link, pre-publish, post-publish-pre-flip): the flip is
    the single commit point, so a crash at any stage before it leaves
    the store on the previous complete snapshot, and the streaming
    replay of the crashed batch re-absorbs and emits its survivors
    EXACTLY ONCE — no fingerprint lost, none double-absorbed, no
    survivor double-emitted."""
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    store = FingerprintStore(spark, str(tmp_path / "fps"))
    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    s0 = store.absorb(b0, "doc_id", "text", batch_id=0)
    assert sorted(r["doc_id"] for r in s0.collect()) == [1, 2]

    b1 = spark.createDataFrame([(3, "beta"), (4, "gamma")], ["doc_id", "text"])

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._absorb_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(b1, "doc_id", "text", batch_id=1)
    store._absorb_fault = None

    # the crash must not have moved the commit pointer: watermark still
    # batch 0, fingerprint set still day-1 only
    import json

    meta = json.load(open(os.path.join(tmp_path / "fps", "_current")))
    assert meta["batch"] == 0
    assert store.seen().count() == 2
    # replay of the crashed batch (the foreachBatch contract):
    # re-absorbs cleanly, emits the survivors once
    s1 = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r["doc_id"] for r in s1.collect()) == [4]
    assert store.seen().count() == 3
    # a second replay is a no-op re-emission (no new commit)
    vdirs = [n for n in os.listdir(tmp_path / "fps") if n.startswith("v")]
    s1r = store.absorb(b1, "doc_id", "text", batch_id=1)
    assert sorted(r["doc_id"] for r in s1r.collect()) == [4]
    assert [
        n for n in os.listdir(tmp_path / "fps") if n.startswith("v")
    ] == vdirs
    # no stranded staging dirs after the recovery cycle
    assert not [
        n for n in os.listdir(tmp_path / "fps") if n.startswith(".staging-")
    ]


def test_store_format_stamp_and_refusal(spark, tmp_path):
    """Every commit stamps the store format in meta; reopening a store
    whose format is missing or older RAISES loudly instead of silently
    breaking the replay/emission contract (the pre-stamp failure mode:
    a replayed foreachBatch on a format-less store returned empty
    instead of re-emitting its committed survivors)."""
    import json
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    path = str(tmp_path / "fps")
    store = FingerprintStore(spark, path)
    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    store.absorb(docs, "doc_id", "text")
    cur = os.path.join(path, "_current")
    meta = json.load(open(cur))
    assert meta["format"] == FingerprintStore.FORMAT
    # reopen with matching format: fine
    assert FingerprintStore(spark, path).seen().count() == 2
    # simulate a store written by format-less (or older) code
    meta.pop("format")
    json.dump(meta, open(cur, "w"))
    with pytest.raises(ValueError, match="store format"):
        FingerprintStore(spark, path)
    meta["format"] = FingerprintStore.FORMAT - 1
    json.dump(meta, open(cur, "w"))
    with pytest.raises(ValueError, match="store format"):
        FingerprintStore(spark, path)


def test_store_corpus_pin_public_api(spark, tmp_path):
    """is_stale/pin_corpus: the public staleness lifecycle cache
    builders use (no reaching into store internals), riding the same
    atomic pointer flip and surviving later absorbs' carry-forward."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    path = str(tmp_path / "fps")
    store = FingerprintStore(spark, path)
    assert store.is_stale("fp-abc")  # nothing committed yet
    with pytest.raises(ValueError, match="absorb before pinning"):
        store.pin_corpus("fp-abc")
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    store.absorb(docs, "doc_id", "text")
    assert store.is_stale("fp-abc")  # committed but unpinned
    store.pin_corpus("fp-abc")
    assert not store.is_stale("fp-abc")
    assert store.is_stale("fp-other")
    # the pin survives a later absorb (meta carry-forward) and the
    # store still reads its full history
    more = spark.createDataFrame([(5, "zz")], ["doc_id", "text"])
    store.absorb(more, "doc_id", "text")
    assert not store.is_stale("fp-abc")
    assert store.seen().count() == 2


def test_store_lock_file_serializes_commits(spark, tmp_path):
    """absorb takes the store-level lock: while another process-like
    holder owns it, a concurrent absorb must WAIT (single-writer
    serialization lives in the store API now, not caller conventions).
    Probed non-blockingly: with the lock held, LOCK_EX|LOCK_NB on a
    second fd fails; after release it succeeds."""
    import fcntl
    import os

    from time_series_storage_spark.operators.dedup import FingerprintStore

    path = str(tmp_path / "fps")
    store = FingerprintStore(spark, path)
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    store.absorb(docs, "doc_id", "text")  # creates .lock
    lock_path = os.path.join(path, ".lock")
    assert os.path.exists(lock_path)
    with open(lock_path, "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        with open(lock_path, "w") as fh2:
            with pytest.raises(OSError):
                fcntl.flock(fh2, fcntl.LOCK_EX | fcntl.LOCK_NB)
    # released: a follow-up absorb proceeds normally
    more = spark.createDataFrame([(2, "b")], ["doc_id", "text"])
    out = store.absorb(more, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [2]


def test_duplicate_clusters_dispatch_and_equivalence(spark):
    """duplicate_clusters: identical output from both algorithms and
    from auto (which probes edge count with a bounded limit+count);
    unknown algorithm rejected loudly."""
    from time_series_storage_spark.operators.dedup import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["d1", "d2"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
    want = {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7)}
    for algo in ("auto", "minlabel", "star"):
        got = {
            (r.node, r.cluster)
            for r in duplicate_clusters(
                pairs, nodes, algorithm=algo
            ).collect()
        }
        assert got == want, algo
    # tiny threshold forces the star path through auto
    got = {
        (r.node, r.cluster)
        for r in duplicate_clusters(
            pairs, nodes, star_edge_threshold=2
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="unknown algorithm"):
        duplicate_clusters(pairs, nodes, algorithm="bogus")


def test_unionfind_clusters_matches_distributed(spark):
    """The auto-dispatch union-find branch (edge count below
    UF_EDGE_THRESHOLD) is output-identical to both distributed CC
    variants on chains, merged components, self-labeled singletons,
    and an empty edge set — including min-label semantics when edges
    arrive in an adversarial order."""
    from time_series_storage_spark.operators.dedup import (
        _unionfind_clusters,
        connected_components,
        connected_components_star,
    )

    cases = [
        # chain + separate pair + singleton
        [(1, 2), (2, 3), (5, 6)],
        # two components merged late by a bridge, reversed id order
        [(9, 8), (7, 8), (2, 3), (1, 2), (3, 7)],
        # duplicate edges and a triangle
        [(4, 5), (5, 6), (4, 6), (4, 5)],
        # empty graph: everyone a singleton
        [],
    ]
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], ["id"])
    for edges in cases:
        pairs = spark.createDataFrame(
            edges or [(None, None)], "d1: long, d2: long"
        )
        if not edges:
            pairs = pairs.where(F.col("d1").isNotNull())
        uf = {
            (r.node, r.cluster)
            for r in _unionfind_clusters(pairs, nodes, "id").collect()
        }
        ml = {
            (r.node, r.cluster)
            for r in connected_components(pairs, nodes, "id").collect()
        }
        st = {
            (r.node, r.cluster)
            for r in connected_components_star(
                pairs, nodes, "id"
            ).collect()
        }
        assert uf == ml == st, edges


def test_semantic_dedup_blocks_by_cluster_and_dominates(spark):
    """SemDeDup semantics on crafted vectors: two tight clusters far
    apart; within each cluster the lowest-id vector survives and the
    near-copies drop; cross-cluster twins do NOT see each other (the
    published tradeoff: blocking is the learned partition)."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 62

    rows = [
        # cluster around theta=0: 0 keeps, 1/2 are near-copies
        (0, unit(0.00)), (1, unit(0.02)), (2, unit(0.04)),
        # cluster around theta=pi/2: 3 keeps, 4 is a near-copy
        (3, unit(1.57)), (4, unit(1.59)),
        # outlier near cluster 2 but below threshold to nothing
        (5, [0.0] * 62 + [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cents = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(1.57)), (2, [0.0] * 62 + [1.0, 0.0])],
        "cell_id: long, c_vec: array<double>",
    )
    out = {
        r["vec_id"]: (r["cell_id"], r["is_kept"])
        for r in S.semantic_dedup(
            emb, cents, threshold_x1e6=990_000
        ).collect()
    }
    assert out[0] == (0, 1) and out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3] == (1, 1) and out[4] == (1, 0)
    assert out[5] == (2, 1)
    # determinism: the keep rule is lowest-id, not arbitrary
    assert sum(k for _, k in out.values()) == 3


def test_chunk_dedup_first_occurrence_and_reassembly(spark):
    """C4-style chunk dedup on crafted docs: a chunk shared by two
    docs survives only in the earlier one; a chunk repeated INSIDE a
    doc keeps only its first copy; reassembly preserves order."""
    import hashlib

    A = "a b c d e"        # doc0 chunk 0 (chunk_words=5)
    B = "f g h i j"        # doc0 chunk 1
    C = "k l m n o"        # unique to doc1
    rows = [
        (0, f"{A} {B}"),
        (1, f"{B} {C}"),        # B is a cross-doc dup -> dropped here
        (2, f"{C} {C} tail"),   # C dup'd internally + already in doc1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in T.chunk_dedup(docs, chunk_words=5).collect()
    }
    assert (out[0]["n_chunks"], out[0]["n_kept"]) == (2, 2)
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 1)
    # doc2: C (dup of doc1), C again (dup), 'tail' unique -> 1 kept
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (3, 1)
    assert out[1]["new_text_md5"] == hashlib.md5(C.encode()).hexdigest()
    assert out[2]["new_text_md5"] == hashlib.md5(b"tail").hexdigest()
    assert out[0]["new_text_md5"] == hashlib.md5(
        f"{A} {B}".encode()
    ).hexdigest()
    assert out[2]["new_n_chars"] == 4


def test_lm_likelihood_scores_in_distribution_higher(spark):
    """The bigram LM fit on a corpus of repeated 'a b' patterns gives
    an in-distribution doc a higher mean probability than a doc made
    of bigrams the corpus never pairs; exact model arithmetic pinned
    against a hand computation on a 2-doc corpus."""
    rows = [(i, "a b a b a b a b") for i in range(4)] + [(9, "b a x y")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["sum_p_x1e9"] / r["n_bigrams"]
        for r in T.lm_doc_likelihood(docs).collect()
    }
    assert out[0] > out[9]
    # hand check on a tiny corpus: docs 'a b', 'a c' ->
    # c(a)=2, c(b)=c(c)=1, V=3; c(a,b)=1 -> P(b|a)=(1+1)/(2+3)=0.4
    tiny = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_p_x1e9"])
           for r in T.lm_doc_likelihood(tiny).collect()}
    assert got[0] == (1, 400_000_000) and got[1] == (1, 400_000_000)


def test_chunk_dedup_incremental_first_day_wins(spark, tmp_path):
    """Two-day chunk dedup through the persisted FingerprintStore at
    chunk granularity: day-2 chunks already absorbed on day 1 drop
    even though day 2 has a smaller doc_id for them (first-DAY-wins,
    the store family's sequential contract), and fresh day-2 chunks
    keep exactly their increment-first occurrence."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    A, B, C = "a b c", "d e f", "g h i"
    day1 = spark.createDataFrame(
        [(100, f"{A} {B}")], ["doc_id", "text"]
    )
    day2 = spark.createDataFrame(
        [(1, f"{A} {C}"), (2, C)], ["doc_id", "text"]
    )
    store = FingerprintStore(spark, str(tmp_path / "chunkfp"))
    store.absorb(
        T.position_keyed_chunks(day1, chunk_words=3), "_pk", "chunk"
    )
    inc = T.position_keyed_chunks(day2, chunk_words=3)
    kept = store.dedup_increment(inc, "_pk", "chunk").select(
        "_pk", F.lit(True).alias("_keep")
    )
    flagged = inc.join(kept, "_pk", "left").withColumn(
        "_keep", F.coalesce(F.col("_keep"), F.lit(False))
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["new_n_chars"])
        for r in T.reassemble_chunks(flagged).collect()
    }
    # doc1: A absorbed day 1 -> dropped despite smaller doc_id; C fresh
    assert out[1] == (2, 1, len(C))
    # doc2: C already taken by doc1 within the increment
    assert out[2] == (1, 0, 0)


def test_hashed_doc_embedding_model_and_determinism(spark):
    """Feature hashing pinned against a pure-Python model (same md5
    index/sign derivation) and the additive contract: a doc repeated
    twice embeds at exactly 2x the component values."""
    import hashlib

    D = 16

    def model(text):
        vec = [0] * D
        for w in text.split():
            if not w:
                continue
            h = hashlib.md5(w.encode()).hexdigest()
            j = int(h[:12], 16) % D
            s = 1 if int(h[12], 16) % 2 == 0 else -1
            vec[j] += s
        return vec

    rows = [(0, "alpha beta gamma delta"), (1, "alpha alpha beta"),
            (2, "zeta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["emb_str"], r["l1"])
        for r in T.hashed_doc_embedding(docs, dim=D).collect()
    }
    for i, text in rows:
        vec = model(text)
        assert out[i][0] == " ".join(str(x) for x in vec)
        assert out[i][1] == sum(abs(x) for x in vec)
    doubled = spark.createDataFrame(
        [(7, "alpha beta gamma delta alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    twice = T.hashed_doc_embedding(doubled, dim=D).collect()[0]
    assert twice["emb_str"] == " ".join(
        str(2 * x) for x in model(rows[0][1])
    )


def test_fingerprint_store_raw_mode_is_case_preserving(spark, tmp_path):
    """normalize=False fingerprints the RAW text (the chunk-granularity
    contract): case-differing texts stay distinct where the normalized
    doc-level store would merge them, and the mode is pinned in the
    store params so a reopen under the other mode is refused."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    docs = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world")], ["doc_id", "text"]
    )
    raw = FingerprintStore(spark, str(tmp_path / "raw"), normalize=False)
    surv_raw = raw.absorb(docs, "doc_id", "text")
    assert surv_raw.count() == 2  # case preserved -> both survive

    norm = FingerprintStore(spark, str(tmp_path / "norm"))
    surv_norm = norm.absorb(docs, "doc_id", "text")
    assert surv_norm.count() == 1  # normalized -> one survivor

    with pytest.raises(ValueError, match="params"):
        FingerprintStore(spark, str(tmp_path / "raw"), normalize=True)
    with pytest.raises(ValueError, match="params"):
        FingerprintStore(spark, str(tmp_path / "norm"), normalize=False)


def test_chunk_dedup_batch_and_incremental_share_case_semantics(
    spark, tmp_path
):
    """The ADVICE divergence pinned shut: batch chunk_dedup (groupBy
    raw chunk) and the raw-mode incremental store agree that two
    chunks differing only in case are NOT duplicates."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    day1 = spark.createDataFrame([(10, "A B C")], ["doc_id", "text"])
    day2 = spark.createDataFrame([(20, "a b c")], ["doc_id", "text"])
    both = day1.union(day2)
    batch = {
        r["doc_id"]: r["n_kept"]
        for r in T.chunk_dedup(both, chunk_words=3).collect()
    }
    assert batch == {10: 1, 20: 1}  # case differs -> both kept
    store = FingerprintStore(
        spark, str(tmp_path / "chunkraw"), normalize=False
    )
    store.absorb(
        T.position_keyed_chunks(day1, chunk_words=3), "_pk", "chunk"
    )
    inc = T.position_keyed_chunks(day2, chunk_words=3)
    assert store.dedup_increment(inc, "_pk", "chunk").count() == 1


def test_position_keyed_chunks_raises_past_pk_limit(spark):
    """A document at or past ``pk_limit`` chunks would alias into the
    next doc_id's key space; the projection raises loudly instead of
    silently corrupting first-occurrence adjudication."""
    from pyspark.errors import SparkRuntimeException

    ok = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    # 3 chunks of 2 words under limit 4: fine
    assert (
        T.position_keyed_chunks(ok, chunk_words=2, pk_limit=4).count() == 3
    )
    # 5th chunk (chunk_id 4) hits the limit: loud error
    bad = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], ["doc_id", "text"]
    )
    with pytest.raises(
        (SparkRuntimeException, Exception), match="scalar position key"
    ):
        T.position_keyed_chunks(bad, chunk_words=2, pk_limit=4).collect()


def test_duplicate_clusters_auto_probe_rides_a_materialized_pair_set(
    spark, monkeypatch
):
    """The auto dispatch must evaluate the (expensive) pair DAG once:
    since r13 the pair set is localCheckpointed BEFORE the bounded
    probe, so the probe count and the chosen algorithm's edge snapshot
    both read checkpointed rows — the frame handed to the algorithm
    must be a checkpoint (plan truncated to an ExistingRDD scan), not
    the live pair DAG."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["d1", "d2"]
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], ["id"]
    )
    seen = {}
    real = D.connected_components

    def spy(p, n, id_col="id", **kw):
        seen["plan"] = p._jdf.queryExecution().executedPlan().toString()
        return real(p, n, id_col, **kw)

    monkeypatch.setattr(D, "connected_components", spy)
    out = {
        r["node"]: r["cluster"]
        for r in D.duplicate_clusters(pairs, nodes, "id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
    # checkpointed input: the algorithm's frame is a bare RDD scan,
    # not the pair DAG (no join/aggregate left above the source)
    plan = seen["plan"]
    assert "Scan ExistingRDD" in plan, plan


def _esub_model(doc_rows, W):
    """Pure-Python reference for exact_substring_dedup: stride-1
    W-word windows, global first occurrence by (doc_id, start), every
    other occurrence's covered positions removed."""
    toks = {i: [w for w in t.split(" ") if w] for i, t in doc_rows}
    first = {}
    for i in sorted(toks):
        ws = toks[i]
        for s in range(0, len(ws) - W + 1):
            key = tuple(ws[s : s + W])
            if key not in first:
                first[key] = (i, s)
    out = {}
    for i, ws in toks.items():
        removed = set()
        for s in range(0, len(ws) - W + 1):
            if first[tuple(ws[s : s + W])] != (i, s):
                removed.update(range(s, s + W))
        kept = [w for p, w in enumerate(ws) if p not in removed]
        new = " ".join(kept)
        out[i] = (len(ws), len(kept), len(new))
    return out


def test_exact_substring_dedup_matches_model_on_planted_offsets(spark):
    """Random corpus with PLANTED offset duplicates (a span from one
    doc re-inserted elsewhere at an arbitrary word offset — exactly
    the alignment C4 chunking can't see): Spark output equals the
    pure-Python window model on every document."""
    import random

    rng = random.Random(20260815)
    vocab = [f"w{j}" for j in range(24)]
    rows = []
    for i in range(30):
        n = rng.randint(5, 40)
        rows.append([i, [rng.choice(vocab) for _ in range(n)]])
    # plant 8 offset duplicates: a 15-word span from doc a spliced
    # into doc b at a random interior offset
    for _ in range(8):
        a, b = rng.sample(range(30), 2)
        if len(rows[a][1]) < 15:
            continue
        s = rng.randint(0, len(rows[a][1]) - 15)
        span = rows[a][1][s : s + 15]
        at = rng.randint(0, len(rows[b][1]))
        rows[b][1] = rows[b][1][:at] + span + rows[b][1][at:]
    doc_rows = [(i, " ".join(ws)) for i, ws in rows]
    docs = spark.createDataFrame(doc_rows, ["doc_id", "text"])
    W = 8
    got = {
        r["doc_id"]: (r["n_words"], r["n_kept"], r["new_n_chars"])
        for r in T.exact_substring_dedup(docs, window_words=W).collect()
    }
    assert got == _esub_model(doc_rows, W)
    # something was actually deduplicated
    assert any(k < n for n, k, _c in got.values())


def test_exact_substring_catches_what_chunk_dedup_misses(spark):
    """The gap this operator exists to close: a duplicated span at a
    one-word offset straddles C4 chunk boundaries (chunk_dedup keeps
    every chunk of both docs) but dies under stride-1 windows."""
    span = [f"s{j}" for j in range(15)]
    doc0 = span + [f"a{j}" for j in range(5)]
    doc1 = ["junk"] + span + [f"b{j}" for j in range(4)]
    docs = spark.createDataFrame(
        [(0, " ".join(doc0)), (1, " ".join(doc1))], ["doc_id", "text"]
    )
    ch = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in T.chunk_dedup(docs, chunk_words=10).collect()
    }
    assert ch == {0: (2, 2), 1: (2, 2)}  # chunking sees no duplicate
    es = {
        r["doc_id"]: (r["n_words"], r["n_kept"])
        for r in T.exact_substring_dedup(docs, window_words=10).collect()
    }
    assert es[0] == (20, 20)  # first occurrence keeps everything
    assert es[1] == (20, 5)  # the 15-word offset span is removed


def test_exact_substring_short_and_empty_docs_survive_verbatim(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_kept"], r["new_text_md5"])
        for r in T.exact_substring_dedup(docs, window_words=5).collect()
    }
    import hashlib

    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # both below the window floor: kept verbatim (the published
    # contract — only spans of >= W tokens are eligible)
    assert out[0] == (3, 3, h("a b c"))
    assert out[1] == (3, 3, h("a b c"))
    assert out[2] == (0, 0, h(""))


def test_exact_substring_incremental_first_day_wins(spark, tmp_path):
    """Two-day exact substring dedup through the persisted raw-mode
    FingerprintStore at WINDOW grain: a span absorbed on day 1
    suppresses day-2 occurrences even at a smaller doc_id AND at a
    different word offset (the alignment chunk grain can't see);
    within the increment the lower (doc_id, start) occurrence wins;
    fresh spans survive."""
    from time_series_storage_spark.operators.dedup import FingerprintStore

    W = 5
    span = [f"s{j}" for j in range(7)]  # 7 words: 3 windows of 5
    fresh = [f"f{j}" for j in range(7)]
    day1 = spark.createDataFrame(
        [(100, " ".join(span + ["tail1", "tail2"]))], ["doc_id", "text"]
    )
    # doc 1 re-embeds the day-1 span at offset 1; doc 2 repeats doc 1's
    # fresh span at offset 2 within the same increment
    d1 = ["pre"] + span + fresh
    d2 = ["x", "y"] + fresh + ["z"]
    day2 = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], ["doc_id", "text"]
    )
    store = FingerprintStore(spark, str(tmp_path / "esub"), normalize=False)
    store.absorb(
        T.substring_windows(day1, window_words=W).select("_pk", "_win"),
        "_pk", "_win",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_kept"])
        for r in T.exact_substring_dedup_increment(
            store, day2, window_words=W
        ).collect()
    }
    # doc 1: the 7 span words die (absorbed day 1, despite doc_id 1 <
    # 100); "pre" and the fresh 7 survive as first occurrence
    assert out[1] == (15, 8)
    # doc 2: its copy of the fresh span loses to doc 1 within the
    # increment; x y z survive
    assert out[2] == (10, 3)


def test_gopher_quality_rules_signals_and_gate(spark):
    """Each Gopher rule pinned on a crafted doc that fails exactly it;
    a compliant doc passes the full gate (paper thresholds)."""
    good = ("the quick brown foxes have raced to the edge of that "
            "misty valley and waited with their patient friends " * 3)
    rows = [
        (0, good),                                   # passes everything
        (1, "the small cat sat with joy"),           # < 50 words
        (2, ("### ## " * 30) + good),                # symbol-heavy
        (3, " ".join(["12345"] * 60)),               # no alpha, no stops
        (4, "\n".join(["- " + good] * 10)),          # all bullet lines
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in
           T.gopher_quality_rules(docs).collect()}
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0 and out[1]["n_words"] == 6
    assert out[2]["keep"] == 0 and out[2]["symbol_x1000"] > 100
    assert out[3]["keep"] == 0 and out[3]["alpha_x1000"] == 0
    assert out[3]["n_req_stops"] == 0
    assert out[4]["keep"] == 0 and out[4]["bullet_x1000"] == 1000
    # exact signal spot-check on the short doc
    assert out[1]["mwl_x100"] == (3 + 5 + 3 + 3 + 4 + 3) * 100 // 6
    assert out[1]["n_req_stops"] == 2  # the, with


def test_dsir_importance_matches_python_model_and_ranks_target(spark):
    """DSIR scores pinned against a pure-Python model (same md5
    bucketing, same fixed-point ratio), and the semantic contract: a
    document drawn from the target vocabulary outscores (higher mean
    per-term ratio) one drawn from the raw-only vocabulary."""
    import hashlib

    B = 256
    tgt_words = ["alpha", "beta", "gamma", "delta"]
    raw_words = ["zeta", "eta", "theta", "iota"]
    rows = [
        (0, " ".join(tgt_words * 5), True),
        (1, " ".join(tgt_words[::-1] * 5), True),
        (2, " ".join(raw_words * 5), False),
        (3, " ".join(tgt_words * 3), False),   # target-LIKE, not labeled
        (4, " ".join(raw_words[:2] * 8), False),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "_is_target"])

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:12], 16) % B

    terms = {}
    for i, t, is_t in rows:
        ws = t.split()
        terms[i] = (
            [bucket(f"{a} {b}") for a, b in zip(ws, ws[1:])], is_t
        )
    cr, ct = {}, {}
    nr = nt = 0
    for i, (bs, is_t) in terms.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            nr += 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
                nt += 1
    want = {}
    for i, (bs, _t) in terms.items():
        s = sum(
            round((ct.get(b, 0) + 1) * (nr + B) * 1e9
                  / ((cr[b] + 1) * (nt + B)))
            for b in bs
        )
        want[i] = (len(bs), s)
    got = {
        r["doc_id"]: (r["n_terms"], r["sum_ratio_x1e9"])
        for r in T.dsir_importance(docs).collect()
    }
    assert got == want
    mean = lambda i: got[i][1] / got[i][0]  # noqa: E731
    # target-like docs (labeled or not) outrank raw-only docs
    assert mean(3) > mean(2) and mean(0) > mean(2) and mean(3) > mean(4)
