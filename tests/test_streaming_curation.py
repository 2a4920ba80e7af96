"""streaming/curation.py — the two-store curation foreachBatch.

Pins the property the module docstring claims: exactly-once ACROSS
stores without a cross-store transaction — in particular the
crash-BETWEEN-the-commits case, where the LM watermark is one batch
ahead of the fingerprint watermark and the replay must converge both
without double-adding counts or double-suppressing survivors.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark.operators.dedup import FingerprintStore
from time_series_storage_spark.operators.lm_store import LmModelStore
from time_series_storage_spark.streaming.curation import (
    curation_foreach_batch,
)

DOCS_SCHEMA = "doc_id long, text string"

# Threshold 120e6 separates the corpus below under BOTH possible
# batch orders: docs made of DAY1 bigrams score >= ~144e6 mean
# probability (seen bigrams, add-one over V=9), while the fully
# unseen zebra doc scores the floor 1e9/(0+9) ~= 111e6. Exact values
# are pinned against the pure-Python model in test_lm_store; this
# suite pins the PIPELINE contract.
THR = 120_000_000

DAY1 = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on a log"),
    (3, "a cat and a dog"),
]
B0 = [
    (10, "the cat sat on the mat"),   # passes gate; dup of absorbed 1
    (11, "the dog sat on a mat"),     # passes gate; fresh -> survivor
    (12, "zebra quagga zebra"),       # fails gate (unseen floor)
]
B1 = [
    (20, "the dog sat on a mat"),     # passes; dup of batch-0's 11
    (21, "a cat and a dog"),          # passes; dup of absorbed 3
    (22, "the cat sat on a log"),     # passes; fresh -> survivor
]


def _df(spark, docs):
    return spark.createDataFrame(docs, DOCS_SCHEMA)


def _stores(spark, tmp_path):
    lm = LmModelStore(spark, str(tmp_path / "lm"))
    fp = FingerprintStore(spark, str(tmp_path / "fp"))
    lm.absorb(_df(spark, DAY1), "doc_id", "text")
    fp.absorb(_df(spark, DAY1), "doc_id", "text")
    return lm, fp


def test_curation_stream_end_to_end(spark, tmp_path):
    """File stream through the composed pipeline: gate failures and
    historical/cross-batch duplicates never reach the emission; the
    fingerprint store grows only by gated survivors."""
    lm, fp = _stores(spark, tmp_path)
    src = str(tmp_path / "feed")
    _df(spark, B0).coalesce(1).write.parquet(src + "/f0")
    _df(spark, B1).coalesce(1).write.parquet(src + "/f1")

    emitted = []

    def emit(df, bid):
        emitted.extend(r.doc_id for r in df.collect())

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            curation_foreach_batch(lm, fp, THR, "doc_id", "text", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    # survivors regardless of file ordering: 11/20 are the same text,
    # so exactly one of them survives (whichever batch ran first);
    # 22 always survives; 10/12/21 never do.
    assert sorted(emitted) in ([11, 22], [20, 22])
    # LM model absorbed EVERY doc (gate filters the dedup feed, not
    # the model fit); fingerprint store holds history + survivors
    assert lm.vocab_size().collect()[0].v > 0
    fps = {r.fp for r in fp.seen().collect()}
    assert len(fps) == 3 + 2  # 3 distinct day-1 texts + 2 survivors


def test_curation_crash_between_stores_replays_exactly_once(
    spark, tmp_path
):
    """Inject a commit crash in the SECOND store: the LM watermark
    commits batch 1, the fingerprint watermark stays at batch 0. The
    replay re-reads the LM's committed emission (no count
    double-add), regenerates the identical survivor set, and lands
    the fingerprint commit — both stores converge to the no-crash
    state."""
    lm, fp = _stores(spark, tmp_path)
    outs = {}

    def emit(df, bid):
        outs[bid] = sorted(r.doc_id for r in df.collect())

    fn = curation_foreach_batch(lm, fp, THR, "doc_id", "text", emit)
    fn(_df(spark, B0), 0)
    assert outs[0] == [11]

    lm_rows_after_b0 = sorted(
        (r.w, r.c1) for r in lm.unigram_counts().collect()
    )

    def boom(stage):
        if stage == "post_write":
            raise RuntimeError("injected crash between stores")

    fp._commit_fault = boom
    with pytest.raises(RuntimeError, match="between stores"):
        fn(_df(spark, B1), 1)
    fp._commit_fault = None

    # torn state: LM ahead by one batch, fingerprint store intact
    assert json.load(open(os.path.join(tmp_path / "lm", "_current")))[
        "batch"
    ] == 1
    assert json.load(open(os.path.join(tmp_path / "fp", "_current")))[
        "batch"
    ] == 0
    lm_rows_torn = sorted(
        (r.w, r.c1) for r in lm.unigram_counts().collect()
    )
    assert lm_rows_torn != lm_rows_after_b0  # B1 counts landed once

    # replay converges both stores
    fn(_df(spark, B1), 1)
    assert outs[1] == [22]
    assert sorted(
        (r.w, r.c1) for r in lm.unigram_counts().collect()
    ) == lm_rows_torn  # replay did NOT double-add
    assert json.load(open(os.path.join(tmp_path / "fp", "_current")))[
        "batch"
    ] == 1
    assert len({r.fp for r in fp.seen().collect()}) == 5

    # a second full replay of the converged batch is a pure read
    fn(_df(spark, B1), 1)
    assert outs[1] == [22]
    assert sorted(
        (r.w, r.c1) for r in lm.unigram_counts().collect()
    ) == lm_rows_torn


def test_curation_gate_blocks_model_only_docs(spark, tmp_path):
    """A document that fails the LM gate still trains the model (its
    counts absorb) but never touches the fingerprint store — later
    copies of it keep failing the gate rather than being deduped."""
    lm, fp = _stores(spark, tmp_path)
    outs = {}

    def emit(df, bid):
        outs[bid] = sorted(r.doc_id for r in df.collect())

    fn = curation_foreach_batch(lm, fp, THR, "doc_id", "text", emit)
    fn(_df(spark, [(30, "zebra quagga zebra")]), 0)
    assert outs[0] == []
    # the zebra text is IN the model now...
    assert any(r.w == "zebra" for r in lm.unigram_counts().collect())
    # ...but NOT in the fingerprint set
    n_before = len({r.fp for r in fp.seen().collect()})
    assert n_before == 3


# -- three-store chain (LM gate -> text dedup -> image near-dup) -------------

def _render(docs):
    """Deterministic text->JPEG render (the test's storage fetch):
    each doc's utf-8 bytes as a constant-tile mosaic baseline JPEG."""
    import pandas as pd

    from time_series_storage_spark.operators.jpeg_codec import (
        bytes_to_mosaic,
        encode_jpeg,
    )

    def to_jpeg(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        bytearray(encode_jpeg(bytes_to_mosaic(t.encode())))
                        for t in pdf["text"]
                    ],
                }
            )

    return docs.mapInPandas(to_jpeg, "doc_id long, payload binary")


def _stores3(spark, tmp_path, tag):
    from time_series_storage_spark.operators.phash import ImgNearDupStore

    lm = LmModelStore(spark, str(tmp_path / f"lm{tag}"))
    fp = FingerprintStore(spark, str(tmp_path / f"fp{tag}"))
    img = ImgNearDupStore(spark, str(tmp_path / f"img{tag}"))
    lm.absorb(_df(spark, DAY1), "doc_id", "text")
    fp.absorb(_df(spark, DAY1), "doc_id", "text")
    img.absorb(_render(_df(spark, DAY1)), "doc_id", "payload")
    return lm, fp, img


def _state3(lm, fp, img):
    return (
        sorted((r.w, r.c1) for r in lm.unigram_counts().collect()),
        sorted(r.fp for r in fp.seen().collect()),
        sorted((r.id, r.phash) for r in img.hashes().collect()),
    )


@pytest.mark.parametrize("crash_store", ["fp", "img"])
def test_three_store_chain_crash_converges_to_no_crash_twin(
    spark, tmp_path, crash_store
):
    """Crash the chain at EACH of the two new commit boundaries (the
    text-dedup commit mid-chain; the image commit at the tail): after
    the torn batch is replayed, emissions and all three stores'
    contents equal a never-crashed twin chain fed the same batches —
    the three per-store watermarks converge under one replay and
    nothing double-absorbs."""
    from time_series_storage_spark.streaming.curation import (
        curation_media_foreach_batch,
    )

    # never-crashed twin
    t_lm, t_fp, t_img = _stores3(spark, tmp_path, "t")
    t_out = {}
    t_fn = curation_media_foreach_batch(
        t_lm, t_fp, t_img, _render, THR, "doc_id", "text",
        lambda df, b: t_out.__setitem__(b, sorted(r.doc_id for r in df.collect())),
    )
    t_fn(_df(spark, B0), 0)
    t_fn(_df(spark, B1), 1)

    # crash chain
    lm, fp, img = _stores3(spark, tmp_path, "c")
    out = {}
    fn = curation_media_foreach_batch(
        lm, fp, img, _render, THR, "doc_id", "text",
        lambda df, b: out.__setitem__(b, sorted(r.doc_id for r in df.collect())),
    )
    fn(_df(spark, B0), 0)
    assert out[0] == t_out[0]

    victim = fp if crash_store == "fp" else img

    def boom(stage):
        if stage == "post_write":
            raise RuntimeError("injected chain crash")

    victim._commit_fault = boom
    with pytest.raises(RuntimeError, match="chain crash"):
        fn(_df(spark, B1), 1)
    victim._commit_fault = None

    # torn front: stores upstream of the victim committed batch 1
    lm_b = json.load(open(os.path.join(str(tmp_path), "lmc", "_current")))["batch"]
    fp_b = json.load(open(os.path.join(str(tmp_path), "fpc", "_current")))["batch"]
    img_b = json.load(open(os.path.join(str(tmp_path), "imgc", "_current")))["batch"]
    if crash_store == "fp":
        assert (lm_b, fp_b, img_b) == (1, 0, 0)
    else:
        assert (lm_b, fp_b, img_b) == (1, 1, 0)

    # one replay converges everything to the twin's state
    fn(_df(spark, B1), 1)
    assert out[1] == t_out[1]
    assert _state3(lm, fp, img) == _state3(t_lm, t_fp, t_img)
    for path in ("lmc", "fpc", "imgc"):
        assert json.load(
            open(os.path.join(str(tmp_path), path, "_current"))
        )["batch"] == 1

    # a further replay of the converged batch is a pure read
    st = _state3(lm, fp, img)
    fn(_df(spark, B1), 1)
    assert out[1] == t_out[1] and _state3(lm, fp, img) == st


# -- streaming exact-substring dedup -----------------------------------------

def test_esub_stream_crash_replay_emits_identical_survivors(
    spark, tmp_path
):
    """Streaming exact-substring dedup is exactly-once: batch 0's
    retained spans suppress batch 1's occurrences at any offset; a
    commit crash during batch 1 leaves batch 0's state intact, and the
    replay emits byte-identical reassembled survivors to a
    never-crashed twin without double-absorbing windows."""
    from time_series_storage_spark.streaming.curation import (
        esub_foreach_batch,
    )

    W = 5
    span = [f"s{j}" for j in range(8)]
    b0 = [(100, " ".join(span + ["t1", "t2"]))]
    b1 = [(1, " ".join(["pre"] + span + ["x", "y"])),
          (2, " ".join([f"f{j}" for j in range(6)]))]

    def run(tag, crash=False):
        store = FingerprintStore(
            spark, str(tmp_path / f"es{tag}"), normalize=False
        )
        outs = {}

        def emit(df, bid):
            outs[bid] = sorted(
                (r.doc_id, r.n_words, r.n_kept, r.new_text_md5)
                for r in df.collect()
            )

        fn = esub_foreach_batch(store, W, "doc_id", "text", emit)
        fn(_df(spark, b0), 0)
        if crash:
            def boom(stage):
                if stage == "post_write":
                    raise RuntimeError("injected esub crash")
            store._commit_fault = boom
            with pytest.raises(RuntimeError, match="esub crash"):
                fn(_df(spark, b1), 1)
            store._commit_fault = None
        fn(_df(spark, b1), 1)
        if crash:  # a further replay of the committed batch: pure read
            fn(_df(spark, b1), 1)
        return outs, sorted(r.fp for r in store.seen().collect())

    want, want_fps = run("t")
    got, got_fps = run("c", crash=True)
    assert got == want and got_fps == want_fps
    # semantic spot-check: doc 1's 8-word span died across batches at
    # offset 1; doc 2 untouched (below the window floor)
    out1 = dict((d, (n, k)) for d, n, k, _m in want[1])
    assert out1[1] == (11, 3)   # pre, x, y survive
    assert out1[2] == (6, 6)


# -- streaming modern pipeline (Gopher -> DSIR -> substring dedup) -----------

MW = 5  # substring window for the modern-chain tests

# >= 50 words, mean word length in [3,10], every word alphabetic-ish,
# one required stop word ('the') -> all three long docs pass Gopher;
# vocab A (alpha*) is the 'en' target slice, vocab B (zulu*) is not.
_A_WORDS = ["the"] + [f"alpha{i}" for i in range(59)]
_B_WORDS = ["the"] + [f"zulu{i}" for i in range(59)]
DOC_A1 = " ".join(_A_WORDS)
DOC_B1 = " ".join(_B_WORDS)
# shares _A_WORDS[3:9] (a 6-word span = two full 5-windows) with DOC_A1;
# fresh-vocab filler keeps its DSIR ratio above 1
DOC_A2 = " ".join(
    ["the", "pre1", "pre2"] + _A_WORDS[3:9]
    + [f"alpha{100 + i}" for i in range(45)]
)

MB0 = [(1, DOC_A1, "en"), (2, DOC_B1, "xx")]
MB1 = [
    (10, DOC_A2, "en"),   # selected; batch-0 span dies at offset 3
    (11, DOC_B1, "xx"),   # Gopher-passes; DSIR filters (ratio < 1)
    (12, "too short", "en"),  # Gopher-fails (word count)
]


def _mdf(spark, docs):
    return spark.createDataFrame(
        docs, "doc_id long, text string, lang string"
    ).withColumn("_t", F.col("lang") == "en")


def _mstores(spark, tmp_path, tag):
    from time_series_storage_spark.operators.dsir_store import (
        DsirModelStore,
    )

    dsir = DsirModelStore(spark, str(tmp_path / f"md{tag}"))
    esub = FingerprintStore(
        spark, str(tmp_path / f"me{tag}"), normalize=False
    )
    return dsir, esub


def _mstate(dsir, esub):
    return (
        sorted((r.b, r.cr) for r in dsir.raw_counts().collect()),
        sorted((r.b, r.ct) for r in dsir.target_counts().collect()),
        sorted(r.fp for r in esub.seen().collect()),
    )


@pytest.mark.parametrize("crash_store", ["dsir", "esub"])
def test_modern_chain_crash_converges_to_no_crash_twin(
    spark, tmp_path, crash_store
):
    """The modern chain (Gopher -> DSIR store -> window store) is
    exactly-once across BOTH store disciplines: crash the ADDITIVE
    store's commit, then separately the union store's, and in each
    case one replay of the torn batch converges emissions and both
    stores to a never-crashed twin — the additive store never
    double-adds counts, the window store never double-absorbs."""
    from time_series_storage_spark.streaming.curation import (
        modern_curation_foreach_batch,
    )

    def mk(tag, stores):
        outs = {}
        fn = modern_curation_foreach_batch(
            stores[0], stores[1], MW, 1_000_000_000, 1,
            "doc_id", "text", "_t",
            lambda df, b: outs.__setitem__(
                b, sorted(
                    (r.doc_id, r.n_words, r.n_kept, r.new_text_md5)
                    for r in df.collect()
                )
            ),
        )
        return fn, outs

    t_stores = _mstores(spark, tmp_path, "t")
    t_fn, t_out = mk("t", t_stores)
    t_fn(_mdf(spark, MB0), 0)
    t_fn(_mdf(spark, MB1), 1)

    # semantic pins on the twin: batch 0 keeps both docs whole (empty
    # model selects everything; all windows fresh); batch 1 emits ONLY
    # doc 10 (11 DSIR-filtered, 12 Gopher-filtered), with the 6-word
    # batch-0 span removed
    assert [(d, n, k) for d, n, k, _m in t_out[0]] == [
        (1, 60, 60), (2, 60, 60)
    ]
    assert [(d, n, k) for d, n, k, _m in t_out[1]] == [(10, 54, 48)]

    c_stores = _mstores(spark, tmp_path, "c")
    fn, out = mk("c", c_stores)
    fn(_mdf(spark, MB0), 0)
    assert out[0] == t_out[0]

    victim = c_stores[0] if crash_store == "dsir" else c_stores[1]

    def boom(stage):
        if stage == "post_write":
            raise RuntimeError("injected modern-chain crash")

    victim._commit_fault = boom
    with pytest.raises(RuntimeError, match="modern-chain"):
        fn(_mdf(spark, MB1), 1)
    victim._commit_fault = None

    # torn front: stores upstream of the victim committed batch 1
    d_b = json.load(open(os.path.join(str(tmp_path), "mdc", "_current")))["batch"]
    e_b = json.load(open(os.path.join(str(tmp_path), "mec", "_current")))["batch"]
    assert (d_b, e_b) == ((0, 0) if crash_store == "dsir" else (1, 0))

    # one replay converges emissions and both stores to the twin
    fn(_mdf(spark, MB1), 1)
    assert out[1] == t_out[1]
    assert _mstate(*c_stores) == _mstate(*t_stores)

    # a further replay of the converged batch is a pure read
    st = _mstate(*c_stores)
    fn(_mdf(spark, MB1), 1)
    assert out[1] == t_out[1] and _mstate(*c_stores) == st


# -- three-discipline monitored chain (LM + fingerprints + histogram) --------

MON_DOCS_SCHEMA = "doc_id long, text string, source string"
MON_DAY1 = [(i, t, "web") for i, t in DAY1]
MON_B0 = [
    (10, "the cat sat on the mat", "web"),
    (11, "the dog sat on a mat", "web"),
    (12, "zebra quagga zebra", "web"),
]
MON_B1 = [
    (20, "the dog sat on a mat", "web"),
    (21, "a cat and a dog", "web"),
    (22, "the cat sat on a log", "news"),
]


def _mon_df(spark, docs):
    return spark.createDataFrame(docs, MON_DOCS_SCHEMA)


def _mon_stores(spark, tmp_path):
    from time_series_storage_spark.operators.hist_store import (
        HistogramStore,
    )

    lm = LmModelStore(spark, str(tmp_path / "lm"))
    fp = FingerprintStore(spark, str(tmp_path / "fp"))
    hist = HistogramStore(
        spark, str(tmp_path / "hist"), bucket_width=8, n_buckets=8
    )
    lm.absorb(_mon_df(spark, MON_DAY1), "doc_id", "text")
    fp.absorb(_mon_df(spark, MON_DAY1), "doc_id", "text")
    hist.absorb(
        _mon_df(spark, MON_DAY1).select(
            "source", F.length("text").alias("_len")
        ),
        "source",
        "_len",
    )
    return lm, fp, hist


def _run_monitored(spark, tmp_path, crash_store=None, crash_batch=None):
    from time_series_storage_spark.streaming.curation import (
        monitored_curation_foreach_batch,
    )

    lm, fp, hist = _mon_stores(spark, tmp_path)
    surv, drift = {}, {}

    def emit(sdf, ddf, bid):
        surv[bid] = sorted(r.doc_id for r in sdf.collect())
        drift[bid] = {
            r.source: (r.n_hist, r.n_inc, r.l1_x1e6)
            for r in ddf.collect()
        }

    fn = monitored_curation_foreach_batch(
        lm, fp, hist, THR, "doc_id", "text", "source", emit
    )
    stores = {"lm": lm, "fp": fp, "hist": hist}
    for bid, batch in ((0, MON_B0), (1, MON_B1)):
        if crash_batch == bid and crash_store is not None:
            target = stores[crash_store]

            def boom(stage):
                if stage == "post_write":
                    raise RuntimeError("injected")

            target._commit_fault = boom
            with pytest.raises(RuntimeError, match="injected"):
                fn(_mon_df(spark, batch), bid)
            target._commit_fault = None
        fn(_mon_df(spark, batch), bid)
    return stores, surv, drift


def test_monitored_curation_end_to_end(spark, tmp_path):
    """LM gate + dedup + survivor-length drift in one chain: the
    drift emission covers exactly the survivor keys per batch, with
    history = day-1 survivors (+ earlier batches'), and the
    fingerprint survivors match the two-store pipeline."""
    stores, surv, drift = _run_monitored(spark, tmp_path)
    assert surv[0] == [11] and surv[1] == [22]
    # batch 0's survivor (11, 'web', len 20) drifts against day-1 web
    assert set(drift[0]) == {"web"} and drift[0]["web"][1] == 1
    assert drift[0]["web"][0] == 3  # day-1 history rows
    # batch 1's survivor is the first 'news' doc: no baseline -> -1
    assert drift[1] == {"news": (0, 1, -1)}
    # histogram holds day1 + both batches' survivors
    hrows = dict(
        ((r.gk, r.b), r.c)
        for r in stores["hist"].histogram().collect()
    )
    assert sum(c for (g, _), c in hrows.items() if g == "web") == 4
    assert sum(c for (g, _), c in hrows.items() if g == "news") == 1


@pytest.mark.parametrize("crash_store", ["lm", "fp", "hist"])
def test_monitored_curation_crash_any_commit_converges(
    spark, tmp_path, crash_store
):
    """A commit crash at ANY of the three stores, replayed under the
    same batch id, converges every store and both emissions to the
    no-crash state — the three-discipline instantiation of the
    module's induction argument."""
    clean_tmp = tmp_path / "clean"
    crash_tmp = tmp_path / "crash"
    clean_tmp.mkdir()
    crash_tmp.mkdir()
    _, surv_c, drift_c = _run_monitored(spark, clean_tmp)
    stores, surv, drift = _run_monitored(
        spark, crash_tmp, crash_store=crash_store, crash_batch=1
    )
    assert surv == surv_c and drift == drift_c
    from time_series_storage_spark.operators.hist_store import (
        HistogramStore,
    )

    clean_hist = HistogramStore(
        spark, str(clean_tmp / "hist"), bucket_width=8, n_buckets=8
    )
    got = {
        (r.gk, r.b): r.c for r in stores["hist"].histogram().collect()
    }
    want = {(r.gk, r.b): r.c for r in clean_hist.histogram().collect()}
    assert got == want


# -- five-store sketch-audited chain -------------------------------------------


def _sk_stores(spark, tmp_path):
    from time_series_storage_spark.operators.cms_store import CmsStore
    from time_series_storage_spark.operators.hll_store import HllSketchStore
    from time_series_storage_spark.operators.qsketch_store import (
        QuantileSketchStore,
    )
    from time_series_storage_spark.operators.sketch_store import (
        KmvSketchStore,
    )

    lm = LmModelStore(spark, str(tmp_path / "lm"))
    fp = FingerprintStore(spark, str(tmp_path / "fp"))
    kmv = KmvSketchStore(spark, str(tmp_path / "kmv"), k=5)
    hll = HllSketchStore(spark, str(tmp_path / "hll"))
    cms = CmsStore(spark, str(tmp_path / "cms"))
    qsk = QuantileSketchStore(spark, str(tmp_path / "qsk"))
    lm.absorb(_mon_df(spark, MON_DAY1), "doc_id", "text")
    fp.absorb(_mon_df(spark, MON_DAY1), "doc_id", "text")
    day1_toks = _mon_df(spark, MON_DAY1).select(
        "source", F.explode(F.split("text", " ")).alias("_tok")
    ).where(F.col("_tok") != "")
    kmv.absorb(day1_toks, "source", "_tok")
    hll.absorb(day1_toks, "source", "_tok")
    cms.absorb(day1_toks, "_tok")
    day1_lens = _mon_df(spark, MON_DAY1).select(
        "source",
        F.greatest(
            F.lit(1),
            F.size(F.filter(F.split("text", " "), lambda t: t != "")),
        ).cast("long").alias("_len"),
    )
    qsk.absorb(day1_lens, "source", "_len")
    return {
        "lm": lm, "fp": fp, "kmv": kmv, "hll": hll, "cms": cms, "qsk": qsk,
    }


def _run_sketch_audited(spark, tmp_path, crash_store=None, crash_batch=None):
    from time_series_storage_spark.streaming.curation import (
        sketch_audited_curation_foreach_batch,
    )

    stores = _sk_stores(spark, tmp_path)
    surv, kmv_e, hll_e, cms_e, qsk_e = {}, {}, {}, {}, {}

    def emit(sdf, kdf, hdf, cdf, qdf, bid):
        surv[bid] = sorted(r.doc_id for r in sdf.collect())
        kmv_e[bid] = {r.source: r.est_distinct for r in kdf.collect()}
        hll_e[bid] = {r.source: r.est_distinct for r in hdf.collect()}
        cms_e[bid] = {r._tok: r.est_cnt for r in cdf.collect()}
        qsk_e[bid] = {
            r.source: (r.n_total, r.p50_lb, r.p95_lb, r.p99_lb)
            for r in qdf.collect()
        }

    fn = sketch_audited_curation_foreach_batch(
        stores["lm"], stores["fp"], stores["kmv"], stores["hll"],
        stores["cms"], THR, "doc_id", "text", "source", emit,
        qsk_store=stores["qsk"],
    )
    for bid, batch in ((0, MON_B0), (1, MON_B1)):
        if crash_batch == bid and crash_store is not None:
            target = stores[crash_store]

            def boom(stage):
                if stage == "post_write":
                    raise RuntimeError("injected")

            target._commit_fault = boom
            with pytest.raises(RuntimeError, match="injected"):
                fn(_mon_df(spark, batch), bid)
            target._commit_fault = None
        fn(_mon_df(spark, batch), bid)
    return stores, (surv, kmv_e, hll_e, cms_e, qsk_e)


def test_sketch_audited_chain_end_to_end(spark, tmp_path):
    """LM gate -> dedup -> three sketch monitors in one chain: the
    survivor set matches the monitored chain's, every emission covers
    exactly the survivor keys/tokens, and the KMV and HLL estimates
    agree on the tiny per-key vocabularies (both exact/near-exact in
    the small regime by construction)."""
    stores, (surv, kmv_e, hll_e, cms_e, qsk_e) = _run_sketch_audited(
        spark, tmp_path
    )
    assert surv[0] == [11] and surv[1] == [22]
    # survivors' keys only
    assert set(kmv_e[0]) == {"web"} and set(kmv_e[1]) == {"news"}
    assert set(hll_e[0]) == {"web"} and set(hll_e[1]) == {"news"}
    # doc 22 = 'the cat sat on a log': 6 distinct tokens, first news
    # day. HLL (256 registers) resolves it EXACTLY via the
    # linear-counting branch; the deliberately tiny k=5 KMV saturates
    # at 6 > k and returns its deterministic estimator value — the
    # disagreement between the two monitors is itself the alert
    # signal this chain exists to emit.
    assert hll_e[1]["news"] == 6
    import hashlib
    toks = ["the", "cat", "sat", "on", "a", "log"]
    hs = sorted(
        int(hashlib.md5(t.encode()).hexdigest()[:12], 16) for t in toks
    )[:5]
    kth = max(hs)
    m = 1 << 48
    want_kmv = 4 * (m // kth) + (4 * (m % kth)) // kth
    assert kmv_e[1]["news"] == want_kmv
    # CMS emission covers exactly the survivor-batch tokens
    assert set(cms_e[1]) == {"the", "cat", "sat", "on", "a", "log"}
    # every CMS estimate >= this batch's own count (overestimate-only)
    assert all(v >= 1 for v in cms_e[1].values())
    # the quantile member (6th store): emissions cover exactly the
    # survivor keys, percentile lower bounds are monotone, and doc
    # 22's 6-token length is inside the served [p50_lb, p99_lb+width]
    assert set(qsk_e[0]) == {"web"} and set(qsk_e[1]) == {"news"}
    for n_total, p50, p95, p99 in qsk_e[1].values():
        assert n_total >= 1 and 1 <= p50 <= p95 <= p99


@pytest.mark.parametrize(
    "crash_store", ["lm", "fp", "kmv", "hll", "cms", "qsk"]
)
def test_sketch_audited_chain_crash_any_commit_converges(
    spark, tmp_path, crash_store
):
    """A commit crash at ANY of the six stores, replayed under the
    same batch id, converges every store and all five emissions to
    the no-crash state — the full-algebra instantiation of the
    module's induction argument (union, additive, keep-min, max,
    additive-counter and additive-quantile disciplines in one
    chain)."""
    clean_tmp = tmp_path / "clean"
    crash_tmp = tmp_path / "crash"
    clean_tmp.mkdir()
    crash_tmp.mkdir()
    _, clean = _run_sketch_audited(spark, clean_tmp)
    stores, got = _run_sketch_audited(
        spark, crash_tmp, crash_store=crash_store, crash_batch=1
    )
    assert got == clean
    # the crashed store's final state equals its never-crashed twin
    from time_series_storage_spark.operators.cms_store import CmsStore
    from time_series_storage_spark.operators.hll_store import HllSketchStore
    from time_series_storage_spark.operators.qsketch_store import (
        QuantileSketchStore,
    )
    from time_series_storage_spark.operators.sketch_store import (
        KmvSketchStore,
    )

    twins = {
        "kmv": lambda d: KmvSketchStore(spark, str(d / "kmv"), k=5)
        .minima().collect(),
        "hll": lambda d: HllSketchStore(spark, str(d / "hll"))
        .registers().collect(),
        "cms": lambda d: CmsStore(spark, str(d / "cms"))
        .counters().collect(),
        "qsk": lambda d: QuantileSketchStore(spark, str(d / "qsk"))
        .counters().collect(),
    }
    for name, read in twins.items():
        got_rows = sorted(map(tuple, read(crash_tmp)))
        want_rows = sorted(map(tuple, read(clean_tmp)))
        assert got_rows == want_rows, name
