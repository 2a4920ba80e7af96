"""Streaming ingestion: the stateful windowed rollup equals the batch
rollup, and the foreachBatch append path is idempotent + supports
unbounded lateness (late events land in old buckets)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_storage_spark import TimeSeries
from time_series_storage_spark.sources.events import ParquetEventStore
from time_series_storage_spark.streaming import (
    stream_events,
    streaming_append,
    streaming_rollup,
)

TS = dt.datetime(2024, 1, 1, 9, 0)


def _raw(spark, n=200):
    return spark.range(n).select(
        (F.lit(TS) + F.make_interval(mins=F.col("id") * 7 % 180)).alias("ts"),
        (F.col("id") % 5).cast("double").alias("value"),
        F.concat(F.lit("u"), (F.col("id") % 3).cast("string")).alias("user"),
    )


@pytest.fixture()
def stream_setup(spark, tmp_path):
    src = str(tmp_path / "src")
    _raw(spark).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    return src, stream


def test_streaming_rollup_matches_batch(spark, tmp_path, stream_setup):
    src, stream = stream_setup
    eng = TimeSeries(spark)
    eng.define_fact("hits", "average", 15)
    eng.define_dimension("user", facts=["hits"])
    eng.ingest_df("hits", spark.read.parquet(src), dim_cols={"user": "user"})
    batch = {
        ((r["user"],), r["ts"]): (r["counter"], r["total"])
        for r in eng.rollup_df("hits", "user").collect()
    }

    ev = stream_events(stream, "hits", dim_cols={"user": "user"})
    roll = streaming_rollup(ev, eng.fact("hits"), ["user"])
    q = (
        roll.writeStream.format("memory")
        .queryName("roll_hits")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        ((r["user"],), r["ts"]): (r["counter"], r["total"])
        for r in spark.sql("SELECT * FROM roll_hits").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_sessions_match_batch(spark, tmp_path, stream_setup):
    """session_window streaming sessions converge (availableNow,
    complete mode) to the batch sessionize aggregates — state merges
    sessions across micro-batches."""
    from time_series_storage_spark.operators.sessions import session_stats
    from time_series_storage_spark.streaming import streaming_sessions

    src, stream = stream_setup
    batch_src = spark.read.parquet(src).select(
        F.col("user").alias("user_id"), "ts"
    )
    want = sorted(
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["duration_s"])
        for r in session_stats(batch_src, ["user_id"], gap_minutes=30).collect()
    )
    ev = stream.select(F.col("user").alias("user_id"), "ts")
    q = (
        streaming_sessions(ev, ["user_id"], gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["duration_s"])
        for r in spark.sql("SELECT * FROM sess").collect()
    )
    assert got == want and len(got) > 0


def test_compaction_preserves_content_and_coalesces_files(spark, tmp_path):
    """Many small appends (the streaming pattern) -> compact -> same
    rows, one file per (fact, p_date) partition, untouched partitions
    left alone, and a second compact is a no-op."""
    import glob
    import os

    store = ParquetEventStore(spark, str(tmp_path / "evc"))
    for chunk in range(4):  # 4 appends -> >=4 files per partition
        store.append_df(
            stream_events(
                _raw(spark, 50).withColumn(
                    "ts", F.col("ts") + F.make_interval(mins=F.lit(chunk))
                ),
                "hits", dim_cols={"user": "user"},
            )
        )
    before = sorted(
        tuple(r) for r in store.events_df().select("ts", "value").collect()
    )
    frag_dir = glob.glob(str(tmp_path / "evc" / "fact=hits" / "p_date=*"))[0]
    n_before = len([f for f in os.listdir(frag_dir) if f.endswith(".parquet")])
    assert n_before >= 4
    assert store.compact() >= 1
    after = sorted(
        tuple(r) for r in store.events_df().select("ts", "value").collect()
    )
    assert after == before
    for pdir in glob.glob(str(tmp_path / "evc" / "fact=*" / "p_date=*")):
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1, (pdir, files)
    assert store.compact() == 0  # idempotent: nothing fragmented now


def test_expire_drops_old_partitions(spark, tmp_path):
    """Retention removes whole date partitions without touching data
    newer than the cutoff."""
    store = ParquetEventStore(spark, str(tmp_path / "evr"))
    src = _raw(spark).withColumn(
        "ts", F.col("ts") + F.make_interval(days=F.monotonically_increasing_id() % 3)
    )
    store.append_df(stream_events(src, "hits", dim_cols={"user": "user"}))
    days = sorted(
        r["p_date"] for r in store.events_df().select("p_date").distinct().collect()
    )
    assert len(days) >= 2
    cutoff = days[-1]  # keep only the newest day
    n_new = store.events_df().where(F.col("p_date") >= F.lit(cutoff)).count()
    dropped = store.expire(cutoff)
    assert dropped == len(days) - 1
    assert store.events_df().count() == n_new
    assert store.expire(cutoff) == 0


def test_append_sink_replay_after_crash_before_marker(spark, tmp_path):
    """The classic duplicate window — publish done, crash before the
    marker write — must not double-append on replay: the staged files
    were already moved out, so the replay has nothing left to publish."""
    import os

    from time_series_storage_spark.streaming.ingest import (
        IdempotentAppendSink,
    )

    store = ParquetEventStore(spark, str(tmp_path / "ev2"))
    batch = stream_events(_raw(spark), "hits", dim_cols={"user": "user"})
    sink = IdempotentAppendSink(store)
    sink(batch, 7)
    assert store.events_df().count() == 200
    # reconstruct the exact post-crash state: marker missing, staging
    # present with _SUCCESS but drained of part files
    os.remove(sink._marker(7))
    staging = os.path.join(sink.staging_root, "7")
    os.makedirs(staging, exist_ok=True)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    sink(batch, 7)
    assert store.events_df().count() == 200  # replay appended nothing


def test_append_sink_replay_after_partial_staging(spark, tmp_path):
    """A crash mid-staging (no _SUCCESS) restages from scratch."""
    import os

    from time_series_storage_spark.streaming.ingest import (
        IdempotentAppendSink,
    )

    store = ParquetEventStore(spark, str(tmp_path / "ev3"))
    batch = stream_events(_raw(spark), "hits", dim_cols={"user": "user"})
    sink = IdempotentAppendSink(store)
    staging = os.path.join(sink.staging_root, "3")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-garbage.parquet"), "w") as fh:
        fh.write("half-written junk")
    sink(batch, 3)
    assert store.events_df().count() == 200


def test_streaming_append_idempotent_and_late(spark, tmp_path, stream_setup):
    src, stream = stream_setup
    store = ParquetEventStore(spark, str(tmp_path / "events"))
    ev = stream_events(stream, "hits", dim_cols={"user": "user"})
    for ckpt in ("ck1", "ck1"):  # same checkpoint: second run is a no-op
        q = (
            streaming_append(ev, store)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    n = store.events_df().count()
    assert n == 200  # replay did not double-append

    # a replayed *batch id* is skipped even from a fresh checkpoint
    # (marker-file idempotence, not just stream-offset tracking)
    q = (
        streaming_append(ev, store)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert store.events_df().count() == n

    # unbounded lateness: an event 2 years old lands in its old bucket
    eng = TimeSeries(spark, store=store)
    eng.define_fact("hits", "average", 15)
    eng.define_dimension("user", facts=["hits"])
    old = dt.datetime(2022, 3, 1, 10, 7)
    eng.new_fact("hits", 9.0, {"user": "u9"}, old)
    got = eng.get_timeseries_map(
        "hits", "user", {}, dt.datetime(2022, 3, 1), dt.datetime(2022, 3, 2)
    )
    assert got == {(("user", "u9"),): {"all": {"counter": 1, "total": 9.0}}}


def test_text_scorers_compose_with_streams(spark, tmp_path):
    """The text scoring operators are stateless Catalyst projections,
    so the SAME operator code runs unchanged on a readStream — the
    batch/stream unification a scoring pipeline relies on (score docs
    as they arrive, no reimplementation)."""
    from time_series_storage_spark.operators import text as T

    src = str(tmp_path / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(100).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    want = sorted(
        (r["doc_id"], r["quality_x1000"], r["lang_pred"], r["fp"])
        for r in T.quality_signals(batch, "text").select(
            "doc_id",
            "quality_x1000",
            T.lang_id("text").alias("lang_pred"),
            T.fingerprint("text").alias("fp"),
        ).collect()
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        T.quality_signals(stream, "text")
        .select(
            "doc_id",
            "quality_x1000",
            T.lang_id("text").alias("lang_pred"),
            T.fingerprint("text").alias("fp"),
        )
        .writeStream.format("memory")
        .queryName("scored_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_text"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["quality_x1000"], r["lang_pred"], r["fp"])
        for r in spark.sql("SELECT * FROM scored_stream").collect()
    )
    assert got == want and len(got) == 100


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """Streaming benchmark decontamination (stream-static broadcast
    probe, stateless per-row set algebra) must produce exactly the
    batch ngram_contamination output for every arriving document."""
    from time_series_storage_spark.operators.dedup import (
        ngram_contamination,
    )
    from time_series_storage_spark.streaming.scoring import (
        streaming_ngram_contamination,
    )

    src = str(tmp_path / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(120).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    bench = batch.where(batch["doc_id"] < 10)
    cols = ["doc_id", "n_shingles", "n_hit", "contam_x1000",
            "is_contaminated"]
    want = sorted(
        tuple(r[c] for c in cols)
        for r in ngram_contamination(batch, bench, threshold_x1000=500)
        .collect()
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_ngram_contamination(stream, bench, threshold_x1000=500)
        .writeStream.format("memory")
        .queryName("decon_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_decon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM decon_stream").collect()
    )
    assert got == want and len(got) == 120
    # self-contamination sanity: benchmark members score 1000
    full = {r[0]: r for r in got}
    assert all(full[i][3] == 1000 for i in range(10) if i in full)


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream point-in-interval join (state-store form) must
    produce exactly the batch interval_join's matches on complete
    data."""
    from time_series_storage_spark.operators.interval import interval_join
    from time_series_storage_spark.streaming.joins import (
        streaming_interval_join,
    )

    t = lambda m: TS + dt.timedelta(minutes=m)
    pts_rows = [(1, "k", t(5)), (2, "k", t(45)), (3, "k", t(61)),
                (4, "j", t(10)), (5, "k", t(200))]
    iv_rows = [(10, "k", t(0), t(60)), (11, "k", t(40), t(50)),
               (12, "j", t(0), t(30))]
    psrc, isrc = str(tmp_path / "pts"), str(tmp_path / "ivs")
    pts = spark.createDataFrame(pts_rows, ["pid", "key", "ts"])
    ivs = spark.createDataFrame(
        iv_rows, ["iid", "key", "start_ts", "end_ts"]
    )
    pts.coalesce(1).write.parquet(psrc)
    ivs.coalesce(1).write.parquet(isrc)
    want = sorted(
        (r["pid"], r["iv_iid"])
        for r in interval_join(
            pts, ivs, on=["key"], payload=["iid"]
        ).collect()
    )
    p_stream = spark.readStream.schema(pts.schema).parquet(psrc)
    i_stream = spark.readStream.schema(ivs.schema).parquet(isrc)
    q = (
        streaming_interval_join(
            p_stream, i_stream, on=["key"], payload=["iid"],
            watermark="10 minutes",
        )
        .writeStream.format("memory")
        .queryName("sivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["pid"], r["iv_iid"])
        for r in spark.sql("SELECT * FROM sivj").collect()
    )
    assert got == want and len(got) > 0

    # bounded-state form: declaring a true interval-duration upper
    # bound (longest interval here is 60 min) adds the point-side
    # eviction clause WITHOUT changing any match
    q2 = (
        streaming_interval_join(
            p_stream, i_stream, on=["key"], payload=["iid"],
            watermark="10 minutes", max_interval_seconds=3600,
        )
        .writeStream.format("memory")
        .queryName("sivj_bounded")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ivj_b"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_b = sorted(
        (r["pid"], r["iv_iid"])
        for r in spark.sql("SELECT * FROM sivj_bounded").collect()
    )
    assert got_b == want

    # an UNDER-declared bound (10 min) must drop matches deep inside
    # the long interval — the documented tradeoff, pinned so the
    # semantics of a wrong bound are explicit, not silent surprise
    q3 = (
        streaming_interval_join(
            p_stream, i_stream, on=["key"], payload=["iid"],
            watermark="10 minutes", max_interval_seconds=600,
        )
        .writeStream.format("memory")
        .queryName("sivj_narrow")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ivj_n"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(120)
    got_n = sorted(
        (r["pid"], r["iv_iid"])
        for r in spark.sql("SELECT * FROM sivj_narrow").collect()
    )
    assert set(got_n) < set(want)  # strictly fewer: early matches gone
    # interval 11 [t+40, t+50) fits the 10-min bound, so its match
    # survives; interval 10's matches (t+5, t+45) fall before its
    # eviction cutoff (end - 10 min = t+50) and are gone
    assert (2, 11) in got_n
    assert (1, 10) not in got_n and (2, 10) not in got_n


def test_redact_composes_with_streams(spark, tmp_path):
    """PII redaction (text.redact) is a stateless rule-ordered
    projection, so the identical operator code scrubs a readStream in
    append mode with no state or watermark — redact-on-arrival, the
    deployment shape a privacy pipeline needs (data must be scrubbed
    BEFORE it lands anywhere persistent)."""
    from time_series_storage_spark.operators.text import redact

    rows = [
        (1, "mail a@b.co and c@d.org"),
        (2, "ip 10.0.0.1 ticket 1234567"),
        (3, "nothing sensitive"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "pii_docs")
    batch.coalesce(1).write.parquet(src)
    stored = spark.read.parquet(src)
    want = sorted(
        (r["doc_id"], r["clean"], r["n_redactions"])
        for r in redact(stored, "doc_id", "text").collect()
    )
    stream = spark.readStream.schema(stored.schema).parquet(src)
    q = (
        redact(stream, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("redacted_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_redact"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["clean"], r["n_redactions"])
        for r in spark.sql("SELECT * FROM redacted_stream").collect()
    )
    assert got == want
    by_id = dict((d, c) for d, c, _ in got)
    assert by_id[1] == "mail <EMAIL> and <EMAIL>"
    assert by_id[2] == "ip <IP> ticket <ID>"
    assert by_id[3] == "nothing sensitive"


def test_streaming_m4_matches_batch(spark, tmp_path):
    """Streamed M4 (watermarked windowed min/max/min_by/max_by) must
    equal the batch m4_downsample of the union once every row has
    arrived — across multiple micro-batches and with the duplicate-
    timestamp tiebreak exercised (two rows share one second)."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import m4_downsample
    from time_series_storage_spark.streaming.ingest import streaming_m4

    base = dt.datetime(2024, 5, 1)
    rows = []
    rid = 0
    for i in range(120):
        k = "a" if i % 3 else "b"
        ts = base + dt.timedelta(seconds=(i * 37) % 7200)
        rows.append((rid, k, ts, (i * 13) % 100 - 50))
        rid += 1
    rows.append((rid, "a", rows[0][2], 999))  # duplicate-second tie
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "id long, k string, ts timestamp, q long")
    for i in range(3):  # three single-file micro-batches
        df.where(F.col("id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
    batch = {
        (r["k"], r["bucket_ts"]): (
            r["n_obs"], r["min_q"], r["max_q"], r["first_q"], r["last_q"]
        )
        for r in m4_downsample(
            spark.read.parquet(f"{src}/*"), ["k"], 900, id_col="id"
        ).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    out = streaming_m4(stream, ["k"], 900, q_col="q", id_col="id")
    q = (
        out.writeStream.format("memory")
        .queryName("sm4")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["k"], r["bucket_ts"]): (
            r["n_obs"], r["min_q"], r["max_q"], r["first_q"], r["last_q"]
        )
        for r in spark.sql("SELECT * FROM sm4").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_bloom_decontamination_matches_batch(spark, tmp_path):
    """Streaming Bloom decontamination (per-row SQL-lambda bit tests
    against the one-row broadcast bitmap) must equal the batch
    bloom_contamination output for every arriving document."""
    from time_series_storage_spark.operators.dedup import (
        bloom_contamination,
    )
    from time_series_storage_spark.streaming.scoring import (
        streaming_bloom_contamination,
    )

    src = str(tmp_path / "bdocs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(120).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    bench = batch.where(batch["doc_id"] < 10)
    cols = ["doc_id", "n_shingles", "n_hit", "contam_x1000",
            "is_contaminated"]
    want = sorted(
        tuple(r[c] for c in cols)
        for r in bloom_contamination(batch, bench, threshold_x1000=500)
        .collect()
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_bloom_contamination(stream, bench, threshold_x1000=500)
        .writeStream.format("memory")
        .queryName("bdecon_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_bdecon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM bdecon_stream").collect()
    )
    assert got == want and len(got) == 120
    full = {r[0]: r for r in got}
    assert all(full[i][3] == 1000 for i in range(10) if i in full)


def test_streaming_curation_pipeline_composes(spark, tmp_path):
    """The STATELESS curation stages compose on one readStream as a
    single plan — quality scoring -> quality floor -> token-n-gram
    decontamination probe (stream-static broadcast) -> survivor emit —
    and converge row-for-row to the same stages composed in batch
    (the pipeline_e2e chain minus its stateful dedup stages, which
    have their own stateful twins). No shuffle, no state, no
    watermark: the whole composition is projections over one
    broadcast probe, so append mode just works."""
    from time_series_storage_spark.operators import text as T
    from time_series_storage_spark.operators.dedup import (
        token_ngram_contamination,
    )
    from time_series_storage_spark.queries_extensions import (
        DECON_TOKEN_N,
        PIPE_QUALITY_MIN,
    )
    from time_series_storage_spark.streaming.scoring import (
        streaming_token_ngram_contamination,
    )

    src = str(tmp_path / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(150).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    bench = batch.where(batch["doc_id"] < 10)

    def compose(df, decon):
        scored = T.quality_signals(df, "text").where(
            F.col("quality_x1000") >= PIPE_QUALITY_MIN
        )
        probed = decon(scored)
        return probed.where(F.col("is_contaminated") == 0).select(
            "doc_id", "quality_x1000", "n_shingles", "n_hit"
        )

    want = sorted(
        tuple(r) for r in compose(
            batch,
            lambda d: token_ngram_contamination(
                d, bench, n=DECON_TOKEN_N, threshold_x1000=500
            ).join(d.select("doc_id", "quality_x1000"), "doc_id"),
        ).collect()
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        compose(
            stream,
            lambda d: streaming_token_ngram_contamination(
                d, bench, n=DECON_TOKEN_N, threshold_x1000=500,
                carry_cols=("quality_x1000",),
            ),
        )
        .writeStream.format("memory")
        .queryName("curation_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT * FROM curation_stream").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_contamination_report_matches_batch(spark, tmp_path):
    """The multi-suite streaming report (one broadcast row holding
    every suite's gram set, per-row intersections) must match the
    batch contamination_report row-for-row on the same corpus and
    the same doc_id-slice suites."""
    from time_series_storage_spark.queries_extensions import (
        DECON_TOKEN_N,
        SUITE_MOD,
        q_contamination_report,
    )
    from time_series_storage_spark.streaming.scoring import (
        streaming_contamination_report,
    )

    src = str(tmp_path / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(200).coalesce(1).write.parquet(src)
    batch = spark.read.parquet(src)
    cols = ["doc_id", "n_grams", "hits_eval_a", "hits_eval_b",
            "hits_eval_c", "worst_suite"]
    # the batch query reads the FULL sf dir — rebuild its frame over
    # the same limited corpus by pointing it at a dir holding only it
    import os
    import shutil

    sf_like = str(tmp_path / "sf")
    os.makedirs(sf_like)
    shutil.copytree(src, os.path.join(sf_like, "documents.parquet"))
    want = sorted(
        tuple(r[c] for c in cols)
        for r in q_contamination_report(spark, sf_like).collect()
    )
    suites = {
        f"eval_{t}": batch.where(batch["doc_id"] % SUITE_MOD == k)
        for t, k in (("a", 0), ("b", 1), ("c", 2))
    }
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_contamination_report(
            stream, suites, n=DECON_TOKEN_N
        )
        .writeStream.format("memory")
        .queryName("screport")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_rep"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM screport").collect()
    )
    assert got == want and len(got) == 200
