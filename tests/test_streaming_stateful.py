"""Custom stateful streaming: exact-dedup state and the
applyInPandasWithState funnel must converge to their batch twins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

TS = dt.datetime(2024, 6, 1, 8, 0)


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from time_series_storage_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "docs")
    b1 = spark.createDataFrame(
        [(0, "alpha text", TS), (1, "beta text", TS),
         (2, "  ALPHA   text ", TS)],  # normalized dup of 0
        ["doc_id", "text", "ts"],
    )
    b2 = spark.createDataFrame(
        [(3, "beta text", TS + dt.timedelta(minutes=1)),  # dup of 1
         (4, "gamma text", TS + dt.timedelta(minutes=1))],
        ["doc_id", "text", "ts"],
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    stream = spark.readStream.schema(
        spark.read.parquet(src + "/f1").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sdedup").collect()
    # one survivor per normalized fingerprint, across batches
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 4]


def test_streaming_funnel_hot_key_large_batch(spark, tmp_path):
    """One key delivering a large micro-batch (the skew case the
    vectorized state fn exists for): result must equal the batch
    funnel, with the steps buried deep in the event stream."""
    from time_series_storage_spark.operators.sessions import funnel
    from time_series_storage_spark.streaming import streaming_funnel

    n = 20_000
    src = str(tmp_path / "hot")
    ev = spark.range(n).select(
        F.lit("hot").alias("user_id"),
        # noise everywhere; the real steps appear at fixed offsets
        F.when(F.col("id") == 5_000, F.lit("view"))
        .when(F.col("id") == 12_000, F.lit("click"))
        .when(F.col("id") == 19_000, F.lit("purchase"))
        .otherwise(F.lit("noise"))
        .alias("event_type"),
        (F.lit(TS) + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    ev.coalesce(1).write.parquet(src + "/f1")
    stream = spark.readStream.schema(ev.schema).parquet(src + "/*")
    q = (
        streaming_funnel(stream, "user_id", ["view", "click", "purchase"])
        .writeStream.format("memory")
        .queryName("hotfunnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM hotfunnel ORDER BY steps_completed DESC"
    ).collect()
    assert rows, "no state update emitted"
    got = rows[0]
    want = funnel(ev, ["user_id"], ["view", "click", "purchase"]).collect()[0]
    assert got["steps_completed"] == want["steps_completed"] == 3
    for i, tcol in enumerate(["t0", "t1", "t2"]):
        assert got[tcol] == int(want[tcol].timestamp()), tcol


def test_streaming_funnel_converges_to_batch(spark, tmp_path):
    from time_series_storage_spark.operators.sessions import funnel
    from time_series_storage_spark.streaming import streaming_funnel

    t = lambda m: TS + dt.timedelta(minutes=m)
    early = [  # batch 1 (earlier events)
        ("u1", "purchase", t(0)),  # out of order: must not match
        ("u1", "view", t(5)),
        ("u2", "view", t(1)), ("u2", "click", t(2)),
        ("u3", "click", t(3)),
    ]
    late = [  # batch 2 (later events) — u1 completes across batches
        ("u1", "click", t(10)), ("u1", "purchase", t(20)),
        ("u2", "view", t(30)),  # no purchase: stays at 2
    ]
    cols = ["user_id", "event_type", "ts"]
    src = str(tmp_path / "ev")
    spark.createDataFrame(early, cols).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(late, cols).coalesce(1).write.parquet(src + "/f2")
    stream = spark.readStream.schema(
        spark.read.parquet(src + "/f1").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_funnel(stream, "user_id", ["view", "click", "purchase"])
        .writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest update per key = final progress
    final = {}
    for r in spark.sql("SELECT * FROM sfunnel").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["steps_completed"] > cur["steps_completed"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r
        for r in funnel(
            spark.createDataFrame(early + late, cols),
            ["user_id"], ["view", "click", "purchase"],
        ).collect()
    }
    assert set(final) == set(batch)
    for k, b in batch.items():
        s = final[k]
        assert s["steps_completed"] == b["steps_completed"], k
        for i, tcol in enumerate(["t0", "t1", "t2"]):
            want = (
                int(b[tcol].timestamp()) if b[tcol] is not None else -1
            )
            assert s[tcol] == want, (k, tcol)


def test_streaming_asof_matches_batch(spark, tmp_path):
    """Streaming backward as-of (custom applyInPandasWithState state)
    must converge to the batch asof_join on in-order data — including
    across MULTIPLE micro-batches, where the right-side buffer carries
    matches forward in state."""
    import datetime as dt

    from pyspark.sql import functions as F

    from time_series_storage_spark.operators.asof import asof_join
    from time_series_storage_spark.streaming.stateful import (
        streaming_asof_join,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=m)
    lrows = [(100, "a", t(10)), (101, "a", t(30)), (102, "b", t(5)),
             (103, "a", t(65)), (104, "b", t(70))]
    rrows = [(1, "a", t(10)), (2, "a", t(10)), (3, "a", t(25)),
             (4, "b", t(50)), (5, "a", t(60))]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(rrows, ["rid", "k", "ts"])
    # two files per side -> multiple micro-batches with maxFilesPerTrigger
    ldf.where("lid <= 102").coalesce(1).write.parquet(lsrc + "/p1")
    ldf.where("lid > 102").coalesce(1).write.parquet(lsrc + "/p2")
    rdf.where("rid <= 3").coalesce(1).write.parquet(rsrc + "/p1")
    rdf.where("rid > 3").coalesce(1).write.parquet(rsrc + "/p2")

    want = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], right_payload=["rid"], right_order="rid"
        ).collect()
    }

    l_stream = (
        spark.readStream.schema(ldf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc + "/*")
    )
    r_stream = (
        spark.readStream.schema(rdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc + "/*")
    )
    q = (
        streaming_asof_join(
            l_stream, r_stream, on="k", left_id="lid", right_id="rid",
            lookback_seconds=7200,
        )
        .writeStream.format("memory")
        .queryName("sasof")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["lid"]: r["asof_rid"]
        for r in spark.sql("SELECT * FROM sasof").collect()
    }
    assert set(got) == set(want)
    # file ordering across the two sources is not guaranteed: a left
    # processed in a batch BEFORE its matching right arrives may emit
    # an earlier (or no) match — but it must never emit a LATER-than-
    # correct or wrong-key match, and in-state rights must serve later
    # batches (lid 103/104 arrive last and must match rights from
    # state). Deterministic rows: every match equals the batch answer
    # or an earlier-arriving prefix of it.
    batch_prefix_ok = {
        100: {2},            # rights 1,2 at ts10 arrive in r/p1
        101: {3},            # right 3 in r/p1
        102: {None},
        103: {5, 3},         # 5 if r/p2 processed first, else 3
        104: {4, None},
    }
    for lid, rid in got.items():
        assert rid in batch_prefix_ok[lid], (lid, rid)
    # the multi-batch lefts must have found SOME stateful match
    assert got[103] is not None


def test_streaming_kmv_converges_to_batch(spark, tmp_path):
    """After any prefix of micro-batches the streaming KMV state is
    the batch sketch of the union — pinned here at the end of three
    single-file micro-batches against operators.sketch.kmv_estimate
    on the same rows. The sketch's merge algebra (union minima, keep
    k smallest) is what makes this exact, not approximate."""
    from time_series_storage_spark.operators.sketch import kmv_estimate
    from time_series_storage_spark.streaming.stateful import (
        streaming_kmv_distinct,
    )

    K = 16
    src = str(tmp_path / "el")
    parts = []
    for i in range(3):
        rows = [
            ("g1", f"tok-{(i * 97 + j) % 400}") for j in range(300)
        ] + [("g2", f"tok-{j % 5}") for j in range(20)]
        parts.append(rows)
        spark.createDataFrame(rows, "k string, e string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{src}/f0").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_kmv_distinct(stream, "k", "e", k=K)
        .writeStream.format("memory")
        .queryName("skmv")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emission per key: n_mins never decreases and kth_min
    # never increases as batches absorb — pick (max n, min kth)
    final = {}
    for r in spark.sql("SELECT * FROM skmv").collect():
        cur = final.get(r["k"])
        if cur is None or (r["n_mins"], -r["kth_min"]) > (
            cur["n_mins"], -cur["kth_min"]
        ):
            final[r["k"]] = r
    all_rows = [x for p in parts for x in p]
    batch = {
        r.k: r
        for r in kmv_estimate(
            spark.createDataFrame(all_rows, "k string, e string"),
            ["k"], "e", k=K,
        ).collect()
    }
    assert set(final) == set(batch) == {"g1", "g2"}
    for key in batch:
        s, b = final[key], batch[key]
        assert (s["n_mins"], s["kth_min"], s["est_distinct"]) == (
            b.n_mins, b.kth_min, b.est_distinct
        ), key
    # g2 has 5 distinct tokens -> exact path
    assert final["g2"]["est_distinct"] == 5


def test_streaming_heavy_hitters_exact_under_capacity(spark, tmp_path):
    """With distinct elements <= capacity per key, SpaceSaving is
    exact: after three micro-batches every tracked count equals the
    batch groupBy count of the union and max_err is 0."""
    from time_series_storage_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / "el")
    parts = []
    for i in range(3):
        rows = [("g1", f"t{j % 6}") for j in range(40 + i * 10)] + [
            ("g2", f"u{j % 3}") for j in range(15)
        ]
        parts.append(rows)
        spark.createDataFrame(rows, "k string, e string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{src}/f0").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_heavy_hitters(stream, "k", "e", capacity=8)
        .writeStream.format("memory")
        .queryName("shh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emission per (key, item): the highest est_count wins
    final = {}
    for r in spark.sql("SELECT * FROM shh").collect():
        cur = final.get((r["k"], r["item"]))
        if cur is None or r["est_count"] > cur["est_count"]:
            final[(r["k"], r["item"])] = r
    all_rows = [x for p in parts for x in p]
    truth = {}
    for k, e in all_rows:
        truth[(k, e)] = truth.get((k, e), 0) + 1
    assert set(final) == set(truth)
    for key, r in final.items():
        assert r["est_count"] == truth[key], key
        assert r["max_err"] == 0, key


def test_streaming_heavy_hitters_bounds_over_capacity(spark, tmp_path):
    """With more distinct elements than counters, the SpaceSaving
    bounds hold: est - err <= true <= est for every tracked item, and
    every item with true count > total/capacity is tracked."""
    from time_series_storage_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    CAP = 4
    src = str(tmp_path / "el2")
    parts = []
    for i in range(3):
        # two genuinely heavy items + a rotating tail of rare ones
        rows = (
            [("g", "heavy-a")] * 30
            + [("g", "heavy-b")] * 20
            + [("g", f"rare-{i}-{j}") for j in range(10)]
        )
        parts.append(rows)
        spark.createDataFrame(rows, "k string, e string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{src}/f0").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_heavy_hitters(stream, "k", "e", capacity=CAP)
        .writeStream.format("memory")
        .queryName("shh2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM shh2").collect()
    final = {}
    for r in rows:
        cur = final.get(r["item"])
        if cur is None or r["est_count"] > cur["est_count"]:
            final[r["item"]] = r
    all_rows = [x for p in parts for x in p]
    truth = {}
    for _, e in all_rows:
        truth[e] = truth.get(e, 0) + 1
    total = len(all_rows)
    # the two heavies must be tracked with exact-or-over counts
    for item in ("heavy-a", "heavy-b"):
        r = final[item]
        assert r["est_count"] >= truth[item]
        assert r["est_count"] - r["max_err"] <= truth[item]
    # every tracked item obeys the sandwich bound
    for item, r in final.items():
        true = truth.get(item, 0)
        assert r["est_count"] >= true
        assert r["est_count"] - r["max_err"] <= true
    # anything above total/capacity must be present
    for item, c in truth.items():
        if c > total // CAP:
            assert item in final, item


def test_streaming_gap_detect_converges_to_batch(spark, tmp_path):
    """Time-ordered micro-batches: the streamed gaps equal the batch
    gap_detect output exactly, including a gap that straddles a
    micro-batch boundary (the two-long state crossing batches)."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import gap_detect
    from time_series_storage_spark.streaming.stateful import (
        streaming_gap_detect,
    )

    base = dt.datetime(2024, 6, 1)
    offs = [0, 50, 120, 2000, 2050, 9000, 9020, 15000]  # gaps at 3 spots
    rows = [
        (i, "a", base + dt.timedelta(seconds=off))
        for i, off in enumerate(offs)
    ] + [
        (100 + i, "b", base + dt.timedelta(seconds=off * 3))
        for i, off in enumerate(offs)
    ]
    rows.sort(key=lambda r: r[2])
    src = str(tmp_path / "gv")
    df = spark.createDataFrame(rows, "id long, k string, ts timestamp")
    n = len(rows)
    # three time-ordered files: boundary falls inside a silence
    for bi, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                   (2 * n // 3, n)]):
        spark.createDataFrame(
            rows[lo:hi], "id long, k string, ts timestamp"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = sorted(
        (r["k"], int(r["gap_start"].timestamp()),
         int(r["gap_end"].timestamp()), r["gap_s"])
        for r in gap_detect(df, ["k"], 600, order_col="id").collect()
    )
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_gap_detect(stream, "k", 600)
        .writeStream.format("memory")
        .queryName("sgap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        (r["k"], r["gap_start_ep"], r["gap_end_ep"], r["gap_s"])
        for r in spark.sql("SELECT * FROM sgap").collect()
    )
    assert streamed == batch and len(batch) >= 4


def test_streaming_ewma_converges_to_batch(spark, tmp_path):
    """Time-ordered micro-batches on second-granularity data: the
    streamed truncated EWMA equals batch ewma_trunc bit-for-bit,
    including rows whose lag window straddles batch boundaries and
    the renormalized warm-up of each key's first rows."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import ewma_trunc
    from time_series_storage_spark.streaming.stateful import streaming_ewma

    base = dt.datetime(2024, 7, 1)
    rows = []
    rid = 0
    for i in range(60):
        k = "a" if i % 4 else "b"
        rows.append(
            (rid, k, base + dt.timedelta(seconds=i * 11), (i * 7) % 90 - 40)
        )
        rid += 1
    src = str(tmp_path / "ew")
    df = spark.createDataFrame(
        rows, "id long, k string, ts timestamp, q long"
    )
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(
            rows[lo:hi], "id long, k string, ts timestamp, q long"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        r["id"]: r["ewma_q"]
        for r in ewma_trunc(
            df, ["k"], q_col="q", n_lags=8, order_col="id"
        ).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_ewma(stream, "k", n_lags=8)
        .writeStream.format("memory")
        .queryName("sewma")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["id"]: r["ewma_q"] for r in spark.sql("SELECT * FROM sewma").collect()
    }
    assert streamed == batch and len(batch) == 60


def test_streaming_anomaly_converges_to_batch(spark, tmp_path):
    """Second-granularity in-order micro-batches: streamed z-score
    flags (incl. NULL under-baseline rows and baselines straddling
    batch boundaries) equal batch anomaly_zscore exactly. The data
    plants one obvious spike per key."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import anomaly_zscore
    from time_series_storage_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    base = dt.datetime(2024, 8, 1)
    rows, rid = [], 0
    for i in range(60):
        k = "a" if i % 2 else "b"
        q = 100 + (i % 7)  # quiet baseline
        if i in (40, 41):
            q = 4000  # planted spikes
        rows.append((rid, k, base + dt.timedelta(seconds=i * 13), q))
        rid += 1
    df = spark.createDataFrame(rows, "id long, k string, ts timestamp, q long")
    src = str(tmp_path / "an")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(
            rows[lo:hi], "id long, k string, ts timestamp, q long"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        r["id"]: (r["base_n"], r["base_sum"], r["is_anomaly"])
        for r in anomaly_zscore(
            df, ["k"], q_col="q", lookback=10, min_points=4,
            order_col="id",
        ).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_anomaly_zscore(stream, "k", lookback=10, min_points=4)
        .writeStream.format("memory")
        .queryName("sanom")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["id"]: (r["base_n"], r["base_sum"], r["is_anomaly"])
        for r in spark.sql("SELECT * FROM sanom").collect()
    }
    assert streamed == batch and len(batch) == 60
    flagged = [i for i, v in streamed.items() if v[2] == 1]
    assert 40 in flagged or 41 in flagged  # planted spikes caught


def test_streaming_pack_converges_to_batch(spark, tmp_path):
    """Id-ordered micro-batches: streamed bin assignments equal batch
    pack_assignments (n_shards=1) exactly — the one-long state carries
    the cumulative offset across batches, including a bin that
    straddles a batch boundary."""
    from time_series_storage_spark.operators.pack import pack_assignments
    from time_series_storage_spark.streaming.stateful import streaming_pack

    rows = [
        (i, "srcA" if i % 2 else "srcB", 7 + (i * 3) % 11)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    src = str(tmp_path / "pk")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, source string, n_tokens long"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        r["doc_id"]: (r["start_off"], r["bin_id"])
        for r in pack_assignments(
            df, 64, ("source",), n_shards=1
        ).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_pack(stream, 64)
        .writeStream.format("memory")
        .queryName("spack")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["start_off"], r["bin_id"])
        for r in spark.sql("SELECT * FROM spack").collect()
    }
    assert streamed == batch and len(batch) == 40


def test_streaming_transitions_converge_to_batch(spark, tmp_path):
    """The streamed (prev, curr) edge multiset over time-ordered
    micro-batches equals the batch lag pass — including edges whose
    endpoints straddle a batch boundary (the one-string state)."""
    import datetime as dt

    from pyspark.sql import Window

    from time_series_storage_spark.streaming.stateful import (
        streaming_transition_events,
    )

    base = dt.datetime(2024, 10, 1)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (i, f"u{i % 5}", types[(i * 7) % 4], base + dt.timedelta(seconds=i * 9))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, event_type string, ts timestamp"
    )
    w = Window.partitionBy("k").orderBy(
        F.unix_timestamp("ts"), F.col("event_id")
    )
    batch = sorted(
        (r["k"], r["p"], r["event_type"])
        for r in df.select(
            "k", "event_type", F.lag("event_type").over(w).alias("p")
        )
        .where(F.col("p").isNotNull())
        .collect()
    )
    src = str(tmp_path / "tr")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(
            rows[lo:hi],
            "event_id long, k string, event_type string, ts timestamp",
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_transition_events(stream, "k")
        .writeStream.format("memory")
        .queryName("strans")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        (r["k"], r["prev_type"], r["curr_type"])
        for r in spark.sql("SELECT * FROM strans").collect()
    )
    assert streamed == batch and len(batch) == 55


def test_streaming_gap_detect_late_arrival_cannot_fabricate_gap(spark, tmp_path):
    """A late event arriving BEHIND the cursor must not regress it:
    with an observation at t=10000 already absorbed, a late t=100
    followed by t=10300 must emit NO gap (true gap 300s < threshold) —
    the cursor-regression bug a naive last-row update has."""
    import datetime as dt

    from time_series_storage_spark.streaming.stateful import (
        streaming_gap_detect,
    )

    base = dt.datetime(2024, 11, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    batches = [
        [(0, "g", t(0)), (1, "g", t(10_000))],
        [(2, "g", t(100))],          # late: behind the cursor
        [(3, "g", t(10_300))],       # 300s after the real last event
    ]
    src = str(tmp_path / "lg")
    for bi, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "id long, k string, ts timestamp"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{src}/f0").schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        streaming_gap_detect(stream, "k", 600)
        .writeStream.format("memory")
        .queryName("lategap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    gaps = sorted(
        (r["gap_start_ep"], r["gap_end_ep"])
        for r in spark.sql("SELECT * FROM lategap").collect()
    )
    ep0 = int(t(0).replace(tzinfo=dt.timezone.utc).timestamp())
    # exactly ONE gap: the genuine 0 -> 10000 silence; nothing from the
    # late arrival or the 300s follow-up
    assert gaps == [(ep0, ep0 + 10_000)]


def test_streaming_rolling_kmv_converges_to_batch(spark, tmp_path):
    """Order-independent convergence: streamed rolling KMV estimates
    (latest emission per key x bucket) equal batch
    kmv_rolling_estimate over the union — across micro-batches and
    with one LATE but within-horizon row delivered out of order (the
    sketch merge algebra makes arrival order irrelevant)."""
    import datetime as dt

    from time_series_storage_spark.operators.sketch import (
        kmv_rolling_estimate,
    )
    from time_series_storage_spark.streaming.stateful import (
        streaming_rolling_kmv,
    )

    K, WB = 16, 3
    base = dt.datetime(2024, 12, 1)
    rows = []
    for day in range(6):
        for j in range(30):
            rows.append(
                ("g", base + dt.timedelta(days=day, seconds=j),
                 f"u{(day * 13 + j) % 70}")
            )
    schema = "k string, ts timestamp, e string"
    df = spark.createDataFrame(rows, schema)
    batch = {
        (r["k"], r["bucket_idx"]): (
            r["n_mins"], r["kth_min"], r["est_distinct"]
        )
        for r in kmv_rolling_estimate(
            df, ["k"], "e", "ts", 86_400, WB, K
        ).collect()
    }
    # batch 1: days 0-2 EXCEPT one held-back row; batch 2: days 3-4
    # plus the held-back (late, within-horizon) day-4 row; batch 3: day 5
    held = ("g", base + dt.timedelta(days=4, seconds=29), "u-late")
    rows_with_late = rows + [held]
    batch = {
        (r["k"], r["bucket_idx"]): (
            r["n_mins"], r["kth_min"], r["est_distinct"]
        )
        for r in kmv_rolling_estimate(
            spark.createDataFrame(rows_with_late, schema),
            ["k"], "e", "ts", 86_400, WB, K,
        ).collect()
    }
    b1 = [r for r in rows if r[1] < base + dt.timedelta(days=3)]
    b2 = [r for r in rows
          if base + dt.timedelta(days=3) <= r[1] < base + dt.timedelta(days=5)]
    b3 = [r for r in rows if r[1] >= base + dt.timedelta(days=5)] + [held]
    src = str(tmp_path / "rk")
    for bi, part in enumerate([b1, b2, b3]):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            f"{src}/f{bi}"
        )
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_rolling_kmv(stream, "k", "e", "ts", 86_400, WB, K)
        .writeStream.format("memory")
        .queryName("srkmv")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emission per (key, bucket): max n_mins then min kth wins
    # (absorbing more data only grows the sketch toward the union)
    final = {}
    for r in spark.sql("SELECT * FROM srkmv").collect():
        kb = (r["k"], r["bucket_idx"])
        cur = final.get(kb)
        if cur is None or (r["n_mins"], -r["kth_min"]) > (
            cur["n_mins"], -cur["kth_min"]
        ):
            final[kb] = r
    assert set(final) == set(batch)
    for kb, want in batch.items():
        got = final[kb]
        assert (
            got["n_mins"], got["kth_min"], got["est_distinct"]
        ) == want, kb


def test_streaming_null_id_rows_are_dropped_not_poison(spark, tmp_path):
    """A row with a NULL id (or NULL ts) must be dropped JVM-side, not
    surface as NaN in the pandas state function — int(NaN) would fail
    the micro-batch AND every checkpoint restart (a poison pill). The
    stream must complete and emit exactly the batch output over the
    non-null rows (ADVICE r5: streaming_gap_detect and friends
    filtered null value/ts but not null id)."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import gap_detect
    from time_series_storage_spark.streaming.stateful import (
        streaming_gap_detect,
    )

    base = dt.datetime(2024, 6, 1)
    good = [
        (i, "a", base + dt.timedelta(seconds=off))
        for i, off in enumerate([0, 30, 5000, 5040, 12000])
    ]
    dirty = good + [
        (None, "a", base + dt.timedelta(seconds=60)),  # null id
        (99, "a", None),  # null ts
        (None, "a", None),
    ]
    schema = "id long, k string, ts timestamp"
    src = str(tmp_path / "nv")
    spark.createDataFrame(dirty, schema).coalesce(1).write.parquet(
        f"{src}/f0"
    )
    batch = sorted(
        (r["k"], int(r["gap_start"].timestamp()),
         int(r["gap_end"].timestamp()), r["gap_s"])
        for r in gap_detect(
            spark.createDataFrame(good, schema), ["k"], 600, order_col="id"
        ).collect()
    )
    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema
    ).parquet(src + "/*")
    q = (
        streaming_gap_detect(stream, "k", 600)
        .writeStream.format("memory")
        .queryName("snull")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    streamed = sorted(
        (r["k"], r["gap_start_ep"], r["gap_end_ep"], r["gap_s"])
        for r in spark.sql("SELECT * FROM snull").collect()
    )
    assert streamed == batch and len(batch) == 2


def test_streaming_asof_hot_key_large_batch(spark, tmp_path):
    """One key delivering a large micro-batch — the skew case the
    vectorized state function exists for (the per-row loop paid O(n)
    np.append per right plus a linear scan per left: quadratic on a
    hot key). Must equal the batch asof_join exactly, including
    equal-ts left/right ties (right at the same instant IS eligible;
    max rid wins among equal-ts rights)."""
    from time_series_storage_spark.operators.asof import asof_join
    from time_series_storage_spark.streaming.stateful import (
        streaming_asof_join,
    )

    n = 20_000
    base = F.lit(TS)
    # rights at even seconds (rid = i); every 500th second gets a
    # SECOND right (rid = i + n) to exercise the max-rid tie rule
    r1 = spark.range(n).select(
        F.col("id").alias("rid"),
        F.lit("hot").alias("k"),
        (base + F.make_interval(secs=F.col("id") * 2)).alias("ts"),
    )
    r2 = spark.range(0, n, 500).select(
        (F.col("id") + n).alias("rid"),
        F.lit("hot").alias("k"),
        (base + F.make_interval(secs=F.col("id") * 2)).alias("ts"),
    )
    rdf = r1.unionByName(r2)
    # lefts: even i lands ON a right's ts (tie), odd i between rights
    ldf = spark.range(n).select(
        (F.col("id") + 1_000_000).alias("lid"),
        F.lit("hot").alias("k"),
        (base + F.make_interval(
            secs=F.col("id") * 2 + F.col("id") % 2
        )).alias("ts"),
    )
    lsrc, rsrc = str(tmp_path / "hl"), str(tmp_path / "hr")
    ldf.coalesce(1).write.parquet(lsrc + "/f1")
    rdf.coalesce(1).write.parquet(rsrc + "/f1")
    want = {
        r["lid"]: (r["asof_rid"], r["asof_ts"])
        for r in asof_join(
            ldf, rdf, on=["k"], right_payload=["rid"], right_order="rid",
            direction="backward",
        ).collect()
    }
    q = (
        streaming_asof_join(
            spark.readStream.schema(ldf.schema).parquet(lsrc + "/*"),
            spark.readStream.schema(rdf.schema).parquet(rsrc + "/*"),
            on="k", left_id="lid", right_id="rid",
            lookback_seconds=2 * n * 2,
        )
        .writeStream.format("memory")
        .queryName("hotasof")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    got = {
        r["lid"]: (r["asof_rid"], r["asof_ts_us"])
        for r in spark.sql("SELECT * FROM hotasof").collect()
    }
    assert len(got) == n and set(got) == set(want)
    for lid, (w_rid, w_ts) in want.items():
        g_rid, g_ts_us = got[lid]
        assert g_rid == w_rid, (lid, g_rid, w_rid)
        w_us = int(w_ts.timestamp() * 1_000_000) if w_ts else None
        assert g_ts_us == w_us, (lid, g_ts_us, w_us)


def test_streaming_cusum_converges_to_batch(spark, tmp_path):
    """Time-ordered micro-batches: the streamed CUSUM statistic equals
    the batch operator bit-for-bit, including runs where the carry
    crosses batch boundaries mid-drift and keys pinned at zero by
    long below-target stretches."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import cusum
    from time_series_storage_spark.streaming.stateful import streaming_cusum

    base = dt.datetime(2024, 7, 1)
    target = 10
    rows = []
    for i in range(90):
        k = "a" if i % 3 else "b"
        # values that drift above and below the target so the carry
        # both accumulates and resets across the three batches
        rows.append((i, k, base + dt.timedelta(seconds=i * 7), (i * 13) % 29))
    df = spark.createDataFrame(rows, "id long, k string, ts timestamp, q long")
    src = str(tmp_path / "cu")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(
            rows[lo:hi], "id long, k string, ts timestamp, q long"
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        r["id"]: r["cusum"]
        for r in cusum(
            df.withColumn("t", F.lit(target)), ["k"], "id", "q", "t"
        ).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_cusum(stream, "k", target)
        .writeStream.format("memory")
        .queryName("scusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["id"]: r["cusum"]
        for r in spark.sql("SELECT * FROM scusum").collect()
    }
    assert streamed == batch and len(batch) == 90


def test_streaming_cusum_hot_key_large_batch(spark, tmp_path):
    """One key delivering a 40k-row micro-batch: the vectorized
    cumsum/minimum-accumulate state fn must match the batch operator
    exactly (no per-row Python loop to time out on the skew case)."""
    import datetime as dt

    from time_series_storage_spark.operators.analytics import cusum
    from time_series_storage_spark.streaming.stateful import streaming_cusum

    base = dt.datetime(2024, 7, 1)
    n = 40_000
    target = 50
    src = str(tmp_path / "hotcu")
    ev = spark.range(n).select(
        F.col("id"),
        F.lit("hot").alias("k"),
        (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("ts"),
        ((F.col("id") * 31) % 101).cast("long").alias("q"),
    )
    ev.coalesce(1).write.parquet(src + "/f0")
    batch = {
        r["id"]: r["cusum"]
        for r in cusum(
            ev.withColumn("t", F.lit(target)), ["k"], "id", "q", "t"
        ).collect()
    }
    stream = spark.readStream.schema(
        spark.read.parquet(src + "/f0").schema
    ).parquet(src + "/*")
    q = (
        streaming_cusum(stream, "k", target)
        .writeStream.format("memory")
        .queryName("hotcusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["id"]: r["cusum"]
        for r in spark.sql("SELECT * FROM hotcusum").collect()
    }
    assert streamed == batch and len(streamed) == n


def test_streaming_rolling_corr_converges_to_batch(spark, tmp_path):
    """Bucket-level (x, y) observations streamed in time order: the
    emitted Pearson components equal the batch trailing-window
    computation bit-for-bit, windows straddling micro-batch boundaries
    included, and warm-up rows (incomplete windows) never emit."""
    import datetime as dt

    from pyspark.sql import Window
    from time_series_storage_spark.streaming.stateful import (
        streaming_rolling_corr,
    )

    base = dt.datetime(2024, 7, 1)
    W = 6
    rows = [
        (h, "s", base + dt.timedelta(hours=h),
         (h * 7) % 23, (h * 5 + 3) % 19)
        for h in range(40)
    ]
    schema = "id long, k string, ts timestamp, x long, y long"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "rc")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1).write.parquet(
            f"{src}/f{bi}"
        )
    # batch model: the ts_rolling_corr frame over the bucket series
    w = Window.partitionBy("k").orderBy("id").rowsBetween(-(W - 1), 0)
    framed = df.select(
        "id",
        F.count(F.lit(1)).over(w).alias("n_w"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("sy2"),
    ).where(F.col("n_w") == W)
    batch = {
        r["id"]: (
            W * r["sxy"] - r["sx"] * r["sy"],
            W * r["sx2"] - r["sx"] * r["sx"],
            W * r["sy2"] - r["sy"] * r["sy"],
        )
        for r in framed.collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_rolling_corr(stream, "k", window=W)
        .writeStream.format("memory")
        .queryName("src_corr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["id"]: (r["corr_num"], r["sxx"], r["syy"])
        for r in spark.sql("SELECT * FROM src_corr").collect()
    }
    assert streamed == batch and len(batch) == 40 - (W - 1)


def test_streaming_debounce_converges_to_batch(spark, tmp_path):
    """Closed bursts streamed across three micro-batches equal the
    batch debounce minus each key's final (still-open) burst — with
    bursts deliberately straddling batch boundaries so the carried
    open-burst state both absorbs continuations and closes on the
    next head."""
    import datetime as dt

    from pyspark.sql import Window
    from time_series_storage_spark.streaming.stateful import (
        streaming_debounce,
    )

    base = dt.datetime(2024, 7, 1)
    thr = 10
    offs = {
        # key a: bursts [0,3,7], [30,32], [60] — [60] stays open
        "a": [0, 3, 7, 30, 32, 60],
        # key b: burst straddles the batch cut: [0,5,9,14], then [50]
        "b": [0, 5, 9, 14, 50],
    }
    rows, rid = [], 0
    for k, ts_list in offs.items():
        for o in ts_list:
            rows.append((rid, k, base + dt.timedelta(seconds=o)))
            rid += 1
    rows.sort(key=lambda r: (r[2], r[0]))  # interleave keys in time order
    schema = "id long, k string, ts timestamp"
    src = str(tmp_path / "db")
    n = len(rows)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1).write.parquet(
            f"{src}/f{bi}"
        )
    # batch model: head rows + burst sizes (the events_debounce shape)
    df = spark.createDataFrame(rows, schema)
    ep = F.unix_timestamp("ts")
    w = Window.partitionBy("k").orderBy(ep, F.col("id"))
    gap = ep - F.lag(ep).over(w)
    marked = df.select(
        "*",
        F.when(gap.isNull() | (gap > thr), 1).otherwise(0).alias("_h"),
    ).select(
        "*",
        F.sum("_h").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_b"),
    )
    wb = Window.partitionBy("k", "_b")
    batch = {}
    for r in (
        marked.select("*", F.count(F.lit(1)).over(wb).alias("n"))
        .where(F.col("_h") == 1)
        .collect()
    ):
        batch.setdefault(r["k"], []).append((r["_b"], r["id"], r["n"]))
    want = []
    for k, bursts in batch.items():
        bursts.sort()
        want.extend((k, i, n) for _, i, n in bursts[:-1])  # last stays open
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_debounce(stream, "k", thr)
        .writeStream.format("memory")
        .queryName("sdeb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = sorted(
        (r["k"], r["id"], r["n_collapsed"])
        for r in spark.sql("SELECT * FROM sdeb").collect()
    )
    assert got == sorted(want) and len(got) == 3  # a:2 closed + b:1 closed


def test_streaming_debounce_random_splits_match_model(spark, tmp_path):
    """Randomized pin beyond the fixed convergence case: for a grid of
    event layouts and batch-cut points, the streamed closed bursts
    must equal the sequential model's bursts minus each key's final
    open one — burst boundaries and batch boundaries interact in every
    combination (head-at-cut, continuation-at-cut, whole-burst-in-one-
    batch, burst-spanning-three-batches)."""
    import datetime as dt

    from time_series_storage_spark.streaming.stateful import (
        streaming_debounce,
    )

    base = dt.datetime(2024, 7, 1)
    thr = 10
    layouts = [
        [0, 1, 2, 3, 4, 5],                      # one burst, never closes
        [0, 20, 40, 60, 80, 100],                # every event its own burst
        [0, 5, 30, 35, 38, 70],                  # 3 bursts, varied sizes
        [0, 11, 21, 32, 42, 53],                 # alternating just-over gaps
    ]
    for li, offs in enumerate(layouts):
        for cut in [1, 3, 5]:
            rows = [
                (i, "k", base + dt.timedelta(seconds=o))
                for i, o in enumerate(offs)
            ]
            schema = "id long, k string, ts timestamp"
            src = str(tmp_path / f"d{li}c{cut}")
            spark.createDataFrame(rows[:cut], schema).coalesce(1)\
                .write.parquet(f"{src}/f0")
            spark.createDataFrame(rows[cut:], schema).coalesce(1)\
                .write.parquet(f"{src}/f1")
            # sequential model
            bursts, cur = [], None
            prev = None
            for i, o in enumerate(offs):
                if prev is None or o - prev > thr:
                    if cur is not None:
                        bursts.append(cur)
                    cur = [i, 1]
                else:
                    cur[1] += 1
                prev = o
            want = sorted((h, n) for h, n in bursts)  # final stays open
            stream = spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(src + "/*")
            q = (
                streaming_debounce(stream, "k", thr)
                .writeStream.format("memory")
                .queryName(f"pd{li}c{cut}")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / f"ck{li}c{cut}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert q.exception() is None
            got = sorted(
                (r["id"], r["n_collapsed"])
                for r in spark.sql(f"SELECT * FROM pd{li}c{cut}").collect()
            )
            assert got == want, (li, cut, got, want)


def test_streaming_retention_pairs_converge_to_batch(spark, tmp_path):
    """The streamed (user, cohort_week, week_offset) feed, aggregated
    with a plain count, equals the batch retention matrix on the real
    events table streamed in time order — repeat activity within a
    week emits nothing (exactly-once per pair), cross-batch state
    holds each user's cohort fixed."""
    from time_series_storage_spark.queries_extensions import (
        q_retention_cohorts,
    )
    from time_series_storage_spark.streaming.stateful import (
        streaming_retention_pairs,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("user_id", "ts")
    src = str(tmp_path / "ret")
    # three time-ordered chunks so cohorts and offsets straddle batches
    ordered = ev.orderBy("ts").collect()
    n = len(ordered)
    for bi, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(ordered[lo:hi], ev.schema).coalesce(1)\
            .write.parquet(f"{src}/f{bi}")
    batch = {
        (r["cohort_week"], r["week_offset"]): r["active_users"]
        for r in q_retention_cohorts(spark, sf).collect()
    }
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_retention_pairs(stream)
        .writeStream.format("memory")
        .queryName("sret")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    agg = {}
    rows = spark.sql("SELECT * FROM sret").collect()
    for r in rows:
        k = (r["cohort_week"], r["week_offset"])
        agg[k] = agg.get(k, 0) + 1
    assert agg == batch and len(rows) == sum(batch.values())


def test_streaming_holt_converges_to_batch(spark, tmp_path):
    """In-order micro-batches: the streamed Holt level/trend equals
    batch holt_linear bit-for-bit across batch boundaries — the state
    is just the two fixed-point registers, so the recursion continues
    seamlessly where the previous batch stopped, including negative
    trends (sign-adjusted truncation)."""
    from time_series_storage_spark.operators.analytics import holt_linear
    from time_series_storage_spark.streaming.stateful import streaming_holt

    rows = []
    for k, xs in (
        ("a", [5, 100, 3, 88, 1, 77, 2, 60, 9]),
        ("b", [90, 70, 50, 30, 10, 0, 4, 4, 4]),
    ):
        rows.extend((k, i * 3600, x * 1_000_000) for i, x in enumerate(xs))
    df = spark.createDataFrame(rows, "k string, ep long, x long")
    src = str(tmp_path / "holt")
    n = 9
    for bi, (lo, hi) in enumerate([(0, 3), (3, 6), (6, n)]):
        spark.createDataFrame(
            [r for r in rows if lo <= r[1] // 3600 < hi],
            "k string, ep long, x long",
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        (r.k, r.ep): (r.level_x1e6, r.trend_x1e6)
        for r in holt_linear(df, ["k"], "ep", "x").collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_holt(stream, "k")
        .writeStream.format("memory")
        .queryName("sholt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r.k, r.ep): (r.level_x1e6, r.trend_x1e6)
        for r in spark.sql("select * from sholt").collect()
    }
    assert got == batch and len(got) == 18


def test_streaming_holt_winters_converges_to_batch(spark, tmp_path):
    """In-order micro-batches: streamed Holt-Winters equals batch
    holt_winters bit-for-bit across batch boundaries — including the
    WARMUP split over multiple batches (the first-season buffer lives
    in the ring slot of the state until the m-th observation flips it
    to the (l, b, ring) registers) and negative seasonal entries."""
    from time_series_storage_spark.operators.analytics import holt_winters
    from time_series_storage_spark.streaming.stateful import (
        streaming_holt_winters,
    )

    m = 4
    rows = []
    for k, xs in (
        ("a", [5, 100, 3, 88, 1, 77, 2, 60, 9, 55, 4, 70]),
        ("b", [90, 70, 50, 30, 10, 0, 4, 4, 4, 8, 2, 6]),
    ):
        rows.extend((k, i * 3600, x * 1_000_000) for i, x in enumerate(xs))
    df = spark.createDataFrame(rows, "k string, ep long, x long")
    src = str(tmp_path / "hw")
    # batch boundaries at 3 and 7: warmup (m=4) straddles the first
    for bi, (lo, hi) in enumerate([(0, 3), (3, 7), (7, 12)]):
        spark.createDataFrame(
            [r for r in rows if lo <= r[1] // 3600 < hi],
            "k string, ep long, x long",
        ).coalesce(1).write.parquet(f"{src}/f{bi}")
    batch = {
        (r.k, r.ep): (r.level_x1e6, r.trend_x1e6, r.seasonal_x1e6)
        for r in holt_winters(df, ["k"], "ep", "x", season=m).collect()
    }
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_holt_winters(stream, "k", season=m)
        .writeStream.format("memory")
        .queryName("shw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckhw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r.k, r.ep): (r.level_x1e6, r.trend_x1e6, r.seasonal_x1e6)
        for r in spark.sql("select * from shw").collect()
    }
    assert got == batch and len(got) == 2 * (12 - m)
    assert any(v[2] < 0 for v in got.values())
