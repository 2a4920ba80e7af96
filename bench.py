"""Benchmark harness: runs the headline queries and prints ONE JSON line.

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "control": sec, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Each query is forced with the noop sink (full execution, no driver
collect). One untimed warm-up pass runs first — first executions pay
one-time JVM/codegen/broadcast warm-up costs that are not a property of
the query plan; the timed pass measures steady-state latency.

``control`` is a PINNED probe (fixed scan-aggregate over the events
table, defined here and never changed across rounds): it normalizes
cross-round comparisons against machine drift. If round N's queries
inflate but control inflates identically, the machine moved, not the
plans; control is excluded from the total.

Round 7 adds ``controls`` — three pinned probes of DIFFERENT shapes
(scan-aggregate, wide shuffle, broadcast join + shuffle), each sized
well past the fixed per-query overhead the old sub-200ms control was
dominated by (its drift read as a phantom 15-30% regression in r6).
Cross-round normalization should use the MEDIAN of the three per-probe
ratios; the old ``control`` stays for continuity.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # shuffle/spill scratch on tmpfs: the backing disk here has periodic
    # multi-second write stalls that dwarf the queries themselves
    scratch = "/dev/shm/spark-local"
    os.makedirs(scratch, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", scratch)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tss-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        # keep stdout machine-parseable: the one JSON line, no
        # progress-bar control characters
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    def bench_control(spark_, sf_dir_):
        # PINNED — do not change across rounds (it is the cross-round
        # drift normalizer): hour x type counts over the events table,
        # one scan + one partial-aggregated shuffle
        from pyspark.sql import functions as F

        ev = spark_.read.parquet(os.path.join(sf_dir_, "events.parquet"))
        return ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.col("event_type"),
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))

    def bench_control_scan(spark_, sf_dir_):
        # PINNED r7+ — scan-bound shape: one pass over events computing
        # enough per-row work (distinct sketch, string length, minute
        # truncation) that scan + eval dominates, with a near-trivial
        # final aggregation.
        from pyspark.sql import functions as F

        # 4 pinned passes unioned: sizes the probe well past fixed
        # per-job overhead without changing its scan-bound shape
        ev = spark_.read.parquet(os.path.join(sf_dir_, "events.parquet"))
        copies = ev
        for _ in range(3):
            copies = copies.unionAll(ev)
        return copies.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
            F.approx_count_distinct("user_id").alias("users"),
            F.approx_count_distinct(
                F.date_trunc("minute", F.col("ts"))
            ).alias("minutes"),
            F.avg(F.length("event_type")).alias("avg_len"),
            # per-row sha2 makes the probe compute-bound on the scan,
            # not on fixed job overhead
            F.approx_count_distinct(
                F.sha2(
                    F.concat_ws(
                        "|", "user_id", "event_type", F.col("ts").cast("string")
                    ),
                    256,
                )
            ).alias("row_sketch"),
        )

    def bench_control_shuffle(spark_, sf_dir_):
        # PINNED r7+ — wide two-exchange shuffle shape: per-user event
        # stats, then a second aggregation over the per-user rows.
        # High-cardinality keys make this shuffle-bound, not
        # overhead-bound.
        from pyspark.sql import functions as F

        ev = spark_.read.parquet(os.path.join(sf_dir_, "events.parquet"))
        # 4 pinned passes: shuffle volume well past fixed overhead
        for _ in range(3):
            ev = ev.unionAll(
                spark_.read.parquet(os.path.join(sf_dir_, "events.parquet"))
            )
        per_user = ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        return per_user.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("users"),
            F.avg("n").alias("avg_n"),
            F.max("v").alias("max_v"),
        )

    def bench_control_join(spark_, sf_dir_):
        # PINNED r7+ — broadcast-join + shuffle shape: lineitem joined
        # to part (broadcast) and orders (shuffle), aggregated by
        # (p_type, o_orderpriority).
        from pyspark.sql import functions as F

        li = spark_.read.parquet(os.path.join(sf_dir_, "lineitem.parquet"))
        # 2 pinned passes over the fact side
        li = li.unionAll(
            spark_.read.parquet(os.path.join(sf_dir_, "lineitem.parquet"))
        )
        part = spark_.read.parquet(os.path.join(sf_dir_, "part.parquet"))
        orders = spark_.read.parquet(os.path.join(sf_dir_, "orders.parquet"))
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("p_type", "o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "rev"
                ),
            )
        )

    qs = dict(entrymod.queries())
    qs["__control__"] = bench_control
    qs["__control_scan__"] = bench_control_scan
    qs["__control_shuffle__"] = bench_control_shuffle
    qs["__control_join__"] = bench_control_join
    # queries that run DRIVER-SIDE loops (iterative connected
    # components, k-means, chained multi-job pipelines) execute many
    # Spark jobs per timed run, so a single hypervisor pause lands in
    # every sample's critical path instead of one job's — best-of-3
    # can't rescue them (r5 branded dedup_clusters_star 1.4x slower on
    # pure VM noise; re-measured best-of-7 it was FASTER than r4 after
    # control normalization). These take five base samples.
    multi_job = {
        "dedup_clusters", "dedup_clusters_star", "entity_resolution_parts",
        "sim_topk_ivf_kmeans", "dedup_source_overlap", "pipeline_e2e",
        "dedup_near_incremental", "ppjoin_incremental",  # iterative CC driver loop inside
        # the normalizers themselves must be noise-robust
        "__control__", "__control_scan__", "__control_shuffle__",
        "__control_join__",
    }
    # one query at a time, fully isolated: build, untimed warm-up
    # (pays codegen + populates the query's own persisted frames),
    # best-of-2 timed, then drop every cached block before the next
    # query — 27 queries' persists living simultaneously evict each
    # other mid-timing and turn 2s queries into 40s phantoms
    times: dict[str, float] = {}
    for name, fn in qs.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        def timed() -> float:
            # construction is inside the clock: queries with eager
            # driver-side stages (iterative connected components) do
            # their real work there, and lazy queries only pay
            # planning milliseconds
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        # best-of-2 (multi-job: 4) + the stall-resample guard below:
        # at ~200 registry queries the third sample bought noise
        # robustness the resampling already provides, at ~25% of the
        # harness's total wall budget
        runs = [timed() for _ in range(4 if name in multi_job else 2)]
        # the sandbox VM pauses wholesale for tens of seconds at random;
        # when even the best so far looks stalled, take extra samples
        # so one hypervisor pause can't brand a 2s query as slow
        while min(runs) > 5.0 and len(runs) < 8:
            runs.append(timed())
        times[name] = min(runs)
        # per-query progress on stderr (stdout stays the JSON
        # contract): a wall-clock stall is diagnosable from the log
        # instead of an empty output after a harness timeout
        print(
            f"[bench] {name}: best={min(runs)}s runs={runs}",
            file=sys.stderr,
            flush=True,
        )
        spark.catalog.clearCache()
    control = times.pop("__control__")
    controls = {
        shape: times.pop(f"__control_{shape}__")
        for shape in ("scan", "shuffle", "join")
    }
    # Headline hygiene (r10 verdict): the headline `value` is the sum
    # of best-of timings over the DRIVER-GATED WINDOW (the first 50
    # registry entries — the same set the compact line's `queries`
    # dict shows), so headline ~= sum(queries) is checkable from the
    # artifact itself. The whole-registry sum (~228 queries, most of
    # which never fit the capture window) rides along as its own
    # field; neither number ever contained warmup or cache-clear
    # overhead — every entry is a best-of-N steady-state timing.
    gate_names = [n for n in qs if not n.startswith("__")][:50]
    total = round(sum(times[n] for n in gate_names if n in times), 3)
    base = {
        # r11 ADVICE: the headline changed meaning in r11 (whole-
        # registry sum -> gated-window sum) without a rename; make the
        # metric name say what it measures and version the artifact so
        # cross-round consumers can't conflate the two definitions.
        # BENCH_r01..r10 `value` = whole-registry sum (schema v1,
        # implicit); BENCH_r11 `value` = gated-window sum under the old
        # name; r12+ = gated-window sum under this name, schema 2.
        "metric": "gated_window_seconds",
        "value": total,
        "unit": "sec",
        "bench_schema": 2,
        "registry_total_seconds": round(sum(times.values()), 3),
        "n_queries": len(times),
        "control": control,
        "controls": controls,
        "sf": sf,
    }
    # Full per-query dict first (the full registry overflows the
    # driver's 2000-char stdout tail capture — this line is for local
    # logs)...
    print(json.dumps({**base, "queries": times, "full": True}))
    # ...then a compact LAST line guaranteed to fit the capture window:
    # the driver-gated window (first 50 registry entries) plus the
    # top-15 slowest overall, trimmed if the line would overflow.
    candidates = [
        {
            **{n: times[n] for n in gate_names if n in times},
            **{
                n: t
                for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]
            },
        },
        {n: times[n] for n in gate_names if n in times},
        dict(sorted(times.items(), key=lambda kv: -kv[1])[:15]),
    ]
    for q in candidates:
        line = json.dumps({**base, "queries": q})
        if len(line) <= 1800:
            break
    print(line)


if __name__ == "__main__":
    main()
