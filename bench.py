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

    qs = dict(entrymod.queries())
    qs["__control__"] = bench_control
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
        "__control__",  # the normalizer itself must be noise-robust
    }
    # one query at a time, fully isolated: build, untimed warm-up
    # (pays codegen + populates the query's own persisted frames),
    # best-of-3 timed, then drop every cached block before the next
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

        runs = [timed() for _ in range(5 if name in multi_job else 3)]
        # the sandbox VM pauses wholesale for tens of seconds at random;
        # when even the best so far looks stalled, take extra samples
        # so one hypervisor pause can't brand a 2s query as slow
        while min(runs) > 5.0 and len(runs) < 8:
            runs.append(timed())
        times[name] = min(runs)
        spark.catalog.clearCache()
    control = times.pop("__control__")
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "control": control,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
