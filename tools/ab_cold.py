"""Cold-cache / warm-JVM timing of registry queries — the r13
optimization round's A/B discipline for changes involving in-query
``persist()``.

bench.py's best-of-N shares the warm-up run's cache within one query,
so for a query that persists an intermediate the steady-state timings
measure cache reads, not the per-run compute. This tool answers the
honest question instead: with JIT/codegen warm but the cache COLD
(cleared before every timed run), what does one run cost?

Usage: python tools/ab_cold.py query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       AB_RUNS            (default 4 timed runs; best is reported)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("AB_RUNS", "4"))
    scratch = "/dev/shm/spark-local"
    os.makedirs(scratch, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", scratch)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tss-ab-cold")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        for _ in range(3):  # JVM/codegen/broadcast warm-up
            run()
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()  # cold cache, warm JVM
            t0 = time.time()
            run()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        print(
            f"[ab_cold] {name}: best={min(runs)}s runs={runs}",
            file=sys.stderr,
            flush=True,
        )
        spark.catalog.clearCache()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
