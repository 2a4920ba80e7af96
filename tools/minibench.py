"""Targeted re-measurement of a few registry queries with bench.py's
exact methodology (noop sink, untimed warm-up, best-of-N, cache clear
between queries) — the optimization round's iteration loop.

Usage: python tools/minibench.py query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
       MB_RUNS            (default 3 timed runs; best is reported)
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
    n_runs = int(os.environ.get("MB_RUNS", "3"))
    scratch = "/dev/shm/spark-local"
    os.makedirs(scratch, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", scratch)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tss-minibench")
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
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        print(f"[minibench] {name}: best={min(runs)}s runs={runs}",
              file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
