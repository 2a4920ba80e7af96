"""Connected-components round-count probe: measures how many rounds
each CC variant actually executes on the near-dup pair graph as the
corpus scales — the check that the iterative tail grows like the
theory says (min-label: graph diameter; large/small-star: O(log n))
rather than proportionally with data.

Usage: python scripts/cc_rounds_probe.py DIR [DIR ...]
Appends a section to SCALE_PROBE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    scratch = "/dev/shm/spark-local"
    os.makedirs(scratch, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", scratch)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tss-cc-rounds")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from time_series_storage_spark.operators import dedup as D
    from time_series_storage_spark.queries_extensions import (
        MINHASH_THRESHOLD,
    )

    results = []
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n_docs = docs.count()
        pairs = D.minhash_lsh_pairs(
            docs, "doc_id", "text", k=8, threshold_x1000=MINHASH_THRESHOLD
        ).persist()
        n_pairs = pairs.count()
        row = {"dir": d, "docs": n_docs, "pairs": n_pairs}
        for name, fn in (
            ("minlabel", D.connected_components),
            ("star", D.connected_components_star),
        ):
            rounds: list = []
            t0 = time.time()
            cc = fn(
                pairs.select("d1", "d2"),
                docs.select("doc_id"),
                "doc_id",
                round_counter=rounds,
            )
            n_clusters = cc.select("cluster").distinct().count()
            row[f"{name}_rounds"] = len(rounds)
            row[f"{name}_sec"] = round(time.time() - t0, 2)
            row["clusters"] = n_clusters
        pairs.unpersist()
        results.append(row)
        print(json.dumps(row), flush=True)

    lines = [
        "",
        "## CC round-count probe (scripts/cc_rounds_probe.py)",
        "",
        "| dir | docs | pairs | clusters | min-label rounds (s) |"
        " star rounds (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['dir']} | {r['docs']} | {r['pairs']} | {r['clusters']} |"
            f" {r['minlabel_rounds']} ({r['minlabel_sec']}) |"
            f" {r['star_rounds']} ({r['star_sec']}) |"
        )
    lines.append("")
    with open(os.path.join(REPO, "SCALE_PROBE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "cc_rounds", "rows": results}))


if __name__ == "__main__":
    main()
