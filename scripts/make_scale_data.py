"""Synthetic N x scale-up of a testdata directory — the data for the
heavy-tail scale probe (sf0.1 -> ~sf1), since the driver ships no
sf >= 1 parquet.

Each replica i is a SELF-CONTAINED universe: every join key (order,
customer, part, supplier, doc, vec, user, event ids) is offset by
i * 10^7, so referential joins scale linearly and never cross
replicas. Text-bearing columns (document text, part names) are passed
through a per-replica Caesar rotation of the lowercase alphabet — a
bijection applied uniformly within the replica, so INTRA-replica
near-duplicate/fuzzy structure is preserved exactly while
CROSS-replica shingle/name overlap is destroyed (naive duplication
would give every document 9 verbatim copies and grow the near-dup
pair graph quadratically in N — a replication artifact, not a data
property). Embedding vectors get deterministic per-replica
multiplicative jitter so ANN top-k keeps distinct neighbors instead
of 10-way ties. Dimension tables (nation, region) stay single-copy,
as they would at any scale.

Usage: python scripts/make_scale_data.py [IN_DIR] [OUT_DIR] [N]
Defaults: /root/testdata/sf0.1 /tmp/scale_sf1 10
"""

from __future__ import annotations

import os
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OFF = 10_000_000  # per-replica id offset: far above any base key

LOWER = string.ascii_lowercase


def main() -> None:
    in_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tss-make-scale-data")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def caesar(col, i):
        rot = LOWER[i % 26 :] + LOWER[: i % 26]
        return F.translate(col, LOWER, rot)

    def jitter(col, i):
        # deterministic per-(replica, position) multiplicative noise in
        # [-6%, +6%]: breaks cross-replica ties, keeps magnitudes sane
        return F.transform(
            col,
            lambda x, p: x
            * (1.0 + ((F.lit(i * 31) + p * 7) % 13 - 6) / 100.0),
        )

    def replicate(table, mutate):
        src = spark.read.parquet(os.path.join(in_dir, f"{table}.parquet"))
        parts = [mutate(src, i) for i in range(n)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dst = os.path.join(out_dir, f"{table}.parquet")
        out.write.mode("overwrite").parquet(dst)
        print(f"{table}: x{n}", file=sys.stderr)

    def shift(df, i, *cols):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.lit(i * OFF))
        return df

    replicate(
        "documents",
        lambda d, i: shift(d, i, "doc_id").withColumn(
            "text", caesar(F.col("text"), i)
        ),
    )
    replicate(
        "embeddings",
        lambda d, i: shift(d, i, "vec_id").withColumn(
            "embedding", jitter(F.col("embedding"), i)
        ),
    )
    replicate("events", lambda d, i: shift(d, i, "event_id", "user_id"))
    replicate("orders", lambda d, i: shift(d, i, "o_orderkey", "o_custkey"))
    replicate(
        "lineitem",
        lambda d, i: shift(d, i, "l_orderkey", "l_partkey", "l_suppkey"),
    )
    replicate("customer", lambda d, i: shift(d, i, "c_custkey"))
    replicate("supplier", lambda d, i: shift(d, i, "s_suppkey"))
    replicate(
        "part",
        lambda d, i: shift(d, i, "p_partkey").withColumn(
            "p_name", caesar(F.col("p_name"), i)
        ),
    )
    for dim in ("nation", "region"):
        spark.read.parquet(os.path.join(in_dir, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{dim}.parquet"))
        print(f"{dim}: copied", file=sys.stderr)


if __name__ == "__main__":
    main()
