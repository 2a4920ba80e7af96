"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query at the given SF and compares against
its DuckDB oracle: row count, column names/types (loosely), and
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark query raised: {e}")
            continue
        dt_spark = time.time() - t0
        if name not in osql:
            print(f"ok?  {name}: rows-only check, {len(got)} rows ({dt_spark:.1f}s)")
            if len(got) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows")
            continue
        try:
            exp = con.execute(osql[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle raised: {e}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            continue
        g, e = norm(got), norm(exp)
        # compare with dtype tolerance: cast both to object strings
        eq = g.astype(str).equals(e.astype(str))
        if not eq:
            failures.append(name)
            diff = (g.astype(str) != e.astype(str)).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([g[diff].head(3), e[diff].head(3)]))
            continue
        print(f"PASS {name}: {len(got)} rows ({dt_spark:.1f}s)")
    print("=" * 40)
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
