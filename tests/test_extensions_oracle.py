"""Driver-style oracle check for the FULL query registry (core engine
queries + extensions): run each Spark query and its DuckDB oracle at
sf0.001 and compare exact rows (columns sorted by name, rows sorted —
the driver's order-insensitive value-hash contract)."""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(tuple(row[i] for i in order) for row in cur.fetchall())


def _registry():
    from time_series_storage_spark.queries_extensions import EXT_QUERIES
    from time_series_storage_spark.queries_testdata import CORE_QUERIES

    return {**CORE_QUERIES, **EXT_QUERIES}


@pytest.mark.parametrize("name", sorted(_registry()))
def test_extension_matches_oracle(spark, duck, name):
    fn, sql = _registry()[name]
    df = fn(spark, SF_DIR)
    got = _spark_rows(df)
    if sql is None:  # rows-only contract (driver's weaker check)
        assert len(got) > 0
        return
    want = _duck_rows(duck, sql)
    assert len(got) == len(want), f"{name}: {len(got)} vs oracle {len(want)}"
    assert got == want, f"{name}: value mismatch (first={got[:3]} vs {want[:3]})"
