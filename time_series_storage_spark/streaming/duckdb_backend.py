"""DuckDB-backed RollupMergeBackend — the seam proven against a SECOND
real transactional engine.

The :class:`~.ingest.RollupMergeBackend` contract was designed so a
lakehouse ``MERGE INTO`` (Delta / Iceberg) drops in without touching
the sink; ``delta-spark`` cannot be installed in this environment
(package installation is unavailable — see ingest.py's environment
note), so this backend closes the seam with DuckDB's native ACID
upsert instead: per (batch x grouping),

* the delta is applied with ``INSERT ... ON CONFLICT (keys) DO UPDATE
  SET counter = counter + excluded.counter`` — keyed by (grouping
  dims, ts[, bucket_lo]), exactly the key a Delta ``MERGE INTO`` would
  use (measures are partial aggregates, so merge = add), and
* the merged-batch watermark row is written IN THE SAME DuckDB
  transaction — commit-of-data and commit-of-provenance are one
  ``COMMIT``, the contract's atomicity clause. A crash anywhere before
  the commit leaves the previous state visible and complete (DuckDB
  WAL), and ``last_merged_batch`` still returns the old watermark, so
  the replayed batch re-merges.

Scale boundary (deliberate, documented): the delta crosses the driver
via ``toPandas()``. A micro-batch's rollup delta is already aggregated
to slice grain — the same bounded payload every foreachBatch JDBC/OLTP
sink ships — so this is the single-node durable-store shape, not the
100 TB path; at lakehouse scale the Delta/Iceberg implementation keeps
the merge distributed. Both backends pass the same contract test
(tests/test_streaming_rollup_refresh.py), which is the point: the sink
cannot tell them apart.
"""

from __future__ import annotations

import re
import threading
from typing import Optional

from pyspark.sql import DataFrame

from .ingest import RollupMergeBackend


def _ident(name: str) -> str:
    """Sanitize a grouping/fact id into a SQL identifier fragment.

    The sanitized prefix alone is NOT injective ('a-b' and 'a_b' both
    map to 'a_b'), and a collision would silently merge two rollup
    tables — and their watermark rows — into one. A short hash of the
    RAW name keeps the mapping injective while staying readable."""
    import hashlib

    out = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if not out or not re.match(r"[A-Za-z_]", out[0]):
        out = "_" + out
    return f"{out}_{hashlib.md5(name.encode()).hexdigest()[:6]}"


class DuckDBMergeBackend(RollupMergeBackend):
    """ACID rollup merges into a DuckDB database file."""

    WATERMARKS = "_merge_watermarks"

    def __init__(self, db_path: str):
        self.db_path = db_path
        # one connection, serialized: foreachBatch calls the sink from
        # the streaming thread; the contract is per-backend-instance
        self._lock = threading.Lock()
        import duckdb

        self._con = duckdb.connect(db_path)
        self._con.execute(
            f"CREATE TABLE IF NOT EXISTS {self.WATERMARKS} ("
            "tbl VARCHAR PRIMARY KEY, merged_batch BIGINT)"
        )

    def _table(self, grouping: list[str], fact_id: str) -> str:
        parts = "__".join(_ident(g) for g in grouping)
        return f"rollup__{parts}__{_ident(fact_id)}"

    def last_merged_batch(
        self, grouping: list[str], fact_id: str
    ) -> Optional[int]:
        tbl = self._table(grouping, fact_id)
        with self._lock:
            row = self._con.execute(
                f"SELECT merged_batch FROM {self.WATERMARKS} WHERE tbl = ?",
                [tbl],
            ).fetchone()
        return int(row[0]) if row else None

    def merge(
        self, delta: DataFrame, grouping: list[str], fact, batch_id: int
    ) -> None:
        tbl = self._table(grouping, fact.id)
        keys = [*grouping, "ts"]
        measures = ["counter"]
        if fact.type == "average":
            measures.append("total")
        if fact.type == "histogram":
            keys.append("bucket_lo")
        # Driver-side materialization of the micro-batch's ROLLUP
        # DELTA — bounded by distinct (dims x slice-buckets [x
        # histogram buckets]) touched in ONE micro-batch, NOT by its
        # raw row count (the upstream groupBy collapsed that). The
        # bound is real but input-shaped: a batch spanning D distinct
        # dim combos and S slice buckets yields <= D*S rows, so a
        # pathological high-cardinality dim (e.g. a per-user path
        # dim) with a large trigger interval could balloon this —
        # cap trigger intervals or pre-hash such dims before
        # declaring them. At the reference's shape (category-like
        # dims, minutes-grain slices) D*S is thousands of rows per
        # batch. The backend exists as the single-process ACID seam;
        # a lakehouse MERGE backend replaces this wholesale (same
        # RollupMergeBackend interface) when jars are available.
        pdf = delta.toPandas()
        cols = keys + measures
        pdf = pdf[cols]
        key_sql = ", ".join(f'"{k}"' for k in keys)
        col_sql = ", ".join(f'"{c}"' for c in cols)
        set_sql = ", ".join(
            f'"{m}" = {tbl}."{m}" + excluded."{m}"' for m in measures
        )
        dim_defs = ", ".join(f'"{g}" VARCHAR' for g in grouping)
        bucket_def = (
            ', "bucket_lo" DOUBLE' if fact.type == "histogram" else ""
        )
        measure_defs = ", ".join(f'"{m}" DOUBLE' for m in measures)
        with self._lock:
            con = self._con
            con.execute("BEGIN TRANSACTION")
            try:
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {tbl} ("
                    f'{dim_defs}, "ts" TIMESTAMP{bucket_def}, '
                    f"{measure_defs}, PRIMARY KEY ({key_sql}))"
                )
                con.register("_delta_pdf", pdf)
                # a replayed batch must not re-apply: the watermark is
                # read under the same transaction's snapshot
                row = con.execute(
                    f"SELECT merged_batch FROM {self.WATERMARKS} "
                    "WHERE tbl = ?",
                    [tbl],
                ).fetchone()
                if row is not None and int(row[0]) >= int(batch_id):
                    con.execute("ROLLBACK")
                    return
                con.execute(
                    f"INSERT INTO {tbl} ({col_sql}) "
                    f"SELECT {col_sql} FROM _delta_pdf "
                    f"ON CONFLICT ({key_sql}) DO UPDATE SET {set_sql}"
                )
                con.execute(
                    f"INSERT INTO {self.WATERMARKS} VALUES (?, ?) "
                    "ON CONFLICT (tbl) DO UPDATE SET "
                    "merged_batch = excluded.merged_batch",
                    [tbl, int(batch_id)],
                )
                con.execute("COMMIT")
            except Exception:
                con.execute("ROLLBACK")
                raise
            finally:
                try:
                    con.unregister("_delta_pdf")
                except Exception:
                    pass  # never mask the merge's own outcome

    def read_rollup(self, grouping: list[str], fact_id: str):
        """Read back the maintained rollup as a pandas DataFrame (the
        query-side convenience for tests and single-node serving)."""
        tbl = self._table(grouping, fact_id)
        with self._lock:
            return self._con.execute(f"SELECT * FROM {tbl}").df()
