"""Data-layout operators: multi-dimensional clustering (Z-order) for
scan pruning.

The reference stores rollups in row-ordered JDBC tables and has no
layout control at all (its scan pruning is the grouping-path table
choice, postgres/query.clj:19-28). At 100 TB on a data lake the
dominant cost is the scan, and single-column sort layouts prune only
one predicate dimension; interleaving the bits of two dimensions into
one Morton (Z-order) key and range-partitioning + sorting by it gives
every parquet file a small RECTANGLE of the (x, y) space, so file- and
row-group-level min/max statistics skip on EITHER dimension — the
standard lakehouse OPTIMIZE ZORDER BY workflow, expressed here with
nothing but public Spark primitives:

* :func:`zorder_key`   — the Morton interleave as pure codegen bit
  arithmetic (no UDF, no shuffle; 2*bits shift/and/or terms).
* :func:`write_zordered` — repartitionByRange on the key (contiguous
  key ranges per output file) + sortWithinPartitions (contiguous row
  groups within the file), then plain parquet.
* :func:`zorder_cells` — per key-prefix cell occupancy + per-dimension
  min/max extents: the auditable locality report (narrow extents =
  skippable files), and the piece a SQL oracle can hash-check.

Exactness: inputs are masked to ``bits`` low bits first, all
arithmetic is BIGINT shifts/ands/ors — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def zorder_key(x, y, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative integer columns:
    bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i + 1.

    ``bits`` low bits of each input are used (inputs are masked, so
    out-of-range values fold rather than corrupt neighbors — size
    ``bits`` to cover the domain). 2 x ``bits`` <= 62 keeps the key a
    non-negative BIGINT. The expression is a flat or-chain of
    shift/and terms: whole-stage codegen, zero shuffle, zero Python.
    """
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xm = _as_col(x).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = _as_col(y).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(xm, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(ym, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return key


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton interleave as an ANSI-SQL expression
    string (BIGINT shifts/ands/ors) — the oracle mirror of
    :func:`zorder_key`, and reusable in any engine's DDL."""
    mask = (1 << bits) - 1
    xm = f"(CAST({x} AS BIGINT) & {mask})"
    ym = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    num_files: int = 8,
    key_col: str = "_zkey",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of (x, y).

    ``repartitionByRange`` on the Morton key gives each output file a
    CONTIGUOUS key range — i.e. a bounded rectangle (or a few aligned
    quadrants) of the (x, y) space — and ``sortWithinPartitions``
    extends that to row groups, so parquet min/max statistics prune
    scans filtered on either dimension. The key column is kept in the
    file: it is the layout's index and costs one BIGINT column.

    At cluster scale ``num_files`` becomes the target file count of
    the table (size it to ~1 GB files); the range partitioner samples
    the key distribution, so skew in (x, y) density translates into
    even file sizes, not hot files.
    """
    keyed = df.withColumn(key_col, zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(num_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_cells(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    cell_shift: int = 8,
) -> DataFrame:
    """Locality report of the Z-order layout: rows grouped into cells
    by the key's high bits (``cell = zkey >> cell_shift``), with each
    cell's occupancy and the min/max extent of both dimensions.

    A Z-order cell of 2^cell_shift keys is an aligned rectangle of
    2^ceil(cell_shift/2) x 2^floor(cell_shift/2) in (x, y) — narrow
    per-cell extents are exactly what makes min/max file statistics
    selective. One shuffle (the groupBy), partial-aggregated.
    """
    key = zorder_key(x, y, bits)
    xm = _as_col(x).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = _as_col(y).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    return (
        df.select(
            F.shiftright(key, cell_shift).alias("cell"),
            xm.alias("_x"),
            ym.alias("_y"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").cast("long").alias("x_min"),
            F.max("_x").cast("long").alias("x_max"),
            F.min("_y").cast("long").alias("y_min"),
            F.max("_y").cast("long").alias("y_max"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert curve — the locality-stronger alternative to Z-order
# ---------------------------------------------------------------------------

# 4-state Hilbert machine (derived from the classic Wikipedia xy2d
# rotation loop and verified EXHAUSTIVELY against it for the full
# 256 x 256 grid in tests/test_layout.py): processing one (x, y) bit
# pair per level MSB->LSB, the quadrant digit is D[state*4 + q] and
# the next state is S[state*4 + q], with q = 2*x_bit + y_bit. The
# state encodes the rotation/reflection the classic algorithm applies
# to the remaining low bits — four states are reachable from the
# identity. This formulation keeps the unrolled expression LINEAR in
# `bits` (each level references the previous state expression once),
# where unrolling the coordinate-mutating loop directly would double
# the expression tree per level.
_HILBERT_D = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
_HILBERT_S = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)


def hilbert_key(x, y, bits: int = 8) -> Column:
    """Hilbert-curve index of two non-negative integer columns — the
    same space-filling-layout contract as :func:`zorder_key` with
    strictly better locality: consecutive keys are ALWAYS adjacent
    cells (Manhattan distance 1 — the property Z-order lacks at
    quadrant seams), so a contiguous key range covers a tighter (x, y)
    region and parquet min/max pruning gets more selective on both
    dimensions (Faloutsos & Roseman 1989 established the clustering
    advantage for range scans).

    ``bits`` low bits of each input are used (inputs masked, as in
    zorder_key); the key is in [0, 4^bits). Evaluation is a pure
    codegen chain over two literal 16-entry lookup tables — zero
    shuffle, zero Python, O(bits) expression size."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    d_arr = F.array(*[F.lit(v) for v in _HILBERT_D])
    s_arr = F.array(*[F.lit(v) for v in _HILBERT_S])
    xm = _as_col(x).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = _as_col(y).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    state = F.lit(0)
    for i in range(bits):
        lvl = bits - 1 - i
        bx = F.shiftright(xm, lvl).bitwiseAND(F.lit(1))
        by = F.shiftright(ym, lvl).bitwiseAND(F.lit(1))
        q = (state * 4 + bx * 2 + by).cast("int")
        digit = F.element_at(d_arr, q + F.lit(1)).cast("long")
        key = key.bitwiseOR(F.shiftleft(digit, 2 * lvl))
        state = F.element_at(s_arr, q + F.lit(1))
    return key


def hilbert_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Hilbert index as an ANSI-SQL expression string —
    the oracle mirror of :func:`hilbert_key` (same state machine, same
    literal tables, list_extract 1-indexed in DuckDB exactly like
    Spark's element_at)."""
    mask = (1 << bits) - 1
    d_arr = "[" + ", ".join(str(v) for v in _HILBERT_D) + "]"
    s_arr = "[" + ", ".join(str(v) for v in _HILBERT_S) + "]"
    xm = f"(CAST({x} AS BIGINT) & {mask})"
    ym = f"(CAST({y} AS BIGINT) & {mask})"
    state = "0"
    terms = []
    for i in range(bits):
        lvl = bits - 1 - i
        q = f"({state} * 4 + (({xm} >> {lvl}) & 1) * 2 + (({ym} >> {lvl}) & 1))"
        terms.append(
            f"(CAST(list_extract({d_arr}, {q} + 1) AS BIGINT) << {2 * lvl})"
        )
        state = f"list_extract({s_arr}, {q} + 1)"
    return "(" + " | ".join(terms) + ")"


def hilbert_cells(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 8,
    cell_shift: int = 4,
) -> DataFrame:
    """Locality report of the Hilbert layout — the exact analogue of
    :func:`zorder_cells` (cell = key >> cell_shift, occupancy +
    per-dimension extents), for measuring the Hilbert curve's tighter
    per-cell extents against the Morton baseline on the same points.
    One shuffle (the groupBy), partial-aggregated."""
    key = hilbert_key(x, y, bits)
    xm = _as_col(x).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = _as_col(y).cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    return (
        df.select(
            F.shiftright(key, cell_shift).alias("cell"),
            xm.alias("_x"),
            ym.alias("_y"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").cast("long").alias("x_min"),
            F.max("_x").cast("long").alias("x_max"),
            F.min("_y").cast("long").alias("y_min"),
            F.max("_y").cast("long").alias("y_max"),
        )
    )
