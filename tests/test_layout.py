"""Z-order layout operators (operators/layout.py): Morton key
exactness vs an independent model, the aligned-rectangle invariant of
the cell report, and the actual file-skipping property of
write_zordered — parquet footer min/max statistics must become
selective on BOTH dimensions, which a single-column sort layout
cannot provide."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from time_series_storage_spark.operators.layout import (
    write_zordered,
    zorder_cells,
    zorder_key,
    zorder_sql,
)


def _morton_model(x: int, y: int, bits: int) -> int:
    mask = (1 << bits) - 1
    x &= mask
    y &= mask
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_model_and_sql(spark):
    """Spark expression, SQL mirror, and pure-Python model agree on a
    value grid that includes the mask-fold edge (inputs over 2^bits)."""
    import duckdb

    vals = [0, 1, 2, 3, 15, 16, 17, 255, 256, 1000, 65535, 65536, 70000]
    rows = [(i, x, y) for i, (x, y) in enumerate(
        (a, b) for a in vals for b in vals
    )]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r.i: r.z
        for r in df.select("i", zorder_key("x", "y", 16).alias("z")).collect()
    }
    want = {i: _morton_model(x, y, 16) for i, x, y in rows}
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql_got = dict(
        con.execute(f"SELECT i, {zorder_sql('x', 'y', 16)} FROM t").fetchall()
    )
    assert sql_got == want


def test_zorder_key_rejects_bad_bits(spark):
    with pytest.raises(ValueError, match="bits"):
        zorder_key("x", "y", 32)


def test_zorder_cells_aligned_rectangles(spark):
    """The cell report's defining invariant: a cell of 2^8 keys is an
    aligned 16x16 rectangle, so every cell's x and y extents share
    their high bits above bit 4."""
    rows = [(i % 100, (i * 7) % 300) for i in range(5000)]
    df = spark.createDataFrame(rows, "x long, y long")
    cells = zorder_cells(df, "x", "y", bits=16, cell_shift=8).collect()
    assert sum(r.n_rows for r in cells) == 5000
    for r in cells:
        assert r.x_min >> 4 == r.x_max >> 4, r
        assert r.y_min >> 4 == r.y_max >> 4, r
        assert 0 <= r.x_min <= r.x_max and 0 <= r.y_min <= r.y_max


def _file_stats(path_glob: str, col: str):
    """Per-file (min, max) of ``col`` from parquet footer statistics —
    exactly the metadata a scan planner prunes with."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.read_metadata(f)
        schema_names = md.schema.names
        ci = schema_names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            assert st is not None and st.has_min_max
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: on a 64x64 uniform grid written as 8
    files, a point predicate on EITHER dimension must skip most files
    by footer min/max — while the single-column (y-sorted) layout
    leaves every file's x range at full width, skipping nothing on x."""
    rows = [(i % 64, i // 64) for i in range(64 * 64)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "x", "y", bits=6, num_files=8)
    spath = str(tmp_path / "s")
    (
        df.repartitionByRange(8, "y")
        .sortWithinPartitions("y")
        .write.parquet(spath)
    )

    def hits(stats, v):
        return sum(1 for lo, hi in stats if lo <= v <= hi)

    zx = _file_stats(zpath + "/*.parquet", "x")
    zy = _file_stats(zpath + "/*.parquet", "y")
    sx = _file_stats(spath + "/*.parquet", "x")
    assert len(zx) == 8 and len(sx) == 8
    # z-order: a point predicate on either dimension keeps at most
    # half the files (contiguous key ranges = bounded rectangles)
    assert hits(zx, 10) <= 4
    assert hits(zy, 10) <= 4
    # y-sorted layout: every file spans the full x domain — zero
    # pruning on the second dimension
    assert hits(sx, 10) == 8
    # and the data survives the round trip under the layout
    assert spark.read.parquet(zpath).count() == 64 * 64
    back = spark.read.parquet(zpath).where(F.col("x") == 10)
    assert back.count() == 64


# -- Hilbert curve ------------------------------------------------------------

def _xy2d_classic(n: int, x: int, y: int) -> int:
    """The classic rotation-loop xy2d (Wikipedia) — the independent
    reference the 4-state machine must reproduce."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _hilbert_model(x: int, y: int, bits: int) -> int:
    from time_series_storage_spark.operators.layout import (
        _HILBERT_D,
        _HILBERT_S,
    )

    st, d = 0, 0
    for i in range(bits):
        lvl = bits - 1 - i
        q = st * 4 + ((x >> lvl) & 1) * 2 + ((y >> lvl) & 1)
        d = (d << 2) | _HILBERT_D[q]
        st = _HILBERT_S[q]
    return d


def test_hilbert_tables_match_classic_exhaustively():
    """The 4-state machine reproduces the classic rotation loop for
    EVERY point of the 256x256 grid, is a bijection onto [0, 65536),
    and consecutive indices are always Manhattan-adjacent — the
    locality property Z-order lacks (and the reason hilbert_key
    exists)."""
    n = 256
    inv = {}
    for x in range(n):
        for y in range(n):
            d = _hilbert_model(x, y, 8)
            assert d == _xy2d_classic(n, x, y), (x, y)
            inv[d] = (x, y)
    assert len(inv) == n * n
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d
    # Morton, by contrast, jumps at the very first quadrant seam
    jumps = 0
    morton_inv = {}
    for x in range(16):
        for y in range(16):
            morton_inv[_morton_model(x, y, 4)] = (x, y)
    for d in range(255):
        (x0, y0), (x1, y1) = morton_inv[d], morton_inv[d + 1]
        if abs(x0 - x1) + abs(y0 - y1) != 1:
            jumps += 1
    assert jumps > 0


def test_hilbert_key_matches_model_and_sql(spark):
    """Spark column, SQL string (via Spark's parser) and the Python
    model agree on sampled points at bits=8 and bits=16, including
    out-of-range values (masked, like zorder_key)."""
    import duckdb

    from time_series_storage_spark.operators.layout import (
        hilbert_key,
        hilbert_sql,
    )

    pts = [
        (0, 0), (1, 0), (255, 255), (17, 200), (300, 5), (65535, 12345),
        (99999, 7), (12345, 54321),
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    for bits in (8, 16):
        mask = (1 << bits) - 1
        want = [
            _hilbert_model(x & mask, y & mask, bits) for x, y in pts
        ]
        got = [
            r.k
            for r in df.select(
                hilbert_key("x", "y", bits).alias("k")
            ).collect()
        ]
        assert got == want
        sql = hilbert_sql("x", "y", bits)
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", pts)
        got_sql = [r[0] for r in con.execute(
            f"SELECT {sql} FROM t ORDER BY rowid"
        ).fetchall()]
        assert got_sql == want


def test_hilbert_beats_zorder_extents_on_events_shape(spark):
    """The reason to offer both layouts: on a realistic skewed point
    set (few hot x values, dense sequential y — the events shape), the
    Hilbert cells' mean bounding-box area is no worse than Morton's at
    the same bits/cell granularity, i.e. min/max file skipping is at
    least as selective."""
    import random

    from time_series_storage_spark.operators.layout import (
        hilbert_cells,
        zorder_cells,
    )

    rng = random.Random(7)
    pts = [
        (rng.randrange(0, 40), rng.randrange(0, 700))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(pts, "x long, y long")

    def mean_area(cells):
        rows = cells.collect()
        return sum(
            (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) for r in rows
        ) / len(rows)

    hil = mean_area(hilbert_cells(df, "x", "y", bits=16, cell_shift=8))
    mor = mean_area(zorder_cells(df, "x", "y", bits=16, cell_shift=8))
    assert hil <= mor
