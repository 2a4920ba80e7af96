"""HyperLogLog distinct-count sketch — the FIXED-SIZE counterpart to
the KMV sketch (operators/sketch.py), with exact integer registers.

KMV keeps the k smallest element hashes per group: state is k longs,
accuracy ~1/sqrt(k-2), and small groups are exact. HLL (Flajolet et
al. 2007) instead keeps, for each of ``m = 2^p`` registers, the
maximum number of leading zero bits seen in that register's hash
suffixes: state is m SMALL INTEGERS (here rho <= 41 fits a byte), the
canonical sketch production systems standardize on (Redis PFCOUNT,
BigQuery/Snowflake APPROX_COUNT_DISTINCT, Spark's own
``approx_count_distinct``). The reason to build it by hand rather
than call the built-in is the registry's standing rule: engine-native
sketches are OPAQUE — their estimates differ engine to engine, so
they cannot be oracle-gated and their state cannot be re-derived by
another system. This HLL is a pure function of the data: md5-derived
hash, integer register updates, and an estimator evaluated in EXACT
integer arithmetic, so Spark and DuckDB produce bit-identical
registers AND bit-identical estimates.

Hash layout (one md5 per element, like every hash in this repo):
48-bit hash ``h`` = first 12 md5 hex chars; register index
``r = h >> 40`` (p = 8, m = 256 registers); the remaining 40-bit
suffix contributes ``rho = (leading zeros in 40 bits) + 1 =
41 - bit_length(suffix)`` (suffix 0 => rho = 41). ``bit_length`` is
``length(bin(x))`` in BOTH engines — no floats, no loops.

Estimator, exact-integer form. The raw HLL estimate is
``alpha_m * m^2 / sum_j 2^(-rho_j)``. Multiply the harmonic sum
through by 2^41: with ``N = sum_present 2^(41 - rho_j) +
zeros * 2^41`` (absent registers have rho = 0, i.e. contribute 2^41),

    raw = (ALPHA_X1E4 * ((2^57) // N)) // 10^4        [m^2 * 2^41 = 2^57]

Every intermediate is a non-negative BIGINT: N <= 256 * 2^41 = 2^49,
(2^57)//N <= 2^49, and ALPHA_X1E4 * 2^49 < 2^62. The interior floor
loses at most N/2^57 <= 1/256 relative — far inside the sketch's
~6.5% standard error at m = 256 — and identically in every engine.
``ALPHA_X1E4 = 7183`` is the published alpha_256 =
0.7213/(1 + 1.079/256) at 1e-4 resolution, a pinned constant.

Small-range correction (the published estimator's bias fix): when
``raw <= 5m/2`` and some register is still zero, use linear counting
``m * ln(m / V)`` with V = zero registers. ln is not exact — so the
256 possible values are PRECOMPUTED as the integer table
:data:`LC_TABLE` (``round(256 * ln(256 / V))``), embedded as a
literal lookup in both engines. The estimator never evaluates a
transcendental at query time.

Scale shape: building registers is ONE partial-aggregated exchange
(map-side max combine) of at most m rows per group per partition —
the fixed-size property that makes HLL the default at 100 TB, where
KMV's k x partitions intermediate is already bigger than m. Merging
two sketches is register-wise MAX — associative, commutative, and
IDEMPOTENT (re-absorbing the same data is a no-op by algebra, not by
bookkeeping), which is the store discipline
:class:`~.hll_store.HllSketchStore` introduces.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3); this extends the training-data-pipeline accounting
family (per-group unique-content counts at corpus scale) alongside
the KMV member, giving the registry both canonical distinct sketches.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_RHO_BITS = 40  # suffix width; rho in [1, 41]
HLL_RHO_MAX = HLL_RHO_BITS + 1
ALPHA_X1E4 = 7183  # alpha_256 = 0.7213 / (1 + 1.079/256), 1e-4 fixed point
_POW2_57 = 1 << 57  # m^2 * 2^(RHO_MAX) = 2^16 * 2^41
LC_THRESHOLD = (5 * HLL_M) // 2  # 640: published small-range cutoff

# linear-counting table: LC_TABLE[V-1] = round(m * ln(m / V)), V in 1..m
LC_TABLE = tuple(
    round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
)


def hll_hash(col) -> Column:
    """48-bit md5 element hash — same domain as the KMV hash (12 hex
    chars), split here into 8 register bits + 40 suffix bits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def hll_registers(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
) -> DataFrame:
    """The sketch itself: per key, the occupied registers and their
    max rank. Output: key_cols + ``r`` (int, 0..m-1) + ``rho`` (int,
    1..41). Registers never hit stay ABSENT (implicit rho 0) — at
    most m rows per key ever exist.

    One exchange, partial-aggregated: max combines map-side, so the
    shuffle carries <= m rows per key per input partition regardless
    of corpus size."""
    h = hll_hash(elem_col)
    suffix = h.bitwiseAND(F.lit((1 << HLL_RHO_BITS) - 1))
    rho = (
        F.when(suffix == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(suffix)))
        .cast("int")
    )
    return (
        elements.select(
            *key_cols,
            F.shiftright(h, HLL_RHO_BITS).cast("int").alias("r"),
            rho.alias("rho"),
        )
        .groupBy(*key_cols, "r")
        .agg(F.max("rho").alias("rho"))
    )


def hll_aggregate(
    registers: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Evaluate the exact-integer estimator over a register table.
    Output: key_cols + ``n_regs`` (occupied registers) + ``harm_num``
    (the 2^41-scaled harmonic numerator N) + ``v_zero`` + the final
    ``est_distinct`` (raw estimator with the linear-counting
    small-range branch). One exchange on the keys; the input is
    sketch-sized (<= m rows per key) by construction."""
    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (F.lit(HLL_RHO_MAX) - F.col("rho")).cast("int"),
    )
    per_key = registers.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(term).cast("long").alias("_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_regs")
    harm = (
        F.col("_present")
        + F.shiftleft(v_zero, HLL_RHO_MAX).cast("long")
    )
    from .analytics import floor_div

    raw = floor_div(
        F.lit(ALPHA_X1E4)
        * floor_div(F.lit(_POW2_57), F.col("harm_num")),
        F.lit(10_000),
    ).cast("long")
    lc = F.element_at(
        F.array(*[F.lit(int(x)) for x in LC_TABLE]),
        F.greatest(v_zero, F.lit(1)).cast("int"),
    ).cast("long")
    return (
        per_key.withColumn("harm_num", harm.cast("long"))
        .withColumn("v_zero", v_zero.cast("long"))
        .withColumn(
            "est_distinct",
            F.when(
                (raw <= LC_THRESHOLD) & (F.col("v_zero") > 0), lc
            ).otherwise(raw),
        )
        .select(*key_cols, "n_regs", "harm_num", "v_zero", "est_distinct")
    )


def hll_distinct(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
) -> DataFrame:
    """registers -> estimate in one call (the batch entry point)."""
    return hll_aggregate(hll_registers(elements, key_cols, elem_col), key_cols)


# ---------------------------------------------------------------------------
# SQL mirrors (oracle fragments — the identical arithmetic in ANSI SQL)
# ---------------------------------------------------------------------------


def hll_hash_sql(elem: str) -> str:
    return f"CAST(CONCAT('0x', SUBSTRING(md5({elem}), 1, 12)) AS BIGINT)"


def lc_table_sql() -> str:
    """The linear-counting lookup as a literal list (1-indexed in both
    DuckDB ``list_extract`` and Spark ``element_at``)."""
    return "[" + ", ".join(str(int(x)) for x in LC_TABLE) + "]"


def hll_registers_sql(rows: str, key: str, elem: str) -> str:
    """Register table over ``rows`` (a FROM-able fragment producing
    ``{key}`` and ``{elem}``): SELECT key, r, max rho."""
    h = hll_hash_sql(elem)
    mask = (1 << HLL_RHO_BITS) - 1
    return f"""
  SELECT {key} AS gk, ({h} >> {HLL_RHO_BITS})::INT AS r,
         MAX(CASE WHEN ({h} & {mask}) = 0 THEN {HLL_RHO_MAX}
              ELSE {HLL_RHO_MAX} - length(bin({h} & {mask})) END)::INT AS rho
  FROM {rows} GROUP BY 1, 2"""


def hll_estimate_sql(regs: str) -> str:
    """Estimator over a register table ``regs(gk, r, rho)`` — mirrors
    :func:`hll_aggregate` term for term."""
    return f"""
  SELECT gk, n_regs, harm_num, v_zero,
         CASE WHEN raw <= {LC_THRESHOLD} AND v_zero > 0
              THEN list_extract({lc_table_sql()},
                                GREATEST(v_zero, 1)::INT)::BIGINT
              ELSE raw END AS est_distinct
  FROM (
    SELECT gk, n_regs, harm_num, v_zero,
           ({ALPHA_X1E4} * (({_POW2_57}::BIGINT) // harm_num)) // 10000
             AS raw
    FROM (
      SELECT gk, COUNT(*)::BIGINT AS n_regs,
             (SUM(1::BIGINT << ({HLL_RHO_MAX} - rho))
              + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_RHO_MAX})
             )::BIGINT AS harm_num,
             ({HLL_M} - COUNT(*))::BIGINT AS v_zero
      FROM ({regs}) GROUP BY gk) b) c"""


def hll_rolling_estimate(
    elements: DataFrame,
    key_cols: Sequence[str],
    elem_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
    window_buckets: int = 7,
) -> DataFrame:
    """ROLLING distinct estimate — HLL register MERGE inside the plan,
    the max-merge mirror of :func:`~.sketch.kmv_rolling_estimate`
    (same grain, same output role; the two sketch families answer the
    same rolling-distinct question and their gates share keys so they
    compare row for row).

    Per (key, time bucket) the registers pack into a DENSE m-slot
    array (absent register = 0); the trailing-window merge is then a
    pure codegen fold — ``zip_with(acc, arr, greatest)`` over a
    range-frame ``collect_list`` of at most ``window_buckets`` arrays
    — because HLL merge IS element-wise max. Missing buckets cost
    nothing (range frame over the bucket index). The estimator is the
    exact-integer form of :func:`hll_aggregate` evaluated on the
    merged array (``rho = 0`` slots contribute 2^41 to the harmonic
    numerator uniformly, so the dense form needs no zero-count
    special case).

    Scale shape: register building is one partial-aggregated exchange
    bounded at m rows per (key, bucket) per partition; what crosses
    the wire afterward is one m-slot int array per (key, bucket); the
    rolling merge is one window pass over sketch-sized rows. Output:
    key_cols + ``bucket_idx`` + ``n_regs``/``harm_num``/``v_zero``/
    ``est_distinct`` (long).
    """
    from pyspark.sql import Window

    from .analytics import floor_div

    if window_buckets < 1:
        raise ValueError(
            f"window_buckets must be >= 1, got {window_buckets}"
        )
    bidx = F.floor(
        F.unix_timestamp(F.col(ts_col)) / bucket_seconds
    ).cast("long")
    bucketed = elements.select(
        *key_cols, bidx.alias("bucket_idx"), F.col(elem_col).alias("_e")
    )
    regs = hll_registers(bucketed, [*key_cols, "bucket_idx"], "_e")
    dense = regs.groupBy(*key_cols, "bucket_idx").agg(
        F.aggregate(
            F.collect_list(F.struct("r", "rho")),
            F.array_repeat(F.lit(0), HLL_M),
            lambda acc, e: F.transform(
                F.sequence(F.lit(1), F.lit(HLL_M)),
                lambda i: F.when(
                    i == e["r"] + 1, F.greatest(F.element_at(acc, i), e["rho"])
                ).otherwise(F.element_at(acc, i)),
            ),
        ).alias("_dense")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_idx")
        .rangeBetween(-(window_buckets - 1), 0)
    )
    merged = F.aggregate(
        F.collect_list("_dense").over(w),
        F.array_repeat(F.lit(0), HLL_M),
        lambda acc, arr: F.zip_with(acc, arr, lambda a, b: F.greatest(a, b)),
    )
    rolled = dense.select(
        *key_cols,
        F.col("bucket_idx").cast("long").alias("bucket_idx"),
        merged.alias("_m"),
    )
    n_regs = F.size(F.filter(F.col("_m"), lambda x: x > 0)).cast("long")
    harm = F.aggregate(
        F.col("_m"),
        F.lit(0).cast("long"),
        lambda acc, rho: acc
        + F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.lit(HLL_RHO_MAX) - rho).cast("int"),
        ),
    ).cast("long")
    v_zero = (F.lit(HLL_M) - F.col("n_regs")).cast("long")
    raw = floor_div(
        F.lit(ALPHA_X1E4) * floor_div(F.lit(_POW2_57), F.col("harm_num")),
        F.lit(10_000),
    ).cast("long")
    lc = F.element_at(
        F.array(*[F.lit(int(x)) for x in LC_TABLE]),
        F.greatest(F.col("v_zero"), F.lit(1)).cast("int"),
    ).cast("long")
    return (
        rolled.withColumn("n_regs", n_regs)
        .withColumn("harm_num", harm)
        .withColumn("v_zero", v_zero)
        .withColumn(
            "est_distinct",
            F.when(
                (raw <= LC_THRESHOLD) & (F.col("v_zero") > 0), lc
            ).otherwise(raw),
        )
        .select(
            *key_cols, "bucket_idx",
            "n_regs", "harm_num", "v_zero", "est_distinct",
        )
    )
