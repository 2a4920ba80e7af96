"""Mergeable rank-quantile sketch — log2 sub-bucketed histogram with
guaranteed relative error, in exact integer arithmetic.

The sketch-store family (HLL distincts, CMS frequencies, KMV overlap,
Bloom membership, equi-width histograms) lacked the summary production
metrics engines lean on hardest: MERGEABLE PERCENTILES — p50/p95/p99
latency per (service, day), re-aggregable to any coarser grain without
touching raw data. This module supplies it.

DESIGN DECISION (documented divergence from the r10 verdict's "KLL"
naming): KLL (Karnin-Lang-Liberty 2016) and t-digest are RANDOMIZED
and MERGE-ORDER-DEPENDENT — the sketch produced by absorbing slices
A,B differs from B,A and from one-shot(A+B), which is fundamentally
incompatible with this repo's hash-gate discipline (the driver's
oracle recomputes state from scratch in SQL and must match the
incremental store bit-for-bit; every store pins merge-equals-one-shot
as an EXACT property). Derandomizing KLL's compaction coin does not
fix this: which items survive still depends on how the input was
sliced. The deterministic alternative with the same operational role
is the LOG-BUCKETED histogram — HdrHistogram (Tene,
github.com/HdrHistogram) and DDSketch (Masson, Rim & Lee, VLDB 2019)
— whose state is a pure function of the input MULTISET: bucket counts
merge by ADDITION (associative, commutative, order-free), quantile
answers carry a GUARANTEED relative error (2^-sub_bits, here 1/32 ~
3.1%), and every step is exact integer arithmetic both Spark and
DuckDB evaluate identically. It trades KLL's O(1/k) rank error for a
bounded VALUE error — the guarantee latency SLOs are actually written
against (p99 within 3%, not p99 at rank +-n/k) — and is what Datadog,
Prometheus native histograms, and HdrHistogram deployments run in
production at exactly this store's 100 TB role.

Bucket indexing (the HdrHistogram linear-log layout), for integer
values v >= 1 with ``s`` sub-bucket bits:

    e   = bit_length(v) - 1          # floor(log2 v), EXACT via the
                                     # binary string length — no
                                     # transcendental calls anywhere
    sh  = max(e - s, 0)              # this value's bucket width: 2^sh
    idx = sh * 2^s + floor(v / 2^sh)

Small values (v < 2^(s+1)) get width-1 buckets (idx = v, exact);
above that each octave splits into 2^s sub-buckets. The layout is
continuous (v = 2^(s+1)-1 -> idx = v; v = 2^(s+1) -> the first
width-2 bucket) and monotone, so rank arithmetic over idx order is
rank arithmetic over value order. Inverse (the bucket's LOWER BOUND,
the reported quantile value — conservative: never overshoots the true
quantile's bucket):

    sh = max(idx div 2^s - 1, 0)
    lb = (idx - sh * 2^s) * 2^sh

Relative error: the true quantile lies in [lb, lb + 2^sh) and
lb >= 2^(s+sh) in the log region, so (width / lb) <= 2^-s — with
s = 5, every reported percentile is within 3.125% below the true
value, at every merge grain, deterministically.

Magnitude bounds (the hll.py discipline): exact for 1 <= v < 2^53
(the division ``floor(v / 2^sh)`` rides IEEE doubles, exact below
2^53 because 2^sh divides the representation error away; DuckDB's
``//`` mirrors it on BIGINT exactly). Counts are int64 sums —
overflow needs 9e18 observations per bucket.

Sketch size: idx < (53 - s) * 2^s + 2^(s+1) — at s = 5 at most ~1600
buckets per key EVER, regardless of data volume; per-key state is
broadcastable and the additive merge is one partial-aggregated
exchange over rows already bounded by the sketch property.

Reference scope: the reference engine's only quantile surface is the
unimplemented histogram stub (SURVEY.md section 2.4); the in-repo
``histogram_quantiles`` (collapse.py) is fixed-bucket with data-range
assumptions, and ``robust_stats`` is exact-rank but NOT mergeable.
This is the north-star extension the r10 verdict ranked first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

QSK_SUB_BITS = 5  # 2^5 = 32 sub-buckets per octave -> rel err <= 1/32
QSK_QS = (50, 95, 99)  # the percentiles every gate serves


def qsk_bucket(col, sub_bits: int = QSK_SUB_BITS) -> Column:
    """Bucket index for an integer value column (v >= 1), exact: the
    exponent comes from the binary-string length (``conv`` is exact on
    longs), the sub-bucket from a power-of-two floor division."""
    v = F.col(col) if isinstance(col, str) else col
    v = v.cast("long")
    e = (F.length(F.conv(v.cast("string"), 10, 2)) - 1).cast("int")
    sh = F.greatest(e - F.lit(sub_bits), F.lit(0))
    return (
        sh * F.lit(1 << sub_bits)
        + F.floor(v / F.pow(F.lit(2.0), sh)).cast("int")
    ).cast("int")


def qsk_bucket_sql(expr: str, sub_bits: int = QSK_SUB_BITS) -> str:
    """DuckDB mirror of :func:`qsk_bucket` — same binary-string
    exponent, same integer floor division (``//`` on non-negative
    BIGINTs truncates = floors)."""
    e = f"(length(printf('%b', {expr})) - 1)"
    sh = f"greatest({e} - {sub_bits}, 0)"
    return (
        f"(({sh}) * {1 << sub_bits}"
        f" + ({expr}) // CAST(pow(2, {sh}) AS BIGINT))::INTEGER"
    )


def qsk_lower_bound(col, sub_bits: int = QSK_SUB_BITS) -> Column:
    """The bucket's lower bound — the reported quantile value."""
    b = (F.col(col) if isinstance(col, str) else col).cast("long")
    sh = F.greatest(
        F.floor(b / F.lit(1 << sub_bits)).cast("int") - 1, F.lit(0)
    )
    return (
        (b - sh.cast("long") * F.lit(1 << sub_bits))
        * F.pow(F.lit(2.0), sh).cast("long")
    ).cast("long")


def qsk_lower_bound_sql(expr: str, sub_bits: int = QSK_SUB_BITS) -> str:
    sh = f"greatest(({expr}) // {1 << sub_bits} - 1, 0)"
    return (
        f"((({expr}) - ({sh}) * {1 << sub_bits})"
        f" * CAST(pow(2, {sh}) AS BIGINT))::BIGINT"
    )


def qsk_counters(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sub_bits: int = QSK_SUB_BITS,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key sketch state: (keys..., b, c) bucket counts — ONE
    partial-aggregated exchange; output bounded by the sketch property
    (<= ~1600 rows per key at s = 5), never by data volume. Values
    must be integers >= 1 (scale doubles to fixed-point first; the
    gate queries use the registry's x1000 discipline).

    ``weight_col`` (integer >= 0) turns the state into a WEIGHTED
    quantile sketch — bucket counts sum weights instead of rows, so
    the served percentiles answer "the value below which q% of total
    WEIGHT lies" (volume-weighted price percentiles, request-count-
    weighted latency). Everything downstream (merge by addition, the
    cum*100 >= q*n walk, rollups, the store) is weight-agnostic —
    counts were always just non-negative longs."""
    agg = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    return (
        df.select(
            *keys,
            qsk_bucket(value_col, sub_bits).alias("b"),
            *([weight_col] if weight_col is not None else []),
        )
        .groupBy(*keys, "b")
        .agg(agg.cast("long").alias("c"))
    )


def qsk_quantiles(
    counters: DataFrame,
    keys: list[str],
    qs: tuple = QSK_QS,
    sub_bits: int = QSK_SUB_BITS,
) -> DataFrame:
    """Serve percentiles from sketch state: per key, walk the
    cumulative bucket counts in index order and report the lower
    bound of the first bucket whose cumulative count reaches
    ``ceil(q * n / 100)`` (the ``cum*100 >= q*n`` integer form — no
    division anywhere). One window pass + one aggregate over
    sketch-sized input.

    Output: (keys..., n_total, p{q}_lb ...) — all longs."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counters.select(
        *keys,
        "b",
        (F.sum("c").over(w) * 100).alias("_cum100"),
        F.sum("c").over(Window.partitionBy(*keys)).alias("_n"),
    )
    lb = qsk_lower_bound("b", sub_bits)
    aggs = [F.max("_n").cast("long").alias("n_total")]
    for q in qs:
        aggs.append(
            F.min(
                F.when(F.col("_cum100") >= F.lit(int(q)) * F.col("_n"), lb)
            ).cast("long").alias(f"p{int(q)}_lb")
        )
    return cum.groupBy(*keys).agg(*aggs)


def qsk_quantiles_sql(
    counters_sql: str,
    keys: list[str],
    qs: tuple = QSK_QS,
    sub_bits: int = QSK_SUB_BITS,
) -> str:
    """Oracle mirror of :func:`qsk_quantiles` over a counters
    subquery producing (keys..., b, c)."""
    ks = ", ".join(keys)
    lb = qsk_lower_bound_sql("b", sub_bits)
    picks = ",\n       ".join(
        f"MIN(CASE WHEN cum100 >= {int(q)} * n THEN {lb} END)::BIGINT"
        f" AS p{int(q)}_lb"
        for q in qs
    )
    return f"""
WITH cnt AS ({counters_sql}),
cum AS (
  SELECT {ks}, b, c,
         SUM(c) OVER (PARTITION BY {ks} ORDER BY b
                      ROWS UNBOUNDED PRECEDING) * 100 AS cum100,
         SUM(c) OVER (PARTITION BY {ks}) AS n
  FROM cnt)
SELECT {ks}, MAX(n)::BIGINT AS n_total,
       {picks}
FROM cum GROUP BY {ks}
"""


def qsk_rolling_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
    window_buckets: int = 7,
    qs: tuple = QSK_QS,
    sub_bits: int = QSK_SUB_BITS,
) -> DataFrame:
    """ROLLING percentiles — the SLO dashboard read ("p95 over the
    trailing 7 days, per service, every day") served entirely from
    per-bucket sketch state. Values bucket per (key, time bucket)
    into at most ~1600 sketch rows each; every sketch row then
    contributes to the ``window_buckets`` serve-days it participates
    in (one generator explode of the row — work is sketch-rows x
    window, NEVER data x window), bucket counts re-SUM per (key,
    serve-day, bucket) — addition is the merge, so this is exactly
    the week-rollup argument applied to a sliding grain — and the
    quantile walk runs per (key, serve-day). Serve-days are the
    OBSERVED buckets (the rolling-HLL convention: no phantom rows
    after the last day).

    Output: keys + ``bucket_idx`` (the window's END bucket) +
    (n_total, p{q}_lb ...) longs. ``n_total`` is the trailing-window
    observation count — the denominator a percentile SLO reports
    next to its value."""
    if window_buckets < 1:
        raise ValueError(
            f"window_buckets must be >= 1, got {window_buckets}"
        )
    bidx = F.floor(
        F.unix_timestamp(F.col(ts_col)) / bucket_seconds
    ).cast("long")
    cnt = qsk_counters(
        df.select(*keys, bidx.alias("_bi"), F.col(value_col).alias("_v")),
        [*keys, "_bi"],
        "_v",
        sub_bits,
    )
    spread = cnt.select(
        *keys,
        "b",
        "c",
        F.explode(
            F.sequence(
                F.col("_bi"),
                F.col("_bi") + F.lit(int(window_buckets) - 1),
            )
        ).alias("bucket_idx"),
    )
    observed = cnt.select(*keys, F.col("_bi").alias("bucket_idx")).distinct()
    rolled = (
        spread.join(observed, [*keys, "bucket_idx"], "semi")
        .groupBy(*keys, "bucket_idx", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    return qsk_quantiles(rolled, [*keys, "bucket_idx"], qs, sub_bits)


def qsk_rolling_quantiles_sql(
    value_expr: str,
    keys: list[str],
    table: str = "events",
    ts_col: str = "ts",
    bucket_seconds: int = 86_400,
    window_buckets: int = 7,
    qs: tuple = QSK_QS,
    sub_bits: int = QSK_SUB_BITS,
) -> str:
    """Oracle mirror of :func:`qsk_rolling_quantiles` (DuckDB)."""
    ks = ", ".join(keys)
    # explicit floor division (NOT DuckDB's `//`, which truncates
    # toward zero: (-7)//2 = -3 there) so pre-1970 timestamps bucket
    # identically to the Spark side's F.floor(unix_timestamp / n)
    bidx = (
        f"CAST(floor(CAST(floor(epoch({ts_col})) AS BIGINT)"
        f" / {bucket_seconds}.0) AS BIGINT)"
    )
    on = " AND ".join(
        [f"sp.{k} = obs.{k}" for k in keys]
        + ["sp.bucket_idx = obs.bucket_idx"]
    )
    counters = f"""
SELECT {', '.join('sp.' + k for k in keys)}, sp.bucket_idx, sp.b,
       SUM(sp.c)::BIGINT AS c FROM (
  SELECT {ks}, bi + off AS bucket_idx, b, c
  FROM (
    SELECT {ks}, {bidx} AS bi,
           {qsk_bucket_sql(value_expr, sub_bits)} AS b,
           COUNT(*)::BIGINT AS c
    FROM {table} GROUP BY ALL) base,
    unnest(generate_series(0, {int(window_buckets) - 1})) t(off)
) sp
JOIN (SELECT DISTINCT {ks}, {bidx} AS bucket_idx FROM {table}) obs
  ON {on}
GROUP BY ALL"""
    return qsk_quantiles_sql(counters, [*keys, "bucket_idx"], qs, sub_bits)
