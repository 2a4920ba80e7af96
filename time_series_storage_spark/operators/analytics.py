"""Series analytics over (dims..., ts, value) frames: rolling-window
aggregates and linear-interpolation gap fill.

The reference's read path ends at collapse-and-fill-range
(query.clj:99-117) — a dense, zero-filled series. These operators are
the next analytic layer a consumer applies to that series (moving
averages for smoothing/alerting, interpolation where zero-fill is the
wrong semantic for gauge-like measures), expressed as pure Catalyst
window/join plans so they compose with any engine output.

Float discipline (same contract as the rest of the repo): values are
quantized to fixed-point longs *before* any reduction, so every sum is
exact integer arithmetic — commutative, partition-order-insensitive and
bit-reproducible in any engine — and every division is an explicitly
floored double division of magnitudes far below 2^53.

Scale shape:

* ``rolling_agg`` is one window pass — Spark's range frame keeps a
  sliding accumulator per partition; no self-join, no grid
  densification, shuffle = one exchange on the series dims.
* ``interpolate_fill`` broadcasts the (tiny by construction) time grid
  against the distinct series keys, left-joins the sparse observations
  onto the dense frame (one exchange on ``dims + ts``; the sparse side
  is the smaller one and broadcast-eligible), then runs both carry
  directions in a single window pass (one exchange + one sort on the
  dims — forward and backward frames share partitioning and ordering).
  The dense frame is |series| x |grid| rows, the same size fill-range
  already materializes. Plan pinned by tests/test_analytics.py.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def quantize(value_col, scale: int = 1000):
    """Fixed-point quantization: round(value * scale) as long."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.round(c.cast("double") * scale).cast("long")


def floor_div(a, b):
    """EXACT BIGINT floor division for arbitrary-sign ``a`` (``b`` >
    0): ``div`` after subtracting the non-negative pmod remainder.
    ``F.floor(a / b)`` is NOT exact — ``/`` on longs is double
    division, which rounds operands above 2^53; these helpers keep
    rank/ratio arithmetic bit-identical to an oracle's integer
    division at any count."""
    return F.call_function("div", a - F.pmod(a, b), b)


def ceil_div(a, b):
    """EXACT BIGINT ceiling division for NON-NEGATIVE ``a``, ``b`` > 0:
    ``(a + b - 1) div b``."""
    return F.call_function("div", a + b - F.lit(1), b)


def rolling_agg(
    series: DataFrame,
    dims: Sequence[str],
    window_seconds: int,
    ts_col: str = "ts",
    q_col: str = "q",
) -> DataFrame:
    """Trailing-window aggregate per series: for every bucket, the sum /
    count / floored mean of the quantized value over
    ``[ts - window_seconds + 1s, ts]``.

    One range-frame window over epoch seconds — the frame endpoints are
    data-driven, so sparse series need no densification and each bucket
    pays only its own frame. Adds ``roll_sum`` (exact long), ``roll_cnt``
    and ``roll_avg_q`` (floor(sum/cnt), long) to the input columns.
    """
    w = (
        Window.partitionBy(*dims)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    # both aggregates in one projection -> a single Window operator
    # (one sort); chained withColumn would plan two Window + two Sort
    return series.select(
        "*",
        F.sum(q_col).over(w).alias("roll_sum"),
        F.count(q_col).over(w).alias("roll_cnt"),
    ).withColumn(
        "roll_avg_q",
        F.floor(F.col("roll_sum") / F.col("roll_cnt")).cast("long"),
    )


def rate(
    series: DataFrame,
    dims: Sequence[str],
    ts_col: str = "ts",
    q_col: str = "q",
    per_seconds: int = 1000,
) -> DataFrame:
    """Discrete derivative per series: each observation's change versus
    the previous one and the integer rate of change per ``per_seconds``
    of elapsed time — the counter-rate / gauge-slope operator (PromQL's
    ``delta``/``rate`` shape) over an irregularly spaced series.

    Adds ``delta_q`` (exact long), ``delta_s`` (elapsed seconds, long)
    and ``rate_q`` = floor(delta_q * per_seconds / delta_s) to the
    input columns; the first observation of each series has NULLs (no
    predecessor — a documented choice: a synthetic zero would fabricate
    a spike). One lag-window pass, same single-exchange shape as
    :func:`rolling_agg`: no self-join, no densification, sparse series
    pay only their own rows.

    Duplicate-timestamp contract: observations sharing (dims, ts) are
    ordered by ``q_col`` as a deterministic tiebreak (the lag is the
    same rows on every run and in any engine), and their ``rate_q`` is
    explicitly NULL — a rate over zero elapsed time is undefined, and
    leaving it to the engine's division-by-zero behavior would make
    Spark (NULL) and a strict-ANSI engine (error) diverge. ``delta_q``
    and ``delta_s`` are still emitted (0 elapsed, tiebreak-ordered
    value change) so duplicates remain visible to the caller.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(*dims).orderBy(epoch, F.col(q_col))
    delta_q = F.col(q_col) - F.lag(q_col).over(w)
    delta_s = epoch - F.lag(epoch).over(w)
    # both lags in one projection -> a single Window operator (one sort)
    return series.select(
        "*",
        delta_q.cast("long").alias("delta_q"),
        delta_s.cast("long").alias("delta_s"),
    ).withColumn(
        "rate_q",
        F.when(
            F.col("delta_s") > 0,
            F.floor(F.col("delta_q") * per_seconds / F.col("delta_s")),
        ).cast("long"),
    )


def interpolate_fill(
    sparse: DataFrame,
    dims: Sequence[str],
    start: dt.datetime,
    finish: dt.datetime,
    step_seconds: int,
    ts_col: str = "ts",
    q_col: str = "q",
) -> DataFrame:
    """Linear-interpolation gap fill: densify each series onto the
    ``[start, finish)`` grid (stride ``step_seconds``) and fill missing
    buckets on the straight line between their nearest observations.

    Zero-fill (reference fill-range, query.clj:99-108) answers "how many
    events happened" — correct for counters, wrong for gauge-like
    measures where absence means "not sampled". This is the gauge
    counterpart: interior gaps interpolate, edges carry the nearest
    observation flat (a documented choice: extrapolating a trend past
    the data fabricates slope).

    All arithmetic is integer: with bucket indexes ``i`` and quantized
    values ``q``, an interior gap fills to
    ``prev_q + floor((next_q - prev_q) * (i - prev_i) / (next_i -
    prev_i))``. The products stay far below 2^53, so the floored double
    division is exact and engine-portable.  Output: dims + ``ts`` +
    ``value_q`` (long) + ``observed`` flag.
    """
    spark = sparse.sparkSession
    n_buckets = int(
        (finish - start).total_seconds() // step_seconds
    )
    grid = spark.range(n_buckets).select(
        (F.lit(start).cast("timestamp")
         + F.col("id").cast("int") * F.expr(f"INTERVAL {step_seconds} SECOND")
         ).alias(ts_col),
        F.col("id").alias("i"),
    )
    keys = sparse.select(*dims).distinct()
    dense = keys.join(F.broadcast(grid)).join(
        sparse.select(*dims, ts_col, q_col), [*dims, ts_col], "left"
    )
    w_back = (
        Window.partitionBy(*dims)
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*dims)
        .orderBy("i")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_i = F.when(F.col(q_col).isNotNull(), F.col("i"))
    filled = (
        dense.withColumn("pq", F.last(q_col, ignorenulls=True).over(w_back))
        .withColumn("pi", F.last(obs_i, ignorenulls=True).over(w_back))
        .withColumn("nq", F.first(q_col, ignorenulls=True).over(w_fwd))
        .withColumn("ni", F.first(obs_i, ignorenulls=True).over(w_fwd))
    )
    interior = F.col("pq") + F.floor(
        (F.col("nq") - F.col("pq"))
        * (F.col("i") - F.col("pi"))
        / (F.col("ni") - F.col("pi"))
    )
    value_q = (
        F.when(F.col(q_col).isNotNull(), F.col(q_col))
        .when(F.col("pq").isNull(), F.col("nq"))  # before first obs
        .when(F.col("nq").isNull(), F.col("pq"))  # after last obs
        .otherwise(interior)
    )
    return filled.select(
        *dims,
        F.col(ts_col),
        value_q.cast("long").alias("value_q"),
        F.col(q_col).isNotNull().alias("observed"),
    )


def anomaly_zscore(
    series: DataFrame,
    dims: Sequence[str],
    ts_col: str = "ts",
    q_col: str = "q",
    lookback: int = 20,
    min_points: int = 5,
    z_threshold: int = 3,
    order_col: str | None = None,
) -> DataFrame:
    """Trailing-window z-score anomaly flags per series, in EXACT
    integer arithmetic — the alerting layer over a collapse/fill-range
    output (reference read path ends at query.clj:99-117; anomaly
    marking is the first thing a monitoring consumer does next).

    Each observation is compared against the ``lookback`` observations
    BEFORE it (the current row is excluded from its own baseline — a
    spike must not dilute the statistics that judge it). With the
    quantized value ``x`` and the frame's count/sum/sum-of-squares
    ``(n, s, ss)``, the flag is the squared z-score test

        ``(n*x - s)^2 * (n - 1)  >  z^2 * n * (n*ss - s^2)``

    which is ``((x - mean) / sample_stddev)^2 > z^2`` cleared of
    divisions and square roots: every operand is a BIGINT product of
    quantized longs, so Spark and any SQL engine agree bit-for-bit —
    ``stddev_samp`` itself is NOT portable (Welford vs naive summation
    differ in float rounding). Magnitudes: with |x| <= 2^20 (x1000
    quantization of values up to ~1e3) and lookback <= 64, every
    product stays below 2^53.

    Rows with fewer than ``min_points`` predecessors are emitted with
    ``is_anomaly`` NULL (insufficient baseline), never false-flagged.
    Output: input columns + ``base_n``, ``base_sum`` and
    ``is_anomaly`` (long 0/1, NULL when under-baselined).

    Scale shape: ONE window pass — a single exchange on ``dims`` and a
    single sort; the row frame keeps a sliding accumulator, so cost is
    O(rows) per partition regardless of lookback. Ties on ``ts`` are
    ordered by ``order_col`` (default ``q_col``) so the frame is
    deterministic in every engine.
    """
    order_col = order_col or q_col
    w = (
        Window.partitionBy(*dims)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(-lookback, -1)
    )
    x = F.col(q_col).cast("long")
    n = F.count(q_col).over(w).cast("long")
    s = F.sum(x).over(w).cast("long")
    ss = F.sum(x * x).over(w).cast("long")
    # one .select -> all three frame aggregates share one Window operator
    framed = series.select(
        "*", n.alias("base_n"), s.alias("base_sum"), ss.alias("_base_ss")
    )
    nn, sm, sq = F.col("base_n"), F.col("base_sum"), F.col("_base_ss")
    dev = nn * x - sm
    flag = F.when(
        nn >= min_points,
        (
            dev * dev * (nn - 1)
            > F.lit(z_threshold * z_threshold) * nn * (nn * sq - sm * sm)
        ).cast("long"),
    )
    return framed.withColumn("is_anomaly", flag).drop("_base_ss")


def grouped_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    val_col: str,
    percents: Sequence[int] = (50, 90, 99),
    order_col: str | None = None,
) -> DataFrame:
    """Exact per-group percentiles by RANK SELECTION: the value at row
    ceil(p/100 * n) of the group's sorted order — the discrete
    ("nearest-rank") percentile definition every engine reproduces
    bit-for-bit on integer data. Interpolating percentile functions
    (Spark ``percentile``, DuckDB ``quantile_cont``) average in
    doubles and are NOT used: the interpolation arithmetic is where
    cross-engine drift lives.

    Output: one row per group — (*keys, n_rows, p<P> for each P).

    Shape: one window pass per group (row_number + count over the same
    sort — a single exchange + sort), then a pivot-free conditional
    aggregation; group size never funnels through the driver. Ties in
    ``val_col`` are broken by ``order_col`` (default: the first key —
    pass an id column for full determinism when values repeat; the
    SELECTED VALUE is deterministic either way, the tiebreak only fixes
    which row carries it).
    """
    from pyspark.sql import Window

    order_col = order_col or keys[0]
    w = Window.partitionBy(*keys).orderBy(
        F.col(val_col), F.col(order_col)
    )
    wc = Window.partitionBy(*keys)
    ranked = df.select(
        *[F.col(k) for k in keys],
        F.col(val_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n_rows")]
    for p in percents:
        target = ceil_div(F.col("_n") * p, F.lit(100))
        aggs.append(
            F.max(F.when(F.col("_rn") == target, F.col(val_col)))
            .cast("long")
            .alias(f"p{p}")
        )
    return ranked.groupBy(*keys).agg(*aggs)


def m4_downsample(
    series: DataFrame,
    dims: Sequence[str],
    bucket_seconds: int,
    ts_col: str = "ts",
    q_col: str = "q",
    id_col: str = "id",
) -> DataFrame:
    """M4 downsampling: per series and time bucket, the four values a
    pixel-perfect line rendering needs — min, max, first and last — in
    ONE hash aggregate (the M4 aggregation of Jugel et al., VLDB'14;
    the reference stops at collapse's single aggregate per bucket,
    query.clj:86-97, which distorts extremes — M4 is the read-path
    operator a dashboard actually wants at raw-data zoom levels).

    first/last use ``min_by``/``max_by`` on a composite BIGINT ordering
    key ``epoch * 2^31 + id`` — a scalar (not a struct: struct-ordered
    arg-min exists in Spark but not in every engine) that totally
    orders observations even when timestamps collide, so the selected
    row is deterministic everywhere. Bounds: epoch < 2^32 (until 2106)
    and ``0 <= id < 2^31`` keep the key inside ``long``.

    Scale shape: a single partial-aggregated groupBy — map-side each
    task reduces its input to at most one row per (series, bucket)
    before the exchange, so the shuffle carries the downsampled volume
    (rows / bucket_width), not the raw volume. No window, no sort.
    Output: dims + ``bucket_ts`` + ``n_obs, min_q, max_q, first_q,
    last_q`` (all long).
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    bucket = F.timestamp_seconds(
        F.floor(epoch / bucket_seconds) * bucket_seconds
    )
    ordk = epoch * F.lit(2_147_483_648) + F.col(id_col)
    x = F.col(q_col)
    return (
        series.select(
            *dims, bucket.alias("bucket_ts"), x.alias("_q"), ordk.alias("_o")
        )
        .groupBy(*dims, "bucket_ts")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.min("_q").cast("long").alias("min_q"),
            F.max("_q").cast("long").alias("max_q"),
            F.min_by("_q", F.col("_o")).cast("long").alias("first_q"),
            F.max_by("_q", F.col("_o")).cast("long").alias("last_q"),
        )
    )


def ewma_trunc(
    series: DataFrame,
    dims: Sequence[str],
    ts_col: str = "ts",
    q_col: str = "q",
    n_lags: int = 8,
    order_col: str | None = None,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per series with
    half-per-step decay: each observation's smoothed value is the
    weighted mean of itself and its ``n_lags - 1`` predecessors, the
    j-th-newest weighted ``2^(n_lags-1-j)`` — EXACT integer arithmetic
    (weights are powers of two, the only division is one final floor),
    so the result is bit-identical in any engine, unlike a recursive
    float EWMA whose rounding error depends on series length and
    summation order.

    Truncation is the scale decision: a true infinite-horizon EWMA is
    inherently sequential (each value depends on the full prefix — on
    a cluster that means one pass per series with no intra-series
    parallelism), while the K-term window is a frame aggregate: one
    window pass, one exchange on ``dims``, O(K) per row. With weights
    halving per step the dropped tail carries < 2^-K of the mass, so
    K=8 already bounds the truncation error at 0.4% of the exact EWMA.

    Early rows (fewer than K predecessors) renormalize over the
    weights actually present — the standard "adjusted" EWMA start, not
    a zero-padded bias. Magnitudes: |q| * 2^K must stay under 2^62;
    with x1000 quantization (|q| <= 2^20) any K <= 40 is safe.

    Output: input columns + ``ewma_q`` (long, floored weighted mean).
    Ties on ``ts`` order by ``order_col`` (default ``q_col``) so every
    engine sees the same lag sequence.
    """
    if not 1 <= n_lags <= 40:
        # 0 lags would floor-divide 0/0 into silent NULLs; past 40 the
        # weight products leave the documented 2^62 safety margin —
        # same guard as the streaming twin
        raise ValueError(f"n_lags must be in [1, 40], got {n_lags}")
    order_col = order_col or q_col
    w = Window.partitionBy(*dims).orderBy(F.col(ts_col), F.col(order_col))
    x = F.col(q_col).cast("long")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(n_lags):
        weight = 1 << (n_lags - 1 - j)
        lagged = x if j == 0 else F.lag(x, j).over(w)
        num = num + F.coalesce(lagged * weight, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(0)
    # exact integer floor division (see floor_div): floor(num/den) in
    # doubles would round num above 2^53 and diverge from the
    # streaming twin's exact Python `//`
    # one .select -> all lag expressions share one Window operator
    return series.select(
        "*", floor_div(num, den).cast("long").alias("ewma_q")
    )


def gap_detect(
    series: DataFrame,
    dims: Sequence[str],
    threshold_seconds: int,
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Silence detection per series: every pair of consecutive
    observations further apart than ``threshold_seconds`` becomes one
    gap row — the monitoring question ("when did this series stop
    reporting?") that zero-filled collapse output (query.clj:99-108)
    answers only implicitly as runs of filler values, at grid
    resolution and grid cost. This reads the raw series: one lag
    window + a filter, emits only the gaps.

    Scale shape: one exchange on ``dims``, one sort, O(rows) — no
    densification, so a year-long silence costs one output row, not
    31M grid rows. Output: dims + ``gap_start``, ``gap_end``
    (timestamps), ``gap_s`` (long elapsed seconds).

    Ties on ``ts`` order by ``order_col`` (default: the timestamp
    itself — duplicates yield a zero gap and can never pass the
    threshold, so the tiebreak cannot change the result, only the
    internal row order).
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    order_cols = [epoch]
    if order_col:
        order_cols.append(F.col(order_col))
    w = Window.partitionBy(*dims).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    out = series.select(
        *dims,
        prev_ts.alias("gap_start"),
        F.col(ts_col).alias("gap_end"),
        (epoch - F.unix_timestamp(prev_ts)).cast("long").alias("gap_s"),
    )
    return out.where(F.col("gap_s") > threshold_seconds)


def trend_slope(
    series: DataFrame,
    dims: Sequence[str],
    bucket_seconds: int = 3600,
    ts_col: str = "ts",
    q_col: str = "q",
) -> DataFrame:
    """Per-series OLS trend over BUCKET MEANS, in exact integer
    arithmetic: "is this metric drifting, and how fast" — the
    regression companion to rate() (instantaneous) and ewma
    (smoothing).

    Scale design: the regression never runs over raw observations —
    each series first collapses to per-bucket floored means (one
    partial-aggregated exchange; the raw volume disappears here), and
    the slope is fitted over (bucket index t, mean y) pairs, so the
    fit size is bounded by the OBSERVATION WINDOW (e.g. <= 720 hourly
    buckets per month) no matter how many raw rows a series has. That
    bound is also what keeps the closed-form sums exact: with t <=
    ~10^3 and |y| <= ~10^6 (x1000 quantization), every term of

        slope = (n * S_ty - S_t * S_y) / (n * S_t2 - S_t^2)

    stays far inside BIGINT. The slope is emitted as the EXACT
    (numerator, denominator) pair — per-bucket y-units x1000 per
    bucket — because no fixed decimal scaling of num/den survives all
    magnitudes exactly; callers divide (den is 0 for single-bucket
    series: emitted NULL-safe as-is, slope undefined). Bucket indexes
    are group-relative (min-bucket window over the same exchange the
    mean aggregate uses), so absolute epochs never inflate t.

    Output: dims + n_buckets + slope_num + slope_den (all long).
    """
    bidx = F.floor(
        F.unix_timestamp(F.col(ts_col)) / bucket_seconds
    ).cast("long")
    per = (
        series.select(*dims, bidx.alias("_b"), F.col(q_col).alias("_q"))
        .groupBy(*dims, "_b")
        .agg(
            floor_div(F.sum("_q"), F.count(F.lit(1))).alias("_y"),
        )
    )
    wmin = Window.partitionBy(*dims)
    rel = per.select(
        *dims,
        (F.col("_b") - F.min("_b").over(wmin)).alias("_t"),
        "_y",
    )
    agg = rel.groupBy(*dims).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_t").cast("long").alias("_st"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_t") * F.col("_y")).cast("long").alias("_sty"),
        F.sum(F.col("_t") * F.col("_t")).cast("long").alias("_st2"),
    )
    return agg.select(
        *dims,
        "n_buckets",
        (F.col("n_buckets") * F.col("_sty") - F.col("_st") * F.col("_sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n_buckets") * F.col("_st2") - F.col("_st") * F.col("_st"))
        .cast("long")
        .alias("slope_den"),
    )


def cusum(
    series: DataFrame,
    dims: Sequence[str],
    order_col: str,
    value_col: str,
    target_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided upper CUSUM statistic per series, in EXACT integer
    arithmetic — the classic changepoint / level-shift detector over a
    collapse output (the drift companion to the pointwise
    ``anomaly_zscore``: a z-score flags one wild bucket, CUSUM flags a
    small persistent shift that no single bucket would trip).

    The textbook recursion ``S_i = max(0, S_{i-1} + (x_i - k))``
    (``k`` = the per-series target/allowance, a column so callers can
    fit it with one aggregate) looks inherently sequential, but has the
    closed running-window form

        ``C_i = sum_{j<=i} (x_j - k)``
        ``S_i = C_i - min(0, min_{j<=i} C_j)``

    (induction on i: subtracting the running minimum of the cumulative
    deviation — floored at the virtual ``C_0 = 0`` — is exactly the
    reset-at-zero recursion). Both pieces are plain running-frame
    window aggregates, so the whole operator is ONE exchange on
    ``dims`` + one sort; the two chained Window operators share the
    (partitioning, ordering), so Catalyst plans a single sort and the
    frame accumulators are O(rows). All arithmetic on longs — Spark
    and any SQL engine agree bit-for-bit.

    ``order_col`` must be tie-free within ``dims`` (bucket indexes
    are); ``value_col`` / ``target_col`` must be integral.
    Output: input columns + ``out_col`` (long, >= 0).
    """
    w = (
        Window.partitionBy(*dims)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    y = F.col(value_col).cast("long") - F.col(target_col).cast("long")
    cum = series.select("*", F.sum(y).over(w).alias("_cusum_c"))
    run_min = F.min("_cusum_c").over(w)
    return cum.select(
        "*",
        (
            F.col("_cusum_c")
            - F.least(F.lit(0).cast("long"), run_min)
        ).alias(out_col),
    ).drop("_cusum_c")


def holt_linear(
    series: DataFrame,
    dims: Sequence[str],
    ep_col: str = "ep",
    x_col: str = "x",
) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing per series —
    the level+trend recursion EWMA can't express: ``l_t = a*x_t +
    (1-a)(l_{t-1}+b_{t-1})``, ``b_t = g*(l_t-l_{t-1}) + (1-g)*b_{t-1}``
    with a = g = 1/2, init ``l_1 = x_1, b_1 = 0``.

    Exactness: halving a long is EXACT in binary floating point, so
    with a = g = 1/2 every step is one exact double division plus a
    truncation toward zero — bit-identical in any engine (Spark's
    double->BIGINT cast and an oracle's TRUNC agree; inputs stay far
    below 2^52). That is the whole reason for the fixed smoothing
    constants: a general alpha needs per-step float multiplies whose
    accumulated rounding is engine-dependent.

    Scale posture: the recursion is inherently sequential per series
    (each state depends on the full prefix), so unlike
    :func:`ewma_trunc` (a bounded window aggregate) this runs as ONE
    ordered array fold per series — ``collect_list`` into a sorted
    in-memory array, then ``aggregate`` inside codegen. Right-size the
    series grain accordingly: smooth per (dims, bounded-time-window)
    at web scale so a series fits an executor (the same contract as
    the pack/BPE array stages). Parallelism is across series.

    Input: one row per (dims, ep) with ``x_col`` the x1e6-scaled
    long observation. Output: (dims, ep, x, level_x1e6, trend_x1e6).
    """
    step_l = "CAST((s.x + acc.l + acc.b) / 2.0D AS BIGINT)"
    step_b = f"CAST(({step_l} - acc.l + acc.b) / 2.0D AS BIGINT)"
    fold = f"""
aggregate(
  slice(series, 2, greatest(size(series) - 1, 0)),
  named_struct(
    'l', series[0].x, 'b', CAST(0 AS BIGINT),
    'out', array(named_struct('ep', series[0].ep, 'x', series[0].x,
                              'l', series[0].x, 'b', CAST(0 AS BIGINT)))),
  (acc, s) -> named_struct(
    'l', {step_l},
    'b', {step_b},
    'out', concat(acc.out, array(named_struct(
        'ep', s.ep, 'x', s.x, 'l', {step_l}, 'b', {step_b})))),
  acc -> acc.out)
"""
    packed = (
        series.select(
            *dims,
            F.struct(
                F.col(ep_col).cast("long").alias("ep"),
                F.col(x_col).cast("long").alias("x"),
            ).alias("_obs"),
        )
        .groupBy(*dims)
        .agg(F.array_sort(F.collect_list("_obs")).alias("series"))
    )
    return packed.select(
        *dims, F.explode(F.expr(fold)).alias("_s")
    ).select(
        *dims,
        F.col("_s.ep").alias(ep_col),
        F.col("_s.x").alias(x_col),
        F.col("_s.l").alias("level_x1e6"),
        F.col("_s.b").alias("trend_x1e6"),
    )


def _hw_fold(m: int, finish: str) -> str:
    """Shared Holt-Winters fold expression (see :func:`holt_winters`).

    ``finish`` is the aggregate's finish lambda body applied to the
    final accumulator (``acc.out`` for the per-step rows, a final-state
    struct for forecasting). State: (l, b, s[m] seasonal ring, t).
    At step t (1-based, t > m) the seasonal read/written slot is the
    0-based ring index ``acc.t % m`` — the slot holds s_{t-m} before
    the step and s_t after it.
    """
    j0 = f"CAST(acc.t % {m} AS INT)"
    sm = f"element_at(acc.s, {j0} + 1)"
    step_l = f"CAST((s.x - {sm} + acc.l + acc.b) / 2.0D AS BIGINT)"
    step_b = f"CAST(({step_l} - acc.l + acc.b) / 2.0D AS BIGINT)"
    step_s = f"CAST((s.x - {step_l} + {sm}) / 2.0D AS BIGINT)"
    news = (
        f"concat(slice(acc.s, 1, {j0}), array({step_s}), "
        f"slice(acc.s, {j0} + 2, {m} - {j0} - 1))"
    )
    return f"""
aggregate(
  slice(series, {m} + 1, size(series) - {m}),
  named_struct(
    'l', _l0, 'b', CAST(0 AS BIGINT), 's', _sinit,
    't', CAST({m} AS BIGINT),
    'out', slice(transform(series, o -> named_struct(
        'ep', o.ep, 'x', o.x, 'l', _l0, 'b', CAST(0 AS BIGINT),
        'sv', CAST(0 AS BIGINT))), 1, 0)),
  (acc, s) -> named_struct(
    'l', {step_l},
    'b', {step_b},
    's', {news},
    't', acc.t + 1L,
    'out', concat(acc.out, array(named_struct(
        'ep', s.ep, 'x', s.x,
        'l', {step_l}, 'b', {step_b}, 'sv', {step_s})))),
  acc -> {finish})
"""


def _hw_packed(
    series: DataFrame,
    dims: Sequence[str],
    ep_col: str,
    x_col: str,
    m: int,
) -> DataFrame:
    """Pack, sort and initialize per-series state for Holt-Winters:
    one exchange on ``dims``; series with <= m observations are
    DROPPED (one full season is the initialization window, so there
    is nothing to smooth). ``_l0`` = floor(mean of the first season)
    — integer division of a nonnegative sum, identical in any engine
    — and ``_sinit`` the first season's deviations from it."""
    if m < 2:
        raise ValueError(f"holt_winters: season must be >= 2, got {m}")
    packed = (
        series.select(
            *dims,
            F.struct(
                F.col(ep_col).cast("long").alias("ep"),
                F.col(x_col).cast("long").alias("x"),
            ).alias("_obs"),
        )
        .groupBy(*dims)
        .agg(F.array_sort(F.collect_list("_obs")).alias("series"))
        .where(F.size("series") > m)
    )
    return packed.withColumn(
        "_l0",
        F.expr(
            f"aggregate(slice(series, 1, {m}), CAST(0 AS BIGINT),"
            " (a, o) -> a + o.x)"
            f" div {m}"
        ),
    ).withColumn(
        "_sinit",
        F.expr(f"transform(slice(series, 1, {m}), o -> o.x - _l0)"),
    )


def holt_winters(
    series: DataFrame,
    dims: Sequence[str],
    ep_col: str = "ep",
    x_col: str = "x",
    season: int = 24,
) -> DataFrame:
    """Holt-Winters ADDITIVE SEASONAL (triple exponential) smoothing
    per series — the seasonal recursion neither :func:`ewma_trunc`
    (bounded window) nor :func:`holt_linear` (level+trend only) can
    express::

        l_t = a*(x_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
        s_t = d*(x_t - l_t)     + (1-d)*s_{t-m}

    with a = g = d = 1/2 and season length m. Initialization is the
    textbook first-season rule in EXACT integer arithmetic:
    ``l_m = floor(sum(x_1..x_m) / m)`` (inputs are nonnegative
    fixed-point longs, so Spark's truncating ``div`` and an oracle's
    flooring ``//`` agree), ``b_m = 0``, ``s_i = x_i - l_m`` for
    i = 1..m. Smoothed rows are emitted for t > m only; series with
    <= m observations are dropped (nothing to smooth after the
    initialization season).

    Exactness: with all three constants at 1/2 every step is one
    exact double halving plus truncation toward zero (the
    :func:`holt_linear` argument, extended to the seasonal register:
    deviations x_t - l_t may be negative, so truncation-toward-zero
    on BOTH sides of zero is part of the contract). Bit-identical in
    any engine; magnitudes stay far below 2^52.

    Scale posture: inherently sequential per series, so it runs as
    ONE codegen array fold per series over the sorted packed array —
    exactly one hash exchange (the per-series collect_list), no join,
    no Python (plan-pinned). The seasonal state is a LENGTH-m RING
    updated in place by slice+concat (O(m) per step, m = 24 here —
    never the series length). Parallelism is across series: smooth
    per (dims, bounded-window) grain at web scale, the same contract
    as holt_linear.

    Input: one row per (dims, ep), ``x_col`` a nonnegative
    x1e6-scaled long. Output: (dims, ep, x, level_x1e6, trend_x1e6,
    seasonal_x1e6), rows t = m+1..n per series.
    """
    m = int(season)
    packed = _hw_packed(series, dims, ep_col, x_col, m)
    return packed.select(
        *dims, F.explode(F.expr(_hw_fold(m, "acc.out"))).alias("_s")
    ).select(
        *dims,
        F.col("_s.ep").alias(ep_col),
        F.col("_s.x").alias(x_col),
        F.col("_s.l").alias("level_x1e6"),
        F.col("_s.b").alias("trend_x1e6"),
        F.col("_s.sv").alias("seasonal_x1e6"),
    )


def holt_winters_forecast(
    series: DataFrame,
    dims: Sequence[str],
    ep_col: str = "ep",
    x_col: str = "x",
    season: int = 24,
    horizon: int = 3,
    step_seconds: int = 3600,
) -> DataFrame:
    """h-step-ahead Holt-Winters forecast per series — what the
    seasonal smoother is for: from each series' FINAL state
    (level, trend, seasonal ring) project::

        yhat(t+h) = l_t + h * b_t + s_{t+h-m}    for h = 1..horizon

    where ``s_{t+h-m}`` is read from the final ring at slot
    ``(t+h-1) mod m`` (valid for h <= m; this operator enforces
    ``horizon <= season``). The fold's finish lambda returns the
    final accumulator instead of the per-step rows, so the forecast
    adds NO second pass over the series — same single exchange, the
    horizon explode is a literal array.

    Output: dims + (forecast_ep, h, forecast_x1e6).
    """
    m = int(season)
    h = int(horizon)
    if h < 1 or h > m:
        raise ValueError(
            f"holt_winters_forecast: horizon must be in [1, {m}], got {h}"
        )
    finish = (
        "named_struct('l', acc.l, 'b', acc.b, 's', acc.s, 't', acc.t,"
        " 'ep', element_at(series, -1).ep)"
    )
    packed = _hw_packed(series, dims, ep_col, x_col, m)
    fin = packed.select(
        *dims, F.expr(_hw_fold(m, finish)).alias("_f")
    )
    return fin.select(
        *dims,
        F.col("_f.*"),
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in range(1, h + 1)])
        ).alias("h"),
    ).select(
        *dims,
        (F.col("ep") + F.col("h") * F.lit(step_seconds)).alias(
            "forecast_ep"
        ),
        "h",
        (
            F.col("l")
            + F.col("h") * F.col("b")
            + F.expr(f"element_at(s, CAST((t + h - 1) % {m} AS INT) + 1)")
        )
        .cast("long")
        .alias("forecast_x1e6"),
    )


def classical_decompose(
    series: DataFrame,
    dims: Sequence[str],
    ep_col: str = "ep",
    x_col: str = "x",
    season: int = 24,
    phase_seconds: int = 3600,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    textbook method, the non-recursive complement to
    :func:`holt_winters`): per series,

    * ``trend``    = the standard 2x``m`` centered moving average for
      even ``m`` — ``(sum(x[t-m/2 .. t+m/2-1]) + sum(x[t-m/2+1 ..
      t+m/2])) div (2m)`` over OBSERVATION index (defined only where
      both windows are full);
    * ``seasonal`` = the per-(dims, phase) truncated mean of the
      detrended values, phase = (ep div phase_seconds) mod m — the
      wall-clock slot, robust to gaps;
    * ``residual`` = detrended - seasonal.

    All arithmetic is integer: window sums are long additions and
    every division is a truncating integer division (Spark ``div`` and
    an oracle's ``//`` both truncate toward zero — detrended values
    go NEGATIVE, so truncation symmetry is part of the contract; the
    raw per-phase means are NOT re-centered to sum zero, which keeps
    the whole operator division-bounded and engine-exact).

    Plan shape: one exchange on ``dims`` shared by the index window
    and the two framed sums; the seasonal means are one
    (dims, phase) aggregation joined back broadcast-sized (m rows per
    series). No recursion, no Python.

    Output: dims + (ep, x, trend, seasonal, residual) for rows where
    the centered window is full.
    """
    m = int(season)
    if m < 2 or m % 2 != 0:
        raise ValueError(
            f"classical_decompose: season must be even and >= 2, got {m}"
        )
    h = m // 2
    w = Window.partitionBy(*dims).orderBy(F.col(ep_col))
    wa = w.rowsBetween(-h, h - 1)
    wb = w.rowsBetween(-h + 1, h)
    wn = Window.partitionBy(*dims)
    x = F.col(x_col).cast("long")
    idx = series.select(
        *dims,
        F.col(ep_col).cast("long").alias(ep_col),
        x.alias("_x"),
        F.row_number().over(w).cast("long").alias("_t"),
        F.count(F.lit(1)).over(wn).cast("long").alias("_n"),
        F.sum(x).over(wa).alias("_sa"),
        F.sum(x).over(wb).alias("_sb"),
    )
    trended = idx.where(
        (F.col("_t") > h) & (F.col("_t") <= F.col("_n") - h)
    ).select(
        *dims,
        ep_col,
        "_x",
        F.expr(f"(_sa + _sb) div {2 * m}").alias("_trend"),
    ).withColumn("_det", F.col("_x") - F.col("_trend")).withColumn(
        "_phase",
        F.expr(f"(({ep_col} div {phase_seconds}) % {m})").cast("long"),
    )
    seas = trended.groupBy(*dims, "_phase").agg(
        F.expr("sum(_det) div count(1)").alias("_seas")
    )
    return trended.join(seas, [*dims, "_phase"]).select(
        *dims,
        ep_col,
        F.col("_x").alias(x_col),
        F.col("_trend").alias("trend_x1e6"),
        F.col("_seas").alias("seasonal_x1e6"),
        (F.col("_det") - F.col("_seas")).cast("long").alias(
            "residual_x1e6"
        ),
    )


def robust_stats(
    df: DataFrame,
    dims: Sequence[str],
    x_col: str,
    id_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """EXACT robust location/scale statistics per group — median,
    ``trim_pct``%-trimmed mean and MAD (median absolute deviation) —
    the outlier-resistant profile a corpus-quality dashboard wants
    where plain mean/stddev follow the heavy tail. All integer
    arithmetic on rank statistics, never a float quantile estimate:

    * ``median_x2``   = the sum of the two middle order statistics
      (equals 2x the usual median; odd n counts the middle twice);
    * ``trim_mean``   = floor(sum / count) over ranks in
      (k, n-k], k = n * trim_pct // 100;
    * ``mad_x4``      = median (x2) of |2*x - median_x2| (itself x2) —
      deviations from the EXACT possibly-half-integer median.

    Plan shape: one exchange on ``dims`` feeds a rank window; the MAD
    pass re-windows the same partitioning (Catalyst reuses the
    exchange), and the per-group medians ride back as a broadcast
    (one row per group). Ranks tie-break on ``id_col`` so both engines
    order identically. At web scale an exact global rank per group is
    one sort per group-partition — for hot groups pre-bucket by dims
    or switch to the histogram-rank lookup (text_len_hist_quantiles'
    pattern); this operator is the exact form.

    Output: dims + (n_docs, median_x2, trim_mean, mad_x4).
    """
    x = F.col(x_col).cast("long")
    w = Window.partitionBy(*dims).orderBy(x, F.col(id_col))
    wc = Window.partitionBy(*dims)
    ranked = df.select(
        *dims,
        x.alias("_x"),
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("_n"),
    )
    lo_mid = (F.col("_n") + 1) / F.lit(2)  # (n+1)//2 for positive n
    med = (
        ranked.where(
            (F.col("_rn") == F.floor(lo_mid))
            | (F.col("_rn") == F.floor((F.col("_n") + 2) / F.lit(2)))
        )
        .groupBy(*dims)
        .agg(
            F.max("_n").alias("n_docs"),
            # odd n: the two rank predicates coincide -> count the
            # middle twice; even n: sum of the two middles
            (F.sum("_x") * F.when(F.count(F.lit(1)) == 1, 2).otherwise(1))
            .cast("long")
            .alias("median_x2"),
        )
    )
    k = F.expr(f"_n * {int(trim_pct)} div 100")
    trim = (
        ranked.where((F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k))
        .groupBy(*dims)
        .agg(
            floor_div(F.sum("_x"), F.count(F.lit(1)))
            .cast("long")
            .alias("trim_mean"),
        )
    )
    dev = ranked.join(F.broadcast(med), list(dims)).select(
        *dims,
        F.abs(F.col("_x") * 2 - F.col("median_x2")).alias("_d"),
    )
    wd = Window.partitionBy(*dims).orderBy(F.col("_d"))
    wdc = Window.partitionBy(*dims)
    mad = (
        dev.select(
            *dims,
            "_d",
            F.row_number().over(wd).cast("long").alias("_rn"),
            F.count(F.lit(1)).over(wdc).cast("long").alias("_n"),
        )
        .where(
            (F.col("_rn") == F.floor((F.col("_n") + 1) / F.lit(2)))
            | (F.col("_rn") == F.floor((F.col("_n") + 2) / F.lit(2)))
        )
        .groupBy(*dims)
        .agg(
            (F.sum("_d") * F.when(F.count(F.lit(1)) == 1, 2).otherwise(1))
            .cast("long")
            .alias("mad_x4"),
        )
    )
    return med.join(trim, list(dims)).join(mad, list(dims))


def dtw_distance(x, y):
    """Dynamic-time-warping distance between two BIGINT array columns
    (Sakoe & Chiba 1978; Berndt & Clifford 1994 for the data-mining
    form) — the sequence-similarity measure that tolerates local time
    shifts a lockstep metric (Euclidean / the Pearson components of
    series_correlation) cannot: two series with the same shape offset
    by a day still score close.

    The full O(n*m) DP runs as ONE whole-stage-codegen expression —
    a nested array fold: the outer ``aggregate`` carries the previous
    DP row (array<long>) across the first series' elements, the inner
    ``aggregate`` builds each new row left to right (the in-row
    dependency D[i][j-1] rides the inner accumulator's tail). Costs
    are integer |x_i - y_j|, so every cell is exact BIGINT arithmetic
    — bit-identical to the DuckDB oracle's identical nested
    ``list_reduce`` and to a pure-Python model (property-tested).

    Scale shape: the DP is per-ROW-PAIR, embarrassingly parallel
    across pairs, and each series' length is bounded by the grain and
    retention horizon (days per series), never by corpus size — the
    canonical way to run quadratic sequence alignment inside a
    columnar engine without a shuffle or a Python UDF. Unbounded
    series should be PAA-compressed first (ts_sax_daily's grain) —
    the standard practice at scale.

    Returns a Column: DTW(x, y) as long. Empty inputs are the
    caller's contract to exclude (a zero-length series has no DP).
    """
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y

    def cost(xi, yj):
        return F.abs(xi - yj)

    # row 0: cumulative costs of x[1] against y prefix
    row0 = F.aggregate(
        F.filter(
            F.sequence(F.lit(1), F.size(y)), lambda j: j > F.lit(1)
        ),
        F.array(cost(F.element_at(x, 1), F.element_at(y, 1))),
        lambda acc, j: F.concat(
            acc,
            F.array(
                cost(F.element_at(x, 1), F.element_at(y, j))
                + F.element_at(acc, -1)
            ),
        ),
    )
    final_row = F.aggregate(
        F.filter(
            F.sequence(F.lit(1), F.size(x)), lambda i: i > F.lit(1)
        ),
        row0,
        lambda prev, i: F.aggregate(
            F.filter(
                F.sequence(F.lit(1), F.size(y)), lambda j: j > F.lit(1)
            ),
            F.array(
                F.element_at(prev, 1)
                + cost(F.element_at(x, i), F.element_at(y, 1))
            ),
            lambda acc, j: F.concat(
                acc,
                F.array(
                    cost(F.element_at(x, i), F.element_at(y, j))
                    + F.least(
                        F.element_at(prev, j),
                        F.element_at(prev, j - F.lit(1)),
                        F.element_at(acc, -1),
                    )
                ),
            ),
        ),
    )
    return F.element_at(final_row, -1).cast("long")
