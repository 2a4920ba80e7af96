"""Count-Min sketch — approximate FREQUENCIES in fixed space, the
counting counterpart to the distinct sketches (KMV in
operators/sketch.py, HLL in operators/hll.py).

Exact per-token counts at corpus scale shuffle one row per distinct
token — billions of rows for a 100 TB corpus, most of them the long
tail nobody asks about. The Count-Min sketch (Cormode & Muthukrishnan
2005) answers point-frequency queries ("how often does THIS token
occur?") from ``d x w`` integer counters: every occurrence increments
one counter per row (bucket = row-salted hash), and a point estimate
is the MIN over the d counters the token maps to. The one-sided error
guarantee is structural: every counter the token touches holds its
true count PLUS whatever collided into the bucket, so

    estimate >= true count            (always — never an undercount)
    estimate <= true + eps * N        (w.h.p.; eps = e/w)

Heavy hitters read directly off the sketch: any token whose true
count passes a threshold also passes it under the sketch (no false
negatives, the property that matters for frequency-capped dedup and
stop-list mining in curation pipelines).

Like every sketch in this repo the randomness is md5: bucket of
element e in row i is ``md5(i || ':' || e)`` folded into [0, w) — a
pure function of the data, so counters AND estimates are bit-identical
in Spark, DuckDB, or a hand scanner, and the driver gate hashes the
estimates themselves.

Scale shape: building is ONE partial-aggregated exchange of at most
``d * w`` rows per input partition (map-side combine over the salted
buckets); the finished sketch is ``d * w`` longs — BROADCASTABLE, so
probing any candidate set is a broadcast join + a d-way min, never a
shuffle of the corpus. The additive-merge store
(:class:`~.cms_store.CmsStore`) extends it to daily ingests: counter
tables are pure sums, so slice-wise addition equals the one-shot
sketch exactly.

Reference scope: the reference engine has no sketch surface (SURVEY.md
section 2.3); this completes the registry's sketch family (distinct:
KMV + HLL; frequency: CMS) for training-data-pipeline accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CMS_D = 4  # rows (independent hash functions)
CMS_W = 512  # buckets per row


def cms_bucket(row: int, col, w: int = CMS_W) -> Column:
    """Bucket of element ``col`` in sketch row ``row``: first 12 md5
    hex chars of the row-salted element, mod w."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), c)), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("int")


def cms_counters(
    elements: DataFrame, elem_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """The sketch itself: (i, b, c) counter rows — one count per
    (row, bucket) ever hit. At most ``d * w`` rows exist (2048 at the
    defaults): one partial-aggregated exchange, map-side combined, and
    the result broadcasts."""
    per_row = [
        elements.select(
            F.lit(i).alias("i"), cms_bucket(i, elem_col, w).alias("b")
        )
        for i in range(d)
    ]
    stacked = per_row[0]
    for nxt in per_row[1:]:
        stacked = stacked.unionByName(nxt)
    return stacked.groupBy("i", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    elem_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    est_col: str = "est_cnt",
) -> DataFrame:
    """Point-frequency estimates for a probe set: per probe row, the
    MIN over the d counters it maps to (absent counter = 0; can only
    happen for an element never absorbed). The counters frame is
    broadcast — probing never shuffles the probe set."""
    est = None
    for i in range(d):
        ci = counters.where(F.col("i") == i).select(
            F.col("b").alias(f"_b{i}"), F.col("c").alias(f"_c{i}")
        )
        probes = probes.withColumn(f"_b{i}", cms_bucket(i, elem_col, w))
        probes = probes.join(F.broadcast(ci), f"_b{i}", "left")
        term = F.coalesce(F.col(f"_c{i}"), F.lit(0))
        est = term if est is None else F.least(est, term)
    return probes.withColumn(est_col, est.cast("long")).drop(
        *[f"_b{i}" for i in range(d)], *[f"_c{i}" for i in range(d)]
    )


# ---------------------------------------------------------------------------
# SQL mirrors (oracle fragments — identical arithmetic in ANSI SQL)
# ---------------------------------------------------------------------------


def cms_bucket_sql(row: int, elem: str, w: int = CMS_W) -> str:
    return (
        f"(CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('{row}:', {elem})), 1, 12))"
        f" AS BIGINT) % {w})"
    )


def cms_counters_sql(rows: str, elem: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """Counter table over ``rows`` (a FROM-able fragment producing
    ``{elem}``): SELECT i, b, c."""
    parts = [
        f"SELECT {i} AS i, {cms_bucket_sql(i, elem, w)} AS b FROM {rows}"
        for i in range(d)
    ]
    return (
        "SELECT i, b, COUNT(*)::BIGINT AS c FROM ("
        + " UNION ALL ".join(parts)
        + ") hits GROUP BY i, b"
    )


def cms_estimate_sql(
    counters: str, probes: str, elem: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """Estimates over ``probes`` (fragment producing ``{elem}``): MIN
    over the d counters — mirrors :func:`cms_estimate`."""
    joins = []
    mins = []
    for i in range(d):
        joins.append(
            f"LEFT JOIN ({counters}) c{i} ON c{i}.i = {i} "
            f"AND c{i}.b = {cms_bucket_sql(i, f'p.{elem}', w)}"
        )
        mins.append(f"COALESCE(c{i}.c, 0)")
    return (
        f"SELECT p.*, LEAST({', '.join(mins)})::BIGINT AS est_cnt "
        f"FROM ({probes}) p " + " ".join(joins)
    )


def cms_join_estimate(
    counters_a: DataFrame, counters_b: DataFrame, d: int = CMS_D
) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches
    (Cormode & Muthukrishnan 2005, section 4.2): |A join B on key| =
    sum_k a_k * b_k, estimated per sketch row as the bucket-wise inner
    product sum_b A_i[b] * B_i[b] and combined with MIN over the d
    rows. Like the point estimate, each row's inner product is the
    TRUE join size plus non-negative collision cross terms, so the
    estimate NEVER undercounts — the one-sided guarantee a join
    planner wants when deciding whether a result fits a broadcast.

    This is the optimizer-statistics use of the sketch: two d x w
    counter tables (broadcast-sized by construction) answer the join
    size question without touching either input again — at 100 TB the
    alternative is the join itself.

    Magnitude bound (the hll.py discipline): each per-row product
    a_k*b_k and the row sum must fit int64. With w = 512 buckets a
    bucket holds ~N/512 occurrences, so the row sum is ~N_a*N_b/512;
    int64 overflows once N_a*N_b exceeds ~2^63*512 ~ 4.7e21 — i.e.
    when BOTH inputs approach ~7e10 occurrences. Inside the 100 TB
    regime, pre-scale one side's counters (divide by 2^s, multiply
    the estimate back) or widen to decimal before the product; the
    default geometry is documented-safe to ~10^10 occurrences per
    side.

    Output: one row, ``est_join`` (long)."""
    a = counters_a.select("i", "b", F.col("c").alias("_ca"))
    b = counters_b.select("i", "b", F.col("c").alias("_cb"))
    per_row = (
        a.join(b, ["i", "b"])
        .groupBy("i")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long").alias("_ip"))
    )
    rows = counters_a.sparkSession.range(d).select(
        F.col("id").cast("int").alias("i")
    )
    return (
        rows.join(per_row, "i", "left")
        .agg(
            F.min(F.coalesce(F.col("_ip"), F.lit(0)))
            .cast("long").alias("est_join")
        )
    )


def cms_join_estimate_sql(
    counters_a: str, counters_b: str, d: int = CMS_D
) -> str:
    """Oracle mirror of :func:`cms_join_estimate`: per-row bucket-wise
    inner products, MIN over all d rows with absent rows counting 0."""
    return f"""
SELECT MIN(COALESCE(ip, 0))::BIGINT AS est_join
FROM range({d}) r(i)
LEFT JOIN (
  SELECT a.i, SUM(a.c * b.c)::BIGINT AS ip
  FROM ({counters_a}) a JOIN ({counters_b}) b
    ON a.i = b.i AND a.b = b.b
  GROUP BY a.i) p ON p.i = r.i"""
