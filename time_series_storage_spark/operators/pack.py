"""Sequence packing: assign documents to fixed token-budget training
bins — the step between a curated corpus and an LLM pretraining
dataloader (documents are concatenated into ~context-length sequences
so no batch slot is wasted on padding).

Semantics: CONTIGUOUS CUMULATIVE packing. Within each packing group,
documents are laid out in a deterministic order and the running token
total is cut into ``budget``-sized bins: a document whose cumulative
START offset falls in bin ``b`` belongs to bin ``b``
(``bin = floor(cumsum_exclusive / budget)``). A document may straddle
a boundary — exactly the standard pretraining practice of splitting /
truncating at the context edge — so every bin except the group's last
holds >= ``budget`` tokens of content and starts within one document
of the boundary. This form is chosen deliberately over first-fit
bin-packing: first-fit's bin state is a sequential dependence that
cannot be expressed as a window (and on a 1000-executor cluster would
serialize per group), while the cumulative cut is ONE window sum, is
bit-deterministic in any engine, and wastes at most one document's
tail per bin.

Scale shape: one exchange on the packing group + one sort. Groups are
(source, shard) where ``shard = doc_id % n_shards``: bins never span
shards, so a source holding half a 100 TB corpus packs as ``n_shards``
independent partitions instead of one giant sorted task — the same
hot-key discipline as split.py's two-phase top-k. Determinism: shard
assignment and in-shard order derive only from ``doc_id``, so the
layout is stable across runs and engines.

All arithmetic is integer (token counts, floored division): exact in
Spark, DuckDB, and any ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_assignments(
    docs: DataFrame,
    budget: int,
    group_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 1,
    order_cols: tuple[str, ...] | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document bin assignment.

    ``order_cols`` (default ``(id_col,)``) is the in-shard layout
    order; pass a composite — e.g. ``("doc_id", "chunk_id")`` for
    chunked corpora — when no single column is unique. Order ties make
    ``start_off``/``bin_id`` engine-nondeterministic, so the composite
    must be a total order per (group, shard). Sharding always hashes
    ``id_col`` alone, so multi-row units (a doc's chunks) stay in one
    shard and bins never interleave units.

    ``extra_cols`` are payload columns carried through untouched (for
    callers that aggregate more than token counts per bin).

    Output: ``group_cols`` + ``shard`` + ``order_cols`` +
    ``tokens_col`` + ``extra_cols`` + ``start_off`` (cumulative
    exclusive token offset within the shard, long) + ``bin_id``
    (long, 0-based within (group, shard)).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if order_cols is None:
        order_cols = (id_col,)
    shard = (F.col(id_col) % n_shards).cast("long")
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    # ONE ordered de-duplicated projection spanning every column list —
    # a group column repeated in order_cols/extra_cols (or id_col in
    # group_cols) must not duplicate an output column, which would be an
    # AnalysisException at the first downstream reference
    carried = dict.fromkeys(
        (*group_cols, id_col, *order_cols, tokens_col, *extra_cols)
    )
    # integer floor division, not floor(a / b): `/` on longs is double
    # division (rounds past 2^53) — start_off at 100 TB-corpus scale is
    # a token count that can approach that
    bin_id = F.call_function(
        "div", F.col("start_off") - F.pmod(F.col("start_off"), F.lit(budget)),
        F.lit(budget),
    )
    return (
        docs.select(*carried)
        .withColumn("shard", shard)
        .withColumn("start_off", start)
        .withColumn("bin_id", bin_id)
    )


def pack_bins(
    docs: DataFrame,
    budget: int,
    group_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 1,
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-bin summary: how full each training bin is.

    Output: ``group_cols`` + ``shard`` + ``bin_id`` + ``n_docs`` +
    ``bin_tokens`` (sum of member documents' counts, long; interior
    bins carry >= budget by construction, the tail bin less). The
    aggregate reuses the assignment's partitioning (group, shard is a
    prefix of the window partitioning), so Catalyst plans the groupBy
    WITHOUT a second full exchange.
    """
    a = pack_assignments(
        docs, budget, group_cols, id_col, tokens_col, n_shards, order_cols
    )
    return a.groupBy(*group_cols, "shard", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("bin_tokens"),
    )
