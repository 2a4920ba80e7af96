"""Persisted INCREMENTAL duplicate-cluster store — connected
components maintained across daily ingests by reclustering ONLY the
affected components.

Batch clustering (``dedup.duplicate_clusters``) reruns CC over the
whole pair graph every day — O(corpus) however small the increment.
This store keeps two tables under the shared snapshot protocol:

* ``edge``  — the absorbed pair set (union-merge: one increment file
  per absorb, history hard-linked — the family's usual O(increment)
  commit);
* ``clu``   — cluster assignments as LATEST-WINS rows ``(node,
  cluster, _seq)``: each absorb appends only the nodes whose label it
  recomputed, stamped with the commit's monotone version number, and
  the read takes the max-``_seq`` row per node. Unaffected components
  are never rewritten, so commit size is O(affected), not O(corpus).

The incremental step is exact, not approximate: a new edge can only
change components it touches, and absorbing a batch reclusters the
FULL old membership of every touched component together with the new
nodes/edges — so min-label ids equal a from-scratch run over the
union graph (the gated query's oracle IS the from-scratch recursive
CTE). Inputs are validated loudly: a pair endpoint that is neither an
absorbed node nor in today's node set raises instead of silently
creating a label for a node the store never admitted.

Scale shape: the affected-cluster membership is small by construction
(near-dup components are shallow and the increment touches few), so
it broadcasts onto the edge scan; the latest-wins read is one rank
window over the changed-row log (``vacuum`` bounds snapshot count;
compact the log by absorbing an empty batch after major reshuffles if
it ever dominates). Exactly-once ``batch_id`` replay, store flock,
format stamp, crash-safe staging — all inherited from
:class:`~.dedup._SnapshotArtifactStore`.

Reference scope: the reference engine has no dedup surface (SURVEY.md
section 2.3); this extends the near-dup family's daily-ingest story
from pair DISCOVERY (NearDupStore) to cluster MAINTENANCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _SnapshotArtifactStore, connected_components


class ClusterStore(_SnapshotArtifactStore):
    FORMAT = 1
    _EMIT_COLS = ("cluster",)

    def __init__(self, spark, path: str):
        super().__init__(spark, path, ["cc-v1"], "ClusterStore")

    # -- reads ----------------------------------------------------------

    def edges(self) -> DataFrame:
        return self._table("edge", "a long, b long")

    def clusters(self) -> DataFrame:
        """The current assignment: latest-wins over the changed-row
        log — (node, cluster), every absorbed node present."""
        t = self._table("clu", "node long, cluster long, _seq long")
        w = Window.partitionBy("node").orderBy(F.col("_seq").desc())
        return (
            t.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "cluster")
        )

    # -- absorb ----------------------------------------------------------

    def absorb(
        self,
        new_nodes: DataFrame,
        new_pairs: DataFrame,
        id_col: str = "doc_id",
        batch_id: int | None = None,
    ) -> DataFrame:
        """Admit today's nodes and pair edges; recluster only the
        components they touch. ``new_pairs`` carries (d1, d2); every
        endpoint must be an absorbed node or in ``new_nodes``.
        Emission: (id, cluster) for today's nodes, under the
        exactly-once ``batch_id`` replay contract."""
        with self._locked():
            meta = self._store.current_meta(self.path)
            replay = self._replay_result(meta, batch_id, id_col)
            if replay is not None:
                return replay
            seq = 0 if meta is None else int(meta["version"][1:]) + 1
            cur = self.clusters()
            nodes = new_nodes.select(
                F.col(id_col).cast("long").alias("node")
            ).distinct()
            e = new_pairs.select(
                F.col("d1").cast("long").alias("a"),
                F.col("d2").cast("long").alias("b"),
            )
            ends = e.select("a").union(
                e.select(F.col("b").alias("a"))
            ).distinct().withColumnRenamed("a", "node")
            unknown = (
                ends.join(cur.select("node"), "node", "left_anti")
                .join(nodes, "node", "left_anti")
                .limit(5)
                .collect()
            )
            if unknown:
                raise ValueError(
                    f"{self.kind} at {self.path}: pair endpoints "
                    f"{sorted(r.node for r in unknown)} are neither "
                    "absorbed nodes nor in this batch's node set — "
                    "absorb nodes before (or with) their edges"
                )
            # full old membership of every touched component; small by
            # construction (the increment touches few components), so
            # it broadcasts onto the edge log scan
            affected = (
                cur.join(ends, "node").select("cluster").distinct()
            )
            members = cur.join(F.broadcast(affected), "cluster").select(
                "node", "cluster"
            )
            old_edges = self.edges().join(
                F.broadcast(members.select("node").withColumnRenamed(
                    "node", "a"
                )),
                "a",
                "left_semi",
            )
            sub_nodes = members.select("node").union(nodes).distinct()
            sub_edges = old_edges.select(
                F.col("a").alias("d1"), F.col("b").alias("d2")
            ).union(e.select(F.col("a").alias("d1"), F.col("b").alias("d2")))
            cc = connected_components(sub_edges, sub_nodes, "node")
            clu = cc.select(
                "node",
                F.col("cluster").cast("long").alias("cluster"),
                F.lit(seq).cast("long").alias("_seq"),
            )
            surv = nodes.join(cc, "node").select(
                F.col("node").alias("id"),
                F.col("cluster").cast("long").alias("cluster"),
            )
            return self._commit_increment(
                meta,
                [("surv", surv), ("edge", e), ("clu", clu)],
                id_col,
                batch_id,
            )

    def foreach_batch(self, pair_fn, id_col: str, emit):
        """Exactly-once ``foreachBatch``: ``pair_fn(batch_df) ->
        (d1, d2) pairs`` (e.g. a NearDupStore probe) feeds the absorb;
        ``emit(assignments_df, batch_id)`` receives the committed
        (id, cluster) emission."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            pairs = pair_fn(batch_df)
            out = self.absorb(
                batch_df, pairs, id_col, batch_id=int(batch_id)
            )
            emit(out, int(batch_id))

        return _fn
