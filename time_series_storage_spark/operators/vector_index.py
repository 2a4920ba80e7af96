"""Persisted IVF vector index — the ANN coarse quantizer as a stored,
refreshed artifact instead of a per-query recomputation.

An IVF index has two parts: the codebook (``n_cells`` centroids) and
the corpus cell assignment (every vector labeled with its max-cosine
cell). Both are pure functions of the corpus, and both are *expensive*
functions — the assignment alone is a full corpus scan, and a
Lloyd-refined codebook multiplies that by the iteration count. Serving
queries by recomputing them is the one shape that cannot survive scale:
at 100 TB the assignment pass dwarfs every probe. The index must be
built once, stored, and only *read* at query time — exactly a
materialized rollup's lifecycle, so this store reuses the engine's
``VersionedStore`` snapshot-commit protocol (plans/materialize.py):

    <path>/_current                      {"version", "fingerprint", "params"}
    <path>/v00000003/centroids/*.parquet (cell_id, c_vec)  — tiny
    <path>/v00000003/assignment/cell_id=N/*.parquet        — corpus-sized
    <path>/v00000003/pqcodebook/*.parquet (s, code, cw)    — tiny, PQ only
    <path>/v00000003/pqcodes/cell_id=N/*.parquet           — corpus-sized /
                                                             ~16x smaller

The assignment tree is partitioned by ``cell_id``: the query path joins
it against a broadcast probe list on ``cell_id``, so Spark's dynamic
partition pruning restricts the scan to the probed cells' partitions —
each query physically reads ~``nprobe / n_cells`` of the index, the
on-disk realization of IVF's "only probe a few cells" promise.

Staleness: the committed pointer records a caller-supplied corpus
``fingerprint`` (e.g. a digest of the source files' names/sizes/mtimes,
:func:`files_fingerprint`) plus the build parameters;
``refresh_if_stale`` rebuilds only when either changed, and readers of
a live index are never disturbed — the rebuild publishes with the same
atomic ``_current`` flip as every other derived artifact here, and the
superseded version is RETAINED through the next flip (hard links make
that nearly free) so in-flight readers never lose their files.

The reference has no vector operations; this is infrastructure for the
similarity operators (operators/similarity.py), with build math
identical to the per-query path (fixed-point Lloyd refinement), so a
query served from the store is bit-for-bit the recomputed answer.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..plans.materialize import VersionedStore
from .similarity import (
    EMBED_DIM,
    IVF_CELLS,
    IVF_NPROBE,
    PQ_CODES,
    cosine,
    ivf_assign,
    ivf_centroids,
    ivf_kmeans_centroids,
    ivf_probe_topk,
    ivfpq_probe_topk,
    pq_encode,
    pq_kmeans_codebook,
)


def files_fingerprint(path: str) -> str:
    """Cheap corpus fingerprint for file-backed corpora: a digest of
    every data file's (relative name, size, mtime). Any append,
    rewrite, or compaction changes it; no data is read."""
    h = hashlib.sha256()
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        for dirpath, _dirs, files in sorted(os.walk(path)):
            rel = os.path.relpath(dirpath, path)
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                st = os.stat(os.path.join(dirpath, f))
                h.update(f"{rel}/{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:32]


class IvfIndexStore(VersionedStore):
    """One versioned IVF index (codebook + assignment) at ``path``,
    under the same store discipline as the snapshot-artifact family
    (dedup._SnapshotArtifactStore): a FORMAT stamp rides every commit
    and is validated on open (a store written by incompatible code is
    refused loudly), every write sequence — replay check, staging
    sweep, Spark writes, rename, pointer flip — runs under one
    exclusive store-path flock (concurrent writers SERIALIZE; the
    single-writer contract lives in the store, not in caller
    conventions), and superseded versions are RETAINED for
    ``KEEP_VERSIONS`` flips before GC so a reader mid-query on the
    previous version never hits FileNotFound during the daily absorb
    cadence (hard links make retention nearly free; ``vacuum``
    reclaims explicitly)."""

    # bump on any change to the persisted layout or meta contract;
    # validated on open so old-layout stores fail loudly
    FORMAT = 1
    # versions retained after each publish (current + N-1 previous):
    # serve-while-ingest readers of the previous version stay valid
    # across one absorb/compact flip
    KEEP_VERSIONS = 2

    # test hook: callable(stage) invoked at build checkpoints
    # ("after_centroids", "after_assignment", "after_rename") so crash
    # recovery is provable at every boundary (tests/test_vector_index.py)
    _build_fault = None

    def __init__(self, spark, path: str):
        super().__init__(spark, path)
        meta = self.current_meta(path)
        if meta is not None and meta.get("format", 0) != self.FORMAT:
            raise ValueError(
                f"IVF index at {path} has store format "
                f"{meta.get('format', 0)} but this code writes format "
                f"{self.FORMAT}; rebuild the index — reopening would "
                "silently break the version/replay contract"
            )

    def _fault(self, stage: str) -> None:
        if self._build_fault is not None:
            self._build_fault(stage)

    def _locked(self):
        """Exclusive store-level lock held across a whole write
        sequence (mirrors _SnapshotArtifactStore._locked): two
        concurrent absorbs/compacts on one index path serialize
        instead of sweeping each other's in-flight ``.staging-*``
        dirs or double-committing one version number. flock is
        advisory-but-atomic on every POSIX filesystem this runs on;
        the fd closes (releasing the lock) when the context exits."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            os.makedirs(self.path, exist_ok=True)
            with open(os.path.join(self.path, ".lock"), "w") as fh:
                with contextlib.suppress(ImportError):
                    import fcntl

                    fcntl.flock(fh, fcntl.LOCK_EX)
                yield

        return _ctx()

    def _publish(self, version: str, extra: Optional[dict] = None) -> None:
        """Atomic pointer flip + RETAINING GC: keep the newest
        ``KEEP_VERSIONS`` version dirs (always including ``version``)
        instead of the base class's delete-all-others — readers that
        resolved ``_current`` just before the flip keep a complete
        version on disk through the next flip."""
        meta = dict(extra or {})
        meta["format"] = self.FORMAT
        meta["version"] = version
        import json

        tmp = os.path.join(self.path, self.CURRENT + "._tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(self.path, self.CURRENT))
        versions = sorted(
            n
            for n in os.listdir(self.path)
            if n.startswith("v") and os.path.isdir(os.path.join(self.path, n))
        )
        keep = set(versions[-self.KEEP_VERSIONS:]) | {version}
        for name in versions:
            if name not in keep:
                shutil.rmtree(
                    os.path.join(self.path, name), ignore_errors=True
                )

    def vacuum(self, keep: int = 1) -> list[str]:
        """Remove all but the newest ``keep`` version dirs (never the
        current one). Returns the removed names."""
        with self._locked():
            meta = self._meta()
            current = meta["version"] if meta else None
            versions = sorted(
                n
                for n in os.listdir(self.path)
                if n.startswith("v")
                and os.path.isdir(os.path.join(self.path, n))
            )
            keep_set = set(versions[-max(keep, 1):])
            if current:
                keep_set.add(current)
            removed = []
            for name in versions:
                if name not in keep_set:
                    shutil.rmtree(
                        os.path.join(self.path, name), ignore_errors=True
                    )
                    removed.append(name)
            return removed

    def _meta(self) -> Optional[dict]:
        return self.current_meta(self.path)

    def _version_dir(self) -> Optional[str]:
        meta = self._meta()
        if meta is None:
            return None
        d = os.path.join(self.path, meta["version"])
        return d if os.path.exists(d) else None

    def exists(self) -> bool:
        return self._version_dir() is not None

    # -- build ------------------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = IVF_CELLS,
        kmeans_iters: int = 0,
        fingerprint: Optional[str] = None,
        pq_m: Optional[int] = None,
        pq_codes: int = PQ_CODES,
        pq_iters: int = 2,
    ) -> str:
        """Build and atomically publish the next index version.

        One assignment pass over the corpus (broadcast centroids +
        per-vector argmax), written partitioned by ``cell_id``; the
        codebook itself is ``n_cells`` rows. Returns the version id.

        ``pq_m`` switches on PRODUCT QUANTIZATION (IVF-PQ, Jegou et
        al. TPAMI'11): a per-subspace fixed-point Lloyd codebook
        (``pq_m`` subspaces x ``pq_codes`` codewords, ``pq_iters``
        refinement rounds) is trained on the corpus and every vector
        is additionally persisted as ``pq_m`` small integer codes
        packed into one array — the artifact a billion-vector corpus
        actually serves from, at a fraction of the full-float
        assignment's bytes (the assignment tree stays alongside for
        exact rerank and for drift rebuilds). The codes tree is
        partitioned by ``cell_id`` like the assignment, so
        :meth:`topk_adc` probes prune to the probed cells' files.

        Crash atomicity: the two Spark writes (centroids, assignment)
        are two separate jobs, so they land in a dot-prefixed staging
        directory that nothing treats as a version — readers resolve
        ``_current`` (which never points at it), ``refresh_if_stale``'s
        existence check looks for the final name, and ``publish``'s GC
        only sweeps ``v*`` names. Only after BOTH writes complete is
        the staging directory renamed to its final version name (one
        ``os.replace``), and only then does the ``_current`` flip run.
        A crash between the writes leaves an ignorable ``.staging-*``
        orphan (swept by the next build); a crash between rename and
        publish leaves a complete-but-unreferenced version the next
        build overwrites. No partial state can ever be trusted.
        """
        if kmeans_iters > 0:
            centroids = ivf_kmeans_centroids(
                corpus, id_col, vec_col, n_cells, kmeans_iters
            )
        else:
            centroids = ivf_centroids(corpus, id_col, vec_col, n_cells)
        assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        pq_cb = None
        if pq_m is not None:
            pq_cb = pq_kmeans_codebook(
                corpus, id_col, vec_col, pq_m, pq_codes, EMBED_DIM, pq_iters
            )
        with self._locked():
            # sweep staging orphans from any previously CRASHED build —
            # safe under the lock: no live writer's staging can be here
            for name in os.listdir(self.path):
                if name.startswith(".staging-"):
                    shutil.rmtree(
                        os.path.join(self.path, name), ignore_errors=True
                    )
            version = self.next_version(self._meta())
            final = os.path.join(self.path, version)
            staging = os.path.join(self.path, f".staging-{version}")
            shutil.rmtree(final, ignore_errors=True)
            centroids.coalesce(1).write.parquet(
                os.path.join(staging, "centroids")
            )
            self._fault("after_centroids")
            (
                # one writer per cell keeps each partition's file count
                # at O(size / maxRecordsPerFile), so the per-query
                # pruned read opens a bounded file set however large
                # the corpus grows
                assigned.repartition(F.col("cell_id"))
                .write.option("maxRecordsPerFile", 5_000_000)
                .partitionBy("cell_id")
                .parquet(os.path.join(staging, "assignment"))
            )
            self._fault("after_assignment")
            params = {"n_cells": n_cells, "kmeans_iters": kmeans_iters}
            if pq_m is not None:
                # PQ artifacts: codebook (tiny) + packed codes. Encode
                # FROM the just-staged assignment (one read gives
                # vec_id, embedding AND cell_id — no second argmax
                # pass over the corpus, no join back for cell ids).
                pq_cb.coalesce(1).write.parquet(
                    os.path.join(staging, "pqcodebook")
                )
                staged = self.spark.read.parquet(
                    os.path.join(staging, "assignment")
                )
                self._write_pqcodes(staged, pq_cb, pq_m, pq_codes, staging)
                self._fault("after_pqcodes")
                params.update(
                    {"pq_m": pq_m, "pq_codes": pq_codes, "pq_iters": pq_iters}
                )
            os.replace(staging, final)
            self._fault("after_rename")
            self._publish(
                version,
                extra={"fingerprint": fingerprint, "params": params},
            )
            return version

    def _write_pqcodes(
        self,
        rows: DataFrame,
        pq_cb: DataFrame,
        pq_m: int,
        pq_codes: int,
        staging: str,
    ) -> None:
        """Encode (cell_id, vec_id, embedding) rows against ``pq_cb``
        and write the PACKED codes tree into ``staging``: one row per
        vector, ``codes`` = the ``pq_m`` codeword indexes in subspace
        order as an array<int> — the ~byte-per-subspace artifact —
        partitioned by ``cell_id`` so ADC probes prune like the
        assignment does."""
        tall = pq_encode(
            rows, pq_cb, "vec_id", "embedding", pq_m, pq_codes, EMBED_DIM
        )
        packed = (
            tall.groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda t: t["code"].cast("int"),
                ).alias("codes")
            )
            .join(rows.select("vec_id", "cell_id"), "vec_id")
        )
        (
            packed.select("cell_id", "vec_id", "codes")
            .repartition(F.col("cell_id"))
            .write.option("maxRecordsPerFile", 5_000_000)
            .partitionBy("cell_id")
            .parquet(os.path.join(staging, "pqcodes"))
        )

    def absorb(
        self,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        fingerprint: Optional[str] = None,
        batch_id: Optional[int] = None,
    ) -> str:
        """Daily-ingest index growth: assign the increment to the
        FROZEN stored codebook (the standard IVF practice — a daily
        codebook rebuild over the full corpus is exactly the
        full-scan-per-day cost this store exists to avoid; Lloyd
        refinement happens on schedule via ``build``, not per
        increment) and publish the next version whose assignment tree
        HARD-LINKS every existing partition file and adds one file
        set for the increment's rows — per-day I/O is O(increment),
        readers stay on the old complete version until the atomic
        ``_current`` flip, and the assignment remains bit-identical
        to a from-scratch assignment of the grown corpus against the
        same codebook (what the gated oracle recomputes). Returns the
        new version id.

        ``batch_id`` gives the absorb the family's exactly-once
        streaming contract: re-absorbing an already-committed batch id
        (a ``foreachBatch`` replay after a sink crash) is a no-op
        returning the committed version — without the watermark a
        replay would append the increment's assignment rows TWICE and
        the index would silently diverge from the from-scratch
        assignment."""
        with self._locked():
            meta = self._meta()
            prev = self._version_dir()
            if meta is None or prev is None:
                raise FileNotFoundError(
                    f"no committed IVF index at {self.path} — build() "
                    "the base corpus before absorbing increments"
                )
            if (
                batch_id is not None
                and meta.get("batch") is not None
                and int(batch_id) <= int(meta["batch"])
            ):
                return meta["version"]
            assigned = ivf_assign(
                new_vectors, self.centroids(), id_col, vec_col
            )
            for name in os.listdir(self.path):
                if name.startswith(".staging-"):
                    shutil.rmtree(
                        os.path.join(self.path, name), ignore_errors=True
                    )
            version = self.next_version(meta)
            final = os.path.join(self.path, version)
            staging = os.path.join(self.path, f".staging-{version}")
            shutil.rmtree(final, ignore_errors=True)
            # 1) increment assignment into the staging tree
            (
                assigned.repartition(F.col("cell_id"))
                .write.option("maxRecordsPerFile", 5_000_000)
                .partitionBy("cell_id")
                .parquet(os.path.join(staging, "assignment"))
            )
            self._fault("after_assignment")
            # 1b) PQ store: encode the increment against the FROZEN
            #     stored PQ codebook (same frozen-artifact rule as the
            #     coarse centroids — retraining per increment is the
            #     full-scan cost absorb exists to avoid, and a frozen
            #     codebook keeps the grown codes tree bit-identical to
            #     a from-scratch encode of the grown corpus, which is
            #     what the gated oracle recomputes)
            params = meta.get("params") or {}
            if params.get("pq_m") is not None:
                staged = self.spark.read.parquet(
                    os.path.join(staging, "assignment")
                )
                self._write_pqcodes(
                    staged,
                    self.pq_codebook_df(),
                    int(params["pq_m"]),
                    int(params["pq_codes"]),
                    staging,
                )
                self._fault("after_pqcodes")
            # 2) hard-link the previous version beside it (centroids
            #    verbatim; assignment partition-by-partition, renaming
            #    to avoid part-file collisions)
            def _link(src: str, dst: str, suffix: str) -> None:
                os.makedirs(dst, exist_ok=True)
                for name in sorted(os.listdir(src)):
                    s = os.path.join(src, name)
                    if os.path.isdir(s):
                        _link(s, os.path.join(dst, name), suffix)
                    elif name.endswith(".parquet"):
                        d = os.path.join(dst, f"{suffix}-{name}")
                        try:
                            os.link(s, d)
                        except OSError:
                            shutil.copy2(s, d)
            _link(
                os.path.join(prev, "centroids"),
                os.path.join(staging, "centroids"),
                meta["version"],
            )
            _link(
                os.path.join(prev, "assignment"),
                os.path.join(staging, "assignment"),
                meta["version"],
            )
            if params.get("pq_m") is not None:
                _link(
                    os.path.join(prev, "pqcodebook"),
                    os.path.join(staging, "pqcodebook"),
                    meta["version"],
                )
                _link(
                    os.path.join(prev, "pqcodes"),
                    os.path.join(staging, "pqcodes"),
                    meta["version"],
                )
            self._fault("after_link")
            os.replace(staging, final)
            self._fault("after_rename")
            extra = {
                "fingerprint": fingerprint,
                "params": meta.get("params"),
            }
            # the batch watermark survives manual (batch-less) absorbs,
            # same contract as the snapshot stores
            if batch_id is not None:
                extra["batch"] = int(batch_id)
            elif meta.get("batch") is not None:
                extra["batch"] = int(meta["batch"])
            self._publish(version, extra=extra)
            return version

    def foreach_batch(
        self,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        emit=None,
    ):
        """Exactly-once ``foreachBatch`` ANN-ingest sink: each
        micro-batch of vectors is absorbed against the frozen codebook
        under its batch id (replays are no-ops); ``emit(version,
        batch_id)``, if given, receives the committed version."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            version = self.absorb(
                batch_df, id_col, vec_col, batch_id=int(batch_id)
            )
            if emit is not None:
                emit(version, int(batch_id))

        return fn

    def compact(self, target_files_per_cell: int = 1) -> str:
        """Periodic maintenance for the absorb chain: after N daily
        absorbs every cell partition holds N hard-linked file sets;
        compaction rewrites the assignment tree with
        ``target_files_per_cell`` files per cell into the next
        version (centroids hard-linked verbatim, content unchanged,
        batch watermark and fingerprint preserved) — the same
        keep-a-year-of-absorbs-probeable job the snapshot stores'
        ``compact`` does. Readers stay on the old version until the
        atomic flip. Returns the new version id."""
        with self._locked():
            meta = self._meta()
            prev = self._version_dir()
            if meta is None or prev is None:
                raise FileNotFoundError(
                    f"no committed IVF index at {self.path} — nothing "
                    "to compact"
                )
            version = self.next_version(meta)
            final = os.path.join(self.path, version)
            staging = os.path.join(self.path, f".staging-{version}")
            shutil.rmtree(final, ignore_errors=True)
            shutil.rmtree(staging, ignore_errors=True)
            # honor the parameter's name: estimate rows per cell and
            # size maxRecordsPerFile so each cell lands in about
            # ``target_files_per_cell`` files (ceil — never more rows
            # per file than the even split needs)
            n_cells = max(int((meta.get("params") or {}).get("n_cells", 1)), 1)
            total = self.assignment().count()
            per_cell = -(-total // n_cells)  # ceil
            max_rows = max(-(-per_cell // max(target_files_per_cell, 1)), 1)
            (
                self.assignment()
                .repartition(F.col("cell_id"))
                .sortWithinPartitions("vec_id")
                .write.option("maxRecordsPerFile", max_rows)
                .partitionBy("cell_id")
                .parquet(os.path.join(staging, "assignment"))
            )
            self._fault("after_assignment")
            if (meta.get("params") or {}).get("pq_m") is not None:
                # codes accumulate hard-linked file sets exactly like
                # the assignment; rewrite them to the same per-cell
                # file budget (content unchanged — compaction never
                # re-encodes)
                (
                    self.pqcodes_packed()
                    .repartition(F.col("cell_id"))
                    .sortWithinPartitions("vec_id")
                    .write.option("maxRecordsPerFile", max_rows)
                    .partitionBy("cell_id")
                    .parquet(os.path.join(staging, "pqcodes"))
                )
                self._fault("after_pqcodes")

            def _link_flat(sub: str) -> None:
                dst = os.path.join(staging, sub)
                os.makedirs(dst, exist_ok=True)
                src = os.path.join(prev, sub)
                for name in sorted(os.listdir(src)):
                    if name.endswith(".parquet"):
                        try:
                            os.link(
                                os.path.join(src, name),
                                os.path.join(dst, name),
                            )
                        except OSError:
                            shutil.copy2(
                                os.path.join(src, name),
                                os.path.join(dst, name),
                            )

            _link_flat("centroids")
            if (meta.get("params") or {}).get("pq_m") is not None:
                _link_flat("pqcodebook")
            self._fault("after_link")
            os.replace(staging, final)
            self._fault("after_rename")
            extra = {
                "fingerprint": meta.get("fingerprint"),
                "params": meta.get("params"),
            }
            if meta.get("batch") is not None:
                extra["batch"] = int(meta["batch"])
            self._publish(version, extra=extra)
            return version

    def refresh_if_stale(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = IVF_CELLS,
        kmeans_iters: int = 0,
        fingerprint: Optional[str] = None,
        pq_m: Optional[int] = None,
        pq_codes: int = PQ_CODES,
        pq_iters: int = 2,
    ) -> bool:
        """Build only when no committed version matches the requested
        (fingerprint, params). Returns True when a build happened."""
        want = {"n_cells": n_cells, "kmeans_iters": kmeans_iters}
        if pq_m is not None:
            want.update(
                {"pq_m": pq_m, "pq_codes": pq_codes, "pq_iters": pq_iters}
            )
        meta = self._meta()
        fresh = (
            meta is not None
            and self._version_dir() is not None
            and meta.get("fingerprint") == fingerprint
            and meta.get("params") == want
        )
        if fresh:
            return False
        self.build(
            corpus,
            id_col,
            vec_col,
            n_cells,
            kmeans_iters,
            fingerprint,
            pq_m=pq_m,
            pq_codes=pq_codes,
            pq_iters=pq_iters,
        )
        return True

    # -- drift policy -------------------------------------------------------

    def _patch_meta(self, **fields) -> None:
        """Record provenance fields (e.g. a measured recall) on the
        CURRENT version's pointer — one atomic re-flip, no data
        movement."""
        with self._locked():
            meta = self._meta()
            if meta is None:
                raise FileNotFoundError(
                    f"no committed IVF index at {self.path}"
                )
            version = meta.pop("version")
            meta.update(fields)
            self._publish(version, extra=meta)

    def recall_probe(
        self,
        queries: Optional[DataFrame] = None,
        k: int = 10,
        nprobe: int = IVF_NPROBE,
        sample: int = 32,
    ) -> int:
        """Measured recall (x1e6, floored) of the SERVED index against
        exact brute-force cosine top-k over the stored corpus — the
        drift signal for a frozen-codebook absorb chain: every daily
        ``absorb`` assigns against the codebook fit long ago, and as
        the absorbed distribution drifts away from it the probed cells
        stop containing the true neighbors. The probe costs one pruned
        index scan plus one brute pass over the corpus for ``sample``
        queries (queries default to the ``sample`` lowest-id stored
        vectors — deterministic, so the probe itself is replayable).
        Cheap relative to a rebuild; schedule it after absorbs and let
        :meth:`rebuild_if_drifted` act on it."""
        corpus = self.assignment().select("vec_id", "embedding")
        if queries is None:
            queries = (
                corpus.orderBy(F.col("vec_id")).limit(sample)
            )
        from .similarity import brute_force_topk

        exact = brute_force_topk(queries, corpus, k=k).select(
            "q_id", "vec_id"
        )
        approx = self.topk(queries, k=k, nprobe=nprobe).select(
            "q_id", "vec_id"
        )
        agg = (
            exact.join(approx, ["q_id", "vec_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("hit"))
            .crossJoin(exact.agg(F.count(F.lit(1)).alias("tot")))
            .select(
                F.floor(F.col("hit") * 1_000_000 / F.greatest("tot", F.lit(1)))
                .cast("long")
                .alias("r")
            )
            .first()
        )
        return int(agg["r"])

    def rebuild_if_drifted(
        self,
        min_recall_x1e6: int,
        queries: Optional[DataFrame] = None,
        k: int = 10,
        nprobe: int = IVF_NPROBE,
        sample: int = 32,
    ) -> tuple[bool, int, int]:
        """Close the drift loop: probe recall; when it has fallen below
        ``min_recall_x1e6``/1e6, re-Lloyd the codebook ON THE GROWN
        CORPUS (read from the stored assignment — no source rescan)
        with the pinned build params and publish the rebuild as the
        next version, preserving the corpus fingerprint and the
        streaming batch watermark (a replayed batch after the rebuild
        must still no-op). The rebuild is bit-identical to a
        from-scratch ``build`` of the grown corpus because it IS one —
        same params, same corpus, same fixed-point math.

        Returns ``(rebuilt, recall_before, recall_after)``; both
        recalls are recorded on the committed pointer
        (``recall_x1e6``), so a scheduler can alert on the trend
        without re-probing."""
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError(
                f"no committed IVF index at {self.path}"
            )
        before = self.recall_probe(queries, k=k, nprobe=nprobe, sample=sample)
        if before >= min_recall_x1e6:
            self._patch_meta(recall_x1e6=before)
            return (False, before, before)
        params = meta.get("params") or {}
        corpus = self.assignment().select("vec_id", "embedding")
        batch = meta.get("batch")
        self.build(
            corpus,
            n_cells=int(params.get("n_cells", IVF_CELLS)),
            kmeans_iters=int(params.get("kmeans_iters", 0)),
            fingerprint=meta.get("fingerprint"),
            pq_m=(
                int(params["pq_m"]) if params.get("pq_m") is not None else None
            ),
            pq_codes=int(params.get("pq_codes", PQ_CODES)),
            pq_iters=int(params.get("pq_iters", 2)),
        )
        after = self.recall_probe(queries, k=k, nprobe=nprobe, sample=sample)
        patch = {"recall_x1e6": after}
        if batch is not None:
            patch["batch"] = int(batch)
        self._patch_meta(**patch)
        return (True, before, after)

    # -- read / query ------------------------------------------------------

    def _read(self, part: str) -> DataFrame:
        d = self._version_dir()
        if d is None:
            raise FileNotFoundError(f"no committed IVF index at {self.path}")
        return self.spark.read.parquet(os.path.join(d, part))

    def centroids(self) -> DataFrame:
        return self._read("centroids")

    def assignment(self) -> DataFrame:
        return self._read("assignment")

    def pq_codebook_df(self) -> DataFrame:
        """The stored PQ codebook (s, code, cw array<long> x1000)."""
        return self._read("pqcodebook")

    def pqcodes_packed(self) -> DataFrame:
        """The stored packed codes (cell_id, vec_id, codes array<int>)
        — the artifact an ADC query actually scans."""
        return self._read("pqcodes")

    def pqcodes(self) -> DataFrame:
        """Unpacked view of the codes tree: (cell_id, vec_id, s, code)
        — one posexplode projection over the packed artifact; the
        shape :func:`~.similarity.ivfpq_probe_topk` joins on."""
        return self.pqcodes_packed().select(
            "cell_id",
            "vec_id",
            F.posexplode("codes").alias("s", "code"),
        ).select(
            "cell_id",
            "vec_id",
            F.col("s").cast("long").alias("s"),
            F.col("code").cast("long").alias("code"),
        )

    def topk(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobe: int = IVF_NPROBE,
    ) -> DataFrame:
        """IVF top-k served from the committed index: broadcast-probe
        the stored codebook, scan only the probed cells' assignment
        partitions (dynamic partition pruning on ``cell_id``)."""
        return ivf_probe_topk(
            queries, self.centroids(), self.assignment(),
            id_col, vec_col, k, nprobe,
        )

    def topk_adc(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobe: int = IVF_NPROBE,
        refine: int = 8,
    ) -> DataFrame:
        """IVF-PQ top-k served from the committed index: ADC shortlist
        over the probed cells' CODES (never the full vectors), then —
        when ``refine > 1`` — an exact-cosine rerank of the
        ``k * refine`` shortlist against the assignment tree, fetched
        by a broadcast (cell_id, vec_id) join that dynamically prunes
        to the probed cells. This is the published billion-scale
        serving recipe (Jegou et al. TPAMI'11 IVFADC + re-ranking):
        the corpus-sized scan touches ~nprobe/n_cells of an artifact
        ~1/16th the assignment's bytes, and full vectors are read for
        only shortlist-many rows per query.

        Output with rerank: (q_id, vec_id, rank, sim_x1e6) — EXACT
        cosine scores on the shortlist, the :meth:`topk` contract.
        With ``refine <= 1``: (q_id, vec_id, rank, adc_x1e6), the raw
        integer ADC contract of :func:`~.similarity.pq_topk`.
        """
        from pyspark.sql import Window

        params = (self._meta() or {}).get("params") or {}
        if params.get("pq_m") is None:
            raise ValueError(
                f"IVF index at {self.path} has no PQ artifacts — "
                "build(pq_m=...) the index before serving topk_adc"
            )
        m = int(params["pq_m"])
        shortlist = ivfpq_probe_topk(
            queries,
            self.centroids(),
            self.pq_codebook_df(),
            self.pqcodes(),
            id_col,
            vec_col,
            k=k * max(int(refine), 1),
            nprobe=nprobe,
            m=m,
        )
        if refine <= 1:
            return shortlist.select("q_id", "vec_id", "rank", "adc_x1e6")
        # materialize the shortlist before the rerank join: it must be
        # broadcast-sized anyway (it IS the broadcast side below), and
        # without this the rerank's dynamic-partition-pruning subquery
        # would carry a second full copy of the ADC plan — the probe
        # cross-join and the codes scan would run twice per query
        shortlist = shortlist.select(
            "q_id", "vec_id", "cell_id"
        ).localCheckpoint()
        fetched = self.assignment().join(
            F.broadcast(shortlist), ["cell_id", "vec_id"]
        )
        q = F.broadcast(
            queries.select(
                F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
            )
        )
        sims = fetched.join(q, "q_id").select(
            "q_id",
            "vec_id",
            F.round(cosine("q_vec", "embedding") * 1e6)
            .cast("long")
            .alias("sim_x1e6"),
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("sim_x1e6").desc(), F.col("vec_id")
        )
        return (
            sims.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("q_id", "vec_id", "rank", "sim_x1e6")
        )

    def topk_adc_sweep(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 10,
        nprobes: tuple = (IVF_NPROBE,),
        refines: tuple = (8,),
    ) -> DataFrame:
        """Every (nprobe, refine) serving cell of the sweep in ONE
        shared pipeline — the audit-query shape (`ivfpq_nprobe_audit`,
        `ivfpq_serving_grid`) that previously called :meth:`topk_adc`
        once per cell and re-ran the probe + LUT + codes-scan ADC pass
        each time.  A candidate's ADC score depends on neither knob,
        and the candidate set at nprobe = n is exactly "cells with
        probe rank <= n", so the whole grid is derivable from one
        scored frame:

        1. probe ranks once up to max(nprobes); ADC-score each
           candidate once (the only corpus-sized work — one codes
           scan instead of one per swept cell);
        2. per-nprobe ADC ranks via a tier explode + ONE window
           partitioned by (nprobe, q_id) — identical rank arithmetic
           to the per-call window because the tier's candidate set
           and (adc DESC, vec_id) order are identical;
        3. exact-cosine rerank computed once per DISTINCT shortlist
           pair (cosine is per-pair, independent of the sweep), then
           per-(nprobe, refine) final ranks from one window.

        The shortlist is localCheckpoint-staged like :meth:`topk_adc`
        (it is the broadcast side of the rerank fetch; without the
        stage the dynamic-partition-pruning subquery would re-run the
        ADC plan).  Output: (nprobe, refine, q_id, vec_id, rank) —
        rank is the cell's serving rank (ADC rank when refine <= 1,
        exact-rerank rank otherwise), so each (nprobe, refine) slice
        is row-for-row :meth:`topk_adc`'s answer set at those knobs.
        """
        from pyspark.sql import Window

        from .similarity import EMBED_DIM as _DIM
        from .similarity import _as_double, _pq_subq

        params = (self._meta() or {}).get("params") or {}
        if params.get("pq_m") is None:
            raise ValueError(
                f"IVF index at {self.path} has no PQ artifacts — "
                "build(pq_m=...) the index before serving topk_adc_sweep"
            )
        m = int(params["pq_m"])
        d_sub = _DIM // m
        nprobes = tuple(sorted(int(n) for n in nprobes))
        refines = tuple(sorted(int(r) for r in refines))
        max_np = max(nprobes)
        max_rf = max(max(refines), 1)
        # 1. coarse probe ranks once, up to the largest swept nprobe
        qsims = queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ).join(F.broadcast(self.centroids())).select(
            "q_id",
            "cell_id",
            F.round(cosine("q_vec", "c_vec") * 1e6)
            .cast("long")
            .alias("c_sim"),
        )
        wq = Window.partitionBy("q_id").orderBy(
            F.col("c_sim").desc(), F.col("cell_id")
        )
        plist = (
            qsims.withColumn("_pr", F.row_number().over(wq))
            .where(F.col("_pr") <= max_np)
            .select("q_id", "cell_id", "_pr")
        )
        # 2. per-query LUT of exact-integer partial dots (identical
        #    construction to ivfpq_probe_topk)
        qsub = queries.select(
            F.col(id_col).alias("q_id"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            _as_double(vec_col).alias("_v"),
        ).select(
            "q_id",
            F.col("s").cast("long").alias("s"),
            _pq_subq("_v", "s", d_sub).alias("qsubq"),
        )
        pdot = F.aggregate(
            F.zip_with("qsubq", "cw", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        lut = qsub.join(F.broadcast(self.pq_codebook_df()), "s").select(
            "q_id", "s", "code", pdot.alias("pdot")
        )
        # 3. ONE ADC pass over the probed cells' codes, then the
        #    nprobe-tier explode: a candidate in the cell probed at
        #    rank pr belongs to every tier with nprobe >= pr
        scored = (
            self.pqcodes()
            .join(F.broadcast(plist), "cell_id")
            .where(F.col("q_id") != F.col("vec_id"))
            .join(F.broadcast(lut), ["q_id", "s", "code"])
            .groupBy("q_id", "vec_id")
            .agg(
                F.sum("pdot").cast("long").alias("adc_x1e6"),
                F.first("cell_id").alias("cell_id"),
                F.min("_pr").alias("_pr"),
            )
        )
        np_arr = F.array(*[F.lit(n) for n in nprobes])
        tiers = scored.select(
            "q_id",
            "vec_id",
            "adc_x1e6",
            "cell_id",
            F.explode(
                F.filter(np_arr, lambda n: n >= F.col("_pr"))
            ).alias("nprobe"),
        )
        wt = Window.partitionBy("nprobe", "q_id").orderBy(
            F.col("adc_x1e6").desc(), F.col("vec_id")
        )
        shortlist = (
            tiers.withColumn("_rn", F.row_number().over(wt))
            .where(F.col("_rn") <= k * max_rf)
            .localCheckpoint()
        )
        out = None
        adc_refines = [r for r in refines if r <= 1]
        rr_refines = [r for r in refines if r > 1]
        if adc_refines:
            # refine <= 1 serving mode: the ADC top-k IS the answer
            rf_arr = F.array(*[F.lit(r) for r in adc_refines])
            out = (
                shortlist.where(F.col("_rn") <= k)
                .select(
                    "nprobe",
                    F.explode(rf_arr).alias("_rf"),
                    "q_id",
                    "vec_id",
                    "_rn",
                )
                .select(
                    F.col("nprobe").cast("long").alias("nprobe"),
                    F.col("_rf").cast("long").alias("refine"),
                    "q_id",
                    "vec_id",
                    F.col("_rn").cast("long").alias("rank"),
                )
            )
        if rr_refines:
            # exact-cosine rerank, once per DISTINCT shortlist pair
            pairs = shortlist.select(
                "q_id", "vec_id", "cell_id"
            ).distinct()
            fetched = self.assignment().join(
                F.broadcast(pairs), ["cell_id", "vec_id"]
            )
            q = F.broadcast(
                queries.select(
                    F.col(id_col).alias("q_id"),
                    F.col(vec_col).alias("q_vec"),
                )
            )
            sims = fetched.join(q, "q_id").select(
                "q_id",
                "vec_id",
                F.round(cosine("q_vec", "embedding") * 1e6)
                .cast("long")
                .alias("sim_x1e6"),
            )
            rf_arr = F.array(*[F.lit(r) for r in rr_refines])
            sl = shortlist.join(sims, ["q_id", "vec_id"]).select(
                "nprobe",
                "q_id",
                "vec_id",
                "sim_x1e6",
                F.explode(
                    F.filter(rf_arr, lambda r: F.col("_rn") <= k * r)
                ).alias("refine"),
            )
            wr = Window.partitionBy("nprobe", "refine", "q_id").orderBy(
                F.col("sim_x1e6").desc(), F.col("vec_id")
            )
            rr = (
                sl.withColumn("rank", F.row_number().over(wr).cast("long"))
                .where(F.col("rank") <= k)
                .select(
                    F.col("nprobe").cast("long").alias("nprobe"),
                    F.col("refine").cast("long").alias("refine"),
                    "q_id",
                    "vec_id",
                    "rank",
                )
            )
            out = rr if out is None else out.unionByName(rr)
        return out

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
