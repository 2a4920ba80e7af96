"""Curated-dataset sink — the versioned artifact at the END of the
curation pipeline.

A training-data run (see ``queries_extensions.q_pipeline_e2e``) ends by
WRITING the selected corpus somewhere trainers read it from. That write
has the same requirements as every derived artifact in this engine —
readers must never see a half-written dataset, a crashed writer must
never poison the next run, provenance must commit atomically with the
data — so it reuses the ``VersionedStore`` snapshot protocol
(plans/materialize.py): stage the full parquet tree, flip ``_current``.

Layout::

    <root>/_current                {"version", "count", "partition_by",
                                    ...caller provenance}
    <root>/v00000003/part=.../     partitioned parquet

Scale posture: the write is a plain partitioned parquet write —
Spark's committer parallelizes it; ``maxRecordsPerFile`` bounds file
sizes so downstream scans see a sane file count; ``partition_by``
(e.g. split/source) gives trainers partition-pruned reads of "just
the train split of source X". Row count is captured from the WRITTEN
files (one cheap count over the staged version, not a second pass over
the input plan) and committed in the pointer — the manifest a sweep of
downstream jobs can trust without listing files.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame

from ..plans.materialize import VersionedStore


class CuratedDatasetStore(VersionedStore):
    """One versioned curated dataset at ``path``."""

    def _meta(self) -> Optional[dict]:
        return self.current_meta(self.path)

    def current_dir(self) -> Optional[str]:
        meta = self._meta()
        if meta is None:
            return None
        d = os.path.join(self.path, meta["version"])
        return d if os.path.exists(d) else None

    def exists(self) -> bool:
        return self.current_dir() is not None

    def write(
        self,
        df: DataFrame,
        partition_by: Sequence[str] = (),
        max_records_per_file: int = 1_000_000,
        provenance: Optional[dict] = None,
    ) -> str:
        """Write ``df`` as the next dataset version and atomically
        publish it. Returns the version id; the committed pointer
        carries the row count and any caller ``provenance`` (pipeline
        parameters, source fingerprints, ...)."""
        os.makedirs(self.path, exist_ok=True)
        version = self.next_version(self._meta())
        final = os.path.join(self.path, version)
        staging = os.path.join(self.path, f".staging-{version}")
        for name in os.listdir(self.path):
            if name.startswith(".staging-"):
                import shutil

                shutil.rmtree(os.path.join(self.path, name),
                              ignore_errors=True)
        writer = df.write.option("maxRecordsPerFile", max_records_per_file)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        count = self.spark.read.parquet(staging).count()
        os.replace(staging, final)
        meta = dict(provenance or {})
        meta.update(
            {"count": int(count), "partition_by": list(partition_by)}
        )
        self.publish(self.path, version, extra=meta)
        return version

    def read(self) -> DataFrame:
        d = self.current_dir()
        if d is None:
            raise FileNotFoundError(
                f"no committed curated dataset at {self.path}"
            )
        return self.spark.read.parquet(d)
