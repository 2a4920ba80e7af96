"""Fact/dimension catalog: the engine's metadata registry.

Mirrors the reference's ``facts``/``dimensions`` metadata tables
(/root/reference/src/time_series_storage/postgres/schema.clj:70-105) and
validation semantics, but stores grouping paths and tracked-fact sets as
native Python/Spark arrays instead of EDN strings in varchar columns
(schema.clj:104-105,140-141).

The catalog is tiny (metadata only), so it lives driver-side with
optional JSON persistence plus ``to_dataframes`` for anyone who wants the
registry as Spark DataFrames. Rollup *data* never lives here — raw events
are the source of truth (SURVEY.md section 7.1).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterable, Optional

from .errors import (
    HistogramSpecError,
    InvalidFactTypeError,
    InvalidSliceError,
    UnknownDimensionError,
    UnknownFactError,
    UnknownGroupingDimensionError,
)

FACT_TYPES = ("counter", "average", "histogram")

# Defaults per reference postgres/schema.clj:122-127 (fact) and :135-141
# (dimension).
DEFAULT_SLICE = 15
DEFAULT_FILLER = 0
DEFAULT_UNITS = "counter"
DEFAULT_SIZE = 40


@dataclass
class Fact:
    """A metric definition (reference api.clj:5-6, schema.clj:70-84)."""

    id: str
    type: str
    slice: int = DEFAULT_SLICE
    name: Optional[str] = None
    filler: int = DEFAULT_FILLER
    units: str = DEFAULT_UNITS
    # histogram bucket spec (schema.clj:162-166); None for other types
    start: Optional[int] = None
    end: Optional[int] = None
    step: Optional[int] = None

    def bucket_edges(self) -> list[int]:
        """Lower edges of histogram buckets: range(start, end, step).

        Matches the reference's generated ``b{lo}`` columns
        (postgres/schema.clj:162-166).
        """
        if self.type != "histogram":
            raise HistogramSpecError(f"Fact {self.id} is not a histogram")
        return list(range(self.start, self.end, self.step))


@dataclass
class Dimension:
    """A categorical attribute (reference api.clj:8-9, schema.clj:93-105)."""

    id: str
    name: Optional[str] = None
    slice: Optional[int] = None  # overrides fact slice when set (query.clj:37)
    size: int = DEFAULT_SIZE
    group_only: bool = False
    grouped_by: list[list[str]] = field(default_factory=lambda: [[]])
    facts: set[str] = field(default_factory=set)


class Catalog:
    """In-memory fact/dimension registry with reference-parity validation."""

    def __init__(self) -> None:
        self._facts: dict[str, Fact] = {}
        self._dimensions: dict[str, Dimension] = {}

    # -- schema lifecycle (reference api.clj init-schema!/drop-schema!) ----

    def clear(self) -> None:
        self._facts.clear()
        self._dimensions.clear()

    # -- fact registry ------------------------------------------------------

    def define_fact(
        self,
        fact_id: str,
        fact_type: str,
        slice: int = DEFAULT_SLICE,
        **options,
    ) -> Fact:
        """Register a fact (reference postgres.clj:25-30, schema.clj:114-128)."""
        fact_type = str(fact_type)
        if fact_type not in FACT_TYPES:
            raise InvalidFactTypeError(fact_type)
        slice = int(slice if slice is not None else DEFAULT_SLICE)
        if slice <= 0 or 60 % slice != 0:
            raise InvalidSliceError(slice)
        fact = Fact(
            id=str(fact_id),
            type=fact_type,
            slice=slice,
            name=options.get("name"),
            filler=int(options.get("filler", DEFAULT_FILLER)),
            units=options.get("units", DEFAULT_UNITS),
            start=options.get("start"),
            end=options.get("end"),
            step=options.get("step"),
        )
        if fact_type == "histogram":
            if fact.start is None or fact.end is None or fact.step is None:
                raise HistogramSpecError(
                    f"Histogram fact {fact_id} requires start, end and step options"
                )
            if fact.step <= 0 or fact.end <= fact.start:
                raise HistogramSpecError(
                    f"Histogram fact {fact_id} has empty bucket range "
                    f"[{fact.start}, {fact.end}) step {fact.step}"
                )
        self._facts[fact.id] = fact
        return fact

    def fact(self, fact_id: str) -> Fact:
        f = self._facts.get(str(fact_id))
        if f is None:
            raise UnknownFactError(fact_id)
        return f

    def has_fact(self, fact_id: str) -> bool:
        return str(fact_id) in self._facts

    def facts(self) -> list[Fact]:
        return list(self._facts.values())

    # -- dimension registry -------------------------------------------------

    def define_dimension(self, dim_id: str, **options) -> Dimension:
        """Register a dimension (reference postgres.clj:32-40).

        Validates that every dimension referenced by ``grouped_by`` exists
        (postgres.clj:33-36); applies reference defaults
        (schema.clj:135-141).
        """
        grouped_by = options.get("grouped_by") or [[]]
        grouped_by = [[str(d) for d in path] for path in grouped_by]
        for path in grouped_by:
            for ref in path:
                if ref not in self._dimensions:
                    raise UnknownGroupingDimensionError(path)
        slice = options.get("slice")
        if slice is not None:
            slice = int(slice)
            if slice <= 0 or 60 % slice != 0:
                raise InvalidSliceError(slice)
        dim = Dimension(
            id=str(dim_id),
            name=options.get("name"),
            slice=slice,
            size=int(options.get("size", DEFAULT_SIZE)),
            group_only=bool(options.get("group_only", False)),
            grouped_by=grouped_by,
            facts=set(str(f) for f in options.get("facts", []) or []),
        )
        self._dimensions[dim.id] = dim
        return dim

    def update_dimension(self, dim_id: str, fact_id: str) -> Dimension:
        """Attach an existing fact to a dimension (reference postgres.clj:42-47)."""
        fact = self.fact(fact_id)  # raises UnknownFactError
        dim = self.dimension(dim_id)  # raises UnknownDimensionError
        dim.facts.add(fact.id)
        return dim

    def dimension(self, dim_id: str) -> Dimension:
        d = self._dimensions.get(str(dim_id))
        if d is None:
            raise UnknownDimensionError(dim_id)
        return d

    def has_dimension(self, dim_id: str) -> bool:
        return str(dim_id) in self._dimensions

    def dimensions(self) -> list[Dimension]:
        return list(self._dimensions.values())

    def dimensions_for(self, dim_ids: Iterable[str]) -> dict[str, Dimension]:
        """Subset lookup used by ingest (reference schema.clj:40-55)."""
        out = {}
        for d in dim_ids:
            d = str(d)
            if d in self._dimensions:
                out[d] = self._dimensions[d]
        return out

    # -- persistence --------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "facts": [vars(f) for f in self._facts.values()],
                "dimensions": [
                    {**vars(d), "facts": sorted(d.facts)}
                    for d in self._dimensions.values()
                ],
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "Catalog":
        data = json.loads(text)
        cat = cls()
        for f in data.get("facts", []):
            cat._facts[f["id"]] = Fact(**f)
        for d in data.get("dimensions", []):
            d = dict(d)
            d["facts"] = set(d.get("facts", []))
            cat._dimensions[d["id"]] = Dimension(**d)
        return cat

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            fh.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Catalog":
        with open(path) as fh:
            return cls.from_json(fh.read())

    def to_dataframes(self, spark):
        """Expose the registry as two Spark DataFrames (facts, dimensions)."""
        from pyspark.sql import types as T

        fact_schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("slice", T.IntegerType()),
                T.StructField("name", T.StringType()),
                T.StructField("filler", T.IntegerType()),
                T.StructField("units", T.StringType()),
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
                T.StructField("step", T.IntegerType()),
            ]
        )
        dim_schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("name", T.StringType()),
                T.StructField("slice", T.IntegerType()),
                T.StructField("size", T.IntegerType()),
                T.StructField("group_only", T.BooleanType()),
                T.StructField(
                    "grouped_by", T.ArrayType(T.ArrayType(T.StringType()))
                ),
                T.StructField("facts", T.ArrayType(T.StringType())),
            ]
        )
        facts_df = spark.createDataFrame(
            [
                (f.id, f.type, f.slice, f.name, f.filler, f.units, f.start, f.end, f.step)
                for f in self._facts.values()
            ],
            fact_schema,
        )
        dims_df = spark.createDataFrame(
            [
                (d.id, d.name, d.slice, d.size, d.group_only, d.grouped_by, sorted(d.facts))
                for d in self._dimensions.values()
            ],
            dim_schema,
        )
        return facts_df, dims_df
