"""time_series_storage_spark — a PySpark-native time-series metrics engine.

A from-scratch re-implementation of the capabilities of
``guilespi/time-series-storage`` (reference, read-only at
/root/reference/): facts (counter / average / histogram), dimensions with
grouping hierarchies, slice-bucketed ingestion, and step-collapsed,
gap-filled range queries — re-expressed Spark-first: append-only raw
events as the source of truth, rollups derived by Catalyst-optimized
aggregation, optional Structured Streaming materialization.
"""

from .catalog import Catalog, Dimension, Fact
from .engine import TimeSeries
from .errors import (
    HistogramSpecError,
    InvalidFactTypeError,
    InvalidSliceError,
    InvalidStepError,
    NilCategoryError,
    NoCoveringPathError,
    NoTrackingDimensionError,
    TimeSeriesError,
    UnknownDimensionError,
    UnknownFactError,
    UnknownGroupingDimensionError,
)
from .sources.events import EVENT_SCHEMA, MemoryEventStore, ParquetEventStore

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "Dimension",
    "Fact",
    "TimeSeries",
    "TimeSeriesError",
    "UnknownFactError",
    "UnknownDimensionError",
    "InvalidFactTypeError",
    "InvalidSliceError",
    "InvalidStepError",
    "NilCategoryError",
    "NoCoveringPathError",
    "NoTrackingDimensionError",
    "UnknownGroupingDimensionError",
    "HistogramSpecError",
    "EVENT_SCHEMA",
    "MemoryEventStore",
    "ParquetEventStore",
]
