"""Error surface mirroring the reference's exception conditions.

Reference throws plain ``Exception`` with message strings (e.g.
/root/reference/src/time_series_storage/mem.clj:145-168,
/root/reference/src/time_series_storage/postgres.clj:65-81). We expose a
typed hierarchy so callers can catch precisely, while keeping messages
close to the reference's wording.
"""

from __future__ import annotations


class TimeSeriesError(Exception):
    """Base class for all engine errors."""


class UnknownFactError(TimeSeriesError):
    """Fact id not present in the catalog.

    Reference: postgres.clj:69,81 / mem.clj:164-167 ("Fact %s is not defined").
    """

    def __init__(self, fact_id: str):
        super().__init__(f"Fact {fact_id} is not defined")
        self.fact_id = fact_id


class UnknownDimensionError(TimeSeriesError):
    """Dimension id not present in the catalog.

    Reference: postgres.clj:117-118 ("Non existent dimension ... specified").
    """

    def __init__(self, dimension_id: str):
        super().__init__(
            f"Non existent dimension {dimension_id} specified. Please check your schema"
        )
        self.dimension_id = dimension_id


class InvalidFactTypeError(TimeSeriesError):
    """Fact type outside {counter, average, histogram}."""

    def __init__(self, fact_type: str):
        super().__init__(
            f"Invalid fact type {fact_type!r}: must be one of counter, average, histogram"
        )


class InvalidSliceError(TimeSeriesError):
    """Slice must be a positive divisor of 60.

    The reference's bucketing floors only the minute-of-hour
    (postgres/common.clj:7-23), which silently misbehaves when slice does
    not divide 60; we validate eagerly instead (SURVEY.md section 2.2 W1).
    """

    def __init__(self, slice_minutes: int):
        super().__init__(
            f"Invalid slice {slice_minutes}: must be a positive divisor of 60 minutes"
        )


class UnknownGroupingDimensionError(TimeSeriesError):
    """A grouped_by path references an undefined dimension.

    Reference: postgres.clj:33-36 / mem.clj:117-121.
    """

    def __init__(self, group: list):
        super().__init__(
            f"Some specified dimensions to group-by do not exist on: {group}"
        )


class NilCategoryError(TimeSeriesError):
    """An ingested event carries a nil category value.

    Reference: postgres.clj:66-67 ("Some categories have nil values").
    """

    def __init__(self):
        super().__init__("Some categories have nil values")


class NoTrackingDimensionError(TimeSeriesError):
    """None of the event's dimensions track the supplied fact.

    Reference: postgres.clj:70-80 ("None of the dimensions specified track
    the supplied fact").
    """

    def __init__(self):
        super().__init__("None of the dimensions specified track the supplied fact")


class NoCoveringPathError(TimeSeriesError):
    """No grouped_by path covers the filter keys.

    The reference silently falls back to the bare dimension and drops
    uncovered filter keys (postgres/query.clj:19-28, ``(first nil)`` ->
    nil). Documented divergence (SURVEY.md section 2.4 item 5): we raise.
    """

    def __init__(self, dimension_id: str, filter_keys: list):
        super().__init__(
            f"No grouping path of dimension {dimension_id} covers filter keys "
            f"{sorted(filter_keys)}; cannot answer without dropping filters"
        )


class GroupOnlyDimensionError(TimeSeriesError):
    """A group_only dimension was used as a query target.

    The reference never creates time-series tables for group_only
    dimensions (postgres/schema.clj:233 filters them out of table
    creation; update.clj:91 out of the write fan-out), so querying one
    fails there; we raise a typed error up front.
    """

    def __init__(self, dimension_id: str):
        super().__init__(
            f"Dimension {dimension_id} is group_only: it has no time-series "
            f"tables and cannot be queried directly"
        )
        self.dimension_id = dimension_id


class InvalidStepError(TimeSeriesError):
    """Unsupported collapse step grain."""

    def __init__(self, step):
        super().__init__(
            f"Invalid step {step!r}: must be one of hour, day, week, month, year, none"
        )


class HistogramSpecError(TimeSeriesError):
    """Histogram fact missing/invalid start, end, step bucket spec."""

    def __init__(self, msg: str):
        super().__init__(msg)
