"""Rollup (grouping-path) selection — the reference's materialized-view picker.

``best-grouping`` (/root/reference/src/time_series_storage/postgres/query.clj:19-28,
identical mem.clj:64-73) walks the dimension's ``grouped_by`` paths in
declaration order and picks the first whose columns cover ALL filter
keys, always appending the queried dimension itself so it can be filtered
on too.

In our engine rollups are derived from raw events, so this is pure
metadata planning: the chosen path decides which dimension keys the
aggregation groups by (and therefore which series keys the result
carries). It is deliberately NOT a Catalyst rule — it is catalog-driven
plan generation in the API layer (SURVEY.md section 4).

Divergence (SURVEY.md section 2.4 item 5): when no path covers the
filter, the reference silently falls back to the bare dimension and
*drops* the uncovered filter keys; we raise ``NoCoveringPathError``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from ..catalog import Dimension
from ..errors import NoCoveringPathError


def best_grouping(
    dimension: Dimension, filter_data: Mapping[str, object] | None
) -> list[str]:
    """Pick the first grouping path covering every filter key.

    Returns the full key column list: ``path + [dimension.id]``.

    A path covers the filter iff every filter key is either in the path
    or is the queried dimension itself (the reference's set-equality test
    over ``select-keys``, postgres/query.clj:22-27). Note the *values* of
    the filter do not matter here — a nil-valued key still must be
    covered (nil only means "no equality predicate" downstream,
    postgres/query.clj:39-40).
    """
    filter_data = filter_data or {}
    dim_id = dimension.id
    filter_keys = {str(k) for k in filter_data.keys()}
    for path in dimension.grouped_by:
        if filter_keys <= set(path) | {dim_id}:
            return list(path) + [dim_id]
    raise NoCoveringPathError(dim_id, list(filter_keys))
