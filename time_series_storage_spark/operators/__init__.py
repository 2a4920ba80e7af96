from .rollup import best_grouping
from .collapse import collapse, collapse_rollup, fill_range
from .analytics import interpolate_fill, quantize, rolling_agg
from .bucketing import read_bucketed, save_bucketed

__all__ = [
    "best_grouping",
    "collapse",
    "collapse_rollup",
    "fill_range",
    "interpolate_fill",
    "quantize",
    "read_bucketed",
    "rolling_agg",
    "save_bucketed",
]
