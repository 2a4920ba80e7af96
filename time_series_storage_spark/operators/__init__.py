from .rollup import best_grouping
from .collapse import collapse, collapse_rollup, fill_range

__all__ = ["best_grouping", "collapse", "collapse_rollup", "fill_range"]
