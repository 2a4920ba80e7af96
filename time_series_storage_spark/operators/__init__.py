from .rollup import best_grouping
from .collapse import collapse, fill_range

__all__ = ["best_grouping", "collapse", "fill_range"]
