from .time import (
    STEPS,
    grid_df,
    slice_datetime,
    slice_expr,
    step_interval_sql,
    step_trunc_datetime,
    step_trunc_expr,
)

__all__ = [
    "STEPS",
    "grid_df",
    "slice_datetime",
    "slice_expr",
    "step_interval_sql",
    "step_trunc_datetime",
    "step_trunc_expr",
]
