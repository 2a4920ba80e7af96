from .materialize import RollupStore  # noqa: F401
