from .ingest import (  # noqa: F401
    ParquetVersionMergeBackend,
    RollupMergeBackend,
    RollupMergeSink,
    stream_events,
    streaming_append,
    streaming_rollup,
    streaming_rollup_refresh,
    streaming_sessions,
)
from .joins import streaming_interval_join  # noqa: F401
from .stateful import (  # noqa: F401
    streaming_exact_dedup,
    streaming_funnel,
)
