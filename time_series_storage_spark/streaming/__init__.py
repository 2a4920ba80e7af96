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
from .curation import curation_foreach_batch  # noqa: F401
from .duckdb_backend import DuckDBMergeBackend  # noqa: F401
from .joins import streaming_interval_join  # noqa: F401
from .scoring import (  # noqa: F401
    streaming_bloom_contamination,
    streaming_contamination_report,
    streaming_ngram_contamination,
    streaming_token_ngram_contamination,
)
from .stateful import (  # noqa: F401
    streaming_asof_join,
    streaming_cusum,
    streaming_debounce,
    streaming_exact_dedup,
    streaming_funnel,
    streaming_retention_pairs,
    streaming_rolling_corr,
)
