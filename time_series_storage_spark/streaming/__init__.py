from .ingest import (  # noqa: F401
    stream_events,
    streaming_append,
    streaming_rollup,
)
