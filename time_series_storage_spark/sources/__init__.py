from .events import EVENT_SCHEMA, EventStore, MemoryEventStore, ParquetEventStore
from .formats import FormatEventStore

__all__ = [
    "EVENT_SCHEMA",
    "EventStore",
    "FormatEventStore",
    "MemoryEventStore",
    "ParquetEventStore",
]
