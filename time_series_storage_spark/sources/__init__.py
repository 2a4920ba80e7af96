from .events import EVENT_SCHEMA, EventStore, MemoryEventStore, ParquetEventStore

__all__ = ["EVENT_SCHEMA", "EventStore", "MemoryEventStore", "ParquetEventStore"]
