from .base import DataSink, MetadataApplier
from .memory import MemorySink

__all__ = ["DataSink", "MetadataApplier", "MemorySink"]
