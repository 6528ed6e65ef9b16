from .base import ChangeBatch, DataSource, attach_envelope
from .values import ValuesSource
from .parquet import ParquetSnapshotSource

__all__ = [
    "ChangeBatch",
    "DataSource",
    "attach_envelope",
    "ValuesSource",
    "ParquetSnapshotSource",
]
