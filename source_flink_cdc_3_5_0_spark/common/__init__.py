from .tableid import TableId, Selectors
from .schema import Column, Schema
from .events import (
    AddColumnEvent,
    AlterColumnTypeEvent,
    ColumnWithPosition,
    CreateTableEvent,
    DataChangeEvent,
    DropColumnEvent,
    DropTableEvent,
    OpType,
    RenameColumnEvent,
    SchemaChangeEvent,
    TruncateTableEvent,
)
from . import types as type_utils

__all__ = [
    "TableId",
    "Selectors",
    "Column",
    "Schema",
    "OpType",
    "DataChangeEvent",
    "SchemaChangeEvent",
    "CreateTableEvent",
    "AddColumnEvent",
    "ColumnWithPosition",
    "DropColumnEvent",
    "RenameColumnEvent",
    "AlterColumnTypeEvent",
    "TruncateTableEvent",
    "DropTableEvent",
    "type_utils",
]
