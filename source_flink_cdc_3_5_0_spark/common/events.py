"""Event algebra: data-change events + the 7-member schema-change algebra.

Parity target: ``flink-cdc-common/.../event/*.java`` —
``DataChangeEvent`` (op INSERT/UPDATE/DELETE/REPLACE rendered ``+I/-U/+U/-D``),
``CreateTableEvent``, ``AddColumnEvent`` (FIRST/LAST/BEFORE/AFTER positions),
``DropColumnEvent``, ``RenameColumnEvent``, ``AlterColumnTypeEvent``,
``TruncateTableEvent``, ``DropTableEvent``.

Spark-first note: in this engine **data-change events are DataFrame rows**
(see :mod:`..sources.base` for the envelope convention); the Python
``DataChangeEvent`` class below exists for scripted test sources and golden
tests, not the hot path. Schema-change events are always driver-side control
objects — they never enter a DataFrame (Catalyst needs a fixed schema per
plan), removing any need for the reference's FlushEvent broadcast barrier:
the (micro-)batch boundary is the barrier.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from pyspark.sql import types as T

from .schema import Column, Schema
from .tableid import TableId


class OpType(str, enum.Enum):
    """Changelog operation, rendered with Flink changelog tags."""

    INSERT = "+I"
    UPDATE_BEFORE = "-U"
    UPDATE_AFTER = "+U"
    DELETE = "-D"
    # REPLACE (reference op used by some connectors) is normalized to +U on
    # ingest; sinks treat +I/+U identically under PK upsert semantics.

    def __str__(self) -> str:  # pragma: no cover
        return self.value


# Envelope column names used on the DataFrame data plane.
OP_COL = "__op"
BEFORE_COL = "__before"
META_COL = "__meta"
ENVELOPE_COLS = (OP_COL, BEFORE_COL, META_COL)


@dataclass(frozen=True)
class DataChangeEvent:
    """Driver-side representation of one change row (tests / scripted sources).

    ``before`` / ``after`` are plain tuples positional against the table's
    current schema, mirroring ``DataChangeEvent.java:34-63``.
    """

    table_id: TableId
    op: OpType
    before: tuple | None = None
    after: tuple | None = None
    meta: tuple[tuple[str, str], ...] = ()

    @staticmethod
    def insert(table_id: TableId, after: tuple, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(table_id, OpType.INSERT, None, after, tuple(meta))

    @staticmethod
    def update(table_id: TableId, before: tuple, after: tuple, meta=()) -> "DataChangeEvent":
        # The reference ships -U and +U as ONE UpdateEvent carrying both
        # images; our row envelope keeps after-image columns + __before
        # struct, i.e. one row too (op='+U').
        return DataChangeEvent(table_id, OpType.UPDATE_AFTER, before, after, tuple(meta))

    @staticmethod
    def delete(table_id: TableId, before: tuple, meta=()) -> "DataChangeEvent":
        return DataChangeEvent(table_id, OpType.DELETE, before, None, tuple(meta))


class SchemaChangeEvent:
    """Marker base for the closed 7-member DDL algebra."""

    table_id: TableId

    def event_type(self) -> str:
        return _EVENT_TYPE_NAMES[type(self)]


@dataclass(frozen=True)
class CreateTableEvent(SchemaChangeEvent):
    table_id: TableId
    schema: Schema


class ColumnPosition(str, enum.Enum):
    FIRST = "FIRST"
    LAST = "LAST"
    BEFORE = "BEFORE"
    AFTER = "AFTER"


@dataclass(frozen=True)
class ColumnWithPosition:
    """Parity: ``AddColumnEvent.ColumnWithPosition`` (AddColumnEvent.java:186)."""

    column: Column
    position: ColumnPosition = ColumnPosition.LAST
    existed_column_name: str | None = None


@dataclass(frozen=True)
class AddColumnEvent(SchemaChangeEvent):
    table_id: TableId
    added_columns: tuple[ColumnWithPosition, ...]

    @staticmethod
    def last(table_id: TableId, *cols: Column) -> "AddColumnEvent":
        return AddColumnEvent(table_id, tuple(ColumnWithPosition(c) for c in cols))


@dataclass(frozen=True)
class DropColumnEvent(SchemaChangeEvent):
    table_id: TableId
    dropped_column_names: tuple[str, ...]


@dataclass(frozen=True)
class RenameColumnEvent(SchemaChangeEvent):
    table_id: TableId
    name_mapping: tuple[tuple[str, str], ...]  # (old, new) pairs

    def mapping_dict(self) -> dict[str, str]:
        return dict(self.name_mapping)


@dataclass(frozen=True)
class AlterColumnTypeEvent(SchemaChangeEvent):
    table_id: TableId
    type_mapping: tuple[tuple[str, T.DataType], ...]  # (col, new type)
    # LENIENT decomposition uses ALTER solely to relax nullability (drop/
    # rename keep the column, nullable). Flagged here — NEVER on the DataType
    # objects, which are process-wide singletons in PySpark.
    force_nullable: bool = False

    def mapping_dict(self) -> dict[str, T.DataType]:
        return dict(self.type_mapping)


@dataclass(frozen=True)
class TruncateTableEvent(SchemaChangeEvent):
    table_id: TableId


@dataclass(frozen=True)
class DropTableEvent(SchemaChangeEvent):
    table_id: TableId


_EVENT_TYPE_NAMES: dict[type, str] = {
    CreateTableEvent: "CREATE_TABLE",
    AddColumnEvent: "ADD_COLUMN",
    DropColumnEvent: "DROP_COLUMN",
    RenameColumnEvent: "RENAME_COLUMN",
    AlterColumnTypeEvent: "ALTER_COLUMN_TYPE",
    TruncateTableEvent: "TRUNCATE_TABLE",
    DropTableEvent: "DROP_TABLE",
}

SCHEMA_CHANGE_EVENT_TYPES = tuple(_EVENT_TYPE_NAMES.values())
