"""Scripted in-memory source for tests and golden pipelines.

Parity target: the ``values`` pipeline connector
(flink-cdc-pipeline-connector-values/.../ValuesDataSourceHelper.java) — a
scripted list of events (create tables, inserts, DDL, updates, deletes)
driven through the full pipeline; the workhorse of the reference's IT cases
(SURVEY.md §5 layer 3).

Events are grouped into batches at schema-change boundaries: a batch is the
longest run of data events for the same set of schemas; each DDL starts a new
batch (mirroring how the streaming runner applies DDL between micro-batches).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, Row, SparkSession, functions as F, types as T

from ..common.events import (
    BEFORE_COL,
    META_COL,
    OP_COL,
    CreateTableEvent,
    DataChangeEvent,
    OpType,
    SchemaChangeEvent,
)
from ..common.schema import Schema
from ..common.tableid import TableId
from .base import ChangeBatch, DataSource, SEQ_COL


class ValuesSource(DataSource):
    def __init__(self, events: Sequence[object]):
        """``events``: ordered mix of SchemaChangeEvent / DataChangeEvent."""
        self.events = list(events)

    def create_table_events(self, spark: SparkSession) -> list[CreateTableEvent]:
        return [e for e in self.events if isinstance(e, CreateTableEvent)]

    def batches(self, spark: SparkSession) -> Iterator[list[ChangeBatch]]:
        # walk events; maintain current schema per table (DDL updates it);
        # cut a batch whenever a DDL arrives after data events.
        schemas: dict[TableId, Schema] = {}
        pending: dict[TableId, list[DataChangeEvent]] = {}
        pending_ddl: dict[TableId, list[SchemaChangeEvent]] = {}
        seq = 0

        def flush() -> list[ChangeBatch]:
            nonlocal pending, pending_ddl
            out: list[ChangeBatch] = []
            tables = list(dict.fromkeys(list(pending_ddl) + list(pending)))
            for tid in tables:
                df = None
                if pending.get(tid):
                    df = self._to_df(spark, schemas[tid], pending[tid])
                out.append(ChangeBatch(tid, pending_ddl.get(tid, []), df))
            pending, pending_ddl = {}, {}
            return out

        from ..operators.schema_evolution import apply_schema_change_event

        for ev in self.events:
            if isinstance(ev, SchemaChangeEvent):
                if pending:
                    yield flush()
                pending_ddl.setdefault(ev.table_id, []).append(ev)
                schemas[ev.table_id] = apply_schema_change_event(schemas.get(ev.table_id), ev)
            else:
                assert isinstance(ev, DataChangeEvent)
                ev = DataChangeEvent(ev.table_id, ev.op, ev.before, ev.after, ev.meta + (("__seq", str(seq)),))
                seq += 1
                pending.setdefault(ev.table_id, []).append(ev)
        if pending or pending_ddl:
            yield flush()

    @staticmethod
    def _to_df(spark: SparkSession, schema: Schema, events: list[DataChangeEvent]) -> DataFrame:
        phys = schema.struct_type()
        full = T.StructType(
            list(phys.fields)
            + [
                T.StructField(OP_COL, T.StringType(), False),
                T.StructField(BEFORE_COL, phys, True),
                T.StructField(META_COL, T.MapType(T.StringType(), T.StringType()), True),
                T.StructField(SEQ_COL, T.LongType(), False),
            ]
        )
        rows = []
        for e in events:
            meta = dict(e.meta)
            seq = int(meta.pop("__seq", "0"))
            image = e.after if e.after is not None else e.before
            before = e.before if e.op in (OpType.UPDATE_AFTER, OpType.DELETE) else None
            rows.append(tuple(image) + (e.op.value, before, meta or None, seq))
        return spark.createDataFrame(rows, full)
