"""Parquet snapshot source — the batch ('initial snapshot only') path.

Parity target: the snapshot phase of the incremental-snapshot framework
(flink-cdc-base/.../assigner/splitter/JdbcSourceChunkSplitter.java) with
``StartupOptions.snapshot()`` (bounded read). On Spark a parallel chunked
snapshot of a table IS a parquet/JDBC scan: the DataSource V2 reader splits
by row-groups/ranges, so chunk assignment, even/uneven splitting and
per-chunk watermarks all collapse into Spark's native scan machinery — by
design we add nothing on top (SURVEY.md §2.2 mapping).

Tables are declared with their ids; schemas are inferred from parquet footers
(the analog of schema discovery at snapshot start).
"""

from __future__ import annotations

import os
from typing import Iterator, Mapping

from pyspark.sql import SparkSession

from ..common.events import CreateTableEvent
from ..common.schema import Schema
from ..common.tableid import TableId
from .base import ChangeBatch, DataSource, attach_envelope


class ParquetSnapshotSource(DataSource):
    def __init__(self, tables: Mapping[str, str], primary_keys: Mapping[str, list[str]] | None = None):
        """``tables``: table-id string -> parquet path.
        ``primary_keys``: table-id string -> PK column list (parquet has no PK
        metadata; the reference reads PKs from the database catalog)."""
        self.tables = {TableId.parse(t): p for t, p in tables.items()}
        self.pks = {TableId.parse(t): tuple(v) for t, v in (primary_keys or {}).items()}

    def _schema(self, spark: SparkSession, tid: TableId) -> Schema:
        st = spark.read.parquet(self.tables[tid]).schema
        return Schema.from_struct_type(st, primary_keys=self.pks.get(tid, ()))

    def create_table_events(self, spark: SparkSession) -> list[CreateTableEvent]:
        return [CreateTableEvent(tid, self._schema(spark, tid)) for tid in self.tables]

    def batches(self, spark: SparkSession) -> Iterator[list[ChangeBatch]]:
        out = []
        for tid, path in self.tables.items():
            df = attach_envelope(spark.read.parquet(path))
            out.append(ChangeBatch(tid, [], df))
        yield out
