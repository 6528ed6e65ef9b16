"""Doris / StarRocks changelog sinks — the Stream Load wire format.

Parity targets:
- StarRocks: ``EventRecordSerializationSchema`` (EventRecordSerialization-
  Schema.java:112-136) — each change event renders as one JSON row carrying
  every physical column plus ``"__op": 0`` (upsert) / ``"__op": 1``
  (delete); rows batch into a Stream Load request body (JSON-lines).
- Doris: ``DorisEventSerializer`` (DorisEventSerializer.java:105-118) —
  identical shape with the delete marker spelled
  ``"__DORIS_DELETE_SIGN__": "0"/"1"``; DDL goes through
  ``DorisMetadataApplier`` (DorisMetadataApplier.java:117-141), which
  renders per-event ALTER statements (Doris speaks the MySQL dialect).

Spark-first shape: the batch reduces to ONE final image per key, the
JSON-lines body renders entirely JVM-side (``to_json``), giving byte-exact
Stream Load payloads. With no frontend endpoint configured the bodies
spool to ``output_dir/<table>/batch_<id>`` with atomic-rename replay
markers, and the DDL statements append to ``output_dir/<table>/ddl.sql``
(MySQL dialect — what a live Doris/StarRocks applier executes); the HTTP
PUT of a live Stream Load is environment-gated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..common.events import OP_COL
from ..common.schema import Schema
from ..common.tableid import TableId
from ..sources.base import SEQ_COL
from .base import DataSink, MetadataApplier
from .ddl_spool import DdlSpoolPosition, is_replay, spool_ddl
from .dialects import MySqlDialect


class _StreamLoadMetadataApplier(MetadataApplier):
    """7-event algebra rendered as MySQL-dialect DDL text (Doris/StarRocks
    speak the MySQL protocol) and appended to the table's ddl.sql spool —
    the statements a live SchemaChangeManager executes.  Replay
    idempotence is the exact batch-scoped discipline of
    :mod:`.ddl_spool`: only a crash-replayed group is skipped; genuine
    repeats (TRUNCATE → load → TRUNCATE) keep every statement."""

    def __init__(self, sink: "_StreamLoadSink"):
        self.sink = sink
        self.sql = MySqlDialect()

    def apply_schema_change(self, table_id, event, evolved_schema) -> None:
        tdir = os.path.join(self.sink.output_dir, table_id.identifier())
        stmts = self.sql.ddl_sql(table_id.identifier(), event,
                                 evolved_schema)
        ordinal = self.sink._ddl_pos.next_ordinal(tdir, self.batch_ctx)
        if not is_replay(tdir, self.batch_ctx, ordinal, stmts):
            spool_ddl(tdir, stmts, self.batch_ctx, ordinal)


class _StreamLoadSink(DataSink):
    """Shared Stream Load spool machinery; subclasses define the delete
    marker column."""

    #: (column name, value-for-upsert Column, value-for-delete Column)
    def _op_column(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __init__(self, output_dir: str | None = None,
                 frontend: str | None = None):
        if frontend:
            raise NotImplementedError(
                f"{type(self).__name__}: posting Stream Load to a live "
                "frontend is environment-gated (no server in this "
                "sandbox); the spooled bodies are the exact payloads")
        if not output_dir:
            raise ValueError("need output_dir (local spool) or frontend")
        self.output_dir = output_dir
        self._ddl_pos = DdlSpoolPosition()

    def begin_batch(self, batch_id) -> None:
        self._ddl_pos.reset()

    def metadata_applier(self) -> MetadataApplier:
        return _StreamLoadMetadataApplier(self)

    def encode_stream_load(self, table_id: TableId, df: DataFrame,
                           schema: Schema) -> DataFrame:
        """Changelog batch -> one JSON-lines string column (``lines``) —
        the exact Stream Load request body."""
        from ..streaming.materialize import latest_image

        pks = [k for k in schema.primary_keys if k in df.columns]
        phys = [c.name for c in schema.columns if c.name in df.columns]
        if OP_COL in df.columns:
            if not pks:
                raise ValueError(
                    f"{type(self).__name__} requires primary keys for "
                    f"{table_id} (delete markers retract by key)")
            final = latest_image(
                df, pks, seq_col=SEQ_COL if SEQ_COL in df.columns else None,
                keep_delete_marker=True)
            op = F.col(OP_COL)
        else:
            final = df
            op = F.lit("+I")
        name, up_val, del_val = self._op_column()
        marker = F.when(op == "-D", del_val).otherwise(up_val).alias(name)
        return final.select(
            F.to_json(F.struct(*[F.col(c) for c in phys], marker))
            .alias("lines"))

    def write(self, table_id: TableId, df: DataFrame, schema: Schema,
              batch_id) -> None:
        out = os.path.join(self.output_dir, table_id.identifier(),
                           f"batch_{batch_id}")
        if os.path.exists(out):
            return  # idempotent replay
        tmp = out + ".tmp"
        self.encode_stream_load(table_id, df, schema) \
            .write.mode("overwrite").text(tmp)
        os.rename(tmp, out)


class StarRocksStreamLoadSink(_StreamLoadSink):
    """StarRocks primary-key-model Stream Load: ``__op`` 0=upsert,
    1=delete (EventRecordSerializationSchema.java:136)."""

    def _op_column(self):
        return "__op", F.lit(0), F.lit(1)


class DorisStreamLoadSink(_StreamLoadSink):
    """Doris unique-key-model Stream Load: ``__DORIS_DELETE_SIGN__``
    "0"=upsert, "1"=delete (DorisEventSerializer addDeleteSign)."""

    def _op_column(self):
        return "__DORIS_DELETE_SIGN__", F.lit("0"), F.lit("1")
