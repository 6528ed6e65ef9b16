"""MaxCompute (ODPS) pipeline sink — reference parity for the
flink-cdc-pipeline-connector-maxcompute module without a live project.

The reference's writer streams batches through Tunnel UPSERT sessions
into TRANSACTIONAL (primary-key, bucketed) tables
(MaxComputeEventWriter.java, MaxComputeHashFunctionProvider.java) and its
MetadataApplier executes the 7-event DDL algebra as SQLTask statements
(SchemaEvolutionUtils.java:63-240).  Here:

- **data plane**: the bucketed copy-on-write parquet PK-upsert stand-in
  (the same changelog contract — keyed upsert/delete, idempotent batch
  replay, bucket count = the table's ``write.bucket.num``); a live
  Tunnel endpoint (``accessId``/``endpoint``/``project`` options) is
  refused as environment-gated rather than silently redirected.
- **metadata plane**: every schema event is ALSO rendered as the exact
  MaxCompute SQL text the reference's SchemaEvolutionUtils would run
  (``sinks/dialects.MaxComputeDialect``, statements pinned in
  tests/test_sink_conformance) and appended to the table's ``ddl.sql``
  spool with replay-idempotent markers — the slot-in surface for a live
  SQLTask executor.
"""

from __future__ import annotations

import os

from .base import DataSink, MetadataApplier
from .ddl_spool import clear_replay_marker, spool_ddl
from .dialects import MaxComputeDialect
from .parquet_sink import ParquetUpsertSink


class _MaxComputeMetadataApplier(MetadataApplier):
    """Renders the DDL spool AND evolves the parquet stand-in.  The
    data-plane apply is UNCONDITIONAL — only the spool append is
    replay-gated (a replayed TRUNCATE on an already-truncated table is a
    data-plane no-op anyway, while skipping it would drop a real event
    that follows data writes)."""

    def __init__(self, sink: "MaxComputeSink"):
        self.sink = sink
        self.sql = MaxComputeDialect()
        self._inner = sink._parquet.metadata_applier()

    def apply_schema_change(self, table_id, event, evolved_schema) -> None:
        tdir = os.path.join(self.sink.root, table_id.identifier())
        spool_ddl(tdir, self.sql.ddl_sql(table_id.identifier(), event,
                                         evolved_schema))
        self._inner.apply_schema_change(table_id, event, evolved_schema)


class MaxComputeSink(DataSink):
    """YAML ``type: maxcompute`` with a local ``path``; ``buckets-num``
    maps to the reference's MaxComputeOptions bucket count."""

    def __init__(self, path: str, num_buckets: int = 16):
        self.root = path
        self._parquet = ParquetUpsertSink(path, num_buckets=num_buckets)

    def metadata_applier(self) -> MetadataApplier:
        return _MaxComputeMetadataApplier(self)

    def write(self, table_id, df, schema, batch_id) -> None:
        self._parquet.write(table_id, df, schema, batch_id)
        # a data batch re-arms the DDL spool: the next identical DDL
        # group is a real repeat (TRUNCATE → load → TRUNCATE), not a
        # restarted micro-batch's replay
        clear_replay_marker(self.sink_root(table_id))

    def sink_root(self, table_id) -> str:
        return os.path.join(self.root, table_id.identifier())
