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

import hashlib
import os

from .base import DataSink, MetadataApplier
from .dialects import MaxComputeDialect
from .parquet_sink import ParquetUpsertSink


class _MaxComputeMetadataApplier(MetadataApplier):
    """Renders the DDL spool AND evolves the parquet stand-in."""

    def __init__(self, sink: "MaxComputeSink"):
        self.sink = sink
        self.sql = MaxComputeDialect()
        self._inner = sink._parquet.metadata_applier()

    def apply_schema_change(self, table_id, event, evolved_schema) -> None:
        tdir = os.path.join(self.sink.root, table_id.identifier())
        os.makedirs(tdir, exist_ok=True)
        stmts = self.sql.ddl_sql(table_id.identifier(), event,
                                 evolved_schema)
        # replay idempotence: same discipline as the Stream Load spool —
        # a statement group identical to the LAST appended one is a
        # restarted micro-batch's replay, never a legal distinct change
        digest = hashlib.md5("\n".join(stmts).encode()).hexdigest()
        marker = os.path.join(tdir, "_ddl_last")
        if os.path.exists(marker):
            with open(marker) as f:
                if f.read().strip() == digest:
                    return
        with open(os.path.join(tdir, "ddl.sql"), "a") as f:
            for s in stmts:
                f.write(s + ";\n")
        with open(marker, "w") as f:
            f.write(digest)
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
