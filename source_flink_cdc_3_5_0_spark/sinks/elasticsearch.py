"""Elasticsearch changelog sink — the ES ``_bulk`` wire format.

Parity target: flink-cdc-pipeline-connector-elasticsearch's
``ElasticsearchEventSerializer`` (ElasticsearchEventSerializer.java:140-170):
document ``_id`` = primary-key values joined with ``_``; INSERT/REPLACE/
UPDATE render an index operation carrying the full after-image, DELETE a
delete operation; the index name is the table id (optionally suffixed by a
sharding-column value, ``tableSharding`` :172-180); schema changes update
only the serializer's schema registry — Elasticsearch has no DDL surface
(dynamic mappings absorb new fields).

Spark-first shape: the batch reduces to ONE final image per key (the same
map-side-combinable reduction every keyed sink here uses), then the bulk
NDJSON renders entirely JVM-side (``to_json`` over structs — no Python),
giving byte-exact ``_bulk`` request bodies. With ``hosts`` unset the
batches spool to ``output_dir/<index>/batch_<id>.ndjson`` with
atomic-rename replay markers (the sandbox path, same spool contract as the
Kafka sink); posting to a live cluster is environment-gated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..common.events import OP_COL
from ..common.schema import Schema
from ..common.tableid import TableId
from ..sources.base import SEQ_COL
from .base import DataSink, MetadataApplier


class _EsMetadataApplier(MetadataApplier):
    """Elasticsearch has no DDL surface; schema changes only update the
    engine registry (dynamic mappings absorb added fields — the
    reference's applier likewise touches only its schema map)."""

    def apply_schema_change(self, table_id, event, evolved_schema) -> None:
        return


class ElasticsearchBulkSink(DataSink):
    def __init__(self, output_dir: str | None = None,
                 hosts: str | None = None,
                 shard_suffix_col: str | None = None):
        if hosts:
            raise NotImplementedError(
                "elasticsearch sink: posting to a live cluster is "
                "environment-gated (no server in this sandbox); the _bulk "
                "bodies spooled via output_dir are the exact request "
                "payloads a live writer POSTs")
        if not output_dir:
            raise ValueError("need output_dir (local _bulk spool) or hosts")
        self.output_dir = output_dir
        self.shard_suffix_col = shard_suffix_col

    def metadata_applier(self) -> MetadataApplier:
        return _EsMetadataApplier()

    def _index_name(self, table_id: TableId) -> F.Column:
        base = F.lit(table_id.identifier())
        if self.shard_suffix_col:
            # tableSharding: index = "<tableId>_<shard-column value>"
            return F.concat(base, F.lit("_"),
                            F.col(self.shard_suffix_col).cast("string"))
        return base

    def encode_bulk(self, table_id: TableId, df: DataFrame,
                    schema: Schema) -> DataFrame:
        """Changelog batch -> one ``lines`` string column of _bulk NDJSON
        (action line [+ source line for index ops])."""
        from ..streaming.materialize import latest_image

        pks = [k for k in schema.primary_keys if k in df.columns]
        if not pks:
            raise ValueError(
                f"elasticsearch sink requires primary keys for {table_id} "
                "(document _id = PK values, ElasticsearchEventSerializer)")
        phys = [c.name for c in schema.columns if c.name in df.columns]
        if OP_COL in df.columns:
            final = latest_image(
                df, pks, seq_col=SEQ_COL if SEQ_COL in df.columns else None,
                keep_delete_marker=True)
            op = F.col(OP_COL)
        else:
            final = df
            op = F.lit("+I")
        doc_id = F.concat_ws("_", *[F.col(k).cast("string") for k in pks])
        index = self._index_name(table_id)
        action_key = F.struct(index.alias("_index"), doc_id.alias("_id"))
        index_line = F.concat(
            F.to_json(F.struct(action_key.alias("index"))), F.lit("\n"),
            F.to_json(F.struct(*[F.col(c) for c in phys])))
        delete_line = F.to_json(F.struct(action_key.alias("delete")))
        return final.select(
            F.when(op == "-D", delete_line).otherwise(index_line)
            .alias("lines"))

    def write(self, table_id: TableId, df: DataFrame, schema: Schema,
              batch_id) -> None:
        out = os.path.join(self.output_dir, table_id.identifier(),
                           f"batch_{batch_id}")
        if os.path.exists(out):
            return  # idempotent replay (same spool contract as Kafka sink)
        tmp = out + ".tmp"
        self.encode_bulk(table_id, df, schema).write.mode("overwrite").text(tmp)
        os.rename(tmp, out)
