"""Kafka changelog sink: debezium-json / canal-json serialization.

Parity target: flink-cdc-pipeline-connector-kafka (JsonSerializationType
debezium-json | canal-json; topic = table id by default, or a fixed topic).

The serialization path (envelope -> key/value JSON) is pure Catalyst
(``to_json``) and fully tested without a broker; the physical write uses
Spark's built-in Kafka batch writer when ``bootstrap.servers`` is given, or
a JSON-lines directory (one file tree per topic) for local runs/tests —
the bytes written are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..common.events import SchemaChangeEvent
from ..common.schema import Schema
from ..common.tableid import TableId
from ..sources.debezium import encode_canal, encode_debezium
from .base import DataSink, MetadataApplier


class _KafkaMetadataApplier(MetadataApplier):
    """Kafka has no DDL surface; schema changes only update the registry.
    (The reference's Kafka sink likewise applies nothing; consumers see the
    new fields appear in the JSON.)"""

    def apply_schema_change(self, table_id: TableId, event: SchemaChangeEvent,
                            evolved_schema: Schema) -> None:
        return


class KafkaChangelogSink(DataSink):
    def __init__(self, serialization: str = "debezium-json",
                 bootstrap_servers: str | None = None,
                 topic: str | None = None,
                 output_dir: str | None = None,
                 kafka_options: dict[str, str] | None = None):
        if serialization not in ("debezium-json", "canal-json"):
            raise ValueError(f"unknown serialization {serialization!r}")
        if not bootstrap_servers and not output_dir:
            raise ValueError("need bootstrap_servers (real Kafka) or output_dir (local)")
        self.serialization = serialization
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.output_dir = output_dir
        self.kafka_options = kafka_options or {}

    def metadata_applier(self) -> MetadataApplier:
        return _KafkaMetadataApplier()

    def _encode(self, table_id: TableId, df: DataFrame, schema: Schema) -> DataFrame:
        if self.serialization == "debezium-json":
            return encode_debezium(df, table_id, schema)
        return encode_canal(df, table_id, schema)

    def write(self, table_id: TableId, df: DataFrame, schema: Schema, batch_id: int) -> None:
        encoded = self._encode(table_id, df, schema)
        topic = self.topic or table_id.identifier()
        if self.bootstrap_servers:
            writer = (
                encoded.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")
                .write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("topic", topic)
            )
            for k, v in self.kafka_options.items():
                writer = writer.option(k, v)
            writer.save()
        else:
            out = os.path.join(self.output_dir, topic, f"batch_{batch_id}")
            if os.path.exists(out):
                return  # idempotent replay
            # write to a temp dir then atomically rename: a crash mid-write
            # must not leave a partial dir that replay would mistake for a
            # completed batch
            tmp = out + ".tmp"
            encoded.select(F.col("value")).write.mode("overwrite").text(tmp)
            os.rename(tmp, out)
