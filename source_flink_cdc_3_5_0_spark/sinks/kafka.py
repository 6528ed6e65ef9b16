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
                 kafka_options: dict[str, str] | None = None,
                 partition_strategy: str = "all-to-zero",
                 add_table_to_header: bool = False):
        if serialization not in ("debezium-json", "canal-json"):
            raise ValueError(f"unknown serialization {serialization!r}")
        if partition_strategy not in ("all-to-zero", "hash-by-key"):
            # PartitionStrategy.java:26-29
            raise ValueError(
                f"unknown partition.strategy {partition_strategy!r} "
                "(all-to-zero | hash-by-key)")
        if not bootstrap_servers and not output_dir:
            raise ValueError("need bootstrap_servers (real Kafka) or output_dir (local)")
        self.serialization = serialization
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.output_dir = output_dir
        self.kafka_options = kafka_options or {}
        self.partition_strategy = partition_strategy
        self.add_table_to_header = add_table_to_header

    def metadata_applier(self) -> MetadataApplier:
        return _KafkaMetadataApplier()

    def _encode(self, table_id: TableId, df: DataFrame, schema: Schema) -> DataFrame:
        if self.serialization == "debezium-json":
            return encode_debezium(df, table_id, schema)
        return encode_canal(df, table_id, schema)

    def encode_records(self, table_id: TableId, df: DataFrame,
                       schema: Schema) -> DataFrame:
        """Producer-record columns, reference parity
        (PipelineKafkaRecordSerializationSchema.java:102-135):
        ``partition`` = 0 under all-to-zero (the default — total order per
        topic), ABSENT under hash-by-key (the producer's partitioner hashes
        the record key, preserving per-key order); optional tableId headers
        (namespace/schemaName/tableName) when
        ``sink.add.tableId.to.header.enabled``."""
        out = self._encode(table_id, df, schema)
        if self.partition_strategy == "all-to-zero":
            out = out.withColumn("partition", F.lit(0).cast("int"))
        if self.add_table_to_header:
            hdr = F.array(*[
                F.struct(F.lit(k).alias("key"),
                         F.lit(v or "").cast("binary").alias("value"))
                for k, v in (("namespace", table_id.namespace),
                             ("schemaName", table_id.schema_name),
                             ("tableName", table_id.table_name))])
            out = out.withColumn("headers", hdr)
        return out

    def write(self, table_id: TableId, df: DataFrame, schema: Schema, batch_id: int) -> None:
        encoded = self.encode_records(table_id, df, schema)
        topic = self.topic or table_id.identifier()
        if self.bootstrap_servers:
            extra = [c for c in ("partition", "headers")
                     if c in encoded.columns]
            writer = (
                encoded.selectExpr("CAST(key AS STRING) key",
                                   "CAST(value AS STRING) value", *extra)
                .write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("topic", topic)
                .option("includeHeaders", "true")
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
