"""Mid-stream table discovery (P8 parallel-metadata path) and the
canal-json streaming serialization."""

import json
import os

from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import Column, Schema, TableId
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.streaming.runner import StreamingPipeline, file_stream_source

KNOWN = TableId.parse("inv.s.products")
NEW = TableId.parse("inv.s.categories")
SCHEMA = Schema.of(
    Column("id", T.LongType(), False),
    Column("name", T.StringType()),
    primary_keys=["id"],
)


def dbz(table, op, after=None, before=None, ts=0):
    return json.dumps({"before": before, "after": after, "op": op, "ts_ms": ts,
                       "source": {"db": "inv", "schema": "s", "table": table}})


def canal(table, ctype, data, old=None):
    return json.dumps({"old": old, "data": data, "type": ctype,
                       "database": "s", "table": table, "ts": 1})


def test_discovers_new_table_mid_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write("\n".join([
            dbz("products", "c", {"id": 1, "name": "bolt"}, ts=1),
            # table never registered up-front:
            dbz("categories", "c", {"id": 10, "name": "tools", "rank": 3}, ts=2),
            dbz("categories", "c", {"id": 11, "name": "parts", "rank": 1}, ts=3),
        ]))
    sink = MemorySink()
    pipe = StreamingPipeline.create(spark, sink, str(tmp_path / "ckpt"),
                                    discover_tables=True)
    q = pipe.start(file_stream_source(spark, src), {"inv.s.products": SCHEMA})
    q.awaitTermination(120)
    assert sink.snapshot(KNOWN) == ["1, bolt"]
    # discovered table landed with inferred schema (id, name, rank)
    assert sorted(sink.schemas[NEW].column_names()) == ["id", "name", "rank"]
    assert sink.row_count(NEW) == 2


def test_canal_stream_serialization(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write("\n".join([
            canal("products", "INSERT", [{"id": 1, "name": "bolt"},
                                         {"id": 2, "name": "nut"}]),
            canal("products", "UPDATE", [{"id": 2, "name": "nut2"}],
                  old=[{"id": 2, "name": "nut"}]),
            canal("products", "DELETE", [{"id": 1, "name": "bolt"}]),
        ]))
    sink = MemorySink()
    pipe = StreamingPipeline.create(spark, sink, str(tmp_path / "ckpt"),
                                    serialization="canal-json")
    # canal 'database' maps to the schema part of the 3-part id; register
    # with the matching 2-part id
    tid = TableId.parse("s.products")
    q = pipe.start(file_stream_source(spark, src), {"s.products": SCHEMA})
    q.awaitTermination(120)
    assert sink.snapshot(tid) == ["2, nut2"]


def test_canal_stream_discovers_new_table(spark, tmp_path):
    """Review regression: discovery must probe canal's envelope
    ($.database/$.table, image in $.data[0]) — the Debezium-only
    $.source.* probes silently discovered nothing for canal streams."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write("\n".join([
            canal("products", "INSERT", [{"id": 1, "name": "bolt"}]),
            # collection never registered up-front
            canal("tags", "INSERT", [{"id": 7, "label": "sale"}]),
            canal("tags", "INSERT", [{"id": 8, "label": "new"}]),
        ]))
    sink = MemorySink()
    pipe = StreamingPipeline.create(spark, sink, str(tmp_path / "ckpt"),
                                    serialization="canal-json",
                                    discover_tables=True)
    q = pipe.start(file_stream_source(spark, src), {"s.products": SCHEMA})
    q.awaitTermination(120)
    assert sink.snapshot(TableId.parse("s.products")) == ["1, bolt"]
    new = TableId.parse("s.tags")
    assert sorted(sink.schemas[new].column_names()) == ["id", "label"]
    assert sink.row_count(new) == 2
