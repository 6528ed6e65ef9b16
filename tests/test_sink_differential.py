"""Differential sink testing: seeded-random changelog scripts through
every stateful sink (memory golden, parquet upsert, lake cow, lake mor,
jdbc/sqlite), asserting the IDENTICAL final state. Complements the fixed
conformance script with randomized op interleavings, replays and
truncates — the cheap cross-engine analog of the reference's e2e matrix."""

import random

import pytest
from pyspark.sql import types as T

from source_flink_cdc_3_5_0_spark.common import (
    Column,
    CreateTableEvent,
    DataChangeEvent,
    Schema,
    TableId,
)
from source_flink_cdc_3_5_0_spark.common.events import TruncateTableEvent
from source_flink_cdc_3_5_0_spark.sinks.jdbc_sink import JdbcUpsertSink
from source_flink_cdc_3_5_0_spark.sinks.lakehouse import SnapshotLakeSink
from source_flink_cdc_3_5_0_spark.sinks.memory import MemorySink
from source_flink_cdc_3_5_0_spark.sinks.parquet_sink import ParquetUpsertSink
from source_flink_cdc_3_5_0_spark.sources.values import ValuesSource

TID = TableId.parse("diff.db.t")
SCHEMA = Schema.of(Column("id", T.IntegerType(), False),
                   Column("v", T.StringType()),
                   Column("n", T.LongType()),
                   primary_keys=["id"])


def _script(seed, n_batches=4, ops_per_batch=8):
    """Deterministic random script: batches of insert/update/delete over a
    small key space (forced collisions), one mid-script TRUNCATE, one
    replayed batch."""
    rng = random.Random(seed)
    state = {}
    batches = []
    truncate_before = rng.randrange(1, n_batches)
    for b in range(n_batches):
        if b == truncate_before:
            batches.append(("truncate", None))
            state.clear()
        events = []
        for i in range(ops_per_batch):
            k = rng.randrange(12)
            kind = rng.random()
            if k in state and kind < 0.3:
                events.append(DataChangeEvent.delete(TID, state.pop(k)))
            elif k in state and kind < 0.65:
                old = state[k]
                new = (k, f"v{b}.{i}", rng.randrange(1000))
                state[k] = new
                events.append(DataChangeEvent.update(TID, old, new))
            elif k not in state:
                row = (k, f"i{b}.{i}", rng.randrange(1000))
                state[k] = row
                events.append(DataChangeEvent.insert(TID, row))
            elif k in state:
                # upsert-style re-insert of an existing key: model as update
                old = state[k]
                new = (k, f"r{b}.{i}", rng.randrange(1000))
                state[k] = new
                events.append(DataChangeEvent.update(TID, old, new))
        batches.append(("data", events))
    n_data = sum(1 for kind, _ in batches if kind == "data")
    replay_at = rng.randrange(n_data)  # bid counts DATA batches only
    return batches, replay_at, set(state.values())


def _drive(spark, sink, batches, replay_at):
    ap = sink.metadata_applier()
    ap.apply_schema_change(TID, CreateTableEvent(TID, SCHEMA), SCHEMA)
    bid = 0
    for kind, events in batches:
        if kind == "truncate":
            ap.apply_schema_change(TID, TruncateTableEvent(TID), SCHEMA)
            continue
        seq = [DataChangeEvent(e.table_id, e.op, e.before, e.after,
                               e.meta + (("__seq", str(i)),))
               for i, e in enumerate(events)]
        df = ValuesSource._to_df(spark, SCHEMA, seq)
        sink.write(TID, df, SCHEMA, batch_id=bid)
        if bid == replay_at:
            sink.write(TID, df, SCHEMA, batch_id=bid)  # replay no-op
        bid += 1


def _state_memory(sink, spark):
    return {(r["id"], r["v"], r["n"]) for r in sink.state[TID].values()}


def _state_read(sink, spark):
    return {(r["id"], r["v"], r["n"])
            for r in sink.read(spark, TID).collect()}


def _state_jdbc(sink, spark):
    return {(r["id"], r["v"], r["n"])
            for r in sink.read(spark, TID, SCHEMA).collect()}


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_all_sinks_agree_on_random_scripts(spark, tmp_path, seed):
    batches, replay_at, expected = _script(seed)
    sinks = {
        "memory": (MemorySink(), _state_memory),
        "parquet": (ParquetUpsertSink(str(tmp_path / "pq"), num_buckets=3),
                    _state_read),
        "lake_cow": (SnapshotLakeSink(str(tmp_path / "cow"), num_buckets=3),
                     _state_read),
        "lake_mor": (SnapshotLakeSink(str(tmp_path / "mor"), num_buckets=3,
                                      mode="mor"), _state_read),
        "jdbc": (JdbcUpsertSink(str(tmp_path / "s.db")), _state_jdbc),
    }
    got = {}
    for name, (sink, reader) in sinks.items():
        _drive(spark, sink, batches, replay_at)
        got[name] = reader(sink, spark)
    assert got["memory"] == expected, "python-model mismatch"
    for name, st in got.items():
        assert st == expected, (name, st ^ expected)


def test_memory_sink_write_loop_edges(spark):
    """Pin the r11 positional rewrite of MemorySink.write against its
    documented edge cases: null seqs apply FIRST in arrival order, -U
    rows carry no state, -D drops, a schema column absent from the batch
    df lands as None in schema order, and a PK column absent from the
    batch keys as None (pre-evolution batches)."""
    from pyspark.sql import Row

    sink = MemorySink()
    # batch df carries (id, v) but NOT n; __seq has nulls interleaved
    df = spark.createDataFrame(
        [Row(id=1, v="late", __op="+I", __seq=5),
         Row(id=1, v="arrival-a", __op="+I", __seq=None),
         Row(id=2, v="gone", __op="+I", __seq=None),
         Row(id=1, v="arrival-b", __op="+U", __seq=None),
         Row(id=2, v=None, __op="-D", __seq=6),
         Row(id=3, v="before-img", __op="-U", __seq=7),
         Row(id=1, v="winner", __op="+U", __seq=9)],
        "id INT, v STRING, __op STRING, __seq LONG")
    sink.write(TID, df, SCHEMA, batch_id=0)
    # null-seq rows applied first (arrival order), then seq order; the
    # seq-9 update wins key 1; key 2 deleted at seq 6; -U left no state
    assert sink.state[TID] == {
        (1,): {"id": 1, "v": "winner", "n": None}}
    # dict insertion order must follow the schema's column order
    assert list(sink.state[TID][(1,)].keys()) == ["id", "v", "n"]

    # PK column absent from the batch: key part is None (legacy contract)
    sink2 = MemorySink()
    df2 = spark.createDataFrame(
        [Row(v="x", n=1, __op="+I", __seq=1)],
        "v STRING, n LONG, __op STRING, __seq LONG")
    sink2.write(TID, df2, SCHEMA, batch_id=0)
    assert sink2.state[TID] == {(None,): {"id": None, "v": "x", "n": 1}}
