"""Per-chunk low/high-watermark snapshot normalization (DBLog protocol).

Reference parity: IncrementalSourceScanFetcher.pollWithBuffer
(flink-cdc-base/.../external/IncrementalSourceScanFetcher.java:145-200) +
JdbcSourceFetchTaskContext.rewriteOutputBuffer (:82-119): a chunk read
bracketed by (low, high] log positions, replayed over the keyed buffer,
must equal the chunk's state at its OWN high watermark.
"""

import random

import pytest
from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.common.events import OP_COL
from source_flink_cdc_3_5_0_spark.sources.base import SEQ_COL
from source_flink_cdc_3_5_0_spark.sources.jdbc import ChunkRange
from source_flink_cdc_3_5_0_spark.streaming.chunk_stitch import (
    ChunkWatermarks, consistent_chunk_image,
)

SCHEMA = f"k LONG, v LONG, {OP_COL} STRING, {SEQ_COL} LONG"


def _state_at(history, seq_point):
    """Model: replay the full history up to seq_point -> {key: value}."""
    st = {}
    for key, op, val, seq in history:
        if seq > seq_point:
            break
        if op == "-D":
            st.pop(key, None)
        else:
            st[key] = val
    return st


def _random_history(rng, n_keys, n_ops):
    """Valid keyed history: insert when absent, update/delete when present."""
    live, hist = set(), []
    for seq in range(1, n_ops + 1):
        key = rng.randrange(n_keys)
        if key not in live:
            hist.append((key, "+I", rng.randrange(10_000), seq))
            live.add(key)
        elif rng.random() < 0.25:
            hist.append((key, "-D", None, seq))
            live.discard(key)
        else:
            hist.append((key, "+U", rng.randrange(10_000), seq))
    return hist


@pytest.mark.parametrize("trial", range(4))
def test_chunk_image_matches_state_at_high_watermark(spark, trial):
    rng = random.Random(100 + trial)
    n_keys, n_ops = 60, 500
    hist = _random_history(rng, n_keys, n_ops)

    # random contiguous chunks over the key space
    n_cuts = rng.randrange(1, 5)
    cuts = sorted(rng.sample(range(1, n_keys), n_cuts))
    bounds = [None] + cuts + [None]
    marks, snap_rows = [], []
    for i in range(len(bounds) - 1):
        lo_k, hi_k = bounds[i], bounds[i + 1]
        low = rng.randrange(0, n_ops)
        high = rng.randrange(low, n_ops + 1)
        s_point = rng.randrange(low, high + 1)  # snapshot query instant
        marks.append(ChunkWatermarks(ChunkRange(lo_k, hi_k), low, high))
        for key, val in _state_at(hist, s_point).items():
            if (lo_k is None or key >= lo_k) and (hi_k is None or key < hi_k):
                snap_rows.append((key, val))

    snap = spark.createDataFrame(snap_rows or [(None, None)], "k LONG, v LONG") \
        .where(F.col("k").isNotNull())
    log = spark.createDataFrame(
        [(k, v, op, s) for k, v, op, s in
         ((k, v if v is not None else 0, op, s) for k, op, v, s in hist)],
        SCHEMA)
    got = {(r["k"], r["v"]) for r in
           consistent_chunk_image(snap, log, ["k"], "k", marks).collect()}

    exp = set()
    for i in range(len(bounds) - 1):
        lo_k, hi_k = bounds[i], bounds[i + 1]
        for key, val in _state_at(hist, marks[i].high).items():
            if (lo_k is None or key >= lo_k) and (hi_k is None or key < hi_k):
                exp.add((key, val))
    assert got == exp


def test_protocol_behaviors_explicit(spark):
    """The four rewrite behaviors: idempotent re-apply, forward roll,
    remove-of-missing, delete of a snapshot-visible key."""
    # history: k1 ins@1 upd@5; k2 ins@2 del@6; k3 ins@7 (after snapshot);
    # k4 ins@3
    snap = spark.createDataFrame(
        # snapshot taken at seq 5: k1 already updated (idempotent
        # re-apply of upd@5 must not change it), k2 visible, k4 visible
        [(1, 50), (2, 20), (4, 40)], "k LONG, v LONG")
    log = spark.createDataFrame(
        [(1, 10, "+I", 1), (2, 20, "+I", 2), (4, 40, "+I", 3),
         (1, 50, "+U", 5), (2, 0, "-D", 6), (3, 30, "+I", 7),
         (9, 0, "-D", 4)],  # delete of never-seen key -> no-op
        SCHEMA)
    marks = [ChunkWatermarks(ChunkRange(None, None), 0, 8)]
    got = {(r["k"], r["v"]) for r in
           consistent_chunk_image(snap, log, ["k"], "k", marks).collect()}
    assert got == {(1, 50), (3, 30), (4, 40)}


def test_events_outside_slice_ignored(spark):
    """Events past a chunk's high watermark belong to the stream phase;
    events at or below low were already reflected (or belong upstream)."""
    snap = spark.createDataFrame([(1, 10)], "k LONG, v LONG")
    log = spark.createDataFrame(
        [(1, 99, "+U", 3),   # seq <= low: not replayed
         (1, 77, "+U", 20)],  # seq > high: not replayed
        SCHEMA)
    marks = [ChunkWatermarks(ChunkRange(None, None), 3, 10)]
    got = consistent_chunk_image(snap, log, ["k"], "k", marks).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, 10)]


def test_update_before_rows_dropped(spark):
    snap = spark.createDataFrame([(1, 10)], "k LONG, v LONG")
    log = spark.createDataFrame(
        [(1, 10, "-U", 4), (1, 55, "+U", 5)], SCHEMA)
    marks = [ChunkWatermarks(ChunkRange(None, None), 0, 9)]
    got = consistent_chunk_image(snap, log, ["k"], "k", marks).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, 55)]


def test_per_chunk_cutoffs_differ(spark):
    """Two chunks, different highs: the same global update lands in one
    chunk's image but not the other's."""
    snap = spark.createDataFrame([(1, 10), (5, 50)], "k LONG, v LONG")
    log = spark.createDataFrame(
        [(1, 11, "+U", 7), (5, 51, "+U", 7)], SCHEMA)
    marks = [ChunkWatermarks(ChunkRange(None, 4), 0, 5),   # high < 7
             ChunkWatermarks(ChunkRange(4, None), 0, 9)]   # high >= 7
    got = {(r["k"], r["v"]) for r in
           consistent_chunk_image(snap, log, ["k"], "k", marks).collect()}
    assert got == {(1, 10), (5, 51)}
