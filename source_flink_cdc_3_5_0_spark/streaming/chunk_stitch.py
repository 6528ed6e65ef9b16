"""Per-chunk low/high-watermark snapshot consistency (DBLog protocol).

Parity target: the incremental-snapshot framework's chunk normalization —
`flink-cdc-base/.../reader/external/IncrementalSourceScanFetcher.java:145-200`
(`pollWithBuffer`: ``[low watermark][snapshot events][high watermark]
[change events][end watermark]`` in, ``[low][normalized events][high]`` out)
with the buffer rewrite rules of `JdbcSourceFetchTaskContext.java:82-119`
(CREATE/UPDATE upsert the after-image by key, DELETE removes the key, READ
is illegal in the change slice).

The protocol (Netflix DBLog; the papers behind `JdbcSourceChunkSplitter`):
each snapshot chunk is read WHILE the log keeps moving, so the raw chunk
query alone is not a consistent image. The fetcher brackets the chunk query
with two log positions — ``low`` (before the query) and ``high`` (after) —
and replays the log slice ``(low, high]`` restricted to the chunk's key
range over the keyed buffer. The result is exactly the chunk's state at
``high``: events at or before the snapshot point re-apply idempotently
(full-image upserts), events after it roll the image forward, deletes drop
keys the query saw but the log removed. Chunks may therefore be read at
DIFFERENT times with different watermark pairs and still stitch into one
table image with a well-defined per-range cutoff — the stream reader then
resumes each range after its own ``high``.

Spark mapping — no keyed driver buffer, one declarative plan:

- the per-chunk (bounds, low, high) table is control-plane-sized and
  BROADCAST onto the log; containment + ``low < seq <= high`` selects each
  chunk's replay slice (every event belongs to at most one chunk — chunks
  partition the split-key space);
- snapshot rows enter at their chunk's ``low`` sequence, replayed events
  keep their log sequence, and `latest_image` (one PK shuffle) picks the
  per-key winner — the buffer-rewrite loop expressed as a window rank;
- -U rows never represent final buffer state and are dropped, matching the
  reference where the replay consumes Debezium UPDATE records whose
  after-image is the rewrite value.

At 100 TB: the only shuffle is the PK hash for the final rank — the same
exchange the sink merge needs anyway, so chunk normalization is free at
plan level; the watermark table is O(chunks) and broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..common.events import BEFORE_COL, META_COL, OP_COL
from ..sources.base import SEQ_COL
from ..sources.jdbc import ChunkRange
from .materialize import latest_image


@dataclass(frozen=True)
class ChunkWatermarks:
    """One snapshot chunk's key range and its bracketing log positions.

    ``low`` is the log position captured immediately before the chunk
    query, ``high`` immediately after (HybridSplitAssigner records the
    same pair per split). The replay slice is ``(low, high]``.
    """

    chunk: ChunkRange
    low: int
    high: int


def _chunk_bounds_df(spark, marks: list[ChunkWatermarks]):
    rows = [(i, m.chunk.start, m.chunk.end, m.low, m.high)
            for i, m in enumerate(marks)]
    return spark.createDataFrame(
        rows, "__chunk INT, __start BIGINT, __end BIGINT, "
              "__low BIGINT, __high BIGINT")


def _containment(key, start_col, end_col):
    lo = start_col.isNull() | (key >= start_col)
    hi = end_col.isNull() | (key < end_col)
    return lo & hi


def consistent_chunk_image(snapshot_df: DataFrame, log_df: DataFrame,
                           pk_cols: list[str], split_col: str,
                           marks: list[ChunkWatermarks],
                           seq_col: str = SEQ_COL) -> DataFrame:
    """Normalize chunked snapshot reads against the moving log.

    ``snapshot_df``: the union of the raw per-chunk snapshot queries
    (plain rows — each chunk's rows were read somewhere between its
    ``low`` and ``high``). ``log_df``: the change stream in engine
    envelope form (``__op``/``__seq``; update events as single +U rows
    carrying the after-image, optional ``-U`` rows ignored). Returns the
    consistent table image: for every chunk, exactly its state at that
    chunk's ``high`` watermark.

    Integer split keys only (the reference brackets PK-range chunks the
    same way); keys outside every chunk are dropped from the log slice —
    they belong to another split's replay.
    """
    spark = snapshot_df.sparkSession
    bounds = F.broadcast(_chunk_bounds_df(spark, marks))
    key = F.col(split_col)

    snap = (snapshot_df
            .join(bounds, _containment(key, F.col("__start"), F.col("__end")))
            .select(*snapshot_df.columns,
                    F.lit("+I").alias(OP_COL),
                    F.col("__low").alias(seq_col)))

    payload = [c for c in log_df.columns
               if c not in (OP_COL, BEFORE_COL, META_COL, seq_col)]
    replay = (log_df
              .where(F.col(OP_COL) != "-U")
              .join(bounds, _containment(key, F.col("__start"),
                                         F.col("__end")) &
                    (F.col(seq_col) > F.col("__low")) &
                    (F.col(seq_col) <= F.col("__high")))
              .select(*payload, F.col(OP_COL), F.col(seq_col)))

    both = snap.select(*payload, OP_COL, seq_col).unionByName(replay)
    return (latest_image(both, pk_cols, seq_col=seq_col)
            .drop(OP_COL, seq_col))
