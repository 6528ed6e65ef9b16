"""Stream-stream event-time joins (Structured Streaming).

The reference's runtime has no stream join operator (SURVEY §2.4) — but its
CDC streams feed exactly this shape downstream (enrich a purchase stream
with the click that preceded it). On Spark this is a first-class stateful
operator: watermarks on BOTH inputs plus a time-range predicate let the
engine evict join state once the watermark passes the range, so state is
bounded by (watermark horizon × input rate) per key — the 100 TB-safe
configuration. An un-watermarked stream-stream join would buffer forever.

Same one-plan-two-modes contract as ``windowed.windowed_counts``: batch
inputs run the identical join minus watermarks, which is what the tests use
to check the streaming semantics against a plain batch join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same keys whose event time
    lies in ``[left_ts - lookback, left_ts]``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename before
    calling); key columns in ``on`` are shared names and are emitted once.
    Streaming inputs get ``watermark`` applied; the range predicate bounds
    state both directions, enabling eviction.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns shared by both sides would collide in the "
            f"output: {sorted(clash)}; rename before joining")
    l = (left.withWatermark(left_ts, watermark) if left.isStreaming else left) \
        .alias("__ssj_l")
    r = (right.withWatermark(right_ts, watermark) if right.isStreaming else right) \
        .alias("__ssj_r")
    # qualified names, not frame attributes: both sides may derive from the
    # same source (self-join), where l[k]/r[k] are ambiguous
    cond = F.expr(
        f"{right_ts} >= {left_ts} - INTERVAL {lookback} AND {right_ts} <= {left_ts}"
    )
    for k in on:
        cond = (F.col(f"__ssj_l.{k}") == F.col(f"__ssj_r.{k}")) & cond
    joined = l.join(r, cond, how)
    # shared key columns appear twice post-join; coalesce so outer joins
    # keep the real key from whichever side matched
    keep = [F.coalesce(F.col(f"__ssj_l.{k}"), F.col(f"__ssj_r.{k}")).alias(k)
            for k in on]
    keep += [F.col(f"__ssj_l.{c}") for c in left.columns if c not in on]
    keep += [F.col(f"__ssj_r.{c}") for c in right.columns if c not in on]
    return joined.select(*keep)
