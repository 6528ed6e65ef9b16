"""As-of (temporal) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row with the same key whose
timestamp is <= (or < when ``strict``) the left timestamp. Implemented
shuffle-lean as the union-and-window trick (no range cross-join, no per-key
Python):

1. tag left/right, union on the common (key, ts) spine;
2. one hash shuffle on the key, sort by (ts, tag) within partitions;
3. ``last(right payload, ignoreNulls)`` over rows-unbounded-preceding
   carries the most recent right image forward;
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows — the same shape Spark uses for window
aggregation; key skew is handled by AQE. This is the standard scalable
as-of pattern (pandas ``merge_asof`` semantics, kdb+ ``aj``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_payload: list[str] | None = None,
              strict: bool = False) -> DataFrame:
    """Returns ``left`` columns + the as-of right payload columns (null when
    no earlier right row exists for the key)."""
    payload = right_payload or [c for c in right.columns if c not in on + [right_ts]]

    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    r_struct = F.struct(*[F.col(c) for c in payload]).alias("__r")
    l_type = left.select(l_struct).schema["__l"].dataType
    r_type = right.select(r_struct).schema["__r"].dataType

    lt = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        l_struct,
        F.lit(None).cast(r_type).alias("__r"),
    )
    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct,
    )
    unioned = lt.unionByName(rt)

    # tie order at equal ts: '<=' semantics -> right first (left sees it);
    # strict '<' -> left first (left must not see the equal-ts right row)
    tag_order = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (Window.partitionBy(*[F.col(c) for c in on])
         .orderBy(F.col("__ts").asc(), tag_order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("__asof", F.last("__r", ignorenulls=True).over(w))

    return carried.where(F.col("__is_left") == 1).select(
        "__l.*",
        *[F.col("__asof")[c].alias(c) for c in payload],
    )
