"""Range / interval join — bucketed implementation of an inequality join.

Joining L to R on ``L.key = R.key AND R.ts ∈ [L.ts - before, L.ts + after]``
naively forces a cross-join per key. The scalable pattern (same as
Databricks' range-join optimization and Flink's interval join) buckets both
sides by ``floor(ts / bin)`` with ``bin = before + after``: every matching
pair is at most one bin apart, so L explodes to its bin and the two adjacent
bins and the join becomes an equi-join on (key, bin) — shuffle O(3·|L| +
|R|), then an exact range filter prunes false candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_ts: str,
                  before: str = "0 seconds", after: str = "0 seconds") -> DataFrame:
    """All (L, R) pairs with same key and ``R.ts`` within
    ``[L.ts - before, L.ts + after]`` (both interval strings).

    Output: left columns + right's non-key columns (right ``ts`` kept).
    """
    lo = F.col(left_ts) - F.expr(f"INTERVAL {before}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {after}")
    bin_expr_parts = f"INTERVAL {before}", f"INTERVAL {after}"
    # bin width in microseconds, computed JVM-side from the two intervals
    bin_us = F.greatest(
        (F.unix_micros(F.to_timestamp(F.lit("1970-01-01 00:00:00"))
                       + F.expr(bin_expr_parts[0]) + F.expr(bin_expr_parts[1]))),
        F.lit(1),
    )

    l = left.withColumn("__lo", lo).withColumn("__hi", hi).withColumn("__bin_us", bin_us)
    l = l.withColumn(
        "__bin",
        F.explode(F.array(
            (F.unix_micros(F.col(left_ts)) / F.col("__bin_us")).cast("long") - 1,
            (F.unix_micros(F.col(left_ts)) / F.col("__bin_us")).cast("long"),
            (F.unix_micros(F.col(left_ts)) / F.col("__bin_us")).cast("long") + 1,
        )),
    )
    r = right.withColumn("__bin_us", bin_us).withColumn(
        "__bin", (F.unix_micros(F.col(right_ts)) / F.col("__bin_us")).cast("long"))

    joined = l.join(r.drop("__bin_us"), on=on + ["__bin"], how="inner")
    # each matching pair joins exactly once: R has ONE bin and L's 3-bin
    # explode contains it once (|L.bin - R.bin| <= 1 by construction), so no
    # dedup is needed. Bin ids use truncating division — valid for ts >=
    # epoch; pre-1970 data would need floor semantics.
    exact = joined.where(
        (F.col(right_ts) >= F.col("__lo")) & (F.col(right_ts) <= F.col("__hi")))
    return exact.drop("__lo", "__hi", "__bin", "__bin_us")
