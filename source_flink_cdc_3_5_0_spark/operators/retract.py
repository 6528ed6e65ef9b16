"""Retract-stream incremental aggregation — aggregate maintenance
directly from a changelog.

The CDC-native way to keep a grouped aggregate current: every change
event contributes a DELTA to its group's (count, sum) —

    +I                 → count +1, sum +after
    -D                 → count -1, sum -image
    +U (before known)  → count  0, sum +(after - before)
    -U / +U pair       → the -U retracts (-before), the +U adds (+after)

— so the maintained aggregate is ONE partial-aggregated shuffle over the
batch, with **no per-key state at all**. The alternative (materialize the
latest image per key, then aggregate) shuffles every key every batch and
holds the whole table as state; the retract form's state is one row per
GROUP, which is what makes continuous aggregation viable at 100 TB (this
is exactly how Flink's retract-stream aggregates work — the reference's
runtime is built on the same +I/-U/+U/-D algebra, DataChangeEvent.java:
82-93).

Float caution: double sums are order-dependent; for an oracle-exact (or
audit-exact) maintained sum, feed an integer-scaled expression (cents) —
the same discipline as the pricing aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..common.events import BEFORE_COL, OP_COL


def incremental_agg(df: DataFrame, group_cols: list[str],
                    value: Column, before_value: Column | None = None,
                    op_col: str = OP_COL,
                    emit_deltas: bool = False) -> DataFrame:
    """Maintain per-group (n_rows, sum_value) from changelog deltas.

    ``value`` is the contribution expression evaluated on the event's
    carried image (the after-image for +I/+U, the deleted image for -D/-U
    — our envelope carries both in the regular columns). ``before_value``
    is the same expression over the before-image (e.g.
    ``F.col("__before.v")``); required to absorb single-row +U events.
    Without it, every +U is treated as the adding half of a -U/+U pair
    (count +1, sum +after).

    ``emit_deltas=False`` (default) treats ``df`` as the COMPLETE history
    and drops groups whose net count is zero (fully deleted). For
    batch-wise maintenance — merging each micro-batch's deltas into a
    state table — pass ``emit_deltas=True``: a batch of pure updates has
    count delta 0 but a real sum delta, which the filter would otherwise
    silently discard.
    """
    op = F.col(op_col)
    if before_value is not None:
        has_before = F.col(BEFORE_COL).isNotNull() \
            if BEFORE_COL in df.columns else F.lit(False)
        # +U with a before image absorbs the whole update (delta, count 0);
        # +U without one is the second half of a -U/+U pair (adds, count +1)
        upd_delta = F.when(has_before, value - before_value).otherwise(value)
        upd_cnt = F.when(has_before, F.lit(0)).otherwise(F.lit(1))
    else:
        # pure retract-pair convention: every +U adds its after image
        upd_delta = value
        upd_cnt = F.lit(1)
    cnt_delta = (F.when(op == "+I", F.lit(1))
                 .when(op.isin("-D", "-U"), F.lit(-1))
                 .when(op == "+U", upd_cnt)
                 .otherwise(F.lit(0)))
    sum_delta = (F.when(op == "+I", value)
                 .when(op.isin("-D", "-U"), -value)
                 .when(op == "+U", upd_delta)
                 .otherwise(F.lit(0)))
    out = (df.groupBy(*group_cols)
           .agg(F.sum(cnt_delta).alias("n_rows"),
                F.sum(sum_delta).alias("sum_value")))
    if not emit_deltas:
        out = out.where(F.col("n_rows") > 0)
    return out


def incremental_distinct_count(df: DataFrame, group_cols: list[str],
                               member_col: str,
                               op_col: str = OP_COL) -> DataFrame:
    """Maintain per-group COUNT(DISTINCT member) from a changelog.

    Distinct counts can't be maintained from scalar deltas (a sketch like
    KMV isn't retractable — a delete of a bottom-k member invalidates the
    sketch), but they CAN from per-(group, member) NET counts: +I/+U add
    1, -D/-U subtract 1, and a member is live while its net is > 0.  Two
    partial-aggregated shuffles — (group, member) then group — with state
    per OBSERVED member, never per row; that sub-aggregate is itself
    mergeable across batches, so a streaming job checkpoints the member
    net-count table and folds each micro-batch in (the standard
    two-level distinct maintenance Flink's retract aggregates use).

    Update semantics: a -U/+U pair whose member changed moves one unit
    between members; a single +U without a before-image counts as its
    adding half (the caller must supply pairs when members can change,
    exactly as ``incremental_agg`` requires ``before_value``)."""
    op = F.col(op_col)
    delta = (F.when(op.isin("+I", "+U"), F.lit(1))
              .when(op.isin("-D", "-U"), F.lit(-1))
              .otherwise(F.lit(0)))
    net = (df.groupBy(*group_cols, member_col)
             .agg(F.sum(delta).alias("__net")))
    return (net.where(F.col("__net") > 0)
               .groupBy(*group_cols)
               .agg(F.count(F.lit(1)).alias("n_distinct")))
