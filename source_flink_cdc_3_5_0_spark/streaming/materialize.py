"""Changelog -> table-state materialization.

The reference never materializes (its sinks do, e.g. Doris/Paimon upsert);
our engine needs the equivalent operator to (a) reduce a batch to one final
image per key before sink merge and (b) answer "current state" queries over
a changelog. Implemented with a window rank over (pk) ordered by sequence —
a single shuffle on the key, no driver loop, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..common.events import OP_COL


def latest_image(df: DataFrame, pk_cols: list[str], seq_col: str | None = None,
                 keep_delete_marker: bool = False) -> DataFrame:
    """Reduce a changelog to the latest image per key.

    ``-U`` (update-before) rows never represent final state and are dropped
    up front; the winner among the rest is the highest ``seq_col`` (ties
    broken by op rank: a ``-D``/``+U`` after a ``+I`` at the same seq wins).
    With ``keep_delete_marker`` the surviving ``-D`` row is kept (callers
    doing sink merges need the tombstone); otherwise deleted keys vanish.
    """
    if OP_COL in df.columns:
        df = df.where(F.col(OP_COL) != "-U")
    order = []
    if seq_col is not None:
        order.append(F.col(seq_col).desc())
    if OP_COL in df.columns:
        # at equal seq, deletes/updates ordered after inserts win
        order.append(
            F.when(F.col(OP_COL) == "+I", F.lit(0)).otherwise(F.lit(1)).desc()
        )
    if not order:
        order.append(F.monotonically_increasing_id().desc())
    w = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.where(F.col("__rn") == 1).drop("__rn")
    if OP_COL in df.columns and not keep_delete_marker:
        out = out.where(F.col(OP_COL) != "-D")
    return out


def materialize_changelog(df: DataFrame, pk_cols: list[str], seq_col: str) -> DataFrame:
    """Current-state view of a changelog DataFrame (drops envelope)."""
    out = latest_image(df, pk_cols, seq_col)
    drop = [c for c in (OP_COL, seq_col, "__before", "__meta") if c in out.columns]
    return out.drop(*drop)
