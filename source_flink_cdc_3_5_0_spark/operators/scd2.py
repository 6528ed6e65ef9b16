"""SCD2 (slowly-changing-dimension type 2) history construction from a
CDC changelog.

The reference's sinks materialize the FINAL image per key (upsert); a
warehouse frequently wants the opposite: every version a key ever had,
with its validity interval — the audit/temporal-join companion table that
``scd2_enrich_events`` (extensions) consumes.  Given the flat changelog
envelope (``__op``/``__seq``, SURVEY §3.1 — DataChangeEvent.java:82-93's
op algebra), each +I/+U row becomes one version row valid
``[seq, next-event seq)``; a -D closes the last open interval; -U
(update-before) images are bookkeeping and are dropped before windowing.

One hash shuffle on the key, one ordered window (``lead``) inside each
key — no iteration, no state beyond the sort.  At 100 TB this is the
same single-shuffle shape as ``latest_image``; history size is the
changelog size, never quadratic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F, Window

OP_COL = "__op"
SEQ_COL = "__seq"


def scd2_from_changelog(changelog: DataFrame, pks: Sequence[str],
                        op_col: str = OP_COL,
                        seq_col: str = SEQ_COL) -> DataFrame:
    """Versioned history: the input columns minus the envelope, plus
    ``valid_from_seq`` / ``valid_to_seq`` (NULL = still open) /
    ``is_current``.  Delete events close the preceding version and emit
    no row of their own; a later +I on the same key re-opens history
    (the interval algebra handles churn)."""
    lived = changelog.where(F.col(op_col) != "-U")
    w = Window.partitionBy(*[F.col(p) for p in pks]).orderBy(seq_col)
    led = (lived
           .withColumn("valid_from_seq", F.col(seq_col).cast("bigint"))
           .withColumn("valid_to_seq", F.lead(seq_col).over(w).cast("bigint")))
    keep = [c for c in changelog.columns if c not in (op_col, seq_col)]
    return (led.where(F.col(op_col).isin("+I", "+U"))
               .select(*keep, "valid_from_seq", "valid_to_seq",
                       F.col("valid_to_seq").isNull().alias("is_current")))
