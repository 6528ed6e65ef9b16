"""Data-quality operators: column profiling and declarative constraint
validation (the Deequ / dbt-test shape, re-expressed as Spark aggregates).

A 100-TB ingestion pipeline needs a cheap, always-on answer to "what does
this table look like" (null fractions, distinct cardinalities, bounds) and
"does it satisfy its contract" (PK uniqueness, referential integrity,
accepted values) *before* training jobs consume it.  Both operators here
are pure built-in-function aggregates — no Python in the data path:

- ``profile_table``: ONE full-table aggregate computes per-column non-null
  counts and min/max (map-side partial agg, a single reduced row), plus a
  distinct-cardinality channel.  Exact distinct counts run as one
  single-distinct aggregate per column crossJoined onto the profile row
  (independent column-pruned scans; no Expand — pinned in tests) — exact
  cardinalities over unique-ish keys are still heavy at 100 TB, so
  ``approx=True`` switches to HyperLogLog ``approx_count_distinct``,
  which folds back into the single wide aggregate with bounded sketch
  state.
- ``validate_constraints``: each rule compiles to the cheapest plan that
  can falsify it — row-level rules (not-null / accepted-values / range)
  share ONE scan as conditional sums; ``unique`` is one group-count on the
  key; ``foreign_key`` is one anti-join on the key (shuffle join at scale,
  never a collect).  Results union into a tiny (check, violations, passed)
  frame.

Reference anchor: the reference validates sink state with per-table row
counts and golden snapshots in its e2e harness
(flink-cdc-e2e-tests/.../MySqlToDorisE2eITCase.java) — these operators are
that idea generalized into reusable pipeline gates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: Sequence[str] | None = None,
                  approx: bool = False,
                  include_distinct: bool = True) -> DataFrame:
    """Long-format per-column profile: ``(col_name, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str)``.

    Numeric columns report bounds in the ``*_num`` (double) channel,
    everything else string-rendered in ``*_str`` — typed channels keep
    float comparison float-typed instead of relying on engine-identical
    decimal-to-string rendering.

    One wide aggregate produces a single row (every per-column aggregate
    rides the same map-side partial agg); the row is then unpivoted with
    ``stack`` — a 1-row local operation, not a shuffle.  ``approx=False``
    adds exact ``count_distinct`` per column as one single-distinct
    aggregate per column crossJoined onto the profile row (independent
    column-pruned scans, no Expand — the multi-distinct form k-folded the
    scan through one serial aggregate); ``approx=True`` uses HLL sketches
    inside the single wide aggregate.
    """
    cols = list(columns) if columns is not None else df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        # include_distinct=False skips the cardinality channel entirely —
        # consumers that only read counts (schema_drift) shouldn't pay
        # the per-column distinct (exact) or sketch (approx) cost
        if not include_distinct:
            aggs.append(F.lit(None).cast("bigint").alias(f"__nd_{c}"))
        elif approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if isinstance(schema[c], _NUMERIC_TYPES):
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__smin_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__smax_{c}"))
    one = df.agg(*aggs)
    if include_distinct and not approx:
        # exact cardinalities as ONE single-distinct aggregate per column,
        # crossJoined onto the 1-row profile (optimization r11): the
        # multi-distinct form made Spark Expand the scan k-fold through
        # one serial aggregate; per-column distincts each scan ONLY their
        # (parquet-pruned) column — total column bytes comparable to the
        # one wide scan — run as independent concurrent stages, and each
        # is a plain two-phase agg keyed on the column (no Expand).
        # Values are identical: count_distinct per column either way.
        for c in cols:
            one = one.crossJoin(
                df.agg(F.count_distinct(F.col(c)).alias(f"__nd_{c}")))

    # stack(k, 'name', n_null, ..., ...) unpivots the single reduced row.
    parts = []
    for c in cols:
        num = isinstance(schema[c], _NUMERIC_TYPES)
        mn = f"__min_{c}" if num else "CAST(NULL AS DOUBLE)"
        mx = f"__max_{c}" if num else "CAST(NULL AS DOUBLE)"
        smn = "CAST(NULL AS STRING)" if num else f"__smin_{c}"
        smx = "CAST(NULL AS STRING)" if num else f"__smax_{c}"
        parts.append(f"'{c}', __n - __nn_{c}, CAST(__nd_{c} AS BIGINT), "
                     f"{mn}, {mx}, {smn}, {smx}")
    stack = (f"stack({len(cols)}, {', '.join(parts)}) AS "
             f"(col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)")
    return one.select(F.col("__n").alias("n_rows"), F.expr(stack)) \
              .select("col_name", "n_rows", "n_null", "n_distinct",
                      "min_num", "max_num", "min_str", "max_str")


@dataclass(frozen=True)
class Check:
    """One declarative constraint; ``kind`` selects the compiled plan."""
    name: str
    kind: str                      # not_null | accepted | range | unique | fk
    column: str = ""
    values: tuple = ()             # accepted: allowed set
    lo: float | None = None        # range bounds (inclusive); None = open
    hi: float | None = None
    keys: tuple = ()               # unique: key columns
    parent: DataFrame | None = None    # fk: parent table
    parent_key: str = ""           # fk: parent column


def not_null(name: str, column: str) -> Check:
    return Check(name, "not_null", column=column)


def accepted_values(name: str, column: str, values: Sequence) -> Check:
    return Check(name, "accepted", column=column, values=tuple(values))


def in_range(name: str, column: str, lo=None, hi=None) -> Check:
    return Check(name, "range", column=column, lo=lo, hi=hi)


def unique(name: str, *keys: str) -> Check:
    return Check(name, "unique", keys=tuple(keys))


def foreign_key(name: str, column: str, parent: DataFrame,
                parent_key: str) -> Check:
    return Check(name, "fk", column=column, parent=parent,
                 parent_key=parent_key)


def _row_violation_expr(c: Check):
    if c.kind == "not_null":
        cond = F.col(c.column).isNull()
    elif c.kind == "accepted":
        # NULL is not a membership violation — pair with not_null if needed.
        cond = F.col(c.column).isNotNull() & ~F.col(c.column).isin(*c.values)
    elif c.kind == "range":
        cond = F.lit(False)
        if c.lo is not None:
            cond = cond | (F.col(c.column) < F.lit(c.lo))
        if c.hi is not None:
            cond = cond | (F.col(c.column) > F.lit(c.hi))
        cond = F.col(c.column).isNotNull() & cond
    else:  # pragma: no cover - guarded by caller
        raise ValueError(c.kind)
    return F.sum(cond.cast("long")).alias(c.name)


def validate_constraints(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every check, returning ``(check, violations, passed)`` sorted by
    check name.  Row-level checks share one scan (a single conditional-sum
    aggregate); each ``unique`` is one group-count on its key; each ``fk``
    one anti-join — per-check cost is the minimum plan that can falsify it,
    and every result is a 1-row frame unioned driver-free."""
    results: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind in ("not_null", "accepted", "range")]
    if row_checks:
        wide = df.agg(*[_row_violation_expr(c) for c in row_checks])
        stack = ", ".join(f"'{c.name}', coalesce({c.name}, 0L)" for c in row_checks)
        results.append(wide.select(F.expr(
            f"stack({len(row_checks)}, {stack}) AS (check, violations)")))

    for c in checks:
        if c.kind == "unique":
            dup = (df.groupBy(*c.keys).count().where(F.col("count") > 1)
                     .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                           .cast("long").alias("violations"))
                     .select(F.lit(c.name).alias("check"), "violations"))
            results.append(dup)
        elif c.kind == "fk":
            # no .distinct() on the anti-join build side (r12): LeftAnti
            # dedups by construction — the distinct was a spare
            # exchange+aggregate stage
            orphans = (df.where(F.col(c.column).isNotNull())
                         .join(c.parent.select(F.col(c.parent_key).alias(c.column)),
                               on=c.column, how="left_anti")
                         .agg(F.count(F.lit(1)).alias("violations"))
                         .select(F.lit(c.name).alias("check"), "violations"))
            results.append(orphans)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return (out.select("check", "violations",
                       (F.col("violations") == 0).alias("passed"))
               .orderBy("check"))


def schema_drift(profile_old: DataFrame, profile_new: DataFrame,
                 null_rate_jump: float = 0.05) -> DataFrame:
    """Schema/contract drift between two ``profile_table`` outputs — the
    third leg of the monitoring triad (constraints validate a snapshot,
    ``histogram_drift`` watches value distributions, this watches the
    SHAPE): columns added, columns removed, and null-rate jumps above
    ``null_rate_jump`` (the classic silent upstream break — a field that
    quietly went mostly-null).

    Pure profile-row arithmetic: a full outer join on col_name over two
    ≤k-row frames (broadcast both sides at any table size — profiles are
    control-plane) and one projection.  Null rates and their delta are
    IEEE double divisions — the same fixed operation sequence in every
    engine (deterministic, though not integer-exact; a rate exactly AT
    the threshold is a knife-edge the caller shouldn't encode policy
    on).  Returns (col_name, status, null_rate_delta) with status ∈
    added | removed | null_rate_jump | ok."""
    o = profile_old.select(F.col("col_name"),
                           F.col("n_rows").alias("o_rows"),
                           F.col("n_null").alias("o_null"))
    n = profile_new.select(F.col("col_name"),
                           F.col("n_rows").alias("n_rows2"),
                           F.col("n_null").alias("n_null2"))
    j = o.join(n, "col_name", "full_outer")
    o_rate = F.col("o_null").cast("double") / F.col("o_rows").cast("double")
    n_rate = F.col("n_null2").cast("double") / F.col("n_rows2").cast("double")
    delta = F.round(n_rate - o_rate, 6)
    status = (F.when(F.col("o_rows").isNull(), F.lit("added"))
               .when(F.col("n_rows2").isNull(), F.lit("removed"))
               .when(F.abs(n_rate - o_rate) > F.lit(null_rate_jump),
                     F.lit("null_rate_jump"))
               .otherwise(F.lit("ok")))
    detail = (F.when(F.col("o_rows").isNull() | F.col("n_rows2").isNull(),
                     F.lit(None).cast("double"))
               .otherwise(delta))
    return (j.select("col_name", status.alias("status"),
                     detail.alias("null_rate_delta"))
             .orderBy("col_name"))
