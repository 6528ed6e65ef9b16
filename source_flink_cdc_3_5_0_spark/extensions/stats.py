"""Per-group robust statistics for data cleaning — deterministic across
engines.

The naive formulation (``stddev_samp`` over doubles) is order-dependent:
float summation order differs between Spark's partial aggregates and any
other engine, so flags near the threshold flip between runs/engines. The
fix is the same discipline as the pricing aggregates: accumulate EXACT
integer/decimal moments (n, Σx, Σx² over scaled integers — associative,
order-free), then derive mean/σ/z-scores with a fixed sequence of IEEE
double ops (each correctly rounded, hence bit-identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_zscore_outliers(df: DataFrame, group_cols: list[str],
                          value_col: str, z: float = 2.0,
                          scale: int = 100) -> DataFrame:
    """Flag rows whose value deviates more than ``z`` population standard
    deviations from their group mean. Returns the input key columns plus
    (cents, zscore, is_outlier).

    Scale shape: ONE partial-agg shuffle for the (n, Σ, Σ²) moments — a
    row per group — joined back to the rows (the optimizer broadcasts the
    tiny stats side). BOTH accumulators (Σ, Σ²) run in DECIMAL(38,0)
    (order-free exact sums, no silent bigint wrap); the per-row square is
    bigint, exact while |value·scale| < ~3.04e9 (drop ``scale`` for
    larger magnitudes — beyond that bound Spark would wrap where DuckDB
    raises). Rows with a NULL value are excluded (they carry no signal
    and cannot be flagged); NULL group keys form their own group
    (null-safe join)."""
    cents = F.round(F.col(value_col) * scale).cast("bigint")
    # NULL values carry no information and would bias n vs the null-
    # skipping sums — they are excluded from stats AND from the output
    # (documented: the operator returns only flaggable rows)
    rows = (df.where(F.col(value_col).isNotNull())
            .withColumn("__c", cents))
    stats = (rows.groupBy(*group_cols)
             .agg(F.count("__c").alias("__n"),
                  # both accumulators DECIMAL(38,0): a plain bigint sum
                  # wraps silently in Spark where DuckDB promotes exactly
                  F.sum(F.col("__c").cast("decimal(38,0)")).alias("__s"),
                  F.sum((F.col("__c") * F.col("__c"))
                        .cast("decimal(38,0)")).alias("__ss")))
    mean = F.col("__s").cast("double") / F.col("__n")
    var = (F.col("__ss").cast("double") / F.col("__n")) - mean * mean
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))  # clamp -0.0-ish rounding
    # null-safe join keys: a NULL group is a legitimate group
    cond = None
    st = stats.select(*group_cols, mean.alias("__mean"),
                      sigma.alias("__sigma"))
    st = st.select(*[F.col(c).alias(f"__g_{c}") for c in group_cols],
                   "__mean", "__sigma")
    for c in group_cols:
        piece = rows[c].eqNullSafe(st[f"__g_{c}"])
        cond = piece if cond is None else cond & piece
    joined = rows.join(st, cond).drop(*[f"__g_{c}" for c in group_cols])
    zscore = F.when(F.col("__sigma") > 0,
                    (F.col("__c") - F.col("__mean")) / F.col("__sigma")) \
        .otherwise(F.lit(0.0))
    return (joined
            .withColumn("zscore", F.round(zscore, 6))
            .withColumn("is_outlier", F.abs(zscore) > F.lit(z))
            .drop("__mean", "__sigma")
            .withColumnRenamed("__c", "cents"))


def zscore_oracle_sql(table: str, group_cols: list[str], value_col: str,
                      select_cols: list[str], z: float = 2.0,
                      scale: int = 100) -> str:
    """DuckDB oracle replaying the identical exact-moment arithmetic."""
    g = ", ".join(group_cols)
    sel = ", ".join(f"r.{c}" for c in select_cols)
    return f"""
WITH r AS (
  SELECT *, CAST(round({value_col} * {scale}) AS BIGINT) AS cents
  FROM {table} WHERE {value_col} IS NOT NULL),
s AS (
  SELECT {g}, count(*) AS n, sum(cents) AS s,
         sum(CAST(cents * cents AS DECIMAL(38,0))) AS ss
  FROM r GROUP BY {g}),
m AS (
  SELECT {g}, CAST(s AS DOUBLE) / n AS mean,
         sqrt(greatest(CAST(ss AS DOUBLE) / n
                       - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                       0.0)) AS sigma
  FROM s)
SELECT {sel}, r.cents,
       round(CASE WHEN m.sigma > 0
                  THEN (r.cents - m.mean) / m.sigma ELSE 0.0 END, 6)
         AS zscore,
       CASE WHEN m.sigma > 0
            THEN abs((r.cents - m.mean) / m.sigma) > {z!r} ELSE FALSE END
         AS is_outlier
FROM r JOIN m USING ({g})
"""
