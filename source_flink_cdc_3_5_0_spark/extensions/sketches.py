"""Deterministic distinct-count sketch: KMV (k minimum values).

The classic bottom-k estimator (Bar-Yossef et al. 2002, the theta-sketch
ancestor): hash every value to a uniform fraction u ∈ (0,1], keep the k
smallest DISTINCT fractions, and estimate |D| ≈ (k-1) / u_(k) where u_(k)
is the k-th smallest. Standard error ~ 1/√(k-2).

Why this sketch here (vs ``approx_count_distinct``'s HLL++): the hash is an
md5-derived fraction both Spark and DuckDB compute bit-identically, so the
ESTIMATE itself is deterministic and cross-engine reproducible — an
approximate operator that still passes an exact value-hash oracle. HLL
implementations differ per engine and can never be oracled this way.

Scale shape: the k smallest distinct hashes are a bottom-k aggregate —
per-partition bottom-k, then merge (bottom-k of unions = union of
bottom-ks, the sketch's mergeability). Expressed as distinct→sort→limit,
which Spark executes as map-side partial distinct + TakeOrdered (per-
partition heads merged on the driver, never a full sort of the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX = "0123456789abcdef"


def uniform_fraction_sql(dialect: str, col: str) -> str:
    """u ∈ (0, 1] from the first 8 md5 hex nibbles of the value's string
    form — positional hex parse (strpos arithmetic) so Spark and DuckDB
    produce bit-identical doubles; +1 keeps u > 0 so (k-1)/u is safe."""
    strpos = "instr" if dialect == "spark" else "strpos"
    h = f"md5(CAST({col} AS VARCHAR))" if dialect == "duckdb" else f"md5(CAST({col} AS STRING))"
    # CAST to BIGINT: the high-nibble terms exceed int32 (15 * 16^7), which
    # Spark's non-ANSI mode would silently wrap
    terms = " + ".join(
        f"CAST({strpos}('{_HEX}', substring({h}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    )
    return f"(CAST({terms} AS DOUBLE) + 1.0) / 4294967296.0"


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (k, kth_min, kmv_estimate) for ``col``.

    If fewer than k distinct values exist, the estimate IS the exact
    distinct count (the sketch is exact below its capacity — standard KMV
    behavior)."""
    u = F.expr(uniform_fraction_sql("spark", col)).alias("u")
    mins = df.select(u).distinct().orderBy("u").limit(k)
    return mins.agg(
        F.count(F.lit(1)).cast("int").alias("n_mins"),
        F.max("u").alias("kth_min"),
    ).select(
        F.lit(k).cast("int").alias("k"),
        F.round("kth_min", 12).alias("kth_min"),
        F.round(
            F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
            .otherwise((F.lit(k - 1)) / F.col("kth_min")),
            4,
        ).alias("kmv_estimate"),
    )


def kmv_distinct_estimate_by(df: DataFrame, group_cols: list[str], col: str,
                             k: int = 64) -> DataFrame:
    """Per-group KMV: (group..., k, kth_min, kmv_estimate) — the 100 TB way
    to get per-key cardinalities (one sketch row per group, mergeable
    across partitions/files/days by unioning bottom-k sets).

    Shape: distinct (group, u) with map-side partial distinct, then ONE
    shuffle on the group key where a row_number window keeps the k
    smallest fractions per group — never a global sort, state per group
    bounded at k doubles."""
    from pyspark.sql import Window

    u = F.expr(uniform_fraction_sql("spark", col)).alias("u")
    base = df.select(*group_cols, u).distinct()
    w = Window.partitionBy(*group_cols).orderBy("u")
    mins = base.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return (
        mins.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("int").alias("n_mins"),
             F.max("u").alias("kth_min"))
        .select(
            *group_cols,
            F.lit(k).cast("int").alias("k"),
            F.round("kth_min", 12).alias("kth_min"),
            F.round(
                F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
                .otherwise(F.lit(k - 1) / F.col("kth_min")), 4,
            ).alias("kmv_estimate"),
        ))


def kmv_by_oracle_sql(table: str, group_cols: list[str], col: str,
                      k: int = 64) -> str:
    """DuckDB oracle computing the identical per-group sketch."""
    u = uniform_fraction_sql("duckdb", col)
    g = ", ".join(group_cols)
    return f"""
WITH d AS (SELECT DISTINCT {g}, {u} AS u FROM {table}),
r AS (SELECT {g}, u,
             row_number() OVER (PARTITION BY {g} ORDER BY u) AS rn
      FROM d),
a AS (SELECT {g}, CAST(count(*) AS INTEGER) AS n_mins, max(u) AS kth_min
      FROM r WHERE rn <= {k} GROUP BY {g})
SELECT {g}, CAST({k} AS INTEGER) AS k,
       round(kth_min, 12) AS kth_min,
       round(CASE WHEN n_mins < {k} THEN CAST(n_mins AS DOUBLE)
                  ELSE {k - 1} / kth_min END, 4) AS kmv_estimate
FROM a
"""


def histogram_quantiles(df: DataFrame, value_col: str,
                        group_cols: list[str],
                        qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                        bins: int = 128) -> DataFrame:
    """Per-group quantile estimates from a fixed equi-width histogram —
    the mergeable quantile sketch (bucket counts add across partitions /
    files / days, unlike exact percentiles which need the full sort).

    Why not ``approx_percentile`` / t-digest / KLL: every engine's
    implementation differs, so their estimates can never pass a value-hash
    oracle. A fixed-bin histogram is deterministic — identical IEEE
    arithmetic in Spark and DuckDB yields the identical estimate (same
    design choice as the KMV sketch above).

    Estimate = lower edge of the first bucket whose cumulative count
    reaches ``ceil(q·n)`` (a conservative sub-bucket-width answer; error
    bounded by (max-min)/bins).

    Scale shape: one tiny global min/max agg (2 doubles to the driver —
    control plane, same pattern as IVF centroids), then ONE shuffle:
    per-group-per-bucket partial-agg counts (≤ groups × bins rows), a
    bins-bounded window for the cumulative sum, one row per (group, q)
    out. The raw values are never sorted."""
    from pyspark.sql import Window

    mn, mx = df.agg(F.min(value_col), F.max(value_col)).first()
    if mn is None:
        raise ValueError(f"histogram_quantiles: {value_col} is all-null")
    width = (float(mx) - float(mn)) / bins or 1.0
    bucket = F.least(
        F.lit(bins - 1),
        F.floor((F.col(value_col) - F.lit(float(mn))) / F.lit(width))
        .cast("int"))
    counts = (df.where(F.col(value_col).isNotNull())
              .groupBy(*group_cols, bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy(*group_cols).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy(*group_cols)
    cum = (counts.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(wn)))
    # ONE pass over the (group, bucket) rows: conditional min per quantile,
    # then unpivot — not one filtered aggregation per q (a per-q loop
    # would replicate the counts+window subtree q times in the plan)
    hits = [F.min(F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")),
                         F.col("bucket"))).alias(f"__b{i}")
            for i, q in enumerate(qs)]
    agg = cum.groupBy(*group_cols).agg(*hits, F.max("n").alias("n"))
    stack = F.stack(
        F.lit(len(qs)),
        *[c for i, q in enumerate(qs)
          for c in (F.lit(q), F.col(f"__b{i}"))]).alias("q", "bucket")
    return (agg.select(*group_cols, F.col("n"), stack)
            .select(*group_cols, "q",
                    F.round(F.lit(float(mn)) + F.col("bucket") * F.lit(width),
                            9).alias("estimate"),
                    F.col("n").alias("n_rows")))


def histogram_quantiles_oracle_sql(table: str, value_col: str,
                                   group_cols: list[str],
                                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                                   bins: int = 128) -> str:
    """DuckDB oracle replaying the identical histogram arithmetic (min/max
    computed in SQL — same doubles the Spark side collected)."""
    g = ", ".join(group_cols)
    q_rows = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in qs)
    return f"""
WITH stats AS (
  SELECT min({value_col}) AS mn, max({value_col}) AS mx FROM {table}),
p AS (
  SELECT CASE WHEN (mx - mn) / {bins} = 0 THEN 1.0
              ELSE (mx - mn) / {bins} END AS width, mn FROM stats),
b AS (
  SELECT {g},
         least({bins - 1},
               CAST(floor(({value_col} - p.mn) / p.width) AS INT)) AS bucket
  FROM {table}, p WHERE {value_col} IS NOT NULL),
c AS (
  SELECT {g}, bucket, count(*) AS cnt FROM b GROUP BY {g}, bucket),
cc AS (
  SELECT {g}, bucket, cnt,
         sum(cnt) OVER (PARTITION BY {g} ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY {g}) AS n
  FROM c),
qs(q) AS (VALUES {q_rows})
SELECT {g}, q,
       round(p.mn + min(bucket) * p.width, 9) AS estimate,
       CAST(max(n) AS BIGINT) AS n_rows
FROM cc, qs, p
WHERE cum >= ceil(q * n)
GROUP BY {g}, q, p.mn, p.width
"""


def kmv_oracle_sql(table: str, col: str, k: int = 256) -> str:
    """DuckDB oracle computing the identical sketch."""
    u = uniform_fraction_sql("duckdb", col)
    return f"""
WITH mins AS (
  SELECT DISTINCT {u} AS u FROM {table} ORDER BY u LIMIT {k}
), agg AS (
  SELECT CAST(count(*) AS INTEGER) AS n_mins, max(u) AS kth_min FROM mins
)
SELECT CAST({k} AS INTEGER) AS k,
       round(kth_min, 12) AS kth_min,
       round(CASE WHEN n_mins < {k} THEN CAST(n_mins AS DOUBLE)
                  ELSE {k - 1} / kth_min END, 4) AS kmv_estimate
FROM agg
"""
