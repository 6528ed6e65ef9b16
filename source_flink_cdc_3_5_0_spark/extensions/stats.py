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


def pairwise_correlation(df: DataFrame, cols: list[str],
                         scale: int = 100) -> DataFrame:
    """Exact-moment Pearson correlation matrix over numeric columns —
    the profiling companion to ``profile_table``: which signals move
    together (quality scores vs lengths, price vs quantity) before
    anyone trains on them.

    The naive ``corr()`` aggregate accumulates doubles and is summation-
    order-dependent (never hash-matches across engines).  Here every
    column is cents-scaled to BIGINT and ALL moments for ALL pairs —
    n, Σx, Σx² per column and Σxy per pair — ride ONE map-side-combining
    aggregate over ONE scan (k columns → k(k+1)/2 + 2k + 1 exact
    DECIMAL(38,0) accumulators, order-free); Pearson r then derives per
    pair with a fixed IEEE sequence:
    ``(n·Σxy − Σx·Σy) / sqrt((n·Σx²−Σx²)·(n·Σy²−Σy²))``, each double op
    correctly rounded hence bit-identical everywhere.  Rows with a NULL
    in ANY participating column are excluded (listwise deletion) so all
    pairs share one n.  Returns ``(col_x, col_y, n, r)`` for x < y;
    constant columns yield NULL r (undefined, surfaced not zeroed)."""
    rows = df
    for c in cols:
        rows = rows.where(F.col(c).isNotNull())
    scaled = rows.select(*[
        F.round(F.col(c) * scale).cast("bigint").alias(c) for c in cols])
    # cast the OPERANDS to decimal, not the product: a bigint×bigint
    # product wraps silently in Spark before any cast could widen it
    # (values ≥ ~3e9 cents would corrupt Σx² undetectably)
    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(dec(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(dec(c) * dec(c)).alias(f"__ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(dec(a) * dec(b)).alias(f"__sp_{a}_{b}"))
    one = scaled.agg(*aggs)

    n = F.col("__n").cast("double")

    def num(a, b):
        return (n * F.col(f"__sp_{a}_{b}").cast("double")
                - F.col(f"__s_{a}").cast("double")
                * F.col(f"__s_{b}").cast("double"))

    def den2(c):
        s = F.col(f"__s_{c}").cast("double")
        return n * F.col(f"__ss_{c}").cast("double") - s * s

    # one explode over an array of per-pair structs, NOT a union of
    # per-pair selects: each union branch re-references the aggregate
    # subtree, so k(k-1)/2 branches re-ran the ENTIRE scan+aggregate
    # once per pair (6x for 4 columns — confirmed in the physical plan);
    # the explode derives every pair from the single reduced row in one
    # pass (optimization r11, guide §2.4 "duplicated subtrees")
    rows = []
    for a, b in pairs:
        d = den2(a) * den2(b)
        r = F.when(d > 0, F.round(num(a, b) / F.sqrt(d), 6))
        rows.append(F.struct(F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                             F.col("__n").alias("n"), r.alias("r")))
    return (one.select(F.explode(F.array(*rows)).alias("__row"))
            .select("__row.*"))


def correlation_oracle_sql(table: str, cols: list[str],
                           scale: int = 100) -> str:
    """DuckDB replay of the identical exact-moment Pearson sequence."""
    not_null = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    scaled = ", ".join(
        f"CAST(round({c} * {scale}) AS BIGINT) AS {c}" for c in cols)
    # HUGEINT operands: int128 products never wrap (the BIGINT product
    # would raise in DuckDB — loud, but still a failure the operator
    # shouldn't have)
    moments = ["count(*) AS n"]
    for c in cols:
        moments.append(f"sum(CAST({c} AS HUGEINT)) AS s_{c}")
        moments.append(f"sum(CAST({c} AS HUGEINT) * CAST({c} AS HUGEINT)) AS ss_{c}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        moments.append(f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)) AS sp_{a}_{b}")
    selects = []
    for a, b in pairs:
        num = (f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
               f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))")
        da = (f"(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
              f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))")
        db = (f"(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
              f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))")
        selects.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, n,\n"
            f"       CASE WHEN {da} * {db} > 0\n"
            f"            THEN round({num} / sqrt({da} * {db}), 6) END AS r\n"
            f"FROM m")
    return (f"WITH r AS (SELECT {scaled} FROM {table} WHERE {not_null}),\n"
            f"m AS (SELECT {', '.join(moments)} FROM r)\n"
            + "\nUNION ALL\n".join(selects))


def histogram_drift(df_a: DataFrame, df_b: DataFrame, value_col: str,
                    bins: int = 64, scale: int = 100,
                    drift_threshold: float = 0.1) -> DataFrame:
    """Distribution-drift check between two samples of one signal — the
    monitoring gate between yesterday's corpus and today's (training
    pipelines fail silently when an upstream change shifts a feature
    distribution; this is the check that catches it).

    Metric: total variation distance, TVD = ½ Σ_bins |p_a − p_b|, over a
    SHARED fixed equi-width histogram (range from the union).  Computed
    integer-exactly: values cents-scaled to BIGINT, per-bin counts
    cross-multiplied — Σ |c_a·n_b − c_b·n_a| in DECIMAL(38,0) (order-free,
    no overflow at any corpus size) — with ONE trailing double division
    by 2·n_a·n_b, so both engines agree bit-for-bit where a float
    histogram never would.

    Scale shape: one tiny union min/max agg (control plane), one
    partial-agg count shuffle per side (≤ bins rows out), then bin-level
    arithmetic on ≤ bins rows.  Mergeable: per-bin counts add across
    files/days, so the sketch can be maintained incrementally and
    compared on demand.  Returns one row: (n_a, n_b, tvd, drifted)."""
    cents = F.round(F.col(value_col) * scale).cast("bigint")
    a = df_a.where(F.col(value_col).isNotNull()).select(cents.alias("v"))
    b = df_b.where(F.col(value_col).isNotNull()).select(cents.alias("v"))
    both = a.unionByName(b)
    mn, mx = both.agg(F.min("v"), F.max("v")).first()
    if mn is None:
        raise ValueError(f"histogram_drift: {value_col} is all-null")
    width = max((int(mx) - int(mn)) // bins + 1, 1)
    # integer floor division on both sides (a double-divide + cast would
    # TRUNCATE in Spark but ROUND in DuckDB)
    bucket = F.least(F.lit(bins - 1),
                     F.expr(f"(v - {int(mn)}L) div {width}L").cast("int"))

    def counts(side, name):
        return side.groupBy(bucket.alias("bucket")) \
                   .agg(F.count(F.lit(1)).alias(name))

    joined = (counts(a, "ca").join(counts(b, "cb"), "bucket", "full_outer")
              .select(F.coalesce("ca", F.lit(0)).alias("ca"),
                      F.coalesce("cb", F.lit(0)).alias("cb")))
    tot = joined.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    diff = (joined.crossJoin(F.broadcast(tot))
            .agg(F.sum(F.abs(F.col("ca").cast("decimal(38,0)")
                             * F.col("nb").cast("decimal(38,0)")
                             - F.col("cb").cast("decimal(38,0)")
                             * F.col("na").cast("decimal(38,0)")))
                 .alias("d"),
                 F.max("na").alias("n_a"), F.max("nb").alias("n_b")))
    tvd = (F.col("d").cast("double")
           / (2.0 * F.col("n_a").cast("double") * F.col("n_b").cast("double")))
    # Finite-sample noise floor: under H0 (identical distributions) each
    # bin's p̂_a−p̂_b is ~N(0, p(1/n_a+1/n_b)); with ~uniform occupancy
    # E[TVD|H0] ≈ 0.4·sqrt(bins·(1/n_a+1/n_b)) (matches measurement within
    # 2% on the test fixtures). Drift must clear 1.5× that floor as well
    # as the user threshold — otherwise small samples always "drift".
    noise = 0.6 * F.sqrt(F.lit(float(bins))
                         * (1.0 / F.col("n_a").cast("double")
                            + 1.0 / F.col("n_b").cast("double")))
    return diff.select(F.col("n_a"), F.col("n_b"),
                       F.round(tvd, 6).alias("tvd"),
                       F.round(noise, 6).alias("noise_floor"),
                       (tvd > F.greatest(F.lit(drift_threshold), noise))
                       .alias("drifted"))


def histogram_drift_oracle_sql(sql_a: str, sql_b: str, value_col: str,
                               bins: int = 64, scale: int = 100,
                               drift_threshold: float = 0.1) -> str:
    """DuckDB replay of the identical integer TVD sequence.  ``sql_a`` /
    ``sql_b`` are subqueries yielding the two samples."""
    return f"""
WITH a AS (SELECT CAST(round({value_col} * {scale}) AS BIGINT) AS v
           FROM ({sql_a}) WHERE {value_col} IS NOT NULL),
b AS (SELECT CAST(round({value_col} * {scale}) AS BIGINT) AS v
      FROM ({sql_b}) WHERE {value_col} IS NOT NULL),
rng AS (SELECT MIN(v) AS mn, MAX(v) AS mx
        FROM (SELECT v FROM a UNION ALL SELECT v FROM b)),
wdt AS (SELECT mn, greatest((mx - mn) // {bins} + 1, 1) AS width FROM rng),
ca AS (SELECT least({bins} - 1, CAST((v - mn) // width AS INTEGER)) AS bucket,
              COUNT(*) AS ca
       FROM a, wdt GROUP BY 1),
cb AS (SELECT least({bins} - 1, CAST((v - mn) // width AS INTEGER)) AS bucket,
              COUNT(*) AS cb
       FROM b, wdt GROUP BY 1),
j AS (SELECT COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
      FROM ca FULL OUTER JOIN cb USING (bucket)),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM j),
d AS (SELECT SUM(abs(CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
                     - CAST(cb AS HUGEINT) * CAST(na AS HUGEINT))) AS d,
             MAX(na) AS n_a, MAX(nb) AS n_b
      FROM j, tot)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(CAST(d AS DOUBLE)
             / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS tvd,
       round(0.6 * sqrt(CAST({bins} AS DOUBLE)
                        * (1.0 / CAST(n_a AS DOUBLE)
                           + 1.0 / CAST(n_b AS DOUBLE))), 6) AS noise_floor,
       (CAST(d AS DOUBLE)
        / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
         > greatest({drift_threshold!r},
                    0.6 * sqrt(CAST({bins} AS DOUBLE)
                               * (1.0 / CAST(n_a AS DOUBLE)
                                  + 1.0 / CAST(n_b AS DOUBLE)))) AS drifted
FROM d
"""
