"""URL canonicalization + canonical-URL dedup (crawl-pipeline first pass).

Before any content-level dedup, a crawl pipeline collapses re-crawls of
the same resource by URL identity — but raw URLs hide that identity
behind case, default ports, fragments, tracking params and trailing
slashes.  The canonical form here applies the standard normalizations:

1. scheme and host lowercased (path/query case is significant, RFC 3986);
2. default ports stripped (``http://x:80`` ≡ ``http://x``,
   ``https://x:443`` ≡ ``https://x``);
3. fragment dropped (never sent to the server);
4. ``utm_*`` tracking params dropped, remaining params kept IN ORDER
   (param re-ordering is a lossier choice some crawlers make; we don't);
5. one trailing slash stripped from the path (``/a/`` ≡ ``/a``, ``/`` ≡
   empty).

Everything is a single codegen projection built from one RE2-safe parts
regex (shared verbatim by both engines) + higher-order array ops for the
query params — no Python, no shuffle.  Dedup by canonical URL is then the
same hash groupBy as exact content dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# groups: 1 scheme, 2 host, 3 :port, 4 path, 5 ?query, 6 #fragment
URL_PARTS = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"


def _pat(dialect: str) -> str:
    p = URL_PARTS.replace("'", "''")
    if dialect == "spark":
        p = p.replace("\\", "\\\\")
    return f"'{p}'"


def canonical_url_sql(dialect: str, col: str = "url") -> str:
    """Canonical-URL expression, dual-dialect (identical semantics)."""
    pat = _pat(dialect)

    def part(group: int) -> str:
        return f"regexp_extract({col}, {pat}, {group})"

    scheme = f"lower({part(1)})"
    host = f"lower({part(2)})"
    port = part(3)
    path = part(4)
    query = part(5)

    keep_port = (f"CASE WHEN ({scheme} = 'http' AND {port} = ':80') "
                 f"OR ({scheme} = 'https' AND {port} = ':443') "
                 f"THEN '' ELSE {port} END")
    # startswith, not LIKE: in LIKE 'utm_%' the '_' is a single-char
    # wildcard, which would also drop legitimate params like 'utmost=5'
    if dialect == "spark":
        clean_path = f"regexp_replace({path}, '/$', '')"
        params = (f"filter(split(substr({query}, 2), '&'), "
                  f"x -> x != '' AND NOT startswith(x, 'utm_'))")
        clean_query = (f"CASE WHEN size({params}) > 0 "
                       f"THEN '?' || array_join({params}, '&') ELSE '' END")
    else:
        clean_path = f"regexp_replace({path}, '/$', '')"
        params = (f"list_filter(str_split({query}[2:], '&'), "
                  f"x -> x != '' AND NOT starts_with(x, 'utm_'))")
        clean_query = (f"CASE WHEN len({params}) > 0 "
                       f"THEN '?' || array_to_string({params}, '&') ELSE '' END")
    return (f"CASE WHEN {part(1)} = '' THEN NULL "
            f"ELSE {scheme} || '://' || {host} || {keep_port} "
            f"|| {clean_path} || {clean_query} END")


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canonical_url`` (NULL when the value doesn't parse as an
    absolute URL — surfaced, not silently dropped)."""
    return df.withColumn("canonical_url",
                         F.expr(canonical_url_sql("spark", url_col)))


def dedup_by_canonical_url(df: DataFrame, url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """One row per input, tagged with its canonical URL, the size of its
    canonical group, and whether it is the keeper (minimum id — the usual
    first-crawled-wins rule).  One hash shuffle on the canonical URL."""
    canon = canonicalize_urls(df, url_col)
    groups = (canon.where(F.col("canonical_url").isNotNull())
                   .groupBy("canonical_url")
                   .agg(F.count(F.lit(1)).alias("group_size"),
                        F.min(id_col).alias("keep_id")))
    return (canon.join(groups, "canonical_url", "left")
                 .select(id_col, "canonical_url",
                         F.coalesce("group_size", F.lit(0)).alias("group_size"),
                         F.when(F.col("canonical_url").isNull(), F.lit(False))
                          .otherwise(F.col(id_col) == F.col("keep_id"))
                          .alias("is_keeper")))
