"""Character-trigram language-model quality scoring (the CCNet /
Wikipedia-perplexity filter shape, integer-exact so two engines agree).

CCNet ranks web documents by the perplexity of a KenLM model trained on a
clean reference corpus and keeps the low-perplexity head.  The same shape
re-expressed relationally:

1. TRAIN: count character trigrams over the reference slice; the MLE
   continuation probability of trigram ``abc`` is
   ``count(abc) / sum_x count(abx)`` — the denominator is exactly the
   trigram counts re-aggregated by their 2-char prefix.
2. SCORE: every document's mean trigram probability under that model.
   Common character sequences → high mean probability; gibberish, wrong
   charsets and boilerplate-free noise score low.  (Mean probability is a
   monotone stand-in for perplexity that needs no logarithm — see below.)

Cross-engine exactness: probabilities are scaled to integers —
``(count(abc) * 10^9) div count(ab·)`` — so model values are BIGINTs with
no float division anywhere.  A document's score is then
``SUM(scaled)/COUNT(*)``: the sum is exact (≤ 10^9 per gram, < 2^53 for
any real document), and the single trailing IEEE division is deterministic
in every engine.  A log-based perplexity would hit libm ULP drift between
Spark's StrictMath and DuckDB — the same reason the TF-IDF operator uses a
rational idf.

Scale posture (100 TB): the exploded gram stream is (doc_id, 3 chars) rows
— ~3 bytes of payload per input char.  The model is aggregated with one
map-side-combining shuffle on the gram; its size is bounded by the trigram
*vocabulary*, ≤ |charset|³ and in practice ~10⁵–10⁶ rows (~tens of MB) —
a hard bound independent of corpus size, so broadcasting the scored model
back onto the gram stream is safe at any scale (unlike a *word* vocabulary
— the round-3 TF-IDF lesson).  ``broadcast_model=False`` falls back to a
shuffle join for pathological charsets.  Scoring is then one partial-agg
shuffle on doc_id.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000


def char_trigrams(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Explode each document into its overlapping character trigrams:
    ``(id, gram)`` with one row per position.  Documents shorter than 3
    chars contribute nothing (and are absent from downstream scores)."""
    return (df.where(F.length(text_col) >= 3)
              .select(F.col(id_col),
                      F.explode(F.expr(
                          f"transform(sequence(1, length({text_col}) - 2),"
                          f" i -> substring({text_col}, i, 3))")).alias("gram")))


def train_trigram_model(grams: DataFrame) -> DataFrame:
    """MLE continuation model: ``(gram, p_scaled)`` where ``p_scaled =
    (count(gram) * 10^9) div count(prefix·)``.  Two aggregates: the gram
    count (one shuffle over the gram stream, map-side combined) and the
    prefix re-aggregation of the *model* rows (tiny)."""
    c3 = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c3"))
    c2 = (c3.groupBy(F.substring("gram", 1, 2).alias("prefix"))
            .agg(F.sum("c3").alias("c2")))
    return (c3.join(c2, F.substring(c3["gram"], 1, 2) == c2["prefix"])
              .select("gram",
                      F.expr(f"c3 * {SCALE}L div c2").alias("p_scaled")))


def lm_quality_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     reference: DataFrame | None = None,
                     keep_threshold: int | None = None,
                     broadcast_model: bool = True) -> DataFrame:
    """Score documents by mean scaled trigram probability under a model
    trained on ``reference`` (default: the corpus itself — self-scoring
    flags the corpus's own outliers).  Returns ``(id, n_trigrams,
    mean_p_scaled)`` plus a ``keep`` flag when ``keep_threshold`` is set.

    The model side is broadcast by default (charset-bounded, see module
    docstring); every unmatched gram (possible only when ``reference`` is
    a separate corpus) contributes probability 0 — the out-of-vocabulary
    penalty."""
    grams = char_trigrams(df, text_col, id_col)
    ref_grams = (char_trigrams(reference, text_col, id_col)
                 if reference is not None else grams)
    model = train_trigram_model(ref_grams)
    if broadcast_model:
        model = F.broadcast(model)
    scored = (grams.join(model, "gram", "left")
                   .groupBy(id_col)
                   .agg(F.count(F.lit(1)).alias("n_trigrams"),
                        (F.sum(F.coalesce("p_scaled", F.lit(0)))
                         / F.count(F.lit(1))).alias("mean_p_scaled")))
    if keep_threshold is not None:
        scored = scored.withColumn(
            "keep", F.col("mean_p_scaled") >= F.lit(float(keep_threshold)))
    return scored


def lm_quality_oracle_sql(table: str = "documents",
                          ref_table: str | None = None,
                          text_col: str = "text", id_col: str = "doc_id",
                          keep_threshold: int | None = None) -> str:
    """DuckDB replay: identical gram explosion over the scored corpus,
    identical integer-scaled model over the reference corpus (default:
    the scored corpus itself), LEFT JOIN with a 0 OOV probability, and the
    identical SUM/COUNT trailing division."""
    keep = (f",\n       (SUM(COALESCE(m.p_scaled, 0)) / COUNT(*)) "
            f">= {keep_threshold} AS keep"
            if keep_threshold is not None else "")

    def grams(src: str) -> str:
        return (f"SELECT {id_col}, substr({text_col}, CAST(i AS INTEGER), 3) AS gram\n"
                f"  FROM (SELECT {id_col}, {text_col},\n"
                f"               unnest(generate_series(1, len({text_col}) - 2)) AS i\n"
                f"        FROM {src}\n"
                f"        WHERE len({text_col}) >= 3)")

    return f"""
WITH g AS (
  {grams(table)}),
gref AS (
  {grams(ref_table) if ref_table is not None else 'SELECT * FROM g'}),
c3 AS (SELECT gram, COUNT(*) AS c3 FROM gref GROUP BY gram),
c2 AS (SELECT substr(gram, 1, 2) AS prefix, SUM(c3) AS c2
       FROM c3 GROUP BY prefix),
m AS (SELECT gram,
             CAST((c3 * {SCALE}) // c2 AS BIGINT) AS p_scaled
      FROM c3 JOIN c2 ON substr(c3.gram, 1, 2) = c2.prefix)
SELECT g.{id_col},
       COUNT(*) AS n_trigrams,
       SUM(COALESCE(m.p_scaled, 0)) / COUNT(*) AS mean_p_scaled{keep}
FROM g LEFT JOIN m USING (gram)
GROUP BY g.{id_col}
"""
