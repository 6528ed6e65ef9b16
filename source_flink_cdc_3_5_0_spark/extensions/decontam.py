"""Benchmark decontamination: exact word-k-gram overlap between a (small)
eval/benchmark set and the training corpus.

The standard LLM-pipeline hygiene step (reference has no analog — this is a
declared extension alongside dedup/similarity, SURVEY §2.4 posture): any
training document sharing ≥1 distinct word k-gram with an eval document is
flagged, with the shared-gram count as evidence strength.

Scale shape: distinct k-grams are computed JVM-side (no Python), both sides
explode to (doc_id, gram) rows, and the join BROADCASTS the exploded eval
side — eval suites are tiny (thousands of docs) next to a 100 TB corpus, so
the corpus is never shuffled: one codegen'd scan+explode+broadcast-join+
partial-agg pass. If the eval side ever outgrows broadcast range, dropping
the hint degrades gracefully to a hash join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_kgrams_nofallback(text_col: str, k: int):
    """Distinct word k-grams as a Column; docs with fewer than k tokens
    yield an empty array (mirrors the oracle's ``len(tokens) >= k`` filter —
    unlike dedup.word_ngrams_col there is no whole-text fallback, because a
    short doc cannot contain a k-gram of the eval set)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    kgrams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(
        F.when(n >= k, kgrams).otherwise(F.array().cast("array<string>"))
    )


def ngram_overlap_pairs(corpus: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4) -> DataFrame:
    """(eval_doc_id, corpus_doc_id, n_shared_grams) for every corpus doc
    sharing at least one distinct word k-gram with an eval doc."""
    def grams_of(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(word_kgrams_nofallback(text_col, k)).alias("gram"),
        )

    ev = F.broadcast(grams_of(eval_df, "eval_doc_id"))
    co = grams_of(corpus, "corpus_doc_id")
    return (
        co.join(ev, on="gram")
        .groupBy("eval_doc_id", "corpus_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
