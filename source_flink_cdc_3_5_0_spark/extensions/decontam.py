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

from .dedup import tokens_col, word_ngrams_col


def ngram_overlap_pairs(corpus: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4) -> DataFrame:
    """(eval_doc_id, corpus_doc_id, n_shared_grams) for every corpus doc
    sharing at least one distinct word k-gram with an eval doc."""
    def grams_of(df: DataFrame, out_id: str) -> DataFrame:
        # tokens materialized as a real column first — the higher-order
        # gram builder is interpreted and would re-tokenize per element_at
        # reference otherwise (see word_ngrams_col docstring; was 4x wall
        # time on this query). No whole-text fallback: a doc shorter than
        # k words cannot contain a k-gram of the eval set.
        return (
            df.withColumn("__toks", tokens_col(text_col))
            .select(
                F.col(id_col).alias(out_id),
                F.explode(word_ngrams_col(
                    "__toks", k, fallback_whole_text=False,
                    from_tokens=True)).alias("gram"),
            ))

    ev = F.broadcast(grams_of(eval_df, "eval_doc_id"))
    co = grams_of(corpus, "corpus_doc_id")
    return (
        co.join(ev, on="gram")
        .groupBy("eval_doc_id", "corpus_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
