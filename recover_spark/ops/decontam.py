"""Benchmark decontamination: flag corpus documents sharing word
n-grams with an evaluation/benchmark set.

The standard LLM training-data hygiene step (cf. GPT-3 appendix C /
PaLM: 13-gram overlap): any training document containing an n-gram
that also appears in a held-out benchmark is contaminated and must be
dropped or flagged before training.

Scale design: the benchmark side is small by construction (eval sets
are thousands of documents, the corpus is billions), so its distinct
shingle set is BROADCAST; the corpus side explodes its per-document
distinct shingles map-side and hits the broadcast hash relation
without shuffling the corpus.  The only shuffle is the per-document
hit-count aggregation (map-side combined, one row per contaminated
doc).  The corpus is never joined against itself and never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.text import tokens, word_ngrams_of


def benchmark_ngram_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``n``-grams
    appear anywhere in ``benchmark``, plus a 0/1 contaminated flag.

    Returns all corpus ids (clean documents carry ``n_hits = 0``) so
    the output composes as an enrichment, not a filter.
    """
    bench_grams = (
        benchmark.select(
            F.explode(
                word_ngrams_of(tokens(F.col(text_col)), n)
            ).alias("__gram")
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        id_col,
        F.explode(word_ngrams_of(tokens(F.col(text_col)), n)).alias("__gram"),
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.when(F.coalesce(F.col("n_hits"), F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )
