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


def fuzzy_benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    min_signature_agreement: float = 0.5,
) -> DataFrame:
    """Fuzzy decontamination: corpus documents that are NEAR-duplicates
    of benchmark documents (MinHash-estimated Jaccard), catching the
    paraphrased / lightly-edited contamination that exact n-gram
    matching (benchmark_ngram_hits) misses — the hygiene step current
    LLM data pipelines layer on top of the GPT-3-style exact rule.

    Same asymmetry as the exact path: the benchmark side is tiny, so
    its (band, digest) entries BROADCAST into the corpus's band
    entries — the corpus computes signatures map-side (one doc-keyed
    shuffle for the min-aggregation), joins the broadcast bands
    without moving, and is never self-joined or collected.  Candidate
    generation is the standard LSH band equi-join (ops/dedup_text.py),
    never all-pairs.

    Returns (corpus id, bench_id, signature_agreement) for pairs at or
    above ``min_signature_agreement`` — one row per contaminated
    (corpus doc, benchmark doc) pair.
    """
    from recover_spark.ops.dedup_text import band_digests, minhash_signatures

    bench_id = bench_id_col or id_col
    sig_c = minhash_signatures(
        corpus, text_col, id_col, num_hashes, shingle_size
    )
    sig_b = minhash_signatures(
        benchmark, text_col, bench_id, num_hashes, shingle_size
    )
    bd_c = band_digests(sig_c, id_col, num_hashes, bands)
    bd_b = band_digests(sig_b, bench_id, num_hashes, bands).select(
        F.col(bench_id).alias("bench_id"),
        F.col("minhash").alias("mh_b"),
        "band",
        "band_hash",
    )
    pairs = (
        bd_c.join(F.broadcast(bd_b), on=["band", "band_hash"])
        .select(id_col, "bench_id", "minhash", "mh_b")
        .distinct()
    )
    agreement = (
        F.size(
            F.filter(
                F.zip_with(
                    F.col("minhash"), F.col("mh_b"), lambda x, y: x == y
                ),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes))
    ).alias("signature_agreement")
    return pairs.select(id_col, "bench_id", agreement).filter(
        F.col("signature_agreement") >= min_signature_agreement
    )
