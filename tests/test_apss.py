"""Exact all-pairs cosine-threshold join (ops/apss.py).

The load-bearing claim is EXACTNESS: prefix filtering must return the
identical pair set (and identical cosines) as the brute-force postings
self-join, at every threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recover_spark.ops.apss import (
    cosine_threshold_pairs,
    cosine_threshold_pairs_bruteforce,
)


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),  # near-dup of 1
        (3, "a completely different document about spark engines"),
        (4, "spark engines process completely different document workloads"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (6, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        (7, "dolor sit amet lorem ipsum elit consectetur adipiscing"),  # perm of 6
        (8, "unrelated singleton text with unique vocabulary entirely"),
        (9, ""),  # empty doc: no postings, never appears
        (10, "the the the the the"),  # single-term doc
        (11, "the of and to in is it that for a"),  # all stopwords
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("strategy", ["prefix", "dense"])
@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7, 0.9, 1.0])
def test_both_strategies_equal_brute_force(spark, threshold, strategy):
    docs = _corpus(spark)
    fast = sorted(
        map(
            tuple,
            cosine_threshold_pairs(
                docs, threshold, strategy=strategy, num_blocks=3
            ).collect(),
        )
    )
    slow = sorted(
        map(tuple, cosine_threshold_pairs_bruteforce(docs, threshold).collect())
    )
    assert fast == slow
    if threshold <= 0.9:
        assert fast, "corpus contains near-dups; result must be non-empty"


def test_auto_picks_dense_on_small_vocab_and_matches(spark):
    docs = _corpus(spark)
    auto = sorted(
        map(tuple, cosine_threshold_pairs(docs, 0.7).collect())
    )
    slow = sorted(
        map(tuple, cosine_threshold_pairs_bruteforce(docs, 0.7).collect())
    )
    assert auto == slow


def test_dense_preserves_string_ids(spark):
    """ADVICE r5: auto-routing a small-vocabulary corpus with STRING
    ids to the dense path must preserve the id type (the prefix path
    always did), not fail at Arrow conversion or coerce to long."""
    rows = [(f"doc-{i:02d}", t) for i, t in enumerate(
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumped over the lazy dog",
            "a completely different document about spark engines",
            "the quick brown fox jumps over the lazy dog",
        ]
    )]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    for strategy in ("dense", "prefix", "auto"):
        out = cosine_threshold_pairs(
            docs, 0.7, strategy=strategy, num_blocks=2
        )
        assert out.schema["doc_a"].dataType.simpleString() == "string"
        got = sorted((r.doc_a, r.doc_b) for r in out.collect())
        assert ("doc-00", "doc-03") in got, (strategy, got)
        assert all(a < b for a, b in got)


def test_dense_guard_rejects_open_vocab(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="max_dense_vocab"):
        cosine_threshold_pairs(
            docs, 0.7, strategy="dense", max_dense_vocab=3
        ).collect()


def test_exact_duplicates_score_one(spark):
    docs = _corpus(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in cosine_threshold_pairs(docs, 0.99).collect()
    }
    assert got[(1, 5)] == 1.0
    # permutation of the same bag of words is cosine 1.0 too
    assert got[(6, 7)] == 1.0


def test_near_duplicate_found_unrelated_not(spark):
    docs = _corpus(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in cosine_threshold_pairs(docs, 0.7).collect()
    }
    assert (1, 2) in pairs  # one word changed
    assert all(8 not in p for p in pairs)  # unique vocabulary


def test_hot_prefix_term_guard_raises(spark):
    docs = spark.createDataFrame(
        [(i, "common anchor words shared everywhere") for i in range(30)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_prefix_term_df"):
        cosine_threshold_pairs(
            docs, 0.5, strategy="prefix", max_prefix_term_df=10
        )


def test_invalid_threshold_rejected(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="threshold"):
        cosine_threshold_pairs(docs, 0.0)
    with pytest.raises(ValueError, match="threshold"):
        cosine_threshold_pairs(docs, 1.5)


def test_prefix_join_is_smaller_than_full_join(spark):
    """The point of prefix filtering: candidate pairs strictly fewer
    than the full shared-term join on a corpus with common terms."""
    docs = _corpus(spark)
    from recover_spark.functions.text import tokens

    exploded = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).distinct()
    a, b = exploded.alias("a"), exploded.alias("b")
    full_candidates = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    # count candidate pairs the prefix join generates at t=0.9 by
    # running the operator's own prefix stage: reuse the public result
    # as an upper bound — at t=0.9 only dup pairs survive, while the
    # full join connects every stopword-sharing pair
    result_pairs = cosine_threshold_pairs(docs, 0.9).count()
    assert result_pairs < full_candidates
