"""Exact all-pairs cosine-threshold similarity join (AP-SS family).

MinHash-LSH (ops/dedup_text.py) finds near-duplicates APPROXIMATELY:
banding trades recall for candidate count.  The classic exact
alternative is the all-pairs similarity-search family (Bayardo et al.
WWW'07 "Scaling Up All Pairs Similarity Search"; Vernica et al.
SIGMOD'10 for the MapReduce shape): prefix filtering guarantees that
EVERY pair at or above the cosine threshold shares at least one
"prefix" term, so candidate generation is an equi-join on prefix terms
— sub-quadratic on real (Zipfian) corpora — and an exact verification
pass computes true cosines for candidates only.  No bands, no hash
collisions, no missed pairs: the output is provably identical to the
brute-force all-pairs join.

The prefix guarantee (unit vectors, any fixed global term order):
sort each document's terms by the global order and let ``s(i)`` be the
L2 norm of the suffix starting at position ``i``.  Define the prefix
as the positions with ``s(i) >= t``.  For any pair with
``cos(a, b) >= t``, let ``tau`` be the SHARED term that is earliest in
the global order.  Every shared term sits at or after ``tau`` in both
documents, so ``cos(a, b) <= s_a(tau) * ||b|| = s_a(tau)`` — hence
``s_a(tau) >= t`` and ``tau`` is in a's prefix; symmetrically in b's.
The prefix equi-join therefore finds every qualifying pair via
``tau``.  (Position 0 has ``s = 1 >= t``, so every non-empty document
emits at least one prefix term.)

Term order is (document frequency asc, term asc): rare terms first
pushes the frequent terms — the ones that would explode the self-join
— into suffixes, which is what makes prefix filtering sub-quadratic
under Zipf.  The hot-term hazard that remains is a term that is BOTH
frequent and prefix-eligible (only when many documents concentrate
their weight on it); unlike the Jaccard path's stop-shingle cap it
cannot be dropped without breaking exactness, so the operator surfaces
it instead: ``max_prefix_term_df`` raises loudly when any prefix term
lands in more documents' prefixes than the bound (the correct fixes —
raise the threshold or fall back to LSH — are the caller's call).

Plan shape (all equi-joins, no cartesian):
1. one (doc, term) shuffle -> tf; L2-normalize per doc (doc window);
2. df via groupBy(term) — NEVER a window over term (Zipf skew);
3. weighted postings = tf x df join, pinned with a lazy
   localCheckpoint: the table is a 3-consumer DIAMOND (prefix join,
   verify side a, verify side b) and Spark will not reuse the exchange
   across differently-pruned branches (see tfidf_top_terms);
4. prefix self-join on term (id_a < id_b) -> distinct candidates;
5. verify: candidates join postings on doc_a, then on (doc_b, term),
   groupBy pair -> exact cosine; filter on the ROUNDED value so
   threshold-edge membership is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.text import tokens


def cosine_threshold_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
    max_prefix_term_df: int | None = 10_000,
    materialize_postings: bool = True,
) -> DataFrame:
    """All document pairs with tf-weighted cosine >= ``threshold``
    (exact — equal to the brute-force all-pairs join by construction).

    Returns (doc_a, doc_b, cosine) with doc_a < doc_b and cosine
    rounded to ``round_digits``.  The threshold applies to the rounded
    value, making pair membership engine-stable at the boundary.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")

    exploded = docs.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = exploded.groupBy("__doc", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )

    # L2-normalize within the doc partition; the same exchange serves
    # the ordered suffix-norm window below.
    w_doc = Window.partitionBy("__doc")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        tf.join(dfreq, "term")
        .withColumn("w", F.col("tf") / F.sqrt(F.sum(F.col("tf") ** 2).over(w_doc)))
        .select("__doc", "term", "df", "w")
    )
    if materialize_postings:
        # 3-consumer diamond: without the pin the corpus is re-tokenized
        # and re-shuffled per consumer (no ReusedExchange across pruned
        # branches — the round-5 Catalyst pathology, see SCALE.md).
        weighted = weighted.localCheckpoint(eager=False)

    w_suffix = (
        Window.partitionBy("__doc")
        .orderBy(F.asc("df"), F.asc("term"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = weighted.withColumn(
        "__suffix_norm", F.sqrt(F.sum(F.col("w") ** 2).over(w_suffix))
    ).filter(
        # float guard: the full-vector position computes sum(w^2) ~ 1.0
        # up to rounding; nudge so threshold=1.0 still admits position 0
        F.col("__suffix_norm") >= F.lit(float(threshold)) - F.lit(1e-9)
    ).select("__doc", "term")

    if max_prefix_term_df is not None:
        hot = (
            prefix.groupBy("term")
            .agg(F.count(F.lit(1)).alias("pdf"))
            .filter(F.col("pdf") > max_prefix_term_df)
            .limit(1)
            .collect()
        )
        if hot:
            raise ValueError(
                f"prefix term {hot[0]['term']!r} appears in "
                f"{hot[0]['pdf']} document prefixes "
                f"(> max_prefix_term_df={max_prefix_term_df}); the "
                "candidate self-join would be quadratic in that count. "
                "Raise the threshold, pre-clean the corpus, or use the "
                "MinHash-LSH path (dedup_minhash_lsh) for this data."
            )

    a, b = prefix.alias("a"), prefix.alias("b")
    candidates = (
        a.join(b, (F.col("a.term") == F.col("b.term"))
               & (F.col("a.__doc") < F.col("b.__doc")))
        .select(
            F.col("a.__doc").alias("__da"), F.col("b.__doc").alias("__db")
        )
        .distinct()
    )

    pa = weighted.select(
        F.col("__doc").alias("__da"), "term", F.col("w").alias("wa")
    )
    pb = weighted.select(
        F.col("__doc").alias("__db"), "term", F.col("w").alias("wb")
    )
    cos = (
        candidates.join(pa, "__da")
        .join(pb, ["__db", "term"])
        .groupBy("__da", "__db")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), round_digits).alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
    return cos.select(
        F.col("__da").alias("doc_a"), F.col("__db").alias("doc_b"), "cosine"
    )


def cosine_threshold_pairs_bruteforce(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Reference implementation: FULL postings self-join (every shared
    term, no prefix filter).  Same output contract; O(sum df^2) work —
    test oracle and small-corpus baseline only."""
    exploded = docs.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = exploded.groupBy("__doc", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    w_doc = Window.partitionBy("__doc")
    weighted = tf.withColumn(
        "w", F.col("tf") / F.sqrt(F.sum(F.col("tf") ** 2).over(w_doc))
    ).select("__doc", "term", "w")
    a, b = weighted.alias("a"), weighted.alias("b")
    return (
        a.join(b, (F.col("a.term") == F.col("b.term"))
               & (F.col("a.__doc") < F.col("b.__doc")))
        .groupBy(F.col("a.__doc").alias("doc_a"), F.col("b.__doc").alias("doc_b"))
        .agg(F.round(F.sum(F.col("a.w") * F.col("b.w")), round_digits).alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
