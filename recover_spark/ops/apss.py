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


def _weighted_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, term, df, w): tf L2-normalized per doc + term document
    frequency.  One (doc, term) shuffle for tf; df via groupBy(term) —
    NEVER a window over term (a Zipfian hot term would make one window
    partition corpus-sized); per-doc norm on the doc window."""
    exploded = docs.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = exploded.groupBy("__doc", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    w_doc = Window.partitionBy("__doc")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dfreq, "term")
        .withColumn("w", F.col("tf") / F.sqrt(F.sum(F.col("tf") ** 2).over(w_doc)))
        .select("__doc", "term", "df", "w")
    )


def cosine_threshold_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
    strategy: str = "auto",
    max_prefix_term_df: int | None = 10_000,
    max_dense_vocab: int = 4096,
    num_blocks: int = 16,
    materialize_postings: bool = True,
) -> DataFrame:
    """All document pairs with tf-weighted cosine >= ``threshold``
    (exact — equal to the brute-force all-pairs join by construction).

    Returns (doc_a, doc_b, cosine) with doc_a < doc_b and cosine
    rounded to ``round_digits``.  The threshold applies to the rounded
    value, making pair membership engine-stable at the boundary.

    ``strategy`` picks the physical plan — BOTH are exact; they differ
    only in which data shape they stay sub-quadratic on:

    - ``"prefix"`` — the sparse AP-SS index path (module docstring).
      Sub-quadratic when the vocabulary is open and Zipfian: each
      document's prefix is its RAREST terms, so the candidate join
      keys on low-df terms.  This is the 100 TB path for natural text.
    - ``"dense"`` — all-block-pairs GEMM.  When the vocabulary is
      SMALL (bounded feature space — templated logs, categorical
      bags), every term is hot, an inverted index degenerates to
      all-pairs candidates, and no filter can save it; the right plan
      is the dense one: docs become V-dim vectors, split into B row
      blocks, and each of the B(B+1)/2 block PAIRS is one
      ``applyInPandas`` task computing a numpy GEMM tile.  Nothing is
      ever collected or broadcast; the shuffle replicates each row B
      times (B ~ tasks**0.5), and per-task memory is 2n/B vectors —
      the standard distributed dense self-join.  Guarded by
      ``max_dense_vocab``.
    - ``"auto"`` (default) — one vocabulary-count probe picks dense
      when the vocab fits ``max_dense_vocab``, else prefix.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if strategy not in ("auto", "prefix", "dense"):
        raise ValueError(f"unknown strategy {strategy!r}")

    weighted = _weighted_postings(docs, id_col, text_col)
    if materialize_postings:
        # multi-consumer diamond: without the pin the corpus is
        # re-tokenized and re-shuffled per consumer (no ReusedExchange
        # across pruned branches — the round-5 Catalyst pathology).
        weighted = weighted.localCheckpoint(eager=False)

    if strategy == "auto":
        vocab_n = weighted.select("term").distinct().count()
        strategy = "dense" if vocab_n <= max_dense_vocab else "prefix"
    if strategy == "dense":
        return _dense_block_pairs(
            weighted, threshold, round_digits, max_dense_vocab, num_blocks
        )

    w_suffix = (
        Window.partitionBy("__doc")
        .orderBy(F.asc("df"), F.asc("term"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = (
        weighted.withColumn(
            "__sn", F.sqrt(F.sum(F.col("w") ** 2).over(w_suffix))
        )
        # float guard: the full-vector position computes sum(w^2) ~ 1.0
        # up to rounding; nudge so threshold=1.0 still admits position 0
        .filter(F.col("__sn") >= F.lit(float(threshold)) - F.lit(1e-9))
        # suffix norm EXCLUDING the current term, for the positional
        # bound below
        .withColumn(
            "__snn",
            F.sqrt(F.greatest(F.col("__sn") ** 2 - F.col("w") ** 2, F.lit(0.0))),
        )
        .select("__doc", "term", "w", "__snn")
    )

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
                "Raise the threshold, use strategy='dense' (bounded "
                "vocab), or the MinHash-LSH path (dedup_minhash_lsh)."
            )

    a, b = prefix.alias("a"), prefix.alias("b")
    # Positional bound (PPJoin-style, adapted to cosine): every true
    # pair is generated via its FIRST shared term tau*, where all
    # shared weight is w_a*w_b (the tau* product) plus at most
    # snn_a*snn_b (Cauchy-Schwarz over the strictly-later suffixes) —
    # instances failing the bound can be dropped without losing the
    # tau* instance of any qualifying pair.
    candidates = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.__doc") < F.col("b.__doc"))
            & (
                F.col("a.w") * F.col("b.w")
                + F.col("a.__snn") * F.col("b.__snn")
                >= F.lit(float(threshold)) - F.lit(1e-9)
            ),
        )
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


def _dense_block_pairs(
    weighted: DataFrame,
    threshold: float,
    round_digits: int,
    max_dense_vocab: int,
    num_blocks: int,
) -> DataFrame:
    """Exact all-pairs cosine via all-block-pairs GEMM tiles.

    Docs are hashed into ``num_blocks`` row blocks; each doc's sparse
    (term_idx, w) entries are replicated to every block PAIR its block
    participates in, and one ``applyInPandas`` task per (bi, bj) group
    assembles the two dense tiles and multiplies them — numpy GEMM
    rate, fully distributed, nothing collected or broadcast.  Each
    unordered doc pair lives in exactly one block pair, so pairs are
    emitted exactly once.  Shuffle volume is num_blocks x postings;
    per-task memory two n/num_blocks-row tiles.
    """
    import numpy as np
    import pandas as pd

    vocab = weighted.select("term").distinct()
    if vocab.count() > max_dense_vocab:
        raise ValueError(
            "strategy='dense' requires vocabulary <= "
            f"max_dense_vocab={max_dense_vocab} terms; use "
            "strategy='prefix' for open-vocabulary corpora"
        )
    # vocab-sized table: a single-partition window is bounded by the
    # guard above, never corpus-sized
    vidx = vocab.withColumn(
        "__vi", F.row_number().over(Window.orderBy("term")) - 1
    )

    entries = (
        weighted.join(F.broadcast(vidx), "term")
        .groupBy("__doc")
        .agg(
            F.collect_list(F.struct("__vi", "w")).alias("__entries"),
        )
        .withColumn(
            "__block",
            F.pmod(F.xxhash64(F.col("__doc")), F.lit(num_blocks)).cast("int"),
        )
    )
    # replicate each doc to the block pairs its block participates in:
    # (min(b,k), max(b,k)) for every k — B copies per doc
    pairs_of = F.transform(
        F.sequence(F.lit(0), F.lit(num_blocks - 1)),
        lambda k: F.struct(
            F.least(F.col("__block"), k).alias("bi"),
            F.greatest(F.col("__block"), k).alias("bj"),
        ),
    )
    fanned = entries.select(
        "__doc", "__block", "__entries",
        F.explode(F.array_distinct(pairs_of)).alias("__bp"),
    ).select(
        "__doc", "__block", "__entries",
        F.col("__bp.bi").alias("__bi"), F.col("__bp.bj").alias("__bj"),
    )

    # admit values that ROUND up to the threshold; the final filter on
    # the rounded column makes membership engine-stable
    thr = float(threshold) - 10.0 ** (-round_digits) / 2

    def tile_gemm(key, pdf):
        bi, bj = key
        dim = int(
            max(
                (max(e["__vi"] for e in es) for es in pdf["__entries"]),
                default=-1,
            )
        ) + 1
        if dim == 0:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})

        def dense(rows: pd.DataFrame) -> tuple:
            ids = rows["__doc"].to_numpy()
            mat = np.zeros((len(rows), dim))
            for r, es in enumerate(rows["__entries"]):
                for e in es:
                    mat[r, e["__vi"]] = e["w"]
            return ids, mat

        if bi == bj:
            ids, mat = dense(pdf)
            sims = mat @ mat.T
            ii, jj = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame(
                {"doc_a": ids[ii], "doc_b": ids[jj], "cosine": sims[ii, jj]}
            )
        left = pdf[pdf["__block"] == bi]
        right = pdf[pdf["__block"] == bj]
        ids_a, ma = dense(left)
        ids_b, mb = dense(right)
        sims = ma @ mb.T
        ii, jj = np.nonzero(sims >= thr)
        da, db = ids_a[ii], ids_b[jj]
        lo, hi = np.minimum(da, db), np.maximum(da, db)
        return pd.DataFrame({"doc_a": lo, "doc_b": hi, "cosine": sims[ii, jj]})

    # Output id type follows the INPUT id column (ADVICE r5: the two
    # exact strategies must share one type contract — a hardcoded
    # `long` here made auto-picked dense fail at Arrow conversion for
    # string ids while prefix preserved them).  numpy's object-dtype
    # comparisons/minimum give the same doc_a < doc_b ordering for
    # strings as for ints.
    id_type = weighted.schema["__doc"].dataType.simpleString()
    raw = fanned.groupBy("__bi", "__bj").applyInPandas(
        tile_gemm, f"doc_a {id_type}, doc_b {id_type}, cosine double"
    )
    return raw.select(
        "doc_a", "doc_b", F.round("cosine", round_digits).alias("cosine")
    ).filter(F.col("cosine") >= F.lit(float(threshold)))


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
