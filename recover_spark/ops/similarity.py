"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n_queries * n_corpus),
fine whenever the query set is small enough to broadcast (the common
"dedup this batch against the corpus" shape: corpus-side stays fully
distributed, no shuffle of the big side at all).

Scale path: LSH bucketing via random hyperplanes (SimHash for vectors) —
candidates come from an equi-join on bucket signature, then exact
re-scoring.  Probing B buckets bounds recall loss; at 100 TB the
big-side shuffle is keyed on bucket ids (tunable fan-out).

All dot products are Catalyst expressions (functions/vectors.py) —
JVM-side, codegen'd; a numpy Pandas-UDF alternative is provided for very
wide vectors where Arrow batching wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    ``queries`` is broadcast (small side); per-query top-k uses a
    window over (query_id) — the shuffle is on query ids only AFTER the
    similarity map, and map-side the corpus never moves.

    Returns (query_id, vec_id, cosine, rank), rank 1..k, self-match
    excluded when ids share a namespace.
    """
    qid = query_id_col or f"query_{id_col}"
    q = queries.select(
        F.col(id_col).alias(qid), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col(qid))
    scored = scored.select(
        qid,
        id_col,
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(qid).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (hash-derived,
    engine-portable so tests are reproducible without RNG state)."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane{seed}:{plane}:{j}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # [-1, 1)
    return vals


def lsh_bucket_signature(
    vec_col, dim: int, num_planes: int = 8, seed: int = 42
):
    """Random-hyperplane LSH signature: bit i = sign(v . h_i)."""
    sig = None
    for p in range(num_planes):
        plane = _hyperplane(dim, seed, p)
        dot = None
        for j, w in enumerate(plane):
            term = vec_col[j].cast("double") * F.lit(w)
            dot = term if dot is None else (dot + term)
        bit = F.when(dot >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sig.cast("int")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join then exact rescoring.

    Same output shape as brute_force_topk, restricted to same-bucket
    candidates.  Recall improves with fewer planes (bigger buckets) or
    multi-probe; at scale the join is an equi-join on (bucket) instead of
    a cross join.
    """
    qid = f"query_{id_col}"
    c = corpus.withColumn("__bucket", lsh_bucket_signature(F.col(vec_col), dim, num_planes))
    q = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("__qvec"),
    ).withColumn("__bucket", lsh_bucket_signature(F.col("__qvec"), dim, num_planes))
    cand = c.join(F.broadcast(q), on="__bucket").filter(F.col(id_col) != F.col(qid))
    scored = cand.select(
        qid,
        id_col,
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Without ``block_col`` this is an all-pairs self-join — exact but
    quadratic; use it per-partition/batch.  With ``block_col`` (e.g. an
    LSH bucket from ``lsh_bucket_signature``) pairs are restricted to
    equal blocks: the scalable path.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    joined = (
        a.join(b, on=block_col) if block_col else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
