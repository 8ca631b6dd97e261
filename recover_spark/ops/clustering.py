"""Distributed k-means primitives over embedding columns.

One Lloyd iteration of spherical k-means (assignment by maximum
normalized dot product — the cosine argmax — matching the IVF coarse
quantizer in ``ops/similarity.py`` exactly, so a trained step here
drops straight into ``build_ivf_index``).

Scale design: assignment is map-side only — the centroid matrix lives
in the task closure and each Arrow batch is scored with ONE numpy GEMM
(``_assign_lists_gemm``); the corpus is never shuffled for assignment.
The update step aggregates per-dimension means as mergeable partials
(map-side combine), so the single shuffle carries exactly
``n_centroids`` rows x ``dim`` columns of partial sums — vectors are
never exploded into a ``dim x`` row blow-up.  Iterating to convergence
is a driver-side loop over this step with only the K x dim centroid
matrix ever leaving the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recover_spark.ops.similarity import _assign_lists_gemm, _collect_seeds


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (cosine argmax, ties to the lowest
    centroid id) as an added ``cid`` column.  Map-side only."""
    assigned = _assign_lists_gemm(corpus, centroids, id_col, vec_col)
    return assigned.withColumnRenamed("__list", "cid").drop("__cnorm")


def kmeans_step(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """One Lloyd iteration: assign every vector to its nearest centroid,
    then return the recomputed per-cluster mean as (cid, dim, centroid)
    rows (1-based dim, matching the ``stack`` layout of the centroid
    aggregation queries).

    ``centroids`` defaults to the deterministic seeds (rows with
    ``id < n_centroids``) so a first step is reproducible; pass the
    previous step's centroids to iterate.
    """
    seeds = centroids or _collect_seeds(corpus, n_centroids, id_col, vec_col)
    assigned = kmeans_assign(corpus, seeds, id_col, vec_col)
    aggs = [
        F.avg(F.col(vec_col)[i].cast("double")).alias(f"d{i}")
        for i in range(dim)
    ]
    wide = assigned.groupBy("cid").agg(*aggs)
    stack_args = ", ".join(f"{i + 1}, d{i}" for i in range(dim))
    return wide.select(
        F.col("cid").cast("long").alias("cid"),
        F.expr(f"stack({dim}, {stack_args}) AS (dim, centroid)"),
    ).select(
        "cid",
        F.col("dim").cast("int").alias("dim"),
        F.round("centroid", 6).alias("centroid"),
    )
