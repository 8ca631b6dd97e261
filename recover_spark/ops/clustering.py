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

from recover_spark.functions.local import tiny_df

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
    # dim-sized avg list as SQL text (the embedding_centroid_drift note)
    aggs = [
        F.expr(f"avg(CAST(`{vec_col}`[{i}] AS DOUBLE))").alias(f"d{i}")
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


def silhouette_by_cluster(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-cluster simplified silhouette under cosine distance — the
    clustering-quality readout that tells you whether the k-means /
    IVF partitioning is real structure or arbitrary cuts, WITHOUT the
    O(N^2) pairwise silhouette: each point scores against CENTROIDS
    only (Hruschka et al.'s simplified silhouette), a = distance to
    its own centroid, b = to the nearest other, s = (b - a) /
    max(a, b).  With cosine distance 1 - sim and best >= second this
    collapses to s = (best_sim - second_sim) / (1 - second_sim); a
    point equidistant to two centroids scores 0, and the degenerate
    second_sim == 1 yields NULL via ``try_divide`` (excluded from the
    cluster mean, like both engines' ``avg``).

    Engine shape: the K centroid vectors ride ONE broadcast
    DataFrame of array columns (never literal expression nodes — the
    Holt-Winters lesson); similarities are JVM ``zip_with`` folds;
    the top-2 selection is a window over exactly K rows per point
    (keyed on the point id — no hot key by construction), and
    everything after is cluster-cardinality.
    """
    from pyspark.sql import Window

    seeds = centroids or _collect_seeds(corpus, n_centroids, id_col, vec_col)
    spark = corpus.sparkSession
    cdf = tiny_df(
        spark,
        [(int(cid), [float(x) for x in vec]) for cid, vec in seeds],
        "cid long, __c array<double>",
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__e")
        )
        .crossJoin(F.broadcast(cdf))
        .select(
            id_col,
            "cid",
            F.try_divide(
                _dot(F.col("__e"), F.col("__c")),
                F.sqrt(_dot(F.col("__e"), F.col("__e")))
                * F.sqrt(_dot(F.col("__c"), F.col("__c"))),
            ).alias("__sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("cid").asc()
    )
    top2 = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= 2
    )
    per_point = top2.groupBy(id_col).agg(
        F.max(F.when(F.col("__rn") == 1, F.col("cid"))).alias("cid"),
        F.max(F.when(F.col("__rn") == 1, F.col("__sim"))).alias("__best"),
        F.max(F.when(F.col("__rn") == 2, F.col("__sim"))).alias("__second"),
    )
    s = F.try_divide(
        F.col("__best") - F.col("__second"),
        F.lit(1.0) - F.col("__second"),
    )
    return per_point.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(s) + F.lit(1e-9), round_digits).alias(
            "mean_silhouette"
        ),
    )


def embedding_centroid_drift(
    df: DataFrame,
    group_col: str,
    era_col,
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group embedding-space drift between two eras: the cosine
    between the eras' mean vectors plus the centroid-norm ratio — the
    EMBEDDING lens of the drift family (PSI/KS/JS/W1/chi² watch scalar
    and categorical columns; this watches the representation itself:
    an encoder version bump, a domain shift, or a pipeline bug moves
    the centroid long before any single scalar trips).

    ``era_col`` is any binary expression/column (0 = baseline era,
    1 = current).  Engine shape: ONE fact aggregate to (group, era)
    centroids — ``dim`` avg columns with map-side partials, the
    emb_kmeans shape — PINNED behind a lazy ``localCheckpoint``
    before the era split (two filtered branches of an aggregate are
    canonically different after pruning, so without the pin Catalyst
    recomputes the fact aggregate per branch — the aggregate-diamond
    lesson), then a group-keyed self-join of the two era rows
    (2 x |groups| frame) and scalar folds.  NULL-era rows are
    excluded.  Groups missing either era are absent (no baseline, no
    drift statement).  Zero centroids yield NULL cosine via
    ``try_divide``.

    Output: (group, n_base, n_cur, centroid_cosine, norm_ratio) —
    cosine 1.0 means direction unchanged; norm_ratio |cur|/|base|
    catches magnitude collapse (e.g. an un-normalized encoder).
    """
    era = F.col(era_col) if isinstance(era_col, str) else era_col
    # dim-sized expression lists ship as SQL text (one py4j round trip
    # per expression / per select, r14 optimization — the affine-scan
    # and bucket_chain lesson): built with Column operators the avg
    # list + renames + three dot/norm chains cost ~18k round trips per
    # plan build at dim=64.  The SQL parses to the identical Catalyst
    # trees (same casts, same left-associated add order).
    cent = (
        df.filter(era.isNotNull())
        .groupBy(F.col(group_col), era.cast("int").alias("__era"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[
                F.expr(
                    f"avg(CAST(`{vec_col}`[{i}] AS DOUBLE))"
                ).alias(f"__c{i}")
                for i in range(dim)
            ],
        )
        .localCheckpoint(eager=False)
    )
    base = cent.filter(F.col("__era") == 0).selectExpr(
        f"`{group_col}`",
        "__n AS n_base",
        *[f"__c{i} AS __a{i}" for i in range(dim)],
    )
    cur = cent.filter(F.col("__era") == 1).selectExpr(
        f"`{group_col}`",
        "__n AS n_cur",
        *[f"__c{i} AS __b{i}" for i in range(dim)],
    )
    j = base.join(cur, group_col)
    dot = F.expr(
        " + ".join(["0.0D"] + [f"__a{i} * __b{i}" for i in range(dim)])
    )
    na = F.sqrt(F.expr(
        " + ".join(["0.0D"] + [f"__a{i} * __a{i}" for i in range(dim)])
    ))
    nb = F.sqrt(F.expr(
        " + ".join(["0.0D"] + [f"__b{i} * __b{i}" for i in range(dim)])
    ))
    return j.select(
        group_col,
        "n_base",
        "n_cur",
        F.round(
            F.try_divide(dot, na * nb) + F.lit(1e-9), round_digits
        ).alias("centroid_cosine"),
        F.round(
            F.try_divide(nb, na) + F.lit(1e-9), round_digits
        ).alias("norm_ratio"),
    ).orderBy(group_col)


def centroid_outliers(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    min_cosine: float = 0.2,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding quality gate: flag vectors whose cosine to their own
    group's centroid falls below ``min_cosine`` — mislabeled rows,
    encoder glitches, or genuine off-distribution points (the
    embedding sibling of the IQR fence: v15 fences scalars, this
    fences directions).  The flag compares the ROUNDED cosine so the
    verdict is reproducible across engines at the 6-decimal contract.

    Engine shape: ONE fact aggregate to per-group centroids (dim
    map-side-partial avgs, the emb_kmeans shape), centroids joined
    back (AQE broadcasts the group-cardinality frame), per-row cosine
    as a JVM fold — output fact-grain, rows with a NULL group or a
    zero vector/centroid get NULL cosine via ``try_divide`` and are
    NOT flagged (no direction statement to make).
    """
    # dim-sized chains as SQL text (the embedding_centroid_drift note)
    cent = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            *[
                F.expr(
                    f"avg(CAST(`{vec_col}`[{i}] AS DOUBLE))"
                ).alias(f"__c{i}")
                for i in range(dim)
            ]
        )
    )
    joined = df.join(cent, group_col, "left")
    ve = f"CAST(`{vec_col}`[{{i}}] AS DOUBLE)"
    dot = F.expr(
        " + ".join(
            ["0.0D"]
            + [f"{ve.format(i=i)} * __c{i}" for i in range(dim)]
        )
    )
    vn = F.sqrt(F.expr(
        " + ".join(
            ["0.0D"]
            + [f"{ve.format(i=i)} * {ve.format(i=i)}" for i in range(dim)]
        )
    ))
    cn = F.sqrt(F.expr(
        " + ".join(["0.0D"] + [f"__c{i} * __c{i}" for i in range(dim)])
    ))
    cos = F.round(
        F.try_divide(dot, vn * cn) + F.lit(1e-9), round_digits
    )
    return joined.select(
        id_col,
        group_col,
        cos.alias("centroid_cosine"),
        F.when(cos.isNotNull(), cos < F.lit(float(min_cosine))).alias(
            "is_outlier"
        ),
    )
