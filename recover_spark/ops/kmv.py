"""K-minimum-values (KMV / bottom-k) distinct sketch with SET
OPERATIONS — mergeable cardinality for union / intersection / Jaccard
(Bar-Yossef et al. RANDOM 2002; Beyer et al. SIGMOD 2007, the
"distinct sampling for set-expression estimation" construction).

Where HLL (``approx_distinct_rollup``, ``merge_distinct_sketches``)
answers "how many distinct" per key, KMV additionally answers SET
EXPRESSIONS over keys — "how many users are in BOTH audiences", "how
similar are two groups' member sets" — which HLL registers cannot do
directly (HLL intersections via inclusion-exclusion blow up the
relative error for small overlaps; the KMV union sketch carries an
unbiased Jaccard estimator by construction).

The sketch for a group is the k smallest DISTINCT 60-bit portable
hashes (``functions/hashing.py:portable_hash64``) of its values.
Everything downstream is deterministic — the hash family is fixed
md5-derived, so a SQL oracle reproduces sketch membership, estimates,
and set operations BIT-FOR-BIT (the ``weighted_sample_k`` /
``cm_build`` exact-oracle precedent; no tolerance flag needed for the
estimates themselves, only for the estimate-vs-exact validation
columns).

Estimator (k-th smallest normalized hash u_k = (h_k + 0.5) / 16^15):

    distinct(A)   ~  (k - 1) / u_k        (|sketch| if fewer than k)
    union         :  k smallest of (kmv_a UNION kmv_b) — a KMV sketch
                     of A UNION B by construction
    jaccard       ~  |union_k ∩ A ∩ B| / |union_k|
    intersection  ~  jaccard * distinct(A UNION B)

Relative standard error is 1/sqrt(k - 2) for the cardinalities and
sqrt(rho (1 - rho) / k) on the Jaccard ratio rho.

Scale shape (100 TB): the sketch build is distinct-on-the-hash-domain
then a TWO-LEVEL bottom-k — per (group, h % fanout) bucket first
(bounded sort runs), then per group over the <= fanout * k survivors
— so no single reducer ever sorts a hot group's full distinct set.
Set operations run on the sketch table (O(groups) rows of k bigints),
never on the fact.  The pairwise driver below broadcasts the sketch
table and is guarded by ``max_groups`` — the loud-cap convention of
``ops/similarity.py``'s GEMM path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.hashing import portable_hash64

# 16^15 — the portable_hash64 value range; exactly representable in a
# double, as is (k - 1) * _HASH_SCALE for any practical k.
_HASH_SCALE = float(16**15)


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    salt: str = "kmv",
    fanout: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct salted 60-bit
    hashes of ``value_col``, as a sorted ``array<bigint>``.

    Distinctness is on the HASH domain (a 60-bit collision folds two
    values — probability ~n^2 / 2^61, negligible at any per-group
    cardinality the sketch is built for), which is what makes the
    SQL-oracle mirror exact.

    Two-level bottom-k: the k smallest per (group, h % fanout) bucket
    first, then the k smallest per group over the <= fanout * k
    survivors — both levels are rank-filters over bounded sort runs,
    never a full per-group sort on one reducer.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for the KMV estimator")
    keys = list(group_cols)
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            portable_hash64(F.col(value_col), salt=salt).alias("__kmv_h"),
        )
        .distinct()
    )
    w_bucket = Window.partitionBy(
        *keys, (F.col("__kmv_h") % F.lit(int(fanout)))
    ).orderBy("__kmv_h")
    survivors = (
        hashed.withColumn("__rn", F.row_number().over(w_bucket))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w_group = Window.partitionBy(*keys).orderBy("__kmv_h")
    return (
        survivors.withColumn("__rn", F.row_number().over(w_group))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__kmv_h")).alias("kmv"))
    )


def kmv_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch array: exact |sketch| when
    the group had fewer than k distinct hashes, else (k-1)/u_k.
    Deterministic — rounded to 6 so the oracle's IEEE doubles match."""
    numerator = F.lit(float((k - 1)) * _HASH_SCALE)
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.round(
            numerator / (F.element_at(kmv, k).cast("double") + F.lit(0.5)), 6
        )
    )


def kmv_union(a: Column, b: Column, k: int) -> Column:
    """KMV sketch of A UNION B: the k smallest of the merged member
    sets (array_union dedups shared hashes)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_pairwise_overlap(
    sketches: DataFrame,
    key_col: str,
    k: int = 256,
    max_groups: int = 1024,
) -> DataFrame:
    """All-pairs set-operation estimates over a KMV sketch table:
    for every key pair (key_a < key_b) the union / intersection /
    Jaccard estimates from the merged sketches.

    The sketch table has one row per group; pairing is a broadcast
    nested-loop over that BOUNDED table (never the fact), guarded
    loudly by ``max_groups`` — above it the caller should bucket keys
    or join on an explicit pair list instead.

    The sketch build is pinned before the guard count so the guard,
    the left side, and the broadcast side all read ONE materialization
    instead of re-executing the distinct+windows three times.
    """
    sketches = sketches.localCheckpoint(eager=False)
    n_groups = sketches.count()
    if n_groups > max_groups:
        raise ValueError(
            f"kmv_pairwise_overlap: {n_groups} groups exceeds "
            f"max_groups={max_groups}; all-pairs over the sketch table "
            "would be quadratic in groups — bucket the keys or supply "
            "an explicit pair list"
        )
    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col("kmv").alias("kmv_a")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col("kmv").alias("kmv_b")
    )
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
    union_k = kmv_union(F.col("kmv_a"), F.col("kmv_b"), k)
    common = F.size(
        F.filter(
            F.col("__union_k"),
            lambda x: F.array_contains(F.col("kmv_a"), x)
            & F.array_contains(F.col("kmv_b"), x),
        )
    )
    est_union = kmv_estimate(F.col("__union_k"), k)
    return (
        pairs.withColumn("__union_k", union_k)
        .withColumn("est_a", kmv_estimate(F.col("kmv_a"), k))
        .withColumn("est_b", kmv_estimate(F.col("kmv_b"), k))
        .withColumn("est_union", est_union)
        .withColumn("__common", common)
        .withColumn(
            "jaccard_est",
            F.round(
                F.col("__common").cast("double") / F.size(F.col("__union_k")),
                6,
            ),
        )
        .withColumn(
            "est_intersect",
            F.round(
                (
                    F.col("__common").cast("double")
                    / F.size(F.col("__union_k"))
                )
                * F.col("est_union"),
                6,
            ),
        )
        .select(
            "key_a",
            "key_b",
            "est_a",
            "est_b",
            "est_union",
            "est_intersect",
            "jaccard_est",
        )
    )
