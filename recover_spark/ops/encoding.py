"""Leakage-safe categorical target encoding — the ML-prep transform
that replaces a high-cardinality category with the target mean its
OTHER folds observed (out-of-fold mean encoding with m-estimate
smoothing; Micci-Barreca SIGKDD Expl. 2001, the CatBoost/Kaggle
standard).  Naive mean encoding leaks the row's own label into its
feature; K-fold leave-out breaks the loop: a row in fold f is encoded
from statistics computed WITHOUT fold f.

    enc(c, f) = (sum_{not f}(y | c) + m * gmean_{not f})
                / (n_{not f}(c) + m)

where gmean_{not f} is the global target mean also computed without
fold f (the smoothing prior must not leak either), and m is the
smoothing pseudo-count pulling rare categories toward the prior.

Scale shape (100 TB): ONE fact pass builds the (category, fold) sum/
count cells (map-side combinable); every leave-out statistic is a
window over that bounded cell frame — category totals partitioned by
category, fold totals partitioned by fold, the grand total a one-row
frame — so no second fact scan and no per-row shuffles.  Folds come
from the engine-portable md5 hash of a stable key (``stable_split``'s
contract): replay-stable, order-free, and reproducible by a SQL
oracle bit-for-bit.  The encoded cell table is (categories x folds)
rows; joining it back to the fact is one broadcast-or-AQE equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.hashing import portable_hash32


def target_encode_cells(
    df: DataFrame,
    category_col: str,
    target_col: str,
    key_col: str,
    n_folds: int = 5,
    smoothing: float = 10.0,
    salt: str = "tenc",
    round_digits: int = 6,
) -> DataFrame:
    """Out-of-fold encoding table: (category, fold, n_rows, encoded).

    ``encoded`` for (c, f) uses only rows OUTSIDE fold f; a category
    seen only inside fold f falls back entirely to the leave-out
    global mean (n_out = 0 — the smoothing term is the whole
    estimate, exactly the cold-start behavior smoothing exists for).
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2 for leave-out encoding")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (it is the only term "
                         "for categories unseen outside a fold)")
    fold = (portable_hash32(F.col(key_col), salt=salt) % n_folds).cast("int")
    cells = (
        df.filter(F.col(target_col).isNotNull())
        .groupBy(F.col(category_col).alias("category"), fold.alias("fold"))
        .agg(
            F.sum(F.col(target_col).cast("double")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w_cat = Window.partitionBy("category")
    w_fold = Window.partitionBy("fold")
    w_all = Window.partitionBy()
    out_s = F.sum("s").over(w_cat) - F.col("s")
    out_n = F.sum("n").over(w_cat) - F.col("n")
    gmean_out = (F.sum("s").over(w_all) - F.sum("s").over(w_fold)) / (
        F.sum("n").over(w_all) - F.sum("n").over(w_fold)
    )
    return cells.select(
        "category",
        "fold",
        F.col("n").alias("n_rows"),
        F.round(
            (out_s + F.lit(float(smoothing)) * gmean_out)
            / (out_n + F.lit(float(smoothing))),
            round_digits,
        ).alias("encoded"),
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    key_col: str,
    n_folds: int = 5,
    smoothing: float = 10.0,
    salt: str = "tenc",
    round_digits: int = 6,
) -> DataFrame:
    """Fact-grain application: the input with an ``encoded`` column
    from the out-of-fold cell table (one equi-join on (category,
    fold); AQE broadcasts the bounded cell side)."""
    cells = target_encode_cells(
        df, category_col, target_col, key_col,
        n_folds, smoothing, salt, round_digits,
    ).select(
        F.col("category").alias(category_col),
        "fold",
        "encoded",
    )
    fold = (portable_hash32(F.col(key_col), salt=salt) % n_folds).cast("int")
    return df.withColumn("fold", fold).join(
        cells, [category_col, "fold"], "left"
    )
