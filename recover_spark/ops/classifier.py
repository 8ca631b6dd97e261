"""Distributed logistic-regression training via aggregate gradient steps.

The quality-scoring path (ops/text_analysis.py:quality_scores) applies a
linear model as pure column math with documented stand-in weights; this
module TRAINS those weights on the cluster, completing the story: label
a slice (heuristics, human audits, an LLM judge), fit here, ship the
coefficients back into the map-only scorer.

Why not spark.ml: the point of this engine is that standard iterative
ML fits the same mergeable-aggregate mold as everything else —
per-iteration work is ONE aggregate job whose partials combine
map-side (exactly the Lloyd-step shape in ops/clustering.py):

    grad_j = sum_rows (sigmoid(w·x) - y) * x_j      (+ l2 * w_j)

with the current weights entering as LITERALS (broadcast-free: they are
part of the compiled plan), so each of the K iterations scans once,
shuffles a single gradient row, and the driver does an O(features)
update.  No UDFs, no vector types — plain numeric columns.

Features are standardized first (one extra aggregate for mean/std) so a
fixed learning rate behaves across wildly different feature scales; the
returned model carries the standardization constants and ``predict``
re-applies them, so callers score RAW features.

Determinism note: float sums depend on partition combine order, so
weights are reproducible only to last-ulp noise — tests assert
tolerances and separation, not bitwise equality (same contract as
emb_kmeans).
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LogisticModel:
    feature_cols: tuple[str, ...]
    means: tuple[float, ...]
    stds: tuple[float, ...]
    weights: tuple[float, ...]  # standardized-space coefficients
    bias: float
    losses: tuple[float, ...]  # per-iteration mean log-loss


def _margin(model_or_parts, feature_cols, means, stds, weights, bias) -> Column:
    z: Column = F.lit(float(bias))
    for c, m, s, w in zip(feature_cols, means, stds, weights):
        z = z + F.lit(float(w)) * ((F.col(c) - F.lit(float(m))) / F.lit(float(s)))
    return z


def train_logistic(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    iterations: int = 30,
    learning_rate: float = 0.5,
    l2: float = 0.0,
) -> LogisticModel:
    """Fit a logistic model with full-batch gradient descent; each
    iteration is one mergeable aggregate over the data (map-side
    partial sums), so K iterations cost K scans and K one-row shuffles
    regardless of cluster size.  ``label_col`` must be 0/1."""
    cols = [str(c) for c in feature_cols]
    if not cols:
        raise ValueError("feature_cols must be non-empty")

    stats_row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.avg(c).alias(f"__m_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"__s_{c}") for c in cols],
    ).collect()[0]
    n = stats_row["__n"]
    if not n:
        raise ValueError("train_logistic: empty input")
    means = [float(stats_row[f"__m_{c}"] or 0.0) for c in cols]
    stds = [
        float(stats_row[f"__s_{c}"]) if (stats_row[f"__s_{c}"] or 0) > 1e-12 else 1.0
        for c in cols
    ]

    w = [0.0] * len(cols)
    b = 0.0
    y = F.col(label_col).cast("double")
    losses = []
    for _ in range(iterations):
        z = _margin(None, cols, means, stds, w, b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        eps = F.lit(1e-12)
        agg_row = df.agg(
            *[
                F.sum(
                    err * ((F.col(c) - F.lit(means[i])) / F.lit(stds[i]))
                ).alias(f"__g_{i}")
                for i, c in enumerate(cols)
            ],
            F.sum(err).alias("__gb"),
            F.avg(
                -(y * F.log(p + eps) + (1 - y) * F.log(1 - p + eps))
            ).alias("__loss"),
        ).collect()[0]
        losses.append(round(float(agg_row["__loss"]), 8))
        for i in range(len(cols)):
            g = float(agg_row[f"__g_{i}"]) / n + l2 * w[i]
            w[i] -= learning_rate * g
        b -= learning_rate * float(agg_row["__gb"]) / n
    return LogisticModel(
        feature_cols=tuple(cols),
        means=tuple(means),
        stds=tuple(stds),
        weights=tuple(w),
        bias=b,
        losses=tuple(losses),
    )


def predict_logistic(
    df: DataFrame, model: LogisticModel, out_col: str = "p_quality"
) -> DataFrame:
    """Map-only scoring with a trained model (raw features in, the
    standardization constants travel inside the compiled expressions)."""
    z = _margin(
        None, model.feature_cols, model.means, model.stds, model.weights, model.bias
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.round(p, 6))


def model_as_dataframe(df_factory, model: LogisticModel) -> DataFrame:
    """The trained model as a small DataFrame (one row per coefficient,
    in RAW-feature space: w_raw = w_std / std, bias adjusted), so the
    artifact is persistable/joinable like any other table."""
    rows = [
        (
            model.feature_cols[i],
            round(model.weights[i] / model.stds[i], 8),
            round(model.means[i], 8),
        )
        for i in range(len(model.feature_cols))
    ]
    raw_bias = model.bias - sum(
        model.weights[i] * model.means[i] / model.stds[i]
        for i in range(len(model.feature_cols))
    )
    rows.append(("__bias__", round(raw_bias, 8), 0.0))
    return df_factory(rows, "feature string, coefficient double, mean double")
