"""Banded dynamic-time-warping distance between keyed series — "which
metrics move together even when one lags the other" (Sakoe & Chiba
1978; Berndt & Clifford KDD-94): Euclidean/elementwise comparison is
blind to phase shifts, DTW aligns the two series along a warping path
first, so a sensor that reacts two hours late still reads as similar.

Engine shape (100 TB): the ONLY fact-sized pass is the grid collapse
the caller performs (e.g. per-(key, day) means); this module sees the
already-bounded (key, series) table.  Per pair the banded DP is
O(n * band) — the Sakoe-Chiba constraint |i - j| <= band both bounds
cost and prevents degenerate all-to-one warpings — executed in an
Arrow-batched Pandas UDF (per-cell Python would be 100x slower; the
DP recurrence is inherently sequential so no built-in expresses it —
the SURVEY §2.10 justified-Arrow rule).  Pairing is a guarded
broadcast over the O(keys) series table (the kmv_pairwise_overlap /
GEMM loud-cap convention).

Determinism: the DP is pure float64 arithmetic in a fixed order, so
an independent Python oracle reproduces the distance bit-for-bit
(the trainer py-oracle precedent) — no tolerance flag needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dtw_distance(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Banded DTW with absolute-difference local cost.

    D[i][j] = |a_i - b_j| + min(D[i-1][j], D[i][j-1], D[i-1][j-1]),
    cells with |i - j| > band_eff are +inf, band_eff = max(band,
    |n - m|) so a feasible path always exists.  Float64 in a fixed
    evaluation order — the oracle re-runs this exact function.
    """
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    band_eff = max(int(band), abs(n - m))
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        lo = max(1, i - band_eff)
        hi = min(m, i + band_eff)
        for j in range(lo, hi + 1):
            cost = abs(float(a[i - 1]) - float(b[j - 1]))
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = cost + best
        prev = cur
    return prev[m]


def dtw_pairwise(
    series: DataFrame,
    key_col: str,
    series_col: str = "series",
    band: int = 16,
    max_keys: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """All-pairs banded DTW over a (key, array<double> series) table.

    Returns (key_a, key_b, n_a, n_b, dtw_dist) for key_a < key_b.
    The series table is O(keys) rows by contract — ``max_keys`` guards
    the quadratic pairing loudly (bucket keys or pass an explicit pair
    list above it).  The series build is pinned before the guard count
    so the guard and both join sides read one materialization (the
    kmv_pairwise_overlap convention).
    """
    series = series.localCheckpoint(eager=False)
    n_keys = series.count()
    if n_keys > max_keys:
        raise ValueError(
            f"dtw_pairwise: {n_keys} keys exceeds max_keys={max_keys}; "
            "all-pairs DTW is quadratic in keys — bucket the keys or "
            "join an explicit pair list instead"
        )

    @pandas_udf("double")
    def _dtw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                dtw_distance(np.asarray(x, dtype=np.float64),
                             np.asarray(y, dtype=np.float64), band)
                for x, y in zip(a, b)
            ]
        )

    a = series.select(
        F.col(key_col).alias("key_a"), F.col(series_col).alias("__sa")
    )
    b = series.select(
        F.col(key_col).alias("key_b"), F.col(series_col).alias("__sb")
    )
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.size("__sa").alias("n_a"),
            F.size("__sb").alias("n_b"),
            F.round(_dtw(F.col("__sa"), F.col("__sb")), round_digits).alias(
                "dtw_dist"
            ),
        )
    )


def keyed_series(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Collapse (key, order, value) points into per-key ordered
    ``array<double>`` series — the one bounded collect in the DTW
    pipeline (the caller's grid collapse has already reduced the fact
    to O(keys x grid) rows; order points must be unique per key).
    """
    return (
        df.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"),
                                        F.col(value_col).alias("v")))
            ).alias("__pts")
        )
        .select(
            key_col,
            F.transform(F.col("__pts"), lambda s: s["v"].cast("double")).alias(
                "series"
            ),
        )
    )
