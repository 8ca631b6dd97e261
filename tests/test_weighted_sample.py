"""Efraimidis–Spirakis weighted sampling without replacement
(ops/sampling.py:weighted_sample_k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recover_spark.ops.sampling import weighted_sample_k


def _items(spark, n=10, heavy=None, heavy_w=9.0):
    rows = [
        (i, "g" if i % 2 == 0 else "h", heavy_w if i == heavy else 1.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, grp string, w double")


def test_exactly_k_per_group_and_deterministic(spark):
    df = _items(spark, n=40)
    a = weighted_sample_k(df, "id", "w", 5, group_col="grp")
    b = weighted_sample_k(df, "id", "w", 5, group_col="grp")
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb  # replay-stable: no RNG state anywhere
    per_group = {g: 0 for g in ("g", "h")}
    for _, g, _w in ra:
        per_group[g] += 1
    assert per_group == {"g": 5, "h": 5}


def test_global_topk_without_group(spark):
    df = _items(spark, n=30)
    out = weighted_sample_k(df, "id", "w", 7)
    assert out.count() == 7
    assert out.columns == ["id", "grp", "w"]


def test_fewer_rows_than_k_returns_all_positive_weight(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, 2.0)], "id long, w double"
    )
    out = weighted_sample_k(df, "id", "w", 10)
    # non-positive weights can never win a weighted draw -> excluded
    assert sorted(r["id"] for r in out.collect()) == [1, 4]


def test_heavy_weight_wins_proportionally(spark):
    """The defining E-S property, checked coarsely: item with half the
    total weight should win k=1 about half the time across independent
    draws (varying the salt = independent hash streams)."""
    df = _items(spark, n=10, heavy=3, heavy_w=9.0)  # 9 of 18 total
    wins = 0
    for s in range(30):
        got = weighted_sample_k(df, "id", "w", 1, salt=f"t{s}").collect()
        wins += got[0]["id"] == 3
    assert 8 <= wins <= 25, f"heavy item won {wins}/30 draws"


def test_invalid_k_rejected(spark):
    df = _items(spark)
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_k(df, "id", "w", 0)
