"""Binary-segmentation changepoint (operators/temporal.py:
changepoint_binary): hand-computed golden, tie/short-series contracts,
single-exchange plan pin."""

from __future__ import annotations

import pyspark.sql.functions as F

from recover_spark.operators.temporal import changepoint_binary


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, v double")


def test_level_shift_golden(spark):
    # 10 zeros then 10 tens: split after t=10, gain = 1000 - 500 = 500
    rows = [("a", t, 0.0) for t in range(1, 11)] + [
        ("a", t, 10.0) for t in range(11, 21)
    ]
    out = changepoint_binary(
        _series(spark, rows), ["k"], ["t"], "v", min_segment=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["split_t"] == 10
    assert (r["n_left"], r["n_right"]) == (10, 10)
    assert abs(r["gain"] - 500.0) < 1e-6
    assert abs(r["mean_left"]) < 1e-6
    assert abs(r["mean_right"] - 10.0) < 1e-6


def test_constant_series_ties_to_earliest_split(spark):
    rows = [("a", t, 5.0) for t in range(1, 13)]
    out = changepoint_binary(
        _series(spark, rows), ["k"], ["t"], "v", min_segment=4
    ).collect()
    (r,) = out
    # every split has gain 0 -> the earliest valid split wins
    assert r["split_t"] == 4 and abs(r["gain"]) < 1e-6


def test_short_series_emits_no_row(spark):
    rows = [("short", t, float(t)) for t in range(1, 8)] + [
        ("long", t, float(t % 2)) for t in range(1, 21)
    ]
    out = changepoint_binary(
        _series(spark, rows), ["k"], ["t"], "v", min_segment=5
    ).collect()
    assert {r["k"] for r in out} == {"long"}


def test_single_exchange_plan(spark):
    df = spark.range(4000).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") / 4).cast("int").alias("t"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    out = changepoint_binary(df, ["k"], ["t"], "v", min_segment=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # prefix sums, totals, and the per-key top-1 all share one
    # hashpartitioning exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1
    assert out.count() == 4


def test_argmax_is_true_sse_argmax(spark):
    # brute-force cross-check on an irregular series
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 1) + (3.0 if i >= 17 else 0.0)
            for i in range(30)]
    rows = [("a", t + 1, v) for t, v in enumerate(vals)]

    def sse(xs):
        n = len(xs)
        s = sum(xs)
        return sum(x * x for x in xs) - s * s / n

    best = max(
        range(5, 26),  # k = n_left, min_segment=5
        key=lambda k: round(sse(vals) - sse(vals[:k]) - sse(vals[k:]), 6),
    )
    (r,) = changepoint_binary(
        _series(spark, rows), ["k"], ["t"], "v", min_segment=5
    ).collect()
    assert r["n_left"] == best and r["split_t"] == best
