"""Regression pins for the round-9 verdict/advice fixes.

- agg_gini exposed a raw ~1e8-magnitude SUM rounded at 6 decimals —
  not cross-engine stable (one decimal-ULP flipped the driver hash
  two rounds running).  gini_by_group now exposes mean = total/n.
- weighted_quantiles_by_group exposes w_mean (same sum-magnitude
  rule) and refuses colliding percent tags.
- prop_ztest raises on non-Bernoulli success values instead of
  silently truncating them through the long cast.
"""

import pytest


class TestGiniMeanContract:
    def test_mean_not_total(self, spark):
        from recover_spark.operators.analytics import gini_by_group

        df = spark.createDataFrame(
            [("g", 2.0), ("g", 4.0), ("g", 6.0)], "g string, v double"
        )
        row = gini_by_group(df, ["g"], "v").collect()[0]
        assert "total" not in row.asDict()
        assert row["mean"] == 4.0
        assert row["n"] == 3

    def test_mean_magnitude_is_member_scale(self, spark):
        # the point of the contract: many big rows, mean stays at
        # single-member magnitude where 6-decimal rounding is stable
        from recover_spark.operators.analytics import gini_by_group

        df = spark.range(3000).selectExpr(
            "'g' AS g", "250000.0 + id % 7 AS v"
        )
        row = gini_by_group(df, ["g"], "v").collect()[0]
        assert 250000.0 <= row["mean"] <= 250007.0


class TestWeightedQuantileWMean:
    def test_w_mean_exposed(self, spark):
        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        df = spark.createDataFrame(
            [("g", 1.0, 2.0), ("g", 5.0, 4.0)],
            "g string, v double, w double",
        )
        row = weighted_quantiles_by_group(
            df, ["g"], "v", "w", qs=(0.5,)
        ).collect()[0]
        assert "w_total" not in row.asDict()
        assert row["w_mean"] == 3.0


class TestPropZtestBernoulliGuard:
    def test_non_bernoulli_raises(self, spark):
        from pyspark.errors import SparkRuntimeException

        from recover_spark.operators.analytics import prop_ztest

        df = spark.createDataFrame(
            [("g", 0, 2.0), ("g", 1, 1.0)],
            "g string, variant int, success double",
        )
        with pytest.raises(SparkRuntimeException, match="boolean/0-1"):
            prop_ztest(df, ["g"], "variant", "success", 0, 1).collect()

    def test_bernoulli_still_works(self, spark):
        from recover_spark.operators.analytics import prop_ztest

        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 0, 0.0), ("g", 1, 1.0), ("g", 1, 1.0)],
            "g string, variant int, success double",
        )
        row = prop_ztest(df, ["g"], "variant", "success", 0, 1).collect()[0]
        assert row["n_a"] == 2 and row["x_a"] == 1
        assert row["n_b"] == 2 and row["x_b"] == 2
