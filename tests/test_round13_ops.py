"""Round-13 operator tests: always-valid (mixture SPRT) p-value."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _ab(spark, shift=0.0, n=3000):
    return spark.range(n).select(
        F.lit("g").alias("g"),
        (F.col("id") % 2).alias("variant"),
        (
            (F.col("id") * 37 % 100).cast("double")
            + F.when(F.col("id") % 2 == 1, F.lit(shift)).otherwise(F.lit(0.0))
        ).alias("v"),
    )


class TestAlwaysValidPvalue:
    def test_matches_independent_formula(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        df = _ab(spark, shift=2.0)
        row = always_valid_pvalue(
            df, ["g"], "variant", "v", 0, 1, tau2=4.0
        ).collect()[0]
        pdf = df.toPandas()
        a = pdf[pdf.variant == 0].v
        b = pdf[pdf.variant == 1].v
        s2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        d = b.mean() - a.mean()
        ll = 0.5 * math.log(s2 / (s2 + 4.0)) + d * d * 4.0 / (
            2.0 * s2 * (s2 + 4.0)
        )
        assert row["log_lambda"] == pytest.approx(ll, abs=2e-6)
        assert row["p_always_valid"] == pytest.approx(
            min(1.0, math.exp(-ll)), abs=2e-6
        )

    def test_null_effect_not_rejected(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        row = always_valid_pvalue(
            _ab(spark, shift=0.0), ["g"], "variant", "v", 0, 1, tau2=4.0
        ).collect()[0]
        # under the null the martingale stays near its prior odds
        assert row["p_always_valid"] > 0.5
        assert row["reject_null"] is False

    def test_monotone_in_effect(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        ps = []
        for shift in (0.0, 2.0, 5.0, 10.0):
            ps.append(
                always_valid_pvalue(
                    _ab(spark, shift=shift), ["g"], "variant", "v",
                    0, 1, tau2=4.0,
                ).collect()[0]["p_always_valid"]
            )
        assert ps == sorted(ps, reverse=True)
        assert ps[-1] < 0.05  # a 10-unit shift on ~29-sd data at n=1500

    def test_degenerate_variant_null(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        df = spark.createDataFrame(
            [("g", 0, 1.0), ("g", 0, 2.0), ("g", 1, 5.0)],
            "g string, variant int, v double",
        )
        row = always_valid_pvalue(
            df, ["g"], "variant", "v", 0, 1, tau2=1.0
        ).collect()[0]
        assert row["p_always_valid"] is None  # var_samp needs n >= 2

    def test_guards(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        with pytest.raises(ValueError, match="tau2"):
            always_valid_pvalue(
                _ab(spark), ["g"], "variant", "v", 0, 1, tau2=0.0
            )
        with pytest.raises(ValueError, match="alpha"):
            always_valid_pvalue(
                _ab(spark), ["g"], "variant", "v", 0, 1, tau2=1.0, alpha=1.5
            )

    def test_one_exchange_plan(self, spark):
        from recover_spark.operators.analytics import always_valid_pvalue

        plan = always_valid_pvalue(
            _ab(spark), ["g"], "variant", "v", 0, 1, tau2=4.0
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1
