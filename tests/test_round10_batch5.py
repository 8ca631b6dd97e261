"""Round-10 fifth batch: functional_dependencies
(quality/expectations.py) and iqr_outliers (operators/analytics.py).
"""

import pytest
from pyspark.sql import functions as F


class TestFunctionalDependencies:
    def test_holds_and_violations(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        # device -> firmware holds; firmware -> device violated (fw1
        # maps to d1 and d2); user determines neither
        df = spark.createDataFrame(
            [("d1", "fw1", "u1"), ("d1", "fw1", "u2"),
             ("d2", "fw1", "u1"), ("d3", "fw2", "u3")],
            "device string, fw string, user string",
        )
        got = {
            (r["determinant"], r["dependent"]): r
            for r in functional_dependencies(
                df, ["device", "fw", "user"]
            ).collect()
        }
        assert len(got) == 6  # ordered pairs of 3 cols
        assert got[("device", "fw")]["holds"] is True
        assert got[("device", "fw")]["n_violating"] == 0
        assert got[("fw", "device")]["holds"] is False
        assert got[("fw", "device")]["n_violating"] == 1
        assert got[("device", "user")]["holds"] is False

    def test_null_semantics(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        # NULL key rows excluded; NULL dependent counts as a value
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), (None, "y")],
            "k string, v string",
        )
        got = {
            (r["determinant"], r["dependent"]): r
            for r in functional_dependencies(df, ["k", "v"]).collect()
        }
        r = got[("k", "v")]
        assert r["n_keys"] == 1
        assert r["holds"] is False  # a -> {x, NULL} is not a function

    def test_guard(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        df = spark.range(3).selectExpr("id AS a")
        with pytest.raises(ValueError, match=">= 2"):
            functional_dependencies(df, ["a"])


class TestIqrOutliers:
    def test_tukey_fences(self, spark):
        from recover_spark.operators.analytics import iqr_outliers

        # 1..8 plus 100: q25 (type-1, n=9) = 3rd value = 3,
        # q75 = 7th value = 7, IQR 4 -> fences [-3, 13]
        vals = [float(v) for v in range(1, 9)] + [100.0]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        rows = {r["v"]: r for r in iqr_outliers(df, ["g"], "v").collect()}
        assert rows[100.0]["is_outlier"] is True
        assert all(
            rows[float(v)]["is_outlier"] is False for v in range(1, 9)
        )
        assert rows[1.0]["lo_fence"] == -3.0
        assert rows[1.0]["hi_fence"] == 13.0

    def test_nulls_and_rows_preserved(self, spark):
        from recover_spark.operators.analytics import iqr_outliers

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)],
            "g string, v double",
        )
        out = iqr_outliers(df, ["g"], "v")
        assert out.count() == 4
        assert (
            out.filter(F.col("v").isNull())
            .select("is_outlier")
            .collect()[0][0]
            is None
        )
