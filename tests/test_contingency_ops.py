"""Contingency-family operators: per-group mutual information and
Cohen's kappa (operators/analytics.py).
"""

import math

import pytest
from pyspark.sql import functions as F


class TestMutualInfo:
    def test_perfect_dependence_and_independence(self, spark):
        from recover_spark.operators.analytics import mutual_info_by_group

        rows = (
            # dep: b == a, uniform over two levels -> MI = 1 bit, nmi 1
            [("dep", "x", "x")] * 4 + [("dep", "y", "y")] * 4
            # ind: all four combos equally likely -> MI = 0
            + [("ind", aa, bb) for aa in "xy" for bb in "uv"] * 2
        )
        df = spark.createDataFrame(rows, "g string, a string, b string")
        got = {
            r["g"]: r
            for r in mutual_info_by_group(df, ["g"], "a", "b").collect()
        }
        assert got["dep"]["mi_bits"] == 1.0
        assert got["dep"]["nmi"] == 1.0
        assert got["ind"]["mi_bits"] == 0.0
        assert got["ind"]["nmi"] == 0.0
        assert got["dep"]["n"] == 8

    def test_matches_hand_formula_asymmetric(self, spark):
        from recover_spark.operators.analytics import mutual_info_by_group

        # 2x2 with counts 4,2,2,4: classic dependent-but-noisy table
        counts = {("x", "u"): 4, ("x", "v"): 2, ("y", "u"): 2, ("y", "v"): 4}
        rows = [
            ("g", a, b) for (a, b), c in counts.items() for _ in range(c)
        ]
        df = spark.createDataFrame(rows, "g string, a string, b string")
        row = mutual_info_by_group(df, ["g"], "a", "b").collect()[0]
        n = 12
        mi = sum(
            (c / n) * math.log2((c / n) / ((6 / n) * (6 / n)))
            for c in counts.values()
        )
        assert row["mi_bits"] == pytest.approx(mi, abs=5.1e-6)
        # H_a = H_b = 1 bit -> nmi == mi
        assert row["nmi"] == pytest.approx(mi, abs=5.1e-6)

    def test_null_is_a_level_and_constant_group_null_nmi(self, spark):
        from recover_spark.operators.analytics import mutual_info_by_group

        df = spark.createDataFrame(
            [("g", None, "u"), ("g", None, "v"), ("g", "x", "u"),
             ("c", "x", "u"), ("c", "x", "v")],
            "g string, a string, b string",
        )
        got = {
            r["g"]: r
            for r in mutual_info_by_group(df, ["g"], "a", "b").collect()
        }
        assert got["g"]["n"] == 3  # NULL rows count as a level
        # 'c' has constant a -> H_a = 0 -> nmi NULL, mi 0
        assert got["c"]["mi_bits"] == 0.0
        assert got["c"]["nmi"] is None

    def test_cell_grain_plan(self, spark):
        from recover_spark.operators.analytics import mutual_info_by_group

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 7 AS STRING) a",
            "CAST(id % 11 AS STRING) b",
        )
        plan = (
            mutual_info_by_group(df, ["g"], "a", "b")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestCohensKappa:
    def test_textbook_two_by_two(self, spark):
        from recover_spark.operators.analytics import cohens_kappa

        cells = {
            ("yes", "yes"): 20, ("yes", "no"): 5,
            ("no", "yes"): 10, ("no", "no"): 15,
        }
        rows = [
            ("g", a, b) for (a, b), c in cells.items() for _ in range(c)
        ]
        df = spark.createDataFrame(rows, "g string, a string, b string")
        row = cohens_kappa(df, ["g"], "a", "b").collect()[0]
        assert row["n"] == 50
        assert row["p_observed"] == 0.7
        assert row["p_expected"] == 0.5
        assert row["kappa"] == pytest.approx(0.4, abs=5.1e-6)

    def test_perfect_and_chance(self, spark):
        from recover_spark.operators.analytics import cohens_kappa

        rows = (
            [("perfect", "x", "x")] * 3 + [("perfect", "y", "y")] * 3
            + [("degen", "x", "x")] * 4  # both constant: pe=1 -> NULL
        )
        df = spark.createDataFrame(rows, "g string, a string, b string")
        got = {r["g"]: r for r in cohens_kappa(df, ["g"], "a", "b").collect()}
        assert got["perfect"]["kappa"] == 1.0
        assert got["degen"]["kappa"] is None

    def test_null_rows_excluded(self, spark):
        from recover_spark.operators.analytics import cohens_kappa

        df = spark.createDataFrame(
            [("g", "x", "x"), ("g", "x", None), ("g", None, "x"),
             ("g", "y", "y")],
            "g string, a string, b string",
        )
        row = cohens_kappa(df, ["g"], "a", "b").collect()[0]
        assert row["n"] == 2 and row["kappa"] == 1.0

    def test_disjoint_label_sets_negativeish(self, spark):
        from recover_spark.operators.analytics import cohens_kappa

        # raters never use the same label: po=0, pe=0 -> kappa 0
        df = spark.createDataFrame(
            [("g", "x", "u"), ("g", "y", "v")],
            "g string, a string, b string",
        )
        row = cohens_kappa(df, ["g"], "a", "b").collect()[0]
        assert row["p_expected"] == 0.0 and row["kappa"] == 0.0

    def test_vocab_sized_plan(self, spark):
        from recover_spark.operators.analytics import cohens_kappa

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 5 AS STRING) a",
            "CAST(id % 4 AS STRING) b",
        )
        plan = (
            cohens_kappa(df, ["g"], "a", "b")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
