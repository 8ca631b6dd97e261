"""spearman_by_group (operators/analytics.py): Pearson correlation of
midranks, exact under ties, bucket-decomposed rank computation.
"""

import random

import pytest


def _ref_spearman(pairs):
    """Midrank-based Spearman reference (pure python)."""

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (
                j + 1 < len(order)
                and vals[order[j + 1]] == vals[order[i]]
            ):
                j += 1
            mid = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = mid
            i = j + 1
        return ranks

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    rx, ry = midranks(xs), midranks(ys)
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    return (n * sxy - sx * sy) / den if den else None


class TestSpearman:
    def test_monotone_and_reversed(self, spark):
        from recover_spark.operators.analytics import spearman_by_group

        rows = (
            # monotone nonlinear: rho = 1 even though Pearson < 1
            [("up", float(i), float(i) ** 3) for i in range(1, 8)]
            + [("down", float(i), -float(i)) for i in range(1, 8)]
            + [("const", float(i), 5.0) for i in range(1, 8)]
        )
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {
            r["g"]: r
            for r in spearman_by_group(df, ["g"], "x", "y").collect()
        }
        assert got["up"]["spearman"] == 1.0
        assert got["down"]["spearman"] == -1.0
        assert got["const"]["spearman"] is None  # zero rank variance
        assert got["up"]["n"] == 7

    def test_matches_reference_with_ties_across_buckets(self, spark):
        from recover_spark.operators.analytics import spearman_by_group

        rng = random.Random(53)
        rows = [
            (
                "g%d" % (i % 2),
                round(rng.random(), 1),  # heavy x ties
                round(rng.random() * 3, 1),
            )
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        for buckets in (3, 64):
            got = {
                r["g"]: r["spearman"]
                for r in spearman_by_group(
                    df, ["g"], "x", "y", buckets=buckets
                ).collect()
            }
            for g in ("g0", "g1"):
                want = _ref_spearman(
                    [(x, y) for gg, x, y in rows if gg == g]
                )
                assert got[g] == pytest.approx(want, abs=5.1e-6)

    def test_null_pairs_excluded(self, spark):
        from recover_spark.operators.analytics import spearman_by_group

        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", None, 9.0),
             ("g", 9.0, None)],
            "g string, x double, y double",
        )
        row = spearman_by_group(df, ["g"], "x", "y").collect()[0]
        assert row["n"] == 2 and row["spearman"] == 1.0

    def test_plan_no_cartesian(self, spark):
        from recover_spark.operators.analytics import spearman_by_group

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 97 AS DOUBLE) x",
            "CAST(id % 53 AS DOUBLE) y",
        )
        plan = (
            spearman_by_group(df, ["g"], "x", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "__bucket" in plan
