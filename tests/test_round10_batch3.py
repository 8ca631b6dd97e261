"""Round-10 third batch: moments_by_group (operators/analytics.py),
vocabulary_overlap (ops/text_analysis.py), chi-squared drift
(quality/drift.py + the fifth streaming read lens).
"""

import math

import pytest
from pyspark.sql import functions as F


class TestMomentsByGroup:
    def test_matches_hand_moments(self, spark):
        from recover_spark.operators.analytics import moments_by_group

        vals = [1.0, 2.0, 2.0, 3.0, 10.0]  # right-skewed
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        row = moments_by_group(df, ["g"], "v").collect()[0]
        n = len(vals)
        mu = sum(vals) / n
        m2 = sum((v - mu) ** 2 for v in vals) / n
        m3 = sum((v - mu) ** 3 for v in vals) / n
        m4 = sum((v - mu) ** 4 for v in vals) / n
        assert row["mean"] == pytest.approx(mu, abs=5.1e-6)
        assert row["stddev"] == pytest.approx(
            math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1)),
            abs=5.1e-6,
        )
        assert row["skewness"] == pytest.approx(m3 / m2**1.5, abs=5.1e-6)
        assert row["excess_kurtosis"] == pytest.approx(
            m4 / m2**2 - 3, abs=5.1e-6
        )

    def test_large_offset_numerically_stable(self, spark):
        from recover_spark.operators.analytics import moments_by_group

        # mu >> sigma: the raw-power-sum shortcut cancels here; the
        # two-pass form must still see the symmetric shape (skew ~ 0)
        df = spark.range(1001).selectExpr(
            "'g' AS g", "1.0e9 + (id - 500) / 500 AS v"
        )
        row = moments_by_group(df, ["g"], "v").collect()[0]
        assert abs(row["skewness"]) < 1e-3
        assert row["mean"] == pytest.approx(1.0e9, abs=1e-3)

    def test_degenerates(self, spark):
        from recover_spark.operators.analytics import moments_by_group

        df = spark.createDataFrame(
            [("const", 5.0), ("const", 5.0), ("single", 1.0),
             ("g", None), ("g", 1.0), ("g", 2.0)],
            "g string, v double",
        )
        got = {r["g"]: r for r in moments_by_group(df, ["g"], "v").collect()}
        assert got["const"]["skewness"] is None  # zero variance
        assert got["single"]["stddev"] is None  # n < 2
        assert got["g"]["n"] == 2  # NULL excluded


class TestVocabularyOverlap:
    def test_hand_jaccard_and_containment(self, spark):
        from recover_spark.ops.text_analysis import vocabulary_overlap

        df = spark.createDataFrame(
            [("a", "x y z"), ("b", "y z w v"), ("c", "q")],
            "src string, text string",
        )
        rows = vocabulary_overlap(df, "src", "text").collect()
        assert len(rows) == 1  # c shares nothing -> absent
        r = rows[0]
        assert (r["group_a"], r["group_b"]) == ("a", "b")
        assert r["n_a"] == 3 and r["n_b"] == 4 and r["n_common"] == 2
        assert r["jaccard"] == pytest.approx(2 / 5, abs=5.1e-6)
        assert r["containment"] == pytest.approx(2 / 3, abs=5.1e-6)

    def test_mirror_detected(self, spark):
        from recover_spark.ops.text_analysis import vocabulary_overlap

        df = spark.createDataFrame(
            [("big", "a b c d e f g h"), ("mirror", "c d e")],
            "src string, text string",
        )
        r = vocabulary_overlap(df, "src", "text").collect()[0]
        assert r["containment"] == 1.0  # mirror swallowed whole
        assert r["jaccard"] == pytest.approx(3 / 8, abs=5.1e-6)

    def test_no_cartesian(self, spark):
        from recover_spark.ops.text_analysis import vocabulary_overlap

        df = spark.createDataFrame(
            [("s%d" % (i % 4), "tok%d common" % i) for i in range(40)],
            "src string, text string",
        )
        plan = (
            vocabulary_overlap(df, "src", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestChi2Drift:
    def test_matches_hand_chi2(self, spark):
        from recover_spark.quality.drift import chi2_from_binned_counts

        # base: [30, 10], cur: [10, 30] over 2 bins
        base = spark.createDataFrame(
            [("c", 0, 30), ("c", 1, 10)], "column string, bin int, n_base long"
        )
        cur = spark.createDataFrame(
            [("c", 0, 10), ("c", 1, 30)], "column string, bin int, n_cur long"
        )
        row = chi2_from_binned_counts(base, cur, ["c"], 2).collect()[0]
        # classic 2x2: chi2 = N*(ad-bc)^2/(r1*r2*c1*c2) = 80*(900-100)^2
        #              /(40*40*40*40) = 20; phi2 = 20/80 = 0.25
        assert row["dof"] == 1
        assert row["phi2"] == pytest.approx(0.25, abs=5.1e-6)
        assert row["cramers_v"] == pytest.approx(0.5, abs=5.1e-6)
        assert row["n_base_total"] == 40 and row["n_cur_total"] == 40

    def test_identical_distributions_zero(self, spark):
        from recover_spark.quality.drift import chi2_drift

        df = spark.range(2000).selectExpr("CAST(id % 97 AS DOUBLE) v")
        row = chi2_drift(df, df, ["v"], n_bins=10).collect()[0]
        assert row["phi2"] == 0.0 and row["cramers_v"] == 0.0

    def test_empty_side_null(self, spark):
        from recover_spark.quality.drift import chi2_drift

        base = spark.range(100).selectExpr("CAST(id AS DOUBLE) v")
        cur = base.filter(F.lit(False))
        row = chi2_drift(base, cur, ["v"], n_bins=5).collect()[0]
        assert row["phi2"] is None and row["dof"] is None

    def test_stream_lens_equals_batch(self, spark, tmp_path):
        from recover_spark.quality.drift import chi2_drift
        from recover_spark.streaming.drift import (
            freeze_drift_baseline,
            maintain_drift_matview,
            read_drift_chi2,
        )

        base = spark.range(900).selectExpr(
            "CAST(id % 83 AS DOUBLE) a", "CAST(id % 29 AS DOUBLE) b"
        )
        cur = spark.range(700).selectExpr(
            "CAST((id * 7) % 83 AS DOUBLE) a",
            "CAST((id * 3) % 41 AS DOUBLE) b",
        )
        state = str(tmp_path / "state")
        freeze_drift_baseline(
            base, state, ["a", "b"], n_bins=8, edge_accuracy=None
        )
        src = str(tmp_path / "src")
        cur.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema("a double, b double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_drift_matview(stream, state, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        got = {
            r["column"]: r for r in read_drift_chi2(spark, state).collect()
        }
        want = {
            r["column"]: r
            for r in chi2_drift(
                base, cur, ["a", "b"], n_bins=8, edge_accuracy=None
            ).collect()
        }
        for c in ("a", "b"):
            assert got[c]["dof"] == want[c]["dof"]
            assert got[c]["phi2"] == want[c]["phi2"]
            assert got[c]["cramers_v"] == want[c]["cramers_v"]
            assert got[c]["n_cur_total"] == want[c]["n_cur_total"]
