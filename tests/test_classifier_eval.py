"""Classifier-evaluation operators: ROC-AUC, reliability bins,
calibration summary (ops/classifier_eval.py).

AUC reference values are brute-force pairwise (every positive against
every negative, ties at 0.5) — the definitional form the distributed
rank decomposition must reproduce across bucket counts.
"""

import random

import pytest
from pyspark.sql import functions as F


def _pairwise_auc(rows):
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return wins / (len(pos) * len(neg))


class TestRocAuc:
    def test_perfect_reversed_and_tied(self, spark):
        from recover_spark.ops.classifier_eval import roc_auc_by_group

        rows = (
            [("perfect", 0.9, 1), ("perfect", 0.8, 1),
             ("perfect", 0.2, 0), ("perfect", 0.1, 0)]
            + [("reversed", 0.1, 1), ("reversed", 0.9, 0)]
            + [("coin", 0.5, 1), ("coin", 0.5, 0)]
        )
        df = spark.createDataFrame(rows, "g string, s double, y int")
        got = {
            r["g"]: r
            for r in roc_auc_by_group(df, ["g"], "s", "y").collect()
        }
        assert got["perfect"]["auc"] == 1.0
        assert got["reversed"]["auc"] == 0.0
        assert got["coin"]["auc"] == 0.5
        assert got["perfect"]["n_pos"] == 2
        assert got["perfect"]["n_neg"] == 2

    def test_matches_pairwise_reference_across_buckets(self, spark):
        from recover_spark.ops.classifier_eval import roc_auc_by_group

        rng = random.Random(107)
        # coarse scores force tie blocks that straddle bucket edges
        rows = [
            (
                "g%d" % (i % 2),
                round(rng.random(), 1),
                1 if rng.random() < 0.4 else 0,
            )
            for i in range(600)
        ]
        df = spark.createDataFrame(rows, "g string, s double, y int")
        for buckets in (3, 64):
            got = {
                r["g"]: r["auc"]
                for r in roc_auc_by_group(
                    df, ["g"], "s", "y", buckets=buckets
                ).collect()
            }
            for g in ("g0", "g1"):
                want = _pairwise_auc(
                    [(s, y) for gg, s, y in rows if gg == g]
                )
                assert got[g] == pytest.approx(want, abs=5.1e-6)

    def test_degenerate_single_class_null(self, spark):
        from recover_spark.ops.classifier_eval import roc_auc_by_group

        df = spark.createDataFrame(
            [("g", 0.3, 1), ("g", 0.7, 1)], "g string, s double, y int"
        )
        row = roc_auc_by_group(df, ["g"], "s", "y").collect()[0]
        assert row["auc"] is None and row["n_neg"] == 0

    def test_null_exclusion_and_label_guard(self, spark):
        from pyspark.errors import SparkRuntimeException

        from recover_spark.ops.classifier_eval import roc_auc_by_group

        df = spark.createDataFrame(
            [("g", 0.9, 1), ("g", 0.1, 0), ("g", None, 1), ("g", 0.5, None)],
            "g string, s double, y int",
        )
        row = roc_auc_by_group(df, ["g"], "s", "y").collect()[0]
        assert row["n_pos"] == 1 and row["n_neg"] == 1
        bad = spark.createDataFrame(
            [("g", 0.9, 2)], "g string, s double, y int"
        )
        with pytest.raises(SparkRuntimeException, match="boolean/0-1"):
            roc_auc_by_group(bad, ["g"], "s", "y").collect()

    def test_no_cartesian_bucketed_plan(self, spark):
        from recover_spark.ops.classifier_eval import roc_auc_by_group

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 97 AS DOUBLE) / 97 s",
            "CAST(id % 2 AS INT) y",
        )
        plan = (
            roc_auc_by_group(df, ["g"], "s", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # the fact-sized window must partition on (group, bucket)
        assert "__bucket" in plan


class TestCalibration:
    def test_known_values(self, spark):
        from recover_spark.ops.classifier_eval import (
            calibration_summary,
            reliability_bins,
        )

        # bin 2 (0.2-0.3): conf 0.24, acc 0.5 -> gap 0.26, n=2
        # bin 9 (0.9-1.0]: conf 0.955, acc 1.0 -> gap 0.045, n=2
        rows = [
            ("g", 0.21, 0), ("g", 0.27, 1), ("g", 0.91, 1), ("g", 1.0, 1)
        ]
        df = spark.createDataFrame(rows, "g string, s double, y int")
        bins = {
            r["bin"]: r
            for r in reliability_bins(df, ["g"], "s", "y").collect()
        }
        assert set(bins) == {2, 9}
        assert bins[2]["confidence"] == 0.24
        assert bins[2]["accuracy"] == 0.5
        assert bins[9]["confidence"] == 0.955  # 1.0 clamps into bin 9
        assert bins[9]["accuracy"] == 1.0
        row = calibration_summary(df, ["g"], "s", "y").collect()[0]
        brier = sum((s - y) ** 2 for _, s, y in rows) / 4
        assert row["brier"] == pytest.approx(brier, abs=5.1e-6)
        assert row["ece"] == pytest.approx(
            (2 * 0.26 + 2 * 0.045) / 4, abs=5.1e-6
        )
        assert row["base_rate"] == 0.75 and row["n"] == 4

    def test_perfectly_calibrated_groups_score_zero_ece(self, spark):
        from recover_spark.ops.classifier_eval import calibration_summary

        # within each bin the positive rate equals the mean score
        rows = []
        for conf, n in ((0.25, 8), (0.75, 8)):
            k = int(round(conf * n))
            rows += [("g", conf, 1)] * k + [("g", conf, 0)] * (n - k)
        df = spark.createDataFrame(rows, "g string, s double, y int")
        row = calibration_summary(df, ["g"], "s", "y").collect()[0]
        assert row["ece"] == 0.0

    def test_guards(self, spark):
        from pyspark.errors import SparkRuntimeException

        from recover_spark.ops.classifier_eval import (
            calibration_summary,
            reliability_bins,
        )

        df = spark.createDataFrame(
            [("g", 1.5, 1)], "g string, s double, y int"
        )
        with pytest.raises(SparkRuntimeException, match=r"\[0, 1\]"):
            calibration_summary(df, ["g"], "s", "y").collect()
        with pytest.raises(ValueError, match="bins"):
            reliability_bins(df, ["g"], "s", "y", bins=0)

    def test_single_aggregate_plan(self, spark):
        from recover_spark.ops.classifier_eval import calibration_summary

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 97 AS DOUBLE) / 97 s",
            "CAST(id % 2 AS INT) y",
        )
        plan = (
            calibration_summary(df, ["g"], "s", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one fact shuffle to (group, bin), one bins-sized fold
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "CartesianProduct" not in plan


def _tie_block_ap(rows):
    """Reference AP under the tie-block convention."""
    from collections import defaultdict

    blocks = defaultdict(lambda: [0, 0])  # score -> [pos, cnt]
    for s, y in rows:
        blocks[s][0] += y
        blocks[s][1] += 1
    P = sum(p for p, _ in blocks.values())
    if P == 0:
        return None
    cp = cn = 0
    ap = 0.0
    for s in sorted(blocks, reverse=True):
        p, c = blocks[s]
        cp += p
        cn += c
        ap += p * (cp / cn)
    return ap / P


class TestAveragePrecision:
    def test_hand_cases(self, spark):
        from recover_spark.ops.classifier_eval import (
            average_precision_by_group,
        )

        rows = (
            [("perfect", 0.9, 1), ("perfect", 0.8, 1), ("perfect", 0.1, 0)]
            + [("mid", 0.9, 1), ("mid", 0.8, 0), ("mid", 0.7, 1)]
            + [("tie", 0.5, 1), ("tie", 0.5, 0)]
            + [("nopos", 0.5, 0)]
        )
        df = spark.createDataFrame(rows, "g string, s double, y int")
        got = {
            r["g"]: r
            for r in average_precision_by_group(
                df, ["g"], "s", "y"
            ).collect()
        }
        assert got["perfect"]["avg_precision"] == 1.0
        assert got["mid"]["avg_precision"] == pytest.approx(
            (1.0 + 2 / 3) / 2, abs=5.1e-6
        )
        # tie block of 2 with 1 positive: precision at block end = 0.5
        assert got["tie"]["avg_precision"] == 0.5
        assert got["nopos"]["avg_precision"] is None
        assert got["mid"]["n"] == 3 and got["mid"]["n_pos"] == 2

    def test_matches_reference_across_buckets(self, spark):
        from recover_spark.ops.classifier_eval import (
            average_precision_by_group,
        )

        rng = random.Random(211)
        rows = [
            (
                "g%d" % (i % 2),
                round(rng.random(), 1),  # heavy ties
                1 if rng.random() < 0.3 else 0,
            )
            for i in range(600)
        ]
        df = spark.createDataFrame(rows, "g string, s double, y int")
        for buckets in (3, 64):
            got = {
                r["g"]: r["avg_precision"]
                for r in average_precision_by_group(
                    df, ["g"], "s", "y", buckets=buckets
                ).collect()
            }
            for g in ("g0", "g1"):
                want = _tie_block_ap(
                    [(s, y) for gg, s, y in rows if gg == g]
                )
                assert got[g] == pytest.approx(want, abs=5.1e-6)

    def test_plan_no_cartesian(self, spark):
        from recover_spark.ops.classifier_eval import (
            average_precision_by_group,
        )

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 97 AS DOUBLE) / 97 s",
            "CAST(id % 2 AS INT) y",
        )
        plan = (
            average_precision_by_group(df, ["g"], "s", "y")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "__bucket" in plan
