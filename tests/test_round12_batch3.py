"""Round-12 third-batch operators: Poisson-bootstrap confidence
intervals (operators/analytics.py:bootstrap_ci), Benjamini-Hochberg
FDR over per-segment KS tests (quality/drift.py), split-conformal
intervals (ops/classifier_eval.py), corpus self-BLEU
(ops/text_analysis.py), and JL sign random projection (ops/pca.py)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from recover_spark.operators.analytics import POISSON1_CDF, bootstrap_ci


def _py_u01(key: str, rep: int, salt: str = "boot") -> float:
    h = hashlib.md5(f"{salt}|{key}#{rep}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _py_weight(key: str, rep: int) -> int:
    u = _py_u01(key, rep)
    for k, c in enumerate(POISSON1_CDF):
        if u < c:
            return k
    return len(POISSON1_CDF)


def _orders(spark, n=600, groups=3):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        (F.col("id") * 37 % 1000).cast("double").alias("x"),
        F.col("id").alias("k"),
    )


class TestBootstrapCI:
    def test_matches_independent_python_bootstrap(self, spark):
        """Bit-for-bit (to the 6-decimal contract) against a from-
        scratch Python Poisson bootstrap with the same hash draws."""
        df = _orders(spark, n=300, groups=2)
        out = {
            r["g"]: r
            for r in bootstrap_ci(
                df, ["g"], "x", "k", n_replicates=8, alpha=0.25
            ).collect()
        }
        rows = df.collect()
        by_g: dict[str, list] = {}
        for r in rows:
            by_g.setdefault(r["g"], []).append((str(r["k"]), r["x"]))
        lo_ix = max(1, math.ceil(0.125 * 8))
        hi_ix = min(8, math.ceil(0.875 * 8))
        for g, items in by_g.items():
            means = []
            for b in range(8):
                ws = sum(_py_weight(k, b) * x for k, x in items)
                wn = sum(_py_weight(k, b) for k, _ in items)
                if wn:
                    means.append(ws / wn)
            srt = sorted(means)
            got = out[g]
            assert got["n"] == len(items)
            assert got["mean"] == pytest.approx(
                round(sum(x for _, x in items) / len(items) + 1e-9, 6),
                abs=1e-9,
            )
            assert got["n_boot"] == len(means)
            assert got["boot_mean"] == pytest.approx(
                round(sum(means) / len(means) + 1e-9, 6), abs=1e-9
            )
            assert got["ci_lo"] == pytest.approx(
                round(srt[lo_ix - 1] + 1e-9, 6), abs=1e-9
            )
            assert got["ci_hi"] == pytest.approx(
                round(srt[hi_ix - 1] + 1e-9, 6), abs=1e-9
            )

    def test_partitioning_invariance(self, spark):
        df = _orders(spark, n=500, groups=3)
        a = bootstrap_ci(df, ["g"], "x", "k", n_replicates=16).collect()
        b = bootstrap_ci(
            df.repartition(17, "x"), ["g"], "x", "k", n_replicates=16
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_interval_shape(self, spark):
        df = _orders(spark, n=3000, groups=2)
        for r in bootstrap_ci(df, ["g"], "x", "k").collect():
            assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]
            assert r["se_boot"] > 0
            # percentile CI of a 1000+-row mean hugs the exact mean
            assert abs(r["boot_mean"] - r["mean"]) < 5 * r["se_boot"]

    def test_weight_law_is_poisson1(self, spark):
        """Empirical weight frequencies over 20k draws match the capped
        Poisson(1) pmf (4-sigma bands)."""
        n = 20000
        freq = [0] * (len(POISSON1_CDF) + 1)
        for i in range(n):
            freq[_py_weight(str(i), 0)] += 1
        prev = 0.0
        for k, c in enumerate(POISSON1_CDF):
            p = c - prev
            prev = c
            sd = math.sqrt(n * p * (1 - p))
            assert abs(freq[k] - n * p) < 4 * sd, (k, freq[k], n * p)

    def test_plan_two_exchanges_no_cartesian(self, spark):
        df = _orders(spark, n=200, groups=2)
        plan = (
            bootstrap_ci(df, ["g"], "x", "k", n_replicates=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") <= 2
