"""Distributed PCA: covariance partials, eigensolve, projection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _random_embeddings(spark, n=200, d=12, seed=7, partitions=5):
    rng = np.random.default_rng(seed)
    # correlated data so the spectrum is interesting
    base = rng.normal(size=(n, 3)) @ rng.normal(size=(3, d))
    noise = 0.1 * rng.normal(size=(n, d))
    x = (base + noise).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(partitions)
    return df, x


class TestEmbeddingCovariance:
    def test_matches_numpy_cov(self, spark):
        from recover_spark.ops.pca import embedding_covariance

        df, x = _random_embeddings(spark)
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in embedding_covariance(df, dim=12, round_digits=9)
            .collect()
        }
        want = np.cov(x, rowvar=False, ddof=1)
        assert len(got) == 12 * 13 // 2
        for (i, j), v in got.items():
            assert abs(v - want[i, j]) < 1e-7, (i, j)

    def test_single_fact_shuffle_plan(self, spark):
        from recover_spark.ops.pca import embedding_covariance

        df, _ = _random_embeddings(spark)
        plan = (
            embedding_covariance(df, dim=12)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # ONE fact GEMM pass: the moment aggregate is checkpoint-pinned
        # so the four consumer branches (pairs, margins, count) cannot
        # each re-execute the scan (the aggregate-diamond hazard)
        assert plan.count("MapInPandas") <= 1
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "CartesianProduct" not in plan

    def test_dim_mismatch_raises(self, spark):
        from recover_spark.ops.pca import embedding_covariance

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="dim"):
            embedding_covariance(df, dim=5).collect()


class TestPcaFitProject:
    def test_matches_numpy_reference(self, spark):
        from recover_spark.ops.pca import pca_fit, pca_project

        df, x = _random_embeddings(spark)
        mean, comps, ev = pca_fit(df, k=4, dim=12)

        want_mean = x.mean(axis=0)
        want_cov = np.cov(x, rowvar=False, ddof=1)
        vals, vecs = np.linalg.eigh(want_cov)
        order = np.argsort(vals)[::-1][:4]
        want_comps = vecs[:, order].T.copy()
        for c in range(4):
            p = int(np.argmax(np.abs(want_comps[c])))
            if want_comps[c, p] < 0:
                want_comps[c] = -want_comps[c]

        assert np.allclose(mean, want_mean, atol=1e-9)
        assert np.allclose(ev, vals[order], atol=1e-9)
        assert np.allclose(comps, want_comps, atol=1e-7)

        proj = (
            pca_project(df, mean, comps, round_digits=9)
            .orderBy("vec_id")
            .collect()
        )
        want_scores = (x - want_mean) @ want_comps.T
        got_scores = np.asarray(
            [[r[f"pc{c}"] for c in range(4)] for r in proj]
        )
        assert np.allclose(got_scores, want_scores, atol=1e-6)

    def test_variance_ordering_and_capture(self, spark):
        from recover_spark.ops.pca import pca_fit

        df, x = _random_embeddings(spark)
        _, _, ev = pca_fit(df, k=6, dim=12)
        assert all(ev[i] >= ev[i + 1] for i in range(5))
        # rank-3 signal + small noise: top 3 carry almost everything
        total = np.trace(np.cov(x, rowvar=False, ddof=1))
        assert ev[:3].sum() / total > 0.95

    def test_projection_is_jvm_side(self, spark):
        from recover_spark.ops.pca import pca_fit, pca_project

        df, _ = _random_embeddings(spark)
        mean, comps, _ = pca_fit(df, k=2, dim=12)
        plan = (
            pca_project(df, mean, comps)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # weights arrive as ONE broadcast row; scores are array folds
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan

    def test_empty_input_raises(self, spark):
        from recover_spark.ops.pca import pca_fit

        df = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="empty"):
            pca_fit(df, k=2, dim=12)
