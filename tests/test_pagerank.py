"""Weighted PageRank (ops/graph.py:pagerank) — power iteration as
joins + mergeable aggregates, checked against an independent numpy
reference on the same graphs."""

from __future__ import annotations

import numpy as np
import pytest

from recover_spark.ops.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, iterations=10, weights=None):
    """Dense reference: standard power iteration with uniform dangling
    redistribution, matching the operator's documented semantics."""
    nodes = sorted({u for e in edges for u in e[:2]})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for k, (u, v) in enumerate(edges):
        w[idx[u], idx[v]] += weights[k] if weights else 1.0
    out = w.sum(axis=1)
    p = np.divide(w, out[:, None], out=np.zeros_like(w), where=out[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (r @ p + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _assert_matches(spark_rows, expect, tol=1e-9):
    got = {r["node"]: r["rank"] for r in spark_rows}
    assert set(got) == set(expect)
    for v, e in expect.items():
        assert got[v] == pytest.approx(e, abs=tol), v


def test_simple_directed_graph_matches_numpy(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iterations=10, round_digits=9).collect()
    _assert_matches(out, _numpy_pagerank(edges), tol=5e-9)


def test_dangling_node_mass_redistributed(spark):
    # "c" has no out-edges: without dangling redistribution ranks leak
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = pagerank(df, iterations=12, round_digits=9).collect()
    _assert_matches(rows, _numpy_pagerank(edges, iterations=12), tol=5e-9)
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_weighted_edges_shift_rank(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    heavy = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    rows = pagerank(heavy, weight="w", iterations=10, round_digits=9).collect()
    expect = _numpy_pagerank(edges, weights=[9.0, 1.0, 1.0, 1.0])
    _assert_matches(rows, expect, tol=5e-9)
    got = {r["node"]: r["rank"] for r in rows}
    assert got["b"] > got["c"]  # 9x the transition mass from a


def test_cycle_is_uniform(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = pagerank(df, iterations=15).collect()
    for r in rows:
        assert r["rank"] == pytest.approx(0.25, abs=1e-7)


def test_no_per_iteration_driver_action(spark, monkeypatch):
    """VERDICT r5: the dangling-mass aggregate must ride the
    iteration's lazy plan (broadcast one-row cross-join), not a
    per-iteration driver collect.  Pin: constructing the result
    DataFrame performs exactly the two documented one-time driver
    actions (node count, dangling probe) and ZERO collects, however
    many iterations — under the old formulation collect() fired once
    per iteration.  (Job-count pins don't work here: AQE materializes
    each checkpoint's shuffle stages as jobs, so raw job counts scale
    with plan depth even for a fully lazy loop.)"""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    calls = {"collect": 0, "count": 0}
    orig_collect, orig_count = CDF.collect, CDF.count

    def counting_collect(self, *a, **k):
        calls["collect"] += 1
        return orig_collect(self, *a, **k)

    def counting_count(self, *a, **k):
        calls["count"] += 1
        return orig_count(self, *a, **k)

    monkeypatch.setattr(CDF, "collect", counting_collect)
    monkeypatch.setattr(CDF, "count", counting_count)

    edges = [("a", "b"), ("b", "c"), ("a", "c")]  # c dangles
    df = spark.createDataFrame(edges, "src string, dst string")
    for iters in (2, 8):
        calls["collect"] = calls["count"] = 0
        pagerank(df, iterations=iters)
        assert calls["collect"] == 0, calls
        assert calls["count"] == 2, calls


def test_invalid_params_rejected(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
