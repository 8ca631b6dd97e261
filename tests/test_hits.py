"""HITS hubs-and-authorities (ops/graph.py:hits): scores vs an
independent numpy power iteration, the hub/authority duality on a
directed star, determinism, guards."""

from __future__ import annotations

import pytest


def _py_hits(edges, iterations=6):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(iterations):
        a = {n: 0.0 for n in nodes}
        for u, v in edges:
            a[v] += h[u]
        norm = sum(x * x for x in a.values()) ** 0.5
        a = {n: x / norm for n, x in a.items()}
        h = {n: 0.0 for n in nodes}
        for u, v in edges:
            h[u] += a[v]
        norm = sum(x * x for x in h.values()) ** 0.5
        h = {n: x / norm for n, x in h.items()}
    return h, a


class TestHits:
    def test_matches_python_reference(self, spark):
        from recover_spark.ops.graph import hits

        edges = [
            ("a", "x"), ("a", "y"), ("a", "z"),
            ("b", "x"), ("b", "y"),
            ("c", "z"), ("x", "z"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        rows = {r["node"]: r for r in hits(df).collect()}
        h, a = _py_hits(edges)
        for n in h:
            assert rows[n]["hub"] == pytest.approx(h[n], abs=2e-6)
            assert rows[n]["authority"] == pytest.approx(a[n], abs=2e-6)

    def test_star_duality(self, spark):
        from recover_spark.ops.graph import hits

        # one broad buyer pointing at all suppliers: the center is the
        # unique hub (score 1), leaves are equal authorities, and the
        # center has authority 0 (nothing points at it)
        edges = [("hub", f"s{i}") for i in range(5)]
        df = spark.createDataFrame(edges, "src string, dst string")
        rows = {r["node"]: r for r in hits(df).collect()}
        assert rows["hub"]["hub"] == pytest.approx(1.0, abs=1e-6)
        assert rows["hub"]["authority"] == pytest.approx(0.0, abs=1e-9)
        for i in range(5):
            assert rows[f"s{i}"]["authority"] == pytest.approx(
                1 / 5 ** 0.5, abs=1e-6
            )
            assert rows[f"s{i}"]["hub"] == pytest.approx(0.0, abs=1e-9)

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.ops.graph import hits

        edges = [(f"u{i % 7}", f"v{i % 11}") for i in range(60)]
        df = spark.createDataFrame(edges, "src string, dst string")
        x = sorted(map(tuple, hits(df).collect()))
        y = sorted(map(tuple, hits(df.repartition(9)).collect()))
        assert x == y

    def test_iterations_guard(self, spark):
        from recover_spark.ops.graph import hits

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError, match="iterations"):
            hits(df, iterations=0)
