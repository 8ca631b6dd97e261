"""WITH RECURSIVE parity via pointer doubling (ops/graph.py:
hierarchy_paths): paths vs an independent Python walk, log-round
convergence on a 1000-deep chain, cycle and orphan-parent guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _forest(spark):
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    return cust.select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") < 7, F.lit(None).cast("long"))
        .otherwise(F.expr("c_custkey DIV 7"))
        .alias("parent"),
    )


class TestHierarchyPaths:
    def test_matches_python_walk(self, spark):
        from recover_spark.ops.graph import hierarchy_paths

        nodes = _forest(spark)
        parent = {r["node"]: r["parent"] for r in nodes.collect()}
        rows = hierarchy_paths(nodes).collect()
        assert len(rows) == len(parent)
        for r in rows:
            chain = [r["node"]]
            while parent[chain[-1]] is not None and parent[chain[-1]] != chain[-1]:
                chain.append(parent[chain[-1]])
            assert r["root"] == chain[-1]
            assert r["depth"] == len(chain) - 1
            assert r["path"] == "/".join(str(x) for x in reversed(chain))

    def test_deep_chain_converges_in_log_rounds(self, spark):
        from recover_spark.ops.graph import hierarchy_paths

        n = 1000
        nodes = spark.createDataFrame(
            [(0, None)] + [(i, i - 1) for i in range(1, n)],
            "node long, parent long",
        )
        # 2^11 > 1000: doubling must converge well inside 15 rounds
        # where a per-level loop would need 999
        rows = {r["node"]: r for r in hierarchy_paths(
            nodes, max_rounds=15).collect()}
        assert rows[n - 1]["depth"] == n - 1
        assert rows[n - 1]["root"] == 0
        assert rows[n - 1]["path"].startswith("0/1/2/")
        assert rows[0]["depth"] == 0 and rows[0]["path"] == "0"

    def test_cycle_raises(self, spark):
        from recover_spark.ops.graph import hierarchy_paths

        nodes = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "node long, parent long"
        )
        with pytest.raises(RuntimeError, match="CYCLE"):
            hierarchy_paths(nodes, max_rounds=8)

    def test_orphan_parent_raises(self, spark):
        from recover_spark.ops.graph import hierarchy_paths

        nodes = spark.createDataFrame(
            [(1, None), (2, 99)], "node long, parent long"
        )
        with pytest.raises(ValueError, match="no node row"):
            hierarchy_paths(nodes)

    def test_self_parent_is_root(self, spark):
        from recover_spark.ops.graph import hierarchy_paths

        nodes = spark.createDataFrame(
            [(5, 5), (6, 5)], "node long, parent long"
        )
        rows = {r["node"]: r for r in hierarchy_paths(nodes).collect()}
        assert rows[5]["depth"] == 0 and rows[5]["path"] == "5"
        assert rows[6]["depth"] == 1 and rows[6]["path"] == "5/6"
