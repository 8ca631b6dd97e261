"""Round-9 regression tests for the round-8 ADVICE findings.

Each test pins a specific repaired defect:
- k_core double-counted degrees when the input stored both (a, b)
  and (b, a) for the same undirected edge;
- gini_by_group let NULL values inflate n and every bucket's rank
  offset;
- association_matrix's name-joined pair tags collided when a column
  name contained '|';
- the KS cross-multiplications ran in int64, overflowing past ~3e9
  rows per era;
- pca's dimension inference read F.size of a NULL first row (-1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestKCoreBidirectionalInput:
    def test_both_direction_edges_not_double_counted(self, spark):
        from recover_spark.ops.graph import k_core

        one_way = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
        both = one_way + [(d, s) for s, d in one_way]
        df_one = spark.createDataFrame(one_way, "src string, dst string")
        df_both = spark.createDataFrame(both, "src string, dst string")
        want = {r["node"]: r["degree"] for r in k_core(df_one, 2).collect()}
        got = {r["node"]: r["degree"] for r in k_core(df_both, 2).collect()}
        # pre-fix, the doubled edges made every degree 2x: the path
        # c-d-e then survived the 2-core instead of peeling away
        assert got == want == {"a": 2, "b": 2, "c": 2}

    def test_partially_mirrored_input(self, spark):
        from recover_spark.ops.graph import k_core

        # only SOME edges stored both ways — the canonical dedup must
        # not depend on the mirroring being uniform
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "d")],
            "src string, dst string",
        )
        got = {r["node"]: r["degree"] for r in k_core(edges, 2).collect()}
        assert got == {"a": 2, "b": 2, "c": 2}


class TestGiniNullExclusion:
    def test_nulls_excluded_from_rank_and_n(self, spark):
        from recover_spark.operators.analytics import gini_by_group

        base = [("g", 5.0)] * 4
        df = spark.createDataFrame(base, "g string, v double")
        with_nulls = spark.createDataFrame(
            base + [("g", None)] * 3, "g string, v double"
        )
        want = gini_by_group(df, ["g"], "v").collect()[0]
        got = gini_by_group(with_nulls, ["g"], "v").collect()[0]
        assert got["gini"] == want["gini"] == 0.0
        assert got["n"] == want["n"] == 4
        assert got["mean"] == want["mean"] == 5.0

    def test_all_null_group_disappears(self, spark):
        from recover_spark.operators.analytics import gini_by_group

        df = spark.createDataFrame(
            [("real", 1.0), ("real", 3.0), ("ghost", None)],
            "g string, v double",
        )
        rows = {r["g"]: r for r in gini_by_group(df, ["g"], "v").collect()}
        assert set(rows) == {"real"}


class TestAssociationTagCollision:
    def test_pipe_in_column_names(self, spark):
        from recover_spark.operators.analytics import association_matrix

        # cols ['x', 'y|z', 'x|y', 'z']: the old f"{a}|{b}" tag made
        # ('x', 'y|z') and ('x|y', 'z') the same bucket, merging their
        # contingency cells
        df = spark.createDataFrame(
            [(i % 2, i % 3, (i + 1) % 2, i % 5) for i in range(60)],
            "a int, b int, c int, d int",
        ).select(
            F.col("a").alias("x"),
            F.col("b").alias("y|z"),
            F.col("c").alias("x|y"),
            F.col("d").alias("z"),
        )
        out = association_matrix(df, ["x", "y|z", "x|y", "z"]).collect()
        pairs = {(r["col_a"], r["col_b"]) for r in out}
        assert len(out) == 6 and len(pairs) == 6
        by_pair = {(r["col_a"], r["col_b"]): r for r in out}
        # x and x|y are complements of the same parity -> perfect
        # association; a merged bucket would destroy this
        assert by_pair[("x", "x|y")]["v_cramer"] == pytest.approx(
            1.0, abs=1e-6
        )
        for r in out:
            assert r["n"] == 60


class TestKsCrossMultiplyDouble:
    def test_billion_row_counts_do_not_overflow(self, spark):
        from recover_spark.quality.drift import ks_grid_from_binned_counts

        # per-era totals ~4e9: the old long cross-multiply overflows
        # int64 (ANSI error under Spark 4); doubles carry it fine
        big = 2_000_000_000
        base = spark.createDataFrame(
            [("v", 0, big), ("v", 1, big)],
            "column string, bin int, n_base long",
        )
        cur = spark.createDataFrame(
            [("v", 0, 2 * big), ("v", 1, 0)],
            "column string, bin int, n_cur long",
        )
        row = ks_grid_from_binned_counts(base, cur, ["v"], 2).collect()[0]
        # cum shares after bin 0: base 0.5 vs cur 1.0 -> D = 0.5
        assert row["ks_grid"] == pytest.approx(0.5, abs=1e-9)
        assert row["n_base"] == 2 * big and row["n_cur"] == 2 * big

    def test_ks_drift_big_eras(self, spark):
        from recover_spark.quality.drift import ks_drift

        # tiny row counts but the cross-multiply path is shared; pin
        # the exact-KS value so the double arithmetic is regression-
        # locked against the int path it replaced
        base = spark.range(0, 100).selectExpr("CAST(id AS DOUBLE) v")
        cur = spark.range(50, 150).selectExpr("CAST(id AS DOUBLE) v")
        row = ks_drift(base, cur, ["v"]).collect()[0]
        assert row["ks"] == pytest.approx(0.5, abs=1e-9)


class TestBasketLiftDroppedMetric:
    def test_stats_out_counts_dropped_baskets(self, spark):
        from recover_spark.operators.analytics import basket_lift

        rows = (
            [("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y")]
            + [("huge1", "i%03d" % i) for i in range(70)]
            + [("huge2", "i%03d" % i) for i in range(80)]
        )
        df = spark.createDataFrame(rows, "b string, i string")
        stats: dict = {}
        out = basket_lift(df, "b", "i", stats_out=stats).collect()
        assert stats["n_dropped_baskets"] == 2
        assert stats["n_baskets_total"] == 4
        # the rule base itself only sees the small baskets
        assert {(r["item_a"], r["item_b"]) for r in out} == {("x", "y")}

    def test_stats_out_zero_when_cap_never_bites(self, spark):
        from recover_spark.operators.analytics import basket_lift

        df = spark.createDataFrame(
            [("b1", "x"), ("b1", "y")], "b string, i string"
        )
        stats: dict = {}
        basket_lift(df, "b", "i", stats_out=stats).collect()
        assert stats == {"n_dropped_baskets": 0, "n_baskets_total": 1}


class TestPcaDimInference:
    def test_null_first_vector_skipped(self, spark):
        from recover_spark.ops.pca import embedding_covariance

        df = spark.createDataFrame(
            [(None,), ([1.0, 2.0, 3.0],), ([2.0, 1.0, 0.0],)],
            "embedding array<double>",
        ).coalesce(1)
        # dim inferred as 3 from the first NON-NULL row; the NULL row
        # itself is ignored by the moments pass
        out = embedding_covariance(df, "embedding").collect()
        assert len(out) == 6  # upper triangle of 3x3
        assert all(r["n"] == 2 for r in out)

    def test_all_null_raises_clearly(self, spark):
        from recover_spark.ops.pca import embedding_covariance

        df = spark.createDataFrame(
            [(None,), (None,)], "embedding array<double>"
        )
        with pytest.raises(ValueError, match="non-NULL"):
            embedding_covariance(df, "embedding")
