"""Round-10 fourth batch: standardize + winsorize transforms
(operators/analytics.py) and the binned-AUC read lens on the
calibration matview state (streaming/matview.py).
"""

import pytest
from pyspark.sql import functions as F


class TestStandardize:
    def test_known_zscores(self, spark):
        from recover_spark.operators.analytics import standardize

        # values 1,2,3: mean 2, stddev_samp 1
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0)], "g string, v double"
        )
        got = sorted(
            r["zscore"] for r in standardize(df, ["g"], "v").collect()
        )
        assert got == [-1.0, 0.0, 1.0]

    def test_nulls_and_constant_group(self, spark):
        from recover_spark.operators.analytics import standardize

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 3.0), ("g", None),
             ("const", 5.0), ("const", 5.0)],
            "g string, v double",
        )
        rows = standardize(df, ["g"], "v").collect()
        by = [(r["g"], r["v"], r["zscore"]) for r in rows]
        assert ("g", None, None) in by
        assert all(z is None for g, _, z in by if g == "const")

    def test_rows_preserved_map_only_after_join(self, spark):
        from recover_spark.operators.analytics import standardize

        df = spark.range(1000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 41 AS DOUBLE) v"
        )
        out = standardize(df, ["g"], "v", broadcast_stats=True)
        assert out.count() == 1000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestWinsorize:
    def test_clamps_to_exact_quantiles(self, spark):
        from recover_spark.operators.analytics import winsorize

        vals = [float(v) for v in range(1, 21)]  # 1..20
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        out = {
            r["v"]: r["winsorized"]
            for r in winsorize(
                df, ["g"], "v", lower_q=0.1, upper_q=0.9
            ).collect()
        }
        # type-1 quantiles of 1..20: q10 = 2, q90 = 18
        assert out[1.0] == 2.0 and out[2.0] == 2.0
        assert out[19.0] == 18.0 and out[20.0] == 18.0
        assert out[10.0] == 10.0  # interior untouched

    def test_guards_and_nulls(self, spark):
        from recover_spark.operators.analytics import winsorize

        df = spark.createDataFrame(
            [("g", 1.0), ("g", None)], "g string, v double"
        )
        with pytest.raises(ValueError, match="lower_q"):
            winsorize(df, ["g"], "v", lower_q=0.9, upper_q=0.1)
        rows = {r["v"]: r["winsorized"]
                for r in winsorize(df, ["g"], "v").collect()}
        assert rows[None] is None

    def test_row_count_preserved(self, spark):
        from recover_spark.operators.analytics import winsorize

        df = spark.range(2000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 97 AS DOUBLE) v"
        )
        assert winsorize(df, ["g"], "v").count() == 2000


class TestBinnedAucLens:
    def test_matches_binned_reference_and_batch_auc_on_bin_grain(
        self, spark, tmp_path
    ):
        from recover_spark.ops.classifier_eval import roc_auc_by_group
        from recover_spark.streaming.matview import (
            merge_calibration_state,
            read_auc_matview,
        )

        df = spark.range(600).selectExpr(
            "CAST(id % 2 AS STRING) g",
            "CAST(id % 89 AS DOUBLE) / 89 AS s",
            "CAST(CASE WHEN (id * 7) % 13 < 5 THEN 1 ELSE 0 END AS INT)"
            " AS y",
        )
        state = str(tmp_path / "state")
        merge_calibration_state(
            spark, df, state, ["g"], "s", "y", 10, batch_id=0
        )
        got = {
            r["g"]: r for r in read_auc_matview(spark, state, ["g"]).collect()
        }
        # reference: batch AUC over scores QUANTIZED to the same bins
        quant = df.selectExpr(
            "g", "least(CAST(floor(s * 10) AS INT), 9) AS sq", "y"
        )
        want = {
            r["g"]: r
            for r in roc_auc_by_group(quant, ["g"], "sq", "y").collect()
        }
        for g in want:
            assert got[g]["n_pos"] == want[g]["n_pos"]
            assert got[g]["n_neg"] == want[g]["n_neg"]
            assert got[g]["auc_binned"] == want[g]["auc"]

    def test_multi_batch_additivity(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_calibration_state,
            read_auc_matview,
        )

        df = spark.range(400).selectExpr(
            "'g' AS g",
            "CAST(id % 53 AS DOUBLE) / 53 AS s",
            "CAST(id % 2 AS INT) AS y",
        )
        one = str(tmp_path / "one")
        merge_calibration_state(spark, df, one, ["g"], "s", "y", 10)
        two = str(tmp_path / "two")
        merge_calibration_state(
            spark, df.filter("id < 200"), two, ["g"], "s", "y", 10
        )
        merge_calibration_state(
            spark, df.filter("id >= 200"), two, ["g"], "s", "y", 10
        )
        a = read_auc_matview(spark, one, ["g"]).collect()[0]
        b = read_auc_matview(spark, two, ["g"]).collect()[0]
        assert a["auc_binned"] == b["auc_binned"]
        assert a["n_pos"] == b["n_pos"]


class TestClusteringCoefficient:
    def test_known_graph(self, spark):
        from recover_spark.ops import clustering_coefficient

        # triangle a-b-c plus pendant d off a: deg a=3, b=c=2, d=1
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")],
            "id_a string, id_b string",
        )
        got = {
            r["node"]: r
            for r in clustering_coefficient(pairs).collect()
        }
        assert got["a"]["n_triangles"] == 1
        assert got["a"]["clustering_coeff"] == pytest.approx(
            2 * 1 / (3 * 2), abs=5.1e-6
        )
        assert got["b"]["clustering_coeff"] == 1.0
        assert got["c"]["clustering_coeff"] == 1.0
        # degree-1: undefined, not zero
        assert got["d"]["clustering_coeff"] is None
        assert got["d"]["n_triangles"] == 0

    def test_triangle_free_nodes_report_zero(self, spark):
        from recover_spark.ops import clustering_coefficient

        path = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "id_a string, id_b string"
        )
        got = {
            r["node"]: r for r in clustering_coefficient(path).collect()
        }
        assert got["b"]["n_triangles"] == 0
        assert got["b"]["clustering_coeff"] == 0.0

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from recover_spark.ops import clustering_coefficient

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("a", "c")],
            "id_a string, id_b string",
        )
        got = {
            r["node"]: r
            for r in clustering_coefficient(pairs).collect()
        }
        assert got["a"]["degree"] == 2 and got["a"]["n_triangles"] == 1


class TestClusterSizeHistogram:
    def test_hand_histogram(self, spark):
        from recover_spark.ops import cluster_size_histogram

        df = spark.createDataFrame(
            [(1, "c1"), (2, "c1"), (3, "c1"),
             (4, "c2"), (5, "c2"), (6, "c3"), (7, "c4")],
            "doc_id long, cluster string",
        )
        got = {
            r["cluster_size"]: (r["n_clusters"], r["n_rows"])
            for r in cluster_size_histogram(df).collect()
        }
        assert got == {1: (2, 2), 2: (1, 2), 3: (1, 3)}
        # dedup savings = sum (size-1)*n_clusters = 0 + 1 + 2 = 3
        assert sum((s - 1) * n for s, (n, _) in got.items()) == 3
