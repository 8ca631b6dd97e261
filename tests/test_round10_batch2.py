"""Round-10 second batch: group_topk_sample (ops/sampling.py),
rank_normalize and cohens_d (operators/analytics.py).
"""

import pytest
from pyspark.sql import functions as F


class TestGroupTopkSample:
    def test_exact_k_per_group(self, spark):
        from recover_spark.ops import group_topk_sample

        df = spark.range(1000).selectExpr(
            "CAST(id % 4 AS STRING) g", "id AS key"
        )
        out = group_topk_sample(df, ["g"], "key", k=17)
        by = {
            r["g"]: r["n"]
            for r in out.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert by == {"0": 17, "1": 17, "2": 17, "3": 17}

    def test_small_group_kept_whole(self, spark):
        from recover_spark.ops import group_topk_sample

        df = spark.createDataFrame(
            [("tiny", i) for i in range(3)], "g string, key int"
        )
        assert group_topk_sample(df, ["g"], "key", k=10).count() == 3

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.ops import group_topk_sample

        base = spark.range(500).selectExpr(
            "CAST(id % 3 AS STRING) g", "id AS key"
        )
        a = sorted(
            r["key"]
            for r in group_topk_sample(
                base.repartition(32), ["g"], "key", 20
            ).collect()
        )
        b = sorted(
            r["key"]
            for r in group_topk_sample(
                base.coalesce(1), ["g"], "key", 20
            ).collect()
        )
        assert a == b

    def test_salt_changes_sample_and_k_guard(self, spark):
        from recover_spark.ops import group_topk_sample

        df = spark.range(500).selectExpr("'g' AS g", "id AS key")
        a = {r["key"] for r in group_topk_sample(df, ["g"], "key", 50).collect()}
        b = {
            r["key"]
            for r in group_topk_sample(
                df, ["g"], "key", 50, salt="other"
            ).collect()
        }
        assert a != b
        with pytest.raises(ValueError, match="k must be"):
            group_topk_sample(df, ["g"], "key", 0)

    def test_map_side_group_limit_plan(self, spark):
        from recover_spark.ops import group_topk_sample

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g", "id AS key"
        )
        plan = (
            group_topk_sample(df, ["g"], "key", 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
        assert "CartesianProduct" not in plan


class TestRankNormalize:
    def test_hazen_positions_with_ties(self, spark):
        from recover_spark.operators.analytics import rank_normalize

        # values 1, 2, 2, 4: midranks 1, 2.5, 2.5, 4 -> Hazen /4
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0)],
            "g string, v double",
        )
        got = sorted(
            (r["v"], r["ecdf"])
            for r in rank_normalize(df, ["g"], "v").collect()
        )
        assert got == [
            (1.0, 0.125), (2.0, 0.5), (2.0, 0.5), (4.0, 0.875)
        ]

    def test_monotone_invariance_and_nulls(self, spark):
        from recover_spark.operators.analytics import rank_normalize

        df = spark.createDataFrame(
            [("g", float(v)) for v in (3, 1, 7, 9)] + [("g", None)],
            "g string, v double",
        )
        raw = {
            r["v"]: r["ecdf"]
            for r in rank_normalize(df, ["g"], "v").collect()
        }
        cubed = df.withColumn("v3", F.col("v") ** 3)
        tr = {
            r["v"]: r["ecdf"]
            for r in rank_normalize(cubed, ["g"], "v3").collect()
        }
        for v in (3.0, 1.0, 7.0, 9.0):
            assert raw[v] == tr[v]
        assert raw[None] is None  # NULL passes through, not dropped

    def test_row_count_preserved(self, spark):
        from recover_spark.operators.analytics import rank_normalize

        df = spark.range(1000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 41 AS DOUBLE) v"
        )
        assert rank_normalize(df, ["g"], "v").count() == 1000


class TestCohensD:
    def test_known_effect(self, spark):
        from recover_spark.operators.analytics import cohens_d

        # variant a: 1,2,3 (mean 2, var 1); b: 3,4,5 (mean 4, var 1)
        rows = [("g", "a", float(v)) for v in (1, 2, 3)] + [
            ("g", "b", float(v)) for v in (3, 4, 5)
        ]
        df = spark.createDataFrame(rows, "g string, var string, v double")
        row = cohens_d(df, ["g"], "var", "v", "a", "b").collect()[0]
        assert row["cohen_d"] == pytest.approx(-2.0, abs=5.1e-6)
        assert row["hedges_g"] == pytest.approx(
            -2.0 * (1 - 3 / (4 * 6 - 9)), abs=5.1e-6
        )
        assert row["n_a"] == 3 and row["n_b"] == 3

    def test_degenerate_null(self, spark):
        from recover_spark.operators.analytics import cohens_d

        df = spark.createDataFrame(
            [("g", "a", 1.0), ("g", "b", 2.0), ("g", "b", 3.0)],
            "g string, var string, v double",
        )
        row = cohens_d(df, ["g"], "var", "v", "a", "b").collect()[0]
        assert row["cohen_d"] is None  # n_a < 2: var_samp NULL

    def test_one_aggregate_plan(self, spark):
        from recover_spark.operators.analytics import cohens_d

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 2 AS STRING) var",
            "CAST(id % 97 AS DOUBLE) v",
        )
        plan = (
            cohens_d(df, ["g"], "var", "v", "0", "1")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestLexicalDiversity:
    def test_hand_counts(self, spark):
        from recover_spark.ops.text_analysis import lexical_diversity

        # tokens: the cat sat the cat -> n=5, types=3 (the:2 cat:2
        # sat:1), hapax=1
        df = spark.createDataFrame(
            [(1, "The cat sat; the CAT!")], "doc_id long, text string"
        )
        row = lexical_diversity(df, ["doc_id"], "text").collect()[0]
        assert row["n_tokens"] == 5 and row["n_types"] == 3
        assert row["ttr"] == pytest.approx(3 / 5, abs=5.1e-6)
        assert row["guiraud"] == pytest.approx(3 / 5 ** 0.5, abs=5.1e-6)
        assert row["hapax_share"] == pytest.approx(1 / 3, abs=5.1e-6)

    def test_group_grain_folds_across_docs(self, spark):
        from recover_spark.ops.text_analysis import lexical_diversity

        df = spark.createDataFrame(
            [("s", "alpha beta"), ("s", "alpha gamma")],
            "source string, text string",
        )
        row = lexical_diversity(df, ["source"], "text").collect()[0]
        # corpus-level: alpha twice -> 4 tokens, 3 types, 2 hapax
        assert row["n_tokens"] == 4 and row["n_types"] == 3
        assert row["hapax_share"] == pytest.approx(2 / 3, abs=5.1e-6)

    def test_empty_text_group_disappears(self, spark):
        from recover_spark.ops.text_analysis import lexical_diversity

        df = spark.createDataFrame(
            [(1, "real words"), (2, "!!! ...")], "doc_id long, text string"
        )
        got = {r["doc_id"] for r in
               lexical_diversity(df, ["doc_id"], "text").collect()}
        assert got == {1}
