"""Round-9 operators: Welch A/B t-test, trimmed/winsorized robust
stats, and PMI collocations — golden values, degenerate contracts,
and plan pins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestWelchTtest:
    def test_matches_hand_computed_welch(self, spark):
        from recover_spark.operators.analytics import welch_ttest

        a_vals = [1.0, 2.0, 3.0, 4.0]
        b_vals = [2.0, 4.0, 6.0]
        rows = [("g", "A", v) for v in a_vals] + [
            ("g", "B", v) for v in b_vals
        ]
        df = spark.createDataFrame(rows, "g string, var string, v double")
        row = welch_ttest(df, ["g"], "var", "v", "A", "B").collect()[0]

        na, nb = len(a_vals), len(b_vals)
        ma = sum(a_vals) / na
        mb = sum(b_vals) / nb
        sa = sum((x - ma) ** 2 for x in a_vals) / (na - 1)
        sb = sum((x - mb) ** 2 for x in b_vals) / (nb - 1)
        se2 = sa / na + sb / nb
        t = (ma - mb) / math.sqrt(se2)
        dof = se2 * se2 / (
            (sa / na) ** 2 / (na - 1) + (sb / nb) ** 2 / (nb - 1)
        )
        assert row["n_a"] == na and row["n_b"] == nb
        assert row["mean_a"] == pytest.approx(ma, abs=1e-6)
        assert row["t_stat"] == pytest.approx(t, abs=1e-6)
        assert row["df_welch"] == pytest.approx(dof, abs=1e-6)

    def test_degenerate_contracts(self, spark):
        from recover_spark.operators.analytics import welch_ttest

        df = spark.createDataFrame(
            # 'tiny': variant B has one point -> NULL variance -> NULL t
            [("tiny", "A", 1.0), ("tiny", "A", 2.0), ("tiny", "B", 5.0)]
            # 'flat': both variances zero -> NULL t and NULL df
            + [("flat", "A", 3.0)] * 2
            + [("flat", "B", 4.0)] * 2
            # NULL values excluded per the family convention
            + [("tiny", "A", None)],
            "g string, var string, v double",
        )
        got = {
            r["g"]: r
            for r in welch_ttest(df, ["g"], "var", "v", "A", "B").collect()
        }
        assert got["tiny"]["t_stat"] is None
        assert got["tiny"]["df_welch"] is None
        assert got["tiny"]["n_a"] == 2  # the NULL did not count
        assert got["flat"]["t_stat"] is None
        assert got["flat"]["df_welch"] is None
        assert got["flat"]["mean_a"] == 3.0 and got["flat"]["mean_b"] == 4.0

    def test_single_aggregate_plan(self, spark):
        from recover_spark.operators.analytics import welch_ttest

        df = spark.range(10000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 2 AS INT) var",
            "CAST(id % 97 AS DOUBLE) v",
        )
        plan = _plan(welch_ttest(df, ["g"], "var", "v", 0, 1))
        # one fact shuffle on the group key, nothing else
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan


class TestTrimmedGroupStats:
    def test_golden_with_outlier(self, spark):
        from recover_spark.operators.analytics import trimmed_group_stats

        vals = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        row = trimmed_group_stats(df, ["g"], "v", trim=0.1).collect()[0]
        assert row["n"] == 10 and row["k_trim"] == 1
        assert row["mean"] == pytest.approx(13.6, abs=1e-6)
        assert row["trimmed_mean"] == pytest.approx(4.5, abs=1e-6)
        assert row["lo_clamp"] == 1.0 and row["hi_clamp"] == 8.0
        # winsorized: clamp 0 -> 1 and 100 -> 8
        assert row["winsorized_mean"] == pytest.approx(4.5, abs=1e-6)

    def test_ties_and_nulls(self, spark):
        from recover_spark.operators.analytics import trimmed_group_stats

        # ties straddling the cut: excluded vs included copies have
        # the same value, so any tie order gives the same result
        df = spark.createDataFrame(
            [("g", 1.0)] * 5 + [("g", 9.0)] * 5 + [("g", None)] * 3,
            "g string, v double",
        )
        row = trimmed_group_stats(df, ["g"], "v", trim=0.2).collect()[0]
        assert row["n"] == 10 and row["k_trim"] == 2
        assert row["trimmed_mean"] == pytest.approx(5.0, abs=1e-6)
        assert row["winsorized_mean"] == pytest.approx(5.0, abs=1e-6)

    def test_zero_trim_equals_mean(self, spark):
        from recover_spark.operators.analytics import trimmed_group_stats

        df = spark.createDataFrame(
            [("g", float(v)) for v in range(7)], "g string, v double"
        )
        row = trimmed_group_stats(df, ["g"], "v", trim=0.0).collect()[0]
        assert row["k_trim"] == 0
        assert row["trimmed_mean"] == row["mean"] == row["winsorized_mean"]
        assert row["lo_clamp"] == 0.0 and row["hi_clamp"] == 6.0

    def test_matches_sorted_reference(self, spark):
        import random

        from recover_spark.operators.analytics import trimmed_group_stats

        rng = random.Random(97)
        rows = [
            ("g%d" % (i % 2), round(rng.expovariate(1 / 40.0), 3))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["g"]: r
            for r in trimmed_group_stats(
                df, ["g"], "v", trim=0.15, buckets=7
            ).collect()
        }
        for g in ("g0", "g1"):
            xs = sorted(v for gg, v in rows if gg == g)
            n = len(xs)
            k = int(0.15 * n)
            mid = xs[k : n - k]
            assert got[g]["trimmed_mean"] == pytest.approx(
                sum(mid) / len(mid), abs=1e-6
            )
            wins = (sum(mid) + k * (xs[k] + xs[n - k - 1])) / n
            assert got[g]["winsorized_mean"] == pytest.approx(
                wins, abs=1e-6
            )

    def test_invalid_trim_raises(self, spark):
        from recover_spark.operators.analytics import trimmed_group_stats

        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="trim"):
            trimmed_group_stats(df, ["g"], "v", trim=0.5)

    def test_bucket_decomposed_plan(self, spark):
        from recover_spark.operators.analytics import trimmed_group_stats

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 101 AS DOUBLE) v"
        )
        plan = _plan(trimmed_group_stats(df, ["g"], "v"))
        assert "CartesianProduct" not in plan
        # the fact-sized window partitions on (group, bucket), never
        # the group alone (same contract as gini_by_group)
        assert "__bucket" in plan


class TestCollocationPmi:
    def test_golden_pmi(self, spark):
        from recover_spark.ops.text_analysis import collocation_pmi

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id int, text string"
        )
        got = {
            (r["w1"], r["w2"]): r
            for r in collocation_pmi(df, "text", min_pair_count=1).collect()
        }
        # bigrams: (a,b) x3, (b,a) x1, (b,c) x1 -> T=5
        # left margins a:3 b:2; right margins b:3 a:1 c:1
        assert got[("a", "b")]["n_ab"] == 3
        assert got[("a", "b")]["pmi"] == pytest.approx(
            math.log2(3 * 5 / (3 * 3)), abs=1e-6
        )
        assert got[("b", "a")]["pmi"] == pytest.approx(
            math.log2(1 * 5 / (2 * 1)), abs=1e-6
        )
        assert got[("b", "c")]["pmi"] == pytest.approx(
            math.log2(1 * 5 / (2 * 1)), abs=1e-6
        )

    def test_min_count_prunes_after_margins(self, spark):
        from recover_spark.ops.text_analysis import collocation_pmi

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id int, text string"
        )
        got = collocation_pmi(df, "text", min_pair_count=2).collect()
        # only (a,b) survives, but its PMI still uses the FULL margins
        assert len(got) == 1
        assert got[0]["pmi"] == pytest.approx(
            math.log2(3 * 5 / (3 * 3)), abs=1e-6
        )

    def test_short_docs_contribute_nothing(self, spark):
        from recover_spark.ops.text_analysis import collocation_pmi

        df = spark.createDataFrame(
            [(1, "single"), (2, ""), (3, "x y")],
            "doc_id int, text string",
        )
        got = collocation_pmi(df, "text", min_pair_count=1).collect()
        assert len(got) == 1
        assert (got[0]["w1"], got[0]["w2"]) == ("x", "y")
        # the only bigram: PMI = log2(1 * 1 / (1 * 1)) = 0
        assert got[0]["pmi"] == 0.0

    def test_no_cartesian_one_fact_shuffle(self, spark):
        from recover_spark.ops.text_analysis import collocation_pmi

        df = spark.createDataFrame(
            [(i, "w%d w%d w%d" % (i % 5, i % 7, i % 3)) for i in range(200)],
            "doc_id int, text string",
        )
        plan = _plan(collocation_pmi(df, "text"))
        assert "CartesianProduct" not in plan


class TestScd2Build:
    def test_history_versions_and_consecutive_dedup(self, spark):
        from recover_spark.operators.merge import scd2_build

        log = spark.createDataFrame(
            [
                ("u1", "a", 10, 1),
                ("u1", "a", 20, 2),   # consecutive dup -> collapsed
                ("u1", "b", 30, 3),
                ("u1", "a", 40, 4),   # back to 'a' -> NEW version
                ("u2", "x", 5, 5),
            ],
            "k string, attr string, sec long, id long",
        )
        rows = {
            (r["k"], r["version"]): r
            for r in scd2_build(
                log, ["k"], ["attr"], ["sec", "id"], ts_col="sec"
            ).collect()
        }
        assert len(rows) == 4
        v1, v2, v3 = rows[("u1", 1)], rows[("u1", 2)], rows[("u1", 3)]
        assert (v1["attr"], v1["valid_from"], v1["valid_to"]) == ("a", 10, 30)
        assert (v2["attr"], v2["valid_from"], v2["valid_to"]) == ("b", 30, 40)
        assert (v3["attr"], v3["valid_from"], v3["valid_to"]) == ("a", 40, None)
        assert v3["is_current"] == 1 and v1["is_current"] == 0
        assert rows[("u2", 1)]["is_current"] == 1

    def test_null_safe_change_detection(self, spark):
        from recover_spark.operators.merge import scd2_build

        log = spark.createDataFrame(
            [("k", None, 1, 1), ("k", None, 2, 2), ("k", "v", 3, 3)],
            "k string, attr string, sec long, id long",
        )
        out = scd2_build(log, ["k"], ["attr"], ["sec", "id"]).collect()
        # NULL == NULL consecutively -> one version; NULL -> 'v' -> second
        assert len(out) == 2
        assert {r["version"] for r in out} == {1, 2}

    def test_single_exchange_plan(self, spark):
        from recover_spark.operators.merge import scd2_build

        log = spark.range(10000).selectExpr(
            "CAST(id % 50 AS STRING) k",
            "CAST(id % 3 AS STRING) attr",
            "id sec",
            "id id2",
        )
        plan = (
            scd2_build(log, ["k"], ["attr"], ["sec", "id2"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # lag + filter + lead/row_number share one key shuffle
        assert plan.count("Exchange hashpartitioning") == 1


class TestRankMetrics:
    def _frames(self, spark):
        runs = spark.createDataFrame(
            [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
             ("q2", "d9", 1), ("q2", "d8", 2)],
            "query_id string, doc_id string, rank int",
        )
        qrels = spark.createDataFrame(
            [("q1", "d2", 1), ("q1", "d7", 1),   # d7 never retrieved
             ("q2", "d5", 1)],                   # nothing retrieved
            "query_id string, doc_id string, rel int",
        )
        return runs, qrels

    def test_hand_computed_metrics(self, spark):
        import math

        from recover_spark.ops.retrieval import rank_metrics

        runs, qrels = self._frames(spark)
        got = {
            r["query_id"]: r
            for r in rank_metrics(runs, qrels, k=10).collect()
        }
        q1 = got["q1"]
        dcg = 1.0 / math.log2(3)          # hit at rank 2
        idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)  # two labels
        assert q1["n_hits"] == 1
        assert q1["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        assert q1["mrr"] == pytest.approx(0.5, abs=1e-6)
        assert q1["precision"] == pytest.approx(0.1, abs=1e-6)
        assert q1["recall"] == pytest.approx(0.5, abs=1e-6)
        q2 = got["q2"]
        # q2 has a positive label (d5) it never retrieved: idcg > 0
        # but dcg = 0 -> a true zero score, not a NULL
        assert q2["n_hits"] == 0 and q2["mrr"] == 0.0
        assert q2["ndcg"] == 0.0
        assert q2["recall"] == 0.0

    def test_ndcg_null_only_without_labels(self, spark):
        from recover_spark.ops.retrieval import rank_metrics

        runs = spark.createDataFrame(
            [("q3", "d1", 1)], "query_id string, doc_id string, rank int"
        )
        qrels = spark.createDataFrame(
            [], "query_id string, doc_id string, rel int"
        )
        row = rank_metrics(runs, qrels, k=5).collect()[0]
        assert row["ndcg"] is None and row["recall"] is None
        assert row["mrr"] == 0.0 and row["precision"] == 0.0

    def test_rank_cutoff_applied(self, spark):
        from recover_spark.ops.retrieval import rank_metrics

        runs = spark.createDataFrame(
            [("q", "d%d" % i, i) for i in range(1, 21)],
            "query_id string, doc_id string, rank int",
        )
        qrels = spark.createDataFrame(
            [("q", "d15", 1)], "query_id string, doc_id string, rel int"
        )
        row = rank_metrics(runs, qrels, k=10).collect()[0]
        # the only relevant doc sits past the cutoff
        assert row["n_hits"] == 0 and row["ndcg"] == 0.0


class TestPropZtest:
    def test_hand_computed_z(self, spark):
        import math

        from recover_spark.operators.analytics import prop_ztest

        # A: 30/100 converted, B: 20/100
        rows = (
            [("g", 0, True)] * 30 + [("g", 0, False)] * 70
            + [("g", 1, True)] * 20 + [("g", 1, False)] * 80
        )
        df = spark.createDataFrame(rows, "g string, var int, s boolean")
        row = prop_ztest(df, ["g"], "var", "s", 0, 1).collect()[0]
        pa, pb, pool = 0.3, 0.2, 0.25
        z = (pa - pb) / math.sqrt(pool * 0.75 * (1 / 100 + 1 / 100))
        assert (row["n_a"], row["x_a"], row["n_b"], row["x_b"]) == (
            100, 30, 100, 20,
        )
        assert row["rate_a"] == pytest.approx(0.3, abs=1e-6)
        assert row["z_stat"] == pytest.approx(z, abs=1e-6)

    def test_degenerate_all_or_none(self, spark):
        from recover_spark.operators.analytics import prop_ztest

        df = spark.createDataFrame(
            [("g", 0, True)] * 5 + [("g", 1, True)] * 5
            + [("g", 0, None)],
            "g string, var int, s boolean",
        )
        row = prop_ztest(df, ["g"], "var", "s", 0, 1).collect()[0]
        # pooled rate 1.0 -> no variance -> NULL z; NULL excluded
        assert row["z_stat"] is None and row["n_a"] == 5

    def test_single_aggregate_plan(self, spark):
        from recover_spark.operators.analytics import prop_ztest

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 2 AS INT) var",
            "id % 7 = 0 AS s",
        )
        plan = (
            prop_ztest(df, ["g"], "var", "s", 0, 1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestWassersteinGrid:
    def test_golden_disjoint_and_identical(self, spark):
        from recover_spark.quality.drift import (
            wasserstein_grid_from_binned_counts,
        )

        base = spark.createDataFrame(
            [("v", 0, 100), ("v", 1, 0)],
            "column string, bin int, n_base long",
        )
        cur = spark.createDataFrame(
            [("v", 0, 0), ("v", 1, 100)],
            "column string, bin int, n_cur long",
        )
        row = wasserstein_grid_from_binned_counts(
            base, cur, ["v"], 2
        ).collect()[0]
        # CDF gap 1 at bin 0, 0 at the last bin -> mean gap 0.5
        assert row["wasserstein"] == pytest.approx(0.5, abs=1e-9)
        same = wasserstein_grid_from_binned_counts(
            base,
            base.withColumnRenamed("n_base", "n_cur"),
            ["v"],
            2,
        ).collect()[0]
        assert same["wasserstein"] == 0.0

    def test_mean_vs_sup_gap(self, spark):
        from recover_spark.quality.drift import (
            ks_grid_from_binned_counts,
            wasserstein_grid_from_binned_counts,
        )

        # a persistent small shift: every bin's CDF gap is 0.1
        base = spark.createDataFrame(
            [("v", b, 10) for b in range(10)],
            "column string, bin int, n_base long",
        )
        cur = spark.createDataFrame(
            [("v", 0, 20)] + [("v", b, 10) for b in range(1, 9)]
            + [("v", 9, 0)],
            "column string, bin int, n_cur long",
        )
        ks = ks_grid_from_binned_counts(base, cur, ["v"], 10).collect()[0]
        wd = wasserstein_grid_from_binned_counts(
            base, cur, ["v"], 10
        ).collect()[0]
        assert ks["ks_grid"] == pytest.approx(0.1, abs=1e-9)
        # 9 bins at gap 0.1, the last at 0 -> mean 0.09
        assert wd["wasserstein"] == pytest.approx(0.09, abs=1e-9)

    def test_billion_row_counts_and_empty_era(self, spark):
        from recover_spark.quality.drift import (
            wasserstein_grid_from_binned_counts,
        )

        big = 2_000_000_000
        base = spark.createDataFrame(
            [("v", 0, big), ("v", 1, big)],
            "column string, bin int, n_base long",
        )
        cur = spark.createDataFrame(
            [("v", 0, 2 * big), ("v", 1, 0)],
            "column string, bin int, n_cur long",
        )
        row = wasserstein_grid_from_binned_counts(
            base, cur, ["v"], 2
        ).collect()[0]
        assert row["wasserstein"] == pytest.approx(0.25, abs=1e-9)
        empty = spark.createDataFrame(
            [], "column string, bin int, n_cur long"
        )
        deg = wasserstein_grid_from_binned_counts(
            base, empty, ["v"], 2
        ).collect()[0]
        assert deg["wasserstein"] is None


class TestEmbWhiten:
    def test_whitened_scores_unit_variance_uncorrelated(self, spark):
        import statistics

        import __spark_entry__ as entrymod

        df = entrymod.q_emb_whiten(spark, entrymod.SF_SMOKE)
        rows = df.collect()
        cols = [c for c in df.columns if c.startswith("wpc")]
        series = {c: [r[c] for r in rows] for c in cols}
        for c in cols:
            assert statistics.variance(series[c]) == pytest.approx(
                1.0, abs=1e-3
            )
        # distinct principal axes are uncorrelated after whitening
        c01 = statistics.correlation(series["wpc0"], series["wpc1"])
        assert abs(c01) < 1e-3


class TestDegreeAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        from recover_spark.ops.graph import degree_assortativity

        edges = spark.createDataFrame(
            [("hub", "a"), ("hub", "b"), ("hub", "c")],
            "src string, dst string",
        )
        row = degree_assortativity(edges).collect()[0]
        assert row["assortativity"] == pytest.approx(-1.0, abs=1e-6)
        assert row["n_edges"] == 3 and row["n_nodes"] == 4
        assert row["avg_degree"] == pytest.approx(1.5, abs=1e-6)

    def test_regular_graph_null(self, spark):
        from recover_spark.ops.graph import degree_assortativity

        # 4-cycle: every degree 2 -> zero variance -> NULL contract
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
            "src string, dst string",
        )
        row = degree_assortativity(edges).collect()[0]
        assert row["assortativity"] is None
        assert row["n_edges"] == 4

    def test_bidirectional_input_invariant(self, spark):
        from recover_spark.ops.graph import degree_assortativity

        one = [("hub", "a"), ("hub", "b"), ("hub", "c"), ("a", "b")]
        both = one + [(d, s) for s, d in one]
        r1 = degree_assortativity(
            spark.createDataFrame(one, "src string, dst string")
        ).collect()[0]
        r2 = degree_assortativity(
            spark.createDataFrame(both, "src string, dst string")
        ).collect()[0]
        assert r1 == r2

    def test_matches_numpy_pearson(self, spark):
        import random

        from recover_spark.ops.graph import degree_assortativity

        rng = random.Random(7)
        raw = {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(120)
            )
            if a != b
        }
        df = spark.createDataFrame(
            [(f"n{a}", f"n{b}") for a, b in raw], "src string, dst string"
        )
        got = degree_assortativity(df).collect()[0]

        deg: dict = {}
        for a, b in raw:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs, ys = [], []
        for a, b in raw:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        n = len(xs)
        mx = sum(xs) / n
        my = sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
        sx = (sum((x - mx) ** 2 for x in xs) / (n - 1)) ** 0.5
        sy = (sum((y - my) ** 2 for y in ys) / (n - 1)) ** 0.5
        assert got["assortativity"] == pytest.approx(
            cov / (sx * sy), abs=1e-6
        )
        assert got["n_edges"] == len(raw)


class TestWeightedQuantiles:
    def test_golden_weighted_median(self, spark):
        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0)],
            "g string, v double, w double",
        )
        row = weighted_quantiles_by_group(
            df, ["g"], "v", "w", qs=(0.5, 0.75)
        ).collect()[0]
        # cum weights 1, 2, 4 of total 4: q50 crosses at v=2, q75 at v=3
        assert row["w_mean"] == pytest.approx(4.0 / 3, abs=1e-6)
        assert row["n"] == 3
        assert row["q50"] == 2.0
        assert row["q75"] == 3.0

    def test_unit_weights_match_type1_quantile(self, spark):
        import random

        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        rng = random.Random(31)
        vals = [round(rng.uniform(0, 100), 2) for _ in range(257)]
        df = spark.createDataFrame(
            [("g", v, 1.0) for v in vals], "g string, v double, w double"
        )
        row = weighted_quantiles_by_group(
            df, ["g"], "v", "w", qs=(0.25, 0.5, 0.9), buckets=7
        ).collect()[0]
        xs = sorted(vals)
        n = len(xs)
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
            want = xs[math.ceil(q * n) - 1]  # type-1 lower quantile
            assert row[col] == pytest.approx(want, abs=1e-6)

    def test_exclusions_and_guards(self, spark):
        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", None, 5.0), ("g", 9.0, None),
             ("g", 9.0, 0.0), ("g", 9.0, -2.0), ("g", 2.0, 1.0)],
            "g string, v double, w double",
        )
        row = weighted_quantiles_by_group(
            df, ["g"], "v", "w", qs=(1.0,)
        ).collect()[0]
        # only the two unit-weight rows survive the exclusions
        assert row["n"] == 2 and row["w_mean"] == 1.0
        assert row["q100"] == 2.0
        with pytest.raises(ValueError, match="bad qs"):
            weighted_quantiles_by_group(df, ["g"], "v", "w", qs=(0.0,))
        # colliding percent tags must refuse, not emit duplicate cols
        with pytest.raises(ValueError, match="collide"):
            weighted_quantiles_by_group(
                df, ["g"], "v", "w", qs=(0.25, 0.251)
            )

    def test_tie_with_unequal_weights_invariant(self, spark):
        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        # tied values with different weights: whichever copy the sort
        # visits first, the tie block's full weight lands before any
        # larger value — q50 must be 1.0 either way
        df = spark.createDataFrame(
            [("g", 1.0, 5.0), ("g", 1.0, 1.0), ("g", 9.0, 4.0)],
            "g string, v double, w double",
        )
        row = weighted_quantiles_by_group(
            df, ["g"], "v", "w", qs=(0.5,)
        ).collect()[0]
        assert row["q50"] == 1.0

    def test_bucket_decomposed_plan(self, spark):
        from recover_spark.operators.analytics import (
            weighted_quantiles_by_group,
        )

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g",
            "CAST(id % 101 AS DOUBLE) v",
            "CAST(1 + id % 5 AS DOUBLE) w",
        )
        plan = _plan(weighted_quantiles_by_group(df, ["g"], "v", "w"))
        assert "CartesianProduct" not in plan
        assert "__bucket" in plan


class TestZipfFit:
    def test_matches_numpy_loglog_fit(self, spark):
        import numpy as np

        from recover_spark.ops.text_analysis import zipf_fit

        # exact power-law-ish counts: term wII appears max(1, 60//i)x
        freqs = {f"w{i:02d}": max(1, 60 // i) for i in range(1, 31)}
        words = [t for t, f in freqs.items() for _ in range(f)]
        # spread over a few docs; counts are corpus-level
        docs = [
            (d, " ".join(words[d::5])) for d in range(5)
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        row = zipf_fit(df, "text", top_n=30).collect()[0]

        ordered = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        x = np.log10(np.arange(1, len(ordered) + 1, dtype=float))
        y = np.log10(np.array([f for _, f in ordered], dtype=float))
        slope, icept = np.polyfit(x, y, 1)
        pred = icept + slope * x
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert row["n_points"] == 30
        assert row["slope"] == pytest.approx(slope, abs=1e-5)
        assert row["intercept"] == pytest.approx(icept, abs=1e-5)
        assert row["r2"] == pytest.approx(r2, abs=1e-5)

    def test_rank_tiebreak_deterministic(self, spark):
        from recover_spark.ops.text_analysis import zipf_fit

        # all terms tied: ranks come from the term-asc tiebreak, so
        # two runs (and engines) agree on the fit inputs
        df = spark.createDataFrame(
            [(1, "b a c"), (2, "c a b")], "doc_id int, text string"
        )
        r1 = zipf_fit(df, "text", top_n=3).collect()[0]
        r2 = zipf_fit(df, "text", top_n=3).collect()[0]
        assert r1 == r2
        assert r1["slope"] == 0.0  # flat frequencies -> zero slope


class TestUpsertMatview:
    def test_latest_wins_no_regress_and_replay(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_upsert_state,
            read_upsert_matview,
        )

        state = str(tmp_path / "state")
        b1 = spark.createDataFrame(
            [("u1", 10, "a"), ("u2", 20, "b")],
            "k string, sec long, attr string",
        )
        b2 = spark.createDataFrame(
            # u1 newer; u2 LATE (older) — must not regress the state
            [("u1", 15, "a2"), ("u2", 5, "late")],
            "k string, sec long, attr string",
        )
        merge_upsert_state(spark, b1, state, ["k"], ["sec"], batch_id=0)
        merge_upsert_state(spark, b2, state, ["k"], ["sec"], batch_id=1)
        got = {
            r["k"]: (r["sec"], r["attr"])
            for r in read_upsert_matview(spark, state).collect()
        }
        assert got == {"u1": (15, "a2"), "u2": (20, "b")}

        # crash replay with the same batch id: marker short-circuits
        merge_upsert_state(spark, b2, state, ["k"], ["sec"], batch_id=1)
        # and even WITHOUT the marker, latest-wins is idempotent
        merge_upsert_state(spark, b2, state, ["k"], ["sec"])
        got2 = {
            r["k"]: (r["sec"], r["attr"])
            for r in read_upsert_matview(spark, state).collect()
        }
        assert got2 == got


class TestSceneCuts:
    def test_cut_indexing_and_first_frame(self, spark):
        from recover_spark.ops.multimodal import scene_cuts

        frames = spark.createDataFrame(
            [
                ("v1", 0, 0b1111),
                ("v1", 1000, 0b1110),      # distance 1 -> same scene
                ("v1", 2000, 0b0000_0001),  # distance 4 -> cut
                ("v1", 3000, 0b0000_0011),  # distance 1 -> same scene
                ("v2", 0, 0b1010),          # first frame, scene 0
            ],
            "media_id string, frame_ts_ms long, frame_hash long",
        )
        got = {
            (r["media_id"], r["frame_ts_ms"]): r
            for r in scene_cuts(frames, max_distance=3).collect()
        }
        assert got[("v1", 0)]["hash_distance"] is None
        assert got[("v1", 0)]["scene_idx"] == 0
        assert got[("v1", 1000)]["is_cut"] == 0
        assert got[("v1", 2000)]["is_cut"] == 1
        assert got[("v1", 2000)]["scene_idx"] == 1
        assert got[("v1", 3000)]["scene_idx"] == 1
        assert got[("v2", 0)]["scene_idx"] == 0

    def test_single_window_plan(self, spark):
        from recover_spark.ops.multimodal import scene_cuts

        frames = spark.range(1000).selectExpr(
            "CAST(id % 20 AS STRING) media_id",
            "(id / 20) * 1000 AS frame_ts_ms",
            "hash(id) AS frame_hash",
        )
        plan = _plan(scene_cuts(frames))
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan


class TestSilhouette:
    def test_separated_clusters_score_high(self, spark):
        from recover_spark.ops.clustering import silhouette_by_cluster

        # two orthogonal bundles; seeds are ids 0 and 1
        rows = (
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
            + [(i, [1.0, 0.05 * (i % 3), 0.0]) for i in range(2, 12)]
            + [(i, [0.0, 1.0, 0.05 * (i % 3)]) for i in range(12, 22)]
        )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r["cid"]: r
            for r in silhouette_by_cluster(df, n_centroids=2).collect()
        }
        assert set(got) == {0, 1}
        assert got[0]["n"] == 11 and got[1]["n"] == 11
        # orthogonal bundles: own-sim near 1, other-sim near 0 -> s ~ 1
        assert got[0]["mean_silhouette"] > 0.9
        assert got[1]["mean_silhouette"] > 0.9

    def test_matches_numpy_reference(self, spark):
        import random

        import numpy as np

        from recover_spark.ops.clustering import silhouette_by_cluster

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r["cid"]: r["mean_silhouette"]
            for r in silhouette_by_cluster(df, n_centroids=4).collect()
        }
        cents = {i: np.array(v) for i, v in rows[:4]}
        per_cluster: dict = {}
        for _, v in rows:
            x = np.array(v)
            sims = sorted(
                (
                    (float(x @ c) / (np.linalg.norm(x) * np.linalg.norm(c)), cid)
                    for cid, c in cents.items()
                ),
                key=lambda t: (-t[0], t[1]),
            )
            (best, cid), (second, _) = sims[0], sims[1]
            if 1 - second != 0:
                per_cluster.setdefault(cid, []).append(
                    (best - second) / (1 - second)
                )
        for cid, ss in per_cluster.items():
            assert got[cid] == pytest.approx(sum(ss) / len(ss), abs=1e-6)

    def test_k_bounded_no_cartesian_product(self, spark):
        from recover_spark.ops.clustering import silhouette_by_cluster

        df = spark.range(500).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), i -> CAST(hash(id, i) % 100 AS DOUBLE)) AS embedding",
        )
        plan = _plan(silhouette_by_cluster(df, n_centroids=4))
        # the centroid side is a K-row BROADCAST — never a shuffled
        # cartesian
        assert "CartesianProduct" not in plan


class TestConcentrationHhi:
    def test_uniform_single_and_null_levels(self, spark):
        from recover_spark.operators.analytics import concentration_hhi

        df = spark.createDataFrame(
            [("u", "a"), ("u", "b"), ("u", "c"), ("u", "d")]
            + [("mono", "x")] * 5
            + [("nulls", None), ("nulls", None), ("nulls", "y")],
            "g string, cat string",
        )
        got = {
            r["g"]: r for r in concentration_hhi(df, ["g"], "cat").collect()
        }
        # uniform over 4 levels: HHI = 1/4, normalized 0
        assert got["u"]["hhi"] == pytest.approx(0.25, abs=1e-6)
        assert got["u"]["hhi_normalized"] == pytest.approx(0.0, abs=1e-6)
        # one level: HHI 1, normalized NULL (nothing to normalize by)
        assert got["mono"]["hhi"] == 1.0
        assert got["mono"]["hhi_normalized"] is None
        # NULL folds into its own level: shares (2/3, 1/3)
        assert got["nulls"]["k_levels"] == 2
        assert got["nulls"]["hhi"] == pytest.approx(5 / 9, abs=1e-6)

    def test_single_fact_shuffle_plan(self, spark):
        from recover_spark.operators.analytics import concentration_hhi

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 17 AS STRING) cat"
        )
        plan = _plan(concentration_hhi(df, ["g"], "cat"))
        assert "CartesianProduct" not in plan
