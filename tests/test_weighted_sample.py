"""Efraimidis–Spirakis weighted sampling without replacement
(ops/sampling.py:weighted_sample_k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recover_spark.ops.sampling import weighted_sample_k


def _items(spark, n=10, heavy=None, heavy_w=9.0):
    rows = [
        (i, "g" if i % 2 == 0 else "h", heavy_w if i == heavy else 1.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, grp string, w double")


def test_exactly_k_per_group_and_deterministic(spark):
    df = _items(spark, n=40)
    a = weighted_sample_k(df, "id", "w", 5, group_col="grp")
    b = weighted_sample_k(df, "id", "w", 5, group_col="grp")
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb  # replay-stable: no RNG state anywhere
    per_group = {g: 0 for g in ("g", "h")}
    for _, g, _w in ra:
        per_group[g] += 1
    assert per_group == {"g": 5, "h": 5}


def test_global_topk_without_group(spark):
    df = _items(spark, n=30)
    out = weighted_sample_k(df, "id", "w", 7)
    assert out.count() == 7
    assert out.columns == ["id", "grp", "w"]


def test_fewer_rows_than_k_returns_all_positive_weight(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, 2.0)], "id long, w double"
    )
    out = weighted_sample_k(df, "id", "w", 10)
    # non-positive weights can never win a weighted draw -> excluded
    assert sorted(r["id"] for r in out.collect()) == [1, 4]


def test_heavy_weight_wins_proportionally(spark):
    """The defining E-S property, checked coarsely: item with half the
    total weight should win k=1 about half the time across independent
    draws (varying the salt = independent hash streams)."""
    df = _items(spark, n=10, heavy=3, heavy_w=9.0)  # 9 of 18 total
    wins = 0
    for s in range(30):
        got = weighted_sample_k(df, "id", "w", 1, salt=f"t{s}").collect()
        wins += got[0]["id"] == 3
    assert 8 <= wins <= 25, f"heavy item won {wins}/30 draws"


def test_invalid_k_rejected(spark):
    df = _items(spark)
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_k(df, "id", "w", 0)


class TestTokenBudgetMix:
    """token_budget_mix (ops/sampling.py): deterministic per-source
    token-budget filling in portable-hash order."""

    def _docs(self, spark, n=120):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "web")
            .when(F.col("id") % 3 == 1, "code")
            .otherwise("books")
            .alias("source"),
            (F.col("id") % 7 + 1).cast("bigint").alias("n_tokens"),
        )

    def test_matches_naive_single_window_and_boundary_rule(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from recover_spark.functions.hashing import portable_hash64
        from recover_spark.ops.sampling import token_budget_mix

        docs = self._docs(spark)
        budgets = {"web": 50, "code": 23, "books": 0}
        got = token_budget_mix(
            docs, "doc_id", "source", "n_tokens", budgets
        )
        # naive reference: one window per source (identical result by
        # prefix-sum associativity)
        h = portable_hash64(F.col("doc_id"), salt="budget")
        w = (
            Window.partitionBy("source")
            .orderBy(h.asc(), F.col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        bmap = F.create_map(
            *[x for s, b in budgets.items() for x in (F.lit(s), F.lit(b))]
        )[F.col("source")]
        want = (
            docs.withColumn(
                "tokens_before",
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
            )
            .filter(F.col("tokens_before") < bmap)
        )
        g = {(r["doc_id"], r["tokens_before"]) for r in got.collect()}
        e = {(r["doc_id"], r["tokens_before"]) for r in want.collect()}
        assert g == e and len(g) > 0
        # boundary rule: kept sum is the smallest hash-order prefix
        # >= budget (first crosser included); budget 0 keeps nothing
        kept = got.groupBy("source").agg(
            F.sum("n_tokens").alias("s"), F.max("tokens_before").alias("mb")
        ).collect()
        by = {r["source"]: r for r in kept}
        assert "books" not in by
        for s in ("web", "code"):
            assert by[s]["s"] >= budgets[s]          # budget reached
            assert by[s]["mb"] < budgets[s]          # last kept started under
            # minimal prefix: dropping the largest-hash kept doc dips
            # under budget again
            assert by[s]["s"] - budgets[s] < 7       # overshoot < max doc

    def test_deterministic_under_repartition_and_unknown_source_drop(
        self, spark
    ):
        from recover_spark.ops.sampling import token_budget_mix

        docs = self._docs(spark, 90)
        extra = spark.createDataFrame(
            [("x1", "mystery", 5)], "doc_id string, source string, n_tokens long"
        )
        docs = docs.unionByName(extra)
        a = token_budget_mix(
            docs, "doc_id", "source", "n_tokens", {"web": 30, "code": 30}
        )
        b = token_budget_mix(
            docs.repartition(13), "doc_id", "source", "n_tokens",
            {"web": 30, "code": 30},
        )
        ga = sorted(r["doc_id"] for r in a.collect())
        gb = sorted(r["doc_id"] for r in b.collect())
        assert ga == gb
        assert not any(d == "x1" for d in ga)  # unknown source dropped

    def test_power_of_two_guard_and_plan(self, spark):
        import pytest as _pytest

        from recover_spark.ops.sampling import token_budget_mix

        docs = self._docs(spark)
        with _pytest.raises(ValueError, match="power of two"):
            token_budget_mix(
                docs, "doc_id", "source", "n_tokens", {"web": 5},
                offset_buckets=100,
            )
        plan = (
            token_budget_mix(docs, "doc_id", "source", "n_tokens", {"web": 5})
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the local cumsum window keys on (source, hash-bucket) — a
        # whole source never collapses into one partition
        assert "__hb" in plan
        assert "CartesianProduct" not in plan
