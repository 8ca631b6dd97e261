"""Repeat-capped mixture allocation (ops/sampling.py:epoch_capped_mix)
and curriculum ordering (curriculum_order): fixpoint semantics against
a hand-computed plan, budget/cap invariants, determinism across
partitionings, and the stage/shuffle contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _toks(spark, sf="sf0.001"):
    docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9']+"), lambda t: t != ""
    )
    return docs.select(
        "doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens")
    )


WEIGHTS = {"src0": 50, "src1": 20, "src2": 15, "src3": 10, "src4": 5}


class TestEpochCappedMix:
    def test_fixpoint_matches_reference_python(self, spark):
        from recover_spark.ops.sampling import epoch_capped_mix

        toks = _toks(spark)
        avail = {
            r["source"]: r["a"]
            for r in toks.filter(F.col("source").isin(*WEIGHTS))
            .groupBy("source")
            .agg(F.sum("n_tokens").alias("a"))
            .collect()
        }
        # independent reference fixpoint (same published semantics,
        # written blind against the implementation)
        budget, cap_mult = 12_000, 2
        cap = {s: cap_mult * avail[s] for s in WEIGHTS}
        alloc: dict[str, int] = {}
        b_rem, open_s = budget, set(WEIGHTS)
        while open_s:
            w_sum = sum(WEIGHTS[s] for s in open_s)
            tent = {s: (b_rem * WEIGHTS[s]) // w_sum for s in open_s}
            newly = {s for s in open_s if tent[s] >= cap[s]}
            if not newly:
                alloc.update(tent)
                break
            for s in newly:
                alloc[s] = cap[s]
                b_rem -= cap[s]
            open_s -= newly
        out = {
            r["source"]: r
            for r in epoch_capped_mix(
                toks, "source", "n_tokens", WEIGHTS, budget,
                max_epochs_num=cap_mult,
            ).collect()
        }
        assert set(out) == set(WEIGHTS)
        for s, r in out.items():
            assert r["available_tokens"] == avail[s]
            assert r["cap_tokens"] == cap[s]
            assert r["alloc_tokens"] == alloc[s]
            assert r["capped"] == (alloc[s] == cap[s])

    def test_budget_and_cap_invariants(self, spark):
        from recover_spark.ops.sampling import epoch_capped_mix

        rows = epoch_capped_mix(
            _toks(spark), "source", "n_tokens", WEIGHTS, 12_000,
            max_epochs_num=2,
        ).collect()
        total = sum(r["alloc_tokens"] for r in rows)
        assert total <= 12_000  # never over-allocates
        for r in rows:
            assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
            assert r["round_finalized"] >= 1
            # epochs never exceeds the cap ratio
            assert r["epochs"] <= 2.0 + 1e-6

    def test_no_capping_single_round(self, spark):
        from recover_spark.ops.sampling import epoch_capped_mix

        rows = epoch_capped_mix(
            _toks(spark), "source", "n_tokens", WEIGHTS, 100,
            max_epochs_num=2,
        ).collect()
        assert all(r["round_finalized"] == 1 for r in rows)
        assert not any(r["capped"] for r in rows)

    def test_all_capped_leaves_budget(self, spark):
        from recover_spark.ops.sampling import epoch_capped_mix

        rows = epoch_capped_mix(
            _toks(spark), "source", "n_tokens", WEIGHTS, 10_000_000,
            max_epochs_num=1,
        ).collect()
        assert all(r["capped"] for r in rows)
        assert all(r["alloc_tokens"] == r["available_tokens"] for r in rows)

    def test_guards(self, spark):
        from recover_spark.ops.sampling import epoch_capped_mix

        toks = _toks(spark)
        with pytest.raises(ValueError, match="weights"):
            epoch_capped_mix(toks, "source", "n_tokens", {"src0": 0}, 10)
        with pytest.raises(ValueError, match="budget"):
            epoch_capped_mix(toks, "source", "n_tokens", WEIGHTS, -1)
        with pytest.raises(ValueError, match="max_sources"):
            epoch_capped_mix(
                toks, "source", "n_tokens", WEIGHTS, 10, max_sources=2
            )


class TestCurriculumOrder:
    def test_stages_and_rank_contract(self, spark):
        from recover_spark.ops.sampling import curriculum_order

        rows = curriculum_order(
            _toks(spark), "doc_id", "n_tokens", n_stages=4
        ).collect()
        n = len(rows)
        assert sorted(r["curriculum_rank"] for r in rows) == list(
            range(1, n + 1)
        )
        # stage sizes match the exact ntile formula
        from collections import Counter

        sizes = Counter(r["stage"] for r in rows)
        expect = Counter(1 + (i * 4) // n for i in range(n))
        assert sizes == expect
        # stages are difficulty-monotone: every doc in stage k is <= every
        # doc in stage k+2 (adjacent stages may share a tie boundary)
        max_d = {s: max(r["difficulty"] for r in rows if r["stage"] == s)
                 for s in sizes}
        min_d = {s: min(r["difficulty"] for r in rows if r["stage"] == s)
                 for s in sizes}
        for s in range(1, 4):
            assert max_d[s] <= min_d[s + 1] or max_d[s] <= max_d[s + 1]
        # curriculum_rank orders by stage first
        by_rank = sorted(rows, key=lambda r: r["curriculum_rank"])
        stages_seq = [r["stage"] for r in by_rank]
        assert stages_seq == sorted(stages_seq)

    def test_within_stage_shuffled_not_difficulty_sorted(self, spark):
        from recover_spark.ops.sampling import curriculum_order

        rows = curriculum_order(
            _toks(spark), "doc_id", "n_tokens", n_stages=4
        ).collect()
        stage1 = sorted(
            (r for r in rows if r["stage"] == 1),
            key=lambda r: r["curriculum_rank"],
        )
        diffs = [r["difficulty"] for r in stage1]
        assert diffs != sorted(diffs)  # hash shuffle, not difficulty order

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.ops.sampling import curriculum_order

        toks = _toks(spark)
        a = curriculum_order(toks, "doc_id", "n_tokens").collect()
        b = curriculum_order(
            toks.repartition(7), "doc_id", "n_tokens"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_guard(self, spark):
        from recover_spark.ops.sampling import curriculum_order

        with pytest.raises(ValueError, match="n_stages"):
            curriculum_order(_toks(spark), "doc_id", "n_tokens", n_stages=0)


class TestApplyEpochPlan:
    def test_multiset_matches_plan(self, spark):
        from recover_spark.ops.sampling import apply_epoch_plan, epoch_capped_mix

        toks = _toks(spark)
        plan = {
            r["source"]: r
            for r in epoch_capped_mix(
                toks, "source", "n_tokens", WEIGHTS, 12_000, max_epochs_num=2
            ).collect()
        }
        rows = apply_epoch_plan(
            toks, "doc_id", "source", "n_tokens", WEIGHTS, 12_000,
            max_epochs_num=2,
        ).collect()
        by_src: dict = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for s, rs in by_src.items():
            full = plan[s]["alloc_tokens"] // plan[s]["available_tokens"]
            rem = plan[s]["alloc_tokens"] % plan[s]["available_tokens"]
            # every copy count is full or full+1
            assert set(r["n_copies"] for r in rs) <= {full, full + 1} - {0}
            # kept token mass hits the allocation to within one boundary doc
            kept = sum(r["n_copies"] * r["n_tokens"] for r in rs)
            max_doc = max(r["n_tokens"] for r in rs)
            assert plan[s]["alloc_tokens"] - max_doc <= kept
            assert kept <= plan[s]["alloc_tokens"] + max_doc
            # remainder prefix kept iff rem > 0
            n_extra = sum(1 for r in rs if r["n_copies"] == full + 1)
            assert (n_extra > 0) == (rem > 0)

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.ops.sampling import apply_epoch_plan

        toks = _toks(spark)
        a = apply_epoch_plan(
            toks, "doc_id", "source", "n_tokens", WEIGHTS, 12_000,
            max_epochs_num=2,
        ).collect()
        b = apply_epoch_plan(
            toks.repartition(5), "doc_id", "source", "n_tokens", WEIGHTS,
            12_000, max_epochs_num=2,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_zero_pass_source_only_prefix_survives(self, spark):
        from recover_spark.ops.sampling import apply_epoch_plan

        # tiny budget: no source completes a pass; only remainder
        # prefixes appear, all with n_copies == 1
        rows = apply_epoch_plan(
            _toks(spark), "doc_id", "source", "n_tokens", WEIGHTS, 300,
            max_epochs_num=2,
        ).collect()
        assert rows and all(r["n_copies"] == 1 for r in rows)
