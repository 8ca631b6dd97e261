"""Deterministic training-shard export (ops/sampling.py:
shard_assignment / export_training_shards): seeded md5 permutation,
fixed shard sizes, replay determinism, loader-order file layout, and
the no-global-sort plan contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _docs(spark, n=500):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") < n)
    )


class TestShardAssignment:
    def test_fixed_shard_sizes_and_dense_positions(self, spark):
        from recover_spark.ops.sampling import shard_assignment

        out = shard_assignment(_docs(spark), "doc_id", 16).collect()
        n = len(out)
        by_shard: dict = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
        full, last = divmod(n, 16)
        assert sorted(by_shard) == list(range(full + (1 if last else 0)))
        for s, poss in by_shard.items():
            expect = 16 if s < full else last
            assert len(poss) == expect
            assert sorted(poss) == list(range(expect))
        # row_id is a permutation of 1..n
        assert sorted(r["row_id"] for r in out) == list(range(1, n + 1))

    def test_deterministic_across_runs_and_partitionings(self, spark):
        from recover_spark.ops.sampling import shard_assignment

        a = {
            r["doc_id"]: (r["row_id"], r["shard"], r["pos_in_shard"])
            for r in shard_assignment(_docs(spark), "doc_id", 16).collect()
        }
        b = {
            r["doc_id"]: (r["row_id"], r["shard"], r["pos_in_shard"])
            for r in shard_assignment(
                _docs(spark).repartition(13), "doc_id", 16
            ).collect()
        }
        assert a == b

    def test_matches_naive_global_window(self, spark):
        """Bucket-decomposed rank == row_number() OVER (ORDER BY h, key)."""
        from pyspark.sql import Window

        from recover_spark.functions.hashing import portable_hash64
        from recover_spark.ops.sampling import shard_assignment

        docs = _docs(spark, 300)
        naive = docs.withColumn(
            "__h", portable_hash64(F.col("doc_id"), salt="shard")
        ).withColumn(
            "row_id",
            F.row_number().over(Window.orderBy("__h", "doc_id")),
        )
        want = {r["doc_id"]: r["row_id"] for r in naive.collect()}
        got = {
            r["doc_id"]: r["row_id"]
            for r in shard_assignment(docs, "doc_id", 32).collect()
        }
        assert got == want

    def test_salt_changes_permutation(self, spark):
        from recover_spark.ops.sampling import shard_assignment

        docs = _docs(spark, 200)
        a = {
            r["doc_id"]: r["row_id"]
            for r in shard_assignment(docs, "doc_id", 16, salt="s1").collect()
        }
        b = {
            r["doc_id"]: r["row_id"]
            for r in shard_assignment(docs, "doc_id", 16, salt="s2").collect()
        }
        assert a != b
        assert sorted(a.values()) == sorted(b.values())

    def test_guards(self, spark):
        import pytest

        from recover_spark.ops.sampling import shard_assignment

        with pytest.raises(ValueError, match="rows_per_shard"):
            shard_assignment(_docs(spark), "doc_id", 0)
        with pytest.raises(ValueError, match="power of two"):
            shard_assignment(_docs(spark), "doc_id", 16, offset_buckets=100)

    def test_no_single_partition_global_sort_in_plan(self, spark):
        """The data path must not contain a 1-partition global-order
        exchange: ranks ride the bucket-keyed window."""
        from recover_spark.ops.sampling import shard_assignment

        plan = shard_assignment(
            _docs(spark), "doc_id", 16
        )._jdf.queryExecution().executedPlan().toString()
        # the offsets side frame (256 rows max) may single-partition;
        # the row-level window must partition by the bucket
        assert "hashpartitioning(__hb" in plan


class TestExportTrainingShards:
    def test_layout_one_file_per_shard_in_permutation_order(
        self, spark, tmp_path
    ):
        from recover_spark.ops.sampling import export_training_shards

        path = str(tmp_path / "shards")
        assigned = export_training_shards(
            _docs(spark, 100), path, "doc_id", rows_per_shard=16
        )
        want = {
            r["shard"]: [
                x["doc_id"]
                for x in sorted(
                    [q for q in assigned.collect() if q["shard"] == r["shard"]],
                    key=lambda q: q["pos_in_shard"],
                )
            ]
            for r in assigned.select("shard").distinct().collect()
        }
        shard_dirs = sorted(
            d for d in os.listdir(path) if d.startswith("shard=")
        )
        assert len(shard_dirs) == len(want)
        for d in shard_dirs:
            s = int(d.split("=")[1])
            files = [
                f
                for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1  # one task -> one file per shard
            got = [
                r["doc_id"]
                for r in spark.read.parquet(
                    os.path.join(path, d, files[0])
                ).collect()
            ]
            assert got == want[s]  # file row order replays the permutation

    def test_re_export_identical(self, spark, tmp_path):
        from recover_spark.ops.sampling import export_training_shards

        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        export_training_shards(_docs(spark, 100), p1, "doc_id", 16)
        export_training_shards(
            _docs(spark, 100).repartition(7), p2, "doc_id", 16
        )
        r1 = sorted(
            tuple(r)
            for r in spark.read.parquet(p1).select("doc_id", "shard").collect()
        )
        r2 = sorted(
            tuple(r)
            for r in spark.read.parquet(p2).select("doc_id", "shard").collect()
        )
        assert r1 == r2
