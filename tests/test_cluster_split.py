"""cluster_split (ops/sampling.py): leakage-safe train/eval split at
duplicate-cluster grain.

THE property: no cluster ever spans splits — near-duplicates cannot
straddle train and test.  Plus determinism across partitionings and
the NULL-cluster guard.
"""

import pytest
from pyspark.sql import functions as F


def _fixture(spark, n_items=2000, n_clusters=137):
    # many members per cluster, ids deliberately non-contiguous
    return spark.range(n_items).selectExpr(
        "id AS item_id", f"(id % {n_clusters}) * 7919 AS cluster"
    )


class TestClusterSplit:
    def test_no_cluster_spans_splits(self, spark):
        from recover_spark.ops import cluster_split

        out = cluster_split(
            _fixture(spark), "cluster",
            {"train": 0.8, "valid": 0.1, "test": 0.1},
        )
        spans = (
            out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert spans == 0

    def test_fractions_roughly_honored_at_cluster_grain(self, spark):
        from recover_spark.ops import cluster_split

        out = cluster_split(
            _fixture(spark, n_items=4000, n_clusters=400),
            "cluster",
            {"train": 0.8, "test": 0.2},
        )
        by = {
            r["split"]: r["n"]
            for r in out.select("cluster", "split")
            .distinct()
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        frac = by.get("train", 0) / 400
        assert 0.7 < frac < 0.9  # binomial(400, 0.8) stays well inside

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.ops import cluster_split

        base = _fixture(spark)
        a = cluster_split(base.repartition(32), "cluster", {"train": 0.5})
        b = cluster_split(base.coalesce(1), "cluster", {"train": 0.5})
        assert (
            a.join(b.withColumnRenamed("split", "split_b"), "item_id")
            .filter(F.col("split") != F.col("split_b"))
            .count()
            == 0
        )

    def test_null_cluster_raises(self, spark):
        from pyspark.errors import SparkRuntimeException

        from recover_spark.ops import cluster_split

        df = spark.createDataFrame(
            [(1, None)], "item_id long, cluster long"
        )
        # two splits so the hash expression is actually evaluated (a
        # single split compiles to a literal and never touches it)
        with pytest.raises(SparkRuntimeException, match="NULL cluster"):
            cluster_split(
                df, "cluster", {"train": 0.5, "test": 0.5}
            ).collect()

    def test_map_side_no_shuffle(self, spark):
        from recover_spark.ops import cluster_split

        plan = (
            cluster_split(_fixture(spark), "cluster", {"train": 0.5})
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_semantic_pipeline_property_end_to_end(self, spark):
        # the real composition the query runs: semantic clusters ->
        # split; re-assert the property on the pipeline output
        import __spark_entry__ as entrymod

        out = entrymod.q_dedup_cluster_split(
            spark, "/root/testdata/sf0.001"
        )
        rows = out.collect()
        assert len(rows) > 0
        seen: dict = {}
        for r in rows:
            prev = seen.setdefault(r["cluster"], r["split"])
            assert prev == r["split"]
