"""Bucketed-table layout: exchange-free joins, trusted sort order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recover_spark.sources.bucketed import colocated_join, write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        (F.col("id") * 3 % 100).cast("double").alias("o_total"),
    )
    lines = (
        spark.range(0, 6000)
        .select(
            (F.col("id") % 2000).alias("l_orderkey"),
            (F.col("id") % 5).alias("l_linenumber"),
            (F.col("id") % 50).cast("double").alias("l_qty"),
        )
    )
    for name in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(
        orders, "t_orders_b", ["o_orderkey"], 8, path=str(root / "orders")
    )
    write_bucketed_table(
        lines, "t_lines_b", ["l_orderkey"], 8, path=str(root / "lines")
    )
    yield orders, lines
    for name in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_one_file_per_bucket(spark, bucketed_pair):
    import glob
    import re

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED t_orders_b")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    files = glob.glob(loc.removeprefix("file:") + "/*.parquet")
    # one data file per bucket, bucket ids 0..7 each exactly once
    ids = sorted(
        int(re.search(r"_(\d{5})(?:\.|_)", f.rsplit("/", 1)[1]).group(1))
        for f in files
    )
    assert ids == list(range(8))


def test_colocated_join_no_exchange(spark, bucketed_pair):
    df = spark.table("t_lines_b").hint("merge").join(
        spark.table("t_orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # The written per-bucket sort order is only trusted behind the
    # legacy flag (since Spark 3.0); with it on and one file per
    # bucket, the local Sorts disappear too and the join is a pure
    # zipped merge of co-located files.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        df2 = spark.table("t_lines_b").hint("merge").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
        assert "Sort " not in plan2.replace("SortMergeJoin", "SMJ"), plan2
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_colocated_join_values(spark, bucketed_pair):
    orders, lines = bucketed_pair
    via_buckets = (
        spark.table("t_lines_b")
        .hint("merge")
        .join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("l_qty").alias("qty"))
    )
    plain = (
        lines.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_qty").alias("qty"))
    )
    assert sorted(map(tuple, via_buckets.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_colocated_join_helper_named_key(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_named")
    left = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("a")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b")
    )
    for name in ("t_bk_l", "t_bk_r"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(left, "t_bk_l", ["k"], 4, path=str(root / "l"))
    write_bucketed_table(right, "t_bk_r", ["k"], 4, path=str(root / "r"))
    df = colocated_join(spark, "t_bk_l", "t_bk_r", on="k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Exchange" not in plan
    assert df.count() == 500
    for name in ("t_bk_l", "t_bk_r"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
