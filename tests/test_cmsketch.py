"""Count-min sketch (ops/cmsketch.py + streaming/matview.py CM
matview): overestimate-only guarantee, absent keys, stream==batch,
replay idempotence, merge order independence."""

from __future__ import annotations

import pyspark.sql.functions as F

from recover_spark.ops.cmsketch import cm_build, cm_estimate


def _facts(spark, n=5000, mod=97):
    return spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % mod).alias("v"),
    )


def test_never_underestimates_and_exact_on_wide_sketch(spark):
    df = _facts(spark)
    q = df.select("g", "v").distinct()
    exact = {
        (r["g"], r["v"]): r["n"]
        for r in df.groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # narrow sketch: may collide, must never undercount
    est = cm_estimate(
        cm_build(df, ["g"], "v", depth=4, width=32), q, ["g"], "v", 4, 32
    )
    for r in est.collect():
        assert r["cm_count"] >= exact[(r["g"], r["v"])]
    # wide sketch (width >> keys): every estimate exact w.h.p. for
    # this fixed deterministic hash family — assert equality holds
    est_w = cm_estimate(
        cm_build(df, ["g"], "v", depth=4, width=4096),
        q, ["g"], "v", 4, 4096,
    )
    exact_hits = sum(
        r["cm_count"] == exact[(r["g"], r["v"])] for r in est_w.collect()
    )
    assert exact_hits == len(exact)


def test_absent_key_estimates_zero_or_collision(spark):
    df = _facts(spark, n=300, mod=10)  # values 0..9 only
    q = spark.createDataFrame(
        [("0", 999_999)], "g string, v long"
    )
    (r,) = cm_estimate(
        cm_build(df, ["g"], "v", depth=4, width=1024),
        q, ["g"], "v", 4, 1024,
    ).collect()
    assert r["cm_count"] == 0  # 10 keys into 1024 cells: no collision


def test_stream_equals_batch_and_replay_idempotent(spark, tmp_path):
    from recover_spark.streaming.matview import (
        maintain_cm_matview,
        read_cm_matview,
    )

    df = _facts(spark, n=8000, mod=53)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q1 = maintain_cm_matview(
        stream, state, str(tmp_path / "ckpt"), ["g"], "v",
        depth=4, width=64,
    )
    q1.awaitTermination(120)
    queries = df.select("g", "v").distinct()
    streamed = {
        (r["g"], r["v"]): r["cm_count"]
        for r in read_cm_matview(
            spark, state, queries, ["g"], "v", 4, 64
        ).collect()
    }
    batch = {
        (r["g"], r["v"]): r["cm_count"]
        for r in cm_estimate(
            cm_build(df, ["g"], "v", 4, 64), queries, ["g"], "v", 4, 64
        ).collect()
    }
    assert streamed == batch
    # replaying the same batch id is skipped by the sidecar
    from recover_spark.streaming.matview import merge_counts  # noqa: F401
    from recover_spark.ops.cmsketch import cm_cell

    cells = df.select(
        "g",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cm_cell(F.col("v"), i, 64).alias("col"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("g", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    merge_counts(spark, cells, state, ["g", "row", "col"], None, 0)
    again = {
        (r["g"], r["v"]): r["cm_count"]
        for r in read_cm_matview(
            spark, state, queries, ["g"], "v", 4, 64
        ).collect()
    }
    assert again == streamed


def test_build_is_one_aggregate(spark):
    df = _facts(spark)
    state = cm_build(df, ["g"], "v", depth=4, width=64)
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # bounded state: at most groups x depth x width rows
    assert state.count() <= 3 * 4 * 64
