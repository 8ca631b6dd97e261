"""Step-level profiler for the expensive lifecycle constructs.

Re-runs a construct with per-step wall timers (and job descriptions so
the SQL tab stays readable), printing a breakdown.  Used to decide
WHERE inside a 10-30 s construct the time goes before touching any
operator (guide section 1: measure first).

Usage: python tools/profile_steps.py <target> [sf_dir]
Targets: ann_maint, drift, expectations, emb_drift
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from recover_spark.session import get_spark  # noqa: E402


class T:
    def __init__(self):
        self.t0 = time.time()
        self.rows = []

    def lap(self, label):
        t = time.time()
        self.rows.append((label, t - self.t0))
        self.t0 = t

    def report(self):
        total = sum(d for _, d in self.rows)
        for label, d in self.rows:
            print(f"{d:8.3f}s  {label}")
        print(f"{total:8.3f}s  TOTAL")


def profile_ann_maint(spark, sf_dir):
    import shutil
    import tempfile

    from recover_spark.ops.similarity import (
        append_ivf_index,
        append_pq_sidecar,
        build_ivf_index,
        build_pq_sidecar,
        compact_ivf_index,
        rebuild_ivf_index,
    )

    t = T()
    emb = entrymod._load(spark, sf_dir, "embeddings")
    n = emb.count()
    t.lap("emb.count()")
    half, q3 = n // 2, (3 * n) // 4
    root = tempfile.mkdtemp(prefix="prof_ann_")
    idx = f"{root}/ivf"
    build_ivf_index(emb.filter(F.col("vec_id") < half), idx, n_centroids=8)
    t.lap("build_ivf_index(first half)")
    build_pq_sidecar(spark, idx)
    t.lap("build_pq_sidecar")
    wave1 = emb.filter((F.col("vec_id") >= half) & (F.col("vec_id") < q3))
    wave2 = emb.filter(F.col("vec_id") >= q3)
    append_ivf_index(wave1, idx)
    t.lap("append_ivf_index(wave1)")
    append_pq_sidecar(spark, wave1, idx)
    t.lap("append_pq_sidecar(wave1)")
    append_ivf_index(wave2, idx)
    t.lap("append_ivf_index(wave2)")
    append_pq_sidecar(spark, wave2, idx)
    t.lap("append_pq_sidecar(wave2)")
    pq_idx = f"{root}/ivf_pq"
    shutil.copytree(idx, pq_idx)
    t.lap("copytree snapshot")
    compact_ivf_index(spark, idx)
    t.lap("compact_ivf_index")
    rebuild_ivf_index(spark, idx)
    t.lap("rebuild_ivf_index")
    t.report()
    shutil.rmtree(root)


def profile_drift(spark, sf_dir):
    import uuid

    from recover_spark.streaming.drift import (
        freeze_drift_baseline,
        maintain_drift_matview,
    )

    t = T()
    run_dir = f"/tmp/prof_drift_{uuid.uuid4().hex}"
    lineitem = entrymod._load(spark, sf_dir, "lineitem")
    cut = "1998-06-01"
    cols = entrymod._DRIFT_SHARED_COLS
    base = lineitem.filter(F.col("l_shipdate") < F.lit(cut)).select(*cols)
    cur = lineitem.filter(F.col("l_shipdate") >= F.lit(cut)).select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    freeze_drift_baseline(
        base, f"{run_dir}/state", cols, n_bins=10, edge_accuracy=None
    )
    t.lap("freeze_drift_baseline")
    src = f"{run_dir}/src"
    cur.repartition(4).write.mode("overwrite").parquet(src)
    t.lap("write stream source (4 files)")
    stream = (
        spark.readStream.schema(", ".join(f"{c} double" for c in cols))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_drift_matview(stream, f"{run_dir}/state", f"{run_dir}/ckpt")
    q.awaitTermination(300)
    t.lap("4-batch stream fold")
    t.report()


def profile_expectations(spark, sf_dir):
    import uuid

    from recover_spark.streaming.expectations import (
        freeze_expectation_suite,
        maintain_expectations_matview,
    )

    t = T()
    run_dir = f"/tmp/prof_exp_{uuid.uuid4().hex}"
    events = entrymod._load(spark, sf_dir, "events").select(
        "event_type", "ts", "value",
        F.col("props").cast("string").alias("props"),
    )
    suite = {
        "expectations": [
            {"expectation_type": "expect_column_to_exist",
             "kwargs": {"column": "props"}},
            {"expectation_type": "expect_column_to_exist",
             "kwargs": {"column": "bogus"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "value", "min_value": 0, "max_value": 95}},
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "ts"}},
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "event_type",
                        "value_set": ["click", "view", "purchase", "signup"]}},
            {"expectation_type": "expect_column_value_lengths_to_be_between",
             "kwargs": {"column": "event_type", "min_value": 4, "max_value": 7}},
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1, "max_value": 100000000}},
        ]
    }
    freeze_expectation_suite(f"{run_dir}/state", suite)
    t.lap("freeze suite")
    src = f"{run_dir}/src"
    events.repartition(4).write.mode("overwrite").parquet(src)
    t.lap("write stream source")
    stream = (
        spark.readStream.schema(
            "event_type string, ts timestamp, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_expectations_matview(
        stream, f"{run_dir}/state", f"{run_dir}/ckpt"
    )
    q.awaitTermination(300)
    t.lap("4-batch stream fold")
    t.report()


def profile_emb_drift(spark, sf_dir):
    import uuid

    from recover_spark.streaming.matview import maintain_vector_matview

    t = T()
    run_dir = f"/tmp/prof_embd_{uuid.uuid4().hex}"
    src = f"{run_dir}/src"
    emb = entrymod._load(spark, sf_dir, "embeddings").select(
        "label",
        F.pmod(F.col("vec_id"), F.lit(2)).cast("int").alias("era"),
        F.col("embedding"),
    )
    emb.repartition(4).write.mode("overwrite").parquet(src)
    t.lap("write stream source")
    stream = (
        spark.readStream.schema("label int, era int, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_vector_matview(
        stream, f"{run_dir}/state", f"{run_dir}/ckpt",
        ["label", "era"], "embedding", 64,
    )
    q.awaitTermination(300)
    t.lap("4-batch stream fold")
    t.report()


TARGETS = {
    "ann_maint": profile_ann_maint,
    "drift": profile_drift,
    "expectations": profile_expectations,
    "emb_drift": profile_emb_drift,
}


def main():
    target = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile_steps")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/Python workers so the profile reflects steady state,
    # the same convention as the bench warm-up.
    entrymod._load(spark, sf_dir, "embeddings").count()
    entrymod._load(spark, sf_dir, "lineitem").count()
    TARGETS[target](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
