"""End-to-end incremental pipeline twin (VERDICT r4 item 6).

The full reference flow — ingest -> W1 keyed-latest dedup -> J1
anti-delete -> relationalize — maintained incrementally over multi-batch
file arrivals must produce EXACTLY the one-shot batch pipeline's output
over the same files, including after an at-least-once mid-stream replay
of a batch.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("RecordID", T.StringType()),
        T.StructField("InsertedDate", T.StringType()),
        T.StructField("export_end_date", T.StringType()),
        T.StructField("cohort", T.StringType()),
        T.StructField(
            "Samples",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ts", T.StringType()),
                        T.StructField("v", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)

F1 = [
    {"RecordID": "r1", "InsertedDate": "2024-01-01", "export_end_date": "2024-01-07",
     "cohort": "adults_v1", "Samples": [{"ts": "t1", "v": 1.0}, {"ts": "t2", "v": 2.0}]},
    {"RecordID": "r2", "InsertedDate": "2024-01-01", "export_end_date": "2024-01-07",
     "cohort": "adults_v1", "Samples": [{"ts": "t1", "v": 3.0}]},
    {"RecordID": "r3", "InsertedDate": "2024-01-01", "export_end_date": "2024-01-07",
     "cohort": "pediatric_v1", "Samples": [{"ts": "t1", "v": 4.0}]},
]
F2 = [
    # newer version of r2 must win over f1's
    {"RecordID": "r2", "InsertedDate": "2024-01-08", "export_end_date": "2024-01-14",
     "cohort": "adults_v1", "Samples": [{"ts": "t9", "v": 30.0}]},
    # exact duplicate of r3 (replayed export): collapses to one row
    {"RecordID": "r3", "InsertedDate": "2024-01-01", "export_end_date": "2024-01-07",
     "cohort": "pediatric_v1", "Samples": [{"ts": "t1", "v": 4.0}]},
    {"RecordID": "r4", "InsertedDate": "2024-01-08", "export_end_date": "2024-01-14",
     "cohort": "adults_v1", "Samples": [{"ts": "t1", "v": 5.0}]},
]
F3 = [
    # newer version of r1
    {"RecordID": "r1", "InsertedDate": "2024-01-15", "export_end_date": "2024-01-21",
     "cohort": "adults_v1", "Samples": [{"ts": "t5", "v": 10.0}]},
    {"RecordID": "r5", "InsertedDate": "2024-01-15", "export_end_date": "2024-01-21",
     "cohort": "pediatric_v1", "Samples": []},
]


def _write_file(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _deleted(spark):
    return spark.createDataFrame([("r4",)], "RecordID string")


def _canon(df):
    """Order- and column-order-insensitive canonical form."""
    cols = sorted(df.columns)
    return sorted(df.select(*cols).toJSON().collect())


def _batch_tables(spark, src_dir, deleted):
    from recover_spark.plans.pipeline import DatasetPipeline
    from recover_spark.schemas.registry import TableSpec

    spec = TableSpec(
        name="hr",
        columns={},  # schema comes from the typed read below
        index_fields=["RecordID"],
    )
    df = spark.read.schema(SCHEMA).json(str(src_dir))
    pipe = DatasetPipeline(spec, observe_counts=False)
    return pipe.build(df, deleted=deleted)


def _run_stream(spark, src_dir, tmp_path, deleted):
    from recover_spark.streaming.incremental import incremental_dataset_pipeline

    q = incremental_dataset_pipeline(
        spark,
        str(src_dir),
        SCHEMA,
        checkpoint_path=str(tmp_path / "ckpt"),
        state_root=str(tmp_path / "state"),
        index_fields=["RecordID"],
        deleted=deleted,
        n_buckets=8,
        max_files_per_trigger=1,  # force one micro-batch per file
    )
    q.awaitTermination(120)
    return str(tmp_path / "state")


def test_incremental_equals_batch_with_mid_stream_replay(spark, tmp_path):
    from recover_spark.streaming.incremental import (
        merge_pipeline_batch,
        pipeline_tables_from_state,
    )

    src = tmp_path / "src"
    _write_file(src / "f1.ndjson", F1)
    _write_file(src / "f2.ndjson", F2)
    deleted = _deleted(spark)

    state = _run_stream(spark, src, tmp_path, deleted)
    inc = pipeline_tables_from_state(spark, state, "hr", ["RecordID"])
    want = _batch_tables(spark, src, deleted)
    assert set(inc) == set(want)
    snap_before = {n: _canon(df) for n, df in inc.items()}
    for name in want:
        assert snap_before[name] == _canon(want[name]), name

    # at-least-once replay of batch 2 mid-stream: state must not change
    replay = spark.createDataFrame(
        [tuple(r.get(f.name) for f in SCHEMA.fields) for r in F2], SCHEMA
    )
    merge_pipeline_batch(
        spark, replay, state, ["RecordID"], deleted=deleted, n_buckets=8
    )
    after = pipeline_tables_from_state(spark, state, "hr", ["RecordID"])
    for name in snap_before:
        assert _canon(after[name]) == snap_before[name], name

    # a third file arrives; the next availableNow run folds ONLY it in,
    # and the state still equals the batch pipeline over all three files
    _write_file(src / "f3.ndjson", F3)
    _run_stream(spark, src, tmp_path, deleted)
    final = pipeline_tables_from_state(spark, state, "hr", ["RecordID"])
    want_all = _batch_tables(spark, src, deleted)
    assert set(final) == set(want_all)
    for name in want_all:
        assert _canon(final[name]) == _canon(want_all[name]), name

    # semantic spot-checks: latest r1/r2 won, r3 collapsed, r4 deleted
    parent = final["hr"]
    live = {r.RecordID for r in parent.select("RecordID").collect()}
    assert live == {"r1", "r2", "r3", "r5"}
    r1 = parent.filter(F.col("RecordID") == "r1").first()
    assert r1.InsertedDate == "2024-01-15"


def test_state_layout_prunes_to_touched_buckets(spark, tmp_path):
    """The state is hive-partitioned on the hash bucket, so the merge's
    read-back scans only touched buckets (PartitionFilters, not a full
    state scan)."""
    from pathlib import Path

    src = tmp_path / "src"
    _write_file(src / "f1.ndjson", F1)
    state = _run_stream(spark, src, tmp_path, _deleted(spark))
    parts = {p.name for p in Path(state).iterdir() if p.is_dir()}
    assert parts and all(p.startswith("partition_bucket=") for p in parts)

    probe = spark.read.parquet(state).filter(
        F.col("partition_bucket") == 0
    )
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    assert "partition_bucket" in plan.split("PartitionFilters")[1][:200]


def test_pipeline_composes_drift_on_arrival(spark, tmp_path):
    """VERDICT r6 #7: the weekly-export operational shape end-to-end —
    one availableNow run both maintains the curated state AND folds
    each arrival's binned counts into the streaming PSI state.  The
    read-side PSI equals the batch monitor over the same arrivals
    exactly (binned counts are additive), and a full replay from a
    fresh checkpoint is a no-op for both states."""
    import json as _json

    from recover_spark.quality.drift import psi_drift, psi_drift_categorical
    from recover_spark.streaming.drift import (
        freeze_categorical_baseline,
        freeze_drift_baseline,
        read_categorical_drift_psi,
        read_drift_psi,
    )
    from recover_spark.streaming.incremental import (
        incremental_dataset_pipeline,
        pipeline_tables_from_state,
    )

    schema = T.StructType(
        [
            T.StructField("RecordID", T.StringType()),
            T.StructField("InsertedDate", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("cohort", T.StringType()),
        ]
    )
    base = spark.range(0, 400).selectExpr(
        "CAST((id * 7) % 101 AS DOUBLE) AS value",
        "CASE WHEN id % 3 = 0 THEN 'adults' ELSE 'pediatric' END AS cohort",
    )
    drift_state = str(tmp_path / "drift")
    freeze_drift_baseline(base, drift_state, ["value"], n_bins=10)
    cat_state = str(tmp_path / "cat_drift")
    freeze_categorical_baseline(base, cat_state, ["cohort"], top_k=5)

    # two arrival files; f2 re-exports r2 with a newer date and shifts
    # the value distribution upward (the thing PSI must register)
    rows1 = [
        {"RecordID": f"r{i}", "InsertedDate": "2024-01-01",
         "value": float((i * 7) % 101), "cohort": "adults"}
        for i in range(40)
    ]
    # f2 shifts values AND the cohort mix (all pediatric)
    rows2 = [
        {"RecordID": f"r{i}", "InsertedDate": "2024-01-08",
         "value": float((i * 7) % 101 + 40), "cohort": "pediatric"}
        for i in range(20, 60)
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.ndjson").write_text(
        "\n".join(_json.dumps(r) for r in rows1) + "\n"
    )
    (src / "f2.ndjson").write_text(
        "\n".join(_json.dumps(r) for r in rows2) + "\n"
    )

    def run(ckpt: str):
        q = incremental_dataset_pipeline(
            spark,
            str(src),
            schema,
            checkpoint_path=str(tmp_path / ckpt),
            state_root=str(tmp_path / "state"),
            index_fields=["RecordID"],
            n_buckets=4,
            max_files_per_trigger=1,
            order_fields=["InsertedDate"],
            drift_state=drift_state,
            categorical_drift_state=cat_state,
        )
        q.awaitTermination(120)

    run("ckpt")
    # curated state: latest record per id
    parent = pipeline_tables_from_state(
        spark, str(tmp_path / "state"), "t", ["RecordID"]
    )["t"]
    assert parent.count() == 60
    r30 = parent.filter(F.col("RecordID") == "r30").first()
    assert r30.InsertedDate == "2024-01-08"

    # drift state: read-side PSI == batch PSI over the SAME arrivals
    arrivals = spark.createDataFrame(
        [(r["value"],) for r in rows1 + rows2], "value double"
    )
    streamed = {
        r.column: r.psi for r in read_drift_psi(spark, drift_state).collect()
    }
    batch_ref = {
        r.column: r.psi
        for r in psi_drift(base, arrivals, ["value"]).collect()
    }
    assert streamed == batch_ref, (streamed, batch_ref)
    assert streamed["value"] > 0.05  # the upward shift registers

    # categorical twin: streamed == batch over the same arrivals
    cat_arrivals = spark.createDataFrame(
        [(r["cohort"],) for r in rows1 + rows2], "cohort string"
    )
    cat_streamed = {
        r.column: r.psi
        for r in read_categorical_drift_psi(spark, cat_state).collect()
    }
    cat_batch = {
        r.column: r.psi
        for r in psi_drift_categorical(
            base, cat_arrivals, ["cohort"], top_k=5
        ).collect()
    }
    assert cat_streamed == cat_batch, (cat_streamed, cat_batch)
    assert cat_streamed["cohort"] > 0.05  # the mix shift registers

    # full replay from a fresh checkpoint: both states unchanged
    snap = _canon(parent)
    run("ckpt2")
    parent2 = pipeline_tables_from_state(
        spark, str(tmp_path / "state"), "t", ["RecordID"]
    )["t"]
    assert _canon(parent2) == snap
    replayed = {
        r.column: r.psi for r in read_drift_psi(spark, drift_state).collect()
    }
    assert replayed == streamed
    cat_replayed = {
        r.column: r.psi
        for r in read_categorical_drift_psi(spark, cat_state).collect()
    }
    assert cat_replayed == cat_streamed
