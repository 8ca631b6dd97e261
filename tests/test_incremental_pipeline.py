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
