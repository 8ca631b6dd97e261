"""Round-14 additions: drift read-lens column subsets (the shared
arrival state serving consumers that watch different column sets),
the driver-collected index-geometry guards, and the persisted
expectation-suite results doc.

Reference parity anchors are cited in the operator docstrings; these
tests pin the NEW contracts introduced for VERDICT r13 #1/#3/#4/#6.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _drift_state(spark, tmp_path, cols, n_rows=400):
    """Freeze a baseline over ``cols`` and fold two micro-batches of a
    shifted current era — small, deterministic, no streaming query
    (merge_drift_counts is the foreachBatch body)."""
    from recover_spark.streaming.drift import (
        freeze_drift_baseline,
        merge_drift_counts,
    )

    base = spark.range(n_rows).select(
        *[
            ((F.col("id") * (i + 3)) % 97).cast("double").alias(c)
            for i, c in enumerate(cols)
        ]
    )
    cur = spark.range(n_rows).select(
        *[
            ((F.col("id") * (i + 5)) % 89 + 10).cast("double").alias(c)
            for i, c in enumerate(cols)
        ]
    )
    state = str(tmp_path / "state")
    freeze_drift_baseline(base, state, cols, n_bins=8, edge_accuracy=None)
    merge_drift_counts(spark, cur.filter(F.col(cols[0]) % 2 == 0), state, 0)
    merge_drift_counts(spark, cur.filter(F.col(cols[0]) % 2 != 0), state, 1)
    return state


COLS3 = ["alpha", "beta", "gamma"]


def test_drift_read_lens_col_subset_equals_full_read_filtered(
    spark, tmp_path
):
    """One maintained state, many watchers: reading a column subset
    returns exactly the full read's rows for those columns — per-column
    statistics are independent, so a shared wider freeze never moves a
    narrower consumer's values (the contract the shared bench state
    rests on)."""
    from recover_spark.streaming.drift import (
        read_drift_cvm,
        read_drift_js,
        read_drift_ks,
        read_drift_psi,
        read_drift_wasserstein,
    )

    state = _drift_state(spark, tmp_path, COLS3)
    subset = ["alpha", "gamma"]
    for rfn in (
        read_drift_psi,
        read_drift_ks,
        read_drift_js,
        read_drift_wasserstein,
        read_drift_cvm,
    ):
        full = {
            r["column"]: r.asDict() for r in rfn(spark, state).collect()
        }
        assert set(full) == set(COLS3)
        got = {
            r["column"]: r.asDict()
            for r in rfn(spark, state, cols=subset).collect()
        }
        assert set(got) == set(subset)
        for c in subset:
            assert got[c] == full[c], (rfn.__name__, c)


def test_drift_read_lens_unknown_col_raises(spark, tmp_path):
    from recover_spark.streaming.drift import read_drift_psi

    state = _drift_state(spark, tmp_path, COLS3)
    with pytest.raises(ValueError, match="not in frozen baseline"):
        read_drift_psi(spark, state, cols=["alpha", "delta"]).collect()


def _tiny_index(spark, tmp_path, n=40, dim=8):
    from recover_spark.ops.similarity import build_ivf_index

    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") * (i + 1)) % 11 + 1).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=4)
    return emb, idx


def test_centroid_collect_guard_refuses_past_max_lists(
    spark, tmp_path, monkeypatch
):
    """The 100-TB geometry guard (VERDICT r13 #4): probe planning
    collects centroids to the driver; past MAX_DRIVER_LISTS it must
    REFUSE loudly (the apss refuse-to-degrade contract), not degrade
    into a driver-memory bet.  The cap is monkeypatched below the tiny
    index's list count to exercise the refusal without building 65k
    lists."""
    from recover_spark.ops import similarity as sim

    emb, idx = _tiny_index(spark, tmp_path)
    queries = emb.filter(F.col("vec_id") < 2)
    monkeypatch.setattr(sim, "MAX_DRIVER_LISTS", 2)
    with pytest.raises(ValueError, match="coarse centroids"):
        sim.ivf_topk_indexed(spark, idx, queries, nprobe=1, k=3)
    # un-capped (restored) planning still works on the same index
    monkeypatch.setattr(sim, "MAX_DRIVER_LISTS", 65_536)
    assert sim.ivf_topk_indexed(spark, idx, queries, nprobe=1, k=3).count() > 0


def test_codebook_collect_guard_refuses_past_max_cells(
    spark, tmp_path, monkeypatch
):
    from recover_spark.ops import similarity as sim

    emb, idx = _tiny_index(spark, tmp_path)
    sim.build_pq_sidecar(
        spark, idx, m_subspaces=2, n_codes=4, dim=8
    )
    queries = emb.filter(F.col("vec_id") < 2)
    monkeypatch.setattr(sim, "MAX_DRIVER_CODEBOOK_CELLS", 3)
    with pytest.raises(ValueError, match="codebook cells"):
        sim.ivf_pq_topk_indexed(spark, idx, queries, nprobe=1, k=3)
    monkeypatch.setattr(sim, "MAX_DRIVER_CODEBOOK_CELLS", 1_048_576)
    assert (
        sim.ivf_pq_topk_indexed(spark, idx, queries, nprobe=1, k=3).count()
        > 0
    )


def test_append_guard_applies_to_frozen_assignment(
    spark, tmp_path, monkeypatch
):
    """Appends assign against collected frozen centroids — the same
    driver-side geometry, the same guard."""
    from recover_spark.ops import similarity as sim

    emb, idx = _tiny_index(spark, tmp_path)
    more = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    monkeypatch.setattr(sim, "MAX_DRIVER_LISTS", 2)
    with pytest.raises(ValueError, match="coarse centroids"):
        sim.append_ivf_index(more, idx)


def test_render_data_docs_and_load_run(spark, tmp_path):
    """VERDICT r13 #6: persisted runs render as a browsable markdown
    doc (run ledger + latest run's per-expectation table) and read
    back losslessly through load_run."""
    from recover_spark.quality.expectations import (
        load_run,
        persist_run,
        run_suite,
    )

    df = spark.range(10).select(
        F.col("id").alias("event_id"), (F.col("id") % 120).alias("value")
    )
    suite = {
        "expectations": [
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "value", "min_value": 0,
                        "max_value": 95}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "event_id"}},
        ]
    }
    res = run_suite(df, suite)
    persist_run(res, str(tmp_path / "ge"), "s1", "run-001")
    persist_run(res, str(tmp_path / "ge"), "s1", "run-002")
    doc_path = tmp_path / "ge" / "s1" / "index.md"
    assert doc_path.is_file()
    md = doc_path.read_text()
    assert "run-002" in md and "run-001" in md
    assert "expect_column_values_to_be_unique" in md
    # newest run leads the ledger
    assert md.index("run-002") < md.index("| run-001")
    # lossless round-trip: latest pointer resolves to run-002
    loaded = load_run(str(tmp_path / "ge"), "s1")
    assert loaded["statistics"]["evaluated_expectations"] == 2
    got = {
        (r["expectation_type"], r["column"]):
            (r["success"], r["element_count"], r["unexpected_count"])
        for r in loaded["results"]
    }
    want = {
        (r.expectation_type, r.column):
            (r.success, r.element_count, r.unexpected_count)
        for r in res
    }
    assert got == want


def test_persist_run_without_docs(spark, tmp_path):
    from recover_spark.quality.expectations import persist_run, run_suite

    df = spark.range(3).select(F.col("id").alias("value"))
    res = run_suite(df, {"expectations": [
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "value"}}]})
    persist_run(res, str(tmp_path / "ge"), "s2", "r1", write_docs=False)
    assert not (tmp_path / "ge" / "s2" / "index.md").exists()


class _CountingRangedReader:
    """Fake remote object: serves byte ranges from an in-memory blob,
    counting calls and bytes — the assertion surface for the
    list-without-downloading contract."""

    def __init__(self, blob: bytes):
        self._blob = blob
        self.size = len(blob)
        self.calls = 0
        self.bytes_read = 0

    def read(self, offset: int, length: int) -> bytes:
        self.calls += 1
        chunk = self._blob[offset:offset + length]
        self.bytes_read += len(chunk)
        return chunk


def _make_zip(tmp_path, comment: bytes = b"") -> str:
    import hashlib
    import zipfile

    # STORED + incompressible bodies so the archive is much larger
    # than the 64K EOCD tail guess — otherwise "didn't download the
    # body" is vacuously true
    body = b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(256)
    ) * 40  # ~320 KB
    p = str(tmp_path / "export.zip")
    with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("healthkit.ndjson", body)
        zf.writestr("fitbit.ndjson", body[: len(body) // 2])
        zf.writestr("Manifest.csv", "name\n")
        zf.writestr("dir/", "")
        zf.writestr("nested/inner.ndjson", '{"c": 3}\n')
        if comment:
            zf.comment = comment
    return p


def test_ranged_listing_matches_zipfile_listing(spark, tmp_path):
    """VERDICT r13 #7: the ranged central-directory listing returns
    exactly what the local zipfile listing returns, from byte-range
    reads whose total is O(members), not O(archive)."""
    from recover_spark.sources.archive import (
        list_archive_members,
        list_archive_members_ranged,
    )

    p = _make_zip(tmp_path)
    blob = open(p, "rb").read()
    rdr = _CountingRangedReader(blob)
    got = sorted(
        map(tuple, list_archive_members_ranged(spark, rdr).collect())
    )
    want = sorted(map(tuple, list_archive_members(spark, p).collect()))
    assert got == want
    # the archive body (deflated members) was never transferred:
    # tail read + central-directory read, in <= 3 ranged calls
    assert rdr.calls <= 3
    assert rdr.bytes_read < len(blob) // 2


def test_ranged_listing_survives_archive_comment(spark, tmp_path):
    """EOCD is found by backward scan past a trailing comment — the
    case a fixed tail==22 read gets wrong."""
    from recover_spark.sources.archive import (
        list_archive_members,
        list_archive_members_ranged,
    )

    p = _make_zip(tmp_path, comment=b"weekly export batch 2024-07-01" * 10)
    rdr = _CountingRangedReader(open(p, "rb").read())
    got = sorted(
        map(tuple, list_archive_members_ranged(spark, rdr).collect())
    )
    want = sorted(map(tuple, list_archive_members(spark, p).collect()))
    assert got == want


def test_ranged_listing_rejects_non_zip(spark):
    from recover_spark.sources.archive import _ranged_central_directory

    rdr = _CountingRangedReader(b"this is not a zip archive" * 100)
    with pytest.raises(ValueError, match="EOCD"):
        _ranged_central_directory(rdr)


def test_local_ranged_file_adapter(tmp_path):
    from recover_spark.sources.archive import LocalRangedFile

    p = tmp_path / "blob.bin"
    p.write_bytes(bytes(range(256)))
    r = LocalRangedFile(str(p))
    assert r.size == 256
    assert r.read(10, 5) == bytes(range(10, 15))


def test_consume_logs_cli(spark, tmp_path, capsys):
    """VERDICT r13 #8: the one-command read-vs-write invariant tool
    (tools/consume_logs.py), reference semantics
    (consume_logs.py:285-332): comparison CSV always, missing-data CSV
    only when a (run, cohort, file) read count diverges from its write
    count — including a creation event that never happened."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import consume_logs as cl

    rows = [
        # run A: clean
        ("runA", "creation", "adults", "f1.json", 100),
        ("runA", "access", "adults", "f1.json", 100),
        # run B: short read + an access with no creation at all
        ("runB", "creation", "adults", "f2.json", 50),
        ("runB", "access", "adults", "f2.json", 47),
        ("runB", "access", "peds", "f3.json", 9),
    ]
    logs = spark.createDataFrame(
        rows,
        "workflow_run_id string, event_type string, cohort string, "
        "file_name string, line_count long",
    )
    src = str(tmp_path / "logs")
    logs.write.parquet(src)
    out = str(tmp_path / "reports")
    rc = cl.main([src, "--output-dir", out, "--fail-on-difference"])
    assert rc == 1  # differences exist
    printed = capsys.readouterr().out
    assert "Discovered differences" in printed and "runB" in printed

    import csv

    with open(f"{out}/read_write_comparison.csv") as fh:
        cmp_rows = list(csv.DictReader(fh))
    assert len(cmp_rows) == 3  # one per access event
    with open(f"{out}/missing_data.csv") as fh:
        miss = {
            (r["workflow_run_id"], r["file_name"]):
                float(r["line_count_difference"])
            for r in csv.DictReader(fh)
        }
    assert miss == {("runB", "f2.json"): -3.0, ("runB", "f3.json"): 9.0}
    with open(f"{out}/workflow_run_files.csv") as fh:
        ledger = {r["workflow_run_id"]: r["file_name_list"]
                  for r in csv.DictReader(fh)}
    assert ledger["runB"] == "f2.json;f3.json"

    # clean input: no missing_data.csv, exit 0
    clean = logs.filter(F.col("workflow_run_id") == "runA")
    src2 = str(tmp_path / "logs_clean")
    clean.write.parquet(src2)
    out2 = str(tmp_path / "reports_clean")
    assert cl.main([src2, "--output-dir", out2,
                    "--fail-on-difference"]) == 0
    import os as _os
    assert not _os.path.exists(f"{out2}/missing_data.csv")
    assert "Did not find any differences" in capsys.readouterr().out


def test_ivf_topk_joined_matches_indexed_and_ignores_cap(
    spark, tmp_path, monkeypatch
):
    """The past-the-guard probe path (VERDICT r13 #4, optional half):
    probe planning as a broadcast join on the centroid frame — same
    rows as the collect-based path (scores are the identical
    left-fold expression, so even the tiebreaks agree bit-for-bit),
    and NO driver-geometry cap applies (no collect anywhere)."""
    from recover_spark.ops import similarity as sim

    emb, idx = _tiny_index(spark, tmp_path)
    queries = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        map(tuple,
            sim.ivf_topk_indexed(spark, idx, queries, nprobe=2, k=4)
            .select("query_vec_id", "vec_id", "rank").collect())
    )
    got_df = sim.ivf_topk_joined(spark, idx, queries, nprobe=2, k=4)
    got = sorted(
        map(tuple,
            got_df.select("query_vec_id", "vec_id", "rank").collect())
    )
    assert got == want and len(got) == 12
    # the geometry guard does NOT bind this path
    monkeypatch.setattr(sim, "MAX_DRIVER_LISTS", 1)
    again = sorted(
        map(tuple,
            sim.ivf_topk_joined(spark, idx, queries, nprobe=2, k=4)
            .select("query_vec_id", "vec_id", "rank").collect())
    )
    assert again == want
    # plan: both joins broadcast (the probed set and the query batch),
    # no sort-merge exchange of the corpus side, and the corpus scan is
    # RUNTIME partition-pruned from the broadcast probed set (dynamic
    # partition pruning replaces the collect path's static IN filter —
    # same bytes read, no driver-side list at any geometry)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "dynamicpruning" in plan


EXP_SUITE = {
    "expectations": [
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "v"}},
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "bogus"}},
        {"expectation_type": "expect_column_values_to_be_between",
         "kwargs": {"column": "v", "min_value": 0, "max_value": 50}},
        {"expectation_type": "expect_column_values_to_not_be_null",
         "kwargs": {"column": "s"}},
        {"expectation_type": "expect_column_values_to_be_in_set",
         "kwargs": {"column": "s", "value_set": ["a", "b"]}},
        {"expectation_type": "expect_column_value_lengths_to_be_between",
         "kwargs": {"column": "s", "min_value": 1, "max_value": 1}},
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": 1, "max_value": 1000}},
    ]
}


def _exp_df(spark, n=60):
    return spark.range(n).select(
        (F.col("id") % 70).cast("long").alias("v"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(
            F.when(F.col("id") % 3 == 0, "c").otherwise("a")
        ).alias("s"),
    )


def test_streamed_expectations_equal_batch_suite(spark, tmp_path):
    """GE on arrival: counters fold per micro-batch; the read verdict
    equals run_suite over the union — row for row, including the
    mostly/row-count rules applied once over exact summed integers."""
    from recover_spark.quality.expectations import run_suite
    from recover_spark.streaming.expectations import (
        freeze_expectation_suite,
        maintain_expectations_matview,
        read_expectations_matview,
    )

    df = _exp_df(spark)
    state = str(tmp_path / "state")
    freeze_expectation_suite(state, EXP_SUITE)
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("v long, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_expectations_matview(
        stream, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = [
        (r["expectation_type"], r["column_name"], r["success"],
         r["element_count"], r["unexpected_count"])
        for r in read_expectations_matview(spark, state).collect()
    ]
    want = [
        (r.expectation_type, r.column,
         bool(r.success),
         0 if r.expectation_type == "expect_column_to_exist"
         else int(r.element_count),
         0 if r.expectation_type == "expect_column_to_exist"
         else int(r.unexpected_count))
        for r in run_suite(df, EXP_SUITE)
    ]
    assert got == want
    # sanity: the suite saw real violations, not a vacuous pass
    assert got[2][4] > 0  # between: v reaches 69 > 50
    assert got[3][4] > 0  # not-null violations


def test_streamed_expectations_replay_idempotent(spark, tmp_path):
    from recover_spark.streaming.expectations import (
        freeze_expectation_suite,
        merge_expectation_counts,
        read_expectations_matview,
    )

    df = _exp_df(spark, 30)
    state = str(tmp_path / "state")
    freeze_expectation_suite(state, EXP_SUITE)
    merge_expectation_counts(spark, df, state, 0)
    first = [tuple(r) for r in read_expectations_matview(spark, state).collect()]
    merge_expectation_counts(spark, df, state, 0)  # replay: no-op
    again = [tuple(r) for r in read_expectations_matview(spark, state).collect()]
    assert first == again
    merge_expectation_counts(spark, df, state, 1)  # genuine new batch
    doubled = {
        r["expectation_type"]: r["element_count"]
        for r in read_expectations_matview(spark, state).collect()
    }
    assert doubled["expect_table_row_count_to_be_between"] == 60


def test_streamed_expectations_refuse_unique(tmp_path):
    from recover_spark.streaming.expectations import (
        freeze_expectation_suite,
    )

    with pytest.raises(ValueError, match="not\\s+counter-mergeable"):
        freeze_expectation_suite(
            str(tmp_path / "s"),
            {"expectations": [
                {"expectation_type": "expect_column_values_to_be_unique",
                 "kwargs": {"column": "v"}}]},
        )
