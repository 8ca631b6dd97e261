"""Read-vs-write invariant CLI — one command over the audit ledgers.

Reference: src/scripts/consume_logs/consume_logs.py:285-332 — per
workflow run, merge 'access' (read) events against 'creation' (write)
events on (cohort, file_name), compute line_count_difference, report
every comparison to one CSV and the nonzero differences to another.

This wrapper composes the package's audit operators
(operators/audit.py: count_reconciliation = the J4 merge+difference,
group_collect = the A5 per-run grouping) over a log table with columns

    workflow_run_id, event_type ('access'|'creation'),
    cohort, file_name, line_count

(the shape the reference's transform_logs_to_dataframe produces from
its log query).  Spark-first difference vs the reference: all workflow
runs reconcile in ONE join keyed on (workflow_run_id, cohort,
file_name) instead of a Python loop per run — same rows out, one
shuffle at any scale.

Usage:
    python tools/consume_logs.py INPUT [--format parquet|ndjson]
        [--output-dir DIR] [--fail-on-difference]

Writes <output-dir>/read_write_comparison.csv,
<output-dir>/missing_data.csv (only when differences exist) and
<output-dir>/workflow_run_files.csv (the A5 per-run file ledger).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["workflow_run_id", "cohort", "file_name"]


def build_comparison(logs):
    """The reference's per-run access-vs-creation merge, vectorized:
    returns (comparison, missing) DataFrames.  ``comparison`` carries
    line_count_access / line_count_creation / line_count_difference
    per (workflow_run_id, cohort, file_name); ``missing`` is the
    nonzero-difference subset (a creation event that never happened
    reconciles against 0, matching the reference's NaN-is-different
    pandas behavior)."""
    from pyspark.sql import functions as F

    from recover_spark.operators.audit import count_reconciliation

    access = logs.filter(F.col("event_type") == "access").select(
        *KEYS, F.col("line_count").alias("line_count_access")
    )
    creation = logs.filter(F.col("event_type") == "creation").select(
        *KEYS, F.col("line_count").alias("line_count_creation")
    )
    comparison = count_reconciliation(
        access,
        creation,
        keys=KEYS,
        access_col="line_count_access",
        creation_col="line_count_creation",
    ).withColumnRenamed("difference", "line_count_difference")
    missing = comparison.filter(F.col("line_count_difference") != 0)
    return comparison, missing


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input", help="log table (parquet dir/file or NDJSON)")
    ap.add_argument("--format", choices=["parquet", "ndjson"],
                    default="parquet")
    ap.add_argument("--output-dir", default=".")
    ap.add_argument("--fail-on-difference", action="store_true",
                    help="exit 1 when any read/write difference exists")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from recover_spark.operators.audit import group_collect
    from recover_spark.session import get_spark

    spark = get_spark("consume-logs")
    spark.sparkContext.setLogLevel("ERROR")
    if args.format == "parquet":
        logs = spark.read.parquet(args.input)
    else:
        logs = spark.read.json(args.input)

    comparison, missing = build_comparison(logs)
    comparison = comparison.orderBy(*KEYS)
    os.makedirs(args.output_dir, exist_ok=True)
    cmp_path = os.path.join(args.output_dir, "read_write_comparison.csv")
    comparison.toPandas().to_csv(cmp_path, index=False)
    print(f"Writing read/write comparison information to {cmp_path}")

    # A5 ledger: which files each workflow run touched (the reference's
    # group-by-workflow-run step, persisted for the human)
    ledger = group_collect(
        logs.select("workflow_run_id", "file_name").distinct(),
        ["workflow_run_id"],
        "file_name",
    ).withColumn(
        "file_name_list", F.concat_ws(";", F.col("file_name_list"))
    ).orderBy("workflow_run_id")
    ledger_path = os.path.join(args.output_dir, "workflow_run_files.csv")
    ledger.toPandas().to_csv(ledger_path, index=False)

    missing_rows = missing.orderBy(*KEYS).toPandas()
    rc = 0
    if len(missing_rows) > 0:
        for run in missing_rows["workflow_run_id"].unique():
            print(
                "Discovered differences between records read/write "
                f"in workflow run {run}"
            )
        miss_path = os.path.join(args.output_dir, "missing_data.csv")
        print(f"Writing missing data information to {miss_path}")
        missing_rows.to_csv(miss_path, index=False)
        if args.fail_on_difference:
            rc = 1
    else:
        print("Did not find any differences between records read/write")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
