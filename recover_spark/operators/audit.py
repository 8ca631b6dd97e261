"""A1/A4/A6/A7 — record accounting operators.

Reference: src/glue/jobs/json_to_parquet.py:419-489 counts records per
``export_end_date`` at each pipeline stage (READ / DROP_DUPLICATES /
DROP_DELETED_SAMPLES / WRITE), concatenates the ledgers (:531) and writes
CSV (K6, :492-536).  consume_logs.py:285-332 checks read==write counts.

Spark-first: each ledger is one ``groupBy().count()`` (map-side partial
aggregation; the result is export-date cardinality — tiny).  Ledgers
union with ``unionByName(allowMissingColumns=True)`` (A6).
"""

from __future__ import annotations

import enum
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CountStage(str, enum.Enum):
    """Pipeline stages, mirroring json_to_parquet.py:419-443 CountEventType."""

    READ = "READ"
    DROP_DUPLICATES = "DROP_DUPLICATES"
    DROP_DELETED_SAMPLES = "DROP_DELETED_SAMPLES"
    WRITE = "WRITE"


def stage_counts(
    df: DataFrame,
    stage: CountStage | str,
    group_cols: Sequence[str] = ("export_end_date",),
    data_type: str | None = None,
) -> DataFrame:
    """A1 — per-group record counts for one pipeline stage."""
    stage_name = stage.value if isinstance(stage, CountStage) else str(stage)
    out = (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("record_count"))
        .withColumn("stage", F.lit(stage_name))
    )
    if data_type is not None:
        out = out.withColumn("data_type", F.lit(data_type))
    return out


def union_ledgers(ledgers: Sequence[DataFrame]) -> DataFrame:
    """A6 — concat count ledgers across stages/types (pandas.concat analog)."""
    if not ledgers:
        raise ValueError("no ledgers to union")
    out = ledgers[0]
    for l in ledgers[1:]:
        out = out.unionByName(l, allowMissingColumns=True)
    return out


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A4 — rows whose composite key occurs more than once."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def count_reconciliation(
    access_counts: DataFrame,
    creation_counts: DataFrame,
    keys: Sequence[str] = ("cohort", "file_name"),
    access_col: str = "access_count",
    creation_col: str = "creation_count",
) -> DataFrame:
    """J4 — read-vs-write count reconciliation
    (consume_logs.py:321-330): left join on the audit key, difference
    column; nonzero difference = lost/duplicated records."""
    right = F.broadcast(creation_counts)  # ledger frames are tiny
    return access_counts.join(right, on=list(keys), how="left").withColumn(
        "difference",
        F.col(access_col) - F.coalesce(F.col(creation_col), F.lit(0)),
    )


def group_collect(
    df: DataFrame,
    group_cols: Sequence[str],
    collect_col: str,
    sort: bool = True,
) -> DataFrame:
    """A5 — group records and collect values per group
    (consume_logs.py:153-178 groups log lines by workflow_run_id).

    ``sort=True`` sorts each collected array for determinism (the
    reference iterates dict groups, order-insensitive).
    """
    agg = F.collect_list(collect_col)
    if sort:
        agg = F.sort_array(agg)
    return df.groupBy(*group_cols).agg(agg.alias(f"{collect_col}_list"))


def column_set_diff(left: DataFrame, right: DataFrame) -> dict[str, list[str]]:
    """A7 — column-name set operations (driver-side metadata, no job)."""
    l, r = set(left.columns), set(right.columns)
    return {
        "common": sorted(l & r),
        "left_only": sorted(l - r),
        "right_only": sorted(r - l),
    }
