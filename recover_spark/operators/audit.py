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

from recover_spark.functions.local import tiny_df


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


def profile_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx_distinct_rsd: float = 0.05,
) -> DataFrame:
    """Deequ-style column profiler: per-column completeness, distinct
    estimate, and min/max/mean in ONE aggregate pass over the table.

    At 100 TB the difference between "profile = one job" and "profile =
    one job per column" is the whole game: every statistic here is a
    mergeable aggregate, so the scan happens once, partials combine
    map-side, and a single one-row result fans out driver-side into the
    long-format report (constant-size collect).  Distinct counts are
    HLL estimates (``approx_count_distinct``) because exact distincts
    are neither mergeable nor bounded.

    Output: one row per profiled column —
    (column, data_type, n_rows, n_nulls, completeness, approx_distinct,
    min_value, max_value, mean_value) with min/max rendered as strings
    (mixed types in one report column) and mean only for numerics.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    numeric_prefixes = (
        "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}")
        )
        aggs.append(
            F.approx_count_distinct(c, approx_distinct_rsd).alias(f"__dis_{c}")
        )
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if dtypes[c].startswith(numeric_prefixes):
            aggs.append(F.avg(c).alias(f"__avg_{c}"))
    row = df.agg(*aggs).collect()[0]  # one row, constant size

    spark = df.sparkSession
    n = row["__n"]
    out = []
    for c in cols:
        nulls = int(row[f"__nul_{c}"] or 0)
        mean = (
            round(float(row[f"__avg_{c}"]), 6)
            if dtypes[c].startswith(numeric_prefixes)
            and row[f"__avg_{c}"] is not None
            else None
        )
        out.append(
            (
                c,
                dtypes[c],
                int(n),
                nulls,
                round(1.0 - nulls / n, 6) if n else None,
                int(row[f"__dis_{c}"]),
                row[f"__min_{c}"],
                row[f"__max_{c}"],
                mean,
            )
        )
    return tiny_df(
        spark,
        out,
        "column string, data_type string, n_rows long, n_nulls long, "
        "completeness double, approx_distinct long, min_value string, "
        "max_value string, mean_value double",
    )
