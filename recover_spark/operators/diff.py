"""J3 — dataset diff: the native-Spark compare the reference wished for.

Reference: src/glue/jobs/compare_parquet_datasets.py:554-587 runs
datacompy.Compare (pandas, driver memory) on (staging, main) with
``join_columns=index``, abs_tol=0, rel_tol=0; unique-row extraction at
:510-532, duplicate detection (A4) at :488-507, column set ops (A7) at
:154-182.  The reference itself notes the pandas scaling problem and
names SparkCompare as the fix (:568-572) — this module is that operator.

Spark-first design
------------------
ONE full-outer join on the index keys produces everything:

- presence flags -> rows only in left / only in right;
- per-column equality (with abs/rel tolerance for numerics, null-safe
  ``<=>`` for the rest) -> per-column match counts in a single
  aggregation pass (no per-column joins, no driver-side rows);
- match stats aggregate map-side before the final reduce.

Duplicate-key detection and column set ops stay driver-light: column set
ops use ``df.columns`` (metadata only), duplicates are one groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_L, _R = "__present_l", "__present_r"


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


@dataclass
class CompareResult:
    """Structured diff output (mirrors datacompy's report surface)."""

    joined: DataFrame  # full-outer join with presence + per-column match flags
    left_only: DataFrame
    right_only: DataFrame
    mismatched: DataFrame  # present in both but >=1 compared column differs
    column_stats: DataFrame  # (column, rows_compared, rows_equal, rows_unequal)
    left_dup_keys: DataFrame
    right_dup_keys: DataFrame
    common_columns: list[str] = field(default_factory=list)
    left_only_columns: list[str] = field(default_factory=list)
    right_only_columns: list[str] = field(default_factory=list)


def duplicate_index_rows(df: DataFrame, index_cols: Sequence[str]) -> DataFrame:
    """A4 — keys appearing more than once (compare_parquet_datasets.py:488-507)."""
    return (
        df.groupBy(*index_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def compare_datasets(
    left: DataFrame,
    right: DataFrame,
    index_cols: Sequence[str],
    abs_tol: float = 0.0,
    rel_tol: float = 0.0,
) -> CompareResult:
    """Full-outer diff of two datasets on composite ``index_cols``.

    Numeric columns match when ``abs(l - r) <= abs_tol + rel_tol*abs(r)``
    (datacompy's tolerance rule); all other types use null-safe equality.
    Columns outside the intersection are reported, not compared
    (compare_parquet_datasets.py:154-182).
    """
    keys = list(index_cols)
    lcols, rcols = set(left.columns), set(right.columns)
    common = [c for c in left.columns if c in rcols and c not in keys]
    left_only_cols = sorted(lcols - rcols)
    right_only_cols = sorted(rcols - lcols)
    ltypes = dict(left.dtypes)
    lschema = {f.name: f.dataType for f in left.schema.fields}

    lsel = left.select(
        *keys, *[F.col(c).alias(f"{c}__l") for c in common], F.lit(True).alias(_L)
    )
    rsel = right.select(
        *keys, *[F.col(c).alias(f"{c}__r") for c in common], F.lit(True).alias(_R)
    )
    joined = lsel.join(rsel, on=keys, how="full_outer")

    match_cols = []
    for c in common:
        l, r = F.col(f"{c}__l"), F.col(f"{c}__r")
        if _is_numeric(lschema[c]) and (abs_tol or rel_tol):
            eq = (F.abs(l - r) <= F.lit(abs_tol) + F.lit(rel_tol) * F.abs(r)) | (
                l.isNull() & r.isNull()
            )
        else:
            eq = l.eqNullSafe(r)
        match_cols.append(eq.alias(f"{c}__match"))
    joined = joined.select("*", *match_cols)

    both = joined.filter(F.col(_L).isNotNull() & F.col(_R).isNotNull())
    left_only = joined.filter(F.col(_R).isNull()).select(
        *keys, *[F.col(f"{c}__l").alias(c) for c in common]
    )
    right_only = joined.filter(F.col(_L).isNull()).select(
        *keys, *[F.col(f"{c}__r").alias(c) for c in common]
    )
    if common:
        any_mismatch = None
        for c in common:
            m = ~F.col(f"{c}__match")
            any_mismatch = m if any_mismatch is None else (any_mismatch | m)
        mismatched = both.filter(any_mismatch)
    else:
        mismatched = both.limit(0)

    # Per-column stats in ONE aggregation (map-side partial -> tiny
    # result), kept LAZY: the single agg row is unpivoted with explode,
    # so callers that never read column_stats pay nothing.
    if common:
        aggs = []
        for c in common:
            aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
            aggs.append(
                F.sum(F.col(f"{c}__match").cast("long")).alias(f"{c}__eq")
            )
        per_col = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__n").alias("rows_compared"),
                    F.coalesce(F.col(f"{c}__eq"), F.lit(0)).alias("rows_equal"),
                )
                for c in common
            ]
        )
        column_stats = (
            both.agg(*aggs)
            .select(F.explode(per_col).alias("s"))
            .select(
                F.col("s.column").alias("column"),
                F.col("s.rows_compared").cast("long").alias("rows_compared"),
                F.col("s.rows_equal").cast("long").alias("rows_equal"),
                (F.col("s.rows_compared") - F.col("s.rows_equal"))
                .cast("long")
                .alias("rows_unequal"),
            )
        )
    else:
        column_stats = left.sparkSession.createDataFrame(
            [],
            schema="column string, rows_compared long, rows_equal long, rows_unequal long",
        )

    return CompareResult(
        joined=joined,
        left_only=left_only,
        right_only=right_only,
        mismatched=mismatched,
        column_stats=column_stats,
        left_dup_keys=duplicate_index_rows(left, keys),
        right_dup_keys=duplicate_index_rows(right, keys),
        common_columns=common,
        left_only_columns=left_only_cols,
        right_only_columns=right_only_cols,
    )


def comparison_report(result: CompareResult, max_sample_rows: int = 20) -> str:
    """K8 — human-readable diff report (the reference writes datacompy's
    text report to S3, compare_parquet_datasets.py:763-791)."""
    lines = ["Dataset comparison report", "=" * 32]
    lines.append(f"common columns:      {len(result.common_columns)}")
    if result.left_only_columns:
        lines.append(f"columns only left:   {result.left_only_columns}")
    if result.right_only_columns:
        lines.append(f"columns only right:  {result.right_only_columns}")
    n_lo = result.left_only.count()
    n_ro = result.right_only.count()
    n_mm = result.mismatched.count()
    lines.append(f"rows only in left:   {n_lo}")
    lines.append(f"rows only in right:  {n_ro}")
    lines.append(f"rows with mismatch:  {n_mm}")
    lines.append("")
    lines.append("per-column match stats:")
    for r in result.column_stats.collect():
        lines.append(
            f"  {r.column}: compared={r.rows_compared} "
            f"equal={r.rows_equal} unequal={r.rows_unequal}"
        )
    if n_mm:
        lines.append("")
        lines.append(f"mismatch sample (up to {max_sample_rows}):")
        for r in result.mismatched.limit(max_sample_rows).collect():
            lines.append(f"  {r.asDict()}")
    return "\n".join(lines)
