from recover_spark.operators.dedup import dedup_latest
from recover_spark.operators.deletes import drop_deleted
from recover_spark.operators.index import add_index_to_child
from recover_spark.operators.relationalize import has_nested_fields, relationalize
from recover_spark.operators.diff import compare_datasets
from recover_spark.operators.audit import (
    CountStage,
    duplicate_keys,
    stage_counts,
    union_ledgers,
)
from recover_spark.operators.merge import merge_upsert, scd2_apply
from recover_spark.operators.temporal import (
    asof_join,
    ewma_smooth,
    holt_smooth,
    holt_winters_smooth,
    seasonal_decompose,
    range_join,
    resample_forward_fill,
)
from recover_spark.operators.analytics import (
    distinct_stats,
    moving_stats,
    rollup_aggregate,
    top_k_per_group,
    approx_quantile_rollup,
    skyline_2d,
)

__all__ = [
    "ewma_smooth",
    "holt_smooth",
    "holt_winters_smooth",
    "seasonal_decompose",
    "skyline_2d",
    "approx_quantile_rollup",
    "asof_join",
    "range_join",
    "resample_forward_fill",
    "merge_upsert",
    "scd2_apply",
    "distinct_stats",
    "moving_stats",
    "rollup_aggregate",
    "top_k_per_group",
    "dedup_latest",
    "drop_deleted",
    "add_index_to_child",
    "has_nested_fields",
    "relationalize",
    "compare_datasets",
    "CountStage",
    "duplicate_keys",
    "stage_counts",
    "union_ledgers",
]
