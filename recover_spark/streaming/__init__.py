from recover_spark.streaming.incremental import (
    dedup_against_corpus,
    dedup_stream,
    incremental_ingest,
    ingest_vectors_stream,
    near_dedup_against_corpus,
    reconcile_manifests,
)
from recover_spark.streaming.matview import (
    maintain_count_matview,
    maintain_distinct_matview,
    maintain_quantile_matview,
    maintain_topk_matview,
    read_distinct_matview,
    read_quantile_matview,
    read_topk_matview,
)
from recover_spark.streaming.drift import (
    freeze_categorical_baseline,
    freeze_drift_baseline,
    maintain_categorical_drift_matview,
    maintain_drift_matview,
    read_categorical_drift_psi,
    read_drift_psi,
)
from recover_spark.streaming.joins import enrich_stream, interval_join_stream

__all__ = [
    "dedup_against_corpus",
    "near_dedup_against_corpus",
    "maintain_count_matview",
    "maintain_distinct_matview",
    "maintain_quantile_matview",
    "maintain_topk_matview",
    "read_distinct_matview",
    "read_quantile_matview",
    "read_topk_matview",
    "freeze_categorical_baseline",
    "freeze_drift_baseline",
    "maintain_categorical_drift_matview",
    "read_categorical_drift_psi",
    "maintain_drift_matview",
    "read_drift_psi",
    "dedup_stream",
    "enrich_stream",
    "incremental_ingest",
    "ingest_vectors_stream",
    "interval_join_stream",
    "reconcile_manifests",
]
