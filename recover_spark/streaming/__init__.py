from recover_spark.streaming.incremental import (
    dedup_stream,
    incremental_ingest,
    reconcile_manifests,
)
from recover_spark.streaming.joins import enrich_stream, interval_join_stream

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "incremental_ingest",
    "interval_join_stream",
    "reconcile_manifests",
]
