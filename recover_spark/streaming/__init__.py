from recover_spark.streaming.incremental import (
    dedup_stream,
    incremental_ingest,
    reconcile_manifests,
)

__all__ = ["dedup_stream", "incremental_ingest", "reconcile_manifests"]
