from recover_spark.streaming.incremental import (
    incremental_ingest,
    reconcile_manifests,
)

__all__ = ["incremental_ingest", "reconcile_manifests"]
