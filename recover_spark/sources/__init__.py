from recover_spark.sources.atomic import (
    generation_changes,
    read_dataset,
    write_dataset_atomic,
)
from recover_spark.sources.bloommap import (
    build_bloommap,
    read_point_pruned,
    refresh_bloommap,
)
from recover_spark.sources.zonemap import (
    build_zonemap,
    read_pruned,
    refresh_zonemap,
)
from recover_spark.sources.readers import read_ndjson, read_parquet_dataset
from recover_spark.sources.writers import write_partitioned_parquet

__all__ = [
    "generation_changes",
    "build_bloommap",
    "read_point_pruned",
    "refresh_bloommap",
    "build_zonemap",
    "read_pruned",
    "refresh_zonemap",
    "read_dataset",
    "read_ndjson",
    "read_parquet_dataset",
    "write_dataset_atomic",
    "write_partitioned_parquet",
]
