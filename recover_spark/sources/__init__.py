from recover_spark.sources.atomic import read_dataset, write_dataset_atomic
from recover_spark.sources.readers import read_ndjson, read_parquet_dataset
from recover_spark.sources.writers import write_partitioned_parquet

__all__ = [
    "read_dataset",
    "read_ndjson",
    "read_parquet_dataset",
    "write_dataset_atomic",
    "write_partitioned_parquet",
]
