"""S1/S4/S5/S8 — dataset readers.

Reference S1 (json_to_parquet.py:152-156) reads a Glue-cataloged,
hive-partitioned gzip-NDJSON dataset with a declared schema and
small-file grouping.  Spark's JSON source with an explicit schema is the
exact analog: partition discovery surfaces ``dataset=``/``cohort=``
columns, gzip is transparent, and ``spark.sql.files.openCostInBytes``
packs small files into input splits (the groupFiles equivalent).

Reading WITH a declared schema (never inferSchema) is both the
resolveChoice(match_catalog) semantics (S2) and the scale play: schema
inference is a full extra pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_filename_meta: bool = False,
) -> DataFrame:
    """Read (optionally gzipped, hive-partitioned) NDJSON with a declared
    schema.  Malformed values -> null columns (PERMISSIVE), matching the
    reference's tolerance (S8, s3_to_json.py:456-492)."""
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    if with_filename_meta:
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def read_parquet_dataset(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """S4/S5 — parquet scan with pushdown.

    Column pruning + predicate/partition pushdown are Catalyst built-ins;
    passing ``columns``/``predicate`` here just declares them early so
    the scan node shows PushedFilters/ReadSchema accordingly.
    """
    df = spark.read.parquet(path)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic-benchmark table by name from a scale-factor
    directory, normalizing physical-type quirks.

    Timestamp columns are normalized to plain (LTZ) TIMESTAMP under a
    UTC session regardless of the physical encoding: TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects by default) is read as long
    nanoseconds and truncated to microseconds; naive TIMESTAMP(MICROS)
    (which Spark 4 would infer as TIMESTAMP_NTZ, breaking
    ``unix_micros`` and time-bucketing) is read with NTZ inference off.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # Exact integer division: epoch nanos (~1.7e18) exceed 2^53, so
            # double-precision `/ 1000` truncates ~1.5% of values off-by-one
            # microsecond vs DuckDB's exact TIMESTAMP_NS->us truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
