"""SQL interface: run ANSI SQL text against the engine's tables.

The DataFrame operators and this SQL surface compile to the SAME
Catalyst logical plans — ``spark.sql`` is not a second engine, just a
second front-end (the reference's serving layer is likewise plain SQL,
snowflake/objects/.../copy_into_table_from_stage.sql:17-35).  Views are
registered lazily over the parquet datasets, so predicate pushdown,
partition pruning, and column pruning apply to SQL queries exactly as
they do to DataFrame chains.

Queries written in the portable ANSI subset (no engine-specific
date/string functions) run unchanged on DuckDB — the correctness
contract exploits this by feeding the identical text to both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from recover_spark.sources.readers import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(
    spark: SparkSession, sf_dir: str, tables: Sequence[str] = TABLES
) -> None:
    """Register each benchmark table as a temp view named after itself."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register views for ``sf_dir`` and evaluate ``query`` with
    ``spark.sql`` (lazy — the caller triggers execution)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
