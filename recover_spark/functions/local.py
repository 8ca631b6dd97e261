"""One-slice local DataFrames for metadata-sized row sets.

``spark.createDataFrame(list_of_rows)`` parallelizes the pickled rows
into ``defaultParallelism`` slices; every action on the frame then pays
one Python-worker round-trip PER SLICE, because the rows deserialize in
Python at task time.  On ``local[32]`` that is 32 round-trips — benign
when they run in parallel (~0.3 s), pathological when an operator
``coalesce(1)``-s the frame for a one-file metadata write: the single
coalesced task chains all 32 round-trips SEQUENTIALLY (measured ~4-5 s
for an 8-row centroid frame; guide §4 — the Python boundary is the per
-crossing cost, so cross once).

``tiny_df`` parallelizes into exactly ONE slice: same pickled-row
semantics, same schema-driven conversions, one round-trip.  Use it for
any driver-built frame that is metadata-sized by construction
(centroids, codebooks, bin-slot grids, literal query sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tiny_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Local DataFrame with a single partition (see module docstring)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )
