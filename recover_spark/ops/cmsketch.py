"""Count-min sketch: mergeable point-FREQUENCY estimation per group
(Cormode & Muthukrishnan 2005) — the sketch-family member between the
Misra-Gries heavy-hitter summary (top items only) and exact counting
(a full shuffle of the key universe at 100 TB): "how often did THIS
key occur" for arbitrary keys, from O(depth x width) state per group.

State is the sparse (group, row, col, count) cell table: cell col =
portable 32-bit hash of the value salted by the row index, modulo
``width``.  Cells are PLAIN SUMS — exactly mergeable (map-side
partials in batch, union+re-aggregate across stream batches) and
engine-portable (the md5-derived hash family, so a SQL oracle mirrors
the whole sketch bit-for-bit: estimates hash EXACTLY, no tolerance
flag needed).  The classic guarantee: estimate >= true count always;
estimate <= true + (e/width) * N with probability 1 - (1/2)^depth
over the hash family (fixed here, so the estimate itself is
deterministic).

Scale shape: the build is ONE aggregate over depth-exploded cells
(fact x depth rows in, at most groups x depth x width rows out, far
below the distinct-key universe); a point-query batch is a broadcast-
sized equi-join of query cells to the state + a min-fold per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.hashing import portable_hash32


def cm_cell(value_col, row: int, width: int):
    """Column expr: the sketch column of ``value_col`` in hash row
    ``row`` — portable_hash32 salted by the row index, mod width
    (hash32 is non-negative, so ``%`` agrees across engines)."""
    return (
        portable_hash32(value_col, salt=f"cm{int(row)}")
        % F.lit(int(width))
    ).cast("int")


def cm_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sparse sketch state: (group_cols..., row, col, cnt).
    One explode (depth cells per fact row) + ONE aggregate with
    map-side partials.  NULL values are excluded (they are not a
    countable key)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    keys = list(group_cols)
    v = F.col(value_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cm_cell(v, i, width).alias("col")
            )
            for i in range(int(depth))
        ]
    )
    return (
        df.filter(v.isNotNull())
        .select(*keys, F.explode(cells).alias("c"))
        .groupBy(*keys, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_estimate(
    state: DataFrame,
    queries: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
    count_col: str = "cnt",
) -> DataFrame:
    """Point-frequency estimates for ``queries`` (rows of group_cols +
    value_col) against a built state: min over the depth rows of the
    queried cells, absent cells counting 0.  Output: queries' columns
    + ``cm_count``.  The query side is the small side — the join is
    (group, row, col)-keyed against the bounded state."""
    keys = list(group_cols)
    v = F.col(value_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cm_cell(v, i, width).alias("col")
            )
            for i in range(int(depth))
        ]
    )
    qc = queries.select(
        *keys, v.alias(value_col), F.explode(cells).alias("c")
    ).select(
        *keys,
        value_col,
        F.col("c.row").alias("row"),
        F.col("c.col").alias("col"),
    )
    joined = qc.join(state, [*keys, "row", "col"], "left").select(
        *keys,
        value_col,
        F.coalesce(F.col(count_col), F.lit(0)).alias("__n"),
    )
    return joined.groupBy(*keys, value_col).agg(
        F.min("__n").cast("long").alias("cm_count")
    )
