"""Graph analytics over pair outputs (near-dup graphs, link graphs).

The dedup stack already produces an edge list (Jaccard/MinHash pairs)
and collapses it to components (ops/dedup_text.py:duplicate_clusters).
Triangle enumeration is the next structural signal — triangle-dense
components are true duplicate cliques, triangle-free stars are often
one template document touching many unrelated ones.

Scale design: the textbook x<y<z self-join generates each node's
wedges quadratically in its DEGREE — a power-law hub (one template
matching 10^6 docs) produces 10^12 wedges.  The standard fix is
degree orientation: direct every edge from its lower-(degree, id)
endpoint to the higher one; every node's OUT-degree is then bounded by
~sqrt(2|E|) regardless of its in-degree, so wedge generation is
O(|E|^1.5) worst-case with no hub blowup.  The triangle SET is
orientation-independent, so an external oracle can use the naive
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_enumerate(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """All triangles in the undirected pair graph, one row per
    triangle: (t1, t2, t3) with t1 < t2 < t3.

    Plan: normalize+distinct edges; one degree aggregate; edges orient
    low->high by (degree, id) via two joins to the degree table; wedges
    form per out-neighborhood (bounded by orientation); the closing
    edge check is one more equi-join against the undirected edge set.
    Every step is an equi-join or aggregate on ids — shuffle-keyed,
    AQE-friendly, no nested loop anywhere.
    """
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # orient from lower (degree, id) to higher — ties break on id, so
    # the orientation is total and deterministic
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("__e")
        )
        .select("__e.s", "__e.t")
    )
    x = oriented.select(F.col("s"), F.col("t").alias("t1"))
    y = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = x.join(y, "s").filter(F.col("t1") < F.col("t2"))
    closed = wedges.join(
        e,
        (F.least("t1", "t2") == F.col("u"))
        & (F.greatest("t1", "t2") == F.col("v")),
    )
    tri = F.array_sort(F.array("s", "t1", "t2"))
    return closed.select(
        tri.getItem(0).alias("t1"),
        tri.getItem(1).alias("t2"),
        tri.getItem(2).alias("t3"),
    )
