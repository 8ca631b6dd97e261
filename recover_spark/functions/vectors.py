"""Vector math over array<float|double> columns — pure Catalyst.

``F.aggregate``/``F.zip_with`` keep dot products inside codegen; no UDF,
no driver round-trips.  For very wide vectors a Pandas-UDF/numpy path
can batch better — provided in ops/similarity.py as the alternate route.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine where the norms were precomputed (same value as
    ``cosine_similarity`` — identical expressions, same association).

    Norms are per-VECTOR quantities; under a pair-producing join the
    naive form re-folds both arrays per PAIR.  Higher-order array
    functions are interpreted (not codegen'd), so hoisting the norms to
    a map-side projection before the join cuts the per-pair work to the
    one irreducible cross dot product — ~3x on every ANN hot path.
    """
    return dot(a, b) / (norm_a * norm_b)
