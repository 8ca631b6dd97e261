"""J2 — child-table re-key via join on a generated parent id.

Reference: src/glue/jobs/json_to_parquet.py:539-626 (add_index_to_table):
the relationalized child joins the parent's
``select(index_fields + [fk, "cohort"] (+ ParticipantID)).distinct()``
on the Glue-generated ``id``.

Kept for parity with the reference; the native relationalize
(operators/relationalize.py) avoids this join entirely by carrying parent
keys into children at explode time.  When used, the parent index side is
small and distinct — broadcast it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_index_to_child(
    child: DataFrame,
    parent: DataFrame,
    index_fields: Sequence[str],
    fk_col: str,
    id_col: str = "id",
    extra_cols: Sequence[str] = ("cohort",),
    broadcast_parent: bool = True,
) -> DataFrame:
    """Attach parent index fields to a child keyed by a synthetic id.

    ``parent`` must contain ``fk_col`` (the synthetic key the child's
    ``id_col`` references) plus the index fields.
    """
    carry = list(index_fields) + [c for c in extra_cols if c in parent.columns]
    parent_index = parent.select(
        F.col(fk_col).alias(id_col), *[F.col(c) for c in carry]
    ).distinct()
    if broadcast_parent:
        parent_index = F.broadcast(parent_index)
    return child.join(parent_index, on=id_col, how="inner")
