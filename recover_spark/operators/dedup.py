"""W1 — keyed latest-record dedup, THE central query of the pipeline.

Reference: src/glue/jobs/json_to_parquet.py:175-221 (drop_table_duplicates)
  - partition by the table's index fields (INDEX_FIELD_MAP, 1-4 columns)
  - order by InsertedDate desc, export_end_date desc when the table has
    an InsertedDate column, else export_end_date desc
  - keep row_number() == 1.

Spark-first notes
-----------------
``row_number over (partition by keys order by ...)`` compiles to a single
shuffle on the dedup keys followed by a sort within partitions — the same
plan shape Spark would pick for any per-key top-1.  At 100 TB the shuffle
is keyed on participant-level composite keys (high cardinality, mild
skew); AQE skew-join/partition splitting handles hot participants.

Ties on the full ordering are nondeterministic in the reference (Glue
window) and here; callers that need reproducibility pass extra
``tiebreakers`` (tests do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_NUM = "__rn"


def dedup_latest(
    df: DataFrame,
    index_fields: Sequence[str],
    order_fields: Sequence[str] | None = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the latest record per composite key.

    ``order_fields`` defaults to the reference's rule: ``InsertedDate``
    desc then ``export_end_date`` desc if the column exists, else
    ``export_end_date`` desc (json_to_parquet.py:201-212).
    """
    if not index_fields:
        raise ValueError("dedup_latest requires at least one index field")
    if order_fields is None:
        cols = set(df.columns)
        if "InsertedDate" in cols:
            order_fields = ["InsertedDate", "export_end_date"]
        elif "export_end_date" in cols:
            order_fields = ["export_end_date"]
        else:
            raise ValueError(
                "no order fields given and neither InsertedDate nor "
                "export_end_date present"
            )
    ordering: list[Column] = [F.col(c).desc() for c in order_fields]
    ordering += [F.col(c).asc() for c in tiebreakers]
    w = Window.partitionBy(*[F.col(c) for c in index_fields]).orderBy(*ordering)
    return (
        df.withColumn(_ROW_NUM, F.row_number().over(w))
        .filter(F.col(_ROW_NUM) == 1)
        .drop(_ROW_NUM)
    )
