"""N1-N3 — nested-data flattening ("relationalize").

Reference: Glue's DynamicFrame.relationalize, invoked at
src/glue/jobs/json_to_parquet.py:682-695, with child-index propagation at
:539-626 and golden semantics in tests/test_json_to_parquet.py:836-906:

  - top-level (and nested) structs flatten into ``Parent_Child`` columns;
  - every array column is replaced in the parent by a foreign key and
    extracted into a child table of ``(id, index, <element columns>)``;
  - child tables are then re-keyed with the parent's index fields +
    ``cohort`` (+ ``ParticipantID`` when present) via an inner join on
    the generated id (J2), with ``Field.val.x`` renamed to ``x`` unless
    that collides (json_to_parquet.py:607-625).

Spark-first design
------------------
Glue generates an opaque ``id`` and re-joins children to parents.  A
shuffle-join per child table is wasteful at scale, so the native path
carries the parent's index columns INTO the child at explode time
(``carry_cols``) — zero extra shuffles, and children end up keyed by
meaningful business keys instead of synthetic ids.  The synthetic-id +
re-join path (J2) is still available in
``recover_spark.operators.index.add_index_to_child`` for parity testing.

Struct flattening is pure projection (no shuffle); array extraction is
``posexplode`` (narrow, no shuffle).  The whole operator is a recursive
plan-builder over ``df.schema`` — no custom Catalyst rule, no RDDs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def has_nested_fields(schema: T.StructType) -> bool:
    """N1 — does the schema contain any array/struct top-level field?

    Reference: json_to_parquet.py:108-128 (has_nested_fields).
    """
    return any(
        isinstance(f.dataType, (T.ArrayType, T.StructType)) for f in schema.fields
    )


def _flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """P7 — flatten struct columns to ``Parent{sep}Child`` until none left."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            return df
        projected: list[Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    projected.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}{sep}{sub.name}"
                        )
                    )
            else:
                projected.append(F.col(f"`{f.name}`"))
        df = df.select(*projected)


def relationalize(
    df: DataFrame,
    name: str,
    carry_cols: Sequence[str] = (),
    sep: str = "_",
) -> dict[str, DataFrame]:
    """N2/N3 — flatten ``df`` into a dict of flat DataFrames.

    Returns ``{name: parent, f"{name}{sep}{arraycol}": child, ...}`` with
    child names lowercased like the reference's output datasets
    (e.g. ``healthkitv2electrocardiogram_subsamples``,
    snowflake/scripts/copy_into_each_parquet_table.sql:24-50).

    Child tables get ``index`` (element position) plus the parent's
    ``carry_cols``; nested arrays recurse, producing grandchildren with
    their ancestors' carry columns plus each level's ``index``.
    """
    out: dict[str, DataFrame] = {}
    df = _flatten_structs(df, sep=sep)
    array_fields = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    parent = df.drop(*array_fields) if array_fields else df
    out[name.lower()] = parent

    for arr in array_fields:
        keep = [c for c in carry_cols if c in df.columns and c != arr]
        child = df.select(
            *[F.col(f"`{c}`") for c in keep],
            F.posexplode(F.col(f"`{arr}`")).alias("index", "val"),
        )
        elem_type = child.schema["val"].dataType
        if isinstance(elem_type, T.StructType):
            rename_taken = set(keep) | {"index"}
            cols: list[Column] = [F.col(f"`{c}`") for c in keep] + [F.col("index")]
            for sub in elem_type.fields:
                # Reference naming: `Field.val.x` -> `x`, falling back to
                # the long form on collision (json_to_parquet.py:616-623).
                target = sub.name if sub.name not in rename_taken else f"{arr}{sep}val{sep}{sub.name}"
                rename_taken.add(target)
                cols.append(F.col(f"val.`{sub.name}`").alias(target))
            child = child.select(*cols)
        else:
            child = child.withColumnRenamed("val", arr)
        child_name = f"{name}{sep}{arr}".lower()
        if has_nested_fields(child.schema):
            nested_carry = list(keep) + ["index"]
            out.update(relationalize(child, child_name, carry_cols=nested_carry, sep=sep))
        else:
            out[child_name] = child
    return out
