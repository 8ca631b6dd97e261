"""P1-P11 — curation transforms as native column expressions.

The reference's S3->JSON layer (src/glue/jobs/s3_to_json.py:171-412) is
per-record Python; here each transform is a Catalyst expression that
stays inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from recover_spark.functions.local import tiny_df

# P6 — filename grammar: {Type}_[{Subtype}_][Deleted_]{YYYYMMDD}[-{YYYYMMDD}]
# (s3_to_json.py:788-822; also parsed at compare_parquet_datasets.py:229-312,
# raw/app.py:52-86, raw_sync/app.py:469-510 — one regex replaces all four.)
_FILENAME_RE = (
    r"^([A-Za-z0-9]+?)"          # type
    r"(?:_([A-Za-z0-9]+?))??"     # optional subtype (non-greedy)
    r"(_Deleted)?"                # optional Deleted marker
    r"_(\d{8})(?:-(\d{8}))?"      # end date, optional second date
    r"\.json$"
)


def filename_metadata(filename: Column) -> Column:
    """P6 — parse export filename into a metadata struct.

    Returns struct<type,subtype,is_deleted,start_date,end_date>.  When two
    dates are present the first is the start; ``HealthKitV2*_Deleted``
    types get ``type`` suffixed with ``_Deleted`` like the reference's
    renaming (s3_to_json.py:798-804).
    """
    base = F.element_at(F.split(filename, "/"), -1)
    typ = F.regexp_extract(base, _FILENAME_RE, 1)
    subtype = F.nullif(F.regexp_extract(base, _FILENAME_RE, 2), F.lit(""))
    deleted = F.regexp_extract(base, _FILENAME_RE, 3) != ""
    d1 = F.nullif(F.regexp_extract(base, _FILENAME_RE, 4), F.lit(""))
    d2 = F.nullif(F.regexp_extract(base, _FILENAME_RE, 5), F.lit(""))
    start = F.when(d2.isNotNull(), F.to_date(d1, "yyyyMMdd"))
    end = F.coalesce(F.to_date(d2, "yyyyMMdd"), F.to_date(d1, "yyyyMMdd"))
    return F.struct(
        F.when(deleted, F.concat(typ, F.lit("_Deleted"))).otherwise(typ).alias("type"),
        subtype.alias("subtype"),
        deleted.alias("is_deleted"),
        start.alias("start_date"),
        end.alias("end_date"),
    )


def add_universal_properties(
    df: DataFrame,
    cohort: str,
    export_start_date: str | None = None,
    export_end_date: str | None = None,
) -> DataFrame:
    """P1 — stamp export_start_date / export_end_date / cohort on every row
    (s3_to_json.py:261-288)."""
    return (
        df.withColumn("export_start_date", F.lit(export_start_date).cast("string"))
        .withColumn("export_end_date", F.lit(export_end_date).cast("string"))
        .withColumn("cohort", F.lit(cohort))
    )


def json_string_to_struct(col: Column, schema: T.DataType) -> Column:
    """P3 — parse a JSON-string column into a typed struct
    (SymptomLog.Value, s3_to_json.py:206-208)."""
    return F.from_json(col, schema)


def defensive_json_array(col: Column, element_schema: T.ArrayType) -> Column:
    """P4 — parse JSON-string arrays; empty/malformed -> [] not null
    (CustomFields.Symptoms/Treatments, s3_to_json.py:291-348).

    ``from_json`` yields null on malformed input; coalescing with an
    empty typed array reproduces the reference's logged-empty fallback.
    """
    return F.coalesce(F.from_json(col, element_schema), F.array().cast(element_schema))


def map_to_offset_array(
    col: Column,
    key_name: str = "OffsetInSeconds",
    key_type: str = "int",
    value_name: str = "Metric",
    value_type: str = "double",
) -> Column:
    """P5 — Garmin offset-object normalize: ``{"0": 62, "1": 63}`` ->
    ``[{OffsetInSeconds:0, Metric:62.0}, ...]`` (s3_to_json.py:40-116).

    Input column must be MapType(string, string-castable).  Per-entry
    casts that fail become null (``try_cast``), matching the reference's
    cast guards — under Spark 4 ANSI mode a plain cast would throw.
    Entries sort by numeric offset for deterministic array order.
    """
    entries = F.map_entries(col)
    transformed = F.transform(
        entries,
        lambda e: F.struct(
            e["key"].try_cast(key_type).alias(key_name),
            e["value"].try_cast(value_type).alias(value_name),
        ),
    )
    return F.array_sort(transformed)


def map_to_offset_array_2level(
    col: Column,
    inner_fields: Mapping[str, str],
    key_name: str = "OffsetInSeconds",
    key_type: str = "int",
) -> Column:
    """P5 (2-level) — ``{"0": {"x": 1}}`` -> array<struct<Offset, x...>>
    (s3_to_json.py:351-412 two-level path)."""
    entries = F.map_entries(col)
    transformed = F.transform(
        entries,
        lambda e: F.struct(
            e["key"].try_cast(key_type).alias(key_name),
            *[
                e["value"][name].try_cast(t).alias(name)
                for name, t in inner_fields.items()
            ],
        ),
    )
    return F.array_sort(transformed)


def cast_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """S2 — resolveChoice(match_catalog): project to the declared schema,
    casting observed types; missing columns become typed nulls
    (json_to_parquet.py:157-159)."""
    cols = []
    existing = {c.lower(): c for c in df.columns}
    for f in schema.fields:
        src = existing.get(f.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f"`{src}`").try_cast(f.dataType).alias(f.name))
    return df.select(*cols)


def schema_drift(
    observed: T.StructType, declared: T.StructType
) -> list[dict]:
    """LOG half of the reference's LOG-and-coerce schema-change policy
    (templates/glue-workflow.j2:147-166, SchemaChangePolicy LOG): a
    metadata-only diff of an arriving export's schema against the
    declared catalog schema.  Kinds:

    - ``new_column``: observed but not declared — the coerce DROPS it,
      so without this log a vendor's new field disappears silently;
    - ``type_changed``: declared name arriving with a different type —
      the coerce ``try_cast``s it (unconvertible values -> null);
    - ``missing_column``: declared but absent — becomes a typed null.

    Pure driver-side metadata (no Spark job); name matching is
    case-insensitive, mirroring ``cast_to_schema``.
    """
    obs = {f.name.lower(): f for f in observed.fields}
    dec = {f.name.lower(): f for f in declared.fields}
    out: list[dict] = []
    for key, f in obs.items():
        if key not in dec:
            out.append(
                {
                    "column": f.name,
                    "kind": "new_column",
                    "observed_type": f.dataType.simpleString(),
                    "declared_type": None,
                }
            )
        elif f.dataType.simpleString() != dec[key].dataType.simpleString():
            out.append(
                {
                    "column": dec[key].name,
                    "kind": "type_changed",
                    "observed_type": f.dataType.simpleString(),
                    "declared_type": dec[key].dataType.simpleString(),
                }
            )
    for key, f in dec.items():
        if key not in obs:
            out.append(
                {
                    "column": f.name,
                    "kind": "missing_column",
                    "observed_type": None,
                    "declared_type": f.dataType.simpleString(),
                }
            )
    return out


_DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("observed_type", T.StringType()),
        T.StructField("declared_type", T.StringType()),
    ]
)


def cast_to_schema_logged(
    df: DataFrame, schema: T.StructType, dataset: str = ""
) -> tuple[DataFrame, DataFrame]:
    """S2 with the reference's LOG-and-coerce semantics: returns
    ``(coerced, drift_ledger)``.

    ``coerced`` is exactly ``cast_to_schema(df, schema)`` — output stays
    on the declared schema no matter what arrives.  ``drift_ledger`` is
    a tiny DataFrame (one row per drifted column, schema compatible
    with the A6 ledger union) surfacing what the coerce changed, so a
    re-ingest where the vendor added or retyped a field is visible in
    the audit trail instead of silently normalized away.
    """
    drift = schema_drift(df.schema, schema)
    ledger = tiny_df(
        df.sparkSession,
        [
            (
                dataset,
                d["column"],
                d["kind"],
                d["observed_type"],
                d["declared_type"],
            )
            for d in drift
        ],
        _DRIFT_SCHEMA,
    )
    return cast_to_schema(df, schema), ledger


def reinject_subtype(df: DataFrame, subtype: str, col_name: str = "Type") -> DataFrame:
    """P2 — set the ``Type`` column from the filename subtype for the
    four HealthKit types that carry it (s3_to_json.py:25-30,203-205)."""
    return df.withColumn(col_name, F.lit(subtype))


def ingest_object_filter(key: Column, size: Column | None = None) -> Column:
    """P9 — ingest predicate: reject owner.txt, folder keys, empty
    objects, test events (s3_to_glue/app.py:18-56, dispatch/app.py:22-63)."""
    cond = (
        key.isNotNull()
        & ~key.endswith("/")
        & ~key.contains("owner.txt")
        & (F.element_at(F.split(key, "/"), -1) != "")
    )
    if size is not None:
        cond = cond & (size > 0)
    return cond


def derive_cohort(key: Column) -> Column:
    """P10 — substring match on object key -> cohort
    (s3_to_json.py:964-986)."""
    return (
        F.when(key.contains("adults_v1"), F.lit("adults_v1"))
        .when(key.contains("pediatric_v1"), F.lit("pediatric_v1"))
        .otherwise(F.lit(None).cast("string"))
    )


def drop_synthetic_partitions(df: DataFrame, prefix: str = "partition_") -> DataFrame:
    """S3 — drop Glue-injected partition_* columns
    (json_to_parquet.py:160-165)."""
    return df.drop(*[c for c in df.columns if c.startswith(prefix)])


def normalize_dataset_name(name: Column) -> Column:
    """P8 — lowercase, dots -> underscores (json_to_parquet.py:697)."""
    return F.lower(F.regexp_replace(name, r"\.", "_"))


def materialize_columns(
    df: DataFrame, exprs: Mapping[str, Column]
) -> DataFrame:
    """Evaluate expensive column expressions EXACTLY ONCE per row,
    no matter how many downstream expressions reference them.

    Catalyst substitutes projection aliases into their consumers
    (CollapseProject / predicate pushdown), so a computed column like
    ``tokens(text)`` referenced by several consumers — two ``slice``
    arguments, a filter, a chunker — silently re-pays its full cost
    per reference: measured 4-5x wall-clock on the bigram fan-out at
    sf1.  Caching would fix it at the price of pinning a corpus-sized
    dataset in memory — a non-starter at 100 TB.

    This helper inserts a one-row Generate barrier instead:
    ``explode(array(struct(<exprs>)))`` evaluates every expression
    once and emits the results as GENERATOR OUTPUT attributes, which
    the optimizer cannot substitute back into consumers.  Cardinality
    and ordering are unchanged (the array always has exactly one
    element); the added cost is one struct wrap per row.

    Returns ``df`` with the named columns appended.
    """
    names = list(exprs)
    holder = "__materialize_barrier__"  # collision-resistant internal
    if holder in df.columns:
        raise ValueError(f"materialize_columns: column {holder!r} is reserved")
    packed = F.explode(
        F.array(F.struct(*[exprs[n].alias(n) for n in names]))
    ).alias(holder)
    out = df.select("*", packed)
    for n in names:
        out = out.withColumn(n, F.col(holder)[n])
    return out.drop(holder)


def bucket_chain(col_name: str, bounds, op: str = ">") -> Column:
    """Ordinal bucket index — the count of ``bounds`` passing
    ``col <op> bound`` — as ONE ``F.expr`` SQL string (r14
    optimization).

    Built per-bound with Column operators (``bucket = bucket +
    (col > lit(b)).cast("int")``) the chain costs ~5 py4j round trips
    per bound — ~0.5 s of pure driver time at 63 bounds, per plan
    BUILD, at every bucket-decomposition call site (trimmed stats,
    gini, weighted quantiles, AUC, rank metrics).  The SQL text
    parses to the IDENTICAL Catalyst tree: left-associated integer
    adds in bound order, ``CAST('<repr>' AS DOUBLE)`` folding to the
    bit-identical double literal ``F.lit(b)`` would have produced.
    """
    terms = "".join(
        f" + CAST((`{col_name}` {op} CAST('{float(b)!r}' AS DOUBLE)) AS INT)"
        for b in bounds
    )
    return F.expr("0" + terms)
