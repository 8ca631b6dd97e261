"""V1-V3 — expectation suites compiled to Spark predicates.

Reference: Great Expectations checkpoints over the parquet output
(src/glue/jobs/run_great_expectations_on_parquet.py:179-277) driven by a
JSON spec (src/glue/resources/data_values_expectations.json) using two
expectation types: ``expect_column_values_to_be_between`` (13 numeric
range checks) and ``expect_column_to_exist``.

This module accepts the SAME JSON spec shape and compiles each
expectation to a single filter+aggregate pass — all expectations for a
table evaluate in ONE job (one scan of the data), not one job per
expectation; at 100 TB that is the difference between 1 and 13 scans.
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class ExpectationResult:
    expectation_type: str
    column: str | None
    success: bool
    element_count: int = 0
    unexpected_count: int = 0
    details: dict[str, Any] = field(default_factory=dict)


def parse_suite(spec: str | dict) -> list[Expectation]:
    """Parse the reference's data_values_expectations.json shape:
    ``{table: {"expectations": [{"expectation_type": ..., "kwargs": {...}}]}}``
    or a bare list of expectation dicts."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    if isinstance(spec, dict) and "expectations" in spec:
        items = spec["expectations"]
    elif isinstance(spec, list):
        items = spec
    else:
        raise ValueError("unrecognized expectation suite shape")
    return [
        Expectation(e["expectation_type"], dict(e.get("kwargs", {}))) for e in items
    ]


def _between_condition(kwargs: dict[str, Any]):
    col = F.col(kwargs["column"]).cast("double")
    lo, hi = kwargs.get("min_value"), kwargs.get("max_value")
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (col >= F.lit(float(lo)))
    if hi is not None:
        cond = cond & (col <= F.lit(float(hi)))
    if kwargs.get("mostly") is None:
        # nulls are not counted as unexpected (GE default)
        cond = cond | col.isNull()
    return cond


def run_suite(df: DataFrame, suite: list[Expectation] | str | dict) -> list[ExpectationResult]:
    """V3 — evaluate a suite in one aggregate pass over ``df``."""
    if not isinstance(suite, list) or (suite and not isinstance(suite[0], Expectation)):
        suite = parse_suite(suite)  # type: ignore[arg-type]

    results: list[ExpectationResult] = []
    aggs = []
    agg_slots: list[tuple[int, Expectation]] = []
    for i, exp in enumerate(suite):
        col = exp.kwargs.get("column")
        if exp.expectation_type == "expect_column_to_exist":
            results.append(
                ExpectationResult(exp.expectation_type, col, success=col in df.columns)
            )
        elif exp.expectation_type == "expect_column_values_to_be_between":
            if col not in df.columns:
                results.append(
                    ExpectationResult(
                        exp.expectation_type, col, False, details={"error": "missing column"}
                    )
                )
                continue
            ok = _between_condition(exp.kwargs)
            aggs.append(F.count(F.lit(1)).alias(f"n_{i}"))
            aggs.append(F.sum((~ok).cast("long")).alias(f"bad_{i}"))
            agg_slots.append((i, exp))
        elif exp.expectation_type == "expect_column_values_to_not_be_null":
            aggs.append(F.count(F.lit(1)).alias(f"n_{i}"))
            aggs.append(F.sum(F.col(col).isNull().cast("long")).alias(f"bad_{i}"))
            agg_slots.append((i, exp))
        elif exp.expectation_type == "expect_column_values_to_be_in_set":
            if col not in df.columns:
                results.append(
                    ExpectationResult(
                        exp.expectation_type, col, False, details={"error": "missing column"}
                    )
                )
                continue
            vals = list(exp.kwargs.get("value_set", []))
            # GE default: nulls are skipped, not unexpected
            ok = F.col(col).isin(vals) | F.col(col).isNull()
            aggs.append(F.count(F.lit(1)).alias(f"n_{i}"))
            aggs.append(F.sum((~ok).cast("long")).alias(f"bad_{i}"))
            agg_slots.append((i, exp))
        elif exp.expectation_type == "expect_column_value_lengths_to_be_between":
            if col not in df.columns:
                results.append(
                    ExpectationResult(
                        exp.expectation_type, col, False, details={"error": "missing column"}
                    )
                )
                continue
            ln = F.length(F.col(col))
            lo, hi = exp.kwargs.get("min_value"), exp.kwargs.get("max_value")
            ok = F.lit(True)
            if lo is not None:
                ok = ok & (ln >= F.lit(int(lo)))
            if hi is not None:
                ok = ok & (ln <= F.lit(int(hi)))
            ok = ok | F.col(col).isNull()
            aggs.append(F.count(F.lit(1)).alias(f"n_{i}"))
            aggs.append(F.sum((~ok).cast("long")).alias(f"bad_{i}"))
            agg_slots.append((i, exp))
        elif exp.expectation_type == "expect_column_values_to_be_unique":
            if col not in df.columns:
                results.append(
                    ExpectationResult(
                        exp.expectation_type, col, False, details={"error": "missing column"}
                    )
                )
                continue
            # unexpected = surplus copies beyond one per distinct value;
            # count/count_distinct stay inside the one aggregate pass
            aggs.append(F.count(F.col(col)).alias(f"n_{i}"))
            aggs.append(
                (F.count(F.col(col)) - F.countDistinct(F.col(col))).alias(f"bad_{i}")
            )
            agg_slots.append((i, exp))
        elif exp.expectation_type == "expect_table_row_count_to_be_between":
            aggs.append(F.count(F.lit(1)).alias(f"n_{i}"))
            aggs.append(F.lit(0).cast("long").alias(f"bad_{i}"))
            agg_slots.append((i, exp))
        else:
            results.append(
                ExpectationResult(
                    exp.expectation_type, col, False, details={"error": "unsupported"}
                )
            )

    if agg_slots:
        row = df.agg(*aggs).collect()[0].asDict()
        for i, exp in agg_slots:
            n = row[f"n_{i}"] or 0
            bad = row[f"bad_{i}"] or 0
            if exp.expectation_type == "expect_table_row_count_to_be_between":
                lo = exp.kwargs.get("min_value")
                hi = exp.kwargs.get("max_value")
                success = (lo is None or n >= lo) and (hi is None or n <= hi)
            else:
                mostly = float(exp.kwargs.get("mostly", 1.0))
                success = (n == 0) or ((n - bad) / n >= mostly)
            results.append(
                ExpectationResult(
                    exp.expectation_type,
                    exp.kwargs.get("column"),
                    success,
                    element_count=n,
                    unexpected_count=bad,
                )
            )
    return results


def results_to_json(results: list[ExpectationResult]) -> str:
    """V3 — persistable run summary (the reference stores GE checkpoint
    results + data docs, run_great_expectations_on_parquet.py:223-277)."""
    return json.dumps(
        {
            "success": all(r.success for r in results),
            "statistics": {
                "evaluated_expectations": len(results),
                "successful_expectations": sum(r.success for r in results),
            },
            "results": [
                {
                    "expectation_type": r.expectation_type,
                    "column": r.column,
                    "success": r.success,
                    "element_count": r.element_count,
                    "unexpected_count": r.unexpected_count,
                    **({"details": r.details} if r.details else {}),
                }
                for r in results
            ],
        },
        indent=2,
    )


def persist_run(
    results: list[ExpectationResult],
    artifacts_dir: str,
    suite_name: str,
    run_id: str,
    write_docs: bool = True,
) -> str:
    """Persist one suite run as a checkpoint artifact, mirroring the
    reference's per-run GE result store (run_great_expectations_on_
    parquet.py:223-277: validation results keyed by checkpoint/run id).

    Layout: ``<artifacts_dir>/<suite_name>/<run_id>.json`` plus a
    ``latest.json`` pointer — append-only history per suite, newest run
    addressable without listing.  Driver-side metadata writes only (one
    small JSON per run); the aggregate itself came from the single-scan
    suite evaluation, so persistence adds no Spark work at any scale.

    ``write_docs`` additionally refreshes the suite's human-browsable
    ``index.md`` (``render_data_docs``) — the reference's "build data
    docs after the checkpoint" step.  Returns the artifact path.
    """
    from pathlib import Path

    out_dir = Path(artifacts_dir) / suite_name
    out_dir.mkdir(parents=True, exist_ok=True)
    doc = results_to_json(results)
    path = out_dir / f"{run_id}.json"
    path.write_text(doc)
    (out_dir / "latest.json").write_text(
        json.dumps({"run_id": run_id, "artifact": path.name})
    )
    if write_docs:
        render_data_docs(artifacts_dir, suite_name)
    return str(path)


def load_run(artifacts_dir: str, suite_name: str, run_id: str | None = None) -> dict:
    """Read one persisted suite run back (``run_id=None`` follows the
    ``latest.json`` pointer) — the artifact a downstream gate or a
    results-frame query consumes, proving the store round-trips."""
    from pathlib import Path

    out_dir = Path(artifacts_dir) / suite_name
    if run_id is None:
        run_id = json.loads((out_dir / "latest.json").read_text())["run_id"]
    return json.loads((out_dir / f"{run_id}.json").read_text())


def render_data_docs(artifacts_dir: str, suite_name: str) -> str:
    """Render a suite's persisted run history as a compact markdown
    doc — the data-docs half of the reference's GE flow
    (run_great_expectations_on_parquet.py:223-277 persists checkpoint
    results; the checkpoint's data-docs action renders them for a
    human).  Writes ``<artifacts_dir>/<suite_name>/index.md`` with a
    newest-first run ledger and the latest run's per-expectation
    table; driver-side, bounded by run count, no Spark work.  Returns
    the doc path."""
    from pathlib import Path

    out_dir = Path(artifacts_dir) / suite_name
    runs = sorted(
        p for p in out_dir.glob("*.json") if p.name != "latest.json"
    )
    latest = json.loads((out_dir / "latest.json").read_text())
    lines = [
        f"# Expectation suite: {suite_name}",
        "",
        f"{len(runs)} persisted run(s); latest: `{latest['run_id']}`.",
        "",
        "## Runs",
        "",
        "| run | success | expectations | successful |",
        "|---|---|---|---|",
    ]
    for p in reversed(runs):
        d = json.loads(p.read_text())
        stats = d["statistics"]
        lines.append(
            f"| {p.stem} | {'PASS' if d['success'] else 'FAIL'} "
            f"| {stats['evaluated_expectations']} "
            f"| {stats['successful_expectations']} |"
        )
    latest_doc = json.loads((out_dir / latest["artifact"]).read_text())
    lines += [
        "",
        f"## Latest run: {latest['run_id']}",
        "",
        "| expectation | column | success | elements | unexpected |",
        "|---|---|---|---|---|",
    ]
    for r in latest_doc["results"]:
        lines.append(
            f"| {r['expectation_type']} | {r['column'] or ''} "
            f"| {'PASS' if r['success'] else 'FAIL'} "
            f"| {r['element_count']} | {r['unexpected_count']} |"
        )
    doc_path = out_dir / "index.md"
    doc_path.write_text("\n".join(lines) + "\n")
    return str(doc_path)


def validity_gates(df: DataFrame) -> dict[str, Any]:
    """V4 — dataset validity: non-empty, no duplicated column names
    (compare_parquet_datasets.py:619-642)."""
    cols = df.columns
    dupes = sorted({c for c in cols if cols.count(c) > 1})
    return {
        "empty": df.isEmpty(),
        "duplicate_columns": dupes,
        "valid": (not df.isEmpty()) and not dupes,
    }


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    on: Sequence[str],
    parent_on: Sequence[str] | None = None,
    check_name: str | None = None,
) -> DataFrame:
    """Cross-table expectation the single-table suite cannot express:
    every (non-null) child key must exist in the parent — the V-family
    twin of J1's delete semantics, pointed at validation instead of
    mutation.  The reference's audits count rows per table
    (compare_parquet_datasets.py); an orphaned foreign key keeps every
    count identical while silently breaking downstream joins.

    One left-anti equi-join (Catalyst broadcasts a small parent,
    shuffles otherwise) plus one aggregate.  Child rows with ANY null
    key are SKIPPED, not orphaned (the GX "mostly" convention for
    nulls), and reported separately.  Returns one row:
    (check, n_child, n_null_keys, n_orphans, orphan_share).
    """
    keys = list(on)
    pkeys = list(parent_on) if parent_on is not None else keys
    if len(keys) != len(pkeys):
        raise ValueError("on and parent_on must have the same length")
    non_null = None
    for k in keys:
        c = F.col(k).isNotNull()
        non_null = c if non_null is None else (non_null & c)
    keyed = child.select(*keys)
    p = parent.select(
        *[F.col(pk).alias(f"__p_{i}") for i, pk in enumerate(pkeys)]
    ).dropDuplicates()
    cond = None
    for i, k in enumerate(keys):
        c = keyed[k] == p[f"__p_{i}"]
        cond = c if cond is None else (cond & c)
    orphans = keyed.filter(non_null).join(p, cond, "left_anti")
    stats = keyed.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((~non_null).cast("long")).alias("__nulls"),
    )
    orphan_count = orphans.agg(
        F.count(F.lit(1)).alias("__orphans")
    )
    name = check_name or ("fk_" + "_".join(keys))
    return (
        stats.crossJoin(F.broadcast(orphan_count))
        .select(
            F.lit(name).alias("check"),
            F.col("__n").alias("n_child"),
            F.col("__nulls").alias("n_null_keys"),
            F.col("__orphans").alias("n_orphans"),
            F.round(
                F.col("__orphans")
                / F.greatest(
                    (F.col("__n") - F.col("__nulls")).cast("double"),
                    F.lit(1.0),
                ),
                6,
            ).alias("orphan_share"),
        )
    )


def functional_dependencies(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Discover which candidate functional dependencies a -> b hold in
    the data: for every ORDERED pair of the given columns, a -> b
    holds iff no value of ``a`` maps to two distinct values of ``b`` —
    the schema-knowledge audit the null-rate/range expectations can't
    express ("device_id should determine firmware_version"; a
    violation means a dirty join, a slowly-changing key nobody
    declared, or an ingest merging two entities).

    Returns one row per ordered pair: ``n_keys`` (distinct a values,
    NULLs excluded — a NULL key determines nothing), ``n_violating``
    (a values with >1 distinct b, NULL counted as a value of b since a
    key mapping to both x and NULL is not a function), ``holds``.

    CAVEAT: NULL b-values are folded to the string sentinel
    ``"__null"`` (the entropy-family convention — see
    ``mutual_info_by_group``); a dependent column genuinely containing
    the string ``"__null"`` merges with real NULLs and can mask (never
    fabricate a reverse of) a violation between those two values.

    Engine shape: one (a, b)-distinct aggregate + one a-grain count
    per pair, unioned — k*(k-1) SMALL aggregates over column-pruned
    scans, each with map-side combine; nothing fact-sized survives the
    first aggregate.  Meant for a handful of audit columns, not every
    pair of a 1,000-column table (k² scans — prune first).
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("functional_dependencies: need >= 2 cols")
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            grain = (
                df.filter(F.col(a).isNotNull())
                .select(
                    F.col(a).alias("__a"),
                    F.coalesce(
                        F.col(b).cast("string"), F.lit("__null")
                    ).alias("__b"),
                )
                .distinct()
                .groupBy("__a")
                .agg(F.count(F.lit(1)).alias("__nb"))
            )
            parts.append(
                grain.agg(
                    F.lit(a).alias("determinant"),
                    F.lit(b).alias("dependent"),
                    F.count(F.lit(1)).cast("long").alias("n_keys"),
                    F.coalesce(
                        F.sum((F.col("__nb") > 1).cast("long")),
                        F.lit(0),
                    ).alias("n_violating"),
                ).withColumn(
                    "holds", F.col("n_violating") == F.lit(0)
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rare_categories(
    df: DataFrame,
    cols: Sequence[str],
    max_share: float = 0.005,
    round_digits: int = 6,
) -> DataFrame:
    """Long-tail category audit: per column, the categories whose row
    share falls at or below ``max_share`` — typo'd enum values, stale
    codes, or injection artifacts that the null-rate/range expectations
    can't see and that entropy/HHI only summarize (this NAMES the
    suspect values).  NULL is excluded (it is the null-rate check's
    business, and "rare NULL" is not a category statement).

    Engine shape: all columns ride ONE fact pass — a map-side explode
    to (column, value) structs feeding a single (column, category)
    aggregate with map-side combine; per-column totals are a window
    over the vocabulary-sized cell frame, never a second fact scan.

    Output: (column, category, n_rows, share) for rare categories
    only, ordered by (column, share, category).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("rare_categories: cols must be non-empty")
    if not 0.0 < max_share < 1.0:
        raise ValueError(f"rare_categories: max_share={max_share}")
    from pyspark.sql import Window

    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("category"),
            )
            for c in cols
        ]
    )
    counts = (
        df.select(F.explode(cells).alias("c"))
        .select("c.column", "c.category")
        .filter(F.col("category").isNotNull())
        .groupBy("column", "category")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w = Window.partitionBy("column")
    share = F.col("n_rows") / F.sum("n_rows").over(w)
    # the threshold compares the ROUNDED share (windows can't live in
    # WHERE, and the rounded comparison is engine-stable by
    # construction — the centroid_outliers convention)
    return (
        counts.withColumn(
            "share", F.round(share + F.lit(1e-9), round_digits)
        )
        .filter(F.col("share") <= F.lit(float(max_share)))
        .orderBy("column", "share", "category")
    )
