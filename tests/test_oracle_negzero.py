"""Negative-zero oracle guard (round-8 verdict task #2).

DuckDB's ``round`` preserves IEEE signed zero, Spark's ``F.round``
goes through BigDecimal (no signed zero) — so an oracle column whose
true value is a tiny negative that the ``+ 1e-9`` nudge doesn't lift
past zero renders ``-0.0`` on the DuckDB side and ``+0.0`` on the
Spark side, hash-mismatching on a repr-style normalizer (the round-8
``emb_pca`` driver red row, root-caused by the judge).

The fix class: every nudge-rounded oracle column appends ``+ 0.0``
(IEEE: ``-0.0 + 0.0 == +0.0``).  Two guards here:

- a STATIC check that every ``round(... 1e-9 ..., d)`` site in
  ``__spark_entry__.py`` carries the ``+ 0.0`` suffix, so the class
  stays closed as queries are added;
- a DYNAMIC fuzz running every oracle against DuckDB at sf0.001 and
  asserting no result cell anywhere is ``-0.0``.
"""

from __future__ import annotations

import math
import os
import re

import pytest

ENTRY = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
SF_DIR = "/root/testdata/sf0.001"


def _nudge_round_sites(src: str):
    """Yield (offset, body, suffix) for every bare round( whose
    balanced body contains the 1e-9 nudge."""
    for m in re.finditer(r"(?<![\w.])round\(", src):
        i = m.end()
        depth, j = 1, i
        while depth:
            if src[j] == "(":
                depth += 1
            elif src[j] == ")":
                depth -= 1
            j += 1
        body = src[i : j - 1]
        if "1e-9" in body:
            yield m.start(), body, src[j : j + 40]


def test_every_nudge_round_site_neutralizes_negative_zero():
    src = open(ENTRY).read()
    sites = list(_nudge_round_sites(src))
    assert len(sites) >= 70, "sweep sanity: the nudge convention exists"
    neutralized = re.compile(r"\s*\+\s*0\.0")  # allows a line wrap
    bad = [
        src[: off].count("\n") + 1
        for off, _, suffix in sites
        if not neutralized.match(suffix)
    ]
    assert not bad, (
        f"__spark_entry__.py lines {bad}: nudge-rounded oracle column "
        "without the ' + 0.0' negative-zero neutralizer"
    )


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_no_oracle_result_contains_negative_zero():
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in entrymod._TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rows = con.execute(sql).fetchall()
        for r in rows:
            for v in r:
                if (
                    isinstance(v, float)
                    and v == 0.0
                    and math.copysign(1.0, v) < 0
                ):
                    offenders.append(name)
                    break
            else:
                continue
            break
    assert not offenders, f"oracles emitting -0.0 at sf0.001: {offenders}"
