"""Dump `.explain("formatted")` for headline queries to plans/r14/.

Usage: python tools/dump_plans.py <suffix> [query ...]

Writes plans/r14/<query>_<suffix>.txt for each named query (default:
every headline query).  Lifecycle queries execute their construct
eagerly inside fn(); the plan captured is the returned (probe/read)
DataFrame's — the same plan the bench times with .count().
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from recover_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or benchmod.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    jvm = spark._jvm
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"ok   {name}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
