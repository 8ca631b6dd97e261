"""A/B harness for one headline query at sf0.1: times the full query
(build + count, the bench's boundary) several reps in one JVM.

Usage: python tools/ab_query.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recover_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm the source scans so rep 1 isn't charged for IO cache
    for t in entrymod._TABLES:
        try:
            entrymod._load(spark, sf_dir, t).count()
        except Exception:
            pass
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep {i}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        print(f"rep {i}: {time.time() - t0:6.2f}s rows={n}")


if __name__ == "__main__":
    main()
