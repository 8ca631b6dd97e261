"""A/B harness for graph_kcore at sf0.1: times the full query (build +
count, the bench's boundary) several reps in one JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recover_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_kcore")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm the source scan so rep 1 isn't charged for IO cache
    entrymod._load(spark, sf_dir, "lineitem").count()
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"kcore rep {i}")
        t0 = time.time()
        df = qs["graph_kcore"](spark, sf_dir)
        n = df.count()
        print(f"rep {i}: {time.time() - t0:6.2f}s rows={n}")


if __name__ == "__main__":
    main()
