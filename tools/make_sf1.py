"""Build an sf1-equivalent dataset (~6M lineitem) from sf0.1.

Replicates the FACT tables 10x with key-shifted replicas (dimension
tables stay fixed — the shape real growth takes, same mechanism as
tools/scale_probe.py), with two content perturbations that keep query
semantics comparable across scale factors:

- ``documents.text`` gets a per-replica suffix tag, so cross-replica
  copies are NOT exact/near duplicates — otherwise every pair-emitting
  dedup query would see quadratically more TRUE pairs at 10x (a data
  artifact, not an operator cost);
- ``embeddings.embedding`` is cyclically rotated by the replica index —
  rotated random-ish vectors are near-orthogonal, so cross-replica
  vectors don't form near-dup/ANN clusters the 1x data lacks.

Usage: python tools/make_sf1.py [out_dir]   (default spark-warehouse/sf1)
Then:  SPARK_GRAFT_SF_DIR=spark-warehouse/sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]
KEY_SHIFTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHIFT = 100_000_000
REPLICAS = 10


def build(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in KEY_SHIFTS.items():
        base = entrymod._load(spark, SF_DIR, t)
        dim = None
        if t == "embeddings":
            dim = len(base.select("embedding").first()[0])
        parts = []
        for i in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if t == "documents" and i > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" #rep{i}"))
                )
            if t == "embeddings" and i > 0:
                shift = i % dim
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", shift + 1, dim - shift),
                        F.slice("embedding", 1, shift),
                    ),
                )
            parts.append(rep)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"  {t}: {REPLICAS}x written", file=sys.stderr)


def main() -> None:
    from recover_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/sf1"
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, out)
    print(f"sf1 dataset at {out}")


if __name__ == "__main__":
    main()
