"""Maintenance-op scale probe (VERDICT r6 #9): measure — not just
plan-pin — the O(touched) claims of the index maintenance verbs at 10x
index size.

Layout under test: the index grows 10x while the per-bucket byte size
stays constant (num_buckets scales with the corpus — exactly how a
100 TB index is laid out), and the maintenance workload (one appended
batch, one deletion list) stays FIXED.  Under the O(touched buckets)
cost contract the wall-clock should stay ~flat between 1x and 10x; an
O(index) regression shows up as a ~10x ratio.  Probes:

- ``compact_text_index``  — fold the appended batch's file accretion
- ``delete_from_text_index`` — right-to-be-forgotten batch
- ``compact_ivf_index``   — the IVF sibling fold

Usage: python tools/maintenance_probe.py [replicas]    (default 10)
Prints one JSON line; SCALE.md documents results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 100_000_000


def _scaled_docs(spark, entrymod, replicas: int):
    """Key-shifted replicas with ROTATED text so the vocabulary and the
    bucket occupancy grow with the corpus (byte-identical replicas
    would pile the same terms into the same buckets)."""
    from pyspark.sql import functions as F

    base = entrymod._load(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = []
    for r in range(replicas):
        part = base.select(
            (F.col("doc_id") + r * SHIFT).alias("doc_id"),
            (
                F.concat(F.col("text"), F.lit(f" replica{r}tag"))
                if r
                else F.col("text")
            ).alias("text"),
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _scaled_vecs(spark, entrymod, replicas: int):
    from pyspark.sql import functions as F

    base = entrymod._load(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    parts = [
        base.select(
            (F.col("vec_id") + r * SHIFT).alias("vec_id"), "embedding"
        )
        for r in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from recover_spark.ops.similarity import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
    )
    from recover_spark.ops.text_index import (
        append_text_index,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
    )
    from recover_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("maint_probe")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join("spark-warehouse", "maint_probe")
    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(root)

    docs1 = _scaled_docs(spark, entrymod, 1).localCheckpoint(eager=True)
    docsN = _scaled_docs(spark, entrymod, replicas).localCheckpoint(
        eager=True
    )
    # the FIXED maintenance workload: one appended batch + one
    # deletion list, identical at both scales.  The batch's VOCABULARY
    # is deliberately tiny (10 distinct terms) so it lands in a
    # bounded set of term buckets at EITHER scale — the
    # untouched-bucket-dominated layout the O(touched) contract is
    # about; a batch whose vocabulary exceeds the bucket count would
    # legitimately touch every bucket and scale with the index.
    from pyspark.sql import functions as F  # noqa: F401

    batch = spark.range(0, 40).selectExpr(
        "id + 900000000 AS doc_id",
        "concat('mproben', CAST(id % 5 AS STRING), "
        "' mprobeterm', CAST(id % 2 AS STRING)) AS text",
    ).localCheckpoint(eager=True)
    victims = [int(r["doc_id"]) for r in
               docs1.filter("doc_id % 211 = 0").select("doc_id")
               .limit(50).collect()]

    results: dict[str, dict] = {}

    def probe_text(tag: str, docs, nb: int) -> dict:
        path = os.path.join(root, f"text_{tag}")
        build_text_index(docs, path, num_buckets=nb)
        # the build itself writes one file per shuffle partition per
        # bucket; fold that ONCE untimed so the timed pass measures
        # the steady-state week-over-week shape (everything compact
        # except the buckets the new batch touched)
        compact_text_index(spark, path)
        append_text_index(batch, path)
        t0 = time.time()
        compact_text_index(spark, path)
        t_compact = time.time() - t0
        t0 = time.time()
        delete_from_text_index(spark, path, victims)
        t_delete = time.time() - t0
        return {"compact_sec": round(t_compact, 3),
                "delete_sec": round(t_delete, 3)}

    def probe_ivf(tag: str, vecs, nlists: int) -> dict:
        path = os.path.join(root, f"ivf_{tag}")
        build_ivf_index(vecs, path, n_centroids=nlists)
        compact_ivf_index(spark, path)  # untimed post-build fold
        # bounded-touch append: 500 copies of 5 source vectors land in
        # at most 5 lists at either scale (same rationale as the
        # small-vocabulary text batch)
        five = vecs.limit(5).selectExpr(
            "vec_id AS src_id", "embedding"
        )
        small = (
            spark.range(0, 500)
            .selectExpr("id + 900000000 AS vec_id", "id % 5 AS k")
            .join(
                five.selectExpr(
                    "src_id % 5 AS k2", "src_id", "embedding"
                ).dropDuplicates(["k2"]),
                F.expr("k = k2"),
            )
            .select("vec_id", "embedding")
        )
        append_ivf_index(small, path)
        t0 = time.time()
        compact_ivf_index(spark, path)
        return {"compact_sec": round(time.time() - t0, 3)}

    print("probing text index 1x...", file=sys.stderr)
    one = probe_text("1x", docs1, 32)
    print("probing text index 10x...", file=sys.stderr)
    ten = probe_text("10x", docsN, 32 * replicas)
    results["compact_text_index"] = {
        "t_1x_sec": one["compact_sec"],
        f"t_{replicas}x_sec": ten["compact_sec"],
        "ratio": round(ten["compact_sec"] / one["compact_sec"], 2),
    }
    results["delete_from_text_index"] = {
        "t_1x_sec": one["delete_sec"],
        f"t_{replicas}x_sec": ten["delete_sec"],
        "ratio": round(ten["delete_sec"] / one["delete_sec"], 2),
    }

    vecs1 = _scaled_vecs(spark, entrymod, 1).localCheckpoint(eager=True)
    vecsN = _scaled_vecs(spark, entrymod, replicas).localCheckpoint(
        eager=True
    )
    print("probing ivf 1x...", file=sys.stderr)
    ivf1 = probe_ivf("1x", vecs1, 32)
    print("probing ivf 10x...", file=sys.stderr)
    ivfN = probe_ivf("10x", vecsN, 32 * replicas)
    results["compact_ivf_index"] = {
        "t_1x_sec": ivf1["compact_sec"],
        f"t_{replicas}x_sec": ivfN["compact_sec"],
        "ratio": round(ivfN["compact_sec"] / ivf1["compact_sec"], 2),
    }

    print(json.dumps({"replicas": replicas, "probes": results}))
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
