"""Round-12 bespoke probes (SCALE.md documents results):

1. `apply_span_excision` on a BOILERPLATE-HEAVY fixture (most of every
   doc excised — the template-flood corner VERDICT r11 flagged): the
   membership test is now F.exists over the maximal (start, end) span
   structs, O(tokens x n_spans) per doc.  Probed on TWO axes:
   - doc-count 10x at fixed shape (expect ~linear wall);
   - doc-LENGTH 4x at ~90% excision (the quadratic corner's axis: the
     flattened-position-array form would go ~16x per doc, the span
     form ~4x).
2. `ivf_pq_topk_refined` at a 1x vs 10x index (build untimed, probe
   timed — the maintenance_probe convention): the ADC shortlist scan
   and the float refine scan are both PartitionFilters-pruned, so the
   probe should track probed-list bytes, not corpus size.

Usage: python tools/round12_probes.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 100_000_000


def _boiler_docs(spark, n_docs: int, body_tokens: int, boiler_tokens: int):
    """n_docs docs: `body_tokens` unique tokens + `boiler_tokens` of
    SHARED boilerplate — after excision all but one doc keeps only its
    body (~boiler/(body+boiler) of every doc removed)."""
    from pyspark.sql import functions as F

    boiler = " ".join(f"btok{i}" for i in range(boiler_tokens))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(body_tokens - 1)),
                    lambda i: F.concat(
                        F.lit("u"), F.col("id").cast("string"),
                        F.lit("x"), i.cast("string"),
                    ),
                ),
                " ",
            ),
            F.lit(" " + boiler),
        ).alias("text"),
    )


def _time_rewrite(spark, docs) -> tuple[float, int]:
    from recover_spark.ops.dedup_text import (
        apply_span_excision,
        excise_cross_doc_spans,
    )

    docs = docs.localCheckpoint(eager=True)  # fixture cost out of the timing
    t0 = time.time()
    spans = excise_cross_doc_spans(docs, ngram=8, min_docs=2)
    out = apply_span_excision(docs, spans)
    n = out.count()
    removed = out.agg({"n_tokens_removed": "sum"}).first()[0]
    return time.time() - t0, n, int(removed or 0)


def probe_excision(spark) -> dict:
    res = {}
    # warm-up: pay codegen/Arrow-worker startup before any timed leg
    _time_rewrite(
        spark, _boiler_docs(spark, 50, body_tokens=10, boiler_tokens=90)
    )
    # axis 1: docs 10x (500 -> 5000), ~90% of each doc is boilerplate
    for tag, n in (("1x", 500), ("10x", 5000)):
        dt, rows, removed = _time_rewrite(
            spark, _boiler_docs(spark, n, body_tokens=10, boiler_tokens=90)
        )
        res[f"docs_{tag}"] = {"sec": round(dt, 2), "rows": rows,
                              "removed": removed}
        print(f"  excision docs {tag}: {rows} rows, {removed} removed, "
              f"{dt:.2f}s", file=sys.stderr)
    # axis 2: doc length 4x at fixed 500 docs, ~90% excision
    for tag, mult in (("len1x", 1), ("len4x", 4)):
        dt, rows, removed = _time_rewrite(
            spark,
            _boiler_docs(
                spark, 500, body_tokens=10 * mult, boiler_tokens=90 * mult
            ),
        )
        res[tag] = {"sec": round(dt, 2), "rows": rows, "removed": removed}
        print(f"  excision {tag}: {rows} rows, {removed} removed, "
              f"{dt:.2f}s", file=sys.stderr)
    return res


def probe_pq_refined(spark, entrymod) -> dict:
    from pyspark.sql import functions as F

    from recover_spark.ops.similarity import (
        build_ivf_index,
        build_pq_sidecar,
        ivf_pq_topk_refined,
    )

    base = entrymod._load(spark, SF_DIR, "embeddings")
    res = {}
    # warm-up probe against a throwaway small index
    warm_idx = "spark-warehouse/r12_pq_refined_warm"
    warm = base.filter(F.col("vec_id") < 500)
    build_ivf_index(warm, warm_idx, n_centroids=8)
    build_pq_sidecar(spark, warm_idx)
    ivf_pq_topk_refined(
        spark, warm_idx, base.filter(F.col("vec_id") < 3),
        nprobe=2, shortlist_r=20, k=5,
    ).count()
    for tag, replicas in (("1x", 1), ("10x", 10)):
        parts = [
            base.select(
                (F.col("vec_id") + r * SHIFT).alias("vec_id"),
                "embedding", "label",
            )
            for r in range(replicas)
        ]
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        idx = f"spark-warehouse/r12_pq_refined_{tag}"
        build_ivf_index(corpus, idx, n_centroids=8)
        build_pq_sidecar(spark, idx)
        queries = base.filter(F.col("vec_id") < 3)
        t0 = time.time()
        n = ivf_pq_topk_refined(
            spark, idx, queries, nprobe=2, shortlist_r=20, k=5
        ).count()
        dt = time.time() - t0
        res[tag] = {"sec": round(dt, 2), "rows": n}
        print(f"  pq_refined {tag}: {n} rows, {dt:.2f}s", file=sys.stderr)
    return res


def main() -> None:
    import __spark_entry__ as entrymod
    from recover_spark.session import get_spark

    spark = get_spark("round12_probes")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "excision": probe_excision(spark),
        "pq_refined": probe_pq_refined(spark, entrymod),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
