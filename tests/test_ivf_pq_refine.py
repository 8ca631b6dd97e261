"""Shortlist-then-refine IVF-PQ (ops/similarity.py:
ivf_pq_topk_refined): exact-composition parity, list-pruned float
reads, and the recall-dominance contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from recover_spark.ops.similarity import (
    build_ivf_index,
    build_pq_sidecar,
    ivf_pq_topk_indexed,
    ivf_pq_topk_refined,
)


def _fixture(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=8)
    build_pq_sidecar(spark, idx, m_subspaces=8, n_codes=16)
    return emb, idx


def test_refined_is_exact_rerank_of_adc_shortlist(spark, tmp_path):
    emb, idx = _fixture(spark, tmp_path)
    queries = emb.filter("vec_id < 3")
    shortlist = ivf_pq_topk_indexed(
        spark, idx, queries, nprobe=2, k=20
    ).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    expect = {}
    by_q: dict[int, list] = {}
    for r in shortlist:
        by_q.setdefault(r["query_vec_id"], []).append(r["vec_id"])
    for q, cands in by_q.items():
        ranked = sorted(
            cands, key=lambda v: (-cos(vecs[q], vecs[v]), v)
        )[:5]
        for rank, v in enumerate(ranked, 1):
            expect[(q, v)] = (rank, cos(vecs[q], vecs[v]))

    got = ivf_pq_topk_refined(
        spark, idx, queries, nprobe=2, shortlist_r=20, k=5
    ).collect()
    assert len(got) == len(expect) == 15
    for r in got:
        rank, c = expect[(r["query_vec_id"], r["vec_id"])]
        assert r["rank"] == rank
        assert abs(r["cosine"] - c) < 1e-9


def test_refine_float_read_is_list_pruned(spark, tmp_path):
    emb, idx = _fixture(spark, tmp_path)
    queries = emb.filter("vec_id < 3")
    df = ivf_pq_topk_refined(
        spark, idx, queries, nprobe=2, shortlist_r=20, k=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # BOTH scans (codes for ADC, floats for refine) carry
    # PartitionFilters on list — the refine never reads unprobed lists
    float_scans = [
        seg
        for seg in plan.split("FileScan")
        if "embedding" in seg[:600] and "ReadSchema" in seg
    ]
    assert float_scans, "refine stage must scan the float corpus"
    # the small broadcast QUERY scan (vec_id < 3 pushdown, unpartitioned
    # testdata parquet) is allowed; every CORPUS float scan must be
    # list-pruned
    corpus_scans = [
        seg for seg in float_scans if "LessThan(vec_id,3)" not in seg
    ]
    assert corpus_scans, "refine must read the index's float corpus"
    for seg in corpus_scans:
        assert "PartitionFilters" in seg
        assert "list" in seg.split("PartitionFilters")[1][:120]
    code_scans = [
        seg for seg in plan.split("FileScan") if "pq_codes" in seg[:400]
    ]
    assert code_scans and all(
        "embedding" not in seg.split("ReadSchema:")[1][:160]
        for seg in code_scans
        if "ReadSchema:" in seg
    )


def test_refined_recall_dominates_adc_at_same_nprobe(spark, tmp_path):
    from recover_spark.ops import brute_force_topk

    emb, idx = _fixture(spark, tmp_path)
    queries = emb.filter("vec_id < 5")
    exact = {
        (r["query_vec_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    for nprobe in (2, 8):
        adc = {
            (r["query_vec_id"], r["vec_id"])
            for r in ivf_pq_topk_indexed(
                spark, idx, queries, nprobe=nprobe, k=5
            ).collect()
        }
        refined = {
            (r["query_vec_id"], r["vec_id"])
            for r in ivf_pq_topk_refined(
                spark, idx, queries, nprobe=nprobe, shortlist_r=20, k=5
            ).collect()
        }
        assert len(refined & exact) >= len(adc & exact)
    # with the shortlist covering every candidate and nprobe=all,
    # refine degenerates to exact brute force
    all_ref = {
        (r["query_vec_id"], r["vec_id"])
        for r in ivf_pq_topk_refined(
            spark, idx, queries, nprobe=8, shortlist_r=10**6, k=5
        ).collect()
    }
    assert all_ref == exact
