"""IVF-PQ: codebook training (Lloyd step, empty-cell rule), encode/ADC
scoring, persisted-sidecar parity and partition pruning."""

from __future__ import annotations

import math

import pytest

from recover_spark.ops.similarity import (
    brute_force_topk,
    build_ivf_index,
    build_pq_sidecar,
    ivf_pq_topk,
    ivf_pq_topk_indexed,
    train_pq_codebooks,
)


def test_codebooks_one_lloyd_step_hand_computed(spark):
    # m=2 subspaces of dim 2; seeds = rows 0 and 1
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [1.0, 1.0, 12.0, 12.0]),
        (2, [0.2, 0.2, 10.5, 10.5]),
        (3, [0.9, 0.9, 11.8, 11.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(
        df, m_subspaces=2, n_codes=2, dim=4, iterations=1
    )
    # subspace 0: rows 0,2 -> code 0; rows 1,3 -> code 1
    assert books[0][0] == (0, [0.1, 0.1])
    assert books[0][1] == (1, pytest.approx([0.95, 0.95]))
    # subspace 1: rows 0,2 -> code 0 (mean 10.25); rows 1,3 -> code 1
    assert books[1][0] == (0, pytest.approx([10.25, 10.25]))
    assert books[1][1] == (1, pytest.approx([11.9, 11.9]))


def test_codebooks_empty_cell_keeps_init(spark):
    # duplicate seeds: both assign to code 0 (lowest-id tie), so code 1
    # wins no members and must keep its init center
    rows = [
        (0, [1.0, 2.0]),
        (1, [1.0, 2.0]),
        (2, [1.2, 2.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(
        df, m_subspaces=1, n_codes=2, dim=2, iterations=1
    )
    assert books[0][1] == (1, [1.0, 2.0])  # untouched init
    got = books[0][0][1]
    assert got == pytest.approx([(1.0 + 1.0 + 1.2) / 3, (2.0 + 2.0 + 2.2) / 3])


def test_zero_iterations_exhaustive_codes_reconstruct_exactly(spark):
    """With every corpus row a seed and 0 Lloyd iterations, each
    subvector encodes to itself: the ADC score IS the exact cosine."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    small = emb.filter("vec_id < 12")
    queries = small.filter("vec_id < 2")
    got = ivf_pq_topk(
        small,
        queries,
        n_centroids=4,
        nprobe=4,  # all lists: pruning off, isolates the ADC math
        k=3,
        m_subspaces=8,
        n_codes=12,
        train_iterations=0,
    ).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in small.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    assert len(got) == 6  # 2 queries x k=3
    for r in got:
        expect = cos(vecs[r["query_vec_id"]], vecs[r["vec_id"]])
        assert r["pq_cosine"] == pytest.approx(expect, abs=1e-9)


def test_indexed_matches_in_memory_and_prunes(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=8)
    build_pq_sidecar(spark, idx, m_subspaces=8, n_codes=16)

    direct = {
        (r["query_vec_id"], r["vec_id"], r["rank"], round(r["pq_cosine"], 9))
        for r in ivf_pq_topk(
            emb, queries, n_centroids=8, nprobe=2, k=5,
            m_subspaces=8, n_codes=16,
        ).collect()
    }
    idf = ivf_pq_topk_indexed(spark, idx, queries, nprobe=2, k=5)
    indexed = {
        (r["query_vec_id"], r["vec_id"], r["rank"], round(r["pq_cosine"], 9))
        for r in idf.collect()
    }
    assert indexed == direct

    # the probe reads only probed code partitions, never float vectors
    plan = idf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "list" in plan.split("PartitionFilters")[1][:120]
    # the candidate scan reads codes only (long Locations get elided in
    # toString, so pin the ReadSchema rather than the path)
    scans = [
        seg
        for seg in plan.split("FileScan")
        if "pq_codes" in seg[:400] and "ReadSchema" in seg
    ]
    assert scans, "candidate scan must come from the code sidecar"
    schema = scans[0].split("ReadSchema:")[1][:160]
    assert "pq_codes" in schema and "embedding" not in schema


def test_append_pq_sidecar_freezes_codebooks_and_encodes_only_new(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from recover_spark.ops.similarity import (
        append_ivf_index,
        append_pq_sidecar,
        ivf_pq_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    half = n // 2
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < half), idx, n_centroids=8)
    build_pq_sidecar(spark, idx)
    cb_before = sorted(
        (r["s"], r["j"], tuple(r["center"]))
        for r in spark.read.parquet(f"{idx}/_pq/codebooks").collect()
    )

    rest = emb.filter(F.col("vec_id") >= half)
    append_ivf_index(rest, idx)
    append_pq_sidecar(spark, rest, idx)

    # codebooks are FROZEN: byte-identical after the append
    cb_after = sorted(
        (r["s"], r["j"], tuple(r["center"]))
        for r in spark.read.parquet(f"{idx}/_pq/codebooks").collect()
    )
    assert cb_after == cb_before

    # every corpus row has exactly one code tuple, old rows untouched
    codes = spark.read.parquet(f"{idx}/_pq/codes")
    assert codes.count() == n
    assert codes.select("vec_id").distinct().count() == n

    # a probe of the maintained index equals a probe of an index whose
    # sidecar was built in one shot over the SAME frozen codebooks:
    # rebuild the comparison by encoding everything against cb_before
    # via a second append-only path
    idx2 = str(tmp_path / "ivf2")
    build_ivf_index(emb.filter(F.col("vec_id") < half), idx2, n_centroids=8)
    build_pq_sidecar(spark, idx2)
    append_ivf_index(rest, idx2)
    append_pq_sidecar(spark, rest, idx2)
    q = emb.filter("vec_id < 2")
    a = {
        (r["query_vec_id"], r["vec_id"], r["rank"])
        for r in ivf_pq_topk_indexed(spark, idx, q, nprobe=8, k=5).collect()
    }
    b = {
        (r["query_vec_id"], r["vec_id"], r["rank"])
        for r in ivf_pq_topk_indexed(spark, idx2, q, nprobe=8, k=5).collect()
    }
    assert a == b and len(a) == 10


def test_pq_recall_high_on_clustered_vectors(spark):
    """The sf-table PQ recall (~0.4) reflects UNSTRUCTURED random
    vectors — PQ's worst case.  On clustered data (its design regime:
    points = cluster center + small deterministic perturbation) the
    ADC ranking must recover most of the exact top-k."""
    import hashlib
    import math

    def h01(s: str) -> float:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF

    dim, n_clusters, per = 16, 8, 25
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [h01(f"c{c}d{d}") * 2 - 1 for d in range(dim)]
        for p in range(per):
            vec = [
                center[d] + 0.05 * (h01(f"p{c}.{p}.{d}") * 2 - 1)
                for d in range(dim)
            ]
            rows.append((vid, vec))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 2")
    exact = {
        (r["query_vec_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    appr_rows = ivf_pq_topk(
        emb, queries,
        n_centroids=4, nprobe=4,  # all lists: isolate quantization
        k=10, m_subspaces=4, n_codes=16, dim=dim,
    ).collect()
    appr = {(r["query_vec_id"], r["vec_id"]) for r in appr_rows}
    # exact top-k WITHIN a tight cluster is a near-tie lottery that
    # reconstruction cannot (and need not) resolve; the PQ contract is
    # the cluster level: every retrieved neighbor comes from the
    # query's own cluster, and most of the exact set is still found
    for r in appr_rows:
        assert r["vec_id"] // per == r["query_vec_id"] // per, r
    recall = len(exact & appr) / len(exact)
    assert recall >= 0.6, recall
