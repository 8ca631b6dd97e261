"""Round-14 optimization internals: index-metadata caching must be
correct (fresh after every metadata-changing verb) and shared-state
query rewiring must not move a result row."""

from __future__ import annotations

from pyspark.sql import functions as F

from recover_spark.ops.similarity import (
    _collect_centroids,
    _collect_codebooks,
    build_ivf_index,
    build_pq_sidecar,
    rebuild_ivf_index,
)


def _emb(spark, n=64, dim=8):
    rows = [
        (i, [float(((i * 31 + j * 7) % 13) - 6) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_centroid_cache_hits_and_invalidates(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    emb = _emb(spark)
    build_ivf_index(emb, idx, n_centroids=4)
    first = _collect_centroids(spark, idx)
    # second call returns the cached object (no new Spark job needed)
    assert _collect_centroids(spark, idx) is first
    # a rebuild replaces _centroids (new dir inode) -> cache must miss
    rebuild_ivf_index(spark, idx)
    second = _collect_centroids(spark, idx)
    assert second is not first
    # rebuild re-derives the same deterministic centroids
    assert second == first


def test_codebook_cache_tracks_pq_rebuild(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    emb = _emb(spark)
    build_ivf_index(emb, idx, n_centroids=4)
    build_pq_sidecar(spark, idx, m_subspaces=2, n_codes=4, dim=8)
    first = _collect_codebooks(spark, idx)
    assert _collect_codebooks(spark, idx) is first
    # re-running the sidecar build promotes a fresh codebooks dir
    build_pq_sidecar(spark, idx, m_subspaces=2, n_codes=4, dim=8)
    second = _collect_codebooks(spark, idx)
    assert second is not first
    assert [tuple(r) for r in second] == [tuple(r) for r in first]
