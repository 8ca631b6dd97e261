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


def test_primed_metadata_matches_parquet_roundtrip(spark, tmp_path):
    """The builder primes the metadata cache with its own driver copy
    (skipping the first collect job); a cold process would collect the
    parquet instead.  Both must be EXACTLY equal — this pins the
    pyarrow-write/Spark-read float64 round trip bit-for-bit."""
    from recover_spark.ops import similarity as sim

    idx = str(tmp_path / "ivf")
    emb = _emb(spark)
    build_ivf_index(emb, idx, n_centroids=4)
    build_pq_sidecar(spark, idx, m_subspaces=2, n_codes=4, dim=8)
    primed_cents = _collect_centroids(spark, idx)
    primed_books = _collect_codebooks(spark, idx)
    sim._INDEX_META_CACHE.clear()  # simulate a cold process
    cold_cents = _collect_centroids(spark, idx)
    cold_books = _collect_codebooks(spark, idx)
    assert cold_cents == primed_cents
    assert sorted(
        (int(r["s"]), int(r["j"]), [float(x) for x in r["center"]])
        for r in cold_books
    ) == sorted(
        (int(r["s"]), int(r["j"]), [float(x) for x in r["center"]])
        for r in primed_books
    )


def test_write_local_parquet_spark_roundtrip(spark, tmp_path):
    """Driver-side pyarrow parquet is read by Spark exactly like
    Spark's own output: same columns, types, and float64 bits."""
    import pyarrow as pa

    from recover_spark.functions.local import write_local_parquet

    out = str(tmp_path / "meta")
    rows = [(0, [0.1, -2.5e300]), (1, [float("inf"), 3.0000000000000004])]
    write_local_parquet(
        rows,
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))],
        out,
    )
    df = spark.read.parquet(out)
    assert [f.simpleString() for f in df.schema.fields] == [
        "vec_id:bigint",
        "embedding:array<double>",
    ]
    got = sorted((r[0], [float(x) for x in r[1]]) for r in df.collect())
    assert got == rows
    import os

    assert os.path.exists(os.path.join(out, "_SUCCESS"))


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


def test_bucket_chain_equals_column_chain(spark):
    """bucket_chain's one-SQL-string form must equal the per-bound
    Column chain it replaced, bound for bound, for both operators."""
    from pyspark.sql import functions as F

    from recover_spark.functions.transforms import bucket_chain

    bounds = [0.1, 2.5, 2.5000000000000004, 97.3, -3.0]
    df = spark.createDataFrame(
        [(float(x),) for x in (-5.0, 0.1, 2.5, 2.50000000000000044, 100.0)],
        "__x double",
    )
    for op in (">", "<="):
        legacy = F.lit(0)
        for b in bounds:
            cmp_col = (
                F.col("__x") > F.lit(b) if op == ">" else F.col("__x") <= F.lit(b)
            )
            legacy = legacy + cmp_col.cast("int")
        got = df.select(
            legacy.alias("a"), bucket_chain("__x", bounds, op=op).alias("b")
        ).collect()
        assert all(r["a"] == r["b"] for r in got), (op, got)
