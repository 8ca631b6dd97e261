"""Round-11 operators: modularity, embedding centroid drift,
token-length histogram, LSH-recall composition."""

from __future__ import annotations

import pytest

from recover_spark.ops.clustering import embedding_centroid_drift
from recover_spark.ops.graph import modularity
from recover_spark.ops.text_analysis import token_length_histogram


def test_modularity_two_triangles_golden(spark):
    # two triangles bridged by one edge; communities = the triangles.
    # classic golden: q_c = 3/7 - (7/14)^2 each, Q = 2 * 0.178571
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (1, 3),
            (4, 5), (5, 6), (4, 6),
            (3, 4),
            (2, 1),  # reversed duplicate must collapse
            (5, 5),  # self-loop must drop
        ],
        "src long, dst long",
    )
    comms = spark.createDataFrame(
        [(n, "A") for n in (1, 2, 3)] + [(n, "B") for n in (4, 5, 6)],
        "node long, community string",
    )
    rows = {r["community"]: r for r in modularity(edges, comms).collect()}
    for c in ("A", "B"):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["m_in"] == 3
        assert rows[c]["d_total"] == 7
        assert rows[c]["q_contribution"] == pytest.approx(
            3 / 7 - (7 / 14) ** 2, abs=1e-6
        )


def test_modularity_single_community_is_degree_null_model(spark):
    # everything in one community: Q = 1 - 1 = 0 exactly
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    comms = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "node long, community long"
    )
    (r,) = modularity(edges, comms).collect()
    assert r["m_in"] == 2 and r["d_total"] == 4
    assert r["q_contribution"] == pytest.approx(0.0, abs=1e-6)


def test_embedding_drift_orthogonal_and_stable_groups(spark):
    rows = [
        # group "rot": era 0 along x, era 1 along y -> cosine 0
        (0, [1.0, 0.0], "rot"),
        (2, [1.0, 0.0], "rot"),
        (1, [0.0, 1.0], "rot"),
        (3, [0.0, 1.0], "rot"),
        # group "same": identical eras -> cosine 1, norm_ratio 1
        (4, [3.0, 4.0], "same"),
        (5, [3.0, 4.0], "same"),
        # group "half": era 1 doubles the magnitude, direction kept
        (6, [1.0, 1.0], "grow"),
        (7, [2.0, 2.0], "grow"),
        # group with only one era -> absent from output
        (8, [1.0, 0.0], "lonely"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    from pyspark.sql import functions as F

    got = {
        r["label"]: r
        for r in embedding_centroid_drift(
            emb, "label", F.pmod(F.col("vec_id"), F.lit(2)), dim=2
        ).collect()
    }
    assert set(got) == {"rot", "same", "grow"}
    assert got["rot"]["centroid_cosine"] == pytest.approx(0.0, abs=1e-6)
    assert got["same"]["centroid_cosine"] == pytest.approx(1.0, abs=1e-6)
    assert got["same"]["norm_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert got["grow"]["centroid_cosine"] == pytest.approx(1.0, abs=1e-6)
    assert got["grow"]["norm_ratio"] == pytest.approx(2.0, abs=1e-6)
    assert (got["rot"]["n_base"], got["rot"]["n_cur"]) == (2, 2)


def test_token_length_histogram_exact_buckets(spark):
    docs = spark.createDataFrame(
        [
            (0, "s1", "one"),                      # 1 token  -> bucket 1
            (1, "s1", "a b c"),                    # 3 tokens -> bucket 2
            (2, "s1", " ".join(["t"] * 8)),        # 8 tokens -> bucket 4
            (3, "s1", ""),                         # 0 tokens -> bucket 1
            (4, "s2", " ".join(["w"] * 5)),        # 5 tokens -> bucket 3
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source"], r["bucket"]): r
        for r in token_length_histogram(docs, "source").collect()
    }
    assert got[("s1", 1)]["n_docs"] == 2
    assert got[("s1", 1)]["n_tokens"] == 1  # the empty doc adds 0
    assert (got[("s1", 1)]["lo_tokens"], got[("s1", 1)]["hi_tokens"]) == (1, 1)
    assert got[("s1", 2)]["n_docs"] == 1
    assert (got[("s1", 2)]["lo_tokens"], got[("s1", 2)]["hi_tokens"]) == (2, 3)
    assert (got[("s1", 4)]["lo_tokens"], got[("s1", 4)]["hi_tokens"]) == (8, 15)
    assert got[("s1", 1)]["doc_share"] == pytest.approx(0.5, abs=1e-6)
    assert got[("s2", 3)]["doc_share"] == pytest.approx(1.0, abs=1e-6)


def test_lsh_recall_catches_exact_duplicates(spark, monkeypatch):
    import __spark_entry__ as e

    body = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the miller grinds wheat beside the quiet river bank"
    )
    docs = spark.createDataFrame(
        [
            (0, body, "s"),
            (1, body, "s"),  # byte-identical: all bands collide
            (2, "completely different words about ships and harbors "
                "sailing across cold northern water during winter storms",
             "s"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(
        e, "_load", lambda spark_, sf_dir, name: docs
    )
    rows = e.q_dedup_lsh_recall(spark, "ignored").collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["j_band"] == 4  # jaccard 1.0
    assert r["n_pairs"] == 1 and r["n_caught"] == 1
    assert r["recall"] == pytest.approx(1.0, abs=1e-6)


def test_vector_matview_equals_batch_and_replays_idempotently(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from recover_spark.ops.clustering import embedding_centroid_drift
    from recover_spark.streaming.matview import (
        merge_vector_sums,
        read_embedding_drift_matview,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        "label",
        F.pmod(F.col("vec_id"), F.lit(2)).cast("int").alias("era"),
        "embedding",
        "vec_id",
    )
    state = str(tmp_path / "state")
    # fold three disjoint batches (by vec_id residue)
    for bid in range(3):
        merge_vector_sums(
            spark,
            emb.filter(F.col("vec_id") % 3 == bid).drop("vec_id"),
            state,
            ["label", "era"],
            "embedding",
            64,
            batch_id=bid,
        )
    streamed = read_embedding_drift_matview(
        spark, state, "label", "era", 64
    ).collect()
    batch = embedding_centroid_drift(
        emb, "label", F.col("era"), dim=64
    ).collect()
    skey = {(r["label"]): (r["n_base"], r["n_cur"], r["centroid_cosine"],
                           r["norm_ratio"]) for r in streamed}
    bkey = {(r["label"]): (r["n_base"], r["n_cur"], r["centroid_cosine"],
                           r["norm_ratio"]) for r in batch}
    assert skey == bkey  # maintenance invisible at the 6-decimal contract

    # crash replay: re-merging an already-applied batch id is a no-op
    merge_vector_sums(
        spark,
        emb.filter(F.col("vec_id") % 3 == 2).drop("vec_id"),
        state,
        ["label", "era"],
        "embedding",
        64,
        batch_id=2,
    )
    replayed = read_embedding_drift_matview(
        spark, state, "label", "era", 64
    ).collect()
    assert {(r["label"]): (r["n_base"], r["n_cur"]) for r in replayed} == {
        k: v[:2] for k, v in skey.items()
    }
