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
            (3, "s1", ""),                         # 0 tokens -> bucket 0
            (4, "s2", " ".join(["w"] * 5)),        # 5 tokens -> bucket 3
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source"], r["bucket"]): r
        for r in token_length_histogram(docs, "source").collect()
    }
    # round-12 advice fix: empty docs get their own bucket 0, so the
    # [1, 1] band counts only true 1-token docs
    assert got[("s1", 0)]["n_docs"] == 1
    assert (got[("s1", 0)]["lo_tokens"], got[("s1", 0)]["hi_tokens"]) == (0, 0)
    assert got[("s1", 1)]["n_docs"] == 1
    assert got[("s1", 1)]["n_tokens"] == 1
    assert (got[("s1", 1)]["lo_tokens"], got[("s1", 1)]["hi_tokens"]) == (1, 1)
    assert got[("s1", 2)]["n_docs"] == 1
    assert (got[("s1", 2)]["lo_tokens"], got[("s1", 2)]["hi_tokens"]) == (2, 3)
    assert (got[("s1", 4)]["lo_tokens"], got[("s1", 4)]["hi_tokens"]) == (8, 15)
    assert got[("s1", 1)]["doc_share"] == pytest.approx(0.25, abs=1e-6)
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


def test_chi2_residuals_hand_table(spark):
    """2-bin table with a known shift: a 50/50 base puts the median
    edge BETWEEN the two values, the current era over-fills bin 0.
    N=200, T_cur=100; bin0: R=140, E=70,
    adj = (90-70)/sqrt(70*(1-0.7)*(1-0.5))."""
    import math

    from recover_spark.quality.drift import chi2_cell_residuals

    base = spark.createDataFrame(
        [(float(0),)] * 50 + [(float(10),)] * 50, "x double"
    )
    cur = spark.createDataFrame(
        [(float(0),)] * 90 + [(float(10),)] * 10, "x double"
    )
    got = {
        r["bin"]: r
        for r in chi2_cell_residuals(
            base, cur, ["x"], n_bins=2, edge_accuracy=None
        ).collect()
    }
    expect = 20 / math.sqrt(70 * (1 - 140 / 200) * (1 - 100 / 200))
    assert got[0]["n_base"] == 50 and got[0]["n_cur"] == 90
    assert got[0]["expected_cur"] == pytest.approx(70.0, abs=1e-6)
    assert got[0]["adj_residual"] == pytest.approx(expect, abs=1e-5)
    # the opposite cell of a 2xK table carries the exact opposite sign
    assert got[1]["adj_residual"] == pytest.approx(-expect, abs=1e-5)


def test_centroid_outliers_flags_off_direction_vector(spark):
    from recover_spark.ops.clustering import centroid_outliers

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.1], 1),
        (2, [1.0, -0.1], 1),
        (3, [-1.0, 0.0], 1),   # opposite direction: cosine ~ -1
        (4, [0.0, 1.0], 2),    # lone member: cosine to itself = 1
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["vec_id"]: r
        for r in centroid_outliers(
            emb, "label", dim=2, min_cosine=0.2
        ).collect()
    }
    assert not got[0]["is_outlier"]
    assert not got[1]["is_outlier"]
    assert got[3]["is_outlier"]
    assert got[3]["centroid_cosine"] < -0.9
    assert got[4]["centroid_cosine"] == pytest.approx(1.0, abs=1e-6)
    assert not got[4]["is_outlier"]


def test_round11_plan_pins(spark):
    """Plan contracts for the round-11 operators: the emb_drift fact
    aggregate runs ONCE (checkpoint-pinned diamond), centroid_outliers
    is one aggregate + broadcast join-back, modularity never goes
    cartesian over edges (the one BroadcastNestedLoopJoin is the
    one-row totals broadcast)."""
    import re

    from pyspark.sql import functions as F

    from recover_spark.ops.clustering import (
        centroid_outliers,
        embedding_centroid_drift,
    )
    from recover_spark.ops.graph import modularity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = embedding_centroid_drift(
        emb, "label", F.pmod(F.col("vec_id"), F.lit(2)), dim=64
    )
    p = d._jdf.queryExecution().executedPlan().toString()
    # the pinned aggregate appears as scan-over-checkpoint branches:
    # no second fact-sized hashpartitioning exchange
    assert len(re.findall(r"Exchange hashpartitioning", p)) <= 1, p[:800]
    assert "CartesianProduct" not in p

    o = centroid_outliers(emb, "label", dim=64)
    p2 = o._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", p2)) == 1
    assert "BroadcastHashJoin" in p2 and "CartesianProduct" not in p2

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edges = (
        ev.filter(F.col("event_id") % 11 == 0)
        .select(
            F.col("user_id").alias("src"),
            (F.col("user_id") + 3).alias("dst"),
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    comms = nodes.select("node", (F.col("node") % 4).alias("community"))
    mp = (
        modularity(edges, comms)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in mp
    assert mp.count("BroadcastNestedLoopJoin") == 1  # the 1-row totals


def test_rare_categories_names_the_tail(spark):
    from recover_spark.quality.expectations import rare_categories

    rows = (
        [(i, "common", "en") for i in range(96)]
        + [(96, "typo'd", "en"), (97, "common", "xx"),
           (98, "common", None), (99, None, "en")]
    )
    df = spark.createDataFrame(rows, "id long, seg string, lang string")
    got = {
        (r["column"], r["category"]): r
        for r in rare_categories(df, ["seg", "lang"], max_share=0.05)
        .collect()
    }
    # NULLs excluded from both numerator and denominator
    assert set(got) == {("seg", "typo'd"), ("lang", "xx")}
    assert got[("seg", "typo'd")]["n_rows"] == 1
    assert got[("seg", "typo'd")]["share"] == pytest.approx(
        1 / 99, abs=1e-6
    )
    assert got[("lang", "xx")]["share"] == pytest.approx(1 / 99, abs=1e-6)
