"""Round-12 ADVICE regressions: modularity on partially-labeled
graphs, span-excision metadata passthrough + span-struct membership,
token-length-histogram bucket 0, and the AQE-default stats join."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_modularity_partial_labels_is_labeled_subgraph(spark):
    # Triangle {1,2,3} labeled 'a'; node 9 unlabeled, attached to every
    # triangle node.  Labeled subgraph = the bare triangle: m=3,
    # d_total=6, m_in=3 -> Q = 3/3 - (6/6)^2 = 0.
    from recover_spark.ops.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 9), (2, 9), (3, 9)],
        "src long, dst long",
    )
    comms = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a")], "node long, community string"
    )
    rows = modularity(edges, comms).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_nodes"], r["m_in"], r["d_total"]) == (3, 3, 6)
    assert abs(r["q_contribution"]) < 1e-6

    # fully-labeled: unchanged vs the labeled-subgraph formulation
    comms_full = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (9, "b")],
        "node long, community string",
    )
    got = {
        r["community"]: r for r in modularity(edges, comms_full).collect()
    }
    # m=6; a: m_in=3, d=9 -> 3/6 - (9/12)^2 ; b: m_in=0, d=3
    assert got["a"]["m_in"] == 3 and got["a"]["d_total"] == 9
    assert abs(got["a"]["q_contribution"] - (3 / 6 - (9 / 12) ** 2)) < 1e-6
    assert abs(got["b"]["q_contribution"] - (0 - (3 / 12) ** 2)) < 1e-6


def test_span_excision_passes_metadata_and_stays_span_linear(spark):
    from recover_spark.ops.dedup_text import (
        apply_span_excision,
        excise_cross_doc_spans,
    )

    boiler = " ".join(f"tok{i}" for i in range(64))
    docs = spark.createDataFrame(
        [
            (0, f"alpha unique words {boiler}", "en", "web"),
            (1, f"beta different body {boiler}", "en", "book"),
            (2, "gamma has no boilerplate at all", "fr", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    spans = excise_cross_doc_spans(docs, ngram=8, min_docs=2)
    out = apply_span_excision(docs, spans)
    # provenance columns survive the rewrite
    assert set(out.columns) == {
        "doc_id", "text", "n_tokens_removed", "lang", "source"
    }
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["lang"] == "en" and got[1]["source"] == "book"
    assert got[1]["n_tokens_removed"] == 64
    assert "tok0" not in got[1]["text"]
    assert "tok0" in got[0]["text"]  # keep-one survivor
    assert got[2]["n_tokens_removed"] == 0
    # membership plan is span-struct exists, not a flattened
    # per-position array (the quadratic corner)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "exists" in plan and "sequence(span_start" not in plan


def test_token_length_histogram_empty_docs_get_bucket_zero(spark):
    from recover_spark.ops.text_analysis import token_length_histogram

    docs = spark.createDataFrame(
        [
            (0, "", "web"),
            (1, "one", "web"),
            (2, "two words", "web"),
            (3, "...", "web"),  # punctuation-only -> 0 tokens
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["bucket"]: r
        for r in token_length_histogram(docs, "source").collect()
    }
    assert got[0]["n_docs"] == 2  # the empty and punctuation-only docs
    assert (got[0]["lo_tokens"], got[0]["hi_tokens"]) == (0, 0)
    assert got[1]["n_docs"] == 1  # only the true 1-token doc
    assert (got[1]["lo_tokens"], got[1]["hi_tokens"]) == (1, 1)
    assert got[2]["n_docs"] == 1


def test_stats_joins_default_to_aqe_choice(spark):
    # default broadcast_stats=False: no explicit broadcast hint in the
    # analyzed plan; the explicit opt-in still pins one.
    from recover_spark.operators.analytics import (
        moments_by_group,
        standardize,
    )

    df = spark.range(500).selectExpr(
        "CAST(id % 3 AS STRING) g", "CAST(id % 17 AS DOUBLE) v"
    )
    for fn in (moments_by_group, standardize):
        lazy = fn(df, ["g"], "v")._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in lazy
        hinted = (
            fn(df, ["g"], "v", broadcast_stats=True)
            ._jdf.queryExecution().analyzed().toString()
        )
        assert "ResolvedHint" in hinted
