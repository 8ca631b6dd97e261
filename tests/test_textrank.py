"""TextRank keywords (ops/text_analysis.py:textrank_keywords):
symmetric-graph golden, hub dominance, filtered-adjacency windowing,
and plan sanity."""

from __future__ import annotations

from recover_spark.ops.text_analysis import textrank_keywords


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_symmetric_two_node_graph_splits_rank_evenly(spark):
    docs = _docs(spark, [("s", "alpha beta alpha beta alpha beta")])
    rows = textrank_keywords(docs, top_k=5, iterations=4).collect()
    assert {r["term"] for r in rows} == {"alpha", "beta"}
    for r in rows:
        assert abs(r["score"] - 0.5) < 1e-6
    # equal scores -> term-asc tie: alpha is rank 1
    assert rows[0]["term"] == "alpha" and rows[0]["rank"] == 1


def test_hub_term_outranks_leaves(spark):
    # 'core' is adjacent to every leaf; leaves only touch 'core'
    text = " ".join(f"core leaf{i}" for i in range(6))
    rows = textrank_keywords(
        _docs(spark, [("s", text)]), top_k=3, iterations=4
    ).collect()
    assert rows[0]["term"] == "core"
    assert rows[0]["score"] > rows[1]["score"]


def test_short_tokens_are_windowed_out_not_barriers(spark):
    # 'of' (len 2) is filtered BEFORE pairing, so neural<->networks
    # are adjacent through it; a doc with no len>=3 pairs contributes
    # no graph
    docs = _docs(
        spark,
        [("s", "neural of networks neural of networks"), ("t", "a b c")],
    )
    rows = textrank_keywords(docs, top_k=5, iterations=2).collect()
    assert {r["source"] for r in rows} == {"s"}
    assert {r["term"] for r in rows} == {"neural", "networks"}


def test_per_source_graphs_are_independent_and_plan_sane(spark):
    docs = _docs(
        spark,
        [
            ("a", "storm cloud storm rain storm thunder"),
            ("b", "quiet garden quiet flowers quiet lawn"),
        ],
    )
    out = textrank_keywords(docs, top_k=2, iterations=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r["source"], r["rank"]): r["term"] for r in out.collect()}
    # each source's hub term wins ITS graph; sources never mix
    assert got[("a", 1)] == "storm" and got[("b", 1)] == "quiet"
