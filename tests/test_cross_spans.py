"""Cross-document span excision: keep-one survivor rule, maximal-span
merging, and corpus rewrite."""

from __future__ import annotations

from recover_spark.ops.dedup_text import (
    apply_span_excision,
    excise_cross_doc_spans,
)

BOILER = "this footer is shared corporate boilerplate across many pages"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_survives_in_exactly_one_doc(spark):
    # the 10-token boilerplate appears in 4 docs with distinct bodies
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet umber ochre teal",
        "north south east west up down left right fore aft",
    ]
    docs = _docs(
        spark,
        [(i, f"{body} {BOILER}") for i, body in enumerate(bodies)],
    )
    spans = excise_cross_doc_spans(docs, ngram=8, min_docs=2).collect()
    # every doc except the lowest id excises exactly the boilerplate
    assert sorted({r["doc_id"] for r in spans}) == [1, 2, 3]
    # BOILER is 9 tokens at positions 10..18 of each sharing doc
    for r in spans:
        assert (r["span_start"], r["span_end"]) == (10, 18)
        assert r["n_tokens_removed"] == 9

    cleaned = {
        r["doc_id"]: r["text"]
        for r in apply_span_excision(
            docs, excise_cross_doc_spans(docs, ngram=8, min_docs=2)
        ).collect()
    }
    n_with_boiler = sum(BOILER in t for t in cleaned.values())
    assert n_with_boiler == 1 and BOILER in cleaned[0]
    # bodies are untouched everywhere
    for i, body in enumerate(bodies):
        assert cleaned[i].startswith(body)


def test_adjacent_duplicated_regions_merge_to_one_maximal_span(spark):
    # two distinct 8-token boilerplates placed back-to-back in doc 1:
    # their redundant windows (plus the bridging windows that span the
    # seam, which also repeat in no other doc) must merge into ONE span
    a = "aa bb cc dd ee ff gg hh"
    b = "ii jj kk ll mm nn oo pp"
    docs = _docs(
        spark,
        [
            (0, f"{a} solo filler body text one two three"),
            (5, f"{b} other filler body text four five six"),
            (9, f"unique leading words here {a} {b} trailing bits"),
        ],
    )
    spans = excise_cross_doc_spans(docs, ngram=8, min_docs=2).collect()
    assert len(spans) == 1
    (r,) = spans
    assert r["doc_id"] == 9
    # tokens 4..19 are the two boilerplates
    assert (r["span_start"], r["span_end"]) == (4, 19)
    assert r["n_tokens_removed"] == 16


def test_within_doc_repeat_is_not_cross_doc(spark):
    # a span repeated twice INSIDE one doc but in no other doc is not
    # this operator's business (dedup_spans owns within-doc repeats)
    docs = _docs(
        spark,
        [
            (0, f"{BOILER} middle words then again {BOILER}"),
            (1, "entirely different content with no shared windows at all"),
        ],
    )
    assert excise_cross_doc_spans(docs, ngram=8, min_docs=2).count() == 0


def test_short_docs_yield_no_shingles(spark):
    docs = _docs(spark, [(0, "too short"), (1, "too short")])
    assert excise_cross_doc_spans(docs, ngram=8, min_docs=2).count() == 0
