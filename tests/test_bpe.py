"""Distributed BPE training vs an independent pure-Python reference."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from recover_spark.ops.bpe import EOW, apply_bpe, train_bpe

CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the new west is the widest west",
]


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _py_train(texts: list[str], num_merges: int, min_weight: int = 2):
    """Independent reference trainer (classic dict-of-words BPE)."""
    vocab = Counter()
    for t in texts:
        vocab.update(_py_tokens(t))
    words = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for it in range(num_merges):
        pair_w = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pair_w[(a, b)] += vocab[w]
        if not pair_w:
            break
        # tie rule: weight desc, then (left, right) asc
        (l, r), wgt = min(
            pair_w.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if wgt < min_weight:
            break
        merges.append((it, l, r, l + r, wgt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def _py_encode(text: str, merges) -> list[str]:
    toks = []
    for w in _py_tokens(text):
        syms = list(w) + [EOW]
        for _, l, r, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_trained_merges_match_reference_exactly(spark, docs):
    expected, _ = _py_train(CORPUS, 12)
    got = [
        (r["iteration"], r["left"], r["right"], r["merged"], r["weight"])
        for r in train_bpe(docs, 12, checkpoint_every=4)
        .orderBy("iteration")
        .collect()
    ]
    assert got == expected


def test_early_stop_below_min_weight(spark, docs):
    # absurdly high threshold: nothing merges
    assert train_bpe(docs, 5, min_pair_weight=10_000).count() == 0


def test_apply_bpe_matches_reference_encoder(spark, docs):
    merges_rows = (
        train_bpe(docs, 8, checkpoint_every=3).orderBy("iteration").collect()
    )
    merges = [(r["left"], r["right"]) for r in merges_rows]
    full = [
        (r["iteration"], r["left"], r["right"], r["merged"], r["weight"])
        for r in merges_rows
    ]
    encoded = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, merges).collect()
    }
    for i, text in enumerate(CORPUS):
        assert encoded[i] == _py_encode(text, full), text


def test_greedy_overlap_semantics(spark):
    # "aaaa" under merge (a,a): non-overlapping left-to-right -> [aa, aa]
    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "id long, text string")
    merges = train_bpe(df, 1).collect()
    assert [(m["left"], m["right"]) for m in merges] == [("a", "a")]
    enc = apply_bpe(df, [("a", "a")]).collect()[0]["bpe_tokens"]
    assert enc == ["aa", "aa", EOW] * 3


def test_batch_guard_rejects_candidate_minting_blocked_symbol():
    """Two symbol-DISJOINT candidates can mint the SAME merged symbol
    via different splits — (a, bc) and (ab, c) both create "abc" — and
    a pair containing that symbol would then gain occurrences from
    BOTH merges, exceeding any single merge's tracked worst-case
    bound.  The prefix guard must therefore stop at a candidate whose
    own merged string was already minted, even when its symbols are
    unblocked and its weight clears the boost bound."""
    from recover_spark.ops.bpe import _select_exact_batch

    top = [
        {"l": "a", "r": "bc", "w": 100},
        {"l": "ab", "r": "c", "w": 90},
        {"l": "p", "r": "q", "w": 80},
    ]
    batch = _select_exact_batch(
        top, complete=True, max_left={}, max_right={},
        budget=8, min_pair_weight=1,
    )
    assert [(c["l"], c["r"]) for c in batch] == [("a", "bc")]


def test_batched_training_respects_created_pair_ordering(spark):
    """The batching hazard the gap guard exists for: in "abc"xN +
    "xy"xN, merging (a,b) creates (ab,c) with the SAME weight as
    (x,y), and the sequential tie rule picks (ab,c) first ("ab" <
    "x").  A naive symbol-disjoint batch would emit (x,y) second;
    the sound guard must stop the batch instead."""
    texts = ["abc xy"] * 7
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    expected, _ = _py_train(texts, 4)
    got = [
        (r["iteration"], r["left"], r["right"], r["merged"], r["weight"])
        for r in train_bpe(df, 4, max_batch_merges=8)
        .orderBy("iteration")
        .collect()
    ]
    assert got == expected
    # premise check: the hazard is actually present in this corpus
    assert (expected[1][1], expected[1][2]) == ("ab", "c")


def test_batching_reduces_driver_round_trips(spark, monkeypatch):
    """Same merge table, fewer collects, on a corpus where batching can
    legitimately fire: the top pairs are spread over many distinct
    one-off contexts (every neighbor/created pair is light), so the
    gap guard admits a multi-merge batch.  Cascade-heavy corpora
    (where a merge's created pair inherits its full weight, e.g. any
    word-final bigram) correctly degenerate to batch size 1 — that
    case is pinned by test_batched_training_respects_created_pair_ordering."""
    texts = (
        ["iabj kabl mabn oabp"] * 5     # (a,b)=20, every context pair 5
        + ["qcdr scdt ucdv"] * 4        # (c,d)=12, context pairs 4
        + ["wefx yefz 0ef1"] * 3        # (e,f)=9,  context pairs 3
        + ["2gh3 4gh5 6gh7"] * 2        # (g,h)=6,  context pairs 2
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    expected, _ = _py_train(texts, 4)

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    calls = {"n": 0}
    orig = CDF.collect

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(CDF, "collect", counting)

    calls["n"] = 0
    batched = train_bpe(df, 4, max_batch_merges=8)
    rows_b = [tuple(r) for r in orig(batched.orderBy("iteration"))]
    n_batched = calls["n"]

    calls["n"] = 0
    serial = train_bpe(df, 4, max_batch_merges=1)
    rows_s = [tuple(r) for r in orig(serial.orderBy("iteration"))]
    n_serial = calls["n"]

    assert rows_b == rows_s
    assert [(r[0], r[1], r[2]) for r in rows_b] == [
        (e[0], e[1], e[2]) for e in expected
    ]
    # all four gapped merges land in ONE batched pass (2 collects)
    # vs four serial passes (4 collects)
    assert n_batched < n_serial, (n_batched, n_serial)


def test_vectorized_encoder_matches_expression_encoder(spark, docs):
    from recover_spark.ops.bpe import apply_bpe_vectorized

    merges_rows = (
        train_bpe(docs, 10, checkpoint_every=4).orderBy("iteration").collect()
    )
    merges = [(r["left"], r["right"]) for r in merges_rows]
    expr_enc = {
        r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()
    }
    vec_enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe_vectorized(docs, merges).collect()
    }
    assert vec_enc == expr_enc
    # pass-through columns preserved
    out = apply_bpe_vectorized(docs, merges)
    assert out.columns == ["doc_id", "text", "bpe_tokens"]


def test_vectorized_encoder_handles_nulls_and_empties(spark):
    from recover_spark.ops.bpe import apply_bpe_vectorized

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "low")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe_vectorized(df, [("l", "o")]).collect()
    }
    assert got[1] == [] and got[2] == []
    assert got[3] == ["lo", "w", EOW]
