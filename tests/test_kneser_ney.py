"""Interpolated Kneser-Ney bigrams (ops/text_analysis.py:
kneser_ney_bigrams): every probability vs an independent Python
reference, the per-context sum-to-1 invariant over the full event
space, and the discount guard."""

from __future__ import annotations

import re
from collections import Counter

import pytest


def _py_model(texts, d=0.75):
    bc: Counter = Counter()
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9']+", t.lower()) if w]
        bc.update(zip(toks, toks[1:]))
    ctx_total: Counter = Counter()
    fanout: Counter = Counter()
    n_contexts: Counter = Counter()
    for (w1, w2), c in bc.items():
        ctx_total[w1] += c
        fanout[w1] += 1
        n_contexts[w2] += 1
    n_total = len(bc)

    def p(w1, w2):
        cont = n_contexts[w2] / n_total
        lam = d * fanout[w1] / ctx_total[w1]
        return max(bc.get((w1, w2), 0) - d, 0.0) / ctx_total[w1] + lam * cont

    return bc, ctx_total, fanout, n_contexts, n_total, p


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestKneserNey:
    def test_probabilities_match_python_reference(self, spark):
        from recover_spark.ops.text_analysis import kneser_ney_bigrams

        docs = _docs(spark)
        texts = [r["text"] for r in docs.select("text").collect()]
        *_, p = _py_model(texts)
        rows = kneser_ney_bigrams(docs, min_count=1).collect()
        assert rows
        for r in rows:
            assert r["p_kn"] == pytest.approx(
                p(r["w1"], r["w2"]), abs=2e-6
            ), (r["w1"], r["w2"])

    def test_context_probabilities_sum_to_one(self, spark):
        from recover_spark.ops.text_analysis import kneser_ney_bigrams

        docs = _docs(spark)
        texts = [r["text"] for r in docs.select("text").collect()]
        bc, ctx_total, fanout, n_contexts, n_total, p = _py_model(texts)
        rows = kneser_ney_bigrams(docs, min_count=1).collect()
        vocab_w2 = set(n_contexts)
        # pick the highest-fanout context and sum over the FULL event
        # space: observed pairs at their output probability, unseen
        # vocab words at the interpolated floor lambda * P_cont
        w1 = max(fanout, key=lambda w: fanout[w])
        seen = {r["w2"]: r["p_kn"] for r in rows if r["w1"] == w1}
        lam = 0.75 * fanout[w1] / ctx_total[w1]
        total = sum(seen.values()) + sum(
            lam * n_contexts[w2] / n_total
            for w2 in vocab_w2 - set(seen)
        )
        assert total == pytest.approx(1.0, abs=1e-3)

    def test_min_count_filters_output_not_model(self, spark):
        from recover_spark.ops.text_analysis import kneser_ney_bigrams

        docs = _docs(spark)
        all_rows = {
            (r["w1"], r["w2"]): r["p_kn"]
            for r in kneser_ney_bigrams(docs, min_count=1).collect()
        }
        filtered = kneser_ney_bigrams(docs, min_count=5).collect()
        assert 0 < len(filtered) < len(all_rows)
        for r in filtered:
            # same probabilities — the threshold prunes output rows,
            # never the counts behind the model
            assert r["p_kn"] == all_rows[(r["w1"], r["w2"])]
            assert r["bigram_count"] >= 5

    def test_discount_guard(self, spark):
        from recover_spark.ops.text_analysis import kneser_ney_bigrams

        with pytest.raises(ValueError, match="discount"):
            kneser_ney_bigrams(_docs(spark), discount=1.5)
