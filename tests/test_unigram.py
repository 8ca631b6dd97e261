"""Unigram-LM trainer (ops/unigram.py): exact-equality parity against
an independent pure-Python Viterbi-EM trainer, encoder==trainer
segmentation, and the bounded-collect/pruning contracts."""

from __future__ import annotations

import math
import re
from collections import Counter

import pyspark.sql.functions as F


# --------------------------------------------------------------------------
# independent reference trainer: same algorithm CONTRACT (module
# docstring of ops/unigram.py), different code shape — Counter-based
# seed, length-descending piece scan in the DP (== split point
# ascending), dict-of-words EM loop.
# --------------------------------------------------------------------------

def _ref_viterbi(word: str, logp: dict, max_len: int) -> list:
    n = len(word)
    score = {0: 0.0}
    prev = {}
    for i in range(1, n + 1):
        for L in range(min(max_len, i), 0, -1):  # j = i - L ascending
            j = i - L
            if j not in score:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = score[j] + lp
            if i not in score or s > score[i]:
                score[i] = s
                prev[i] = j
    if n not in score:
        return list(word)
    out = []
    i = n
    while i:
        j = prev[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def ref_train_unigram(
    texts,
    vocab_size,
    max_piece_len=4,
    n_iterations=2,
    min_count=2,
    seed_cap=None,
    shrink=0.75,
):
    if seed_cap is None:
        seed_cap = 8 * vocab_size
    words: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9']+", (t or "").lower()):
            if w:
                words[w] += 1
    seed: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    chars = {p for p in seed if len(p) == 1}
    multis = sorted(
        ((p, n) for p, n in seed.items()
         if len(p) > 1 and n >= min_count),
        key=lambda x: (-x[1], x[0]),
    )[:seed_cap]
    vocab = {p: seed[p] for p in chars}
    vocab.update(dict(multis))

    def logprobs(v):
        eff = {p: (max(c, 1) if len(p) == 1 else c)
               for p, c in v.items()}
        lt = math.log(sum(eff.values()))
        return {p: math.log(e) - lt for p, e in eff.items()}

    for it in range(n_iterations):
        lp = logprobs(vocab)
        counts: Counter = Counter()
        for w, c in words.items():
            for p in _ref_viterbi(w, lp, max_piece_len):
                counts[p] += c
        target = (
            vocab_size
            if it == n_iterations - 1
            else max(vocab_size, int(math.ceil(len(vocab) * shrink)))
        )
        keep = sorted(
            ((p, n) for p, n in counts.items() if len(p) > 1 and n > 0),
            key=lambda x: (-x[1], x[0]),
        )[: max(0, target - len(chars))]
        vocab = {p: counts.get(p, 0) for p in chars}
        vocab.update(dict(keep))
    lp = logprobs(vocab)
    return sorted(
        ((p, c, round(lp[p], 8)) for p, c in vocab.items()),
        key=lambda x: (-x[1], x[0]),
    )


def test_trainer_matches_independent_reference_exactly(spark):
    from recover_spark.ops.unigram import train_unigram

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    expect = ref_train_unigram(
        texts, vocab_size=80, max_piece_len=4, n_iterations=2
    )
    got = [
        (r["piece"], r["count"], r["logprob"])
        for r in train_unigram(
            docs, vocab_size=80, max_piece_len=4, n_iterations=2
        ).collect()
    ]
    assert got == expect  # bit-exact, including the tie rules


def test_single_chars_always_survive_and_floor(spark):
    from recover_spark.ops.unigram import train_unigram

    # 'zq' appears once -> char pieces z/q must survive with eff floor
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa zq")], "doc_id long, text string"
    )
    rows = {
        r["piece"]: r
        for r in train_unigram(
            docs, vocab_size=6, max_piece_len=3, n_iterations=2
        ).collect()
    }
    assert "z" in rows and "q" in rows and "a" in rows
    # 'aaaa' segments as the multi-char piece, so 'a' has count 0 but
    # keeps a finite logprob via the floor
    for p in ("z", "q"):
        assert math.isfinite(rows[p]["logprob"])


def test_encoder_segments_like_the_trainer(spark):
    from recover_spark.ops.unigram import (
        apply_unigram,
        train_unigram,
        viterbi_segment,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    table = train_unigram(
        docs, vocab_size=60, max_piece_len=4, n_iterations=1
    ).collect()
    logp = {r["piece"]: r["logprob"] for r in table}
    out = apply_unigram(docs, logp).select("text", "unigram_tokens")
    for r in out.collect():
        words = [
            w
            for w in re.split(r"[^a-z0-9']+", (r["text"] or "").lower())
            if w
        ]
        expect = []
        for w in words:
            expect.extend(viterbi_segment(w, logp, 4))
        assert r["unigram_tokens"] == expect
        # segmentation is a true partition of each word
        assert "".join(r["unigram_tokens"]) == "".join(words)


def test_vocab_size_and_ordering_contract(spark):
    from recover_spark.ops.unigram import train_unigram

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    df = train_unigram(docs, vocab_size=50, n_iterations=2)
    rows = df.collect()
    assert len(rows) <= 50 or all(
        len(r["piece"]) == 1 for r in rows[50:]
    )
    keys = [(-r["count"], r["piece"]) for r in rows]
    assert keys == sorted(keys)
