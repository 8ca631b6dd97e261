"""Distributed unigram-LM tokenizer training — the SentencePiece-style
complement to BPE (Kudo 2018, "Subword Regularization"; the
sentencepiece trainer's unigram mode), deterministic Viterbi-EM
variant.

Where BPE grows a vocabulary bottom-up by merging, the unigram model
starts from a LARGE seed vocabulary of candidate pieces and shrinks it:
each EM round re-estimates piece probabilities from the corpus and
prunes the pieces whose likelihood contribution is lowest.  The final
artifact is the (piece, logprob) table a unigram tokenizer ships.

The scale shape mirrors :mod:`recover_spark.ops.bpe`: after ONE corpus
pass for word counts, every E/M step runs over the WORD-FREQUENCY table
(|vocab| rows, weight-carrying), never the corpus.  Per EM iteration:

- E-step: each word's Viterbi-best segmentation under the current
  piece logprobs, weighted piece occurrences out — an Arrow-batched
  ``mapInPandas`` over the word table (the per-word segmentation
  lattice DP is genuinely inexpressible with built-in columnar ops;
  same justification as ``apply_bpe_vectorized``), feeding ONE
  piece-keyed mergeable integer sum with map-side partials;
- M-step + prune: driver-side arithmetic over the piece-count table,
  which is BOUNDED by ``seed_cap`` rows (the centroid/codebook
  bounded-collect contract) — logprobs are ``log(eff) - log(total)``
  over exact integer counts, so the loop state is bit-reproducible
  across engines and replays.

DETERMINISM CONTRACT (every rule is part of the algorithm, mirrored by
the independent parity trainer):

- words come from the shared ``tokens()`` pre-tokenizer; pieces never
  cross word boundaries (SentencePiece's whitespace-marker behavior,
  with word boundaries supplied by the pre-tokenizer instead);
- seed = every substring of every word up to ``max_piece_len`` chars,
  occurrence-counted (a substring occurring twice in a word counts
  twice) and weighted by word frequency; multi-char pieces need
  ``min_count`` total weight and only the top ``seed_cap`` survive by
  (count DESC, piece ASC); ALL single characters are kept forever
  (coverage guarantee) with an effective-count floor of 1;
- Viterbi DP scans split points j ascending with STRICT improvement,
  so score ties resolve to the longest final piece;
- per-round pruning keeps single chars plus the top multi-char pieces
  by (count DESC, piece ASC) down to ``max(vocab_size,
  ceil(current * shrink))`` — count-under-Viterbi IS the piece's
  likelihood contribution in this variant, so this is Kudo's
  prune-by-likelihood-loss with the Viterbi approximation; multi-char
  pieces with zero expected count drop immediately;
- the final round prunes to exactly ``vocab_size`` (or fewer if the
  corpus has fewer surviving pieces).

No oracle SQL twin: the loop is iterative with data-dependent
segmentations per step — correctness pins are an exact-equality pytest
against an independent pure-Python trainer (tests/test_unigram.py) and
the battery's python-oracle hash (``oracle_py``), the proven
text_bpe_train pattern.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.local import tiny_df

from recover_spark.functions.text import tokens


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece logprobs: DP over
    split points, j ascending, strict improvement (ties -> longest
    final piece).  Pure function shared by the trainer's E-step and
    the encoder so the two can never drift."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == neg:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == neg:  # unreachable when every char is in the vocab
        return list(word)
    seg: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        seg.append(word[j:i])
        i = j
    seg.reverse()
    return seg


def _logprobs(vocab: dict[str, int]) -> dict[str, float]:
    """M-step: log(eff) - log(total) over exact integer counts, where
    eff floors single-char counts at 1 (kept-for-coverage chars keep a
    nonzero probability).  The two-log form is part of the determinism
    contract — log(a/b) differs in ulps."""
    eff = {
        p: (max(c, 1) if len(p) == 1 else c) for p, c in vocab.items()
    }
    total = sum(eff.values())
    lt = math.log(total)
    return {p: math.log(e) - lt for p, e in eff.items()}


def _estep_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """One E-step: Viterbi piece occurrences per word (weighted),
    aggregated to (piece, count).  Arrow-batched per-word DP; the
    piece-keyed sum is a mergeable integer aggregate."""

    def run(batches):
        import pandas as pd

        for b in batches:
            pieces: list[str] = []
            ws: list[int] = []
            for word, weight in zip(b["word"], b["weight"]):
                cnt: dict[str, int] = {}
                for p in viterbi_segment(word, logp, max_piece_len):
                    cnt[p] = cnt.get(p, 0) + 1
                wi = int(weight)
                for p, c in cnt.items():
                    pieces.append(p)
                    ws.append(c * wi)
            yield pd.DataFrame(
                {
                    "piece": pd.Series(pieces, dtype="object"),
                    "w": pd.Series(ws, dtype="int64"),
                }
            )

    return (
        words.mapInPandas(run, "piece string, w long")
        .groupBy("piece")
        .agg(F.sum("w").cast("long").alias("count"))
    )


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 200,
    text_col: str = "text",
    max_piece_len: int = 4,
    n_iterations: int = 2,
    min_count: int = 2,
    seed_cap: int | None = None,
    shrink: float = 0.75,
) -> DataFrame:
    """Learn a ``vocab_size``-piece unigram LM vocabulary from the
    corpus.  Returns (piece, count, logprob) — count is the piece's
    exact weighted Viterbi occurrence count from the final E-step,
    logprob its final model score (rounded to 8 decimals; the in-loop
    values are unrounded) — ordered by (count DESC, piece ASC).

    See the module docstring for the full determinism contract; every
    collect here is bounded by ``seed_cap`` (default
    ``8 * vocab_size``) rows.
    """
    if vocab_size < 1 or max_piece_len < 1 or n_iterations < 1:
        raise ValueError(
            "vocab_size, max_piece_len, n_iterations must be >= 1"
        )
    if seed_cap is None:
        seed_cap = 8 * vocab_size
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .cache()
    )
    words.count()
    try:
        # seed counts: one vocab-sized aggregate; the substring
        # enumeration is a pure Catalyst flatten(transform(sequence))
        subs = (
            words.select(
                "weight",
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(1, length(word)),"
                        " i -> transform(sequence(1, least("
                        f"{int(max_piece_len)}, length(word) - i + 1)),"
                        " l -> substring(word, i, l))))"
                    )
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("weight").cast("long").alias("count"))
        )
        chars_rows = subs.filter(F.length("piece") == 1).collect()
        multi_rows = (
            subs.filter(
                (F.length("piece") > 1)
                & (F.col("count") >= int(min_count))
            )
            .orderBy(F.col("count").desc(), F.col("piece").asc())
            .limit(int(seed_cap))
            .collect()
        )
        chars = {r["piece"]: int(r["count"]) for r in chars_rows}
        vocab: dict[str, int] = dict(chars)
        vocab.update({r["piece"]: int(r["count"]) for r in multi_rows})

        for it in range(n_iterations):
            logp = _logprobs(vocab)
            counts = {
                r["piece"]: int(r["count"])
                for r in _estep_counts(
                    words, logp, max_piece_len
                ).collect()
            }
            new_chars = {p: counts.get(p, 0) for p in chars}
            multis = sorted(
                (
                    (p, c)
                    for p, c in counts.items()
                    if len(p) > 1 and c > 0
                ),
                key=lambda x: (-x[1], x[0]),
            )
            if it == n_iterations - 1:
                target = vocab_size
            else:
                target = max(
                    vocab_size, int(math.ceil(len(vocab) * shrink))
                )
            keep = multis[: max(0, target - len(new_chars))]
            vocab = dict(new_chars)
            vocab.update(dict(keep))
    finally:
        words.unpersist()

    final_lp = _logprobs(vocab)
    rows = sorted(
        (
            (p, c, round(final_lp[p], 8))
            for p, c in vocab.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )
    return tiny_df(
        spark, rows, "piece string, count long, logprob double"
    )


def apply_unigram(
    df: DataFrame,
    piece_logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Tokenize with a trained unigram vocabulary: per word, the SAME
    Viterbi DP the trainer used (shared :func:`viterbi_segment`), so
    encode == training segmentation by construction.  Map-only; the
    (piece -> logprob) dict ships once per task in the closure, never
    per row — the ``apply_bpe_vectorized`` shape."""
    import re as _re

    max_len = max((len(p) for p in piece_logp), default=1)
    token_re = _re.compile(r"[^a-z0-9']+")

    def encode(batches):
        import pandas as pd

        for b in batches:
            toks = []
            for text in b[text_col]:
                words = [
                    w
                    for w in token_re.split((text or "").lower())
                    if w
                ]
                doc: list[str] = []
                for w in words:
                    doc.extend(viterbi_segment(w, piece_logp, max_len))
                toks.append(doc)
            out = b.copy()
            out[out_col] = toks
            yield out

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes]
        + [f"{out_col} array<string>"]
    )
    return df.mapInPandas(encode, out_schema)
