"""Distributed BPE (byte-pair-encoding) tokenizer training.

The training-data pipeline's missing tokenizer piece: learn the merge
table FROM the corpus, on the cluster, instead of shipping text to a
single-node trainer.  Same algorithm family as the standard BPE
trainers (Sennrich et al. 2016; HuggingFace tokenizers): start from
character sequences, repeatedly merge the most frequent adjacent
symbol pair.

The scale insight every real BPE trainer uses: after ONE corpus pass
for word counts, training operates on the WORD-FREQUENCY table
(|vocab| rows, each weighted by its count) — the 100 TB corpus is
touched exactly once.  Per merge iteration:

- adjacent-pair counts explode map-side from each word's symbol array
  (weighted by the word count) into a symbol-pair-sized aggregate with
  map-side partials;
- the winning pair is a deterministic TakeOrdered(1) (weight desc,
  pair asc — the tie rule is part of the contract so training is
  reproducible across engines, partitionings, and replays);
- the merge applies map-side as a left-to-right fold over each symbol
  array (``F.aggregate`` — greedy single-pass semantics, exactly the
  classic algorithm), no shuffle;
- the word table is cached per iteration and localCheckpoint()ed every
  ``checkpoint_every`` merges so lineage depth stays bounded over long
  trainings.

No oracle SQL twin: the training loop is iterative with a data-dependent
argmax per step — the correctness pin is an exact-equality pytest
against a pure-Python reference trainer (tests/test_bpe.py), including
the tie rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.local import tiny_df

from recover_spark.functions.text import tokens

# end-of-word sentinel (not a lowercase letter/digit so it can never
# collide with a real symbol produced by tokens())
EOW = "</w>"


def _merge_pair_expr(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-pass merge of adjacent (left, right)
    into one symbol — the classic BPE apply step as a fold:
    acc ++ [s], except when last(acc)==left and s==right, where the
    last element is replaced by left||right.  After a merge the new
    last element is the MERGED symbol, so overlapping occurrences
    ("aaa" under (a,a)) merge non-overlapping left-to-right, exactly
    like the reference implementations."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (s == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l, r)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """ONE corpus pass: (word, weight) with each word as its initial
    character-symbol array plus the end-of-word sentinel."""
    words = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("weight"))
    return counts.select(
        "word",
        "weight",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
    )


def _adjacent_pair_counts(current: DataFrame) -> DataFrame:
    """(l, r, w): weighted adjacent-pair counts over the word table."""
    return (
        current.select(
            "weight",
            F.expr(
                # adjacent pairs as a zip of the symbol array
                # with its own 1-shift — element-wise, unlike
                # an indexed transform re-entering the outer
                # array per element (~20x slower interpreted)
                "zip_with("
                " slice(symbols, 1, greatest(0, size(symbols) - 1)),"
                " slice(symbols, 2, greatest(0, size(symbols) - 1)),"
                " (a, b) -> named_struct('l', a, 'r', b))"
            ).alias("__pairs"),
        )
        .select("weight", F.explode("__pairs").alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("weight").alias("w"))
    )


def _select_exact_batch(
    top: list,
    complete: bool,
    max_left: dict,
    max_right: dict,
    budget: int,
    min_pair_weight: int,
) -> list:
    """The longest PREFIX of the sorted candidate list that the
    sequential trainer provably picks in the same order (driver-side
    arithmetic over the collected top-M pairs and per-symbol maxima;
    no corpus access).

    Soundness: applying an accepted merge (l, r) can only change the
    count of pairs that (a) touch l or r (they lose occurrences —
    never gain, since later accepted candidates are symbol-disjoint),
    (b) contain the NEW symbol l+r, or (c) equal an existing pair
    containing the string l+r as a symbol (the merge can mint extra
    occurrences of it).  Every pair in (b)/(c) gains at most
    max_right[l] from the (x, l+r) side (each new occurrence "x·l+r"
    was an occurrence of (x, l)) plus max_left[r] from the (l+r, y)
    side, on top of its original count (bounded by the candidate list
    or its cutoff).  A later candidate c_i is therefore still the
    sequential argmax at its step if it is symbol-disjoint from every
    earlier accepted merge AND its weight STRICTLY exceeds every
    earlier merge's worst-case boosted-pair weight — strictness also
    settles ties, which the sequential tie rule would otherwise
    resolve against the in-place candidate order.  Candidates whose
    own merged string was already minted by an earlier accepted merge
    are rejected too: without that, two symbol-disjoint merges could
    create the SAME new symbol via different splits and jointly boost
    a pair beyond any single merge's tracked bound.
    """
    batch: list = []
    blocked: set[str] = set()
    bound = 0
    cutoff = 0 if complete else int(top[-1]["w"])
    for c in top:
        if len(batch) >= budget or int(c["w"]) < min_pair_weight:
            break
        if batch:
            # Block on the candidate's MERGED string too: two
            # symbol-disjoint candidates can mint the SAME new symbol
            # via different splits ((a, bc) and (ab, c) both create
            # "abc"), and a pair containing that symbol would then be
            # boosted by BOTH merges — more than any single earlier
            # merge's worst-case bound tracks.  Rejecting a candidate
            # whose own merged string is already blocked keeps every
            # boosted pair attributable to exactly one accepted merge,
            # which is what the bound's soundness argument needs.
            if (
                {c["l"], c["r"]} & blocked
                or (c["l"] + c["r"]) in blocked
                or int(c["w"]) <= bound
            ):
                break
        batch.append(c)
        merged = c["l"] + c["r"]
        # absent symbols may still head pairs below the collection
        # cutoff, so the default is the cutoff, not zero
        nb = max(
            max_right.get(c["l"], cutoff), max_left.get(c["r"], cutoff)
        )
        b_existing = max(
            [
                int(t["w"])
                for t in top
                if t["l"] == merged or t["r"] == merged
            ]
            or [cutoff]
        )
        if not complete:
            b_existing = max(b_existing, cutoff)
        bound = max(bound, nb + b_existing)
        blocked |= {c["l"], c["r"], merged}
    return batch


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_weight: int = 2,
    checkpoint_every: int = 8,
    max_batch_merges: int = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the merge table (iteration, left, right, merged, weight) in
    learning order — the artifact a tokenizer ships.  Stops early when
    no remaining pair reaches ``min_pair_weight``.

    Each pass over the (vocab-sized) word table learns up to
    ``max_batch_merges`` merges instead of one, at the SAME per-pass
    cost as the classic loop (exactly one aggregate + one top-M
    collect — the per-symbol count maxima the gap rule needs are
    derived from the collected list itself, with the collection
    cutoff as the sound bound for anything uncollected).
    ``_select_exact_batch`` accepts the longest candidate prefix the
    sequential trainer provably picks unchanged (symbol-disjointness +
    a strict weight gap over every earlier merge's worst-case created
    or boosted pair).  The result is EQUAL to one-merge-at-a-time
    training — the batch rule is a sound gap condition, not a
    heuristic — while cutting passes by the realized batch factor;
    cascade-heavy corpora (where a merge's created pair inherits its
    full count, e.g. any word-final bigram) legitimately realize
    batch size 1 and pay nothing for the attempt.
    ``max_batch_merges=1`` recovers the classic loop exactly.
    """
    if max_batch_merges < 1:
        raise ValueError("max_batch_merges must be >= 1")
    spark = docs.sparkSession
    words = word_frequency_table(docs, text_col).cache()
    words.count()  # materialize before the loop
    merges: list[tuple[int, str, str, str, int]] = []
    current = words
    since_ckpt = 0
    try:
        while len(merges) < num_merges:
            pairs = _adjacent_pair_counts(current)
            # One collect per pass, period: the per-symbol maxima the
            # gap rule needs are derived from the SAME top-M list —
            # any pair OUTSIDE the list has weight <= the collection
            # cutoff, so max(collected maxima, cutoff) is a sound
            # upper bound with no second job.  A larger M buys batch
            # quality (lower cutoff -> tighter bounds) at the cost of
            # a slightly bigger TakeOrdered, which is trivial.
            m_cand = max(256, max_batch_merges * 32)
            top = (
                pairs.orderBy(F.desc("w"), F.asc("l"), F.asc("r"))
                .limit(m_cand)
                .collect()
            )
            if not top or top[0]["w"] < min_pair_weight:
                break
            budget = min(max_batch_merges, num_merges - len(merges))
            if budget == 1:
                batch = [top[0]]
            else:
                complete = len(top) < m_cand
                max_left: dict = {}
                max_right: dict = {}
                for c in top:
                    w_c = int(c["w"])
                    if max_left.get(c["l"], 0) < w_c:
                        max_left[c["l"]] = w_c
                    if max_right.get(c["r"], 0) < w_c:
                        max_right[c["r"]] = w_c
                batch = _select_exact_batch(
                    top,
                    complete,
                    max_left,
                    max_right,
                    budget,
                    min_pair_weight,
                )
            col = F.col("symbols")
            for c in batch:
                merges.append(
                    (len(merges), c["l"], c["r"], c["l"] + c["r"], int(c["w"]))
                )
                col = _merge_pair_expr(col, c["l"], c["r"])
            nxt = current.withColumn("symbols", col).cache()
            since_ckpt += len(batch)
            if since_ckpt >= checkpoint_every:
                # truncate lineage: chained array-fold projections
                # otherwise stack up in every subsequent job
                nxt = nxt.localCheckpoint(eager=True)
                since_ckpt = 0
            else:
                nxt.count()
            current.unpersist()
            current = nxt
    finally:
        current.unpersist()
    return tiny_df(
        spark,
        merges,
        "iteration int, left string, right string, merged string, weight long",
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (in order) —
    map-side only: per word, the merge rules fold over the symbol
    array one after another.  Intended for modest merge counts (the
    expression nests one fold per rule); a production encoder would
    compile the rules into a vectorized Pandas UDF once the table is
    large."""
    # collision-resistant internals (a user column named __words must
    # survive; same contract as the bloom probe's __bloom_* names)
    w_col, s_col = "__bpe_words__", "__bpe_syms__"
    word_syms = F.expr(
        f"transform({w_col}, w -> concat(split(w, ''), array('{EOW}')))"
    )
    out = df.withColumn(w_col, tokens(F.col(text_col))).withColumn(
        s_col, word_syms
    )
    col = F.col(s_col)
    for left, right in merges:
        col = F.transform(col, lambda s: _merge_pair_expr(s, left, right))
    return out.withColumn(out_col, F.flatten(col)).drop(w_col, s_col)


def apply_bpe_vectorized(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list of ANY size — the production
    encoder ``apply_bpe``'s docstring promises: the expression form
    nests one Catalyst fold per rule (fine for dozens, hopeless for a
    30k-rule tokenizer), so here the rules ship ONCE per task as a
    rank dictionary and an Arrow-batched ``mapInPandas`` encodes each
    word with the standard lowest-rank-first merge loop.

    Semantics match ``apply_bpe`` exactly (verified in tests): applying
    rules in learning order one after another is equivalent to
    repeatedly merging the lowest-rank adjacent pair present — the
    classic BPE encoder identity.

    Scale shape: map-only (no shuffle); the merge table is a plain
    Python dict in the closure (~MBs for real tokenizers), serialized
    once per task, never per row; per-word work is the usual
    O(len * applied_merges).
    """
    import re as _re

    ranks = {pair: i for i, pair in enumerate(merges)}
    token_re = _re.compile(r"[^a-z0-9']+")

    def encode(batches):
        import pandas as pd

        def encode_word(word: str) -> list[str]:
            syms = list(word) + [EOW]
            while len(syms) > 1:
                best, best_rank = None, None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (a, b), r
                if best is None:
                    break
                l, r_ = best
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l
                        and syms[i + 1] == r_
                    ):
                        out.append(l + r_)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for b in batches:
            toks = []
            for text in b[text_col]:
                words = [w for w in token_re.split((text or "").lower()) if w]
                doc: list[str] = []
                for w in words:
                    doc.extend(encode_word(w))
                toks.append(doc)
            out = b.copy()
            out[out_col] = toks
            yield out

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes]
        + [f"{out_col} array<string>"]
    )
    return df.mapInPandas(encode, out_schema)
