"""Deterministic sampling / split assignment for training-data
pipelines.

Random sampling (``df.sample``) is not reproducible across engines,
runs, or replays — a training pipeline needs *stable* membership: the
same record lands in the same split forever, regardless of partitioning,
cluster size, or re-ingestion (the same replay-safety argument as the
reference's W1 dedup, SURVEY.md §2.9).

``stable_split`` hashes the key with the engine-portable md5 scheme
(functions/hashing.py) and buckets the hash modulo a granularity, so:
- assignment is a pure map-side projection (no shuffle, no RNG state);
- split fractions are exact in expectation and independent of data
  order;
- the DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.local import tiny_df

from recover_spark.functions.hashing import portable_hash32, portable_hash64

_GRANULARITY = 10_000


def split_assignment(
    key_col: Column | str,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Column expression assigning each key a split name by hash bucket.

    ``weights`` maps split name -> fraction (must sum to <= 1; any
    remainder falls into the LAST split).  Assignment is stable under
    replay and identical for duplicate keys.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = F.pmod(portable_hash64(key_col, salt=salt), F.lit(_GRANULARITY))
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < F.lit(int(round(upper * _GRANULARITY)))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def stable_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Attach a deterministic split column (map-only, shuffle-free)."""
    return df.withColumn(
        split_col, split_assignment(F.col(key_col), weights, salt=salt)
    )


def cluster_split(
    df: DataFrame,
    cluster_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "cluster_split",
) -> DataFrame:
    """Leakage-safe train/eval split: the split key is a DUPLICATE
    CLUSTER id (from ``duplicate_clusters`` / the semantic
    embedding-cluster pipeline), not the item — every member of a
    cluster lands in the SAME split, so near-duplicates can never
    straddle train and test (the standard contamination hole in naive
    per-item splits, and the step every training-data pipeline runs
    between dedup and packing).

    The assignment is :func:`split_assignment` at cluster grain —
    a deterministic md5 hash threshold, reproducible across runs,
    engines, and partitionings — compiled to a map-side expression:
    the corpus never shuffles, and the decision is identical for
    every row carrying the same cluster id by construction (the
    no-cluster-spans-splits property is a consequence of determinism,
    not of any join).

    NULL cluster ids raise at execution time: a NULL would hash to
    NULL and silently fall into the LAST split, quietly corrupting
    the one guarantee this operator exists to provide — callers must
    coalesce singletons to their own item id first (the
    ``dedup_semantic_clusters`` convention).
    """
    c = F.col(cluster_col)
    checked = F.when(c.isNotNull(), c.cast("string")).otherwise(
        F.raise_error(
            F.lit(
                "cluster_split: NULL cluster id — coalesce singletons "
                "to their own item id before splitting"
            )
        )
    )
    return df.withColumn(
        split_col, split_assignment(checked, weights, salt=salt)
    )


def group_topk_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    salt: str = "topk_sample",
) -> DataFrame:
    """EXACT-size deterministic per-group sample: the k rows whose
    salted md5 hash ranks lowest within each group — the
    fixed-budget complement to ``stratified_sample`` (which keeps a
    FRACTION per stratum and so drifts with stratum size): "exactly
    1,000 eval documents per source", reproducible across runs,
    engines, and partitionings.

    Ties on the hash break by ``key_col`` ascending, so the SET of
    surviving keys is a total function of the data, never of the
    execution.  Duplicate keys within a group share a hash and are
    kept or dropped TOGETHER only as far as the k-boundary allows —
    and when duplicates straddle the boundary, WHICH physical row of a
    duplicated key survives is not pinned (rows identical on
    ``key_col`` but differing elsewhere are interchangeable to the
    rank).  Full row-level determinism therefore requires ``key_col``
    to be unique within each group — callers sampling at entity grain
    should dedup first.

    Engine shape: ONE shuffle on the group key; the ``row_number() <=
    k`` filter compiles to a map-side WindowGroupLimit (the W1
    keyed-latest plan), so each map task forwards at most k rows per
    group and a hot group costs its reducer only O(k * partitions),
    not its row share.
    """
    if k < 1:
        raise ValueError(f"group_topk_sample: k must be >= 1, got {k}")
    from pyspark.sql import Window

    group_cols = list(group_cols)
    h = portable_hash64(F.col(key_col), salt=salt)
    w = Window.partitionBy(*group_cols).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stable_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a stable ``fraction`` of keys (systematic hash sampling)."""
    bucket = F.pmod(portable_hash64(F.col(key_col), salt=salt), F.lit(_GRANULARITY))
    return df.filter(bucket < F.lit(int(round(fraction * _GRANULARITY))))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum's keys (class rebalancing / downsampling the
    dominant class — the standard training-mix step).

    Map-only and shuffle-free like ``stable_sample``: the keep decision
    is a hash threshold compiled to a CASE over the stratum column, so
    the sample is reproducible across runs, engines, and partitionings,
    and a key draws a CONSISTENT bucket across strata (sampling stays
    coordinated for keys appearing in several strata).  Strata missing
    from ``fractions`` keep ``default_fraction`` of rows (0 = drop).
    """
    bucket = F.pmod(portable_hash64(F.col(key_col), salt=salt), F.lit(_GRANULARITY))
    thresh = None
    for stratum, frac in fractions.items():
        cut = F.lit(int(round(frac * _GRANULARITY)))
        cond = F.col(strata_col) == stratum
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = thresh.otherwise(
        F.lit(int(round(default_fraction * _GRANULARITY)))
    )
    return df.filter(bucket < thresh)


def temperature_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled source mixing: downsample each source so the
    expected kept volume is proportional to ``n_source ** alpha``
    (alpha=1 keeps natural proportions, alpha→0 equalizes sources) —
    the standard multi-source/multilingual rebalancing step when
    assembling a training mix from corpora of wildly different sizes.

    The smallest source is kept whole; a source k× larger keeps
    ``k**(alpha-1)`` of its rows, decided by the same engine-portable
    hash threshold as :func:`stable_sample` (reproducible across runs,
    engines, partitionings; coordinated per key).

    Scale shape: one tiny groupBy on the source column (cardinality =
    number of corpora, not rows), the global min attached via a one-row
    broadcast, then the per-source rates broadcast-joined back — the
    corpus itself never shuffles; the keep decision is a map-side
    filter on the scan.  Rates are rounded to 6 decimals before
    thresholding so ``pow`` last-ulp differences can't flip a bucket
    across engines.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_row = counts.groupBy().agg(F.min("__n").alias("__nmin"))
    rates = (
        counts.crossJoin(F.broadcast(floor_row))
        .select(
            source_col,
            F.round(
                F.pow(F.col("__n") / F.col("__nmin"), F.lit(alpha - 1.0)), 6
            ).alias("__rate"),
        )
    )
    bucket = F.pmod(portable_hash64(F.col(key_col), salt=salt), F.lit(_GRANULARITY))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            bucket
            < F.round(F.col("__rate") * F.lit(_GRANULARITY), 0).cast("bigint")
        )
        .drop("__rate")
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    salt: str = "wsample",
    round_digits: int = 12,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (exactly k
    rows, or all rows when fewer) — the Efraimidis–Spirakis exponential
    race: each row draws an exponential clock ``-ln(u) / w`` and the k
    earliest clocks win, which selects row i first with probability
    ``w_i / sum(w)`` and recursively thereafter (the defining property
    of successive weighted draws without replacement).

    ``u`` derives from the engine-portable md5 hash of the key (NOT an
    RNG): membership is stable under replay, partitioning, and data
    order, and an external SQL oracle reproduces the draw bit-for-bit
    — same contract as ``stable_split``.  Scores are ROUNDED before
    ranking (ties then break on the key) so cross-engine libm ulp
    differences in ``ln`` cannot flip the selection.

    With ``group_col`` the draw runs independently per group via ONE
    window exchange on the group key; without it, the global top-k is
    a TakeOrdered (no full sort, no single-partition shuffle).

    Rows with non-positive weight can never win a weighted draw and
    are excluded by construction (documented: the filter is explicit,
    mirrored by the oracle).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        (portable_hash32(F.col(key_col), salt=salt) + F.lit(0.5))
        / F.lit(float(1 << 32))
    )
    score = F.round(
        -F.log(u) / F.col(weight_col).cast("double"), round_digits
    )
    scored = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__es_score", score)
    )
    if group_col is None:
        return (
            scored.orderBy(F.asc("__es_score"), F.asc(key_col))
            .limit(k)
            .drop("__es_score")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.asc("__es_score"), F.asc(key_col)
    )
    return (
        scored.withColumn("__es_rn", F.row_number().over(w))
        .filter(F.col("__es_rn") <= k)
        .drop("__es_score", "__es_rn")
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram: one aggregate pass, bins derived map-side
    (``floor(value / width)``) so partial aggregation applies."""
    bin_idx = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    return (
        df.withColumn("bin", bin_idx)
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_start", (F.col("bin") * F.lit(bin_width)).cast("double"))
    )


def heavy_hitters(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Skew diagnosis: the top-N most frequent key combinations with
    their share of all rows — the pass run before choosing a join
    strategy (broadcast? salt? AQE skew split?).

    Scale shape: one partial-aggregated groupBy shuffle, then
    ``orderBy(...).limit(n)`` which Spark executes as TakeOrderedAndProject
    (per-partition top-N heaps, no global sort), then the scalar total
    attached by broadcasting a one-row frame.  Nothing after the groupBy
    touches more than key-cardinality rows.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    top = grouped.orderBy(F.col("n_rows").desc(), *keys).limit(top_n)
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    w = Window.orderBy(F.col("n_rows").desc(), *keys)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


def importance_scores(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    smoothing: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weighting for pretraining-data selection
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score each raw document by how much more
    likely its bigram bag is under the TARGET distribution (the rows
    matching ``target_pred`` — e.g. a trusted high-quality slice) than
    under the RAW corpus distribution.  High scores = target-like;
    resampling by score shifts the corpus mixture toward the target
    domain without hand-written rules.

    Engine-portable variant: instead of DSIR's hashed feature buckets
    (engine hash functions differ), the feature space is the top-V
    corpus bigrams chosen with exact deterministic tie-breaking
    (count desc, bigram asc) — same estimator family, reproducible
    bit-for-bit in any SQL engine.

    Plan shape at 100 TB (ONE corpus pass for fit AND score):
    - bigrams are built MAP-SIDE by zipping the token array with its
      own 1-shift (no positional self-join — that would shuffle the
      corpus to pair adjacent tokens);
    - one corpus shuffle lands the doc-feature aggregate, which is
      pinned (lazy localCheckpoint) and feeds both the vocabulary fit
      (raw and target counts come out of the SAME aggregate as a
      conditional sum) and the scoring pass — an unpinned diamond
      would re-tokenize and re-shuffle the corpus twice, since Spark
      does not reuse exchanges across differently-pruned branches;
    - top-V selection is a TakeOrdered (no global sort), and V feature
      weights broadcast back into the scoring pass (occurrence-weighted
      mean — identical to averaging over the exploded stream);
    - (R, T) normalizers ride a one-row broadcast.

    Output: (id, n_feats, importance) for every document with at least
    one in-vocabulary bigram, importance = mean over its in-vocab
    bigrams of ``log(p_target / p_raw)`` (add-k smoothed), rounded to 6
    for cross-engine-stable ordering.  Documents with no in-vocab
    bigram (under 2 tokens, or fully out-of-domain) are absent — they
    carry no evidence either way.
    """
    from recover_spark.functions.text import tokens
    from recover_spark.functions.transforms import materialize_columns

    # tokenize once into __t behind a Generate barrier (the zip below
    # references __t four times; without the barrier Catalyst
    # substitutes tokens(text) into every reference — measured 4x
    # wall-clock on this exact fan-out), then derive bigrams map-side
    featized = materialize_columns(
        docs.select(
            F.col(id_col),
            F.col(text_col),
            target_pred.cast("boolean").alias("__is_target"),
        ),
        {"__t": tokens(F.col(text_col))},
    ).select(
        id_col,
        F.expr(
            # bigrams as a zip of the array with its own 1-shift:
            # zip_with evaluates element-wise over the two slices,
            # where an indexed transform (t, i) -> concat(t, __t[i+1])
            # would re-enter the outer array per element — measured
            # ~20x slower interpreted.  greatest(0, ...) guards the
            # empty token array (slice rejects negative lengths).
            "zip_with("
            " slice(__t, 1, greatest(0, size(__t) - 1)),"
            " slice(__t, 2, greatest(0, size(__t) - 1)),"
            " (a, b) -> concat(a, ' ', b))"
        ).alias("__feats"),
        "__is_target",
    )
    exploded = featized.select(
        id_col, "__is_target", F.explode("__feats").alias("feat")
    )
    # ONE corpus shuffle into the doc-feature aggregate, then pin it:
    # it feeds both the vocabulary fit and the scoring pass, and Spark
    # does not reuse the exchange across the two pruned branches — an
    # unpinned diamond re-tokenizes and re-shuffles the corpus twice.
    # The aggregate is vocabulary-dense, far smaller than the corpus.
    dtf = (
        exploded.groupBy(id_col, "feat")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.max("__is_target").alias("__is_target"),
        )
        .localCheckpoint(eager=False)
    )
    counts = dtf.groupBy("feat").agg(
        F.sum("__c").alias("raw_n"),
        F.sum(F.when(F.col("__is_target"), F.col("__c")).otherwise(0)).alias(
            "tgt_n"
        ),
    )
    vocab = counts.orderBy(
        F.desc("raw_n"), F.asc("feat")
    ).limit(vocab_size)
    totals = vocab.groupBy().agg(
        F.sum("raw_n").alias("R"), F.sum("tgt_n").alias("T")
    )
    k = float(smoothing)
    weights = vocab.crossJoin(F.broadcast(totals)).select(
        "feat",
        (
            F.log(
                (F.col("tgt_n") + F.lit(k))
                / (F.col("T") + F.lit(k) * F.lit(float(vocab_size)))
            )
            - F.log(
                (F.col("raw_n") + F.lit(k))
                / (F.col("R") + F.lit(k) * F.lit(float(vocab_size)))
            )
        ).alias("__w"),
    )
    return (
        dtf.join(F.broadcast(weights), "feat")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_feats"),
            # occurrence-weighted mean == avg over the exploded stream
            F.round(
                F.sum(F.col("__c") * F.col("__w")) / F.sum("__c"), 6
            ).alias("importance"),
        )
    )


def heavy_hitters_sketch(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
    capacity: int = 1024,
) -> DataFrame:
    """Heavy hitters with BOUNDED shuffle via Misra-Gries mergeable
    summaries (Agarwal et al., "Mergeable Summaries") — the answer when
    ``heavy_hitters``'s exact groupBy would shuffle an unbounded
    distinct-key set (URLs, user agents, raw strings at 100 TB).

    Two phases:
    1. **Candidates** — each partition streams through a Misra-Gries
      summary of ``capacity`` counters (Arrow-batched ``mapInPandas``;
      the summary spans all batches of the partition, memory is
      O(capacity) regardless of partition size).  The shuffle then
      carries at most ``capacity x partitions`` rows — independent of
      key cardinality.  MG guarantee: every key with true count
      > N_partition/(capacity+1) survives its partition, so any key
      with GLOBAL share > 1/(capacity+1) is in the candidate set.
    2. **Exact recount** — the candidate keys broadcast back as a
      semi-join and ONLY they are counted exactly; ranking ties break
      deterministically (count desc, keys asc).

    Result contract: IDENTICAL to exact ``heavy_hitters`` whenever the
    true top-``top_n`` all have share > 1/(capacity+1) — at the default
    capacity, anything above 0.1% share.  Below that threshold a hitter
    can be missed (approximate by nature); counts of reported keys are
    always exact.
    """
    from pyspark.sql import Window

    keys = list(key_cols)

    def mg_partition(batches):
        import pandas as pd

        counters: dict[tuple, int] = {}
        for b in batches:
            for tup in zip(*[b[k] for k in keys]):
                t = tuple(tup)
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # decrement-all: evict zeros (classic MG step)
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        if counters:
            cols = list(zip(*counters.keys()))
            yield pd.DataFrame({k: cols[i] for i, k in enumerate(keys)})
        else:
            yield pd.DataFrame({k: [] for k in keys})

    schema = ", ".join(
        f"{k} {dict(df.dtypes)[k]}" for k in keys
    )
    candidates = df.select(*keys).mapInPandas(mg_partition, schema).distinct()

    counted = (
        df.join(F.broadcast(candidates), on=keys, how="leftsemi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = df.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    order = [F.col("n_rows").desc()] + [F.col(k).asc() for k in keys]
    top = counted.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


def token_budget_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    budgets: dict[str, int],
    salt: str = "budget",
    offset_buckets: int = 256,
) -> DataFrame:
    """Fill a per-source TOKEN budget deterministically — the final
    assembly step of a training mix: given per-domain token budgets
    (e.g. from a temperature/importance recipe), keep each source's
    documents in engine-portable hash order until the budget is
    reached.  Unlike rate-based mixing (:func:`temperature_mix`), the
    contract here is on the SUM of a weight column, which is what
    "500B tokens of web, 50B of code" actually specifies.

    Membership rule: a document is kept iff the total tokens of the
    documents BEFORE it (exclusive prefix sum in (hash, key) order)
    is still under the source's budget — so the first document
    crossing the boundary is included and the kept sum is the
    smallest prefix >= budget (budget 0 keeps nothing).  Sources
    absent from ``budgets`` are dropped.  The hash order makes the
    selection reproducible across runs, engines, partitionings, and
    replays — append new documents and the previously-kept prefix
    only changes where new hashes interleave, not wholesale.

    Scale shape — the naive form is a window over each source, i.e.
    ONE partition sorts a whole domain (the canonical 100 TB OOM).
    Here the exclusive prefix sum decomposes over hash-RANGE buckets
    (the hash is uniform in [0, 2^60), so fixed-width ranges are
    balanced without any driver-side quantile probe — cf.
    global_row_numbers, which needs approxQuantile because its order
    column is arbitrary): per-(source, bucket) local cumsums ride one
    window exchange with ``offset_buckets``-way parallelism per
    source, bucket offsets are a bounded (sources x buckets) side
    frame, and ``tokens_before = offset + local exclusive cumsum``.
    The result is identical to the single-window form by prefix-sum
    associativity.
    """
    if offset_buckets < 1 or offset_buckets & (offset_buckets - 1):
        raise ValueError("offset_buckets must be a power of two")
    shift = 60 - offset_buckets.bit_length() + 1  # hash is 60-bit
    from pyspark.sql import Window

    h = portable_hash64(F.col(key_col), salt=salt)
    tagged = df.filter(
        F.col(source_col).isin(*budgets.keys())
    ).select(
        "*",
        h.alias("__h"),
        F.shiftrightunsigned(h, shift).alias("__hb"),
        F.col(token_col).cast("bigint").alias("__tok"),
    )
    w_local = (
        Window.partitionBy(source_col, "__hb")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tagged.withColumn(
        "__before_local", F.coalesce(F.sum("__tok").over(w_local), F.lit(0))
    )
    per_bucket = tagged.groupBy(source_col, "__hb").agg(
        F.sum("__tok").alias("__bn")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("__hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "__offset", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).select(source_col, "__hb", "__offset")
    budget_expr = F.create_map(
        *[x for s, b in budgets.items() for x in (F.lit(s), F.lit(int(b)))]
    )[F.col(source_col)]
    return (
        local.join(F.broadcast(offsets), [source_col, "__hb"])
        .withColumn(
            "tokens_before", F.col("__offset") + F.col("__before_local")
        )
        .filter(F.col("tokens_before") < budget_expr)
        .drop("__h", "__hb", "__tok", "__before_local", "__offset")
    )


def shard_assignment(
    df: DataFrame,
    key_col: str,
    rows_per_shard: int,
    salt: str = "shard",
    offset_buckets: int = 256,
) -> DataFrame:
    """Seeded global permutation + fixed-rows-per-shard assignment —
    the export step of a training pipeline: a loader wants the corpus
    in reproducibly SHUFFLED order, cut into equal shards it can map
    to workers, and the shuffle must be a pure function of (key, salt)
    so re-exports, replays, and a second engine land every record in
    the same (shard, position) slot.

    The permutation key is the engine-portable 60-bit md5 hash of the
    salted key (functions/hashing.py) — uniform by construction, so
    hash ORDER is a seeded permutation (the Efraimidis-Spirakis
    argument specialized to k = all).  The global rank over that order
    is computed WITHOUT a global sort, via fixed-width hash-RANGE
    buckets (the token_budget_mix decomposition — uniformity makes
    ranges balanced with no driver-side quantile probe, unlike
    global_row_numbers whose order column is arbitrary): per-bucket
    ranks ride one ``offset_buckets``-way window exchange, bucket
    offsets fold on a bounded side frame, ``row_id = offset + local
    rank``; then ``shard = (row_id-1) div rows_per_shard`` and
    ``pos_in_shard = (row_id-1) mod rows_per_shard``.  Every shard
    except the last holds exactly ``rows_per_shard`` rows.

    The result is identical to ``row_number() OVER (ORDER BY hash,
    key)`` (the SQL-oracle form) by prefix-sum associativity.

    Precondition: ``key_col`` is UNIQUE.  The same-(shard, position)-
    slot-on-replay guarantee rests on the (hash, key) order being a
    total order; duplicate keys tie on both, so row_number breaks the
    tie arbitrarily and the pairing of a row_id with the duplicates'
    OTHER columns becomes nondeterministic across runs/partitionings
    (exactly as the oracle's ``ORDER BY hh, doc_id`` rests on doc_id
    uniqueness).  Deduplicate first, or pass a key that is unique.
    """
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    if offset_buckets < 1 or offset_buckets & (offset_buckets - 1):
        raise ValueError("offset_buckets must be a power of two")
    from pyspark.sql import Window

    shift = 60 - offset_buckets.bit_length() + 1  # hash is 60-bit
    h = portable_hash64(F.col(key_col), salt=salt)
    tagged = df.select(
        "*",
        h.alias("__h"),
        F.shiftrightunsigned(h, shift).alias("__hb"),
    )
    w_local = Window.partitionBy("__hb").orderBy("__h", key_col)
    local = tagged.withColumn("__rank", F.row_number().over(w_local))
    per_bucket = tagged.groupBy("__hb").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy("__hb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.withColumn(
        "__offset", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).select("__hb", "__offset")
    n = F.lit(int(rows_per_shard))
    return (
        local.join(F.broadcast(offsets), "__hb")
        .withColumn("row_id", (F.col("__offset") + F.col("__rank")).cast("bigint"))
        .withColumn("shard", F.floor((F.col("row_id") - F.lit(1)) / n).cast("int"))
        .withColumn(
            "pos_in_shard", ((F.col("row_id") - F.lit(1)) % n).cast("int")
        )
        .drop("__h", "__hb", "__rank", "__offset")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    rows_per_shard: int,
    salt: str = "shard",
    offset_buckets: int = 256,
) -> DataFrame:
    """Materialize :func:`shard_assignment` as the on-disk layout a
    training loader consumes: one hive partition ``shard=<k>/`` per
    shard, rows inside each file in ``pos_in_shard`` order (parquet
    preserves row order per file, and the shard-keyed repartition puts
    each shard in exactly one task -> one file), so reading shard
    files front-to-back replays the seeded permutation exactly.

    Scale shape: ONE exchange keyed on the shard id (shard count grows
    with data at fixed rows_per_shard, so parallelism scales), sort
    within partitions only — no global sort.  Returns the assigned
    DataFrame for chaining/inspection.
    """
    assigned = shard_assignment(
        df, key_col, rows_per_shard, salt=salt, offset_buckets=offset_buckets
    )
    (
        assigned.repartition("shard")
        .sortWithinPartitions("shard", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return assigned


def epoch_capped_mix(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict[str, int],
    total_budget: int,
    max_epochs_num: int = 4,
    max_epochs_den: int = 1,
    max_sources: int = 10_000,
) -> DataFrame:
    """Repeat-capped mixture allocation — the budgeting step of a
    data-constrained training mix ("Scaling Data-Constrained Language
    Models" semantics): split ``total_budget`` tokens across sources
    proportional to integer ``weights``, but never schedule any source
    for more than ``max_epochs`` (= num/den) passes over its available
    tokens; budget a capped source cannot absorb is re-split across
    the still-uncapped sources by the same weights, iterating until no
    new source caps (<= n_sources rounds by construction — each round
    either caps somebody or finalizes everyone).

    All allocation arithmetic is INTEGER (floor division on bigints),
    so the fixpoint is bit-exact across engines — a DuckDB recursive
    CTE reproduces every round.  Only the reported ``epochs`` column
    (alloc/available) is a rounded double.

    Scale shape (100 TB): the per-source token totals are ONE
    map-side-combined aggregate whose cardinality is the number of
    corpora, not rows; the fixpoint runs driver-side on that bounded
    frame (guarded by ``max_sources`` — the same refuse-to-degrade
    contract as the IVF centroid collects) and the resulting plan is
    a broadcast-sized dict to feed :func:`token_budget_mix`.  The
    corpus itself is touched exactly once, map-side.

    Output: one row per weighted source —
    (source, available_tokens, weight, cap_tokens, alloc_tokens,
    epochs, capped, round_finalized).
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    if max_epochs_num < 0 or max_epochs_den <= 0:
        raise ValueError("max_epochs must be a non-negative rational")
    if not weights or any(int(w) <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    avail_rows = (
        df.filter(F.col(source_col).isin(*weights.keys()))
        .groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("bigint")).alias("__avail"))
        .limit(max_sources + 1)
        .collect()
    )
    if len(avail_rows) > max_sources:
        raise ValueError(
            f"epoch_capped_mix: >{max_sources} sources — the fixpoint "
            "frame is no longer driver-bounded; raise max_sources "
            "deliberately or pre-aggregate the source taxonomy"
        )
    state = {}  # source -> [avail, w, cap, alloc|None, round]
    for r in avail_rows:
        avail = int(r["__avail"])
        state[r[source_col]] = [
            avail,
            int(weights[r[source_col]]),
            (avail * max_epochs_num) // max_epochs_den,
            None,
            0,
        ]
    b_rem = int(total_budget)
    rnd = 0
    while any(v[3] is None for v in state.values()):
        rnd += 1
        open_src = [s for s, v in state.items() if v[3] is None]
        w_sum = sum(state[s][1] for s in open_src)
        tentative = {s: (b_rem * state[s][1]) // w_sum for s in open_src}
        newly = [s for s in open_src if tentative[s] >= state[s][2]]
        if newly:
            for s in newly:
                state[s][3] = state[s][2]
                state[s][4] = rnd
                b_rem -= state[s][2]
        else:
            for s in open_src:
                state[s][3] = tentative[s]
                state[s][4] = rnd
    spark = df.sparkSession
    # capped <=> alloc == cap: the fixpoint finalizes a source at its
    # cap iff tentative >= cap, and every uncapped finalization is a
    # strict tentative < cap, so equality identifies capping exactly.
    plan = [
        (s, v[0], v[1], v[2], v[3], v[3] == v[2], v[4])
        for s, v in sorted(state.items())
    ]
    # `epochs` is rounded SPARK-side (not Python round): F.round's
    # half-up on the +1e-9-nudged quotient is the cross-engine
    # convention every rounded double on the surface uses.
    return tiny_df(
        spark,
        plan,
        schema=(
            f"{source_col} string, available_tokens bigint, weight int, "
            "cap_tokens bigint, alloc_tokens bigint, "
            "capped boolean, round_finalized int"
        ),
    ).select(
        source_col,
        "available_tokens",
        "weight",
        "cap_tokens",
        "alloc_tokens",
        (
            F.round(
                F.col("alloc_tokens") / F.col("available_tokens")
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("epochs"),
        "capped",
        "round_finalized",
    )


def curriculum_order(
    df: DataFrame,
    key_col: str,
    difficulty_col: str,
    n_stages: int = 4,
    salt: str = "curriculum",
    buckets: int = 64,
) -> DataFrame:
    """Curriculum training order: rank every example easy-to-hard in
    ``n_stages`` equal stages, deterministically shuffled WITHIN each
    stage — the standard curriculum/annealing schedule (train on easy
    examples first, harden over stages, never present a stage in
    difficulty order).

    Stage assignment is the exact ntile formula on the global
    difficulty rank (``1 + (rank-1)*k // N`` — integer floor, so both
    engines agree bit-for-bit); the within-stage shuffle is the
    engine-portable md5 hash of the key, so the final order is stable
    across runs, engines, partitionings, and replays.

    Scale shape (100 TB): a global total order is required by the
    semantics, but NOT a global sort — both rankings run through
    ``global_row_numbers`` (operators/analytics.py), which decomposes
    the order into ``buckets`` approx-quantile ranges, ranks inside
    each range with one window exchange, and adds broadcast bucket
    offsets.  The second pass orders by a composite
    ``stage * 2^60 + hash`` bigint so its leading column is
    near-uniform and the ranges stay balanced.  No stage ever sees
    more than 1/buckets of the data in one task.

    Output: (key, difficulty, stage, curriculum_rank).
    """
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    from recover_spark.operators.analytics import global_row_numbers

    base = df.select(
        F.col(key_col),
        F.col(difficulty_col).cast("bigint").alias("difficulty"),
        portable_hash64(F.col(key_col), salt=salt).alias("__hv"),
    )
    # Pin the first ranking: the count aggregate, the second pass's
    # quantile probe, AND the second ranking all read it — without the
    # pin each re-executes the full first-pass lineage (scan + window
    # + broadcast).  Released by the caller/bench between queries.
    ranked = global_row_numbers(
        base, ["difficulty", key_col], id_col="__rn", buckets=buckets
    ).persist()
    n_row = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    staged = (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(
            "stage",
            (
                F.lit(1)
                + F.expr(f"(__rn - 1) * {int(n_stages)} DIV __n")
            ).cast("int"),
        )
        .withColumn(
            "__ord",
            F.shiftleft(F.col("stage").cast("bigint"), 60) + F.col("__hv"),
        )
        .drop("__rn", "__n")
    )
    return (
        global_row_numbers(
            staged, ["__ord", key_col], id_col="curriculum_rank",
            buckets=buckets,
        )
        .select(key_col, "difficulty", "stage", "curriculum_rank")
    )


def apply_epoch_plan(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    weights: dict[str, int],
    total_budget: int,
    max_epochs_num: int = 4,
    max_epochs_den: int = 1,
    salt: str = "budget",
    offset_buckets: int = 256,
    max_sources: int = 10_000,
) -> DataFrame:
    """Materialize :func:`epoch_capped_mix`'s allocation as the concrete
    training MULTISET: every document of a source appears
    ``alloc // available`` times (the complete passes), and the
    documents in the source's portable-hash-order token prefix of the
    remainder ``alloc % available`` appear once more (the
    :func:`token_budget_mix` boundary rule — first crosser included).
    The kept token mass per source is the plan's allocation to within
    one boundary document.

    Scale shape: the plan is the bounded per-source aggregate (see
    epoch_capped_mix); the remainder prefix is ONE token_budget_mix
    pass (hash-range-decomposed prefix sums, no per-source
    single-partition window); the full-pass counts ride a broadcast
    map.  Rows with ``n_copies = 0`` (unweighted sources, zero-pass
    sources outside the remainder prefix) are dropped.

    Output: (key, source, tokens, n_copies) — a loader repeats each
    document ``n_copies`` times; deterministic across runs, engines,
    partitionings, and replays.
    """
    # Pin the (key, source, tokens) projection: the plan aggregate, the
    # remainder-prefix pass (which reads it twice — local cumsums and
    # bucket offsets), and the final join all consume it; without the
    # pin each re-executes the upstream lineage (e.g. tokenization).
    # Released by the caller/bench between queries.
    df = df.select(key_col, source_col, token_col).persist()
    plan = epoch_capped_mix(
        df,
        source_col,
        token_col,
        weights,
        total_budget,
        max_epochs_num=max_epochs_num,
        max_epochs_den=max_epochs_den,
        max_sources=max_sources,
    ).select(source_col, "available_tokens", "alloc_tokens").collect()
    full = {
        r[source_col]: int(r["alloc_tokens"]) // int(r["available_tokens"])
        for r in plan
        if r["available_tokens"]
    }
    rem = {
        r[source_col]: int(r["alloc_tokens"]) % int(r["available_tokens"])
        for r in plan
        if r["available_tokens"]
    }
    base = df.select(
        F.col(key_col),
        F.col(source_col),
        F.col(token_col).cast("bigint").alias("__tok_apply"),
    )
    extra = token_budget_mix(
        base,
        key_col,
        source_col,
        "__tok_apply",
        rem,
        salt=salt,
        offset_buckets=offset_buckets,
    ).select(F.col(key_col).alias("__k_extra"), F.lit(1).alias("__plus"))
    full_expr = F.create_map(
        *[x for s, n in sorted(full.items()) for x in (F.lit(s), F.lit(n))]
    )[F.col(source_col)]
    return (
        base.filter(F.col(source_col).isin(*full.keys()))
        .join(
            F.broadcast(extra),
            base[key_col] == F.col("__k_extra"),
            "left",
        )
        .select(
            key_col,
            source_col,
            F.col("__tok_apply").alias(token_col),
            (full_expr + F.coalesce(F.col("__plus"), F.lit(0)))
            .cast("int")
            .alias("n_copies"),
        )
        .filter(F.col("n_copies") > 0)
    )
