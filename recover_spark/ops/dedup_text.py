"""Large-scale text deduplication operators (training-data pipeline).

Beyond the reference's keyed dedup (W1) these cover the standard
pretraining-corpus techniques: exact content dedup, MinHash+LSH near-dup,
SimHash, and n-gram Jaccard.  All are pure DataFrame ops using the
engine-portable md5-based hashes (functions/hashing.py) so results are
verifiable by an external SQL oracle.

Scale notes (100 TB corpus):
- exact_dedup: one shuffle on a 128-bit digest — uniform keys, no skew.
- minhash: signature computation is a per-doc map (explode -> groupBy
  doc).  The explode multiplies rows by shingle count, but partial
  aggregation (min per seed) collapses them map-side before the shuffle.
  Banding turns candidate generation into an equi-join on (band,
  band_hash) buckets — never an O(n^2) cross join; only same-bucket
  pairs are verified.
- ngram_jaccard_pairs: candidate pairs come from a shared-shingle
  equi-join (inverted index), again never O(n^2); hot shingles are
  capped (``max_shingle_freq``) exactly like production LSH pipelines
  drop stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recover_spark.functions.hashing import portable_hash64
from recover_spark.functions.text import tokens, word_ngrams_of


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition compute-heavy small scans up to cluster parallelism.

    A few thousand documents arrive as ONE parquet split, but shingling/
    hashing is CPU-bound per row — without this the whole stage runs on
    one core.  At real scale (inputs already wider than the cluster) the
    repartition is skipped, so no extra shuffle on the 100 TB path.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact-content dedup: keep the lowest id per content digest.

    Returns (kept id, content hash, group size).  One groupBy on md5 —
    uniformly distributed, broadcast-free, skew-free.
    """
    content = F.col(text_col)
    if normalize:
        content = F.lower(F.trim(content))
    return (
        df.select(F.col(id_col), F.md5(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_duplicates"),
        )
        .select(id_col, "content_hash", "n_duplicates")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """MinHash signature per document: for seed i, min over shingles of
    hash(seed_i | shingle).  Output: (id, minhash array of length
    ``num_hashes``).

    Plan: explode(shingles) -> groupBy(id).agg(min per seed).  The min
    aggregates combine map-side, so the shuffle carries one row per doc.
    """
    toked = _fan_out(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    shingled = toked.select(
        F.col(id_col),
        F.explode(word_ngrams_of(F.col("__toks"), shingle_size)).alias("shingle"),
    )
    # the num_hashes salted-md5 min aggregates ship as SQL text — one
    # py4j round trip per aggregate instead of ~12 (r14 optimization,
    # the bucket_chain lesson); the text parses to the identical
    # portable_hash64 tree (concat-salt, CAST AS STRING, md5,
    # substring 1..15, conv 16->10, CAST AS BIGINT)
    aggs = [
        F.expr(
            "min(CAST(conv(substring(md5(CAST(concat("
            f"'mh{i}', '|', `shingle`) AS STRING)), 1, 15), 16, 10) "
            "AS BIGINT))"
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = shingled.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col,
        F.expr(
            "array(" + ", ".join(f"mh_{i}" for i in range(num_hashes)) + ")"
        ).alias("minhash"),
    )


def band_digests(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding over a minhash signature table: one row per (doc,
    band) with the band's digest — the equi-join key that replaces the
    all-pairs comparison.  Map-side only (posexplode of ``bands``
    digests per row)."""
    rows = num_hashes // bands
    # band-digest array as SQL text (the minhash_signatures note)
    band_sql = ", ".join(
        "md5(concat_ws(','"
        + "".join(
            f", CAST(minhash[{b * rows + r}] AS STRING)"
            for r in range(rows)
        )
        + "))"
        for b in range(bands)
    )
    return sig.select(
        F.col(id_col),
        F.col("minhash"),
        F.posexplode(F.expr(f"array({band_sql})")).alias(
            "band", "band_hash"
        ),
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    min_signature_agreement: float | None = None,
) -> DataFrame:
    """MinHash+LSH candidate near-duplicate pairs.

    Signature -> ``bands`` bands of ``num_hashes/bands`` rows; docs
    sharing any band bucket become a candidate pair (equi-join on the
    band digest — the LSH trick that avoids O(n^2)).  Pairs are then
    scored by full-signature agreement (estimated Jaccard) and
    optionally filtered.

    Returns (id_a, id_b, signature_agreement) with id_a < id_b.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    band_entries = band_digests(sig, id_col, num_hashes, bands)

    a = band_entries.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"), "band", "band_hash"
    )
    b = band_entries.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"), "band", "band_hash"
    )
    pairs = (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "mh_a", "mh_b")
        .distinct()
    )
    agreement = (
        F.size(
            F.filter(
                F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes)
    ).alias("signature_agreement")
    out = pairs.select("id_a", "id_b", agreement)
    if min_signature_agreement is not None:
        out = out.filter(F.col("signature_agreement") >= min_signature_agreement)
    return out


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash: sign-sum of per-token hash bits -> one integer signature.

    Pure Catalyst: explode tokens, per-bit +-1 contributions via
    ``shiftright & 1``, one groupBy(id) with map-side partial sums.
    Near-dups are docs whose signatures differ in few bits (Hamming).
    """
    tok = _fan_out(df).select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = portable_hash64(F.col("tok"), salt="simhash")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy(id_col).agg(*bit_aggs)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"b_{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return sums.select(F.col(id_col), sig.cast("bigint").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_freq: int | None = 50,
) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs via an inverted index.

    |A ∩ B| from a self-join on shared shingles; |A ∪ B| = |A|+|B|-∩.
    ``max_shingle_freq`` drops stop-shingles (appearing in more than N
    docs) before the join — the standard skew guard: a shingle in k docs
    produces k^2 join rows, so one stop-shingle turns the candidate join
    quadratic.  The guard is ON by default (scale-safe); pass ``None``
    for unguarded exact Jaccard on corpora known to be stop-shingle
    free.  Contract under the guard: set sizes and intersections are
    computed over the rare-shingle universe, so the score is exact
    Jaccard on that universe; a pair sharing ONLY stop-shingles is not
    emitted (by construction such pairs are boilerplate matches, not
    near-duplicates).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    toked = _fan_out(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    shingled = toked.select(
        F.col(id_col),
        F.explode(word_ngrams_of(F.col("__toks"), shingle_size)).alias("shingle"),
    )
    if max_shingle_freq is not None:
        rare = (
            shingled.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .filter(F.col("df_freq") <= max_shingle_freq)
            .select("shingle")
        )
        shingled = shingled.join(rare, on="shingle")

    # The inverted index feeds three consumers (sizes + both join sides);
    # persist it so the shingling pass runs once, not three times.
    shingled = shingled.persist()
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    # sizes is O(n_docs) — too big to force-broadcast at corpus scale;
    # AQE broadcasts it when it is actually small.
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    min_containment: float = 0.6,
    max_shingle_freq: int | None = 50,
    min_set_size: int = 5,
) -> DataFrame:
    """DIRECTED n-gram containment pairs: C(A -> B) = |A ∩ B| / |A| —
    "most of document A's content appears inside document B" — the
    asymmetric sibling of ``ngram_jaccard_pairs`` for quote/excerpt/
    superset detection (a 100-word quote inside a 10 000-word article
    has Jaccard ~0.01 but containment ~1.0, so symmetric dedup never
    finds it; Broder's resemblance-vs-containment distinction).

    Same inverted-index shape and stop-shingle skew guard as the
    Jaccard path (one shingle shuffle feeding sizes and both join
    sides); the ONLY differences are the directed emit (both
    orientations of each candidate pair, ``id_a != id_b``) and the
    ``min_set_size`` floor — a doc with one rare shingle is trivially
    contained everywhere that shingle occurs, so tiny shingle sets are
    suppressed ON THE CONTAINED SIDE (the container may be any size).

    Returns (id_a, id_b, containment): id_a's rare-shingle set is
    ``containment``-covered by id_b's, containment >= threshold.
    """
    toked = _fan_out(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    shingled = toked.select(
        F.col(id_col),
        F.explode(word_ngrams_of(F.col("__toks"), shingle_size)).alias("shingle"),
    )
    if max_shingle_freq is not None:
        rare = (
            shingled.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .filter(F.col("df_freq") <= max_shingle_freq)
            .select("shingle")
        )
        shingled = shingled.join(rare, on="shingle")

    shingled = shingled.persist()
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    return (
        inter.join(sa, "id_a")
        .filter(F.col("size_a") >= min_set_size)
        .select(
            "id_a",
            "id_b",
            (F.col("n_common") / F.col("size_a")).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def duplicate_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    gets ``cluster`` = the minimum doc id reachable through the pair
    graph (singletons cluster to themselves).  This is the step that
    turns pairwise near-dup output (minhash/jaccard/embedding) into a
    keep-one-per-cluster decision — keep ``doc_id == cluster``.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels, until a
    fixpoint (<= graph diameter rounds, typically 2-4 for dedup graphs
    whose components are near-cliques).  Each round is one equi-join +
    one min-aggregate, both map-side combinable; ``localCheckpoint``
    truncates the growing lineage so round N's plan does not replay
    rounds 1..N-1 (the standard Spark idiom for iterative algorithms).

    At 100 TB: rounds shuffle on the node id; components are tiny
    (near-dup clusters), so no label ever fans out meaningfully and AQE
    handles the (rare) giant-component skew.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges_bi = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    )
    for _ in range(max_iterations):
        neigh = edges_bi.join(
            labels, edges_bi.dst == labels.node
        ).select(F.col("src").alias("node"), "label")
        new_labels = (
            labels.unionAll(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # A component with diameter > max_iterations would yield wrong
        # cluster ids silently (the oracle computes the exact fixpoint).
        raise RuntimeError(
            "duplicate_clusters did not converge within "
            f"{max_iterations} iterations; raise max_iterations "
            "(components deeper than this are not near-dup-shaped)"
        )
    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("cluster")
    )


def greedy_survivors(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    node_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """The greedy lower-id crawl-dedup rule, computed TRANSITIVELY:
    process documents in id order, keep a document iff none of its
    near-duplicate neighbors with a lower id was itself KEPT.  Returns
    the surviving node ids (one column, ``node_col``).

    This differs from both naive alternatives (ADVICE r5): dropping
    every ``doc_b`` of every pair over-deletes — in a chain A~B, B~C
    with A!~C, C's only lower-id neighbor B did NOT survive, so C must
    be kept (it has no near-duplicate representative otherwise);
    keep-one-per-connected-component under-keeps the same C.  Greedy
    MIS by id keeps {A, C}: every dropped doc has a KEPT direct
    near-duplicate.

    Algorithm: parallel greedy maximal-independent-set with the id as
    the fixed priority.  Each round, every UNDECIDED node whose id is
    smaller than all its undecided neighbors' ids becomes KEPT (all
    its lower-id neighbors are decided, and none was kept — else this
    node would already be dropped); its neighbors become DROPPED.
    Rounds = longest id-descending dependency chain (near-dup graphs:
    a handful).  Each round is one equi-join + one min-aggregate on
    the PAIR graph (AP-SS output, tiny next to the corpus), lineage
    truncated per round.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges_bi = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    undecided = nodes.select(F.col(node_col).alias("node"))
    kept_parts: list[DataFrame] = []
    for _ in range(max_iterations):
        if undecided.limit(1).count() == 0:
            break
        und_ids = undecided.select(F.col("node").alias("dst"))
        nbr_min = (
            edges_bi.join(und_ids, "dst")
            .groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .withColumnRenamed("src", "node")
        )
        kept = (
            undecided.join(nbr_min, "node", "left")
            .filter(F.col("__mn").isNull() | (F.col("node") < F.col("__mn")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        dropped = (
            edges_bi.join(kept.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        kept_parts.append(kept)
        undecided = (
            undecided.join(kept, "node", "left_anti")
            .join(dropped, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            "greedy_survivors did not converge within "
            f"{max_iterations} iterations; raise max_iterations "
            "(dependency chains deeper than this are not near-dup-shaped)"
        )
    if not kept_parts:
        return nodes.select(F.col(node_col)).limit(0)
    out = kept_parts[0]
    for p in kept_parts[1:]:
        out = out.unionAll(p)
    return out.withColumnRenamed("node", node_col)


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
    max_docs: int = 1,
) -> DataFrame:
    """C4-style boilerplate removal at span granularity: drop every
    fixed-width word span whose exact content appears in more than
    ``max_docs`` distinct documents, and reassemble the survivors in
    order.  (C4 does this per line; the corpus here is unstructured
    text, so the unit is a ``span_words``-word chunk.)

    Scale shape: explode to spans (map-side), ONE groupBy on span
    content counting distinct docs (partial aggregation collapses
    within-doc repeats map-side), an equi-join back on span content,
    then a per-doc reassembly aggregate — order restored via
    ``array_sort`` over (position, span) structs, so reassembly is a
    plain shuffle-agg, not a window sort.  Span content as join key is
    fine at 10 words; at 100 TB swap in md5(span) to shrink shuffle
    payloads (identical semantics, the hash only keys the count join).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_spans = F.ceil(F.size(toks) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(
            F.slice(toks, i * span_words + 1, span_words), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(spans).alias("pos", "span")
    )
    counts = exploded.groupBy("span").agg(
        F.countDistinct(id_col).alias("__n_docs")
    )
    kept = exploded.join(counts, "span").filter(
        F.col("__n_docs") <= max_docs
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "span"))
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_spans_kept"),
        )
    )


def canonical_corpus(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Collapse near-dup clusters to one canonical document each: per
    cluster keep the LONGEST document (ties -> lowest id) — the
    standard keep-best rewrite after pairwise dedup + clustering, and
    the final step that actually shrinks the corpus.

    Scale shape: one equi-join of docs to their cluster labels on the
    doc id, then a single groupBy on the cluster whose argmax is an
    ordered-struct ``max`` — fully map-side-combinable (each map task
    forwards ONE candidate per cluster), cheaper than the equivalent
    window/rank formulation which must sort whole partitions.  The
    negated id inside the struct turns lexicographic max into
    (longest, then lowest-id) without a second pass.

    Output: (doc_id, cluster, n_chars, cluster_size) for kept docs.
    """
    labeled = docs.select(id_col, length_col).join(clusters, on=id_col)
    best = F.max(
        F.struct(
            F.col(length_col).alias("len"),
            (-F.col(id_col)).alias("neg_id"),
        )
    ).alias("__best")
    return (
        labeled.groupBy("cluster")
        .agg(best, F.count(F.lit(1)).alias("cluster_size"))
        .select(
            (-F.col("__best.neg_id")).alias(id_col),
            "cluster",
            F.col("__best.len").alias(length_col),
            "cluster_size",
        )
    )


def cluster_size_histogram(
    clustered: DataFrame,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Duplication profile of a clustered corpus: for each cluster
    SIZE, how many clusters have it and how many rows they hold — the
    one-screen answer to "how duplicated is this corpus and where
    does the mass sit" (a heavy tail of size-1 clusters means dedup
    buys little; a few giant clusters mean template floods), and the
    sizing input for the keep-one-per-cluster step: rows removed by
    dedup = sum over sizes of (size - 1) * n_clusters.

    Two aggregates, both with map-side combine: (cluster -> size),
    then (size -> cluster count) — the second frame is at most
    sqrt(2N) rows (distinct sizes), so nothing after the first
    aggregate is ever large.
    """
    sizes = clustered.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("__size")
    )
    return (
        sizes.groupBy(F.col("__size").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .withColumn(
            "n_rows", F.col("cluster_size") * F.col("n_clusters")
        )
        .orderBy("cluster_size")
    )


def excise_cross_doc_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    min_docs: int = 2,
    hash_shingles: bool = True,
) -> DataFrame:
    """Cross-document exact-substring dedup (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    at word-shingle grain): every ``ngram``-token window whose content
    appears in >= ``min_docs`` DISTINCT documents is redundant
    everywhere except the globally first document containing it
    (lowest id — the deterministic keep-one rule), and redundant
    windows merge into maximal per-doc token spans to excise.  This is
    the across-documents complement of ``remove_repeated_spans``
    (which drops duplicated chunks from EVERY doc) and of the
    within-doc span machinery: shared boilerplate headers/footers
    survive in exactly one document.

    Scale shape — sub-quadratic by construction: overlapping shingles
    explode map-side with their start positions; ONE groupBy on
    shingle content yields (winner = min doc id, distinct-doc count)
    with map-side partials; redundancy is an equi-join back on the
    shingle (the inverted-index join, never doc x doc); maximal spans
    run-length compress with gaps-and-islands (two window passes KEYED
    ON THE DOC over redundant positions only — bounded by doc length,
    and empty for every doc with no shared content).  By default the
    aggregate/join key is the portable 60-bit md5 hash of the span
    content (``hash_shingles=True``) — 8 bytes across the shuffle
    instead of an ~8-word string, the engine-portable form of the
    ``remove_repeated_spans`` scale note; a 60-bit collision over even
    10^9 distinct shingles is ~odds 1e-4, and a collision only MERGES
    two shingles' doc sets (excising at most a spurious window, never
    corrupting survivors).  Pass ``False`` to key on raw content.

    Output: one row per excised maximal span — (doc_id, span_start,
    span_end) inclusive 0-based token indices plus
    ``n_tokens_removed``.  Docs with nothing to excise are absent;
    pair with :func:`apply_span_excision` to rewrite the corpus.
    """
    from pyspark.sql import Window

    # materialize the token array behind a projection FIRST: higher-
    # order functions get no common-subexpression elimination, so an
    # inline tokens() expression referenced inside the per-window
    # lambda would re-tokenize the whole document once per window —
    # O(len^2) per doc (the functions/text.py stopword_ratio note)
    tokd = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    starts = F.when(
        F.size(toks) >= ngram,
        F.sequence(F.lit(0), F.size(toks) - ngram),
    ).otherwise(F.array().cast("array<int>"))
    content = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i + 1, ngram), " "
    )
    key = (
        (lambda i: portable_hash64(content(i)))
        if hash_shingles
        else content
    )
    sh = tokd.select(
        F.col(id_col),
        F.posexplode(F.transform(starts, key)).alias("pos", "__sh"),
    )
    winners = sh.groupBy("__sh").agg(
        F.min(id_col).alias("__winner"),
        F.countDistinct(id_col).alias("__nd"),
    )
    red = (
        sh.join(winners, "__sh")
        .filter(
            (F.col("__nd") >= min_docs)
            & (F.col(id_col) != F.col("__winner"))
        )
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > ngram),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    isl = red.withColumn(
        "__island",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(ngram - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_tokens_removed"),
        )
        .orderBy(id_col, "span_start")
    )


def apply_span_excision(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite the corpus with :func:`excise_cross_doc_spans` output
    applied: tokens inside any of a doc's excised spans are dropped,
    survivors rejoin in order.  Docs with no spans pass through with
    their tokenized text (the tokenize-rejoin round trip is the same
    normalization every span consumer sees); every non-text column of
    ``docs`` rides through unchanged, so provenance metadata survives
    the rewrite.

    Map-shaped after ONE equi-join of the corpus to its per-doc span
    list (span lists are tiny — maximal spans, not shingles).  The
    membership test is ``F.exists`` over the (start, end) span structs
    — O(tokens × n_spans) per doc, NOT O(tokens × removed-positions):
    for boilerplate-heavy docs where most text is excised the spans
    stay few by construction (maximal, non-overlapping) while a
    flattened position array would approach doc length and make the
    filter quadratic.  Token count stays corpus-linear.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").cast("int").alias("s"),
                F.col("span_end").cast("int").alias("e"),
            )
        ).alias("__spans")
    )
    extra = [c for c in docs.columns if c not in (id_col, text_col)]
    joined = (
        docs.select(
            F.col(id_col), *extra, tokens(F.col(text_col)).alias("__toks")
        )
        .join(per_doc, id_col, "left")
        .withColumn(
            "__sp",
            F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<s:int,e:int>>"),
            ),
        )
    )
    sp = F.col("__sp")
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            sp, lambda g: (i >= g["s"]) & (i <= g["e"])
        ),
    )
    n_removed = F.aggregate(
        sp, F.lit(0), lambda acc, g: acc + (g["e"] - g["s"] + F.lit(1))
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias(text_col),
        n_removed.cast("int").alias("n_tokens_removed"),
        *extra,
    )
