"""Physical-plan contracts: assert the optimizer artifacts the scale
design depends on (pushdown, join strategy, shuffle shape) — not just
row-level results.  A regression that silently degrades a plan (e.g. a
range join falling back to BroadcastNestedLoopJoin) fails here even
though outputs stay correct."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def parquet_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "t.parquet")
    spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 100).alias("k"),
        (F.col("id") * 2.0).alias("v"),
    ).write.parquet(p)
    return p


def test_filter_and_projection_reach_parquet_scan(spark, parquet_dir):
    from recover_spark.sources.readers import read_parquet_dataset

    df = read_parquet_dataset(
        spark, parquet_dir, columns=["id", "k"], predicate="k = 7"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "EqualTo(k,7)" in plan
    # column pruning: v must not be read
    assert "v" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_asof_join_plan_has_no_join_operator(spark):
    from recover_spark.operators import asof_join

    left = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 10), 1.0)], "k string, ts timestamp, x double"
    )
    right = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 9), 2.0)], "k string, ts timestamp, m double"
    )
    plan = _plan(asof_join(left, right, on=["k"], right_cols=["m"]))
    assert "Join" not in plan  # union + window only
    assert "Window" in plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    from recover_spark.operators import range_join

    points = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 10), 1)], "k string, ts timestamp, pid int"
    )
    ivals = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 9), datetime(2024, 1, 1, 11), 1)],
        "k string, start timestamp, end timestamp, iid int",
    )
    plan = _plan(range_join(points, ivals, on=["k"]))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_broadcast_hint_respected_in_dim_join(spark, parquet_dir):
    fact = spark.read.parquet(parquet_dir)
    dim = spark.createDataFrame([(7, "seven")], "k long, name string")
    plan = _plan(fact.join(F.broadcast(dim), on="k"))
    assert "BroadcastHashJoin" in plan


def test_dedup_latest_single_shuffle(spark, parquet_dir):
    from recover_spark.operators import dedup_latest

    df = spark.read.parquet(parquet_dir)
    out = dedup_latest(
        df, index_fields=["k"], order_fields=["v"], tiebreakers=["id"]
    )
    plan = _plan(out)
    # exactly one Exchange: the window partitioning on the index key
    assert plan.count("Exchange hashpartitioning") == 1


def test_rollup_is_single_expand_aggregate(spark, parquet_dir):
    from recover_spark.operators import rollup_aggregate

    df = spark.read.parquet(parquet_dir)
    out = rollup_aggregate(df, ["k"], {"s": F.sum("v")})
    plan = _plan(out)
    assert "Expand" in plan
    # one scan feeds the rollup — not one scan per grouping set
    assert plan.count("Scan parquet") == 1


def test_exact_dedup_no_broadcast_no_second_scan(spark, parquet_dir):
    from recover_spark.ops import exact_dedup

    df = spark.read.parquet(parquet_dir).select(
        "id", F.col("k").cast("string").alias("text")
    )
    plan = _plan(exact_dedup(df, text_col="text", id_col="id"))
    assert plan.count("Scan parquet") == 1
    assert "BroadcastNestedLoopJoin" not in plan


SF_SMOKE = "/root/testdata/sf0.001"


def test_market_share_dims_all_broadcast(spark):
    """Q8-style 7-table join: every dimension side (part, nation x2,
    region, supplier) must arrive via BroadcastHashJoin; only the
    fact-fact joins (lineitem-orders, orders-customer) may shuffle."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_join_market_share(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    # at most the two fact joins shuffle
    assert plan.count("SortMergeJoin") <= 2


def test_small_qty_threshold_join_is_broadcast(spark):
    """Q17-style per-part threshold: the aggregate side (one row per
    Brand#1 part) must broadcast back, never shuffle the fact."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_agg_small_qty_revenue(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_sales_opportunity_scalar_is_broadcast_not_collect(spark):
    """Q22-style global average: one-row broadcast join (the plan may
    keep the single-row cross as a broadcast nested loop — what is
    banned is a shuffled cartesian), anti-join stays a join."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_agg_sales_opportunity(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_session_window_single_shuffle(spark):
    """Native session_window agg: one hash-partition exchange on the
    session key — session merging happens within the partition."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_win_session_native(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1


def test_embedding_near_dup_default_never_touches_driver(spark):
    """The DEFAULT embedding near-dup path must be the scale-safe one:
    work distributed by LSH bucket — per-bucket vectorized GEMM
    (FlatMapGroupsInPandas after ONE exchange on the bucket), never a
    driver collect, corpus broadcast, or nested-loop/cartesian join.
    The expression scorer is the same shape as a pure equi-join; the
    exact GEMM stays opt-in and must refuse to exceed its row cap."""
    from recover_spark.ops.similarity import embedding_near_duplicates

    df = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(8)]).alias(
            "embedding"
        ),
    )
    pairs = embedding_near_duplicates(df, threshold=0.8, dim=8)
    plan = _plan(pairs)
    assert "FlatMapGroupsInPandas" in plan  # per-bucket GEMM, distributed
    assert plan.count("Exchange hashpartitioning") == 1  # keyed on bucket
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan  # corpus is never broadcast

    expr_pairs = embedding_near_duplicates(
        df, threshold=0.8, dim=8, scorer="expr"
    )
    expr_plan = _plan(expr_pairs)
    assert "Join" in expr_plan  # same-bucket equi-join, fully distributed
    assert "ArrowEvalPython" not in expr_plan
    assert "FlatMapGroupsInPandas" not in expr_plan
    assert "CartesianProduct" not in expr_plan

    # both scorers agree on the pair set (GEMM == expression cosine)
    got_g = {(r.id_a, r.id_b) for r in pairs.collect()}
    got_e = {(r.id_a, r.id_b) for r in expr_pairs.collect()}
    assert got_g == got_e

    with pytest.raises(ValueError, match="max_broadcast_rows"):
        embedding_near_duplicates(
            df, threshold=0.8, method="broadcast", max_broadcast_rows=100
        )


def test_training_pipeline_single_shuffle(spark):
    """The composed training-data pipeline (quality gate -> lang filter
    -> exact dedup -> chunking) must cost ONE shuffle end-to-end: the
    verdict/lang filters are column expressions fused into the scan
    (no self-join back to the text), dedup is a single window exchange
    on the content digest, chunking is a map-side explode."""
    import __spark_entry__ as entrymod

    df = entrymod.q_pipe_training_data(spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
    # map-side pre-shuffle cut on the dedup window
    assert "WindowGroupLimit" in plan


def test_repetition_stats_are_shuffle_free(spark):
    """The Gopher repetition stats are document-local; their plan must
    contain NO exchange (the sorted-run mode replaces explode+groupBy)
    and no Python evaluation."""
    from recover_spark.functions.text import tokens
    from recover_spark.ops.text_analysis import (
        dup_token_fraction,
        top_ngram_fraction,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b")], "doc_id long, text string"
    )
    df = docs.select("doc_id", tokens("text").alias("__toks")).select(
        "doc_id",
        dup_token_fraction(F.col("__toks")).alias("dup"),
        top_ngram_fraction(F.col("__toks"), 2).alias("top"),
    )
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The corpus side of decontamination must hit the benchmark
    shingles via a broadcast join — shuffling the corpus on shingle
    would be a tokens-x-corpus-size exchange at 100 TB."""
    from recover_spark.ops.decontam import benchmark_ngram_hits

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "c d e f")], "doc_id long, text string"
    )
    df = benchmark_ngram_hits(docs.filter("doc_id = 0"), docs, n=3)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin allowed is none: the id-side left join is
    # also broadcastable at this size, but never the gram join
    gram_join = plan.split("BroadcastHashJoin")[1]
    assert "__gram" in gram_join or "__gram" in plan


def test_kmeans_assignment_is_map_side_single_shuffle(spark):
    """kmeans_step: assignment adds no exchange (mapInPandas in the
    scan stage); the ONLY exchange is the K-row mean aggregation."""
    from recover_spark.ops.clustering import kmeans_step

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(kmeans_step(df, n_centroids=2, dim=2))
    # one exchange for the groupBy('cid'); AQE may add a coalesce stage
    # marker but no second hash exchange on a different key
    assert plan.count("Exchange hashpartitioning") <= 1


def test_no_cartesian_product_across_query_surface(spark):
    """Umbrella contract: no query on the lazy-constructible surface
    may plan a CartesianProduct (the one O(n*m) shape with no scale
    story).  Deliberate one-row broadcast scalars compile to
    BroadcastNestedLoopJoin with IdentityBroadcast — bounded and
    allowed; a true CartesianProduct is not.  Queries that execute
    driver-side work during construction (iterative clustering,
    approxQuantile, streaming runs) are covered by their own tests."""
    import __spark_entry__ as entry

    lazy_queries = [
        "w1_dedup_latest", "j1_anti_delete", "j2_child_rekey",
        "j3_diff", "j4_audit_merge", "a1_stage_counts",
        "agg_pricing_summary", "join_top_orders", "join_nation_revenue",
        "join_volume_shipping", "join_market_share", "join_returned_items",
        "join_large_orders", "agg_custdist", "agg_promo_revenue",
        "join_product_profit", "join_late_shipments", "join_top_supplier",
        "join_waiting_suppliers", "join_asof", "join_range",
        "join_interval_overlap", "join_anti_bloom", "join_semi_exists",
        "join_salted_skew", "dedup_exact", "dedup_minhash",
        "dedup_jaccard", "dedup_simhash", "dedup_fingerprint",
        "mm_phash_dedup", "link_records", "graph_triangles",
        "text_stats", "text_langid", "text_quality_score",
        "text_lm_score", "text_tfidf", "sample_temperature",
        "sample_stratified", "ts_anomaly", "ts_anomaly_chunked",
        "ts_interpolate", "ts_resample", "layout_zorder",
        "agg_regression", "agg_pareto", "path_transitions",
        "funnel_steps", "funnel_windowed", "retention_cohorts",
        "pipe_training_data",
        # round 5 (text_bpe_train excluded: the training loop runs
        # during construction; pinned by tests/test_bpe.py instead)
        "join_bucketed", "scan_zonemap", "text_bm25",
        "sample_importance", "text_lm_bigram", "decontam_fuzzy",
        "scan_bloommap", "dedup_cosine_exact",
        # round 5 session 2 (graph_pagerank excluded: the iteration
        # loop runs node-count jobs during construction; pinned by
        # tests/test_pagerank.py instead)
        "ts_smooth", "sample_weighted", "join_asof_nearest",
        "agg_skyline", "agg_quantile_rollup", "v5_drift_psi",
        "v6_drift_categorical", "dedup_cosine_probe",
        # round 6 (the lifecycle queries — *_compacted, *_maintained,
        # *_deleted, stream_drift_* — execute their build/append/
        # compact/stream work during construction and are pinned by
        # their own lifecycle tests instead)
        "ts_holt_winters", "ts_holt",
        # round 7 (graph_components excluded: the doubling loop runs
        # convergence checks during construction; pinned by
        # tests/test_ops_scale.py::TestConnectedComponents instead)
        "ts_holt_winters_damped", "v7_drift_ks", "ts_forecast",
        "ts_anomaly_seasonal", "v8_ref_integrity", "agg_corr_matrix",
        "v9_drift_ks_series",
        # round 8 (stream_drift_ks is a lifecycle query — pinned by
        # TestStreamingDrift::test_streamed_ks_and_js_equal_batch_twins)
        "v10_drift_js", "ts_autocorr", "ts_cusum", "agg_assoc_matrix",
        "sample_token_budget", "retrieval_hybrid",
        "ts_anomaly_mad", "agg_entropy", "text_novelty", "v11_benford",
        "retention_survival", "agg_gini", "ts_theil_sen",
        # round 9 (emb_pca_project excluded: the component fixture is
        # computed during construction; pinned by its own oracle row
        # and tests/test_pca.py)
        "agg_ab_welch", "agg_trimmed_stats", "text_collocations",
        "scd2_history", "retrieval_rank_metrics", "agg_ab_prop_ztest",
        "v12_drift_wasserstein", "graph_assortativity",
        "agg_weighted_quantiles", "text_zipf", "mm_scene_cuts",
        "emb_silhouette", "agg_hhi",
        # (emb_whiten / emb_pca_project build the component fixture
        # during construction; stream_drift_* are lifecycle queries)
        # round 10
        "agg_auc", "agg_calibration", "agg_reliability_bins",
        "agg_mutual_info", "agg_kappa", "agg_avg_precision",
        "agg_spearman", "sample_group_topk", "transform_rank_normalize",
        "agg_effect_size", "text_lexical_diversity", "agg_moments",
        "text_vocab_overlap", "v13_drift_chi2", "transform_standardize",
        "transform_winsorize", "graph_clustering_coeff",
        "v14_functional_deps", "v15_iqr_outliers", "text_readability",
        "ts_gaps", "mm_audio_energy",
        # (stream_auc_matview / stream_calibration_matview are
        # lifecycle queries, pinned by their stream==batch suites)
        # round 12 (text_unigram_train excluded: its result is a
        # driver-built literal table, the training plans are pinned in
        # test_unigram.py; stream_cm_matview is a lifecycle query)
        "ts_changepoint", "text_keywords_textrank", "agg_cm_frequency",
        "ann_ivf_pq_refined",
    ]
    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    bad = []
    for name in lazy_queries:
        plan = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append(name)
    assert bad == [], f"CartesianProduct in: {bad}"


def test_link_records_single_equi_join_no_quadratic_operator(spark):
    """Blocked linkage: candidate generation must be an equi-join on
    the derived block key — never a cartesian/nested-loop pairing —
    with the hot-block guard riding broadcast joins and the length-band
    + thresholded-levenshtein predicates evaluated inside the join."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_link_records(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both sides of the self-join shuffle on the block key at most once
    assert plan.count("Exchange hashpartitioning") == 2
    # the length band is in the join condition, pre-scorer
    assert "length" in plan and "levenshtein" in plan


def test_win_streaks_two_user_keyed_exchanges_with_group_limit(spark):
    """Gaps-and-islands: one distinct+window exchange keyed on the
    user, one island-aggregate exchange — the final per-user argmax
    must carry a map-side WindowGroupLimit so the rank-1 filter prunes
    before the last shuffle, and the event scan happens once."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_win_streaks(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("Scan parquet") == 1


def test_agg_mode_is_two_aggregates_no_window(spark):
    """Deterministic mode: (user, type) counts then the per-user
    ordered-struct argmax — two map-side-combinable aggregates, two
    exchanges, NO window operator (a rank-based mode would sort every
    group) and no single-partition collapse."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_agg_mode(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Scan parquet") == 1


def test_text_lm_score_shuffles_at_vocab_size_only(spark):
    """Corpus-LM scoring: token/frequency aggregates shuffle at
    vocabulary size (hash exchanges), the (N, V) corpus constants ride
    ONE one-row broadcast (the single BroadcastNestedLoopJoin is that
    one-row cross join — it never touches two corpus-sized sides), and
    nothing runs in Python."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_text_lm_score(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert plan.count("Exchange SinglePartition") == 1  # the (N,V) agg
    # the doc-token and frequency aggregates sit behind localCheckpoint
    # boundaries (diamond pinning — one corpus pass for fit AND score),
    # so the visible plan has the scoring re-aggregation exchange plus
    # the checkpointed RDD scans
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("ExistingRDD") >= 2
    assert "Python" not in plan and "BatchEval" not in plan


def test_agg_pareto_windows_over_aggregate_not_fact_table(spark):
    """Cumulative-share: the global-order window and the grand-total
    aggregate each collapse to a single partition ONLY at customer-
    aggregate size (2 SinglePartition exchanges downstream of the
    groupBy), the fact table itself shuffles once per aggregate, and
    the total rides a one-row broadcast cross join."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_agg_pareto(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Exchange SinglePartition") == 2
    assert plan.count("BroadcastNestedLoopJoin") == 1  # one-row total
    assert "CartesianProduct" not in plan
    # the SinglePartition exchanges sit ABOVE the per-customer
    # aggregate, never on the raw orders scan
    agg_pos = plan.find("Exchange hashpartitioning")
    sp_pos = plan.find("Exchange SinglePartition")
    assert agg_pos != -1 and sp_pos != -1 and sp_pos < agg_pos


def test_text_bm25_inverted_index_shape(spark):
    """BM25: the (doc, term) tf aggregate is pinned behind a checkpoint
    boundary (diamond: postings, doclen, df all consume it — scan-once),
    the query-term set arrives via broadcast joins, the corpus constants
    ride ONE one-row broadcast nested loop, and nothing is Python."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_text_bm25(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("ExistingRDD") >= 3        # pinned tf, 3 consumers
    assert plan.count("BroadcastNestedLoopJoin") == 1  # (N, avgdl) row
    assert "Python" not in plan and "MapInPandas" not in plan


def test_sample_importance_single_corpus_pass(spark):
    """DSIR importance: the doc-feature aggregate is pinned (ExistingRDD
    on both the fit and scoring branches — corpus shuffled once), the
    top-V vocabulary is a TakeOrdered (never a global sort), weights
    return via broadcast, and the whole query stays JVM-side."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_sample_importance(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("ExistingRDD") >= 2
    assert plan.count("TakeOrderedAndProject") >= 1
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Python" not in plan and "MapInPandas" not in plan


def test_text_lm_bigram_vocab_sized_model_tables(spark):
    """Bigram LM: the model's unigram table is pinned for its three
    consumers, scoring joins are broadcasts at smoke scale, the (N, V)
    scalars ride one nested-loop row, and bigram construction is the
    map-side Generate zip (never a positional self-join)."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_text_lm_bigram(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Python" not in plan and "MapInPandas" not in plan


def test_decontam_fuzzy_broadcast_band_join(spark):
    """Fuzzy decontamination: exactly TWO corpus-side shuffles (the two
    signature min-aggregations) and ONE broadcast hash join on the band
    digests — the corpus is never self-joined, shuffled for the join,
    or collected."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_decontam_fuzzy(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("SortMergeJoin") == 0
    assert "Python" not in plan


def test_skew_hitters_sketch_bounded_candidates(spark):
    """MG heavy hitters: ONE MapInPandas (the per-partition summaries),
    candidates return by broadcast for the exact semi-join recount, and
    the only corpus-side exchanges are the candidate distinct and the
    recount aggregate."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_skew_hitters_sketch(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("TakeOrderedAndProject") == 1  # top-N, no global sort


def test_dedup_cosine_exact_auto_dense_tile_shape(spark):
    """AP-SS exact threshold join on the tiny-vocab documents table:
    auto picks the DENSE strategy, whose plan is one
    FlatMapGroupsInPandas GEMM tile per block pair fed by the
    checkpointed postings (never a cartesian, never a driver
    collect/broadcast of the corpus); the vocab index arrives via
    BroadcastHashJoin (vocab-sized by the guard)."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_dedup_cosine_exact(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1  # the GEMM tiles
    assert plan.count("BroadcastHashJoin") == 1  # vocab index only
    # pinned diamond: checkpointed postings, no corpus re-read
    assert "Scan ExistingRDD" in plan
    assert plan.count("Scan parquet") == 0


def test_apss_prefix_strategy_equi_join_shape(spark):
    """The prefix (open-vocab) strategy plans equi-joins only: the
    candidate self-join and both verification joins are hash/merge
    joins with the positional bound inside the join condition — no
    cartesian, no Python anywhere (pure Catalyst)."""
    from recover_spark.ops.apss import cosine_threshold_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} x{i%7} y{i%11}") for i in range(40)],
        "doc_id long, text string",
    )
    df = cosine_threshold_pairs(docs, 0.8, strategy="prefix")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_sample_weighted_single_window_exchange(spark):
    """E-S weighted sampling per group: one hash exchange on the group
    key, map-side score projection (md5/conv/ln are JVM intrinsics —
    no Python), no join anywhere."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_sample_weighted(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_asof_nearest_one_exchange_two_sorts(spark):
    """Nearest-direction as-of: backward and forward carries share the
    union's single key exchange — two window SORTS, never a second
    shuffle, and no join operator at all."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_join_asof_nearest(spark, SF_SMOKE))
    # exactly two exchanges: the marker pre-aggregation (same as
    # join_asof) and ONE union exchange feeding BOTH window sorts —
    # the forward pass must not add a third
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert plan.count("Window") == 2
    assert plan.count("Sort") == 2


def test_holt_winters_two_partitionings_no_cartesian(spark):
    """The seasonal scan's physical plan: exchanges only on (key) and
    (key, chunk) — the family's two partitionings — no
    SinglePartition exchange (the scale-killer a naive global
    formulation would plan) and no CartesianProduct.  The `local`
    subtree legitimately appears under both the summaries branch and
    the row join: column pruning strips the conv fold from the former
    (pinned as a comment in the operator; a checkpoint measured
    slower)."""
    import re

    from recover_spark.operators.temporal import holt_winters_smooth

    df = spark.createDataFrame(
        [("a", i, float(i % 5)) for i in range(200)],
        "k string, t int, v double",
    )
    for phi in (1.0, 0.85):          # classic and damped-trend
        for impl in ("hof", "arrow"):
            plan = (
                holt_winters_smooth(df, ["k"], "t", "v", 0.3, 0.1, 0.2, 4,
                                    chunk_rows=16, phi=phi, impl=impl)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "CartesianProduct" not in plan, (phi, impl)
            assert "Exchange SinglePartition" not in plan, (phi, impl)
            parts = {
                tuple(
                    sorted(c.strip().split("#")[0] for c in m.split(",")[:-1])
                )
                for m in re.findall(
                    r"Exchange hashpartitioning\(([^)]*)\)", plan
                )
            }
            assert parts == {("k",), ("__chunk", "k")}, (phi, impl, parts)


def test_index_deletion_scan_is_partition_scoped(spark, tmp_path):
    """delete_from_text_index's rewrite reads ONLY the touched term
    buckets: the kept-rows scan carries PartitionFilters on tb (the
    same pruning contract as the probe)."""
    from recover_spark.ops.text_index import build_text_index
    from recover_spark.ops.text_index import _read_or_empty, _POSTINGS_SCHEMA
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"shared anchor term plus unique{i}") for i in range(20)],
        "doc_id long, text string",
    )
    build_text_index(docs, path, num_buckets=16)
    stored = _read_or_empty(
        spark, os.path.join(path, "postings"), _POSTINGS_SCHEMA
    )
    pruned = stored.filter(F.col("tb").isin([1, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:120]
    assert "tb" in seg
