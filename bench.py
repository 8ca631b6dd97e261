"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query executes via count()-style full materialization (collect for
small results) after a warm-up of the input scans, so timings reflect
execution, not JVM startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "w1_dedup_latest",
    "j1_anti_delete",
    "j3_diff",
    "n2_relationalize",
    "agg_pricing_summary",
    "join_top_orders",
    "join_nation_revenue",
    "dedup_exact",
    "dedup_minhash",
    "dedup_jaccard",
    "dedup_embedding",
    "ann_topk",
    "ann_ivf",
    "mm_features",
    "text_stats",
    "doc_fingerprint",
    "stream_window_counts",
    "join_asof",
    "join_range",
    "win_moving_avg",
    "agg_rollup",
    "ann_ivf_indexed",
    "ann_quantized",
    "ann_ivf_quantized",
    "agg_custdist",
    "join_large_orders",
    "win_lag_lead",
    "skew_hitters",
    "join_volume_shipping",
    "join_market_share",
    "pipe_training_data",
    "join_product_profit",
    "join_waiting_suppliers",
    "decontaminate",
    "text_tfidf",
    "emb_kmeans",
    "funnel_steps",
    "join_anti_bloom",
    "text_quality_score",
    "sample_temperature",
    "ts_anomaly",
    "ts_interpolate",
    "agg_hll_rollup",
    "layout_zorder",
    "ts_anomaly_chunked",
    "link_records",
    "win_global_rownum",
    # round 5: storage-layout and training-data additions
    "join_bucketed",
    "scan_zonemap",
    "text_bm25",
    "sample_importance",
    "text_bpe_train",
    "decontam_fuzzy",
    "text_lm_bigram",
    "scan_bloommap",
    "dedup_cosine_exact",
    "graph_pagerank",
    "ts_smooth",
    "ts_holt",
    "dedup_cosine_probe",
    "v5_drift_psi",
    # round 6
    "ts_holt_winters",
    "stream_drift_psi",
    "ann_ivf_maintained",
    "ts_decompose",
    "dedup_cosine_probe_deleted",
    # round 7: the remaining lifecycle query joins the headline set so
    # its construct/query phase split is recorded alongside the others
    "dedup_cosine_probe_compacted",
    "ts_holt_winters_damped",
    "graph_components",
    "v7_drift_ks",
    "ts_forecast",
    "ts_anomaly_seasonal",
    "v8_ref_integrity",
    "agg_corr_matrix",
    "v9_drift_ks_series",
    "stream_corr_matview",
    "dedup_semantic_clusters",
    # round 8
    "v10_drift_js",
    "stream_drift_ks",
    "ts_autocorr",
    "ts_cusum",
    "agg_assoc_matrix",
    "sample_token_budget",
    "retrieval_hybrid",
    "ts_anomaly_mad",
    "agg_entropy",
    "text_novelty",
    "v11_benford",
    "retention_survival",
    "agg_gini",
    "agg_basket_lift",
    "ts_theil_sen",
    "emb_pca",
    "graph_kcore",
    # round 9
    "emb_pca_project",
    "agg_ab_welch",
    "agg_trimmed_stats",
    "text_collocations",
    "scd2_history",
    "retrieval_rank_metrics",
    "agg_ab_prop_ztest",
    "v12_drift_wasserstein",
    "emb_whiten",
    "graph_assortativity",
    "agg_weighted_quantiles",
    "text_zipf",
    "stream_upsert_matview",
    "mm_scene_cuts",
    "emb_silhouette",
    "agg_hhi",
    # round 10
    "agg_auc",
    "agg_calibration",
    "agg_reliability_bins",
    "dedup_cluster_split",
    "agg_mutual_info",
    "agg_kappa",
    "agg_avg_precision",
    "agg_spearman",
    "sample_group_topk",
    "transform_rank_normalize",
    "agg_effect_size",
    "stream_calibration_matview",
    "text_lexical_diversity",
    "agg_moments",
    "text_vocab_overlap",
    "v13_drift_chi2",
    "transform_standardize",
    "transform_winsorize",
    "stream_auc_matview",
    "graph_clustering_coeff",
    "dedup_cluster_histogram",
    "v14_functional_deps",
    "v15_iqr_outliers",
    "text_readability",
    "ts_gaps",
    "mm_audio_energy",
    "stream_heartbeat_matview",
    # round 11
    "ann_recall",
    "ann_ivf_pq",
    "ann_ivf_pq_indexed",
    "dedup_cross_spans",
    "dedup_lsh_recall",
    "emb_drift",
    "graph_modularity",
    "text_length_histogram",
    "stream_emb_drift_matview",
    "ann_pq_recall",
    "agg_contingency_residuals",
    "emb_outliers",
    "ann_ivf_pq_maintained",
    "dedup_cross_spans_rewrite",
    "v16_rare_categories",
    # round 12
    "ann_ivf_pq_refined",
    "text_unigram_train",
    "ts_changepoint",
    "text_keywords_textrank",
    "agg_cm_frequency",
    "stream_cm_matview",
    "agg_kmv_overlap",
    "stream_sample_matview",
    "graph_shortest_paths",
    "sample_contrastive_triplets",
    "dedup_containment",
    "retrieval_prf",
    "stream_kmv_overlap_matview",
    "ts_dtw",
    "transform_target_encode",
    "agg_isotonic_calibration",
    "stream_isotonic_matview",
    # round 12, session 3
    "agg_bootstrap_ci",
    "v17_fdr_bh",
    "agg_conformal",
    "text_self_bleu",
    "emb_random_projection",
    "stream_bootstrap_matview",
    "v18_drift_cvm",
    "stream_drift_cvm",
    "retrieval_mmr",
    "graph_lpa",
    "agg_ratio_ci",
    "agg_cuped",
    "agg_mannwhitney",
    "agg_tost",
    # round 13
    "sample_shard_export",
    "agg_always_valid",
    # round 14
    "v3_results_doc",
    "ann_ivf_joined",
    "stream_expectations_matview",
    "text_bpe_fertility",
    "sample_epoch_mix",
    "sample_epoch_apply",
    "sample_curriculum",
    "path_pattern_match",
    "stream_pattern_matview",
    "text_lm_kneser_ney",
    "graph_hierarchy",
    "ts_kalman",
    "ts_kalman_smooth",
    "graph_hits",
]


def _release_pinned_state(spark) -> None:
    """Unpersist every pinned RDD/relation between queries.

    Operators pin intermediates (persist(), lazy localCheckpoint) for
    the duration of THEIR query; nothing is shared across queries, but
    the pins outlive the query inside this long-lived bench JVM.  As
    the battery grew, that accumulated storage inflated LATER queries'
    walls round over round (the recurring "warm-window position"
    adjudications in SCALE.md: the r12 session-2 run measured the
    inflation at 1.13x/1.33x/1.39x across run thirds vs the same
    queries in a shorter run).  Releasing pins between queries makes
    each number the query's own steady-state cost, independent of
    battery size and position.
    """
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in jmap.values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
    except Exception:
        pass  # diagnostics must never fail the bench


def main() -> None:
    import __spark_entry__ as entrymod
    from recover_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Optional subset (comma-separated names): targeted re-measures —
    # e.g. the sf1 flag adjudications — run single queries under the
    # EXACT headline harness (warm-up, best-of-N, pinned-state release)
    # instead of a hand-rolled loop whose semantics could drift.
    headline = HEADLINE
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        headline = names
    # Warm-up: touch every input file once so OS cache / JVM are hot.
    for t in entrymod._TABLES:
        try:
            entrymod._load(spark, sf_dir, t).count()
        except Exception:
            pass
    # Warm-up 2: run every headline query once at the smallest SF so
    # one-time costs (whole-stage-codegen compilation, Python/Arrow
    # worker startup, broadcast machinery) are paid before timing —
    # the numbers below measure steady-state execution at the target
    # SF, not first-query JVM warm-up.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in headline:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass
        _release_pinned_state(spark)

    # Best-of-3 per query: local wall-clock noise on this box is +/-50%,
    # which would swamp round-over-round regressions; the minimum of
    # three runs is a stable estimator of the plan's true cost.
    #
    # Lifecycle queries run their construction work (index build/
    # append/compact/rebuild, stream feeding) EAGERLY inside the
    # query function and only then return the probe DataFrame, so the
    # fn() call vs .count() boundary IS the construct/query phase
    # boundary — recorded separately for them (VERDICT r6 #5) so a
    # probe regression cannot hide under lifecycle noise.  The
    # headline number remains the sum of both phases.
    #
    # Construct runs ONCE per lifecycle query (VERDICT r11 #8): the
    # built artifact (index, matview state) is reused across the
    # best-of-N reps, which re-execute only the PROBE plan — the
    # steady-state cost a deployed index actually has, matching the
    # maintenance_probe convention of the 10x probes.  The recorded
    # headline value is construct + best probe (one construct per
    # lifecycle query in the total, as before — just not re-built and
    # re-thrown-away N times); the spread entries are construct +
    # probe_i, so the construct component is a single sample and the
    # spread reflects probe-side noise.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    lifecycle = {
        "ann_ivf_maintained",
        "dedup_cosine_probe_deleted",
        "dedup_cosine_probe_compacted",
        "stream_drift_psi",
        "stream_drift_ks",
        "stream_upsert_matview",
        "stream_calibration_matview",
        "stream_auc_matview",
        "stream_heartbeat_matview",
        "stream_emb_drift_matview",
        "ann_ivf_pq_maintained",
        "stream_cm_matview",
        # round 13 (VERDICT r12 #6): the remaining matview queries gain
        # the construct/read split — their fn() runs the 4-batch stream
        # machinery eagerly and returns the read lens, so the fn()/
        # count() boundary IS the phase boundary.  stream_window_counts
        # is NOT here: it is the batch mode of the windowing helper
        # (no stream construct exists to split).
        "stream_kmv_overlap_matview",
        "stream_drift_cvm",
        "stream_corr_matview",
        "stream_bootstrap_matview",
        "stream_sample_matview",
        "stream_isotonic_matview",
        # round 14: GE-on-arrival — 4-batch counter fold is the
        # construct, the suite-verdict fold is the read
        "stream_expectations_matview",
        # round 14: row-pattern sequence view — 4-batch multiset fold
        # is the construct, the sort+regex lens is the read
        "stream_pattern_matview",
        # round 14 OPTIMIZATION: two more shared-lifecycle families
        # (the VERDICT r13 #1/#3 convention).  The family's first
        # headline query carries the one shared construct; siblings
        # (text_bpe_fertility; dedup_cluster_histogram/_split) are
        # reads/aggregates over the same deterministic state, so their
        # values stay honest steady-state costs.
        "text_bpe_train",          # construct = 12-merge training
        "dedup_semantic_clusters",  # construct = LSH pairs + CC + write
    }
    timings: dict[str, float] = {}
    # Per-query (min, median, max) across the reps: the noise
    # adjudication every round needs the SPREAD, not just the point —
    # a round-over-round mover whose new value sits inside the other
    # round's recorded [min, max] band is bench jitter by the data,
    # no re-measure session required (VERDICT r10 #2).
    spreads: dict[str, dict[str, float]] = {}
    phases: dict[str, dict[str, float]] = {}
    for name in headline:
        fn = qs[name]
        if name in lifecycle:
            t0 = time.time()
            df = fn(spark, sf_dir)
            construct = time.time() - t0
            probes: list[float] = []
            for _ in range(reps):
                p0 = time.time()
                n = df.count()
                probes.append(time.time() - p0)
            probes.sort()
            runs = [construct + p for p in probes]
            phases[name] = {
                "construct": round(construct, 3),
                "query": round(probes[0], 3),
            }
        else:
            best_phases, n = None, 0
            runs = []
            for _ in range(reps):
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                n = df.count()
                t2 = time.time()
                elapsed = t2 - t0
                if not runs or elapsed < min(runs):
                    best_phases = (t1 - t0, t2 - t1)
                runs.append(elapsed)
            runs.sort()
        # The recorded per-query value is the MEDIAN of the reps
        # (VERDICT r12 #5): r12's two closing runs on the SAME fixed
        # harness landed ~17% apart on sum-of-min — min is an order
        # statistic of the noise tail, median is robust to it, so
        # round-over-round totals stop needing a noise adjudication.
        # For lifecycle queries runs = construct + probe_i, so the
        # median is construct + median probe.
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = {
            "min": round(runs[0], 3),
            "med": round(runs[len(runs) // 2], 3),
            "max": round(runs[-1], 3),
        }
        if name == "stream_drift_ks":
            # the combined read is ONE join of three metadata-sized
            # folds by design; time each lens separately against the
            # state the last run left behind so a single lens's
            # regression can't hide in the fold (r9 verdict #8)
            state = entrymod.LAST_STATE_PATHS.get("stream_drift_ks")
            if state:
                from recover_spark.streaming.drift import (
                    read_drift_chi2,
                    read_drift_js,
                    read_drift_ks,
                    read_drift_wasserstein,
                )

                for lens, rfn in (
                    ("read_ks", read_drift_ks),
                    ("read_js", read_drift_js),
                    ("read_w1", read_drift_wasserstein),
                    ("read_chi2", read_drift_chi2),
                ):
                    t0 = time.time()
                    rfn(spark, state).count()
                    phases[name][lens] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s (best of {reps})",
              file=sys.stderr)
        _release_pinned_state(spark)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "headline_semantics": (
            "headline_total = sum of per-query MEDIANS of best-of-N "
            "reps (VERDICT r12 #5: sum-of-min varied ~17% between two "
            "same-harness runs; the median is noise-robust). "
            "total_min/total_max bound this run's per-query spread "
            "envelope — treat cross-round movement inside that band "
            "as jitter. Lifecycle values are construct + median probe "
            "(construct sampled once); the phases dict carries the "
            "steady-state read cost separately. Shared lifecycles "
            "(VERDICT r13 #1/#3): the drift trio (psi/ks/cvm) reads "
            "ONE arrival state and the maintained-ANN pair probes ONE "
            "maintenance run — the family's FIRST headline query "
            "(stream_drift_psi / ann_ivf_maintained) carries the "
            "whole construct in its value; the siblings are "
            "metadata-sized reads, matching the modules' own "
            "one-pipeline-many-lenses / probe-with-frozen-quantizer "
            "design claims."
        ),
        "total_min": round(sum(s["min"] for s in spreads.values()), 3),
        "total_max": round(sum(s["max"] for s in spreads.values()), 3),
        "queries": timings,
        "spread": spreads,
        "phases": phases,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full-fidelity record to a file: the per-query 3-decimal timings
    # and the lifecycle phase splits always land here regardless of
    # how the stdout line is compacted below.  Subset runs
    # (SPARK_GRAFT_BENCH_ONLY) must NOT clobber the canonical full
    # record — they are targeted re-measures, not the closing bench.
    if not only:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json"), "w"
            ) as f:
                json.dump(result, f, indent=1)
        except OSError:
            pass
    # The driver captures only the LAST 2000 characters of output and
    # json-parses the final line — round 7's line grew past that with
    # 73 queries + phase splits and the whole bench record parsed as
    # None.  Keep the stdout line under a hard budget: round to 2
    # decimals, drop the phases dict (it lives in BENCH_full.json).
    # When the per-query dict still overflows, elide by TIME FLOOR
    # (cheapest first) and say so explicitly (VERDICT r14 #4: elision
    # must never masquerade as drops): the line always carries the
    # stable total query count ("queries_total"), the number elided,
    # the floor below which values were elided, and a pointer to the
    # full record.  Budget 1900 < the 2000-char capture window (the
    # line is the final output, so up to 1999 chars parse).
    LINE_BUDGET = 1900
    line_obj = dict(result)
    line_obj.pop("phases", None)
    line_obj.pop("spread", None)
    line_obj.pop("headline_semantics", None)  # lives in BENCH_full.json
    line_obj["queries"] = {k: round(v, 2) for k, v in timings.items()}
    line_obj["queries_total"] = len(timings)
    line_obj["full_record"] = "BENCH_full.json"
    line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > LINE_BUDGET:
        by_cost = sorted(timings, key=timings.get)
        dropped = 0
        while len(line) > LINE_BUDGET and by_cost:
            name = by_cost.pop(0)
            line_obj["queries"].pop(name, None)
            dropped += 1
            line_obj["queries_elided"] = dropped
            # every elided value is <= this floor; nothing above it
            # is missing from the line
            line_obj["elide_floor_sec"] = round(timings[name], 2)
            line = json.dumps(line_obj, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
