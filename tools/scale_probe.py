"""Scale probe: measure how headline operators behave at 10x the data.

Replicates the sf0.1 FACT tables (lineitem/orders/events/documents/
embeddings) 10x with key-shifted replicas — dimension tables stay fixed,
so fact:dim ratios grow the way real data growth does — then times each
probe query at 1x and 10x and reports the wall-clock ratio.  A ratio
close to the data ratio (or below it, since fixed overhead amortizes)
is evidence the plan scales linearly; a superlinear ratio flags an
operator whose cost curve would break at 100 TB.

Usage: python tools/scale_probe.py [replicas] [probe ...]
(default 10 replicas, all probes; name probes to run a subset)
Writes the scaled copy under spark-warehouse/scale_probe_data/ (reused
if present) and prints one JSON line; SCALE.md documents results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_SHIFTS = {
    # table -> columns shifted per replica (keeps keys disjoint while
    # join relationships inside a replica stay intact)
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHIFT = 100_000_000

PROBES = [
    "w1_dedup_latest",      # window dedup over events
    "agg_pricing_summary",  # full-scan aggregate over lineitem
    "join_nation_revenue",  # 5-way join, broadcast dims
    "join_large_orders",    # grouped-HAVING join
    "dedup_exact",          # hash-groupBy dedup over documents
    "dedup_minhash",        # shingle+minhash signatures
    "ann_ivf",              # IVF ANN over embeddings
    "win_session_native",   # session-window aggregation
    "join_anti_bloom",      # bitset prefilter + exact anti-join
    "win_global_rownum",    # bucketed global row numbering
    "ts_anomaly",           # trailing-window z-score
    "sample_temperature",   # broadcast-rate source mixing
    "layout_zorder",        # bit-interleave projection
    # link_records probes the customer DIM (not replicated) — excluded
    "mm_phash_dedup",       # phash band equi-join
    "join_interval_overlap",  # bucketed interval-overlap equi-join
    "path_transitions",     # lag window + partial-agg matrix
    # round-5 session-2 families (dedup_cosine_* excluded: replicated
    # docs are byte-identical across replicas, so the TRUE pair count
    # grows quadratically — a data artifact; the sf1 bench measures
    # them on rotated-text replicas instead)
    "ts_smooth",            # EWMA chunked affine scan over events
    "ts_holt",              # Holt 2-D affine scan over events
    "ts_holt_winters",      # 9-D seasonal scan (unit-split)
    "ts_decompose",         # classical MA decomposition
    "graph_pagerank",       # 6 power iterations over the trade graph
    "v5_drift_psi",         # PSI binning, two lineitem-era scans
    # round 7
    "ts_holt_winters_damped",  # damped (L+2)-state scan
    "ts_forecast",          # smooth + L-row tail x horizon frame
    "ts_anomaly_seasonal",  # smooth + lag window + keyed z-score
    "v7_drift_ks",          # bucketed ECDF sup-distance, one pass
    "v8_ref_integrity",     # two anti-join FK checks
    "graph_components",     # pointer-doubling CC (same graph at 10x
                            # multiplicity: distinct() collapses edges,
                            # measuring the scan+dedup cost growth)
    # round 8
    "ts_autocorr",          # one-window K-lag ACF over the hourly series
    "ts_cusum",             # running-min CUSUM, one keyed exchange
    "v10_drift_js",         # JS/Hellinger on the PSI binning
    "agg_assoc_matrix",     # Cramér's V, one fact shuffle of pair cells
    "sample_token_budget",  # hash-range bucketed token prefix sums
    "retrieval_hybrid",     # BM25 + cosine candidate lists, RRF fold
    "ts_anomaly_mad",       # two grouped percentiles + key joins
    "agg_entropy",          # (group, category) aggregate + fold
    "text_novelty",         # distinct shingles + 1:1 df join
    "v11_benford",          # map-side digit extract, one aggregate
    "retention_survival",   # KM over the (type, day) grid, fact pre-collapsed
    "agg_gini",             # bucket-decomposed ranks, no per-group window
    "agg_basket_lift",      # basket-keyed pair equi-join, broadcast margins
    "ts_theil_sen",         # key-partitioned pair join + percentile folds
    "emb_pca",              # one GEMM pass, d^2-row shuffle, checkpoint-pinned diamond
    "graph_kcore",          # peel rounds = node-keyed agg + two semi-joins
    # round 9
    "emb_pca_project",      # broadcast components, per-row JVM fold
    "agg_ab_welch",         # one conditional-aggregate fact shuffle
    "agg_trimmed_stats",    # bucket-decomposed ranks + one final aggregate
    "text_collocations",    # map-side bigrams, one pair shuffle, derived margins
    "scd2_history",         # one key shuffle, three windows share the sort
    # retrieval_rank_metrics probes the supplier DIM (not replicated)
    # — excluded like link_records; its joins are candidate-list-sized
    "agg_ab_prop_ztest",    # one conditional-aggregate fact shuffle
    "v12_drift_wasserstein",  # same binning as v10; bins-sized fold
    "emb_whiten",           # broadcast scaled components, JVM fold
    "graph_assortativity",  # degree agg + two equi-joins + scalar fold
    "agg_weighted_quantiles",  # bucket-decomposed cumulative weights
    "text_zipf",            # vocab aggregate + top-N + 200-row fit
    "stream_upsert_matview",  # 4-batch CDC fold into a keyed snapshot
    "mm_scene_cuts",        # media-keyed lag window, JVM bit_count(xor)
    "emb_silhouette",       # K-row broadcast, point-keyed top-2 window
    # agg_hhi probes the customer DIM (not replicated) — excluded like
    # link_records; it is one vocabulary-sized aggregate + fold
    # round 10
    "agg_auc",              # distinct-score collapse + bucket-decomposed ranks
    "agg_calibration",      # one (group, bin) aggregate + bins-sized fold
    # agg_reliability_bins is the same single aggregate as
    # agg_calibration exposed at bin grain — covered by its probe
    "agg_mutual_info",      # cell aggregate + vocab-sized margin windows
    "agg_kappa",            # cell aggregate + (group, category) margin join
    "agg_avg_precision",    # distinct-score collapse, desc bucket cumsums
    "agg_spearman",         # two midrank tables + fact rank joins + sums fold
    "sample_group_topk",    # map-side WindowGroupLimit hash top-k
    "transform_rank_normalize",  # midrank table + one fact equi-join
    "agg_effect_size",      # one conditional-aggregate fact shuffle
    "stream_calibration_matview",  # 4-batch (group, bin) sums fold
    "text_lexical_diversity",  # one (source, term) aggregate + fold
    "agg_moments",          # two fact passes: means, centered powers
    "text_vocab_overlap",   # distinct vocab + term-keyed self-join
    "v13_drift_chi2",       # PSI binning shape, bins-sized chi2 fold
    "transform_standardize",  # one stats aggregate + broadcast clamp
    "transform_winsorize",  # quantile bounds + map-side clamp
    "stream_auc_matview",   # 4-batch calibration fold + bins AUC read
    "graph_clustering_coeff",  # oriented wedges + node folds
    # dedup_cluster_histogram rides dedup_semantic_clusters (excluded
    # from this battery: byte-identical replicas grow TRUE pairs
    # quadratically); its own folds are cluster-table-sized
    "v14_functional_deps",  # k*(k-1) column-pruned distinct aggregates
    "v15_iqr_outliers",     # quartile fences broadcast + map-side flag
    "text_readability",     # per-row regex counts, map-only
    "ts_gaps",              # distinct-bucket collapse + grid anti-join
    "mm_audio_energy",      # Arrow-batched WAV decode + numpy energy
    "stream_heartbeat_matview",  # 4-batch key-sized (max, count) fold
    # round 11
    "ann_ivf_pq",           # PQ codebook Lloyd step + ADC within probed lists
    "dedup_cross_spans",    # shingle inverted index + per-doc islands;
                            # NOTE: byte-identical replicas make ~every
                            # shingle cross-doc duplicated at 10x, so
                            # redundant-occurrence work grows by
                            # duplication DENSITY on top of data size —
                            # expected and linear in occurrences
    "dedup_lsh_recall",     # exact-jaccard + LSH-candidate pair sets joined;
                            # byte-identical replicas grow TRUE pair counts
                            # quadratically (the dedup_cosine_* note) but the
                            # stop-shingle guard bounds candidate generation
    "emb_drift",            # one (label, era) centroid aggregate + tiny join
    "graph_modularity",     # edge-linear: degree agg + label joins + folds
    "text_length_histogram",  # map-only token counts + (group, bucket) agg
    "dedup_cross_spans_rewrite",  # span CTEs + per-doc indexed filter rejoin
    "agg_contingency_residuals",  # grid-lens binning, cell-grain residual fold
    "emb_outliers",         # centroid aggregate + broadcast join, map fold
    "v16_rare_categories",  # one explode pass + vocab-sized share window
    # ann_ivf_pq_indexed / ann_recall answer from the persisted index;
    # their first call at 10x would time the index+sidecar BUILD, so
    # they are probed bespoke (build first, then time the probe) with
    # results in SCALE.md — the maintenance_probe convention
    # round 12
    "stream_hll_matview",   # 4-batch per-key HLL register fold + estimate read
    "text_unigram_train",   # word-table EM: Viterbi map + piece-keyed sums
    "ts_changepoint",       # one keyed exchange: prefix sums + top-1 window
    "text_keywords_textrank",  # pair aggregate + 4 vocab-sized power steps
    "agg_cm_frequency",     # depth-exploded cell aggregate + query min-fold
    "stream_cm_matview",    # 4-batch cell-counter fold + estimate read
    # ann_ivf_pq_refined answers from the persisted index — probed
    # bespoke like ann_ivf_pq_indexed (SCALE.md)
    "agg_kmv_overlap",      # hash-distinct + two-level bottom-k windows
    "stream_sample_matview",  # 4-batch per-key bottom-k fold (k-row state)
    "graph_shortest_paths",  # per-level frontier equi-join + anti-join
    "sample_contrastive_triplets",  # jaccard pairs + (lang, bucket) ring join
    "dedup_containment",    # directed inverted-index join, contained-side floor
    "retrieval_prf",        # two-pass BM25, pinned (doc, term) aggregate
    "stream_kmv_overlap_matview",  # 4-batch bottom-k fold + sketch-table set-ops read
    "ts_dtw",               # (type, day) collapse + banded DP over O(keys) pairs
    "transform_target_encode",  # one (category, fold) cell aggregate + cell windows
    "agg_isotonic_calibration",  # distinct-score cells + per-group Arrow PAV
    "stream_isotonic_matview",  # 4-batch bin-sums fold + PAV read lens
    # round 13
    "sample_shard_export",  # hash-range bucketed global rank + shard div/mod
    "agg_always_valid",     # one conditional mergeable aggregate (welch shape)
]


def build_scaled(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in FACT_SHIFTS.items():
        base = entrymod._load(spark, SF_DIR, t)
        parts = []
        for i in range(replicas):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            parts.append(rep)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        # one folder per table; _load reads folders and files alike
        union.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_query(entrymod, spark, name: str, sf_dir: str) -> float:
    fn = entrymod.queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    n = df.count()
    dt = time.time() - t0
    print(f"  {name}@{os.path.basename(sf_dir)}: rows={n} {dt:.2f}s",
          file=sys.stderr)
    return dt


def main() -> None:
    import __spark_entry__ as entrymod
    from recover_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probes = sys.argv[2:] or PROBES
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = os.path.join("spark-warehouse", "scale_probe_data")
    if not os.path.exists(os.path.join(scaled, "lineitem.parquet")):
        print(f"building {replicas}x copy under {scaled}", file=sys.stderr)
        build_scaled(spark, scaled, replicas)

    results = {}
    for name in probes:
        # warm-up then measure at 1x, then at Nx
        time_query(entrymod, spark, name, SF_DIR)
        t1 = time_query(entrymod, spark, name, SF_DIR)
        tn = time_query(entrymod, spark, name, scaled)
        results[name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{replicas}x_sec": round(tn, 3),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps({"replicas": replicas, "probes": results}))


if __name__ == "__main__":
    main()
