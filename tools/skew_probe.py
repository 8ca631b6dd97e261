"""Skew probe: same 10x data volume as tools/scale_probe.py, but with a
HOT KEY owning ~20% of rows — the failure shape uniform replication
can't surface (a stuck reducer, not a slow average).

Builds a second 10x copy where ~20% of events rows are remapped to
user_id=0 and ~20% of orders rows to o_custkey=0 (deterministic modulo
on the replicated unique id, so row counts match the uniform copy
exactly), then times each probe on the uniform and skewed copies.  The
pass bar: skewed wall-clock within 2x of uniform — evidence that
map-side partial aggregation (WindowGroupLimit for W1, partial sums for
aggs) and AQE skew-join splitting absorb the hot key, rather than one
straggler task serializing the stage.

Usage: python tools/skew_probe.py [replicas]   (default 10; reuses
spark-warehouse/scale_probe_data/, builds skew_probe_data/ beside it).
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
SHIFT = 100_000_000

# probes keyed on the hotted columns: user_id (events) / o_custkey (orders)
PROBES = [
    "w1_dedup_latest",      # window dedup partitioned on (user_id, type)
    "win_session_native",   # session window keyed on user_id
    "join_large_orders",    # orders grouped by o_custkey then joined
    "stream_enrich",        # broadcast enrichment keyed on user_id
    "ts_anomaly",           # trailing-window z-score keyed on user_id
    "ts_anomaly_chunked",   # time-chunked variant: hot key parallelizes
    "ts_interpolate",       # grid + window keyed on user_id
    # round-5 session 2: the chunked affine scans partition by
    # (user_id, chunk), so a hot user's timeline is parallel across
    # chunks by construction — the skew probe verifies that claim
    "ts_smooth",            # EWMA chunked scan keyed on user_id
    "ts_holt",              # Holt 2-D chunked scan keyed on user_id
    # round 6: the seasonal scan shares the (key, chunk) shape; the
    # decomposition's MA windows are L-bounded frames on the hot key
    "ts_holt_winters",
    "ts_decompose",
    # round 7: the damped variant and the residual monitor inherit the
    # (key, chunk) shape; the forecast's tail window is L-bounded per
    # key, so the hot key costs only its row share
    "ts_holt_winters_damped",
    "ts_anomaly_seasonal",
    "ts_forecast",
    # round 9: KM survival collapses user-keyed subjects to the
    # (type, duration) grid, so the hot user is one subject row; the
    # Theil-Sen probe documents the GUARD: a hot key owning 20% of 10x
    # events exceeds max_points and the operator must raise loudly
    # (quadratic-by-definition estimator) rather than melt a reducer
    "retention_survival",
    "ts_theil_sen",
    # round 9: scd2 windows per user (the hot user's history lands in
    # one partition — the honest per-key-sequential cost); the A/B
    # tests aggregate map-side so the hot key is a partial-agg cell
    "scd2_history",
    "agg_ab_welch",
    "agg_ab_prop_ztest",
]


def build_skewed(spark, scale_dir: str, out_dir: str) -> None:
    """Derive the skewed copy from the uniform 10x copy: identical rows
    and counts, with 1 in 5 rows remapped onto the hot key."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t in ["lineitem", "documents", "embeddings"]:
        src = os.path.join(scale_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    events = spark.read.parquet(os.path.join(scale_dir, "events.parquet"))
    events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    orders = spark.read.parquet(os.path.join(scale_dir, "orders.parquet"))
    orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(0)).otherwise(
            F.col("o_custkey")
        ),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))


def time_query(entrymod, spark, name: str, sf_dir: str) -> float:
    fn = entrymod.queries()[name]
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    dt = time.time() - t0
    print(f"  {name}@{os.path.basename(sf_dir)}: rows={n} {dt:.2f}s",
          file=sys.stderr)
    return dt


def main() -> None:
    import __spark_entry__ as entrymod
    from recover_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probes = sys.argv[2:] or PROBES
    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = os.path.join("spark-warehouse", "scale_probe_data")
    skewed = os.path.join("spark-warehouse", "skew_probe_data")
    if not os.path.exists(os.path.join(scaled, "events.parquet")):
        from tools.scale_probe import build_scaled

        print(f"building {replicas}x uniform copy under {scaled}",
              file=sys.stderr)
        build_scaled(spark, scaled, replicas)
    if not os.path.exists(os.path.join(skewed, "events.parquet")):
        print(f"building skewed copy under {skewed}", file=sys.stderr)
        build_skewed(spark, scaled, skewed)

    results = {}
    for name in probes:
        time_query(entrymod, spark, name, scaled)  # warm-up
        t_uni = time_query(entrymod, spark, name, scaled)
        try:
            t_skw = time_query(entrymod, spark, name, skewed)
        except Exception as e:
            # a loud quadratic guard firing on the hot key is a PASS
            # for by-definition-quadratic operators (ts_theil_sen):
            # refusing the melt is the documented contract
            results[name] = {
                "t_uniform_sec": round(t_uni, 3),
                "guard_raised": f"{type(e).__name__}: {str(e)[:160]}",
            }
            continue
        results[name] = {
            "t_uniform_sec": round(t_uni, 3),
            "t_skewed_sec": round(t_skw, 3),
            "ratio": round(t_skw / t_uni, 2) if t_uni > 0 else None,
        }
    print(json.dumps({"replicas": replicas, "hot_share": 0.2,
                      "probes": results}))


if __name__ == "__main__":
    main()
