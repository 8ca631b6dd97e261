"""Property-based tests (hypothesis) for the core operators: the dedup /
anti-join / relationalize invariants must hold for arbitrary inputs, not
just fixtures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recover_spark.operators import dedup_latest, drop_deleted, relationalize

KEYS = st.sampled_from(["k1", "k2", "k3", "k4"])
DATES = st.sampled_from(
    ["2023-01-01", "2023-02-15", "2023-06-30", "2023-12-31"]
)
ROWS = st.lists(st.tuples(KEYS, DATES, st.integers(0, 100)), min_size=1, max_size=25)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@_settings
def test_dedup_invariants(spark, rows):
    df = spark.createDataFrame(
        [(k, d, v) for k, d, v in rows],
        "GlobalKey string, export_end_date string, v int",
    )
    out = dedup_latest(df, ["GlobalKey"], tiebreakers=["v"]).collect()
    # one row per key
    keys = [r.GlobalKey for r in out]
    assert len(keys) == len(set(keys)) == len({k for k, _, _ in rows})
    # survivor carries the max date for its key, and on date ties the
    # smallest tiebreaker value
    best = {}
    for k, d, v in rows:
        cur = best.get(k)
        if cur is None or d > cur[0] or (d == cur[0] and v < cur[1]):
            best[k] = (d, v)
    for r in out:
        assert (r.export_end_date, r.v) == best[r.GlobalKey]


@given(rows=ROWS, deleted_keys=st.lists(KEYS, max_size=4))
@_settings
def test_anti_join_invariants(spark, rows, deleted_keys):
    df = spark.createDataFrame(
        [(k, d, v) for k, d, v in rows],
        "GlobalKey string, export_end_date string, v int",
    )
    deleted = spark.createDataFrame(
        [(k,) for k in deleted_keys] or [("__none__",)], "GlobalKey string"
    )
    out = drop_deleted(df, deleted, ["GlobalKey"], dedup_deleted=False).collect()
    expect = [(k, d, v) for k, d, v in rows if k not in set(deleted_keys)]
    assert sorted((r.GlobalKey, r.export_end_date, r.v) for r in out) == sorted(expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.lists(st.integers(0, 9), max_size=4)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@_settings
def test_relationalize_roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "pk long, arr array<int>")
    frames = relationalize(df, "t", carry_cols=["pk"])
    parent, child = frames["t"], frames["t_arr"]
    assert parent.count() == len(rows)
    # child rows reconstruct every (pk, position, value) triple exactly
    got = sorted((r.pk, r["index"], r.arr) for r in child.collect())
    expect = sorted(
        (pk, i, v) for pk, arr in rows for i, v in enumerate(arr)
    )
    assert got == expect


# -- round-5 theorem-shaped properties --------------------------------------

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "ep", "ze", "a"])
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(texts=TEXTS, num_merges=st.integers(1, 6))
@_settings
def test_bpe_training_matches_reference_for_arbitrary_corpora(
    spark, texts, num_merges
):
    """The distributed trainer must equal the sequential reference
    (same tie rule) for ANY corpus, not just the fixture."""
    from recover_spark.ops.bpe import train_bpe
    from tests.test_bpe import _py_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["iteration"], r["left"], r["right"], r["merged"], r["weight"])
        for r in train_bpe(df, num_merges, checkpoint_every=3)
        .orderBy("iteration")
        .collect()
    ]
    assert got == _py_train(texts, num_merges)[0]


@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=120),
    capacity=st.integers(2, 8),
)
@_settings
def test_misra_gries_never_misses_a_frequent_key(spark, keys, capacity):
    """MG theorem under arbitrary data and partitionings: every key
    with global count > n_partition_sum/(capacity+1) in EVERY partition
    view... conservatively: any key with global share > 1/(capacity+1)
    must appear in the reported top set with its EXACT count."""
    from collections import Counter

    from recover_spark.ops.sampling import heavy_hitters_sketch

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(4)
    n = len(keys)
    counts = Counter(keys)
    guaranteed = {k for k, c in counts.items() if c > n / (capacity + 1)}
    out = heavy_hitters_sketch(
        df, ["k"], top_n=len(counts), capacity=capacity
    )
    got = {r["k"]: r["n_rows"] for r in out.collect()}
    for k in guaranteed:
        assert got.get(k) == counts[k], (k, counts[k], got)


@given(
    values=st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()),
        min_size=1,
        max_size=60,
    ),
    lo=st.integers(-500, 500),
    width=st.integers(0, 400),
)
@_settings
def test_zonemap_pruning_is_lossless_for_any_bounds(spark, values, lo, width):
    """Superset theorem: pruned scan + reapplied filter == full scan
    filter, for arbitrary values (incl. nulls) and arbitrary bounds."""
    from recover_spark.sources.zonemap import build_zonemap, read_pruned

    import tempfile

    path = tempfile.mkdtemp() + "/ds"
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, v long"
    )
    df.repartition(3).write.parquet(path)
    build_zonemap(spark, path, ["v"])
    hi = lo + width
    pruned, _ = read_pruned(spark, path, {"v": (lo, hi)})
    expect = sorted(
        (i, v) for i, v in enumerate(values) if v is not None and lo <= v <= hi
    )
    assert sorted(map(tuple, pruned.select("i", "v").collect())) == expect


WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
DOCS = st.lists(
    st.lists(WORDS, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(texts=DOCS, threshold=st.floats(0.2, 1.0), dense=st.booleans())
@_settings
def test_apss_both_strategies_equal_brute_force(spark, texts, threshold, dense):
    """EXACTNESS of the cosine-threshold join for arbitrary corpora,
    thresholds, and BOTH physical strategies — the prefix filter and
    the block-pair GEMM must each return exactly the brute-force pair
    set with identical (rounded) cosines."""
    from recover_spark.ops.apss import (
        cosine_threshold_pairs,
        cosine_threshold_pairs_bruteforce,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fast = sorted(
        map(
            tuple,
            cosine_threshold_pairs(
                docs,
                threshold,
                strategy="dense" if dense else "prefix",
                num_blocks=3,
            ).collect(),
        )
    )
    slow = sorted(
        map(
            tuple,
            cosine_threshold_pairs_bruteforce(docs, threshold).collect(),
        )
    )
    assert fast == slow


@given(
    values=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False), min_size=1, max_size=60
    ),
    alpha=st.floats(0.05, 0.95),
    chunk=st.integers(2, 9),
)
@_settings
def test_ewma_chunked_scan_matches_sequential(spark, values, alpha, chunk):
    """The chunked affine scan equals the sequential recurrence for
    arbitrary series, alphas, and chunk sizes — chunking must be
    invisible."""
    from recover_spark.operators.temporal import ewma_smooth

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(values)],
        "k string, t long, v double",
    )
    got = (
        ewma_smooth(df, ["k"], "t", "v", alpha, chunk_rows=chunk)
        .orderBy("t")
        .collect()
    )
    s = values[0]
    for i, y in enumerate(values):
        if i:
            s = alpha * y + (1 - alpha) * s
        assert abs(got[i]["ewma"] - s) <= 1e-9 * max(1.0, abs(s)), i


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
    buckets=st.integers(1, 7),
)
@_settings
def test_skyline_equals_domination_definition(spark, pts, buckets):
    from recover_spark.operators.analytics import skyline_2d

    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", buckets=buckets).collect()
    )
    uniq = set(pts)
    expect = sorted(
        p
        for p in uniq
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p for q in uniq
        )
    )
    assert got == expect


@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50),
    probes=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=10),
)
@_settings
def test_bloom_sidecar_never_false_negative(spark, tmp_path_factory, keys, probes):
    """A present key is NEVER pruned away, for arbitrary key sets and
    probe sets (absent probes may read extra files — false positives
    cost performance, never rows)."""
    from pyspark.sql import functions as F

    from recover_spark.sources.bloommap import build_bloommap, read_point_pruned

    path = str(tmp_path_factory.mktemp("bloomfuzz") / "ds")
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    df.repartition(3).write.parquet(path)
    build_bloommap(spark, path, ["k"], bits=1 << 12)
    want = sorted(k for k in keys if k in set(probes))
    got, _ = read_point_pruned(spark, path, {"k": list(set(probes))})
    assert sorted(r["k"] for r in got.collect()) == want


@given(
    old=DOCS,
    new=DOCS,
    threshold=st.floats(0.3, 1.0),
    dense=st.booleans(),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_text_index_probe_equals_brute_cross(
    spark, tmp_path_factory, old, new, threshold, dense
):
    """Both probe strategies return exactly the brute-force cross-pair
    set for arbitrary corpora, batches, and thresholds."""
    from recover_spark.ops.apss import cosine_threshold_pairs_bruteforce
    from recover_spark.ops.text_index import build_text_index, probe_text_index

    path = str(tmp_path_factory.mktemp("tidx") / "idx")
    old_rows = list(enumerate(old))
    new_rows = [(1000 + i, t) for i, t in enumerate(new)]
    build_text_index(
        spark.createDataFrame(old_rows, "doc_id long, text string"),
        path,
        num_buckets=4,
    )
    got = sorted(
        map(
            tuple,
            probe_text_index(
                spark.createDataFrame(new_rows, "doc_id long, text string"),
                path,
                threshold,
                strategy="dense" if dense else "prefix",
            ).collect(),
        )
    )
    union = spark.createDataFrame(
        old_rows + new_rows, "doc_id long, text string"
    )
    expect = set()
    for r in cosine_threshold_pairs_bruteforce(union, threshold).collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a >= 1000) != (b >= 1000):
            n, o = (a, b) if a >= 1000 else (b, a)
            expect.add((n, o, r["cosine"]))
    assert got == sorted(expect)


@given(
    l_ts=st.lists(st.integers(0, 200), min_size=1, max_size=25, unique=True),
    r_ts=st.lists(st.integers(0, 200), min_size=0, max_size=25, unique=True),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.one_of(st.none(), st.integers(1, 50)),
)
@_settings
def test_asof_directions_match_pandas(spark, l_ts, r_ts, direction, tol):
    """Every (direction, tolerance) as-of combination equals pandas
    merge_asof for arbitrary timestamp sets."""
    import pandas as pd

    from recover_spark.operators import asof_join

    left = pd.DataFrame(
        {
            "k": ["g"] * len(l_ts),
            "ts": [pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=s)
                   for s in sorted(l_ts)],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["g"] * len(r_ts),
            "ts": [pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=s)
                   for s in sorted(r_ts)],
            "m": [float(s) for s in sorted(r_ts)],
        }
    ).astype({"k": "str", "ts": "datetime64[ns]", "m": "float64"})
    expect = pd.merge_asof(
        left, right, on="ts", by="k", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k string, ts timestamp, m double"),
        on=["k"],
        right_cols=["m"],
        direction=direction,
        tolerance_seconds=tol,
    ).toPandas()
    merged = expect.merge(got, on=["k", "ts"], suffixes=("_pd", "_sp"))
    assert len(merged) == len(expect) == len(got)
    le = merged["m_pd"].fillna(-1).to_numpy()
    ri = merged["m_sp"].fillna(-1).to_numpy()
    assert (le == ri).all(), (direction, tol)


@given(
    base=st.lists(
        st.floats(-100, 100, allow_nan=False), min_size=20, max_size=200
    ),
    cur=st.lists(
        st.floats(-100, 100, allow_nan=False), min_size=20, max_size=200
    ),
    bins=st.integers(2, 12),
)
@_settings
def test_psi_matches_numpy_reference(spark, base, cur, bins):
    import numpy as np

    from recover_spark.quality.drift import psi_drift

    b = spark.createDataFrame([(v,) for v in base], "v double")
    c = spark.createDataFrame([(v,) for v in cur], "v double")
    got = psi_drift(
        b, c, ["v"], n_bins=bins, edge_accuracy=None
    ).collect()[0].psi

    arr = np.sort(np.array(base))
    edges = np.round(
        [np.quantile(arr, q / bins, method="linear")
         for q in range(1, bins)], 9
    )

    def shares(vals):
        idx = np.searchsorted(edges, np.array(vals), side="right")
        cts = np.bincount(idx, minlength=bins).astype(float)
        return np.maximum(cts / cts.sum(), 1e-4)

    pb, pc = shares(base), shares(cur)
    expect = round(float(np.sum((pc - pb) * np.log(pc / pb))), 6)
    assert abs(got - expect) < 2e-6, (got, expect)


@given(
    values=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False), min_size=1, max_size=60
    ),
    alpha=st.floats(0.05, 0.95),
    gamma=st.floats(0.05, 0.95),
    chunk=st.one_of(st.none(), st.integers(2, 9)),
)
@_settings
def test_holt_chunked_scan_matches_sequential(
    spark, values, alpha, gamma, chunk
):
    """The 2-D affine scan equals the sequential Holt recurrence for
    arbitrary series, parameters, and chunk sizes.  Tolerance scales
    with the documented eigenvalue-spread bound (stiff ratios trade
    precision for chunk length — e^20 worst case)."""
    import math

    import numpy as np

    from recover_spark.operators.temporal import holt_smooth

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(values)],
        "k string, t long, v double",
    )
    got = (
        holt_smooth(
            df, ["k"], "t", "v", alpha, gamma,
            **({"chunk_rows": chunk} if chunk else {}),
        )
        .orderBy("t")
        .collect()
    )
    m = np.array(
        [[1 - alpha, 1 - alpha], [-gamma * alpha, 1 - gamma * alpha]]
    )
    eig = np.abs(np.linalg.eigvals(m))
    mlen = chunk if chunk else min(
        128,
        int(700 / -math.log(eig.min())),
        int(20 / math.log(eig.max() / eig.min()))
        if eig.max() / eig.min() > 1 + 1e-9
        else 128,
    )
    spread = (eig.max() / eig.min()) ** max(2, mlen)
    tol = max(1e-9, 50 * 2.3e-16 * spread)

    l, b = values[0], 0.0
    for i, y in enumerate(values):
        if i:
            ln = alpha * y + (1 - alpha) * (l + b)
            b = gamma * (ln - l) + (1 - gamma) * b
            l = ln
        scale = max(1.0, abs(l), abs(b))
        assert abs(got[i]["level"] - l) <= tol * scale, (i, tol)
        assert abs(got[i]["trend"] - b) <= tol * scale, (i, tol)


@given(
    values=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False), min_size=1, max_size=40
    ),
    alpha=st.floats(0.1, 0.9),
    gamma=st.floats(0.05, 0.9),
    delta=st.floats(0.1, 0.9),
    season=st.integers(2, 6),
    # chunks below ~8 inflate the carry-frame kernel tables (W ~ 1/m)
    # into multi-MB literal plans — legal but minutes-per-plan slow;
    # the dedicated pytest covers chunk_rows=7 once
    chunk=st.one_of(st.none(), st.integers(8, 24)),
    phi=st.sampled_from([1.0, 0.95, 0.85, 0.6]),
    impl=st.sampled_from(["arrow", "hof"]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_holt_winters_scan_matches_sequential(
    spark, values, alpha, gamma, delta, season, chunk, phi, impl
):
    """The (L+2)-state seasonal scan — unit-mode running sum plus
    bounded damped frame plus in-chunk kernel convolution — equals the
    sequential Holt-Winters recurrence for arbitrary series,
    parameters, season lengths, chunk sizes, damped-trend phi (1.0 =
    classic), and BOTH row-evaluation engines (Catalyst HOF fold and
    the Arrow applyInPandas conv).  The conv path uses only positive
    bounded matrix powers, so no spread-scaled tolerance is needed
    (unlike the 2-D Holt scan)."""
    from hypothesis import assume

    from recover_spark.operators.temporal import holt_winters_smooth

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(values)],
        "k string, t long, v double",
    )
    try:
        plan = holt_winters_smooth(
            df, ["k"], "t", "v", alpha, gamma, delta, season,
            phi=phi, impl=impl,
            **({"chunk_rows": chunk} if chunk else {}),
        )
    except ValueError as ex:
        # additive HW is GENUINELY unstable for aggressive parameter
        # combinations (all three rates high -> |lambda_2| > 1, the
        # recurrence diverges), and weakly-damped combos with a tiny
        # forced chunk size legitimately trip the carry-frame-table
        # size guard; both guards define the operator's domain, and
        # out-of-domain draws are discarded, not failures
        assume("does not damp" not in str(ex))
        assume("carry-frame table" not in str(ex))
        raise
    got = plan.orderBy("t").collect()
    l, b = values[0], 0.0
    seas = [0.0] * season
    for i, y in enumerate(values):
        s_old = seas[-1]
        l_new = alpha * (y - s_old) + (1 - alpha) * (l + phi * b)
        b = gamma * (l_new - l) + (1 - gamma) * phi * b
        s_new = delta * (y - l_new) + (1 - delta) * s_old
        l = l_new
        seas = [s_new] + seas[:-1]
        scale = max(1.0, abs(l), abs(b), abs(s_new))
        assert abs(got[i]["level"] - l) <= 1e-8 * scale, (i, got[i], l)
        assert abs(got[i]["trend"] - b) <= 1e-8 * scale, (i, got[i], b)
        assert abs(got[i]["season"] - s_new) <= 1e-8 * scale, (i, got[i], s_new)


@given(
    values=st.lists(
        st.floats(-100, 100, allow_nan=False), min_size=6, max_size=60
    ),
    period=st.integers(2, 6),
)
@_settings
def test_seasonal_decompose_matches_numpy(spark, values, period):
    """Classical decomposition equals the numpy reference for arbitrary
    series and periods (odd and even MA forms, edge-NULL convention,
    zero-sum phase centering)."""
    import math as m

    import numpy as np

    from recover_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(values)],
        "k string, t long, v double",
    )
    rows = (
        seasonal_decompose(df, ["k"], "t", "v", period).orderBy("t").collect()
    )
    y = np.asarray(values)
    n, L, half = len(y), period, period // 2
    trend = np.full(n, np.nan)
    for t in range(half, n - half):
        if L % 2 == 1:
            trend[t] = y[t - half : t + half + 1].mean()
        else:
            w = np.ones(L + 1)
            w[0] = w[-1] = 0.5
            trend[t] = (y[t - half : t + half + 1] * w).sum() / L
    detr = y - trend
    pm = np.array(
        [
            np.nanmean(detr[p::L]) if np.any(~np.isnan(detr[p::L])) else np.nan
            for p in range(L)
        ]
    )
    grand = np.nanmean(pm)
    for i, r in enumerate(rows):
        if m.isnan(trend[i]):
            assert r["trend"] is None
        else:
            assert abs(r["trend"] - trend[i]) < 1e-8
        expect_s = pm[i % L] - grand
        if m.isnan(expect_s):
            assert r["seasonal"] is None
        else:
            assert abs(r["seasonal"] - expect_s) < 1e-8
