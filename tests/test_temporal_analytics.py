"""Golden-output tests for temporal joins (as-of, range) and analytic
aggregates (rollup, top-k, moving stats, distinct/percentile)."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from recover_spark.operators import (
    asof_join,
    distinct_stats,
    moving_stats,
    range_join,
    rollup_aggregate,
    top_k_per_group,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), 1.0),
            (2, "u1", _ts("2024-01-01 10:05:00"), 2.0),
            (3, "u1", _ts("2024-01-01 11:30:00"), 3.0),
            (4, "u2", _ts("2024-01-01 09:00:00"), 4.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )


def _markers(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 100.0),
            ("u1", _ts("2024-01-01 10:04:00"), 200.0),
            ("u2", _ts("2024-01-01 12:00:00"), 300.0),
        ],
        "user_id string, ts timestamp, marker double",
    )


class TestAsofJoin:
    def test_backward_inclusive_match(self, spark):
        out = asof_join(
            _events(spark), _markers(spark), on=["user_id"],
            right_cols=["marker"],
        )
        got = {r["event_id"]: r["marker"] for r in out.collect()}
        # event 1 ties the 10:00 marker exactly -> inclusive match;
        # event 2 takes the later 10:04 marker; event 3 still 10:04;
        # event 4 precedes every u2 marker -> null (left outer).
        assert got == {1: 100.0, 2: 200.0, 3: 200.0, 4: None}

    def test_tolerance_nulls_stale_matches(self, spark):
        out = asof_join(
            _events(spark), _markers(spark), on=["user_id"],
            right_cols=["marker"], tolerance_seconds=600,
        )
        got = {r["event_id"]: r["marker"] for r in out.collect()}
        # event 3 is 86 min after the 10:04 marker -> stale -> null
        assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}

    def test_left_columns_and_count_preserved(self, spark):
        left = _events(spark)
        out = asof_join(left, _markers(spark), on=["user_id"], right_cols=["marker"])
        assert out.count() == left.count()
        assert set(out.columns) == {"event_id", "user_id", "ts", "value", "marker"}


class TestAsofDirections:
    def test_forward_inclusive_match(self, spark):
        out = asof_join(
            _events(spark), _markers(spark), on=["user_id"],
            right_cols=["marker"], direction="forward",
        )
        got = {r["event_id"]: r["marker"] for r in out.collect()}
        # event 1 ties 10:00 exactly (inclusive); event 2 takes the
        # NEXT marker... none after 10:05 for u1 -> null; event 4 takes
        # u2's 12:00 marker.
        assert got == {1: 100.0, 2: None, 3: None, 4: 300.0}

    def test_nearest_prefers_closer_and_ties_backward(self, spark):
        out = asof_join(
            _events(spark), _markers(spark), on=["user_id"],
            right_cols=["marker"], direction="nearest",
        )
        got = {r["event_id"]: r["marker"] for r in out.collect()}
        # event 2 (10:05): backward 10:04 (60s) vs no forward -> 200;
        # event 4 (09:00): only forward (12:00) -> 300
        assert got == {1: 100.0, 2: 200.0, 3: 200.0, 4: 300.0}

    def test_nearest_with_tolerance(self, spark):
        out = asof_join(
            _events(spark), _markers(spark), on=["user_id"],
            right_cols=["marker"], direction="nearest",
            tolerance_seconds=120,
        )
        got = {r["event_id"]: r["marker"] for r in out.collect()}
        # event 3 (11:30) is 86 min from 10:04 -> stale; event 4 is
        # 3 h from 12:00 -> stale
        assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}

    def test_all_directions_match_pandas_merge_asof(self, spark):
        """Property twin: pandas.merge_asof is the reference
        implementation for every (direction, tolerance) combination."""
        import pandas as pd

        rng_l = [(k, i) for k in ("a", "b") for i in range(0, 100, 7)]
        rng_r = [(k, i) for k in ("a", "b") for i in range(3, 100, 11)]
        left = pd.DataFrame(
            {
                "k": [k for k, _ in rng_l],
                "ts": [pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=i)
                       for _, i in rng_l],
                "lv": [float(i) for _, i in rng_l],
            }
        ).sort_values("ts").reset_index(drop=True)
        right = pd.DataFrame(
            {
                "k": [k for k, _ in rng_r],
                "ts": [pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=i)
                       for _, i in rng_r],
                "m": [float(1000 + i) for _, i in rng_r],
            }
        ).sort_values("ts").reset_index(drop=True)
        sl = spark.createDataFrame(left)
        sr = spark.createDataFrame(right)
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 8):
                expect = pd.merge_asof(
                    left, right, on="ts", by="k", direction=direction,
                    tolerance=None if tol is None else pd.Timedelta(seconds=tol),
                )
                got = asof_join(
                    sl, sr, on=["k"], right_cols=["m"],
                    direction=direction, tolerance_seconds=tol,
                ).toPandas()
                merged = expect.merge(
                    got, on=["k", "ts", "lv"], suffixes=("_pd", "_spark")
                )
                assert len(merged) == len(expect) == len(got)
                pd.testing.assert_series_equal(
                    merged["m_pd"], merged["m_spark"],
                    check_names=False,
                ), (direction, tol)

    def test_unknown_direction_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError, match="direction"):
            asof_join(
                _events(spark), _markers(spark), on=["user_id"],
                direction="sideways",
            )


class TestRangeJoin:
    def test_containment_and_boundaries(self, spark):
        points = _events(spark)
        intervals = spark.createDataFrame(
            [
                # [10:00, 10:05): catches event 1, NOT event 2 (end excl.)
                ("u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:05:00"), "a"),
                # [10:05, 12:00): catches events 2 and 3 (start incl.)
                ("u1", _ts("2024-01-01 10:05:00"), _ts("2024-01-01 12:00:00"), "b"),
                # u2 interval not covering 09:00
                ("u2", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "c"),
            ],
            "user_id string, start timestamp, end timestamp, tag string",
        )
        out = range_join(points, intervals, on=["user_id"], bucket_seconds=3600)
        got = sorted((r["event_id"], r["tag"]) for r in out.collect())
        assert got == [(1, "a"), (2, "b"), (3, "b")]

    def test_interval_spanning_many_buckets_no_duplicates(self, spark):
        points = _events(spark)
        intervals = spark.createDataFrame(
            [("u1", _ts("2024-01-01 09:00:00"), _ts("2024-01-01 12:00:00"), "wide")],
            "user_id string, start timestamp, end timestamp, tag string",
        )
        # tiny buckets: the interval spans ~36 buckets; each point still
        # matches exactly once (point lives in one bucket)
        out = range_join(points, intervals, on=["user_id"], bucket_seconds=300)
        got = sorted(r["event_id"] for r in out.collect())
        assert got == [1, 2, 3]


class TestAnalytics:
    def test_rollup_levels(self, spark):
        df = spark.createDataFrame(
            [("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0)],
            "g1 string, g2 string, v double",
        )
        out = rollup_aggregate(df, ["g1", "g2"], {"s": F.sum("v")})
        rows = {
            (r["g1"], r["g2"], r["grouping_id"]): r["s"] for r in out.collect()
        }
        assert rows[("A", "x", 0)] == 1.0
        assert rows[("A", None, 1)] == 3.0  # subtotal over g2
        assert rows[(None, None, 3)] == 6.0  # grand total
        assert len(rows) == 6  # 3 leaves + 2 subtotals + 1 total

    def test_top_k_per_group(self, spark):
        df = spark.createDataFrame(
            [("g", i, float(i % 5)) for i in range(10)],
            "g string, id int, v double",
        )
        out = top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=3
        )
        got = [(r["id"], r["rank"]) for r in out.orderBy("rank").collect()]
        assert got == [(4, 1), (9, 2), (3, 3)]

    def test_moving_stats(self, spark):
        df = spark.createDataFrame(
            [("g", i, float(i)) for i in range(1, 5)],
            "g string, i int, v double",
        )
        out = moving_stats(df, ["g"], ["i"], "v", frame_rows=3)
        rows = {r["i"]: (r["prev_value"], r["moving_avg"]) for r in out.collect()}
        assert rows[1] == (None, 1.0)
        assert rows[2] == (1.0, 1.5)
        assert rows[4] == (3.0, 3.0)  # avg(2,3,4)

    def test_distinct_stats_exact_median(self, spark):
        df = spark.createDataFrame(
            [("g", "u1", 1.0), ("g", "u1", 2.0), ("g", "u2", 10.0), ("g", "u3", 4.0)],
            "g string, u string, v double",
        )
        out = distinct_stats(df, ["g"], distinct_col="u", value_col="v")
        r = out.collect()[0]
        assert r["n_u"] == 3
        assert r["n_rows"] == 4
        assert r["p50_v"] == 3.0  # interpolated between 2 and 4


class TestTemporalEdgeCases:
    def test_asof_empty_right_side(self, spark):
        right = spark.createDataFrame(
            [], "user_id string, ts timestamp, marker double"
        )
        out = asof_join(
            _events(spark).withColumnRenamed("user_id", "user_id"),
            right.withColumnRenamed("user_id", "user_id"),
            on=["user_id"], right_cols=["marker"],
        )
        rows = out.collect()
        assert len(rows) == 4 and all(r["marker"] is None for r in rows)

    def test_range_join_empty_intervals(self, spark):
        ivals = spark.createDataFrame(
            [], "user_id string, start timestamp, end timestamp"
        )
        out = range_join(_events(spark), ivals, on=["user_id"])
        assert out.count() == 0


class TestSampling:
    def test_stable_split_fractions_and_determinism(self, spark):
        from recover_spark.ops import stable_split

        df = spark.range(0, 10_000).withColumnRenamed("id", "k")
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = {r["k"]: r["split"] for r in stable_split(df, "k", w).collect()}
        b = {r["k"]: r["split"] for r in stable_split(df, "k", w).collect()}
        assert a == b  # deterministic under re-execution
        from collections import Counter
        frac = Counter(a.values())
        assert abs(frac["train"] / 10_000 - 0.8) < 0.02
        assert abs(frac["val"] / 10_000 - 0.1) < 0.02
        assert abs(frac["test"] / 10_000 - 0.1) < 0.02

    def test_stable_split_duplicate_keys_agree(self, spark):
        from recover_spark.ops import stable_split

        df = spark.createDataFrame([(7,), (7,), (7,)], "k long")
        splits = {
            r["split"]
            for r in stable_split(df, "k", {"a": 0.5, "b": 0.5}).collect()
        }
        assert len(splits) == 1

    def test_stable_sample_subset_of_larger_fraction(self, spark):
        from recover_spark.ops import stable_sample

        df = spark.range(0, 2_000).withColumnRenamed("id", "k")
        small = {r["k"] for r in stable_sample(df, "k", 0.1).collect()}
        big = {r["k"] for r in stable_sample(df, "k", 0.3).collect()}
        assert small <= big  # nested samples: growing fraction only adds
        assert 100 < len(small) < 300

    def test_split_weights_validation(self, spark):
        from recover_spark.ops.sampling import split_assignment

        import pytest as _pytest
        with _pytest.raises(ValueError):
            split_assignment("k", {})
        with _pytest.raises(ValueError):
            split_assignment("k", {"a": 0.8, "b": 0.4})

    def test_histogram_bins(self, spark):
        from recover_spark.ops import histogram

        df = spark.createDataFrame(
            [(1.0,), (9.9,), (10.0,), (25.0,)], "v double"
        )
        rows = {r["bin"]: r["n"] for r in histogram(df, "v", 10.0).collect()}
        assert rows == {0: 2, 1: 1, 2: 1}


def test_resample_forward_fill_grid_and_fill(spark):
    from recover_spark.operators import resample_forward_fill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 10.0),
            (1, "2024-01-01 00:50:00", 20.0),  # same bucket, later ts wins
            (1, "2024-01-01 03:05:00", 40.0),  # 2 empty buckets between
            (2, "2024-01-01 05:00:00", 99.0),  # single-point key
        ],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {
        (r["user_id"], r["bucket_start"]): (r["value"], r["filled"])
        for r in resample_forward_fill(df, "user_id").collect()
    }
    h = 3600
    base = 1704067200  # 2024-01-01 00:00:00 UTC epoch seconds
    assert got[(1, base)] == (20.0, False)       # latest-in-bucket
    assert got[(1, base + h)] == (20.0, True)    # forward-filled
    assert got[(1, base + 2 * h)] == (20.0, True)
    assert got[(1, base + 3 * h)] == (40.0, False)
    assert got[(2, base + 5 * h)] == (99.0, False)
    assert len(got) == 5  # dense grid per key, nothing beyond bounds


def test_merge_upsert_semantics(spark):
    from recover_spark.operators import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [
            (2, "b2", None, False),   # update (intentionally nulls v)
            (3, "c", 30.0, True),     # delete
            (4, "d", 40.0, False),    # insert
        ],
        "k long, name string, v double, is_deleted boolean",
    )
    got = {
        r["k"]: (r["name"], r["v"], r["__merge_op"])
        for r in merge_upsert(target, updates, ["k"], "is_deleted").collect()
    }
    assert got == {
        1: ("a", 10.0, "keep"),
        2: ("b2", None, "update"),   # update wins even with null value
        4: ("d", 40.0, "insert"),
    }


def test_merge_upsert_missing_value_col_raises(spark):
    import pytest

    from recover_spark.operators import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, name string")
    updates = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="missing value columns"):
        merge_upsert(target, updates, ["k"])


def test_scd2_close_keep_insert_and_null_safety(spark):
    from recover_spark.operators import scd2_apply

    history = spark.createDataFrame(
        [
            # already-closed version must pass through untouched
            (1, "v0", "2023-01-01", "2024-01-01"),
            (1, "v1", "2024-01-01", None),   # open, will change
            (2, "same", "2024-01-01", None), # open, unchanged
            (3, None, "2024-01-01", None),   # open, null attr unchanged
        ],
        "k long, attr string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "v2"), (2, "same"), (3, None), (9, "new")],
        "k long, attr string",
    )
    out = scd2_apply(
        history, updates, keys=["k"], compare_cols=["attr"],
        effective="2024-06-01",
    )
    rows = {(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "v0", "2023-01-01", "2024-01-01"),  # closed history untouched
        (1, "v1", "2024-01-01", "2024-06-01"),  # closed at effective
        (1, "v2", "2024-06-01", None),          # new open version
        (2, "same", "2024-01-01", None),        # unchanged stays open
        (3, None, "2024-01-01", None),          # null == null: no churn
        (9, "new", "2024-06-01", None),         # brand-new key inserts open
    }


class TestEwmaSmooth:
    def _check(self, spark, n_rows, alpha, keys=("a", "b"), **kw):
        import pandas as pd

        from recover_spark.operators.temporal import ewma_smooth

        pdf = pd.DataFrame(
            {
                "k": [k for k in keys for _ in range(n_rows)],
                "t": [i for _ in keys for i in range(n_rows)],
                "v": [
                    float((i * 37 + j * 11) % 100) - 50.0
                    for j, _ in enumerate(keys)
                    for i in range(n_rows)
                ],
            }
        )
        sdf = spark.createDataFrame(pdf)
        got = (
            ewma_smooth(sdf, ["k"], "t", "v", alpha, **kw)
            .orderBy("k", "t")
            .toPandas()
        )
        expect = (
            pdf.sort_values(["k", "t"])
            .groupby("k")["v"]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        )
        import numpy as np

        assert np.allclose(got["ewma"].to_numpy(), expect.to_numpy(),
                           rtol=1e-9, atol=1e-12)
        assert np.isfinite(got["ewma"]).all()

    def test_matches_pandas_short_series(self, spark):
        self._check(spark, 50, 0.3)

    def test_matches_pandas_past_naive_overflow_bound(self, spark):
        """alpha=0.5 overflows a whole-series z-transform at ~1022
        rows; the chunked scan must stay finite and exact at 20x
        that length."""
        self._check(spark, 20_000, 0.5, keys=("a",))

    def test_heavy_smoothing_small_alpha_long_memory(self, spark):
        self._check(spark, 3_000, 0.02, keys=("a",))

    def test_sharp_smoothing_large_alpha(self, spark):
        self._check(spark, 500, 0.97)

    def test_tiny_chunks_still_exact(self, spark):
        self._check(spark, 300, 0.4, chunk_rows=7)

    def test_invalid_alpha_rejected(self, spark):
        import pytest

        from recover_spark.operators.temporal import ewma_smooth

        df = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
        for bad in (0.0, 1.0, -0.5, 2.0):
            with pytest.raises(ValueError, match="alpha"):
                ewma_smooth(df, ["k"], "t", "v", bad)


class TestHoltSmooth:
    @staticmethod
    def _reference(values, alpha, gamma):
        l, b = values[0], 0.0
        out = [(l, b)]
        for y in values[1:]:
            l_new = alpha * y + (1 - alpha) * (l + b)
            b = gamma * (l_new - l) + (1 - gamma) * b
            l = l_new
            out.append((l, b))
        return out

    def _check(self, spark, values, alpha, gamma, tol=1e-8, **kw):
        from recover_spark.operators.temporal import holt_smooth

        df = spark.createDataFrame(
            [("k", i, float(v)) for i, v in enumerate(values)],
            "k string, t long, v double",
        )
        got = (
            holt_smooth(df, ["k"], "t", "v", alpha, gamma, **kw)
            .orderBy("t")
            .collect()
        )
        expect = self._reference([float(v) for v in values], alpha, gamma)
        for i, (el, eb) in enumerate(expect):
            scale = max(1.0, abs(el), abs(eb))
            assert abs(got[i]["level"] - el) <= tol * scale, (i, got[i], el)
            assert abs(got[i]["trend"] - eb) <= tol * scale, (i, got[i], eb)

    def test_matches_sequential_reference(self, spark):
        vals = [((i * 37) % 100) - 50 + 0.5 * i for i in range(200)]
        self._check(spark, vals, 0.3, 0.2)

    def test_long_series_stays_finite_and_exact(self, spark):
        vals = [((i * 13) % 40) + 0.1 * i for i in range(8000)]
        self._check(spark, vals, 0.5, 0.3)

    def test_trend_tracks_a_pure_ramp(self, spark):
        from recover_spark.operators.temporal import holt_smooth

        df = spark.createDataFrame(
            [("k", i, float(2 * i)) for i in range(300)],
            "k string, t long, v double",
        )
        last = (
            holt_smooth(df, ["k"], "t", "v", 0.4, 0.3)
            .orderBy("t")
            .collect()[-1]
        )
        # on a pure slope-2 ramp the trend converges to 2
        assert abs(last["trend"] - 2.0) < 0.05
        assert abs(last["level"] - 2.0 * 299) < 1.0

    def test_param_grid_and_tiny_chunks(self, spark):
        vals = [((i * 29) % 60) - 30 for i in range(150)]
        self._check(spark, vals, 0.1, 0.9)
        self._check(spark, vals, 0.7, 0.7)
        # stiff eigenvalue ratio (lam_max/lam_min ~ 8): in-chunk
        # cancellation bounds precision at ~eps * e^20 (see operator
        # docstring) — the documented trade, not a regression
        self._check(spark, vals, 0.9, 0.1, tol=1e-6)
        self._check(spark, vals, 0.4, 0.2, chunk_rows=7)

    def test_invalid_params_rejected(self, spark):
        import pytest

        from recover_spark.operators.temporal import holt_smooth

        df = spark.createDataFrame(
            [("k", 1, 1.0)], "k string, t long, v double"
        )
        for a, g in ((0.0, 0.5), (1.0, 0.5), (0.5, 0.0), (0.5, 1.0)):
            with pytest.raises(ValueError):
                holt_smooth(df, ["k"], "t", "v", a, g)


class TestHoltWintersSmooth:
    @staticmethod
    def _reference(values, alpha, gamma, delta, L):
        l, b = values[0], 0.0
        seas = [0.0] * L  # seas[-1] = s_{t-L}
        out = []
        for y in values:
            s_old = seas[-1]
            l_new = alpha * (y - s_old) + (1 - alpha) * (l + b)
            b = gamma * (l_new - l) + (1 - gamma) * b
            s_new = delta * (y - l_new) + (1 - delta) * s_old
            l = l_new
            seas = [s_new] + seas[:-1]
            out.append((l, b, s_new))
        return out

    def _check(self, spark, values, alpha, gamma, delta, L, tol=1e-8, **kw):
        from recover_spark.operators.temporal import holt_winters_smooth

        df = spark.createDataFrame(
            [("k", i, float(v)) for i, v in enumerate(values)],
            "k string, t long, v double",
        )
        got = (
            holt_winters_smooth(
                df, ["k"], "t", "v", alpha, gamma, delta, L, **kw
            )
            .orderBy("t")
            .collect()
        )
        expect = self._reference(
            [float(v) for v in values], alpha, gamma, delta, L
        )
        for i, (el, eb, es) in enumerate(expect):
            scale = max(1.0, abs(el), abs(eb), abs(es))
            assert abs(got[i]["level"] - el) <= tol * scale, (i, got[i], el)
            assert abs(got[i]["trend"] - eb) <= tol * scale, (i, got[i], eb)
            assert abs(got[i]["season"] - es) <= tol * scale, (i, got[i], es)

    def test_matches_sequential_reference(self, spark):
        vals = [
            10 + 3 * math.sin(i * 2 * math.pi / 6) + ((i * 17) % 7) - 3
            for i in range(200)
        ]
        self._check(spark, vals, 0.3, 0.1, 0.25, 6)

    def test_long_series_unit_mode_running_sum_exact(self, spark):
        """The gauge mode carries an UNBOUNDED running sum: 5000 rows,
        80+ chunks — far past any bounded frame — must stay exact."""
        vals = [
            50 + 10 * math.sin(i * 2 * math.pi / 12) + 0.01 * i
            for i in range(5000)
        ]
        self._check(spark, vals, 0.4, 0.2, 0.3, 12)

    def test_tiny_chunks_and_partial_tail(self, spark):
        vals = [((i * 29) % 60) - 30 + 5 * (i % 4 == 0) for i in range(101)]
        self._check(spark, vals, 0.3, 0.1, 0.2, 4, chunk_rows=7)

    def test_seasonal_signal_is_learned(self, spark):
        """On a pure period-L signal the season component converges to
        the demeaned cycle (up to the level/season gauge): check the
        RESIDUAL y - level - season goes to ~0 in the tail, which is
        gauge-invariant."""
        from recover_spark.operators.temporal import holt_winters_smooth

        L = 5
        cycle = [3.0, -1.0, 4.0, -2.0, -4.0]
        vals = [20.0 + cycle[i % L] for i in range(400)]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, t long, v double",
        )
        rows = (
            holt_winters_smooth(df, ["k"], "t", "v", 0.3, 0.05, 0.4, L)
            .orderBy("t")
            .collect()
        )
        tail = rows[-L:]
        for r in tail:
            # one-step-ahead fit: y_t ~ level_t + (season of the same
            # phase); at convergence level + season reproduces y
            assert abs((r["level"] + r["season"]) - vals[r["t"]]) < 0.05

    def test_multi_key_and_order_ties(self, spark):
        from recover_spark.operators.temporal import holt_winters_smooth

        rows = [
            ("a", i, 0, float((i * 13) % 9)) for i in range(60)
        ] + [("b", i, 1, float((i * 7) % 5)) for i in range(23)]
        df = spark.createDataFrame(rows, "k string, t long, e int, v double")
        out = holt_winters_smooth(
            df, ["k"], ["t", "e"], "v", 0.3, 0.1, 0.2, 4
        ).collect()
        got_a = sorted(
            (r.t, r.level) for r in out if r.k == "a"
        )
        ref = self._reference(
            [float((i * 13) % 9) for i in range(60)], 0.3, 0.1, 0.2, 4
        )
        for (t, lv), (el, _, _) in zip(got_a, ref):
            assert abs(lv - el) < 1e-8

    def test_invalid_params_rejected(self, spark):
        import pytest

        from recover_spark.operators.temporal import holt_winters_smooth

        df = spark.createDataFrame(
            [("a", 1, 1.0)], "k string, t long, v double"
        )
        for bad in (0.0, 1.0, -0.5):
            with pytest.raises(ValueError, match="alpha"):
                holt_winters_smooth(df, ["k"], "t", "v", bad, 0.1, 0.1, 4)
        with pytest.raises(ValueError, match="season_length"):
            holt_winters_smooth(df, ["k"], "t", "v", 0.3, 0.1, 0.1, 1)


class TestSeasonalDecompose:
    @staticmethod
    def _reference(values, L):
        """Independent numpy reference: statsmodels-style classical
        additive decomposition."""
        import numpy as np

        y = np.asarray(values, dtype=float)
        n = len(y)
        trend = np.full(n, np.nan)
        half = L // 2
        if L % 2 == 1:
            for t in range(half, n - half):
                trend[t] = y[t - half : t + half + 1].mean()
        else:
            for t in range(half, n - half):
                w = np.ones(L + 1)
                w[0] = w[-1] = 0.5
                trend[t] = (y[t - half : t + half + 1] * w).sum() / L
        detr = y - trend
        pm = np.array([
            np.nanmean(detr[p::L]) if np.any(~np.isnan(detr[p::L])) else np.nan
            for p in range(L)
        ])
        pm = pm - np.nanmean(pm)
        seasonal = np.array([pm[t % L] for t in range(n)])
        resid = y - trend - seasonal
        return trend, seasonal, resid

    def _check(self, spark, values, L):
        import math as m

        from recover_spark.operators.temporal import seasonal_decompose

        df = spark.createDataFrame(
            [("k", i, float(v)) for i, v in enumerate(values)],
            "k string, t long, v double",
        )
        rows = seasonal_decompose(df, ["k"], "t", "v", L).orderBy("t").collect()
        tr, se, re_ = self._reference(values, L)
        for i, r in enumerate(rows):
            if m.isnan(tr[i]):
                assert r["trend"] is None and r["resid"] is None, (i, r)
            else:
                assert abs(r["trend"] - tr[i]) < 1e-9, (i, r["trend"], tr[i])
                assert abs(r["resid"] - re_[i]) < 1e-9
            assert abs(r["seasonal"] - se[i]) < 1e-9

    def test_matches_numpy_even_period(self, spark):
        import math as m

        vals = [
            20 + 5 * m.sin(i * 2 * m.pi / 12) + 0.05 * i + ((i * 7) % 5) * 0.3
            for i in range(120)
        ]
        self._check(spark, vals, 12)

    def test_matches_numpy_odd_period(self, spark):
        vals = [((i * 13) % 23) + [3, -1, 4, -2, -4][i % 5] for i in range(75)]
        self._check(spark, vals, 5)

    def test_pure_cycle_decomposes_cleanly(self, spark):
        """A noiseless trend+cycle series: residuals ~0 in the interior
        and the seasonal component recovers the demeaned cycle."""
        from recover_spark.operators.temporal import seasonal_decompose

        cycle = [6.0, -2.0, 1.0, -5.0]
        vals = [10 + 0.5 * i + cycle[i % 4] for i in range(80)]
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, t long, v double",
        )
        rows = seasonal_decompose(df, ["k"], "t", "v", 4).orderBy("t").collect()
        mean_c = sum(cycle) / 4
        for r in rows:
            assert abs(r["seasonal"] - (cycle[r.t % 4] - mean_c)) < 1e-6
            if r["resid"] is not None:
                assert abs(r["resid"]) < 1e-6
        # seasonal effects sum to zero per key
        assert abs(sum(r["seasonal"] for r in rows[:4])) < 1e-9

    def test_multi_key_and_invalid_period(self, spark):
        import pytest

        from recover_spark.operators.temporal import seasonal_decompose

        rows = [("a", i, float(i % 3)) for i in range(30)] + [
            ("b", i, float(i % 7)) for i in range(15)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        out = seasonal_decompose(df, ["k"], "t", "v", 3).collect()
        assert len(out) == 45
        with pytest.raises(ValueError, match="season_length"):
            seasonal_decompose(df, ["k"], "t", "v", 1)


class TestHoltWintersForecast:
    @staticmethod
    def _seq_forecast(values, alpha, gamma, delta, L, horizon, phi):
        l, b = values[0], 0.0
        seas = [0.0] * L  # oldest first
        for y in values:
            s_old = seas[0]
            l_new = alpha * (y - s_old) + (1 - alpha) * (l + phi * b)
            b = gamma * (l_new - l) + (1 - gamma) * phi * b
            s_new = delta * (y - l_new) + (1 - delta) * s_old
            seas = seas[1:] + [s_new]
            l = l_new
        out = {}
        ps = 0.0
        pp = 1.0
        for h in range(1, horizon + 1):
            pp *= phi
            ps += pp
            out[h] = l + ps * b + seas[(h - 1) % L]
        return out

    def test_matches_sequential_reference(self, spark):
        import random

        from recover_spark.operators.temporal import holt_winters_forecast

        rng = random.Random(3)
        rows = []
        series = {}
        for k in ("a", "b"):
            vals = [rng.uniform(0, 100) for _ in range(23)]
            series[k] = vals
            rows += [(k, i, v) for i, v in enumerate(vals)]
        # short series: fewer rows than the season length
        series["c"] = [5.0, 7.0, 6.0]
        rows += [("c", i, v) for i, v in enumerate(series["c"])]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        for phi in (1.0, 0.8):
            got = {
                (r["k"], r["h"]): r["forecast"]
                for r in holt_winters_forecast(
                    df, ["k"], "t", "v", 0.3, 0.1, 0.25, 5,
                    horizon=12, phi=phi,
                ).collect()
            }
            for k, vals in series.items():
                want = self._seq_forecast(vals, 0.3, 0.1, 0.25, 5, 12, phi)
                for h in range(1, 13):
                    assert abs(got[(k, h)] - want[h]) < 1e-8, (phi, k, h)

    def test_horizon_guard(self, spark):
        import pytest as _pytest

        from recover_spark.operators.temporal import holt_winters_forecast

        df = spark.createDataFrame([("a", 0, 1.0)], "k string, t long, v double")
        with _pytest.raises(ValueError, match="horizon"):
            holt_winters_forecast(
                df, ["k"], "t", "v", 0.3, 0.1, 0.25, 5, horizon=0
            )


class TestHoltWintersAnomalies:
    def test_planted_anomaly_scores_highest_and_matches_reference(self, spark):
        import math
        import random

        from recover_spark.operators.temporal import holt_winters_anomalies

        rng = random.Random(9)
        L = 6
        # clean seasonal signal + noise, with one planted spike
        vals = [
            50 + 20 * math.sin(2 * math.pi * (i % L) / L) + rng.uniform(-1, 1)
            for i in range(60)
        ]
        vals[41] += 80.0  # the anomaly
        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, t long, v double",
        )
        rows = holt_winters_anomalies(
            df, ["k"], "t", "v", 0.4, 0.1, 0.3, L, z_threshold=3.0
        ).orderBy("t").collect()

        # sequential reference for the residuals
        alpha, gamma, delta, phi = 0.4, 0.1, 0.3, 1.0
        l, b = vals[0], 0.0
        seas = [0.0] * L
        resids = [None]
        states = []
        for y in vals:
            s_old = seas[0]
            l_new = alpha * (y - s_old) + (1 - alpha) * (l + phi * b)
            b_new = gamma * (l_new - l) + (1 - gamma) * phi * b
            s_new = delta * (y - l_new) + (1 - delta) * s_old
            states.append((l, b, s_old))  # pre-update state + s_{t-L}
            seas = seas[1:] + [s_new]
            l, b = l_new, b_new
        for t in range(1, len(vals)):
            lp, bp, _ = states[t]
            s_tl = states[t][2]
            resids.append(vals[t] - (lp + phi * bp + s_tl))

        assert rows[0]["resid"] is None and rows[0]["is_anomaly"] is None
        for t in range(1, len(vals)):
            assert abs(rows[t]["resid"] - resids[t]) < 1e-8, t
        flagged = {r["t"] for r in rows if r["is_anomaly"]}
        assert 41 in flagged
        assert len(flagged) <= 3  # the spike, not the whole rush hour

    def test_degenerate_series_yield_null_not_flags(self, spark):
        from recover_spark.operators.temporal import holt_winters_anomalies

        df = spark.createDataFrame(
            [("solo", 0, 5.0)] + [("flat", i, 10.0) for i in range(8)],
            "k string, t long, v double",
        )
        rows = holt_winters_anomalies(
            df, ["k"], "t", "v", 0.3, 0.1, 0.2, 4
        ).collect()
        solo = [r for r in rows if r["k"] == "solo"][0]
        assert solo["resid"] is None and solo["is_anomaly"] is None
        flat = [r for r in rows if r["k"] == "flat"]
        # zero-variance residuals: z NULL everywhere, never flagged
        assert all(r["z"] is None for r in flat)
        assert not any(r["is_anomaly"] for r in flat)


class TestCorrelationMatrix:
    def test_matches_numpy_and_handles_nulls(self, spark):
        import numpy as np

        from recover_spark.operators.analytics import correlation_matrix

        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, 200)
        y = 2 * x + rng.normal(0, 0.5, 200)   # strongly correlated
        z = rng.normal(0, 1, 200)             # independent
        rows = [
            (float(x[i]), float(y[i]), float(z[i]) if i % 7 else None)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        got = {
            (r["col_a"], r["col_b"]): (r["corr"], r["n"])
            for r in correlation_matrix(df, ["x", "y", "z"]).collect()
        }
        assert len(got) == 6
        assert got[("x", "x")][0] == 1.0
        want_xy = float(np.corrcoef(x, y)[0, 1])
        assert abs(got[("x", "y")][0] - want_xy) < 1e-5
        assert abs(got[("x", "z")][0]) < 0.3
        # null rows excluded pairwise, not listwise
        assert got[("x", "y")][1] == 200
        assert got[("x", "z")][1] == 200 - len([i for i in range(200) if i % 7 == 0])
        # numpy reference for the null-filtered pair
        mask = np.array([i % 7 != 0 for i in range(200)])
        want_xz = float(np.corrcoef(x[mask], z[mask])[0, 1])
        assert abs(got[("x", "z")][0] - want_xz) < 1e-5

    def test_degenerate_and_guard(self, spark):
        import pytest as _pytest

        from recover_spark.operators.analytics import correlation_matrix

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0)], "a double, b double"
        )
        got = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in correlation_matrix(df, ["a", "b"]).collect()
        }
        assert got[("a", "b")] is None  # zero-variance b
        with _pytest.raises(ValueError, match=">= 2"):
            correlation_matrix(df, ["a"])
        # a duplicated name would silently collide the __c_/__n_ pair
        # tags — the contract is a loud error (round-7 advice)
        with _pytest.raises(ValueError, match="duplicate"):
            correlation_matrix(df, ["a", "b", "a"])

    def test_duplicate_columns_raise_in_matview(self, spark, tmp_path):
        import pytest as _pytest

        from recover_spark.streaming.matview import merge_corr_moments

        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with _pytest.raises(ValueError, match="duplicate"):
            merge_corr_moments(
                spark, df, str(tmp_path / "state"), ["x", "y", "x"]
            )

    def test_single_aggregate_pass(self, spark):
        """All pairs must ride ONE aggregate — no per-pair jobs."""
        from recover_spark.operators.analytics import correlation_matrix

        df = spark.range(100).selectExpr(
            "CAST(id AS DOUBLE) a", "CAST(id*2 AS DOUBLE) b",
            "CAST(id%7 AS DOUBLE) c",
        )
        plan = (
            correlation_matrix(df, ["a", "b", "c"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("HashAggregate") <= 4  # partial+final (+AQE)
        assert "CartesianProduct" not in plan


class TestAutocorrelation:
    """autocorrelation (operators/temporal.py): sample ACF pinned
    against the direct numpy formula."""

    @staticmethod
    def _np_acf(xs, max_lag):
        import numpy as np

        x = np.asarray(xs, dtype=float)
        m = x.mean()
        denom = ((x - m) ** 2).sum()
        out = {}
        for k in range(1, max_lag + 1):
            if k >= len(x) or denom == 0:
                out[k] = None
            else:
                out[k] = float(((x[k:] - m) * (x[:-k] - m)).sum() / denom)
        return out

    def test_matches_numpy_on_periodic_series(self, spark):
        import math

        # period-7 signal + deterministic jitter: acf peaks at lag 7
        xs = [
            math.sin(2 * math.pi * i / 7) * 10 + (i * 13 % 5)
            for i in range(200)
        ]
        rows = [("a", i, xs[i]) for i in range(200)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        from recover_spark.operators.temporal import autocorrelation

        got = {
            r["lag"]: r["acf"]
            for r in autocorrelation(df, ["k"], ["t"], "v", max_lag=10).collect()
        }
        want = self._np_acf(xs, 10)
        for k in range(1, 11):
            assert abs(got[k] - want[k]) < 5.1e-6, (k, got[k], want[k])
        assert got[7] == max(got.values())          # the period shows
        assert got[7] > 0.8 and got[3] < 0.2

    def test_multi_key_and_degenerate(self, spark):
        from recover_spark.operators.temporal import autocorrelation

        rows = [("a", i, float(i % 3)) for i in range(30)] + [
            ("flat", i, 5.0) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = autocorrelation(df, ["k"], ["t"], "v", max_lag=3).collect()
        by = {(r["k"], r["lag"]): r["acf"] for r in out}
        want = self._np_acf([float(i % 3) for i in range(30)], 3)
        assert abs(by[("a", 3)] - want[3]) < 5.1e-6
        # zero-variance series: NULL, not an error
        assert all(by[("flat", k)] is None for k in (1, 2, 3))
        n_by_key = {r["k"]: r["n"] for r in out}
        assert n_by_key == {"a": 30, "flat": 10}

    def test_single_window_single_aggregate_plan(self, spark):
        """All lags must ride ONE window pass + ONE aggregate — no
        per-lag jobs, no join, no CartesianProduct."""
        from recover_spark.operators.temporal import autocorrelation

        df = spark.range(1000).selectExpr(
            "CAST(id % 7 AS STRING) k", "id t", "CAST(id % 13 AS DOUBLE) v"
        )
        plan = (
            autocorrelation(df, ["k"], ["t"], "v", max_lag=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Window") == 1
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange") <= 3  # window + partial/final agg


class TestCusumChangepoints:
    """cusum_changepoints (operators/temporal.py): the running-min
    identity pinned against the sequential Page recurrence."""

    @staticmethod
    def _seq_cusum(xs, slack):
        import statistics

        m = statistics.fmean(xs)
        sd = statistics.stdev(xs)
        sp = sn = 0.0
        out = []
        for x in xs:
            z = (x - m) / sd
            sp = max(0.0, sp + z - slack)
            sn = max(0.0, sn - z - slack)
            out.append((sp, sn))
        return out

    def test_matches_sequential_recurrence(self, spark):
        xs = [float((i * 17) % 23) for i in range(60)] + [
            float((i * 17) % 23 + 15) for i in range(60)
        ]
        rows = [("a", i, xs[i]) for i in range(len(xs))]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        from recover_spark.operators.temporal import cusum_changepoints

        got = {
            r["t"]: (r["cusum_pos"], r["cusum_neg"], r["is_change"])
            for r in cusum_changepoints(
                df, ["k"], ["t"], "v", slack=0.5, threshold=4.0
            ).collect()
        }
        want = self._seq_cusum(xs, 0.5)
        for t, (sp, sn) in enumerate(want):
            assert abs(got[t][0] - sp) < 1e-5, (t, got[t][0], sp)
            assert abs(got[t][1] - sn) < 1e-5
        # retrospective normalization centers on the GLOBAL mean, so
        # the below-mean first half accumulates on the negative side
        # and the upward shift at t=60 on the positive side; the
        # directional statistics separate the two eras
        assert all(got[t][0] < 4.0 for t in range(0, 60))   # pos quiet early
        assert any(got[t][0] > 4.0 for t in range(60, 80))  # shift registers
        assert any(got[t][2] for t in range(60, 80))

    def test_zero_variance_yields_null_no_alarm(self, spark):
        from recover_spark.operators.temporal import cusum_changepoints

        df = spark.createDataFrame(
            [("f", i, 3.0) for i in range(10)], "k string, t int, v double"
        )
        rows = cusum_changepoints(df, ["k"], ["t"], "v").collect()
        assert all(r["cusum_pos"] is None for r in rows)
        assert all(r["is_change"] is None for r in rows)

    def test_one_exchange_plan(self, spark):
        from recover_spark.operators.temporal import cusum_changepoints

        df = spark.range(5000).selectExpr(
            "CAST(id % 11 AS STRING) k", "id t", "CAST(id % 19 AS DOUBLE) v"
        )
        plan = (
            cusum_changepoints(df, ["k"], ["t"], "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one key-partitioned exchange feeds every window spec
        assert plan.count("Exchange") == 1
        assert "CartesianProduct" not in plan


class TestAssociationMatrix:
    """association_matrix (operators/analytics.py): Cramér's V pinned
    against a direct pandas-crosstab chi-square reference."""

    @staticmethod
    def _ref_v(pairs):
        import numpy as np
        import pandas as pd

        a, b = zip(*pairs)
        ct = pd.crosstab(pd.Series(a), pd.Series(b)).to_numpy()
        n = ct.sum()
        e = np.outer(ct.sum(1), ct.sum(0)) / n
        chi2 = float(((ct - e) ** 2 / e).sum())
        r, c = ct.shape
        v = float(np.sqrt(chi2 / (n * (min(r, c) - 1))))
        p = ct / n
        with np.errstate(divide="ignore", invalid="ignore"):
            mi_terms = np.where(ct > 0, p * np.log2(p / (e / n)), 0.0)
        mi = float(mi_terms.sum())
        return chi2, v, r, c, mi

    def test_matches_reference_and_shapes(self, spark):
        rows = [
            (
                ["x", "y", "z"][i % 3],
                ["p", "q"][(i % 3) % 2],        # correlated with col a
                ["m", "n", "o", "r"][i % 4],    # independent of a
            )
            for i in range(240)
        ]
        df = spark.createDataFrame(rows, "a string, b string, c string")
        from recover_spark.operators.analytics import association_matrix

        got = {
            (r["col_a"], r["col_b"]): r
            for r in association_matrix(df, ["a", "b", "c"]).collect()
        }
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        for pa, pb in got:
            idx = {"a": 0, "b": 1, "c": 2}
            pairs = [(r[idx[pa]], r[idx[pb]]) for r in rows]
            chi2, v, R, C, mi = self._ref_v(pairs)
            row = got[(pa, pb)]
            assert abs(row["chi2"] - chi2) < 1e-4, (pa, pb, row["chi2"], chi2)
            assert abs(row["v_cramer"] - v) < 1e-5
            assert abs(row["mutual_info"] - mi) < 1e-5
            assert (row["r_levels"], row["c_levels"]) == (R, C)
            assert row["n"] == 240
        # a determines b in this construction -> perfect association
        assert got[("a", "b")]["v_cramer"] > 0.99
        # MI of a determined pair = H(b) = entropy of the 2:1 split
        import math as _math
        h_b = -(2 / 3) * _math.log2(2 / 3) - (1 / 3) * _math.log2(1 / 3)
        assert abs(got[("a", "b")]["mutual_info"] - h_b) < 1e-5
        assert got[("a", "c")]["mutual_info"] < 0.01
        # c is independent of a -> near zero
        assert got[("a", "c")]["v_cramer"] < 0.05

    def test_nulls_are_a_category_and_degenerate_null(self, spark):
        from recover_spark.operators.analytics import association_matrix

        rows = [("x", None), ("x", None), ("y", "q"), ("y", "q")] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        row = association_matrix(df, ["a", "b"]).collect()[0]
        # NULL folds into its own category: a fully determines b
        assert row["v_cramer"] == 1.0
        assert row["r_levels"] == 2 and row["c_levels"] == 2
        # single-level column -> min(R,C)-1 == 0 -> NULL
        const = spark.createDataFrame(
            [("k", v) for v in ("p", "q", "p", "r")], "a string, b string"
        )
        r2 = association_matrix(const, ["a", "b"]).collect()[0]
        assert r2["v_cramer"] is None

    def test_single_fact_shuffle_plan(self, spark):
        """All pairs' cells must ride ONE shuffle of the fact table;
        margins/dims operate on contingency-sized data only."""
        from recover_spark.operators.analytics import association_matrix

        df = spark.range(10_000).selectExpr(
            "CAST(id % 3 AS STRING) a",
            "CAST(id % 5 AS STRING) b",
            "CAST(id % 7 AS STRING) c",
        )
        plan = (
            association_matrix(df, ["a", "b", "c"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # exactly one scan of the fact feeds the explode+count
        assert plan.count("Scan ") <= 1 or plan.count("Range") == 1


class TestMadAnomalies:
    """mad_anomalies (operators/temporal.py): modified z-score pinned
    against the direct numpy formula."""

    def test_matches_numpy_and_robustness(self, spark):
        import numpy as np

        xs = [float((i * 13) % 40) for i in range(100)] + [500.0, -400.0]
        df = spark.createDataFrame(
            [("a", v) for v in xs], "k string, v double"
        )
        from recover_spark.operators.temporal import mad_anomalies

        got = {
            r["v"]: r for r in mad_anomalies(df, ["k"], "v").collect()
        }
        med = round(float(np.median(xs)), 9)
        mad = round(float(np.median(np.abs(np.array(xs) - med))), 9)
        for v in (0.0, 39.0, 500.0, -400.0):
            want = 0.6745 * (v - med) / mad
            assert abs(got[v]["mad_z"] - want) < 5.1e-6, (v, got[v]["mad_z"], want)
        # the two spikes flag; the bulk does not — and the spikes did
        # not mask themselves (the classic stddev failure)
        assert got[500.0]["is_outlier"] and got[-400.0]["is_outlier"]
        assert not got[0.0]["is_outlier"] and not got[39.0]["is_outlier"]

    def test_zero_mad_yields_null(self, spark):
        from recover_spark.operators.temporal import mad_anomalies

        df = spark.createDataFrame(
            [("c", 5.0)] * 8 + [("c", 9.0)], "k string, v double"
        )
        rows = mad_anomalies(df, ["k"], "v").collect()
        # median 5, MAD 0 -> undefined scores, no alarms
        assert all(r["mad_z"] is None for r in rows)
        assert all(r["is_outlier"] is None for r in rows)

    def test_no_cartesian_plan(self, spark):
        from recover_spark.operators.temporal import mad_anomalies

        df = spark.range(2000).selectExpr(
            "CAST(id % 5 AS STRING) k", "CAST(id % 17 AS DOUBLE) v"
        )
        plan = (
            mad_anomalies(df, ["k"], "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan


class TestDistributionEntropy:
    def test_matches_formula_and_bounds(self, spark):
        import math

        from recover_spark.operators.analytics import distribution_entropy

        rows = (
            [("g1", "a")] * 50 + [("g1", "b")] * 25 + [("g1", "c")] * 25
            + [("g2", "x")] * 99 + [("g2", None)] * 1
            + [("g3", "only")] * 10
        )
        df = spark.createDataFrame(rows, "g string, c string")
        got = {
            r["g"]: r
            for r in distribution_entropy(df, ["g"], "c").collect()
        }
        h1 = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
        assert abs(got["g1"]["entropy_bits"] - h1) < 5.1e-6
        assert abs(got["g1"]["norm_entropy"] - h1 / math.log2(3)) < 5.1e-6
        # NULL is a category: g2 has 2 levels, heavily skewed
        assert got["g2"]["n_levels"] == 2
        h2 = -(0.99 * math.log2(0.99) + 0.01 * math.log2(0.01))
        assert abs(got["g2"]["entropy_bits"] - h2) < 5.1e-6
        # single level: H = 0, normalized NULL (log2(1) = 0)
        assert got["g3"]["entropy_bits"] == 0.0
        assert got["g3"]["norm_entropy"] is None
        assert got["g1"]["n"] == 100

    def test_expression_category(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.operators.analytics import distribution_entropy

        df = spark.range(240).selectExpr("'g' AS g", "id")
        out = distribution_entropy(
            df, ["g"], (F.col("id") % 24)
        ).collect()[0]
        # uniform over 24 levels -> normalized entropy exactly 1
        assert out["norm_entropy"] == 1.0 and out["n_levels"] == 24


class TestNgramNovelty:
    def test_unique_shared_and_short_docs(self, spark):
        from recover_spark.ops.text_analysis import ngram_novelty

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta gamma delta epsilon"),      # exact copy
                (3, "completely different words entirely here"),
                (4, "too short"),                            # no 3-grams
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in ngram_novelty(docs, boilerplate_df=2).collect()}
        # docs 1/2 share every shingle -> novelty 0, boilerplate 1
        assert got[1]["novelty"] == 0.0 and got[1]["boilerplate"] == 1.0
        assert got[2]["novelty"] == 0.0
        # doc 3's shingles are unique to it
        assert got[3]["novelty"] == 1.0 and got[3]["boilerplate"] == 0.0
        assert got[3]["n_shingles"] == 3
        # short doc surfaces with 0 shingles and NULL scores
        assert got[4]["n_shingles"] == 0 and got[4]["novelty"] is None

    def test_one_to_one_join_no_blowup(self, spark):
        from recover_spark.ops.text_analysis import ngram_novelty

        docs = spark.range(200).selectExpr(
            "id AS doc_id",
            "concat('common boiler plate text plus word', CAST(id AS STRING)) AS text",
        )
        out = ngram_novelty(docs)
        rows = out.collect()
        assert len(rows) == 200
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestSurvivalCurve:
    @staticmethod
    def _km_reference(subjects):
        """Sequential Kaplan-Meier over (duration, event) pairs."""
        from collections import Counter

        d = Counter(t for t, e in subjects if e)
        c = Counter(t for t, e in subjects if not e)
        n = len(subjects)
        s, out = 1.0, {}
        for t in sorted(set(d) | set(c)):
            out_row = {"n_risk": n, "n_event": d[t], "n_censored": c[t]}
            s *= (n - d[t]) / n
            out_row["survival"] = s
            out[t] = out_row
            n -= d[t] + c[t]
        return out

    def test_hand_computed_curve_with_censoring(self, spark):
        from recover_spark.operators.analytics import survival_curve

        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 1), ("g", 2, 0), ("g", 3, 1),
             ("h", 1, 0), ("h", 2, 0)],
            "g string, duration int, e int",
        )
        got = {
            (r["g"], r["duration"]): r
            for r in survival_curve(df, ["g"], "duration", "e").collect()
        }
        # g: S(1)=3/4, S(2)=3/4*2/3=1/2, S(3)=0 (at-risk set empties)
        assert got[("g", 1)]["survival"] == 0.75
        assert got[("g", 1)]["n_risk"] == 4
        assert got[("g", 2)]["survival"] == 0.5
        assert got[("g", 2)]["n_censored"] == 1
        assert got[("g", 3)]["survival"] == 0.0
        # h: censor-only group stays at S = 1
        assert got[("h", 1)]["survival"] == 1.0
        assert got[("h", 2)]["survival"] == 1.0
        assert got[("h", 2)]["n_risk"] == 1

    def test_matches_sequential_reference_fuzz(self, spark):
        import random

        from recover_spark.operators.analytics import survival_curve

        rng = random.Random(8)
        rows = [
            ("k%d" % (i % 3), rng.randint(0, 12), rng.randint(0, 1))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, duration int, e int")
        got = {
            (r["g"], r["duration"]): r
            for r in survival_curve(df, ["g"], "duration", "e").collect()
        }
        for g in ("k0", "k1", "k2"):
            ref = self._km_reference(
                [(t, e) for gg, t, e in rows if gg == g]
            )
            for t, want in ref.items():
                row = got[(g, t)]
                assert row["n_risk"] == want["n_risk"]
                assert row["n_event"] == want["n_event"]
                assert row["n_censored"] == want["n_censored"]
                assert abs(row["survival"] - want["survival"]) < 5.1e-6


class TestGiniByGroup:
    def test_known_values(self, spark):
        from recover_spark.operators.analytics import gini_by_group

        df = spark.createDataFrame(
            [("eq", 5.0)] * 4
            + [("conc", 0.0)] * 3 + [("conc", 10.0)]
            + [("zero", 0.0)] * 2,
            "g string, v double",
        )
        got = {r["g"]: r for r in gini_by_group(df, ["g"], "v").collect()}
        assert got["eq"]["gini"] == 0.0
        # all mass on one of four members: G = (n-1)/n = 0.75
        assert got["conc"]["gini"] == 0.75
        # zero total -> NULL via try_divide
        assert got["zero"]["gini"] is None
        assert got["eq"]["n"] == 4 and got["eq"]["mean"] == 5.0

    def test_matches_pairwise_reference_across_buckets(self, spark):
        import random

        from recover_spark.operators.analytics import gini_by_group

        rng = random.Random(81)
        rows = [
            ("g%d" % (i % 2), round(rng.expovariate(1 / 50.0), 2))
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        # small buckets so the rank decomposition is exercised hard
        got = {
            r["g"]: r["gini"]
            for r in gini_by_group(df, ["g"], "v", buckets=7).collect()
        }
        for g in ("g0", "g1"):
            xs = [v for gg, v in rows if gg == g]
            n, mu = len(xs), sum(xs) / len(xs)
            pair = sum(abs(a - b) for a in xs for b in xs)
            want = pair / (2 * n * n * mu)
            assert abs(got[g] - want) < 5.1e-6

    def test_rank_decomposition_plan(self, spark):
        from recover_spark.operators.analytics import gini_by_group

        df = spark.range(5000).selectExpr(
            "CAST(id % 3 AS STRING) g", "CAST(id % 97 AS DOUBLE) v"
        )
        plan = (
            gini_by_group(df, ["g"], "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # the fact-sized window must partition on (group, bucket),
        # never on the group alone
        assert "__bucket" in plan


class TestBasketLift:
    def test_known_values_and_exclusions(self, spark):
        from recover_spark.operators.analytics import basket_lift

        rows = (
            [("b1", "x"), ("b1", "x"), ("b1", "y"),  # dup item: once
             ("b2", "x"), ("b2", "y"),
             ("b3", "x"), ("b3", "z"),
             ("b4", "y")]
            # an oversized basket leaves pairs AND margins AND the total
            + [("huge", "i%03d" % i) for i in range(70)]
        )
        df = spark.createDataFrame(rows, "b string, i string")
        got = {
            (r["item_a"], r["item_b"]): r
            for r in basket_lift(df, "b", "i").collect()
        }
        assert set(got) == {("x", "y"), ("x", "z")}
        xy = got[("x", "y")]
        assert xy["n_ab"] == 2 and xy["n_a"] == 3 and xy["n_b"] == 3
        assert xy["support"] == 0.5           # 2 of 4 kept baskets
        assert xy["conf_a_b"] == 0.666667
        assert abs(xy["lift"] - 8.0 / 9.0) < 5.1e-6
        xz = got[("x", "z")]
        assert abs(xz["lift"] - 4.0 / 3.0) < 5.1e-6

    def test_min_pair_count_prunes(self, spark):
        from recover_spark.operators.analytics import basket_lift

        df = spark.createDataFrame(
            [("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"),
             ("b3", "x"), ("b3", "z")],
            "b string, i string",
        )
        got = basket_lift(df, "b", "i", min_pair_count=2).collect()
        assert [(r["item_a"], r["item_b"]) for r in got] == [("x", "y")]

    def test_equi_join_plan(self, spark):
        from recover_spark.operators.analytics import basket_lift

        df = spark.range(3000).selectExpr(
            "CAST(id % 500 AS STRING) b", "CAST(id % 23 AS STRING) i"
        )
        plan = (
            basket_lift(df, "b", "i")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan.replace(
            "BroadcastNestedLoopJoin BuildRight, Cross", "", 1
        )  # the one-row total cross-join is the only nested-loop


class TestTheilSen:
    def test_outlier_resistance_on_exact_line(self, spark):
        from recover_spark.operators.temporal import theil_sen_trend

        pts = [("k", float(x), 2.0 * x + 1.0) for x in range(20)]
        pts[7] = ("k", 7.0, 1e6)  # one corrupt point
        df = spark.createDataFrame(pts, "k string, x double, y double")
        row = theil_sen_trend(df, ["k"], "y", "x").collect()[0]
        assert row["slope"] == 2.0
        assert row["intercept"] == 1.0
        assert row["n_points"] == 20 and row["n_pairs"] == 190

    def test_matches_sequential_reference(self, spark):
        import random
        import statistics

        from recover_spark.operators.temporal import theil_sen_trend

        rng = random.Random(88)
        rows = []
        series = {}
        for g in ("a", "b"):
            xs = sorted(rng.sample(range(100), 30))
            ys = [0.5 * x + rng.gauss(0, 3) for x in xs]
            series[g] = (xs, ys)
            rows += [(g, float(x), y) for x, y in zip(xs, ys)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {r["g"]: r for r in theil_sen_trend(df, ["g"], "y", "x").collect()}
        for g, (xs, ys) in series.items():
            slopes = [
                (ys[j] - ys[i]) / (xs[j] - xs[i])
                for i in range(len(xs))
                for j in range(i + 1, len(xs))
                if xs[i] != xs[j]
            ]
            slope = round(statistics.median(slopes), 9)
            icept = statistics.median(y - slope * x for x, y in zip(xs, ys))
            assert abs(got[g]["slope"] - slope) < 5.1e-6
            assert abs(got[g]["intercept"] - icept) < 5.1e-6

    def test_equal_x_pairs_excluded(self, spark):
        from recover_spark.operators.temporal import theil_sen_trend

        df = spark.createDataFrame(
            [("k", 1.0, 1.0), ("k", 1.0, 9.0), ("k", 2.0, 2.0)],
            "k string, x double, y double",
        )
        row = theil_sen_trend(df, ["k"], "y", "x").collect()[0]
        # only the two x=1 -> x=2 pairs exist; slopes {1, -7}, median -3
        assert row["n_pairs"] == 2
        assert row["slope"] == -3.0

    def test_loud_guard_on_oversized_key(self, spark):
        import pytest as _pytest

        from recover_spark.operators.temporal import theil_sen_trend

        df = spark.range(200).selectExpr(
            "'k' AS k", "CAST(id AS DOUBLE) x", "CAST(id AS DOUBLE) y"
        )
        with _pytest.raises(ValueError, match="quadratic"):
            theil_sen_trend(df, ["k"], "y", "x", max_points=100)
