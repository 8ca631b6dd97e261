"""Per-key 1-D Kalman filter (operators/temporal.py:kalman_filter):
filtered values vs an independent Python reference, gain-adaptation
properties, the max_points guard, and partitioning determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

Q, R = 0.5, 4.0


def _events(spark):
    from __spark_entry__ import _load

    return _load(spark, "/root/testdata/sf0.001", "events")


def _py_filter(zs, q=Q, r=R):
    out = []
    x = P = None
    for z in zs:
        if x is None:
            x, P = z, r
        else:
            p_pred = P + q
            k = p_pred / (p_pred + r)
            x = x + k * (z - x)
            P = (1 - k) * p_pred
        out.append(x)
    return out


class TestKalmanFilter:
    def test_matches_python_reference(self, spark):
        from recover_spark.operators.temporal import kalman_filter

        ev = _events(spark)
        raw = sorted(
            ev.select("user_id", "ts", "event_id", "value").collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        series: dict = {}
        for r in raw:
            series.setdefault(r["user_id"], []).append(r["value"])
        expected = {
            u: _py_filter(zs) for u, zs in series.items()
        }
        rows = kalman_filter(
            ev, "user_id", "ts", "value", Q, R, tiebreakers=["event_id"]
        ).collect()
        assert len(rows) == len(raw)
        got: dict = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            got.setdefault(r["user_id"], []).append(r["x_filtered"])
        for u, xs in got.items():
            for a, b in zip(xs, expected[u]):
                assert a == pytest.approx(b, abs=2e-6)

    def test_gain_adapts_first_step_tracks_hardest(self, spark):
        # after init, step-1 gain (P=r) exceeds the steady-state gain,
        # so early estimates move toward observations faster than late
        zs = [0.0] + [10.0] * 30
        xs = _py_filter(zs)
        deltas = [xs[i + 1] - xs[i] for i in range(len(xs) - 1)]
        assert deltas[0] > deltas[10] > 0

    def test_q_dominates_r_tracks_observations(self, spark):
        from recover_spark.operators.temporal import kalman_filter

        ev = spark.createDataFrame(
            [(1, i, float(i * i)) for i in range(10)],
            "user_id long, ts long, value double",
        )
        rows = kalman_filter(
            ev, "user_id", "ts", "value", process_var=1e6, obs_var=1e-3
        ).collect()
        for r in rows:
            assert r["x_filtered"] == pytest.approx(r["value"], abs=1e-3)

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.operators.temporal import kalman_filter

        ev = _events(spark)
        a = kalman_filter(
            ev, "user_id", "ts", "value", Q, R, tiebreakers=["event_id"]
        ).collect()
        b = kalman_filter(
            ev.repartition(11), "user_id", "ts", "value", Q, R,
            tiebreakers=["event_id"],
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_guards(self, spark):
        from recover_spark.operators.temporal import kalman_filter

        ev = _events(spark)
        with pytest.raises(ValueError, match="process_var"):
            kalman_filter(ev, "user_id", "ts", "value", -1.0, 1.0)
        with pytest.raises(Exception, match="max_points"):
            kalman_filter(
                ev, "user_id", "ts", "value", Q, R,
                tiebreakers=["event_id"], max_points=3,
            ).collect()


def _py_smooth(zs, q=Q, r=R):
    xf, Pf = [], []
    x = P = None
    for z in zs:
        if x is None:
            x, P = z, r
        else:
            p_pred = P + q
            k = p_pred / (p_pred + r)
            x = x + k * (z - x)
            P = (1 - k) * p_pred
        xf.append(x)
        Pf.append(P)
    xs = [None] * len(zs)
    xs[-1] = xf[-1]
    for t in range(len(zs) - 2, -1, -1):
        c = Pf[t] / (Pf[t] + q)
        xs[t] = xf[t] + c * (xs[t + 1] - xf[t])
    return xf, xs


class TestKalmanSmoother:
    def test_matches_python_reference(self, spark):
        from recover_spark.operators.temporal import kalman_smoother

        ev = _events(spark)
        raw = sorted(
            ev.select("user_id", "ts", "event_id", "value").collect(),
            key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
        )
        series: dict = {}
        for r in raw:
            series.setdefault(r["user_id"], []).append(r["value"])
        rows = kalman_smoother(
            ev, "user_id", "ts", "value", Q, R, tiebreakers=["event_id"]
        ).collect()
        got: dict = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            got.setdefault(r["user_id"], []).append(
                (r["x_filtered"], r["x_smoothed"])
            )
        for u, pairs in got.items():
            xf, xs = _py_smooth(series[u])
            for (a_f, a_s), b_f, b_s in zip(pairs, xf, xs):
                assert a_f == pytest.approx(b_f, abs=2e-6)
                assert a_s == pytest.approx(b_s, abs=2e-6)

    def test_smoothed_equals_filtered_at_last_point(self, spark):
        from recover_spark.operators.temporal import kalman_smoother

        ev = _events(spark)
        rows = kalman_smoother(
            ev, "user_id", "ts", "value", Q, R, tiebreakers=["event_id"]
        ).collect()
        last: dict = {}
        for r in rows:
            k = (r["ts"], r["event_id"])
            if r["user_id"] not in last or k > last[r["user_id"]][0]:
                last[r["user_id"]] = (k, r)
        for _, r in last.values():
            assert r["x_smoothed"] == r["x_filtered"]

    def test_smoother_beats_filter_on_step_series(self, spark):
        # on a noise-free level shift the smoother anticipates the jump
        # (it sees the future); the filter lags — smoothed error < filtered
        from recover_spark.operators.temporal import kalman_smoother

        vals = [0.0] * 10 + [10.0] * 10
        ev = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)],
            "user_id long, ts long, value double",
        )
        rows = sorted(
            kalman_smoother(ev, "user_id", "ts", "value", Q, R).collect(),
            key=lambda r: r["ts"],
        )
        err_f = sum((r["x_filtered"] - r["value"]) ** 2 for r in rows)
        err_s = sum((r["x_smoothed"] - r["value"]) ** 2 for r in rows)
        assert err_s < err_f
