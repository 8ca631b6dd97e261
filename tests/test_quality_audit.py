"""V1-V4 expectation-suite and A1/A6 audit tests."""

from recover_spark.operators import CountStage, stage_counts, union_ledgers
from recover_spark.quality.expectations import parse_suite, run_suite, validity_gates


def test_between_expectation_pass_fail(spark):
    df = spark.createDataFrame(
        [(500,), (100,), (26000,), (None,)], "Calories int"
    )
    res = run_suite(
        df,
        [
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "Calories", "min_value": 300, "max_value": 25000},
            }
        ],
    )[0]
    assert not res.success
    assert res.element_count == 4
    assert res.unexpected_count == 2  # 100 and 26000; null not unexpected


def test_mostly_threshold(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (100,)], "x int")
    res = run_suite(
        df,
        [
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "x", "min_value": 0, "max_value": 10, "mostly": 0.7},
            }
        ],
    )[0]
    assert res.success  # 3/4 = 0.75 >= 0.7


def test_column_exists(spark):
    df = spark.createDataFrame([(1,)], "HealthKitWorkoutKey int")
    suite = [
        {"expectation_type": "expect_column_to_exist", "kwargs": {"column": "HealthKitWorkoutKey"}},
        {"expectation_type": "expect_column_to_exist", "kwargs": {"column": "Nope"}},
    ]
    res = run_suite(df, suite)
    assert [r.success for r in res] == [True, False]


def test_parse_reference_suite_shape():
    spec = {
        "expectations": [
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "Calories", "min_value": 300, "max_value": 25000},
            }
        ]
    }
    suite = parse_suite(spec)
    assert suite[0].kwargs["column"] == "Calories"


def test_validity_gates(spark):
    ok = spark.createDataFrame([(1,)], "x int")
    g = validity_gates(ok)
    assert g["valid"] and not g["duplicate_columns"]
    empty = spark.createDataFrame([], "x int")
    assert not validity_gates(empty)["valid"]


def test_stage_counts_and_union(spark):
    df = spark.createDataFrame(
        [("2023-01-01",), ("2023-01-01",), ("2023-01-02",)], "export_end_date string"
    )
    read = stage_counts(df, CountStage.READ, data_type="fitbit")
    write = stage_counts(df.limit(2), CountStage.WRITE, data_type="fitbit")
    ledger = union_ledgers([read, write])
    rows = {(r.export_end_date, r.stage): r.record_count for r in ledger.collect()}
    assert rows[("2023-01-01", "READ")] == 2
    assert sum(v for (_, s), v in rows.items() if s == "WRITE") == 2


def test_in_set_lengths_unique_rowcount(spark):
    df = spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "zap"), (3, None)],
        "event_id int, event_type string",
    )
    suite = [
        {"expectation_type": "expect_column_values_to_be_in_set",
         "kwargs": {"column": "event_type", "value_set": ["click", "view"]}},
        {"expectation_type": "expect_column_value_lengths_to_be_between",
         "kwargs": {"column": "event_type", "min_value": 4, "max_value": 5}},
        {"expectation_type": "expect_column_values_to_be_unique",
         "kwargs": {"column": "event_id"}},
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": 1, "max_value": 3}},
    ]
    by_type = {r.expectation_type: r for r in run_suite(df, suite)}

    r = by_type["expect_column_values_to_be_in_set"]
    assert not r.success and r.unexpected_count == 1  # 'zap'; null skipped

    r = by_type["expect_column_value_lengths_to_be_between"]
    assert not r.success and r.unexpected_count == 1  # len('zap')=3

    r = by_type["expect_column_values_to_be_unique"]
    assert not r.success
    assert r.element_count == 4 and r.unexpected_count == 1  # one surplus 3

    r = by_type["expect_table_row_count_to_be_between"]
    assert not r.success and r.element_count == 4  # 4 rows > max 3


def test_in_set_missing_column_and_mostly(spark):
    df = spark.createDataFrame([("a",), ("b",), ("b",), ("c",)], "v string")
    res = run_suite(
        df,
        [
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "nope", "value_set": ["a"]}},
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "v", "value_set": ["a", "b"], "mostly": 0.7}},
        ],
    )
    assert not res[0].success and res[0].details == {"error": "missing column"}
    assert res[1].success  # 3/4 = 0.75 >= 0.7


def test_persist_run_artifacts(spark, tmp_path):
    """Suite runs persist as per-run checkpoint artifacts with a
    latest-pointer (reference: GE validation store keyed by run id)."""
    import json

    from recover_spark.quality.expectations import persist_run, run_suite

    df = spark.createDataFrame([(1,), (2,)], "x int")
    suite = {
        "expectations": [
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "x", "min_value": 0, "max_value": 10},
            }
        ]
    }
    res = run_suite(df, suite)
    p1 = persist_run(res, str(tmp_path / "ge"), "events_suite", "run-001")
    persist_run(res, str(tmp_path / "ge"), "events_suite", "run-002")

    doc = json.loads(open(p1).read())
    assert doc["success"] is True
    assert doc["statistics"]["evaluated_expectations"] == 1
    latest = json.loads((tmp_path / "ge" / "events_suite" / "latest.json").read_text())
    assert latest["run_id"] == "run-002"
    # history is append-only: both runs remain addressable
    assert (tmp_path / "ge" / "events_suite" / "run-001.json").exists()
    assert (tmp_path / "ge" / "events_suite" / "run-002.json").exists()


# -- PSI drift detection ----------------------------------------------------


class TestPsiDrift:
    def test_identical_distributions_near_zero(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift

        base = spark.range(0, 10_000).select(
            (F.col("id") % 1000).cast("double").alias("v"),
            (F.col("id") % 97).cast("double").alias("w"),
        )
        out = {r.column: r.psi for r in psi_drift(base, base, ["v", "w"]).collect()}
        assert out["v"] == 0.0 and out["w"] == 0.0

    def test_empty_side_yields_null_not_ansi_error(self, spark):
        """Family contract (same as ks_drift/js_drift): an empty era
        gives NULL psi via try_divide + the totals gate — never an
        ANSI DIVIDE_BY_ZERO, and never a silent eps clamp (Spark's
        greatest ignores NULLs, so the gate is load-bearing)."""
        from recover_spark.quality.drift import psi_drift

        base = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        empty = spark.createDataFrame([], "v double")
        rows = psi_drift(base, empty, ["v"]).collect()
        assert len(rows) == 1 and rows[0]["psi"] is None

    def test_shifted_distribution_flagged(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift

        base = spark.range(0, 10_000).select(
            (F.col("id") % 1000).cast("double").alias("v")
        )
        # the firmware-update failure shape: +20% multiplicative shift,
        # same row count, same schema
        shifted = base.select((F.col("v") * 1.2).alias("v"))
        psi = psi_drift(base, shifted, ["v"]).collect()[0].psi
        assert psi > 0.1, psi
        # small jitter stays under the action threshold
        jittered = base.select((F.col("v") + 2.0).alias("v"))
        psi_j = psi_drift(base, jittered, ["v"]).collect()[0].psi
        assert psi_j < psi

    def test_matches_numpy_reference(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift

        rng_base = [(i * 37 % 500) / 3.0 for i in range(4000)]
        rng_cur = [(i * 61 % 650) / 3.0 for i in range(5000)]
        base = spark.createDataFrame([(v,) for v in rng_base], "v double")
        cur = spark.createDataFrame([(v,) for v in rng_cur], "v double")
        got = psi_drift(
            base, cur, ["v"], n_bins=10, edge_accuracy=None
        ).collect()[0].psi

        arr = np.sort(np.array(rng_base))
        edges = [np.quantile(arr, q / 10, method="linear") for q in range(1, 10)]
        def shares(vals):
            bins = np.searchsorted(edges, np.array(vals), side="left")
            # searchsorted(left): count of edges < v; our rule counts
            # edges <= v — adjust by using right side
            bins = np.searchsorted(edges, np.array(vals), side="right")
            c = np.bincount(bins, minlength=10).astype(float)
            return np.maximum(c / c.sum(), 1e-4)
        pb, pc = shares(rng_base), shares(rng_cur)
        expect = float(np.sum((pc - pb) * np.log(pc / pb)))
        assert abs(got - expect) < 1e-6, (got, expect)

    def test_approx_edges_default_tracks_exact(self, spark):
        """The default approx_percentile edge mode (bounded aggregation
        buffer, the unbounded-baseline path) yields a PSI close to the
        exact-interpolation mode and exactly zero on self-comparison —
        the drift signal does not depend on exact quantiles."""
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift

        base = spark.range(0, 20_000).select(
            ((F.col("id") * 37) % 4999).cast("double").alias("v")
        )
        cur = base.select((F.col("v") * 1.15 + 3.0).alias("v"))
        approx = psi_drift(base, cur, ["v"]).collect()[0].psi
        exact = psi_drift(base, cur, ["v"], edge_accuracy=None).collect()[0].psi
        assert abs(approx - exact) < 0.05, (approx, exact)
        self_psi = psi_drift(base, base, ["v"]).collect()[0].psi
        assert self_psi == 0.0

    def test_nulls_excluded_and_empty_cols_rejected(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift

        base = spark.createDataFrame(
            [(float(i),) for i in range(100)] + [(None,)] * 50, "v double"
        )
        out = psi_drift(base, base, ["v"]).collect()[0]
        assert out.psi == 0.0
        with pytest.raises(ValueError, match="cols"):
            psi_drift(base, base, [])


class TestPsiCategorical:
    def test_identical_zero_and_shifted_mix_flagged(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift_categorical

        base = spark.range(0, 9_000).select(
            F.when(F.col("id") % 3 == 0, "a")
            .when(F.col("id") % 3 == 1, "b")
            .otherwise("c")
            .alias("k")
        )
        zero = psi_drift_categorical(base, base, ["k"]).collect()[0]
        assert zero.psi == 0.0
        skewed = spark.range(0, 9_000).select(
            F.when(F.col("id") % 9 < 7, "a")  # a jumps 1/3 -> 7/9
            .when(F.col("id") % 9 == 7, "b")
            .otherwise("c")
            .alias("k")
        )
        psi = psi_drift_categorical(base, skewed, ["k"]).collect()[0].psi
        assert psi > 0.25, psi

    def test_new_category_lands_in_other_bin(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift_categorical

        base = spark.range(0, 1_000).select(
            F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("k")
        )
        renamed = spark.range(0, 1_000).select(
            F.when(F.col("id") % 2 == 0, "x").otherwise("z").alias("k")
        )
        psi = psi_drift_categorical(base, renamed, ["k"]).collect()[0].psi
        # y vanished AND an unseen z appeared -> large drift, not silence
        assert psi > 0.25, psi

    def test_null_is_its_own_category(self, spark):
        from recover_spark.quality.drift import psi_drift_categorical

        base = spark.createDataFrame(
            [("a",)] * 80 + [(None,)] * 20, "k string"
        )
        cur = spark.createDataFrame(
            [("a",)] * 50 + [(None,)] * 50, "k string"
        )
        psi = psi_drift_categorical(base, cur, ["k"]).collect()[0].psi
        assert psi > 0.1  # null-rate drift is drift

    def test_rare_categories_pool_into_other(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.quality.drift import psi_drift_categorical

        base = spark.range(0, 1_000).select(
            F.concat(F.lit("c"), (F.col("id") % 50)).alias("k")
        )
        out = psi_drift_categorical(base, base, ["k"], top_k=5).collect()[0]
        assert out.psi == 0.0 and out.top_k == 5


class TestKsDrift:
    """Exact two-sample KS (quality/drift.py:ks_drift) vs a sequential
    ECDF reference, including tie-heavy data where the at-or-below /
    strictly-below distinction matters."""

    @staticmethod
    def _ks_reference(xs, ys):
        pts = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        best = 0
        sx, sy = sorted(xs), sorted(ys)
        import bisect

        for p in pts:
            ca = bisect.bisect_right(sx, p)
            cb = bisect.bisect_right(sy, p)
            best = max(best, abs(ca * nb - cb * na))
        return best / (na * nb)

    def test_matches_sequential_reference(self, spark):
        import random

        from recover_spark.quality.drift import ks_drift

        rng = random.Random(11)
        xs = [round(rng.gauss(50, 10), 1) for _ in range(300)]
        ys = [round(rng.gauss(55, 12), 1) for _ in range(250)]  # shifted
        base = spark.createDataFrame([(v,) for v in xs], "v double")
        cur = spark.createDataFrame([(v,) for v in ys], "v double")
        row = ks_drift(base, cur, ["v"]).collect()[0]
        want = self._ks_reference(xs, ys)
        assert abs(row["ks"] - want) < 5.1e-7  # ks is rounded to 6 digits
        assert (row["n_base"], row["n_cur"]) == (300, 250)
        assert row["ks"] > 0.1  # the shift registers

    def test_ties_and_identity(self, spark):
        from recover_spark.quality.drift import ks_drift

        xs = [1.0] * 40 + [2.0] * 40 + [3.0] * 20
        ys = [1.0] * 20 + [2.0] * 60 + [3.0] * 20
        base = spark.createDataFrame([(v,) for v in xs], "v double")
        cur = spark.createDataFrame([(v,) for v in ys], "v double")
        row = ks_drift(base, cur, ["v"]).collect()[0]
        assert abs(row["ks"] - self._ks_reference(xs, ys)) < 5.1e-7
        # identical samples: exactly zero
        same = ks_drift(base, base, ["v"]).collect()[0]
        assert same["ks"] == 0.0

    def test_empty_side_yields_null_not_ansi_error(self, spark):
        """An empty baseline or current side gives N_a*N_b == 0; the
        degenerate-case contract is NULL (try_divide), matching
        ks_drift_by_period — not an ANSI DIVIDE_BY_ZERO (round-7
        advice)."""
        from recover_spark.quality.drift import ks_drift

        base = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        empty = spark.createDataFrame([], "v double")
        rows = ks_drift(base, empty, ["v"]).collect()
        assert len(rows) == 1 and rows[0]["ks"] is None

    def test_multi_column_and_nulls(self, spark):
        from recover_spark.quality.drift import ks_drift

        base = spark.createDataFrame(
            [(float(i), float(i % 5)) for i in range(100)]
            + [(None, None)] * 5,
            "x double, y double",
        )
        cur = spark.createDataFrame(
            [(float(i) + 30.0, float(i % 5)) for i in range(100)],
            "x double, y double",
        )
        got = {r["column"]: r for r in ks_drift(base, cur, ["x", "y"]).collect()}
        assert got["x"]["ks"] > 0.25      # shifted column drifts
        assert got["y"]["ks"] == 0.0      # identical column does not
        assert got["x"]["n_base"] == 100  # nulls dropped from the count

    def test_no_single_partition_data_window(self, spark):
        """The ECDF cumsum must ride bucket-keyed windows; the only
        SinglePartition window allowed is the buckets-row offset side
        frame (bounded), mirroring global_row_numbers' contract."""
        from recover_spark.quality.drift import ks_drift

        base = spark.range(0, 5000).selectExpr("CAST(id AS DOUBLE) AS v")
        cur = spark.range(0, 5000).selectExpr("CAST(id + 9 AS DOUBLE) AS v")
        plan = (
            ks_drift(base, cur, ["v"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # per-value cumsums partition on the bucket column
        assert "__bucket" in plan


class TestReferentialIntegrity:
    def test_orphans_nulls_and_clean_fk(self, spark):
        from recover_spark.quality.expectations import referential_integrity

        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        child = spark.createDataFrame(
            [(1,), (1,), (2,), (9,), (None,)], "fk long"
        )
        row = referential_integrity(
            child, parent, ["fk"], ["pk"], check_name="t"
        ).collect()[0]
        assert row["check"] == "t"
        assert row["n_child"] == 5
        assert row["n_null_keys"] == 1
        assert row["n_orphans"] == 1          # the 9; nulls skipped
        assert abs(row["orphan_share"] - 0.25) < 1e-9
        # clean key: zero orphans
        clean = referential_integrity(
            child.filter("fk IN (1, 2)"), parent, ["fk"], ["pk"]
        ).collect()[0]
        assert clean["n_orphans"] == 0 and clean["orphan_share"] == 0.0

    def test_composite_key_and_duplicate_parents(self, spark):
        from recover_spark.quality.expectations import referential_integrity

        parent = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], "k1 long, k2 string"
        )  # duplicate parent rows must not multiply matches
        child = spark.createDataFrame(
            [(1, "a"), (2, "b"), (1, "b"), (None, "a")],
            "k1 long, k2 string",
        )
        row = referential_integrity(
            child, parent, ["k1", "k2"]
        ).collect()[0]
        assert row["n_child"] == 4
        assert row["n_null_keys"] == 1   # ANY null key skips the row
        assert row["n_orphans"] == 1     # (1, "b")


class TestKsDriftByPeriod:
    def test_drifted_period_scores_and_matches_reference(self, spark):
        import bisect
        import random

        from recover_spark.quality.drift import ks_drift_by_period

        rng = random.Random(4)
        base_vals = [round(rng.gauss(50, 10), 2) for _ in range(500)]
        p_ok = [round(rng.gauss(50, 10), 2) for _ in range(200)]
        p_bad = [round(rng.gauss(75, 10), 2) for _ in range(200)]
        base = spark.createDataFrame([(v,) for v in base_vals], "v double")
        cur = spark.createDataFrame(
            [("w1", v) for v in p_ok] + [("w2", v) for v in p_bad],
            "wk string, v double",
        )
        n_grid = 10
        got = {
            (r["period"], r["column"]): r
            for r in ks_drift_by_period(
                base, cur, ["v"], "wk", n_grid=n_grid,
                edge_accuracy=None,
            ).collect()
        }
        # python reference: exact interpolated edges -> grid KS
        import numpy as np

        edges = [
            round(float(np.percentile(base_vals, 100 * i / n_grid,
                                      method="linear")), 9)
            for i in range(1, n_grid)
        ]

        def grid_ks(pvals):
            nb, np_ = len(base_vals), len(pvals)
            best = 0
            for i in range(n_grid):
                cb = sum(
                    1 for v in base_vals
                    if sum(1 for e in edges if e <= v) <= i
                )
                cp = sum(
                    1 for v in pvals
                    if sum(1 for e in edges if e <= v) <= i
                )
                best = max(best, abs(cb * np_ - cp * nb))
            return best / (nb * np_)

        for wk, pvals in (("w1", p_ok), ("w2", p_bad)):
            r = got[(wk, "v")]
            assert abs(r["ks_grid"] - grid_ks(pvals)) < 5.1e-7, wk
            assert r["n_base"] == 500 and r["n_cur"] == 200
        assert got[("w2", "v")]["ks_grid"] > 0.5   # the shift screams
        assert got[("w1", "v")]["ks_grid"] < 0.15  # the stable week not

        # grid statistic lower-bounds the exact two-sample KS
        sb = sorted(base_vals)

        def exact_ks(pvals):
            sp = sorted(pvals)
            pts = sorted(set(sb) | set(sp))
            nb, np_ = len(sb), len(sp)
            return max(
                abs(bisect.bisect_right(sb, p) * np_
                    - bisect.bisect_right(sp, p) * nb)
                for p in pts
            ) / (nb * np_)

        for wk, pvals in (("w1", p_ok), ("w2", p_bad)):
            assert got[(wk, "v")]["ks_grid"] <= exact_ks(pvals) + 5.1e-7

    def test_empty_bins_and_multi_column(self, spark):
        from recover_spark.quality.drift import ks_drift_by_period

        base = spark.createDataFrame(
            [(float(i % 20), float(i)) for i in range(100)],
            "a double, b double",
        )
        # period p2's `a` values all land in ONE bin (gaps everywhere
        # else): the dense frame must keep cumsums aligned
        cur = spark.createDataFrame(
            [("p1", float(i % 20), float(i)) for i in range(50)]
            + [("p2", 3.0, float(i)) for i in range(50)],
            "wk string, a double, b double",
        )
        got = {
            (r["period"], r["column"]): r["ks_grid"]
            for r in ks_drift_by_period(
                base, cur, ["a", "b"], "wk", n_grid=5,
                edge_accuracy=None,
            ).collect()
        }
        assert len(got) == 4
        assert got[("p2", "a")] > got[("p1", "a")]
        assert got[("p1", "a")] < 0.1


class TestJsDrift:
    """js_drift (quality/drift.py): JS divergence in bits + Hellinger
    on the PSI binning, pinned against a direct numpy reference."""

    @staticmethod
    def _np_reference(xs, ys, n_bins):
        import numpy as np

        edges = np.round(
            np.quantile(
                np.asarray(xs), [i / n_bins for i in range(1, n_bins)],
                method="linear",
            ),
            9,
        )
        # bin = count of edges <= value (ties go right, matching the
        # operator's `edge <= value` bucketing)
        bx = np.array([int((edges <= v).sum()) for v in xs])
        by = np.array([int((edges <= v).sum()) for v in ys])
        p = np.bincount(bx, minlength=n_bins) / len(xs)
        q = np.bincount(by, minlength=n_bins) / len(ys)
        m = (p + q) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            tp = np.where(p > 0, p * np.log2(p / m), 0.0)
            tq = np.where(q > 0, q * np.log2(q / m), 0.0)
        js = float((tp + tq).sum() / 2)
        hell = float(np.sqrt(max(0.0, 1 - np.sqrt(p * q).sum())))
        return js, hell

    def test_matches_numpy_and_bounds(self, spark):
        import numpy as np

        from recover_spark.quality.drift import js_drift

        rng = np.random.default_rng(11)
        xs = rng.normal(50, 10, 400).tolist()
        ys = rng.normal(62, 10, 300).tolist()
        base = spark.createDataFrame([(v,) for v in xs], "v double")
        cur = spark.createDataFrame([(v,) for v in ys], "v double")
        row = js_drift(base, cur, ["v"], n_bins=8, edge_accuracy=None).collect()[0]
        want_js, want_h = self._np_reference(xs, ys, 8)
        assert abs(row["js"] - want_js) < 5.1e-7
        assert abs(row["hellinger"] - want_h) < 5.1e-7
        assert 0.0 <= row["js"] <= 1.0 and 0.0 <= row["hellinger"] <= 1.0

    def test_identity_zero_and_disjoint_one(self, spark):
        from recover_spark.quality.drift import js_drift

        xs = [float(i) for i in range(100)]
        base = spark.createDataFrame([(v,) for v in xs], "v double")
        same = js_drift(base, base, ["v"], n_bins=10, edge_accuracy=None)
        r = same.collect()[0]
        assert r["js"] == 0.0 and r["hellinger"] == 0.0
        # total shift: every current value lands in the top baseline
        # bin — JS/Hellinger approach their numpy reference for that
        # maximal-concentration shape (exactly 1 is unreachable under
        # baseline-quantile binning: every bin holds baseline mass)
        cur = spark.createDataFrame([(v + 1e6,) for v in xs], "v double")
        d = js_drift(base, cur, ["v"], n_bins=10, edge_accuracy=None).collect()[0]
        want_js, want_h = self._np_reference(xs, [v + 1e6 for v in xs], 10)
        assert abs(d["js"] - want_js) < 5.1e-7
        assert abs(d["hellinger"] - want_h) < 5.1e-7
        assert d["js"] > 0.7 and d["hellinger"] > 0.7
        assert d["js"] <= 1.0 and d["hellinger"] <= 1.0

    def test_empty_side_yields_null(self, spark):
        from recover_spark.quality.drift import js_drift

        base = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        empty = spark.createDataFrame([], "v double")
        rows = js_drift(base, empty, ["v"], edge_accuracy=None).collect()
        assert len(rows) == 1
        assert rows[0]["js"] is None and rows[0]["hellinger"] is None


class TestBenfordScreen:
    """benford_screen (quality/drift.py): first-digit conformance
    pinned against a direct numpy reference."""

    @staticmethod
    def _ref(vals):
        import numpy as np

        v = np.abs(np.asarray(vals, dtype=float))
        v = v[v > 0]
        digits = np.floor(v / 10.0 ** np.floor(np.log10(v))).astype(int)
        o = np.bincount(digits, minlength=10)[1:10]
        n = o.sum()
        share = o / n
        expect = np.log10(1 + 1 / np.arange(1, 10))
        chi2 = float((((share - expect) ** 2) / expect * n).sum())
        mad = float(np.abs(share - expect).mean())
        return chi2, mad, float(share[0]), int(n)

    def test_conforming_vs_bounded_uniform(self, spark):
        import math

        # log-uniform magnitudes follow Benford closely; bounded
        # uniform integers (1..50) legitimately fail the screen
        conforming = [10 ** ((i * 37 % 1000) / 250.0) for i in range(1000)]
        uniform = [float(i % 50 + 1) for i in range(1000)]
        rows = [("conf", v) for v in conforming] + [
            ("unif", v) for v in uniform
        ]
        df = spark.createDataFrame(rows, "tag string, v double")
        from recover_spark.quality.drift import benford_screen

        got = {
            r["column"]: r
            for r in benford_screen(
                df.filter("tag = 'conf'").select("v"), ["v"]
            ).collect()
        }
        chi2, mad, d1, n = self._ref(conforming)
        assert abs(got["v"]["chi2_mag"] - math.log10(chi2 + 1)) < 5.1e-5
        assert abs(got["v"]["digit_mad"] - mad) < 5.1e-6
        assert abs(got["v"]["share_d1"] - d1) < 5.1e-6
        assert got["v"]["n"] == n
        assert got["v"]["digit_mad"] < 0.015   # the auditors' bar

        bad = benford_screen(
            df.filter("tag = 'unif'").select("v"), ["v"]
        ).collect()[0]
        assert bad["digit_mad"] > 0.03         # bounded uniform fails

    def test_zero_null_excluded_and_guard(self, spark):
        import pytest as _pytest

        from recover_spark.quality.drift import benford_screen

        df = spark.createDataFrame(
            [(0.0,), (None,), (123.0,), (950.0,), (-20.0,)], "v double"
        )
        row = benford_screen(df, ["v"]).collect()[0]
        # 123 -> 1, 950 -> 9, |-20| -> 2; zero and NULL carry no digit
        assert row["n"] == 3
        assert abs(row["share_d1"] - 1 / 3) < 5.1e-6
        with _pytest.raises(ValueError, match="non-empty"):
            benford_screen(df, [])
