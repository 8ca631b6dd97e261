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
