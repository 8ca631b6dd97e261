"""W1 golden tests, mirroring the reference's
tests/test_json_to_parquet.py:779-808 (drop_table_duplicates)."""

import pytest

from recover_spark.operators import dedup_latest


def test_dedup_by_export_end_date(spark):
    # FIXTURES.md §1: keep row with max export_end_date per GlobalKey.
    df = spark.createDataFrame(
        [
            ("123456789", "2023-05-12T00:00:00", "adults_v1"),
            ("123456789", "2023-06-12T00:00:00", "adults_v1"),
        ],
        "GlobalKey string, export_end_date string, cohort string",
    )
    out = dedup_latest(df, ["GlobalKey"]).collect()
    assert len(out) == 1
    assert out[0].export_end_date == "2023-06-12T00:00:00"


def test_dedup_inserted_date_priority(spark):
    # FIXTURES.md §2: order by InsertedDate desc then export_end_date desc.
    rows = [
        ("k1", "John", "Chicago", "2023-02-01", "2023-01-01"),
        ("k1", "John_old", "NYC", "2023-01-01", "2023-09-01"),
        ("k2", "Jane", "San Francisco", "2023-03-01", "2023-01-01"),
        ("k3", "Bob", "Tucson_old", "2023-01-01", "2023-01-01"),
        ("k3", "Bob_2", "Tucson", "2023-01-02", "2023-01-01"),
    ]
    df = spark.createDataFrame(
        rows,
        "GlobalKey string, name string, city string, "
        "InsertedDate string, export_end_date string",
    )
    out = {r.GlobalKey: r.name for r in dedup_latest(df, ["GlobalKey"]).collect()}
    # InsertedDate wins even when export_end_date says otherwise (k1).
    assert out == {"k1": "John", "k2": "Jane", "k3": "Bob_2"}


def test_dedup_composite_key(spark):
    df = spark.createDataFrame(
        [
            ("p1", "s1", "2023-01-01", 1),
            ("p1", "s1", "2023-02-01", 2),
            ("p1", "s2", "2023-01-01", 3),
            ("p2", "s1", "2023-01-01", 4),
        ],
        "ParticipantIdentifier string, SampleKey string, "
        "export_end_date string, v int",
    )
    out = dedup_latest(df, ["ParticipantIdentifier", "SampleKey"]).collect()
    assert {r.v for r in out} == {2, 3, 4}


def test_dedup_requires_keys(spark):
    df = spark.createDataFrame([("a", "b")], "x string, export_end_date string")
    with pytest.raises(ValueError):
        dedup_latest(df, [])


def test_dedup_no_order_column_raises(spark):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError):
        dedup_latest(df, ["x"])
