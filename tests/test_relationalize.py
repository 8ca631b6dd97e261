"""N1-N3 golden tests, mirroring tests/test_json_to_parquet.py:810-906
(has_nested_fields, relationalize + add_index_to_table)."""

from pyspark.sql import functions as F

from recover_spark.operators import (
    add_index_to_child,
    has_nested_fields,
    relationalize,
)


def _nested(spark):
    return spark.createDataFrame(
        [
            (
                "123456789",
                [{"filename": "test.json", "timestamp": "999"}],
                {"filename": "f.json", "timestamp": "111"},
                "2023-01-12T00:00:00",
                "adults_v1",
            )
        ],
        "GlobalKey string, "
        "ArrayOfObjectsField array<struct<filename:string,timestamp:string>>, "
        "ObjectField struct<filename:string,timestamp:string>, "
        "export_end_date string, cohort string",
    )


def test_has_nested_fields(spark):
    assert has_nested_fields(_nested(spark).schema)
    flat = spark.createDataFrame([("a", 1)], "x string, y int")
    assert not has_nested_fields(flat.schema)


def test_relationalize_parent_flattens_structs(spark):
    frames = relationalize(
        _nested(spark), "testnesteddatatype", carry_cols=["GlobalKey", "cohort"]
    )
    parent = frames["testnesteddatatype"]
    # FIXTURES.md §3 golden: ObjectField -> ObjectField_filename/_timestamp,
    # array column removed from the parent.
    assert "ObjectField_filename" in parent.columns
    assert "ObjectField_timestamp" in parent.columns
    assert "ArrayOfObjectsField" not in parent.columns
    row = parent.collect()[0]
    assert row.ObjectField_filename == "f.json"
    assert row.ObjectField_timestamp == "111"


def test_relationalize_child_carries_keys(spark):
    frames = relationalize(
        _nested(spark), "testnesteddatatype", carry_cols=["GlobalKey", "cohort"]
    )
    child = frames["testnesteddatatype_arrayofobjectsfield"]
    rows = child.collect()
    assert len(rows) == 1
    r = rows[0]
    # FIXTURES.md §3 golden child row.
    assert r.filename == "test.json"
    assert r.timestamp == "999"
    assert r.GlobalKey == "123456789"
    assert r.cohort == "adults_v1"
    assert r["index"] == 0  # r.index would resolve to Row.index method


def test_relationalize_nested_array_of_arrays(spark):
    df = spark.createDataFrame(
        [("k1", [{"inner": [1, 2]}, {"inner": [3]}])],
        "GlobalKey string, Outer array<struct<inner:array<int>>>",
    )
    frames = relationalize(df, "t", carry_cols=["GlobalKey"])
    assert set(frames) == {"t", "t_outer", "t_outer_inner"}
    grandchild = frames["t_outer_inner"].collect()
    vals = sorted((r.GlobalKey, r["index"], r.inner) for r in grandchild)
    # grandchild keeps ancestor key; index is position in the inner array
    assert [v[2] for v in vals] == [1, 2, 3]


def test_relationalize_name_collision_fallback(spark):
    # element field that collides with a carried column keeps long name
    df = spark.createDataFrame(
        [("k1", [{"GlobalKey": "inner"}])],
        "GlobalKey string, Arr array<struct<GlobalKey:string>>",
    )
    frames = relationalize(df, "t", carry_cols=["GlobalKey"])
    child = frames["t_arr"]
    assert "Arr_val_GlobalKey" in child.columns
    r = child.collect()[0]
    assert r.GlobalKey == "k1"
    assert r.Arr_val_GlobalKey == "inner"


def test_add_index_to_child_join_path(spark):
    # J2 parity path: child keyed by synthetic id re-joined to parent.
    parent = spark.createDataFrame(
        [(10, "p1", "adults_v1"), (20, "p2", "pediatric_v1")],
        "fk long, ParticipantIdentifier string, cohort string",
    )
    child = spark.createDataFrame(
        [(10, 0, "a"), (10, 1, "b"), (20, 0, "c")],
        "id long, index int, val string",
    )
    out = add_index_to_child(
        child, parent, index_fields=["ParticipantIdentifier"], fk_col="fk"
    )
    rows = {(r.ParticipantIdentifier, r.val) for r in out.collect()}
    assert rows == {("p1", "a"), ("p1", "b"), ("p2", "c")}
    assert "cohort" in out.columns
