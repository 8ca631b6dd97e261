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
