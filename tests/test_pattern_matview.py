"""Streaming row-pattern matview (streaming/matview.py:
merge_sequence_state / read_pattern_matview): batch-split invariance,
read == the batch operator, crash-replay idempotence, and the
unmapped/max_sequence merge guards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ALPHABET = {"view": "v", "click": "c", "purchase": "p",
            "signup": "s", "error": "e"}
PATTERNS = {"conversions": "vc*p", "error_recoveries": "e+c",
            "signup_conversions": "s[^p]*p"}


def _events(spark):
    from __spark_entry__ import _load

    return _load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )


def _merge(spark, batch, state, batch_id, **kw):
    from recover_spark.streaming.matview import merge_sequence_state

    merge_sequence_state(
        spark, batch, state, "user_id", "ts", "event_type", ALPHABET,
        tiebreakers=["event_id"], batch_id=batch_id, **kw
    )


class TestPatternMatview:
    def test_read_equals_batch_operator_any_split(self, spark, tmp_path):
        from recover_spark.operators.temporal import sequence_pattern_counts
        from recover_spark.streaming.matview import read_pattern_matview

        ev = _events(spark)
        batch_ref = {
            tuple(r)
            for r in sequence_pattern_counts(
                ev, "user_id", "ts", "event_type", PATTERNS, ALPHABET,
                tiebreakers=["event_id"],
            ).collect()
        }
        # split by event_id parity + remainder — deliberately NOT in
        # ts order, so the merge sees out-of-order arrival
        state = str(tmp_path / "state")
        for i, cond in enumerate(
            [F.col("event_id") % 3 == 0, F.col("event_id") % 3 == 1,
             F.col("event_id") % 3 == 2]
        ):
            _merge(spark, ev.filter(cond), state, batch_id=i)
        got = {
            tuple(r)
            for r in read_pattern_matview(
                spark, state, "user_id", PATTERNS
            ).collect()
        }
        assert got == batch_ref

    def test_crash_replay_idempotent(self, spark, tmp_path):
        from recover_spark.streaming.matview import read_pattern_matview

        ev = _events(spark)
        state = str(tmp_path / "state")
        b0 = ev.filter(F.col("event_id") % 2 == 0)
        b1 = ev.filter(F.col("event_id") % 2 == 1)
        _merge(spark, b0, state, batch_id=0)
        _merge(spark, b1, state, batch_id=1)
        once = sorted(
            map(tuple, read_pattern_matview(
                spark, state, "user_id", PATTERNS).collect())
        )
        # at-least-once replay of batch 1 must be skipped
        _merge(spark, b1, state, batch_id=1)
        again = sorted(
            map(tuple, read_pattern_matview(
                spark, state, "user_id", PATTERNS).collect())
        )
        assert again == once

    def test_crash_window_heals(self, spark, tmp_path):
        from recover_spark.streaming.matview import read_pattern_matview

        ev = _events(spark)
        state = str(tmp_path / "state")
        b0 = ev.filter(F.col("event_id") % 2 == 0)
        b1 = ev.filter(F.col("event_id") % 2 == 1)
        _merge(spark, b0, state, batch_id=0)
        os.rename(state, state + ".old")
        _merge(spark, b1, state, batch_id=1)
        n = read_pattern_matview(spark, state, "user_id", PATTERNS).count()
        assert n == ev.select("user_id").distinct().count()
        assert not os.path.exists(state + ".old")

    def test_unmapped_type_raises_at_merge(self, spark, tmp_path):
        ev = _events(spark)
        state = str(tmp_path / "state")
        from recover_spark.streaming.matview import merge_sequence_state

        partial = {k: v for k, v in ALPHABET.items() if k != "error"}
        with pytest.raises(Exception, match="unmapped event type"):
            merge_sequence_state(
                spark, ev, state, "user_id", "ts", "event_type", partial,
                tiebreakers=["event_id"], batch_id=0,
            )
        assert not os.path.exists(state)  # nothing written

    def test_max_sequence_guard_at_merge(self, spark, tmp_path):
        ev = _events(spark)
        state = str(tmp_path / "state")
        with pytest.raises(Exception, match="max_sequence"):
            _merge(spark, ev, state, batch_id=0, max_sequence=3)
