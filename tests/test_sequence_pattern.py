"""MATCH_RECOGNIZE-style row-pattern matching
(operators/temporal.py:sequence_pattern_counts): counts vs an
independent Python `re` reference, ordering/tiebreak determinism, the
unmapped-type and max_sequence refuse-to-degrade guards."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

ALPHABET = {"view": "v", "click": "c", "purchase": "p",
            "signup": "s", "error": "e"}
PATTERNS = {"conversions": "vc*p", "error_recoveries": "e+c",
            "signup_conversions": "s[^p]*p"}


def _events(spark):
    from __spark_entry__ import _load

    return _load(spark, "/root/testdata/sf0.001", "events")


class TestSequencePatternCounts:
    def test_counts_match_python_re(self, spark):
        from recover_spark.operators.temporal import sequence_pattern_counts

        ev = _events(spark)
        rows = sequence_pattern_counts(
            ev, "user_id", "ts", "event_type", PATTERNS, ALPHABET,
            tiebreakers=["event_id"],
        ).collect()
        raw = ev.select("user_id", "ts", "event_id", "event_type").collect()
        seqs: dict = {}
        for r in sorted(raw, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            seqs.setdefault(r["user_id"], []).append(ALPHABET[r["event_type"]])
        assert rows
        for r in rows:
            s = "".join(seqs[r["user_id"]])
            assert r["n_events"] == len(s)
            for name, rx in PATTERNS.items():
                assert r[name] == len(re.findall(rx, s)), (
                    r["user_id"], name, s
                )

    def test_deterministic_across_partitionings(self, spark):
        from recover_spark.operators.temporal import sequence_pattern_counts

        ev = _events(spark)
        a = sequence_pattern_counts(
            ev, "user_id", "ts", "event_type", PATTERNS, ALPHABET,
            tiebreakers=["event_id"],
        ).collect()
        b = sequence_pattern_counts(
            ev.repartition(13), "user_id", "ts", "event_type", PATTERNS,
            ALPHABET, tiebreakers=["event_id"],
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_unmapped_type_raises(self, spark):
        from recover_spark.operators.temporal import sequence_pattern_counts

        ev = _events(spark)
        partial = {k: v for k, v in ALPHABET.items() if k != "error"}
        with pytest.raises(Exception, match="unmapped event type"):
            sequence_pattern_counts(
                ev, "user_id", "ts", "event_type", PATTERNS, partial,
                tiebreakers=["event_id"],
            ).collect()

    def test_max_sequence_guard(self, spark):
        from recover_spark.operators.temporal import sequence_pattern_counts

        ev = _events(spark)
        with pytest.raises(Exception, match="max_sequence"):
            sequence_pattern_counts(
                ev, "user_id", "ts", "event_type", PATTERNS, ALPHABET,
                tiebreakers=["event_id"], max_sequence=3,
            ).collect()

    def test_param_guards(self, spark):
        from recover_spark.operators.temporal import sequence_pattern_counts

        ev = _events(spark)
        with pytest.raises(ValueError, match="patterns"):
            sequence_pattern_counts(ev, "user_id", "ts", "event_type",
                                    {}, ALPHABET)
        with pytest.raises(ValueError, match="single character"):
            sequence_pattern_counts(
                ev, "user_id", "ts", "event_type", PATTERNS,
                {"view": "vv"},
            )
