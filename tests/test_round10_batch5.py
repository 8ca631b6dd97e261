"""Round-10 fifth batch: functional_dependencies
(quality/expectations.py) and iqr_outliers (operators/analytics.py).
"""

import pytest
from pyspark.sql import functions as F


class TestFunctionalDependencies:
    def test_holds_and_violations(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        # device -> firmware holds; firmware -> device violated (fw1
        # maps to d1 and d2); user determines neither
        df = spark.createDataFrame(
            [("d1", "fw1", "u1"), ("d1", "fw1", "u2"),
             ("d2", "fw1", "u1"), ("d3", "fw2", "u3")],
            "device string, fw string, user string",
        )
        got = {
            (r["determinant"], r["dependent"]): r
            for r in functional_dependencies(
                df, ["device", "fw", "user"]
            ).collect()
        }
        assert len(got) == 6  # ordered pairs of 3 cols
        assert got[("device", "fw")]["holds"] is True
        assert got[("device", "fw")]["n_violating"] == 0
        assert got[("fw", "device")]["holds"] is False
        assert got[("fw", "device")]["n_violating"] == 1
        assert got[("device", "user")]["holds"] is False

    def test_null_semantics(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        # NULL key rows excluded; NULL dependent counts as a value
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), (None, "y")],
            "k string, v string",
        )
        got = {
            (r["determinant"], r["dependent"]): r
            for r in functional_dependencies(df, ["k", "v"]).collect()
        }
        r = got[("k", "v")]
        assert r["n_keys"] == 1
        assert r["holds"] is False  # a -> {x, NULL} is not a function

    def test_guard(self, spark):
        from recover_spark.quality.expectations import (
            functional_dependencies,
        )

        df = spark.range(3).selectExpr("id AS a")
        with pytest.raises(ValueError, match=">= 2"):
            functional_dependencies(df, ["a"])


class TestIqrOutliers:
    def test_tukey_fences(self, spark):
        from recover_spark.operators.analytics import iqr_outliers

        # 1..8 plus 100: q25 (type-1, n=9) = 3rd value = 3,
        # q75 = 7th value = 7, IQR 4 -> fences [-3, 13]
        vals = [float(v) for v in range(1, 9)] + [100.0]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v double"
        )
        rows = {r["v"]: r for r in iqr_outliers(df, ["g"], "v").collect()}
        assert rows[100.0]["is_outlier"] is True
        assert all(
            rows[float(v)]["is_outlier"] is False for v in range(1, 9)
        )
        assert rows[1.0]["lo_fence"] == -3.0
        assert rows[1.0]["hi_fence"] == 13.0

    def test_nulls_and_rows_preserved(self, spark):
        from recover_spark.operators.analytics import iqr_outliers

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)],
            "g string, v double",
        )
        out = iqr_outliers(df, ["g"], "v")
        assert out.count() == 4
        assert (
            out.filter(F.col("v").isNull())
            .select("is_outlier")
            .collect()[0][0]
            is None
        )


class TestReadability:
    def test_hand_counts(self, spark):
        from recover_spark.ops.text_analysis import readability

        # "The cat sat. It ran!" -> 5 words, 2 sentences, 5 vowel
        # groups (e, a, a, i, a)
        df = spark.createDataFrame(
            [(1, "The cat sat. It ran!")], "doc_id long, text string"
        )
        row = readability(df, ["doc_id"], "text").collect()[0]
        assert row["n_words"] == 5
        assert row["n_sentences"] == 2
        assert row["n_syllables"] == 5
        flesch = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
        fk = 0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59
        assert row["flesch_ease"] == pytest.approx(flesch, abs=5.1e-6)
        assert row["fk_grade"] == pytest.approx(fk, abs=5.1e-6)

    def test_empty_doc_null_scores(self, spark):
        from recover_spark.ops.text_analysis import readability

        df = spark.createDataFrame(
            [(1, "...")], "doc_id long, text string"
        )
        row = readability(df, ["doc_id"], "text").collect()[0]
        assert row["n_words"] == 0
        assert row["flesch_ease"] is None and row["fk_grade"] is None

    def test_map_only_plan(self, spark):
        from recover_spark.ops.text_analysis import readability

        df = spark.createDataFrame(
            [(1, "words here")], "doc_id long, text string"
        )
        plan = (
            readability(df, ["doc_id"], "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestGapDetect:
    def test_known_gaps(self, spark):
        from recover_spark.operators.temporal import gap_detect

        # key a: hours 0, 1, 4, 5, 9 -> gaps [2,4) and [6,9)
        rows = [("a", h) for h in (0, 1, 4, 5, 9)] + [("b", 3)]
        df = spark.createDataFrame(
            [(k, h * 3600 * 1_000_000) for k, h in rows],
            "k string, us long",
        ).selectExpr("k", "timestamp_micros(us) AS ts")
        got = [
            (r["k"], r["gap_start"], r["gap_end"], r["n_missing"])
            for r in gap_detect(df, "k", "ts", 3600).collect()
        ]
        assert got == [
            ("a", 2 * 3600, 4 * 3600, 2),
            ("a", 6 * 3600, 9 * 3600, 3),
        ]  # b spans one bucket: no gaps, absent

    def test_duplicate_observations_collapse(self, spark):
        from recover_spark.operators.temporal import gap_detect

        df = spark.createDataFrame(
            [("a", 0), ("a", 10), ("a", 2 * 3600 * 1_000_000)],
            "k string, us long",
        ).selectExpr("k", "timestamp_micros(us) AS ts")
        got = gap_detect(df, "k", "ts", 3600).collect()
        assert len(got) == 1
        assert got[0]["gap_start"] == 3600 and got[0]["n_missing"] == 1


class TestAudioFrameEnergy:
    def _wav(self, samples, rate=8000):
        import struct

        import numpy as np

        data = np.asarray(samples, dtype="<i2").tobytes()
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def test_known_rms_and_silence(self, spark):
        import math

        from recover_spark.ops.multimodal import audio_frame_energy

        # frame 0: constant 400 -> rms 400 (silent at 1000 threshold);
        # frame 1: constant 20000 -> loud; partial frame 2: one sample
        samples = [400] * 400 + [20000] * 400 + [20000]
        df = spark.createDataFrame(
            [(1, bytearray(self._wav(samples)))],
            "media_id long, content binary",
        )
        rows = {
            r["frame_idx"]: r
            for r in audio_frame_energy(df, frame_ms=50).collect()
        }
        assert rows[0]["rms"] == 400.0 and rows[0]["is_silence"] is True
        assert rows[1]["rms"] == 20000.0
        assert rows[1]["is_silence"] is False
        assert rows[2]["n_samples"] == 1
        assert rows[2]["rms"] == 20000.0

    def test_malformed_and_stereo_raise(self, spark):
        import struct

        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        from recover_spark.ops.multimodal import audio_frame_energy

        bad = spark.createDataFrame(
            [(1, bytearray(b"not a wav"))],
            "media_id long, content binary",
        )
        with _pytest.raises((PythonException, Py4JJavaError)):
            audio_frame_energy(bad).collect()
        stereo_hdr = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
            + b"data" + struct.pack("<I", 0)
        )
        st = spark.createDataFrame(
            [(1, bytearray(stereo_hdr))], "media_id long, content binary"
        )
        with _pytest.raises((PythonException, Py4JJavaError)):
            audio_frame_energy(st).collect()
