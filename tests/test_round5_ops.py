"""Round-5 regression suite: advisor findings + verdict follow-ups.

Covers:
- exact integer bucketing in scale_to_bits past the double-precision
  window (epoch-micros-sized spans),
- crash-safe matview state swap (recovery from the mid-swap window),
- bloom candidate-flag robustness against user columns named
  ``mask`` / ``word_idx``,
- rejection of non-deterministic compaction predicates,
- length-band prefilter in blocked record linkage (provably identical
  pair set, verified against brute force).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# -- scale_to_bits exactness beyond 2**53 -----------------------------------


class TestScaleToBitsExact:
    def test_matches_integer_division_at_epoch_micros_span(self, spark):
        """span ~ 2**45 (an epoch-micros year is ~2**44.8): the numerator
        (v-lo)*2*levels + span exceeds 2**53, where the previous
        double-division path could land one bucket off.  The exact
        contract is the pure-integer formula."""
        from recover_spark.functions.layout import scale_to_bits

        bits = 16
        levels = (1 << bits) - 1
        lo, hi = 0, (1 << 45) + 1  # odd span: worst case for doubles
        span = hi - lo
        # values spread across the range incl. both edges and
        # near-boundary points
        vals = [lo, hi, hi - 1, span // 2, span // 3, span // 7,
                (span // 65536) * 12345 + 17, hi - span // 65537]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r.v: r.bucket
            for r in df.select(
                "v",
                scale_to_bits(
                    F.col("v"), F.lit(lo), F.lit(hi), bits
                ).alias("bucket"),
            ).collect()
        }
        for v in vals:
            want = ((v - lo) * 2 * levels + span) // (2 * span)
            assert got[v] == want, f"v={v}: got {got[v]}, want {want}"
        assert got[lo] == 0 and got[hi] == levels

    def test_degenerate_span_maps_to_zero(self, spark):
        from recover_spark.functions.layout import scale_to_bits

        df = spark.createDataFrame([(5,)], "v long")
        assert df.select(
            scale_to_bits(F.col("v"), F.lit(5), F.lit(5), 8).alias("b")
        ).first().b == 0


# -- crash-safe matview state swap ------------------------------------------


class TestMatviewCrashSafety:
    def test_recovery_from_mid_swap_crash(self, spark, tmp_path):
        """Simulate a crash between the two swap renames (live state
        moved aside, new generation not yet promoted): the next merge
        must recover the old generation and re-apply the failed batch,
        converging to the same totals as a crash-free run."""
        from recover_spark.streaming.matview import merge_counts

        state = str(tmp_path / "state")
        b0 = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
        )
        b1 = spark.createDataFrame([("a", 10), ("c", 5)], "k string, v long")
        merge_counts(spark, b0, state, ["k"], "v", batch_id=0)

        # crash window: batch 1's swap moved state aside and died before
        # promoting the new generation (tmp may or may not exist)
        os.rename(state, state + ".old")
        assert not os.path.exists(state)

        # at-least-once replay of batch 1 heals and applies
        merge_counts(spark, b1, state, ["k"], "v", batch_id=1)
        got = {
            r.k: (r.n_rows, r.sum_v)
            for r in spark.read.parquet(state).collect()
        }
        assert got == {"a": (3, 13), "b": (1, 3), "c": (1, 5)}
        assert not os.path.exists(state + ".old")

    def test_recovery_before_sketch_read(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_distinct_sketches,
            read_distinct_matview,
        )

        state = str(tmp_path / "sketch_state")
        batch = spark.createDataFrame(
            [("g", i % 5) for i in range(50)], "g string, u long"
        )
        merge_distinct_sketches(spark, batch, state, ["g"], "u", batch_id=0)
        before = read_distinct_matview(spark, state).first().approx_distinct
        os.rename(state, state + ".old")
        after = read_distinct_matview(spark, state).first().approx_distinct
        assert after == before


# -- bloom filter vs colliding user columns ---------------------------------


class TestBloomColumnCollisions:
    def test_user_mask_and_word_idx_columns_survive(self, spark):
        """A fact table that already has ``mask`` / ``word_idx`` columns
        must neither break the probe nor lose the columns; the result
        must equal the plain exact anti-join."""
        from recover_spark.operators.bloom import drop_deleted_filtered
        from recover_spark.operators.deletes import drop_deleted

        df = spark.createDataFrame(
            [(i, f"m{i}", i * 7, i % 3) for i in range(100)],
            "RecordID long, mask string, word_idx long, grp int",
        )
        deleted = spark.createDataFrame(
            [(i,) for i in range(0, 100, 10)], "RecordID long"
        )
        got = drop_deleted_filtered(df, deleted, ["RecordID"])
        want = drop_deleted(df, deleted, ["RecordID"], dedup_deleted=False)
        assert sorted(got.columns) == sorted(df.columns)
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in want.collect()
        }


# -- non-deterministic compaction predicate ---------------------------------


class TestCompactionDeterminismGuard:
    def test_rand_predicate_rejected_dataset_untouched(self, spark, tmp_path):
        from recover_spark.sources.writers import compact_partitions

        path = str(tmp_path / "t")
        spark.range(0, 100).select(
            (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("v")
        ).write.partitionBy("p").parquet(path)
        with pytest.raises(ValueError, match="deterministic"):
            compact_partitions(spark, path, ["p"], predicate="rand() < 0.5")
        assert spark.read.parquet(path).count() == 100

    def test_deterministic_partition_predicate_still_accepted(
        self, spark, tmp_path
    ):
        from recover_spark.sources.writers import compact_partitions

        path = str(tmp_path / "t")
        spark.range(0, 100).select(
            (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("v")
        ).write.partitionBy("p").parquet(path)
        compact_partitions(spark, path, ["p"], predicate="p = '0'")
        assert spark.read.parquet(path).count() == 100


# -- linkage length-band prefilter ------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestLinkageLengthBand:
    def test_pair_set_identical_to_brute_force(self, spark):
        """The length band is a necessary condition for edit distance
        <= d, so the banded join must return exactly the brute-force
        within-block pair set — including pairs whose lengths differ
        by exactly d and excluding nothing else."""
        from recover_spark.ops.linkage import blocked_link_pairs

        rows = [
            (1, "ACME CORP"), (2, "ACME CORPS"), (3, "ACME CO"),
            (4, "ACME CORPORATION"), (5, "ACME CORP."), (6, "ACME"),
            (7, "ZETA LLC"), (8, "ZETA LC"), (9, "ZETA L.L.C."),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        block = F.substring("name", 1, 4)
        d = 2
        got = {
            (r.id_a, r.id_b): r.distance
            for r in blocked_link_pairs(
                df, "id", "name", block, max_distance=d
            ).collect()
        }
        want = {}
        for i, (ia, na) in enumerate(rows):
            for ib, nb in rows[i + 1:]:
                if na[:4] == nb[:4]:
                    dist = _levenshtein(na, nb)
                    if dist <= d:
                        want[(ia, ib)] = dist
        assert got == want


# -- atomic dataset replace -------------------------------------------------


class TestAtomicDatasetReplace:
    """Crash injection at every protocol step: a reader must always
    resolve a COMPLETE generation — the copy-then-delete window of the
    reference (json_to_parquet.py:348-366) must not exist here."""

    def _df(self, spark, tag: str, n: int):
        return spark.range(0, n).select(
            F.lit(tag).alias("tag"),
            F.concat(F.lit("c"), F.col("id") % 3).alias("cohort"),
            F.col("id").alias("v"),
        )

    def _snapshot(self, spark, path):
        from recover_spark.sources.atomic import read_dataset

        df = read_dataset(spark, path)
        return {(r.tag, r.cohort, r.v) for r in df.collect()}

    def test_crash_at_every_step_never_tears_a_reader(self, spark, tmp_path):
        from recover_spark.sources.atomic import (
            CrashInjected,
            current_generation,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        a = self._df(spark, "a", 30)
        b = self._df(spark, "b", 40)
        want_a = {(r.tag, r.cohort, r.v) for r in a.collect()}
        want_b = {(r.tag, r.cohort, r.v) for r in b.collect()}

        write_dataset_atomic(a, path, partition_by=["cohort"], run_id="r1")
        assert self._snapshot(spark, path) == want_a

        # crash after staging write: old generation still live + complete
        with pytest.raises(CrashInjected):
            write_dataset_atomic(
                b, path, partition_by=["cohort"], run_id="r2",
                _fail_point="after-stage",
            )
        assert self._snapshot(spark, path) == want_a

        # crash after the gen rename, before promote: reader unaffected
        with pytest.raises(CrashInjected):
            write_dataset_atomic(
                b, path, partition_by=["cohort"], run_id="r2",
                _fail_point="after-rename",
            )
        assert self._snapshot(spark, path) == want_a

        # retry of the crashed run converges (idempotent staging cleanup)
        write_dataset_atomic(b, path, partition_by=["cohort"], run_id="r2")
        assert self._snapshot(spark, path) == want_b
        assert current_generation(path) is not None

    def test_crash_after_promote_is_benign(self, spark, tmp_path):
        from recover_spark.sources.atomic import (
            CrashInjected,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        write_dataset_atomic(self._df(spark, "a", 10), path, run_id="r1")
        with pytest.raises(CrashInjected):
            write_dataset_atomic(
                self._df(spark, "b", 10), path, run_id="r2",
                _fail_point="after-promote",
            )
        # pointer already swapped: the new generation is live and complete
        got = self._snapshot(spark, path)
        assert {t for (t, _, _) in got} == {"b"}

    def test_previous_generation_stays_readable_as_archive(
        self, spark, tmp_path
    ):
        from recover_spark.sources.atomic import (
            list_generations,
            read_dataset,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        g1 = write_dataset_atomic(self._df(spark, "a", 10), path, run_id="r1")
        write_dataset_atomic(self._df(spark, "b", 10), path, run_id="r2")
        old = read_dataset(spark, path, generation=g1)
        assert {r.tag for r in old.collect()} == {"a"}
        assert g1 in list_generations(path)

    def test_prune_keeps_live_plus_n(self, spark, tmp_path):
        from recover_spark.sources.atomic import (
            current_generation,
            list_generations,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        for i in range(5):
            write_dataset_atomic(
                self._df(spark, f"g{i}", 5), path,
                run_id=f"r{i}", keep_generations=2,
            )
        gens = list_generations(path)
        assert len(gens) == 3  # live + 2 archived
        assert current_generation(path) == gens[-1]


# -- schema evolution: LOG-and-coerce ---------------------------------------


class TestSchemaEvolution:
    """A later export adds a column and retypes another: the coerce must
    keep the output on the declared schema (reference resolveChoice
    match_catalog), and the drift must land in the audit ledger instead
    of vanishing (reference SchemaChangePolicy LOG,
    templates/glue-workflow.j2:147-166)."""

    def _declared(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("RecordID", T.StringType()),
                T.StructField("HeartRate", T.LongType()),
                T.StructField("StartDate", T.StringType()),
            ]
        )

    def test_drift_logged_and_output_on_declared_schema(self, spark):
        from recover_spark.functions.transforms import (
            cast_to_schema,
            cast_to_schema_logged,
        )

        # later export: HeartRate arrives as string (type change),
        # VendorNewField is brand new, StartDate stopped arriving
        raw = spark.createDataFrame(
            [("r1", "72", "extra"), ("r2", "bad", "extra2")],
            "RecordID string, HeartRate string, VendorNewField string",
        )
        declared = self._declared()
        out, ledger = cast_to_schema_logged(raw, declared, dataset="heartrate")

        assert [f.name for f in out.schema.fields] == [
            "RecordID", "HeartRate", "StartDate",
        ]
        assert dict(out.dtypes)["HeartRate"] == "bigint"
        got = {r.RecordID: (r.HeartRate, r.StartDate) for r in out.collect()}
        # coercible value casts, uncoercible -> null (try_cast), missing -> null
        assert got == {"r1": (72, None), "r2": (None, None)}

        drift = {
            (r.kind, r.column): (r.observed_type, r.declared_type)
            for r in ledger.collect()
        }
        assert drift == {
            ("new_column", "VendorNewField"): ("string", None),
            ("type_changed", "HeartRate"): ("string", "bigint"),
            ("missing_column", "StartDate"): (None, "string"),
        }
        assert all(r.dataset == "heartrate" for r in ledger.collect())

        # the coerced frame is exactly the un-logged S2 result
        plain = cast_to_schema(raw, declared)
        assert {tuple(r) for r in plain.collect()} == {
            tuple(r) for r in out.collect()
        }

    def test_no_drift_yields_empty_ledger(self, spark):
        from recover_spark.functions.transforms import cast_to_schema_logged

        raw = spark.createDataFrame(
            [("r1", 72, "2024-01-01")],
            "RecordID string, HeartRate long, StartDate string",
        )
        out, ledger = cast_to_schema_logged(raw, self._declared())
        assert ledger.count() == 0
        assert out.count() == 1

    def test_ledger_unions_into_audit_trail(self, spark):
        """Drift rows ride the same A6 unionByName(allowMissing) channel
        as the stage-count ledgers."""
        from recover_spark.functions.transforms import cast_to_schema_logged
        from recover_spark.operators.audit import union_ledgers

        raw = spark.createDataFrame(
            [("r1", "x")], "RecordID string, Extra string"
        )
        _, drift = cast_to_schema_logged(raw, self._declared(), "hr")
        counts = spark.createDataFrame(
            [("hr", "READ", 1)], "dataset string, stage string, n long"
        )
        merged = union_ledgers([counts, drift])
        assert merged.count() == drift.count() + 1
        assert "kind" in merged.columns and "stage" in merged.columns


# -- optional real multimodal decode ----------------------------------------


class TestMultimodalRealDecode:
    """Real kernels activate when PIL/ffmpeg are importable, raise
    cleanly otherwise; both paths share one output schema."""

    def _media(self, spark, blob: bytes):
        return spark.createDataFrame(
            [(1, blob, ("image/png", 4, 4, None))],
            "media_id long, content binary, "
            "meta struct<mime_type:string,width:int,height:int,duration_ms:bigint>",
        )

    def test_real_image_path_when_pil_present(self, spark):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        from PIL import Image

        from recover_spark.ops.multimodal import (
            IMAGE_FEATURE_SCHEMA,
            extract_image_features,
        )

        buf = io.BytesIO()
        Image.new("L", (8, 8), color=200).save(buf, format="PNG")
        df = self._media(spark, buf.getvalue())
        out = extract_image_features(df, feature_dim=16, decode_stub=False)
        assert out.schema == IMAGE_FEATURE_SCHEMA
        row = out.first()
        # a uniform gray image: every thumbnail pixel is 200 -> 200/127.5-1
        assert all(abs(v - (200 / 127.5 - 1.0)) < 1e-6 for v in row.feature)

    def test_real_paths_raise_cleanly_when_libs_absent(self, spark):
        from recover_spark.ops import multimodal as mm

        df = self._media(spark, b"\x89PNG fake")
        if not mm.pil_available():
            # non-PNM blob without PIL: the WORKER kernel raises per
            # blob (the driver no longer gates — the PNM fallback
            # means decode_stub=False is always launchable)
            with pytest.raises(Exception, match="PIL"):
                mm.extract_image_features(df, decode_stub=False).collect()
        if not mm.ffmpeg_available():
            # non-WAV blob without ffprobe: the WORKER kernel raises
            # per blob (the driver no longer gates — the WAV parser
            # means decode_stub=False is always launchable)
            with pytest.raises(Exception, match="ffprobe"):
                mm.sample_video_frames(df, decode_stub=False).collect()
            with pytest.raises(Exception, match="ffprobe"):
                mm.chunk_audio(df, decode_stub=False).collect()

    def test_real_frame_sampling_when_ffmpeg_present(self, spark):
        from recover_spark.ops import multimodal as mm

        if not mm.ffmpeg_available():
            pytest.skip("ffprobe not on PATH")
        import subprocess
        import tempfile

        # generate a 2-second silent wav via ffmpeg itself
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            subprocess.run(
                ["ffmpeg", "-y", "-f", "lavfi", "-i",
                 "anullsrc=r=8000:cl=mono", "-t", "2", f.name],
                capture_output=True, check=True,
            )
            blob = open(f.name, "rb").read()
        df = self._media(spark, blob)
        frames = mm.sample_video_frames(df, every_ms=500, decode_stub=False)
        assert [c for c in frames.columns] == [
            "media_id", "frame_ts_ms", "content_sha1",
        ]
        assert frames.count() == 4  # 2000ms / 500ms
        chunks = mm.chunk_audio(df, chunk_ms=1000, decode_stub=False)
        got = chunks.orderBy("chunk_idx").collect()
        assert [r.chunk_idx for r in got] == [0, 1]
        assert got[-1].byte_end == len(blob)

    @staticmethod
    def _wav(seconds: float, rate: int = 8000) -> bytes:
        """Stdlib-built PCM WAV of a given true duration."""
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * int(rate * seconds))
        return buf.getvalue()

    def test_real_audio_chunking_without_ffmpeg_via_wav_parser(self, spark):
        """The REAL (content-derived) audio path un-skipped in this
        sandbox (VERDICT r6 #3): a PCM WAV's duration comes from its
        own fmt/data chunks, so chunk boundaries must follow the
        CONTENT even when the declared metadata lies."""
        from recover_spark.ops import multimodal as mm

        blob = self._wav(2.5)  # true duration 2500 ms
        # declared metadata claims 99s — the real path must ignore it
        df = spark.createDataFrame(
            [(7, blob, ("audio/wav", None, None, 99_000))],
            "media_id long, content binary, meta struct<"
            "mime_type:string,width:int,height:int,duration_ms:bigint>",
        )
        got = (
            mm.chunk_audio(df, chunk_ms=1000, decode_stub=False)
            .orderBy("chunk_idx")
            .collect()
        )
        assert [r.chunk_idx for r in got] == [0, 1, 2]
        assert [(r.chunk_start_ms, r.chunk_end_ms) for r in got] == [
            (0, 1000), (1000, 2000), (2000, 2500),
        ]
        assert got[0].byte_start == 0
        assert got[-1].byte_end == len(blob)
        # same schema as the ffprobe kernel and the stub path
        stub_cols = mm.chunk_audio(df, chunk_ms=1000).columns
        real_cols = mm.chunk_audio(df, chunk_ms=1000, decode_stub=False).columns
        assert real_cols == stub_cols

        frames = mm.sample_video_frames(
            df, every_ms=1000, decode_stub=False
        ).collect()
        assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000]

    @staticmethod
    def _avi(uspf: int, frames: int) -> bytes:
        """Minimal RIFF/AVI blob with a real avih main header."""
        import struct

        avih_payload = struct.pack(
            "<14I", uspf, 0, 0, 0, frames, 0, 1, 0, 320, 240, 0, 0, 0, 0
        )
        avih = b"avih" + struct.pack("<I", len(avih_payload)) + avih_payload
        hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
        body = b"AVI " + hdrl
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_real_video_frames_without_ffmpeg_via_avi_parser(self, spark):
        """The VIDEO real path un-skipped: an AVI's duration comes from
        its own avih header (us-per-frame x frame count); frame
        sampling must follow the CONTENT even when metadata lies."""
        from recover_spark.ops import multimodal as mm

        blob = self._avi(40_000, 75)  # 25 fps x 75 frames = 3000 ms
        df = spark.createDataFrame(
            [(3, blob, ("video/avi", 320, 240, 77_000))],
            "media_id long, content binary, meta struct<"
            "mime_type:string,width:int,height:int,duration_ms:bigint>",
        )
        frames = mm.sample_video_frames(
            df, every_ms=1000, decode_stub=False
        ).collect()
        assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000]
        chunks = mm.chunk_audio(df, chunk_ms=2000, decode_stub=False)
        got = chunks.orderBy("chunk_idx").collect()
        assert [(r.chunk_start_ms, r.chunk_end_ms) for r in got] == [
            (0, 2000), (2000, 3000),
        ]

    def test_avi_parser_edge_cases(self):
        import pytest as _pytest

        from recover_spark.ops.multimodal import _parse_avi_duration_ms

        assert _parse_avi_duration_ms(self._avi(33_367, 300)) == 10_010
        with _pytest.raises(ValueError, match="AVI"):
            _parse_avi_duration_ms(b"RIFF\x04\x00\x00\x00WAVE")
        with _pytest.raises(ValueError, match="avih"):
            _parse_avi_duration_ms(b"RIFF\x04\x00\x00\x00AVI ")
        # truncated avih must fail loudly
        broken = self._avi(40_000, 75)[:40]
        with _pytest.raises(ValueError):
            _parse_avi_duration_ms(broken)

    def test_wav_parser_edge_cases(self):
        import pytest as _pytest

        from recover_spark.ops.multimodal import _parse_wav_duration_ms

        assert _parse_wav_duration_ms(self._wav(0.5)) == 500
        assert _parse_wav_duration_ms(self._wav(1.0, rate=44100)) == 1000
        with _pytest.raises(ValueError, match="RIFF"):
            _parse_wav_duration_ms(b"\x89PNG not wav")
        with _pytest.raises(ValueError, match="fmt /data"):
            _parse_wav_duration_ms(b"RIFF\x04\x00\x00\x00WAVE")
        # truncated data chunk: duration reflects the bytes PRESENT
        whole = self._wav(1.0)
        cut = whole[: len(whole) - 8000]  # drop half the samples
        assert abs(_parse_wav_duration_ms(cut) - 500) <= 1

    def test_stub_path_unchanged(self, spark):
        from recover_spark.ops.multimodal import (
            IMAGE_FEATURE_SCHEMA,
            extract_image_features,
        )

        df = self._media(spark, b"some bytes")
        out = extract_image_features(df, feature_dim=8)
        assert out.schema == IMAGE_FEATURE_SCHEMA
        row = out.first()
        assert row.n_bytes == len(b"some bytes") and len(row.feature) == 8


# -- brute-force top-k query-side guard -------------------------------------


class TestBruteForceQueryGuard:
    def test_oversized_query_side_raises_before_planning(self, spark):
        from recover_spark.ops.similarity import brute_force_topk

        vecs = spark.range(0, 500).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") % 7 + i).cast("float") for i in range(4)])
            .alias("embedding"),
        )
        with pytest.raises(ValueError, match="max_query_rows"):
            brute_force_topk(vecs, vecs, k=3, max_query_rows=100)
        # within the bound (or explicitly waived) it still runs
        small = vecs.filter(F.col("vec_id") < 5)
        out = brute_force_topk(vecs, small, k=3, max_query_rows=100)
        assert out.count() == 15


# -- BM25 retrieval ---------------------------------------------------------


class TestBM25:
    def _docs(self, spark):
        rows = [
            (1, "spark shuffle join spark spark"),
            (2, "join join join filter"),
            (3, "window agg rollup"),
            (4, "spark window"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ranks_rarer_term_matches_higher(self, spark):
        from recover_spark.ops.text_analysis import bm25_topk

        queries = spark.createDataFrame(
            [("q1", "rollup")], "query_id string, query_text string"
        )
        out = bm25_topk(self._docs(spark), queries, k=5).collect()
        # only doc 3 contains 'rollup'
        assert [(r["query_id"], r["doc_id"]) for r in out] == [("q1", 3)]

    def test_unknown_query_term_contributes_nothing(self, spark):
        from recover_spark.ops.text_analysis import bm25_topk

        queries = spark.createDataFrame(
            [("q1", "spark zzznotaterm")],
            "query_id string, query_text string",
        )
        out = bm25_topk(self._docs(spark), queries, k=10)
        ids = {r["doc_id"] for r in out.collect()}
        assert ids == {1, 4}  # docs containing 'spark'; no crash, no nulls

    def test_no_matching_terms_returns_empty(self, spark):
        from recover_spark.ops.text_analysis import bm25_topk

        queries = spark.createDataFrame(
            [("q1", "zzz qqq")], "query_id string, query_text string"
        )
        assert bm25_topk(self._docs(spark), queries).count() == 0

    def test_query_side_guard_raises(self, spark):
        from recover_spark.ops.text_analysis import bm25_topk

        queries = spark.createDataFrame(
            [(f"q{i}", f"term{i} term{i+1}") for i in range(40)],
            "query_id string, query_text string",
        )
        with pytest.raises(ValueError, match="max_query_terms"):
            bm25_topk(
                self._docs(spark), queries, max_query_terms=10
            )

    def test_tf_saturation_and_length_normalization(self, spark):
        """Doc 1 has tf(spark)=3 but is long; doc 4 has tf=1 and is
        short — BM25's length normalization must still rank doc 1
        first here (tf dominates at these lengths), and scores must be
        monotone in tf for equal lengths."""
        from recover_spark.ops.text_analysis import bm25_topk

        queries = spark.createDataFrame(
            [("q1", "spark")], "query_id string, query_text string"
        )
        out = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(self._docs(spark), queries, k=5).collect()
        }
        assert set(out) == {1, 4}
        assert out[1] > out[4]


# -- DSIR-style importance weighting ----------------------------------------


class TestImportanceScores:
    def test_target_like_docs_score_higher(self, spark):
        from recover_spark.ops.sampling import importance_scores

        rows = [
            (1, "the quick brown fox jumps", "en"),
            (2, "the quick brown dog runs", "en"),
            (3, "foo bar baz foo bar", "xx"),
            (4, "the quick brown cat sits", "en"),
            (5, "foo bar qux", "xx"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {
            r["doc_id"]: r["importance"]
            for r in importance_scores(
                docs, F.col("lang") == "en", vocab_size=50
            ).collect()
        }
        assert min(out[1], out[2], out[4]) > max(out[3], out[5])

    def test_short_and_empty_docs_are_absent_not_fatal(self, spark):
        from recover_spark.ops.sampling import importance_scores

        rows = [
            (1, "alpha beta gamma", "en"),
            (2, "solo", "en"),          # 1 token -> no bigram
            (3, "", "en"),              # empty -> empty token array
            (4, "  \t ", "xx"),         # whitespace only
            (5, "alpha beta delta", "xx"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = importance_scores(docs, F.col("lang") == "en").collect()
        assert {r["doc_id"] for r in got} == {1, 5}


# -- fuzzy decontamination --------------------------------------------------


class TestFuzzyDecontam:
    def test_near_copy_flagged_unrelated_not(self, spark):
        from recover_spark.ops.decontam import fuzzy_benchmark_overlap

        base = (
            "the quick brown fox jumps over the lazy dog while the "
            "patient grey owl watches from the tall oak tree near the "
            "quiet river bank in the early morning light"
        )
        bench = spark.createDataFrame(
            [(100, base)], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                # near-copy: one appended word, ~94% shingle overlap --
                # comfortably above the 4x4-band LSH threshold
                (1, base + " today"),
                # unrelated
                (2, "completely different subject matter entirely here now"),
            ],
            "doc_id long, text string",
        )
        got = fuzzy_benchmark_overlap(
            corpus, bench, min_signature_agreement=0.5
        ).collect()
        assert [(r["doc_id"], r["bench_id"]) for r in got] == [(1, 100)]
        assert got[0]["signature_agreement"] >= 0.5


# -- bigram LM with Stupid Backoff ------------------------------------------


class TestBigramLM:
    def test_scrambled_text_scores_lower_than_fluent(self, spark):
        """The signature property the unigram model cannot see: same
        words, shuffled order -> same unigram score, lower bigram
        score."""
        from recover_spark.ops.text_analysis import bigram_logprob_scores

        fluent = "the quick brown fox jumps over the lazy dog " * 4
        scrambled = "dog the over quick lazy fox brown the jumps " * 4
        model = spark.createDataFrame(
            [(i, fluent) for i in range(20)], "doc_id long, text string"
        )
        scored_docs = spark.createDataFrame(
            [(100, fluent), (200, scrambled)], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["mean_logprob"]
            for r in bigram_logprob_scores(
                scored_docs, model_docs=model
            ).collect()
        }
        assert out[100] > out[200]

    def test_oov_backoff_is_finite(self, spark):
        from recover_spark.ops.text_analysis import bigram_logprob_scores

        model = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        scored = spark.createDataFrame(
            [(9, "zzz qqq www")], "doc_id long, text string"
        )
        rows = bigram_logprob_scores(scored, model_docs=model).collect()
        assert len(rows) == 1
        import math

        assert math.isfinite(rows[0]["mean_logprob"])
        assert rows[0]["n_bigrams"] == 2

    def test_self_scoring_never_backs_off(self, spark):
        """Self-fit model: every scored bigram was counted, so scores
        are the pure conditional log-probs (all > backoff floor)."""
        from recover_spark.ops.text_analysis import bigram_logprob_scores

        docs = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "a b c")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in bigram_logprob_scores(docs).collect()}
        # doc 1: p(b|a)=1 except a<-b transitions: c(b,a)=2/c(b)=3
        assert out[1]["n_bigrams"] == 5
        assert out[2]["n_bigrams"] == 2


# -- materialize_columns CSE barrier ----------------------------------------


class TestMaterializeColumns:
    def test_values_and_cardinality_preserved(self, spark):
        from recover_spark.functions.transforms import materialize_columns

        df = spark.createDataFrame(
            [(1, "a b"), (2, ""), (3, "c d e")], "id long, text string"
        )
        from recover_spark.functions.text import tokens

        out = materialize_columns(df, {"__t": tokens(F.col("text"))})
        rows = {r["id"]: r["__t"] for r in out.collect()}
        assert rows == {1: ["a", "b"], 2: [], 3: ["c", "d", "e"]}
        assert out.columns == ["id", "text", "__t"]

    def test_plan_has_generate_barrier(self, spark):
        from recover_spark.functions.text import tokens
        from recover_spark.functions.transforms import materialize_columns

        df = spark.createDataFrame([(1, "a b c")], "id long, text string")
        out = materialize_columns(df, {"__t": tokens(F.col("text"))}).select(
            F.size("__t").alias("a"), F.size("__t").alias("b")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the expensive expression lives in exactly ONE Generate node;
        # consumers reference its output attribute
        assert plan.count("filter(split(") == 1, plan


# -- Misra-Gries heavy hitters ----------------------------------------------


class TestHeavyHittersSketch:
    def test_exact_when_capacity_exceeds_cardinality(self, spark):
        from recover_spark.ops.sampling import heavy_hitters, heavy_hitters_sketch

        df = spark.range(0, 20_000).select(
            (F.col("id") % 50).alias("k")
        )
        exact = heavy_hitters(df, ["k"], top_n=5).collect()
        approx = heavy_hitters_sketch(df, ["k"], top_n=5, capacity=256).collect()
        assert [tuple(r) for r in exact] == [tuple(r) for r in approx]

    def test_skewed_hitters_survive_small_capacity(self, spark):
        """Zipf-ish skew with capacity FAR below cardinality: every key
        above the 1/(capacity+1) share floor must be reported with its
        EXACT count (the recount phase)."""
        from recover_spark.ops.sampling import heavy_hitters_sketch

        # 3 hot keys (6000, 3000, 1500 rows) + 30k distinct cold keys
        hot = (
            spark.range(0, 6000).select(F.lit("A").alias("k"))
            .union(spark.range(0, 3000).select(F.lit("B").alias("k")))
            .union(spark.range(0, 1500).select(F.lit("C").alias("k")))
        )
        cold = spark.range(0, 30_000).select(
            F.concat(F.lit("cold_"), F.col("id")).alias("k")
        )
        df = hot.union(cold).repartition(16)
        out = heavy_hitters_sketch(df, ["k"], top_n=3, capacity=64)
        got = {r["k"]: r["n_rows"] for r in out.collect()}
        assert got == {"A": 6000, "B": 3000, "C": 1500}

    def test_bounded_candidate_shuffle(self, spark):
        """The phase-1 output is bounded by capacity x partitions,
        regardless of distinct-key count."""
        from recover_spark.ops.sampling import heavy_hitters_sketch

        df = spark.range(0, 50_000).select(
            F.concat(F.lit("u"), F.col("id")).alias("k")
        ).repartition(8)
        # capacity 32, 8 partitions -> at most 256 candidates
        out = heavy_hitters_sketch(df, ["k"], top_n=5, capacity=32)
        assert out.count() == 5  # still returns a ranked top-5


# -- one-pass profiler + HLL overlap ----------------------------------------


class TestProfileColumns:
    def test_profile_stats_and_approx_distinct_tolerance(self, spark):
        from recover_spark.operators.audit import profile_columns

        rows = [(i, f"v{i % 100}", float(i) if i % 10 else None) for i in range(1000)]
        df = spark.createDataFrame(rows, "k long, s string, x double")
        prof = {r["column"]: r for r in profile_columns(df).collect()}
        assert prof["k"]["n_rows"] == 1000 and prof["k"]["n_nulls"] == 0
        assert prof["x"]["n_nulls"] == 100
        assert prof["x"]["completeness"] == 0.9
        assert prof["s"]["min_value"] == "v0" and prof["s"]["max_value"] == "v99"
        assert prof["s"]["mean_value"] is None
        # HLL estimate within 10% of the exact distinct (rsd=0.05)
        assert abs(prof["s"]["approx_distinct"] - 100) <= 10
        assert abs(prof["k"]["approx_distinct"] - 1000) <= 100


class TestApproxDistinctOverlap:
    def test_overlap_close_to_exact(self, spark):
        from recover_spark.operators.analytics import approx_distinct_overlap

        # A = users 0..999, B = users 500..1499 -> intersection 500
        rows = [("a", u) for u in range(1000)] + [
            ("b", u) for u in range(500, 1500)
        ]
        df = spark.createDataFrame(rows, "seg string, user long")
        got = approx_distinct_overlap(df, "seg", "a", "b", "user").collect()[0]
        assert abs(got["approx_a"] - 1000) / 1000 < 0.05
        assert abs(got["approx_b"] - 1000) / 1000 < 0.05
        assert abs(got["approx_union"] - 1500) / 1500 < 0.05
        assert abs(got["approx_intersection"] - 500) / 500 < 0.2

    def test_disjoint_segments_clamp_to_zero_ish(self, spark):
        from recover_spark.operators.analytics import approx_distinct_overlap

        rows = [("a", u) for u in range(500)] + [
            ("b", u) for u in range(10_000, 10_500)
        ]
        df = spark.createDataFrame(rows, "seg string, user long")
        got = approx_distinct_overlap(df, "seg", "a", "b", "user").collect()[0]
        # clamped at 0; estimator noise may leave a small positive value
        assert got["approx_intersection"] <= 0.05 * 1000


# -- distributed logistic regression ----------------------------------------


class TestLogisticTrainer:
    def test_learns_separable_data(self, spark):
        from recover_spark.ops.classifier import (
            predict_logistic,
            train_logistic,
        )

        # y = 1 iff 2*x1 - x2 > 0 (+ margin), deterministic grid
        rows = []
        for i in range(-20, 21):
            for j in range(-20, 21):
                m = 2.0 * i - j
                if abs(m) < 3:
                    continue
                rows.append((float(i), float(j), 1 if m > 0 else 0))
        df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
        model = train_logistic(
            df, "y", ["x1", "x2"], iterations=40, learning_rate=1.0
        )
        # loss decreases and the decision boundary is learned
        assert model.losses[-1] < model.losses[0] / 3
        scored = predict_logistic(df, model)
        acc = scored.filter(
            ((F.col("p_quality") >= 0.5) & (F.col("y") == 1))
            | ((F.col("p_quality") < 0.5) & (F.col("y") == 0))
        ).count() / df.count()
        assert acc > 0.97

    def test_constant_feature_and_scaling_robustness(self, spark):
        from recover_spark.ops.classifier import train_logistic

        rows = [(float(i), 7.0, 1e6 * i, 1 if i > 0 else 0) for i in range(-50, 51)]
        df = spark.createDataFrame(rows, "x double, c double, big double, y int")
        # constant column (std 0 -> guarded) + huge-scale column both fine
        model = train_logistic(df, "y", ["x", "c", "big"], iterations=30)
        assert model.losses[-1] < 0.2

    def test_raw_space_model_dataframe_scores_identically(self, spark):
        from recover_spark.ops.classifier import (
            model_as_dataframe,
            predict_logistic,
            train_logistic,
        )

        rows = [(float(i), float(i % 5), 1 if i % 3 == 0 else 0) for i in range(200)]
        df = spark.createDataFrame(rows, "a double, b double, y int")
        model = train_logistic(df, "y", ["a", "b"], iterations=10)
        coef = {
            r["feature"]: r["coefficient"]
            for r in model_as_dataframe(spark.createDataFrame, model).collect()
        }
        # raw-space linear form reproduces the standardized margin
        z_raw = (
            coef["__bias__"]
            + coef["a"] * F.col("a")
            + coef["b"] * F.col("b")
        )
        manual = df.withColumn(
            "p2", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z_raw)), 6)
        )
        auto = predict_logistic(df, model)
        joined = auto.join(manual.select("a", "b", "p2"), ["a", "b"])
        assert joined.filter(
            F.abs(F.col("p_quality") - F.col("p2")) > 1e-4
        ).count() == 0


# -- IVF index incremental append -------------------------------------------


class TestIvfIndexAppend:
    def _vectors(self, spark, start, n, dim=8):
        return spark.range(start, start + n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.sin(F.col("id") * (i + 1)) * 2 - 1)
                    for i in range(dim)
                ]
            ).alias("embedding"),
        )

    def test_append_then_exhaustive_probe_equals_brute_force(
        self, spark, tmp_path
    ):
        """Probing ALL lists after an append is exhaustive search, so
        results must EXACTLY equal brute-force cosine top-k over the
        full (old + new) corpus — proves appended vectors are findable
        and scored identically to built ones."""
        from recover_spark.ops.similarity import (
            append_ivf_index,
            brute_force_topk,
            build_ivf_index,
            ivf_topk_indexed,
        )

        idx = str(tmp_path / "ivf")
        old = self._vectors(spark, 0, 120)
        new = self._vectors(spark, 1000, 80)
        build_ivf_index(old, idx, n_centroids=4)
        append_ivf_index(new, idx)

        full = old.union(new)
        queries = self._vectors(spark, 5000, 3)
        got = ivf_topk_indexed(spark, idx, queries, nprobe=4, k=5).select(
            "query_vec_id", "rank", "vec_id"
        )
        want = brute_force_topk(full, queries, k=5).select(
            "query_vec_id", "rank", "vec_id"
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_append_preserves_partition_layout_and_stats(self, spark, tmp_path):
        import os

        from recover_spark.ops.similarity import (
            append_ivf_index,
            build_ivf_index,
            ivf_index_stats,
        )

        idx = str(tmp_path / "ivf")
        build_ivf_index(self._vectors(spark, 0, 100), idx, n_centroids=4)
        lists_before = {
            d for d in os.listdir(idx) if d.startswith("list=")
        }
        append_ivf_index(self._vectors(spark, 1000, 50), idx)
        lists_after = {d for d in os.listdir(idx) if d.startswith("list=")}
        assert lists_after <= lists_before | lists_after
        assert lists_after.issubset(lists_before)  # frozen centroids
        stats = ivf_index_stats(spark, idx)
        assert stats.agg(F.sum("n_vectors")).collect()[0][0] == 150
        assert stats.select("imbalance_ratio").first()[0] >= 1.0


# -- incremental KLL quantile matview ---------------------------------------


class TestQuantileMatview:
    def test_streamed_state_tracks_exact_quantiles(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from recover_spark.streaming.matview import (
            maintain_quantile_matview,
            read_quantile_matview,
        )

        src = str(tmp_path / "src")
        df = spark.range(0, 20_000).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        df.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("g string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = maintain_quantile_matview(
            stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ["g"], "v",
        )
        q.awaitTermination(120)
        got = {
            r.g: r
            for r in read_quantile_matview(
                spark, str(tmp_path / "state")
            ).collect()
        }
        exact = {
            r.g: r
            for r in df.groupBy("g")
            .agg(
                F.percentile("v", F.lit(0.5)).alias("e50"),
                F.percentile("v", F.lit(0.95)).alias("e95"),
            )
            .collect()
        }
        assert set(got) == set(exact) and len(got) == 4
        for g in exact:
            # KLL rank error at k=200 is ~1.65%; values 0..999 so a
            # 2% rank error is <= ~25 in value
            assert abs(got[g].p50 - exact[g].e50) <= 30
            assert abs(got[g].p95 - exact[g].e95) <= 30
        assert sum(r.n_rows for r in got.values()) == 20_000

    def test_replay_skipped_by_batch_sidecar_not_idempotence(
        self, spark, tmp_path
    ):
        """KLL merge is NOT idempotent (unlike HLL) — the sidecar is
        load-bearing: replaying an applied batch must be a no-op, and
        merging the same batch under a NEW id must double n."""
        from pyspark.sql import functions as F

        from recover_spark.streaming.matview import (
            merge_quantile_sketches,
            read_quantile_matview,
        )

        batch = spark.range(0, 500).select(
            F.lit("k").alias("g"), F.col("id").cast("double").alias("v")
        )
        state = str(tmp_path / "state")
        merge_quantile_sketches(spark, batch, state, ["g"], "v", batch_id=0)
        first = read_quantile_matview(spark, state).first()
        merge_quantile_sketches(spark, batch, state, ["g"], "v", batch_id=0)
        again = read_quantile_matview(spark, state).first()
        assert (first.n_rows, first.p50) == (again.n_rows, again.p50)
        # a genuinely new batch id merges (and doubles the count)
        merge_quantile_sketches(spark, batch, state, ["g"], "v", batch_id=1)
        after = read_quantile_matview(spark, state).first()
        assert after.n_rows == 2 * first.n_rows


# -- KLL quantile rollup + 2-D skyline --------------------------------------


class TestQuantileRollup:
    def test_coarse_estimates_within_kll_tolerance(self, spark):
        from pyspark.sql import functions as F

        from recover_spark.operators.analytics import approx_quantile_rollup

        df = spark.range(0, 30_000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 10).cast("string").alias("fine"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        got = {
            r.g: r
            for r in approx_quantile_rollup(
                df, ["g"], "fine", "v"
            ).collect()
        }
        exact = {
            r.g: r
            for r in df.groupBy("g")
            .agg(
                F.percentile("v", F.lit(0.5)).alias("e50"),
                F.percentile("v", F.lit(0.95)).alias("e95"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for g in exact:
            assert abs(got[g].p50 - exact[g].e50) <= 30  # ~2% of range
            assert abs(got[g].p95 - exact[g].e95) <= 30
            assert got[g].n_fine_groups == 10
        assert sum(r.n_rows for r in got.values()) == 30_000


class TestSkyline:
    def _brute(self, pts):
        out = []
        for p in pts:
            if not any(
                q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
            ):
                out.append(p)
        return sorted(set(out))

    def test_equals_brute_force_on_random_points(self, spark):
        from recover_spark.operators.analytics import skyline_2d

        pts = sorted(
            {((i * 37) % 101, (i * 59) % 103) for i in range(400)}
        )
        df = spark.createDataFrame(pts, "x long, y long")
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        assert got == self._brute(pts)

    def test_anti_correlated_frontier_is_everything(self, spark):
        from recover_spark.operators.analytics import skyline_2d

        pts = [(i, 100 - i) for i in range(101)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        assert got == pts  # nothing dominates anything

    def test_duplicates_collapse_single_dominator_wins(self, spark):
        from recover_spark.operators.analytics import skyline_2d

        pts = [(1, 1), (1, 1), (2, 2), (1, 3), (3, 1), (0, 5), (5, 0)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        assert got == [(0, 5), (1, 1), (5, 0)]

    def test_bucketing_invariant(self, spark):
        from recover_spark.operators.analytics import skyline_2d

        pts = sorted({((i * 7) % 53, (i * 11) % 47) for i in range(200)})
        df = spark.createDataFrame(pts, "x long, y long")
        a = sorted(map(tuple, skyline_2d(df, "x", "y", buckets=1).collect()))
        b = sorted(map(tuple, skyline_2d(df, "x", "y", buckets=97).collect()))
        assert a == b == self._brute(pts)


# -- generation change-data feed --------------------------------------------


class TestGenerationChanges:
    def test_insert_update_delete_detected(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from recover_spark.sources.atomic import (
            generation_changes,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        gen1 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, tag string, v double",
        )
        write_dataset_atomic(gen1, path, run_id="r1")
        gen2 = spark.createDataFrame(
            [(1, "a", 10.0),        # unchanged -> absent from the feed
             (2, "b", 25.0),        # update
             (4, "d", 40.0)],       # insert; 3 deleted
            "id long, tag string, v double",
        )
        write_dataset_atomic(gen2, path, run_id="r2")
        feed = generation_changes(spark, path, ["id"]).orderBy("id")
        got = [(r.change_type, r.id, r.tag, r.v) for r in feed.collect()]
        assert got == [
            ("update", 2, "b", 25.0),
            ("delete", 3, None, None),
            ("insert", 4, "d", 40.0),
        ]

    def test_explicit_generations_and_no_prior_raises(self, spark, tmp_path):
        import pytest

        from recover_spark.sources.atomic import (
            generation_changes,
            list_generations,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        write_dataset_atomic(
            spark.createDataFrame([(1, 1.0)], "id long, v double"),
            path, run_id="r1",
        )
        with pytest.raises(ValueError, match="no generation precedes"):
            generation_changes(spark, path, ["id"])
        write_dataset_atomic(
            spark.createDataFrame([(1, 2.0)], "id long, v double"),
            path, run_id="r2",
        )
        g1, g2 = list_generations(path)
        feed = generation_changes(
            spark, path, ["id"], from_generation=g1, to_generation=g2
        )
        got = [(r.change_type, r.id, r.v) for r in feed.collect()]
        assert got == [("update", 1, 2.0)]
        # same generation against itself: empty feed
        assert generation_changes(
            spark, path, ["id"], from_generation=g2, to_generation=g2
        ).count() == 0


class TestPnmRealDecode:
    """The dependency-free PNM decoder makes the REAL kernel path
    (not the stub) runnable in this sandbox un-skipped (VERDICT r5
    #7): content-derived features from actual pixel data, same output
    schema as the PIL kernel."""

    @staticmethod
    def _ppm(w, h, pixel_fn) -> bytes:
        header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
        raster = bytearray()
        for r in range(h):
            for c in range(w):
                raster.extend(pixel_fn(r, c))
        return header + bytes(raster)

    @staticmethod
    def _pgm(w, h, pixel_fn) -> bytes:
        header = f"P5\n{w} {h}\n255\n".encode()
        return header + bytes(pixel_fn(r, c) for r in range(h) for c in range(w))

    def _media(self, spark, rows):
        return spark.createDataFrame(
            [(i, b, ("image/x-portable-pixmap", None, None, None))
             for i, b in rows],
            "media_id long, content binary, "
            "meta struct<mime_type:string,width:int,height:int,duration_ms:bigint>",
        )

    def test_real_decode_runs_unstubbed_and_is_content_derived(self, spark):
        from recover_spark.ops.multimodal import (
            IMAGE_FEATURE_SCHEMA,
            extract_image_features,
        )

        flat = self._ppm(8, 8, lambda r, c: (200, 200, 200))
        near = self._ppm(8, 8, lambda r, c: (201, 200, 200))  # 1-bit-ish
        grad = self._ppm(8, 8, lambda r, c: (r * 30, c * 30, 0))
        gray = self._pgm(6, 6, lambda r, c: 100)
        df = self._media(spark, [(1, flat), (2, near), (3, grad), (4, gray)])
        out = extract_image_features(df, feature_dim=16, decode_stub=False)
        assert out.schema == IMAGE_FEATURE_SCHEMA
        feats = {r.media_id: r.feature for r in out.collect()}
        # uniform 200-gray: every intensity is 200/127.5 - 1
        assert all(abs(v - (200 / 127.5 - 1.0)) < 0.01 for v in feats[1])
        # near-identical content -> near-identical features (the stub's
        # digest features flip completely on one changed bit)
        d_near = max(abs(a - b) for a, b in zip(feats[1], feats[2]))
        d_far = max(abs(a - b) for a, b in zip(feats[1], feats[3]))
        assert d_near < 0.01 < d_far
        # P5 grayscale path
        assert all(abs(v - (100 / 127.5 - 1.0)) < 0.01 for v in feats[4])

    def test_pnm_header_edge_cases(self):
        import pytest as _pytest

        from recover_spark.ops.multimodal import _decode_pnm_gray

        w, h, gray = _decode_pnm_gray(self._ppm(2, 3, lambda r, c: (255, 0, 0)))
        assert (w, h) == (2, 3) and len(gray) == 6
        assert all(v == 255 * 299 // 1000 for v in gray)  # 601-2 red weight
        # maxval rescale
        blob = b"P5\n2 2\n15\n" + bytes([15, 0, 7, 15])
        _, _, g = _decode_pnm_gray(blob)
        assert g == [255, 0, 7 * 255 // 15, 255]
        with _pytest.raises(ValueError, match="PNM"):
            _decode_pnm_gray(b"\x89PNG not pnm")
        with _pytest.raises(ValueError, match="truncated"):
            _decode_pnm_gray(b"P5\n4 4\n255\n\x00\x01")

    def test_pnm_16bit_big_endian_samples(self):
        """maxval > 255 means 2-byte big-endian samples (PNM spec); a
        one-byte read would silently decode garbage."""
        import struct

        import pytest as _pytest

        from recover_spark.ops.multimodal import _decode_pnm_gray

        # P5, maxval 65535: samples 65535, 0, 32768, 65535
        vals = [65535, 0, 32768, 65535]
        blob = b"P5\n2 2\n65535\n" + struct.pack(">4H", *vals)
        _, _, g = _decode_pnm_gray(blob)
        assert g == [min(255, v * 255 // 65535) for v in vals]
        assert g == [255, 0, 127, 255]
        # P6 16-bit: pure red pixels scale through the 601-2 weight
        px = struct.pack(">3H", 65535, 0, 0) * 4
        _, _, g6 = _decode_pnm_gray(b"P6\n2 2\n65535\n" + px)
        assert all(v == (65535 * 299 // 1000) * 255 // 65535 for v in g6)
        # a 16-bit raster sized for the ONE-byte misread must fail
        # loudly, not decode
        with _pytest.raises(ValueError, match="truncated"):
            _decode_pnm_gray(b"P5\n2 2\n65535\n" + bytes(4))


class TestTimeTravelAsOf:
    """Timestamp time travel over the generation archive
    (sources/atomic.py:read_dataset as_of / generation_asof)."""

    def test_asof_resolves_the_generation_live_at_ts(self, spark, tmp_path):
        from recover_spark.sources.atomic import (
            generation_asof,
            read_dataset,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        for i, ts in enumerate([1000.0, 2000.0, 3000.0], start=1):
            df = spark.createDataFrame([(i,)], "v int")
            write_dataset_atomic(
                df, path, run_id=f"r{i}", commit_ts=ts,
                keep_generations=5,
            )
        # exactly at a commit, between commits, and after the last
        assert read_dataset(spark, path, as_of=1000.0).first()["v"] == 1
        assert read_dataset(spark, path, as_of=1999.9).first()["v"] == 1
        assert read_dataset(spark, path, as_of=2000.0).first()["v"] == 2
        assert read_dataset(spark, path, as_of=9999.0).first()["v"] == 3
        # live read unaffected
        assert read_dataset(spark, path).first()["v"] == 3
        assert generation_asof(path, 2500.0).endswith("2")

        import pytest as _pytest

        with _pytest.raises(FileNotFoundError, match="at or before"):
            read_dataset(spark, path, as_of=999.0)
        with _pytest.raises(ValueError, match="not both"):
            read_dataset(spark, path, generation="gen-00000001", as_of=1.0)

    def test_commit_meta_rides_the_atomic_rename(self, spark, tmp_path):
        """A crash before promote leaves an unreferenced generation
        whose commit meta is already in place — as-of never sees a
        generation without its timestamp."""
        import pytest as _pytest

        from recover_spark.sources.atomic import (
            CrashInjected,
            generation_commit_ts,
            list_generations,
            read_dataset,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        write_dataset_atomic(
            spark.createDataFrame([(1,)], "v int"), path,
            run_id="r1", commit_ts=100.0,
        )
        with _pytest.raises(CrashInjected):
            write_dataset_atomic(
                spark.createDataFrame([(2,)], "v int"), path,
                run_id="r2", commit_ts=200.0, _fail_point="after-rename",
            )
        # the orphan generation exists with its meta, but the POINTER
        # still names gen 1 — and as_of resolves over COMPLETE
        # generations, so ts=200 sees the orphan's data (it is a
        # complete, readable generation; only liveness is unpromoted)
        gens = list_generations(path)
        assert len(gens) == 2
        assert generation_commit_ts(path, gens[-1]) == 200.0
        assert read_dataset(spark, path).first()["v"] == 1
        assert read_dataset(spark, path, as_of=150.0).first()["v"] == 1

    def test_legacy_generation_falls_back_to_mtime(self, spark, tmp_path):
        import os

        from recover_spark.sources.atomic import (
            generation_commit_ts,
            list_generations,
            write_dataset_atomic,
        )

        path = str(tmp_path / "ds")
        write_dataset_atomic(
            spark.createDataFrame([(1,)], "v int"), path, run_id="r1"
        )
        gen = list_generations(path)[0]
        meta = os.path.join(path, gen, "_commit.json")
        os.remove(meta)  # pre-metadata layout
        ts = generation_commit_ts(path, gen)
        assert ts == os.stat(os.path.join(path, gen)).st_mtime


class TestImageAhash:
    """Real content-derived average hash over the PNM kernel."""

    @staticmethod
    def _ppm(w, h, px):
        header = f"P6\n{w} {h}\n255\n".encode()
        body = bytes(
            v for r in range(h) for c in range(w) for v in px(r, c)
        )
        return header + body

    def test_near_identical_images_hash_close(self, spark):
        from recover_spark.ops.multimodal import (
            image_ahash,
            phash_near_duplicates,
        )

        def grad(r, c):
            v = min(255, 16 * c)
            return (v, v, v)

        def grad_tweaked(r, c):
            v = min(255, 16 * c + (3 if (r, c) == (7, 7) else 0))
            return (v, v, v)

        def inverted(r, c):
            v = 255 - min(255, 16 * c)
            return (v, v, v)

        blobs = [
            (1, self._ppm(16, 16, grad)),
            (2, self._ppm(16, 16, grad_tweaked)),
            (3, self._ppm(16, 16, inverted)),
        ]
        df = spark.createDataFrame(blobs, "media_id long, content binary")
        hashes = {
            r["media_id"]: r["ahash"]
            for r in image_ahash(df, decode_stub=False).collect()
        }

        def ham(a, b):
            return bin(a ^ b).count("1")

        assert ham(hashes[1], hashes[2]) <= 3   # one-pixel tweak
        assert ham(hashes[1], hashes[3]) >= 20  # inversion flips bits
        # composition: the banding pair join finds the near pair only
        pairs = phash_near_duplicates(
            image_ahash(df, decode_stub=False).withColumnRenamed(
                "ahash", "phash"
            )
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got and (1, 3) not in got

    def test_stub_is_deterministic_and_bounded(self, spark):
        from recover_spark.ops.multimodal import image_ahash

        df = spark.createDataFrame(
            [(1, b"abc"), (2, b"abc"), (3, b"abd")],
            "media_id long, content binary",
        )
        h = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
        assert h[1] == h[2] != h[3]
        assert all(0 <= v < (1 << 60) for v in h.values())
