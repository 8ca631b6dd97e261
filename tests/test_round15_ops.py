"""Round-15 optimization tests.

The four formerly-unconditional driver-side Arrow folds
(calibration / vector-sum / bottom-k sample / bootstrap matviews) are
now gated behind ``bounded_state`` with the distributed union +
re-aggregate as the default (VERDICT r14 #2).  Each test folds the
same multi-batch stream through BOTH modes and asserts the persisted
state schema and the read-lens output are identical — the contract
that lets bench call sites opt in without changing what any query
computes.
"""

import pytest
from pyspark.sql import functions as F


def _lens_rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _state_schema(spark, path):
    return [f.simpleString() for f in spark.read.parquet(path).schema]


class TestBoundedStateGates:
    def test_calibration_fold_equals_distributed(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_calibration_state,
            read_calibration_matview,
        )

        batches = [
            [("a", 0.1, 0), ("a", 0.9, 1), ("b", 0.4, 0)],
            [("a", 0.52, 1), ("b", 0.45, 1), ("c", 0.99, 1)],
            [("a", 0.11, 0)],
        ]
        states = {}
        for label, bounded in (("dist", False), ("arrow", True)):
            state = str(tmp_path / f"cal_{label}")
            for i, rows in enumerate(batches):
                df = spark.createDataFrame(
                    rows, "g string, score double, label int"
                )
                merge_calibration_state(
                    spark, df, state, ["g"], "score", "label", 10,
                    batch_id=i, bounded_state=bounded,
                )
            # replay of the last batch must be a no-op in both modes
            df = spark.createDataFrame(
                batches[-1], "g string, score double, label int"
            )
            merge_calibration_state(
                spark, df, state, ["g"], "score", "label", 10,
                batch_id=len(batches) - 1, bounded_state=bounded,
            )
            out = read_calibration_matview(spark, state, ["g"])
            states[label] = (
                _state_schema(spark, state), _lens_rows(out)
            )
        assert states["dist"] == states["arrow"]

    def test_vector_fold_equals_distributed(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_vector_sums,
            read_embedding_drift_matview,
        )

        dim = 4

        def emb(rows):
            return spark.createDataFrame(
                rows, "label string, era int, embedding array<double>"
            )

        batches = [
            [("x", 0, [1.0, 2.0, 3.0, 4.0]), ("x", 1, [1.1, 2.2, 2.9, 4.0])],
            [("x", 0, [0.5, 0.5, 0.5, 0.5]), ("y", 0, [9.0, 0.0, 0.0, 1.0])],
            [("y", 1, [8.5, 0.3, 0.0, 1.2])],
        ]
        states = {}
        for label, bounded in (("dist", False), ("arrow", True)):
            state = str(tmp_path / f"vec_{label}")
            for i, rows in enumerate(batches):
                merge_vector_sums(
                    spark, emb(rows), state, ["label", "era"],
                    "embedding", dim, batch_id=i, bounded_state=bounded,
                )
            merge_vector_sums(  # replay no-op
                spark, emb(batches[-1]), state, ["label", "era"],
                "embedding", dim, batch_id=len(batches) - 1,
                bounded_state=bounded,
            )
            out = read_embedding_drift_matview(
                spark, state, "label", "era", dim
            )
            states[label] = (
                _state_schema(spark, state), _lens_rows(out)
            )
        assert states["dist"] == states["arrow"]

    def test_sample_fold_equals_distributed(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_sample_state,
            read_sample_matview,
        )

        batches = [
            [("a", i) for i in range(20)] + [("b", i) for i in range(5)],
            [("a", i) for i in range(15, 40)] + [("c", 1)],
            [("b", i) for i in range(100, 130)],
        ]
        states = {}
        for label, bounded in (("dist", False), ("arrow", True)):
            state = str(tmp_path / f"samp_{label}")
            for i, rows in enumerate(batches):
                df = spark.createDataFrame(rows, "g string, v long")
                merge_sample_state(
                    spark, df, state, ["g"], "v", k=8,
                    batch_id=i, bounded_state=bounded,
                )
            df = spark.createDataFrame(batches[-1], "g string, v long")
            merge_sample_state(  # replay no-op
                spark, df, state, ["g"], "v", k=8,
                batch_id=len(batches) - 1, bounded_state=bounded,
            )
            out = read_sample_matview(spark, state)
            states[label] = (
                _state_schema(spark, state), _lens_rows(out)
            )
        assert states["dist"] == states["arrow"]

    def test_bootstrap_fold_equals_distributed(self, spark, tmp_path):
        from recover_spark.streaming.matview import (
            merge_bootstrap_state,
            read_bootstrap_matview,
        )

        batches = [
            [("p", i, 10.0 + i) for i in range(30)],
            [("p", i, 5.0 + i) for i in range(30, 50)]
            + [("q", i, 100.0 - i) for i in range(25)],
            [("q", i, 50.0 + i) for i in range(25, 40)],
        ]
        states = {}
        for label, bounded in (("dist", False), ("arrow", True)):
            state = str(tmp_path / f"boot_{label}")
            for i, rows in enumerate(batches):
                df = spark.createDataFrame(
                    rows, "g string, rk long, v double"
                )
                merge_bootstrap_state(
                    spark, df, state, ["g"], "v", "rk", 8,
                    batch_id=i, bounded_state=bounded,
                )
            df = spark.createDataFrame(
                batches[-1], "g string, rk long, v double"
            )
            merge_bootstrap_state(  # replay no-op
                spark, df, state, ["g"], "v", "rk", 8,
                batch_id=len(batches) - 1, bounded_state=bounded,
            )
            out = read_bootstrap_matview(spark, state, ["g"], 8)
            states[label] = (
                _state_schema(spark, state), _lens_rows(out)
            )
        assert states["dist"] == states["arrow"]


def test_legacy_index_append_keeps_full_corpus_counts(spark, tmp_path):
    """An index whose meta predates vectors/ (no vectors_cover_corpus
    flag) must keep the full-postings n_docs scan on EVERY append and
    never grow a partial vectors/ dir that a later append or delete
    would mistake for whole-corpus coverage (ADVICE r14 medium)."""
    import json
    import os
    import shutil

    from recover_spark.ops.text_index import (
        META_NAME,
        append_text_index,
        build_text_index,
        probe_text_index,
    )

    def corpus(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    path = str(tmp_path / "legacy_idx")
    build_text_index(
        corpus([(1, "alpha beta gamma"), (2, "delta epsilon zeta")]),
        path,
        num_buckets=8,
    )
    # Forge the legacy shape: drop vectors/ and the coverage flag.
    shutil.rmtree(os.path.join(path, "vectors"))
    meta_path = os.path.join(path, META_NAME)
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta.pop("vectors_cover_corpus", None)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, sort_keys=True)

    meta = append_text_index(corpus([(3, "eta theta iota")]), path)
    assert meta["n_docs"] == 3
    # The failure mode being pinned: append #1 must NOT have created a
    # vectors/ dir holding only doc 3 that append #2 would treat as
    # the whole corpus (n_docs would collapse to the appended docs).
    assert not os.path.isdir(os.path.join(path, "vectors"))
    meta = append_text_index(corpus([(4, "kappa lambda mu")]), path)
    assert meta["n_docs"] == 4
    # prefix strategy: the postings-only path a pre-vectors index
    # actually supports (dense scans vectors/, which never existed)
    got = probe_text_index(
        corpus([(901, "alpha beta gamma"), (902, "kappa lambda mu")]),
        path,
        0.95,
        strategy="prefix",
    ).collect()
    assert {(r.new_id, r.indexed_id, r.cosine) for r in got} == {
        (901, 1, 1.0),
        (902, 4, 1.0),
    }


def test_probed_lists_query_row_cap(spark, monkeypatch):
    """Probe planning collects query vectors to the driver; past
    MAX_DRIVER_QUERY_ROWS it must refuse loudly (the
    refuse-to-degrade contract, VERDICT r14 #3)."""
    from recover_spark.ops import similarity as sim

    queries = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    seeds = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    monkeypatch.setattr(sim, "MAX_DRIVER_QUERY_ROWS", 4)
    with pytest.raises(ValueError, match="ivf_topk_joined"):
        sim._probed_lists(queries, "embedding", seeds, nprobe=1)
    monkeypatch.setattr(sim, "MAX_DRIVER_QUERY_ROWS", 65_536)
    assert sim._probed_lists(queries, "embedding", seeds, nprobe=1)
