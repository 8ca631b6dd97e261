"""§2.9 — incremental ingestion as Structured Streaming.

The reference's "streaming" is event-driven orchestration: S3 event ->
SNS -> SQS -> Lambda -> Glue run (s3_to_glue/app.py:116-158), with a
reconciliation job re-publishing missed files
(raw_sync/app.py:513-573).  The Spark-native equivalents:

- file-arrival trigger  -> Structured Streaming file source +
  ``trigger(availableNow=True)``: each run processes exactly the files
  that arrived since the last checkpoint, then stops — the scheduled
  batch-incremental model the reference implements by hand.
- replay safety         -> at-least-once file delivery + W1 keyed-latest
  dedup downstream = effective exactly-once (same argument the
  reference relies on).
- raw_sync reconcile    -> an anti-join of source vs sink file manifests
  (J1 reused on file listings).

No watermarks/stateful operators are needed for parity (the reference
has none); windowed-aggregation helpers are provided for the extension
surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def incremental_ingest(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    checkpoint_path: str,
    output_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "json",
    partition_by: tuple[str, ...] = ("cohort",),
):
    """availableNow incremental run: new files -> transform -> parquet.

    Returns the StreamingQuery; callers ``awaitTermination()``.  Repeated
    invocations only process newly arrived files (checkpointed source
    offsets), mirroring the reference's event-driven increments.
    """
    reader = spark.readStream.schema(schema)
    stream = getattr(reader, fmt)(source_path)
    if transform is not None:
        stream = transform(stream)
    writer = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_path)
        .option("path", output_path)
        .trigger(availableNow=True)
        .outputMode("append")
    )
    parts = [p for p in partition_by if p in stream.columns]
    if parts:
        writer = writer.partitionBy(*parts)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Extension surface: tumbling-window counts with a watermark for
    late data.  Works on both batch and streaming DataFrames."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def reconcile_manifests(
    source_manifest: DataFrame,
    sink_manifest: DataFrame,
    key_cols: tuple[str, ...] = ("file_name",),
) -> DataFrame:
    """raw_sync semantics: files present at the source but missing from
    the sink (to be re-published).  A left-anti join on the manifest key
    (raw_sync/app.py:513-573)."""
    return source_manifest.join(
        F.broadcast(sink_manifest.select(*key_cols)), on=list(key_cols), how="left_anti"
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """True-streaming replay-safe dedup: ``dropDuplicatesWithinWatermark``.

    The streaming twin of W1 keyed dedup — at-least-once file replay
    (raw_sync re-publication) becomes exactly-once output, with state
    BOUNDED by the watermark instead of growing with the key universe:
    a key's state is evicted once the event-time watermark passes it,
    so 100 TB of history costs nothing; only the in-flight horizon
    (one replay window) is held.  Replays later than the watermark are
    instead absorbed by the batch W1 dedup downstream, the same
    two-layer argument the reference relies on.

    Works on batch DataFrames too (plain dropDuplicates on the keys)
    so the contract is testable in both modes.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(key_cols))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


_BUCKET_COL = "partition_bucket"


def merge_pipeline_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_root: str,
    index_fields: tuple[str, ...] | list[str],
    deleted: DataFrame | None = None,
    n_buckets: int = 32,
    order_fields: list[str] | None = None,
    tiebreakers: tuple[str, ...] = (),
) -> None:
    """Merge one micro-batch into the hash-bucketed pipeline state.

    The state is the CURRENT post-dedup post-delete parent table, laid
    out as a hive dataset partitioned by ``partition_bucket =
    pmod(xxhash64(keys), n_buckets)``.  Per batch:

    1. W1 keyed-latest dedup WITHIN the batch (mergeable: the argmax by
       the ordering columns is associative, so batch-then-merge equals
       one global dedup);
    2. read back ONLY the state buckets the batch touches (partition
       pruning — per-batch cost is O(batch + touched buckets), not
       O(corpus));
    3. union + dedup again, apply the J1 anti-delete (idempotent on
       already-filtered state rows);
    4. dynamic-partition-overwrite only the touched buckets.

    Replay-idempotent WITHOUT batch-id bookkeeping: re-merging an
    already-applied batch reproduces each touched bucket byte-for-byte,
    because dedup/anti-join are idempotent and the ordering argmax is
    deterministic (callers pass ``tiebreakers`` when the ordering
    columns can tie, same contract as ``dedup_latest``).

    The bucket column uses the synthetic-partition prefix, so the S3
    ``drop_synthetic_partitions`` step strips it on read — downstream
    consumers never see the layout column.  (On a format with native
    MERGE — Delta/Iceberg — steps 2-4 become one MERGE INTO; this is
    the same topology expressed on plain parquet.)
    """
    import os

    from recover_spark.operators.dedup import dedup_latest
    from recover_spark.operators.deletes import drop_deleted
    from recover_spark.sources.writers import overwrite_partitions_dynamic

    keys = list(index_fields)
    bucket = F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    fresh = dedup_latest(
        batch, keys, order_fields=order_fields, tiebreakers=list(tiebreakers)
    ).withColumn(_BUCKET_COL, bucket)
    touched = [r[0] for r in fresh.select(_BUCKET_COL).distinct().collect()]
    if not touched:
        return
    merged = fresh
    if os.path.isdir(state_root):
        # eager local checkpoint breaks lineage so the dynamic overwrite
        # below is not reading the files it replaces; materialized size
        # is bounded by the touched buckets
        existing = (
            spark.read.parquet(state_root)
            .filter(F.col(_BUCKET_COL).isin(touched))
            .localCheckpoint(eager=True)
        )
        merged = existing.unionByName(fresh)
    merged = dedup_latest(
        merged, keys, order_fields=order_fields, tiebreakers=list(tiebreakers)
    )
    if deleted is not None:
        merged = drop_deleted(merged, deleted, keys)
    overwrite_partitions_dynamic(merged, state_root, [_BUCKET_COL])


def incremental_dataset_pipeline(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    checkpoint_path: str,
    state_root: str,
    index_fields: tuple[str, ...] | list[str],
    deleted: DataFrame | None = None,
    n_buckets: int = 32,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    order_fields: list[str] | None = None,
    tiebreakers: tuple[str, ...] = (),
    drift_state: str | None = None,
    categorical_drift_state: str | None = None,
):
    """The FULL reference pipeline as one availableNow stream: ingest ->
    W1 dedup -> J1 anti-delete, maintained incrementally over file
    arrivals; relationalize + read happen from the maintained state via
    ``pipeline_tables_from_state``.

    Each run processes exactly the files the checkpoint has not seen
    (the reference's event-driven weekly increments), and the resulting
    state equals the one-shot batch pipeline over ALL files to date —
    the equivalence the end-to-end twin test pins, including a
    mid-stream at-least-once replay.

    ``drift_state`` composes drift-ON-ARRIVAL into the same run
    (VERDICT r6 #7): when set, every micro-batch also folds its binned
    counts into the streaming PSI state at that path
    (streaming/drift.py) — the baseline must have been frozen there
    once via ``freeze_drift_baseline``.  ``categorical_drift_state``
    is the categorical twin (frozen via
    ``freeze_categorical_baseline``).  Every fold is independently
    replay-safe (the state merge is idempotent by construction, the
    drift merges per batch id via their sidecars), so a crash between
    them converges on replay; read-side PSI equals the batch monitor
    over the same arrivals exactly (binned counts are additive).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = getattr(reader, fmt)(source_path)

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        merge_pipeline_batch(
            spark,
            batch,
            state_root,
            index_fields,
            deleted=deleted,
            n_buckets=n_buckets,
            order_fields=order_fields,
            tiebreakers=tiebreakers,
        )
        if drift_state is not None:
            from recover_spark.streaming.drift import merge_drift_counts

            merge_drift_counts(spark, batch, drift_state, _batch_id)
        if categorical_drift_state is not None:
            from recover_spark.streaming.drift import (
                merge_categorical_drift_counts,
            )

            merge_categorical_drift_counts(
                spark, batch, categorical_drift_state, _batch_id
            )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def pipeline_tables_from_state(
    spark: SparkSession,
    state_root: str,
    name: str,
    index_fields: tuple[str, ...] | list[str],
) -> dict[str, DataFrame]:
    """Read the maintained state and produce the pipeline's output
    tables — the same flat-vs-nested routing as the batch
    ``DatasetPipeline.build`` (relationalize when nested, identity
    otherwise), with the layout bucket stripped as a synthetic
    partition column."""
    from recover_spark.functions.transforms import drop_synthetic_partitions
    from recover_spark.operators.relationalize import (
        has_nested_fields,
        relationalize,
    )

    df = drop_synthetic_partitions(spark.read.parquet(state_root))
    if has_nested_fields(df.schema):
        carry = list(index_fields) + [
            c for c in ("cohort", "ParticipantID") if c in df.columns
        ]
        return relationalize(df, name, carry_cols=carry)
    return {name: df}


def _migrate_legacy_unpartitioned(path: str) -> int:
    """One-time layout migration for the r6 switch to ``__batch=<id>``
    hive partitioning: a state/output directory written by the earlier
    UNPARTITIONED layout holds root-level parquet files, and mixing
    those with ``__batch=N`` subdirectories breaks Spark's partition
    discovery.  Fold any root-level data files into a ``__batch=-1``
    partition (the same convention ``compact_dedup_state`` uses for
    compacted state) so old and new layouts compose.  Content is
    unchanged — dedup semantics never depend on which partition a row
    lives in.  Returns the number of files moved."""
    import glob
    import os

    if not os.path.isdir(path):
        return 0
    legacy = [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ]
    if not legacy:
        return 0
    dest = os.path.join(path, "__batch=-1")
    os.makedirs(dest, exist_ok=True)
    for f in legacy:
        os.rename(f, os.path.join(dest, os.path.basename(f)))
    success = os.path.join(path, "_SUCCESS")
    if os.path.isfile(success):
        os.remove(success)
    return len(legacy)


def dedup_against_corpus(
    stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    output_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Incremental corpus dedup: emit only documents whose content
    digest has never been seen across ALL previous runs, and remember
    the new digests — the streaming twin of ``ops.exact_dedup`` for a
    corpus that grows batch by batch (the ingest shape of a training-
    data pipeline: every crawl drop dedups against everything already
    accepted, not just its own batch).

    Per micro-batch (``foreachBatch``): W1-style within-batch dedup
    (lowest id per digest), anti-join against the persisted digest
    table, append survivors to ``output_path`` and their digests to
    ``state_path``.  State is O(distinct digests) and append-only;
    at-least-once replays are harmless because a replayed digest is
    already in the state and anti-joins away — the idempotence comes
    from the dedup semantics themselves, no batch-id bookkeeping
    needed.  At 100 TB the anti-join shuffles on the digest (uniform,
    skew-free) and the state table is a fraction of the corpus bytes
    (digest + id only).
    """
    import os

    from pyspark.sql import Window

    spark = stream.sparkSession

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        _migrate_legacy_unpartitioned(state_path)
        _migrate_legacy_unpartitioned(output_path)
        digest = F.md5(F.lower(F.trim(F.col(text_col))))
        w = Window.partitionBy("__digest").orderBy(F.col(id_col))
        fresh = (
            batch.withColumn("__digest", digest)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.isdir(state_path):
            seen = spark.read.parquet(state_path).select("__digest")
            fresh = fresh.join(seen, on="__digest", how="left_anti")
        fresh = fresh.persist()
        try:
            # Both sinks are partitioned by batch id with DYNAMIC
            # partition overwrite: a replay (crash after either write)
            # REPLACES its own partition instead of appending a second
            # copy — per-batch idempotence by construction (ADVICE r5),
            # with no cross-batch coordination.
            fresh.drop("__digest").withColumn(
                "__batch", F.lit(_batch_id)
            ).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("__batch").parquet(output_path)
            fresh.select("__digest").withColumn(
                "__batch", F.lit(_batch_id)
            ).write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("__batch").parquet(state_path)
        finally:
            fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def near_dedup_against_corpus(
    stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    output_path: str,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Incremental NEAR-dedup: emit only documents that are not cosine
    near-duplicates of anything already accepted — across ALL previous
    runs — and index what was accepted.  The near-dup twin of
    ``dedup_against_corpus``: exact digests catch byte-identical
    re-crawls; this catches the reworded ones, at the same
    O(batch)-per-batch cost, by composing the batch AP-SS join (within
    the arriving batch) with the persisted text-index probe (against
    everything accepted before).

    Per micro-batch (``foreachBatch``):

    1. within-batch near-dedup: AP-SS pairs at ``threshold``, resolved
       by the greedy lower-id crawl rule computed TRANSITIVELY
       (``greedy_survivors``): a doc is dropped only if a KEPT
       lower-id near-duplicate exists — in a chain A~B, B~C with
       A!~C, the survivors are {A, C}, so every dropped doc has a
       kept near-duplicate representative (ADVICE r5: the old
       drop-every-doc_b rule silently over-deleted C);
    2. probe the text index: survivors matching any indexed doc at or
       above ``threshold`` are dropped;
    3. write the kept docs to ``output_path/__batch=<id>`` (dynamic
       partition OVERWRITE — a replayed batch replaces its own
       partition instead of appending a second copy, closing the
       crash window between the output write and the index append:
       ADVICE r5) and append them into the index
       (``append_text_index`` — bucket partitions, existing files
       untouched).

    Replay safety is threefold.  A ``_applied_batch`` sidecar (written
    LAST) makes a fully-applied batch's replay a strict no-op — the
    index append is not idempotent, so the marker is load-bearing,
    like the KLL matview's.  The per-batch output partition makes the
    output write idempotent on its own, covering a crash BEFORE the
    index append.  Inside the crash window after the index append but
    before the marker, the probe itself converges the replay: every
    already-indexed document matches its own stored copy at cosine 1.0
    and is dropped, so the index never receives duplicate postings —
    and the output partition is overwritten with that (identical)
    kept set.
    """
    import os

    from recover_spark.ops.apss import cosine_threshold_pairs
    from recover_spark.ops.dedup_text import greedy_survivors
    from recover_spark.ops.text_index import (
        META_NAME,
        append_text_index,
        build_text_index,
        probe_text_index,
    )

    marker = os.path.join(index_path, "_applied_batch")

    def _applied() -> int:
        try:
            with open(marker) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _write_output(kept: DataFrame, batch_id: int) -> None:
        kept.withColumn("__batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "__batch"
        ).parquet(output_path)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _applied():
            return
        _migrate_legacy_unpartitioned(output_path)
        pairs = cosine_threshold_pairs(
            batch, threshold, id_col=id_col, text_col=text_col
        )
        survivors = greedy_survivors(
            pairs, batch.select(id_col), node_col=id_col
        )
        kept = batch.join(survivors, id_col, "left_semi")
        if os.path.exists(os.path.join(index_path, META_NAME)):
            hits = probe_text_index(
                kept, index_path, threshold,
                id_col=id_col, text_col=text_col,
            ).select(F.col("new_id").alias(id_col)).distinct()
            kept = kept.join(hits, id_col, "left_anti")
            kept = kept.localCheckpoint()  # bound lineage across writes
            _write_output(kept, batch_id)
            append_text_index(kept, index_path, id_col, text_col)
        else:
            kept = kept.localCheckpoint()
            _write_output(kept, batch_id)
            build_text_index(kept, index_path, id_col, text_col)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_dedup_state(spark, state_path: str) -> dict:
    """Maintenance pass for ``dedup_against_corpus``'s digest state:
    every batch leaves one ``__batch=<id>`` partition (the idempotent
    per-batch overwrite), so after a year of arrivals the anti-join
    pays one file-open per historical batch.  Compaction folds the
    distinct digests into a single ``__batch=-1`` partition via the
    matview's crash-safe two-rename swap — a reader at any instant
    sees either the old generation or the new, and the digest SET is
    identical before and after (dedup semantics are wholly insensitive
    to which partition a digest lives in).  Returns
    {"files_before": x, "files_after": y}.
    """
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as _F

    from recover_spark.streaming.matview import _recover_state, _swap_state

    _recover_state(state_path)

    def n_files() -> int:
        return len(
            _glob.glob(_os.path.join(state_path, "**", "*.parquet"),
                       recursive=True)
        )

    before = n_files()
    digests = (
        spark.read.parquet(state_path)
        .select("__digest")
        .distinct()
        .localCheckpoint(eager=True)  # materialize before the swap
    )
    tmp = state_path + ".tmp"
    digests.withColumn("__batch", _F.lit(-1)).coalesce(1).write.mode(
        "overwrite"
    ).partitionBy("__batch").parquet(tmp)
    _swap_state(tmp, state_path)
    return {"files_before": before, "files_after": n_files()}


def ingest_vectors_stream(
    stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Streaming ingest into the persisted IVF index — the vector twin
    of ``near_dedup_against_corpus``'s index maintenance, completing
    the ANN lifecycle (build/append/probe/compact/rebuild/delete + now
    arrival-driven ingest): each availableNow micro-batch of new
    embeddings assigns map-side against the stored centroids and lands
    in its hive list partitions.

    The FIRST batch builds the index (freezing the coarse quantizer
    from that batch's seed rows); every later batch appends against
    the frozen centroids.  Appends are not idempotent, so an
    ``_applied_batch`` sidecar (written last, atomic rename) makes a
    replayed batch a strict no-op — the same marker contract as the
    KLL matview and the text-index ingest.
    """
    import os

    from recover_spark.ops.similarity import (
        append_ivf_index,
        build_ivf_index,
    )

    marker = os.path.join(index_path, "_applied_batch")

    def _applied() -> int:
        try:
            with open(marker) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _applied():
            return
        if os.path.isdir(os.path.join(index_path, "_centroids")):
            append_ivf_index(batch, index_path, id_col, vec_col)
        else:
            build_ivf_index(
                batch, index_path, n_centroids=n_centroids,
                id_col=id_col, vec_col=vec_col,
            )
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
