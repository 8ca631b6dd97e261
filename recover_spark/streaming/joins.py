"""Watermarked stream-stream join (§2.9 extension surface).

The reference correlates two event flows only in batch (J4 audit
merge: access counts vs creation counts).  The streaming-native
version is a stream-stream equi-join with an event-time range bound:
each side is watermarked, and the join condition's time range tells
Spark exactly how long a row must be buffered before it can be
dropped — state stays BOUNDED by (watermark + range), independent of
stream length.  Without the time bound, stream-stream join state
grows forever; with it, this runs indefinitely at any scale.

Batch DataFrames take the same code path minus watermarks (the range
predicate alone), so the join semantics are testable against a plain
batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to ``left`` on ``key`` where the right
    event happens within ``[left_ts, left_ts + max_delay]``.

    Column names on the right side are suffixed ``_r`` (key excluded)
    so both event times survive into the output.  On streaming inputs
    both sides get ``withWatermark`` — required by Spark to bound join
    state and emit in append mode.

    ``how="left_outer"`` keeps left rows with no in-window partner
    (nulls on the right) — on a stream, Spark emits an unmatched left
    row only once the watermark proves no partner can still arrive, so
    outer results are delayed by (watermark + range) but state stays
    bounded exactly as in the inner case.  Batch inputs take the same
    code path minus watermarks and emit immediately.
    """
    lt = left
    # the right key gets its own name so the post-join drop can never
    # resolve to the LEFT key (drop(rt[key]) does exactly that under
    # left_outer, nulling the key of unmatched rows)
    rt = right.select(
        F.col(key).alias("__rkey"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c != key
        ],
    )
    if lt.isStreaming:
        lt = lt.withWatermark(left_ts, watermark)
    if rt.isStreaming:
        rt = rt.withWatermark(f"{right_ts}_r", watermark)
    cond = (
        (lt[key] == F.col("__rkey"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts))
        & (
            F.col(f"{right_ts}_r")
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lt.join(rt, cond, how).drop("__rkey")


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream (the streaming twin of the reference's J2-style re-key —
    src/glue/jobs/json_to_parquet.py joins parent index onto children).

    The static side is broadcast into every micro-batch, so the stream
    is NEVER shuffled and no join state accrues — unlike stream-stream,
    a stream-static join is stateless by construction (each micro-batch
    re-reads the dim snapshot; at 100 TB the dim is the small side or
    it should be a stream).  Works identically on a batch left side,
    which is the test twin.
    """
    cols = dim_cols or [c for c in dim.columns if c != key]
    d = dim.select(key, *cols)
    return stream.join(F.broadcast(d), on=key, how=how)
