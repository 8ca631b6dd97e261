"""Temporal join operators: as-of join and range (interval) join.

The reference has no temporal joins (SURVEY.md §2.3 — equi-keys only);
these are scale-path extensions every time-series / training-data
pipeline needs, expressed so the physical plan stays shuffle-lean:

- **As-of join** via the union+window formulation: instead of a
  per-row range probe (which Spark would plan as a broadcast
  nested-loop or an exploded theta join), both sides are unioned and a
  single window pass per key carries the most recent right-side row
  forward.  ONE shuffle, keyed on the join key — the same cost as a
  plain equi-join, regardless of how many right rows precede each left
  row.  This is the standard distributed as-of strategy (a sort-merge
  over (key, ts)); at 100 TB the shuffle is on the join key so AQE skew
  handling applies as usual.

- **Range join** via bucketed expansion: intervals are exploded into
  fixed-width time buckets and points joined on (key, bucket) — an
  equi-join Catalyst can hash/sort-merge — then the exact containment
  predicate filters within the bucket.  The alternative (inequality-
  only join) degenerates to BroadcastNestedLoopJoin, which is O(n*m)
  and unusable at scale.  Bucket width trades shuffle fan-out
  (intervals spanning many buckets duplicate) against candidate
  filtering; callers size it near the typical interval length.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.local import tiny_df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join per key, left-outer semantics, pandas ``merge_asof``
    direction family:

    - ``"backward"`` (default): most recent right row with
      ``right.ts <= left.ts``;
    - ``"forward"``: earliest right row with ``right.ts >= left.ts``;
    - ``"nearest"``: whichever of the two is closer in time (ties go
      backward, matching pandas).

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except the keys and ``right_ts``).  With
    ``tolerance_seconds`` set, matches farther than the tolerance are
    nulled out (pandas ``merge_asof(tolerance=...)`` semantics).

    Right rows must be unique per (key, right_ts) — ambiguous same-
    timestamp rows would make the result nondeterministic; pre-aggregate
    the right side if needed.

    Plan shape: union -> single Exchange on ``on`` -> window sort by
    (ts, side) -> filter.  ``nearest`` adds a second window SORT over
    the same partitioning (no second exchange).  No nested-loop, no
    interval explosion.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    right_cols = list(right_cols)

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at equal __ts -> inclusive match.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward pass: same partitioning (no second Exchange), reversed
    # sort; right rows again first at equal __ts for inclusiveness.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _carry(w: Window, tag: str):
        return [
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True)
                .over(w)
                .alias(f"__{tag}_{c}")
                for c in right_cols
            ],
            F.last(
                F.when(F.col("__is_left") == 0, F.col("__ts")),
                ignorenulls=True,
            ).over(w).alias(f"__{tag}_ts"),
        ]

    carries = []
    if direction in ("backward", "nearest"):
        carries += _carry(w_back, "b")
    if direction in ("forward", "nearest"):
        carries += _carry(w_fwd, "f")
    carried = unioned.select("*", *carries)

    out = carried.filter(F.col("__is_left") == 1)
    tol_us = (
        int(tolerance_seconds) * 1_000_000
        if tolerance_seconds is not None
        else None
    )

    def _stale(match_ts: Column, delta_us: Column) -> Column:
        # Compare at microsecond precision — unix_timestamp truncates
        # to seconds, mis-classifying sub-second staleness at the edge.
        cond = match_ts.isNull()
        if tol_us is not None:
            cond = cond | (delta_us > F.lit(tol_us))
        return cond

    b_delta = F.unix_micros("__ts") - F.unix_micros(F.col("__b_ts"))
    f_delta = F.unix_micros(F.col("__f_ts")) - F.unix_micros("__ts")
    if direction == "backward":
        pick = [
            F.when(
                _stale(F.col("__b_ts"), b_delta), F.lit(None)
            ).otherwise(F.col(f"__b_{c}")).alias(c)
            for c in right_cols
        ]
    elif direction == "forward":
        pick = [
            F.when(
                _stale(F.col("__f_ts"), f_delta), F.lit(None)
            ).otherwise(F.col(f"__f_{c}")).alias(c)
            for c in right_cols
        ]
    else:  # nearest: closer side wins, ties backward (pandas semantics)
        b_ok = ~_stale(F.col("__b_ts"), b_delta)
        f_ok = ~_stale(F.col("__f_ts"), f_delta)
        use_b = b_ok & (~f_ok | (b_delta <= f_delta))
        pick = [
            F.when(use_b, F.col(f"__b_{c}"))
            .when(f_ok, F.col(f"__f_{c}"))
            .otherwise(F.lit(None))
            .alias(c)
            for c in right_cols
        ]
    keep = [*on, F.col("__ts").alias(left_ts)]
    keep += [F.col(c) for c in left.columns if c not in (*on, left_ts)]
    keep += pick
    return out.select(*keep)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    interval_start: str = "start",
    interval_end: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join points to intervals containing them:
    ``start <= point_ts < end`` within matching keys.

    Physical strategy: explode each interval into the epoch-time buckets
    it overlaps (``sequence(floor(start/w), floor((end-eps)/w))``), give
    each point its bucket, equi-join on (keys..., bucket), then apply
    the exact predicate and drop the bucket.  Intervals spanning B
    buckets appear B times pre-filter — size ``bucket_seconds`` near the
    typical interval length so B stays O(1).  A point falls in exactly
    one bucket, so no post-join dedup is needed.
    """
    on = list(on)
    # Bucket on microseconds with exact integer division — second-truncated
    # unix_timestamp drops the final partial bucket of sub-second intervals,
    # silently missing points in it.  Positive epochs: div == floor.
    w_us = int(bucket_seconds) * 1_000_000
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({interval_start}) div {w_us}"),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into the next bucket
                F.expr(f"(unix_micros({interval_end}) - 1) div {w_us}"),
            )
        ),
    )
    pts = points.withColumn(
        "__bucket", F.expr(f"unix_micros({point_ts}) div {w_us}")
    )
    joined = pts.join(ivals, on=on + ["__bucket"]).filter(
        (F.col(point_ts) >= F.col(interval_start))
        & (F.col(point_ts) < F.col(interval_end))
    )
    return joined.drop("__bucket")


def gap_detect(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    interval_s: int = 3600,
) -> DataFrame:
    """Per-key coverage-gap report: maximal runs of ``interval_s``
    buckets between a key's first and last observation that contain NO
    data — "sensor X went dark for 6 hours on Tuesday", the
    missing-data complement to ``resample_forward_fill`` (which papers
    over gaps; this one REPORTS them — a feed can forward-fill its way
    through an outage the count audits never see).

    Scale shape: observations collapse to distinct (key, bucket) —
    one shuffle with map-side combine; per-key bounds feed a generated
    ``sequence`` grid (distributed explode, never the driver); missing
    buckets come from a left-anti join; consecutive missing buckets
    run-length compress with the gaps-and-islands trick (bucket index
    minus row_number is constant per run).  The islands window runs
    over MISSING buckets only — a key missing everything is bounded by
    its grid (timespan / interval), independent of observation count.

    Output: (key, gap_start epoch-seconds, gap_end epoch-seconds
    inclusive-start exclusive-end, n_missing).  Keys with no gaps are
    absent; NULL timestamps are ignored.
    """
    iv = int(interval_s)
    nn = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(iv * 1_000_000))
        .cast("long")
        .alias("__b"),
    )
    observed = nn.distinct()
    bounds = observed.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        "__k", F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    missing = grid.join(observed, ["__k", "__b"], "left_anti")
    w = Window.partitionBy("__k").orderBy("__b")
    runs = missing.withColumn(
        "__run", F.col("__b") - F.row_number().over(w)
    )
    return (
        runs.groupBy(F.col("__k").alias(key_col), "__run")
        .agg(
            (F.min("__b") * iv).alias("gap_start"),
            ((F.max("__b") + 1) * iv).alias("gap_end"),
            F.count(F.lit(1)).cast("long").alias("n_missing"),
        )
        .drop("__run")
        .orderBy(key_col, "gap_start")
    )


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    interval_s: int = 3600,
) -> DataFrame:
    """Per-key fixed-interval resampling with forward fill.

    The canonical wearable/time-series regularization the reference's
    domain needs downstream (irregular device samples -> a dense,
    equally-spaced grid): per key, buckets of ``interval_s`` seconds
    from the key's first to last observation; each bucket takes its
    LATEST observation (argmax by (ts, value) via ordered-struct max —
    deterministic under ts ties, no window pass); empty buckets forward-fill the
    previous value with ``last(..., ignorenulls)``.

    Scale shape: one groupBy shuffle on (key, bucket) with map-side
    partial argmax, a per-key bounds aggregate feeding a generated grid
    (``sequence`` + ``explode`` — rows materialize distributed, never
    on the driver), a key-bucket equi-join, and one window pass keyed
    on ``key_col``.  Everything shuffles on the key, so AQE skew
    handling applies; grid size is bounded by timespan/interval per
    key, independent of observation count.

    Output: (key, bucket_start epoch-seconds, value, filled flag).
    """
    us = F.lit(int(interval_s) * 1_000_000)
    bucket = (
        F.floor(F.unix_micros(F.col(ts_col)) / us).cast("long")
        * F.lit(int(interval_s))
    ).alias("bucket_start")

    per_bucket = (
        df.select(F.col(key_col), bucket, F.col(ts_col), F.col(value_col))
        .groupBy(key_col, "bucket_start")
        .agg(
            F.max(F.struct(F.col(ts_col), F.col(value_col))).alias("__best")
        )
        .select(
            key_col,
            "bucket_start",
            F.col(f"__best.{value_col}").alias("__observed"),
        )
    )

    grid = (
        df.select(F.col(key_col), bucket)
        .groupBy(key_col)
        .agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(interval_s)))
            ).alias("bucket_start"),
        )
    )

    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket_start"], "left")
        .select(
            key_col,
            "bucket_start",
            F.last("__observed", ignorenulls=True).over(w).alias(value_col),
            F.col("__observed").isNull().alias("filled"),
        )
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    interval_s: int = 3600,
) -> DataFrame:
    """Per-key fixed-interval resampling with LINEAR interpolation.

    Same dense grid as :func:`resample_forward_fill`, but empty buckets
    take the straight line between the surrounding observed buckets
    (sensor gap-filling where a step function distorts downstream
    rates).  Grid edges clamp to the nearest observation.

    Scale shape identical to forward fill: one (key, bucket) aggregate,
    the generated grid, one equi-join, then TWO frame-bounded window
    expressions over the SAME (key, bucket) window — previous observed
    (value, bucket) carried by ``last(..., ignorenulls)`` over the
    trailing frame and next observed by ``first(..., ignorenulls)``
    over the leading frame.  Catalyst evaluates both in one window
    exchange because partitioning/ordering match; nothing beyond the
    key shuffle.

    Output: (key, bucket_start, value — observed or interpolated and
    rounded to 6 decimals for engine-portable comparison, filled flag).
    """
    us = F.lit(int(interval_s) * 1_000_000)
    bucket = (
        F.floor(F.unix_micros(F.col(ts_col)) / us).cast("long")
        * F.lit(int(interval_s))
    ).alias("bucket_start")

    per_bucket = (
        df.select(F.col(key_col), bucket, F.col(ts_col), F.col(value_col))
        .groupBy(key_col, "bucket_start")
        .agg(F.max(F.struct(F.col(ts_col), F.col(value_col))).alias("__best"))
        .select(
            key_col,
            "bucket_start",
            F.col(f"__best.{value_col}").alias("__observed"),
        )
    )

    grid = (
        df.select(F.col(key_col), bucket)
        .groupBy(key_col)
        .agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(interval_s)))
            ).alias("bucket_start"),
        )
    )

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_struct = F.when(
        F.col("__observed").isNotNull(),
        F.struct(F.col("bucket_start").alias("b"), F.col("__observed").alias("v")),
    )
    joined = (
        grid.join(per_bucket, [key_col, "bucket_start"], "left")
        .withColumn("__prev", F.last(obs_struct, ignorenulls=True).over(w_prev))
        .withColumn("__next", F.first(obs_struct, ignorenulls=True).over(w_next))
    )
    prev_v, prev_b = F.col("__prev.v"), F.col("__prev.b")
    next_v, next_b = F.col("__next.v"), F.col("__next.b")
    interp = (
        F.when(F.col("__observed").isNotNull(), F.col("__observed"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * (F.col("bucket_start") - prev_b)
            / (next_b - prev_b)
        )
    )
    # Lerp of fixed-decimal inputs over integer bucket spans yields exact
    # rationals that can sit ON a 6-decimal rounding boundary (…5625 ->
    # tie at digit 7); 1-ulp float differences between engines then flip
    # the rounding direction.  The 1e-9 nudge moves every tie decisively
    # above the boundary in both engines (realistic spans cannot produce
    # a value within 1e-9 of a boundary without being on it).
    return joined.select(
        key_col,
        "bucket_start",
        F.round(interp + F.lit(1e-9), 6).alias(value_col),
        F.col("__observed").isNull().alias("filled"),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 20,
    min_points: int = 5,
    threshold: float = 3.0,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Per-key trailing-window z-score anomaly detection.

    Each observation is scored against the mean/stddev of the previous
    ``lookback`` observations of the SAME key (the point itself is
    excluded from its own baseline, so a spike cannot mask itself);
    points whose |z| exceeds ``threshold`` are flagged.  Rows with
    fewer than ``min_points`` of history pass unflagged (cold start).

    Scale shape: ONE window exchange keyed on ``key_col`` — mean,
    stddev, and count over the identical frame are evaluated in the
    same window pass (matching partitioning + ordering + frame), so the
    cost equals a single per-key sort regardless of how many statistics
    are read.  No joins, no second shuffle; AQE skew handling applies
    to hot keys.

    The z-score is rounded to 6 decimals BEFORE thresholding so the
    flag is reproducible across engines (stddev accumulation order
    differs between Spark and an external oracle in the last ulp).
    Pass ``tiebreakers`` (e.g. a unique event id) when (key, ts) is not
    unique — a ROWS frame under an ambiguous ordering is otherwise
    nondeterministic.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreakers]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-int(lookback), -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.round((F.col(value_col) - mean) / sd, 6)
    return df.select(
        key_col,
        ts_col,
        *tiebreakers,
        value_col,
        F.round(mean, 6).alias("baseline_mean"),
        n.alias("baseline_n"),
        F.when(
            (n >= F.lit(int(min_points))) & (sd > F.lit(0.0)),
            z,
        ).alias("zscore"),
        (
            (n >= F.lit(int(min_points)))
            & (sd > F.lit(0.0))
            & (F.abs(z) > F.lit(float(threshold)))
        ).alias("is_anomaly"),
    )


def rolling_zscore_time_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
    min_points: int = 5,
    threshold: float = 3.0,
    chunk_s: int | None = None,
) -> DataFrame:
    """Time-windowed z-score anomalies: each point scored against the
    strictly-earlier observations of its key within the trailing
    ``window_s`` seconds (a RANGE frame — no tiebreakers needed, the
    strict time bound makes it deterministic even with duplicate
    timestamps).

    ``chunk_s`` is the HOT-KEY scale path.  A window partition is one
    sorted run: a key owning 20% of a 100 TB stream becomes one stuck
    task, and AQE cannot split window partitions (the skew probe
    measures the plain form at ~2x under a 20% hot key).  With
    ``chunk_s`` (must be >= ``window_s``) the key's timeline splits
    into chunks scored in parallel, and EXACTNESS is preserved by
    overlap carry: rows in the last ``window_s`` of a chunk are
    duplicated into the next chunk as context-only rows (they feed
    frames, then drop from the output).  A RANGE frame makes the carry
    exact — the context a chunk's earliest row needs is precisely the
    rows within ``window_s`` behind it, which is what was carried;
    a ROWS frame could not bound its context by time, which is why the
    per-row variant (:func:`rolling_zscore_anomalies`) cannot chunk.

    Cost: duplicated rows ~= window_s/chunk_s of the input (map-side
    union of two scans); shuffle key gains the chunk id.
    """
    t_us = int(window_s) * 1_000_000
    base = df.withColumn("__t", F.unix_micros(F.col(ts_col)))
    if chunk_s is None:
        part = [key_col]
        frame = base.withColumn("__ctx", F.lit(False))
    else:
        if chunk_s < window_s:
            raise ValueError("chunk_s must be >= window_s for exact carry")
        c_us = int(chunk_s) * 1_000_000
        chunked = base.withColumn("__chunk", F.expr(f"__t div {c_us}"))
        ctx = (
            chunked.filter(
                F.col("__t") >= (F.col("__chunk") + 1) * c_us - t_us
            )
            .withColumn("__chunk", F.col("__chunk") + 1)
            .withColumn("__ctx", F.lit(True))
        )
        frame = chunked.withColumn("__ctx", F.lit(False)).unionByName(ctx)
        part = [key_col, "__chunk"]

    w = (
        Window.partitionBy(*part)
        .orderBy("__t")
        .rangeBetween(-t_us, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.round((F.col(value_col) - mean) / sd, 6)
    out = frame.select(
        key_col,
        ts_col,
        value_col,
        F.col("__ctx"),
        F.round(mean, 6).alias("baseline_mean"),
        n.alias("baseline_n"),
        F.when((n >= F.lit(int(min_points))) & (sd > F.lit(0.0)), z).alias(
            "zscore"
        ),
        (
            (n >= F.lit(int(min_points)))
            & (sd > F.lit(0.0))
            & (F.abs(z) > F.lit(float(threshold)))
        ).alias("is_anomaly"),
    )
    return out.filter(~F.col("__ctx")).drop("__ctx")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join interval pairs that OVERLAP within matching keys:
    ``l_start < r_end AND r_start < l_end`` (half-open intervals) —
    the interval×interval sibling of :func:`range_join` (episode
    alignment: device-wear sessions vs medication windows, etc.).

    Physical strategy: both sides explode into the epoch buckets they
    cover and equi-join on (keys..., bucket), same as range_join — but
    an overlapping pair shares potentially MANY buckets, so instead of
    a post-join distinct (a second shuffle over the whole result) the
    join keeps a pair only in its FIRST shared bucket, which is always
    ``floor(max(l_start, r_start) / w)``: one extra predicate, zero
    extra shuffles, exact single-count output.

    A nested-loop/theta formulation is O(n*m); this stays an equi-join
    whose fan-out is interval_span/bucket_seconds per row.
    """
    on = list(on)
    w_us = int(bucket_seconds) * 1_000_000

    def exploded(df: DataFrame, start: str, end: str) -> DataFrame:
        # empty/inverted intervals are dropped: they overlap nothing,
        # and (end-1) div w < start div w would otherwise make
        # `sequence` generate a DESCENDING bucket range (phantom rows)
        return df.filter(F.col(start) < F.col(end)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start}) div {w_us}"),
                    F.expr(f"(unix_micros({end}) - 1) div {w_us}"),
                )
            ),
        )

    l = exploded(left, left_start, left_end)
    r = exploded(right, right_start, right_end)
    joined = l.join(r, on=on + ["__bucket"]).filter(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        # count each overlapping pair exactly once: in the first bucket
        # both intervals share, = the bucket of the later start
        & (
            F.expr(
                f"greatest(unix_micros({left_start}), "
                f"unix_micros({right_start})) div {w_us}"
            )
            == F.col("__bucket")
        )
    )
    return joined.drop("__bucket")


def ewma_smooth(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    chunk_rows: int | None = None,
) -> DataFrame:
    """Exact per-series exponential smoothing (EWMA), the sequential
    recurrence ``s_t = alpha*y_t + (1-alpha)*s_{t-1}`` (``s_1 = y_1``;
    pandas ``ewm(adjust=False)``), parallelized as a chunked affine
    scan — no sequential pass over the series anywhere.

    The recurrence is affine, so a CHUNK of rows composes to one affine
    map ``s_out = beta^len * s_in + B`` — the classic parallel-prefix
    treatment of linear recurrences (Blelloch scan), expressed entirely
    in Catalyst expressions:

    1. rows are numbered per key and cut into chunks of ``chunk_rows``;
       within a chunk the closed form ``s_local(p) = alpha * beta^p *
       cumsum(y_q * beta^-q)`` runs on ONE (key, chunk) window — the
       exponent never exceeds the chunk length, which is sized so
       ``beta^-chunk`` cannot overflow;
    2. per-chunk summaries (B = s_local at chunk end, cumulative row
       count N) roll up to a chunk-level table ~chunk_rows x smaller
       than the data;
    3. each chunk's INCOMING state folds the previous chunks' B over a
       BOUNDED window frame: contributions older than W chunks are
       below the smallest subnormal double (beta^(W*chunk) < 1e-323)
       and are identically zero in ANY double-precision evaluation —
       including the sequential reference — so the bounded frame loses
       nothing the sequential loop would keep.  W adapts to alpha:
       shallow smoothing (small alpha) genuinely remembers ~1/alpha
       rows and pays a proportionally wider (still bounded) frame.

    Plan shape: one exchange for the (key, chunk) windows, one
    key-level window over the small chunk table, one equi-join carrying
    the incoming state back to the rows.  A naive z-transform over the
    WHOLE series would overflow beyond ~709/ln(1/beta) rows (~1000 rows
    at alpha=0.5); the chunked scan has no length limit — pinned by a
    pandas-equality test on series 20x past that bound.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1) exclusive")
    beta = 1.0 - alpha
    ln_inv = -math.log(beta)
    # largest exponent the in-chunk z-transform may produce
    m = int(chunk_rows) if chunk_rows else max(8, min(128, int(700 / ln_inv)))
    # chunks whose influence is >= the smallest subnormal (~1e-323)
    w_chunks = max(1, math.ceil(745.0 / (m * ln_inv)))
    key_names = list(on)
    # ts_col may be a list whose tail breaks timestamp ties — the row
    # order must be total or the recurrence is nondeterministic
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)

    w_key = Window.partitionBy(*key_names).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    numbered = series.withColumn("__n", F.row_number().over(w_key))
    numbered = numbered.withColumn(
        "__chunk", ((F.col("__n") - 1) / m).cast("bigint")
    ).withColumn("__p", F.col("__n") - F.col("__chunk") * m)

    w_chunk = (
        Window.partitionBy(*key_names, "__chunk")
        .orderBy(F.asc("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col(value_col).cast("double")
    local = numbered.withColumn(
        "__s_local",
        F.lit(alpha)
        * F.pow(F.lit(beta), F.col("__p"))
        * F.sum(y * F.pow(F.lit(beta), -F.col("__p"))).over(w_chunk),
    )

    summaries = local.groupBy(*key_names, "__chunk").agg(
        F.max_by("__s_local", "__p").alias("__B"),
        F.count(F.lit(1)).alias("__len"),
        F.min_by(y, F.col("__n")).alias("__first"),  # only chunk 0's used
    )
    w_chunks_win = Window.partitionBy(*key_names).orderBy(F.asc("__chunk"))
    frame = (
        Window.partitionBy(*key_names)
        .orderBy(F.asc("__chunk"))
        .rowsBetween(-w_chunks, -1)
    )
    chunk_states = (
        summaries.withColumn(
            "__N", F.sum("__len").over(
                w_chunks_win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        .withColumn("__N_prev", F.col("__N") - F.col("__len"))
        .withColumn("__y1", F.first("__first").over(w_chunks_win))
        .withColumn(
            "__hist", F.collect_list(F.struct("__B", "__N")).over(frame)
        )
        .withColumn(
            "__s_in",
            F.aggregate(
                F.col("__hist"),
                F.lit(0.0),
                lambda acc, x: acc
                + x["__B"]
                * F.pow(F.lit(beta), F.col("__N_prev") - x["__N"]),
            )
            + F.pow(F.lit(beta), F.col("__N_prev")) * F.col("__y1"),
        )
        .select(*key_names, "__chunk", "__s_in")
    )

    joined = local.join(chunk_states, [*key_names, "__chunk"])
    return joined.withColumn(
        out_col,
        F.pow(F.lit(beta), F.col("__p")) * F.col("__s_in")
        + F.col("__s_local"),
    ).drop("__n", "__chunk", "__p", "__s_local", "__s_in")


def holt_smooth(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    alpha: float,
    gamma: float,
    level_col: str = "level",
    trend_col: str = "trend",
    chunk_rows: int | None = None,
) -> DataFrame:
    """Exact per-series Holt linear-trend smoothing (double exponential
    smoothing) — the 2-D sibling of ``ewma_smooth``, parallelized the
    same way: the coupled recurrence

        l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = gamma*(l_t - l_{t-1}) + (1-gamma)*b_{t-1}

    (``l_1 = y_1``, ``b_1 = 0``) is a LINEAR recurrence on the state
    vector ``x = (l, b)``: ``x_t = M x_{t-1} + y_t u`` with constant
    2x2 ``M`` and ``u = (alpha, gamma*alpha)``, so the chunked affine
    scan applies verbatim.  The matrix powers the scan needs come from
    Cayley-Hamilton, not lookup tables: a 2x2 matrix's powers live in
    ``span{I, M}``, so ``M^e = a_e*I + b_e*M`` with SCALAR
    coefficients in closed form from the eigenvalues (distinct-real /
    complex-pair / repeated cases, all pure pow/cos/sin column
    expressions of the exponent) — any exponent, graceful underflow,
    nothing precomputed per position.

    Numerics — two driver-computed bounds, both loud in the docible
    sense rather than silent:

    - chunk length is capped by the eigenvalue SPREAD
      ``(|lambda_max|/|lambda_min|)^len <~ 1e12``: inside a chunk the
      z-transform carries both eigencomponents at once, and a wide
      spread turns the final damping multiply into catastrophic
      cancellation (the scalar EWMA has one eigenvalue and never hits
      this) — plus the usual no-overflow cap on ``lambda_min^-len``;
    - the cross-chunk carry frame is sized by the DECAY
      ``|lambda_max|``: contributions past it are below the smallest
      subnormal double in ANY evaluation order, so the bounded frame
      is exact.  Requires ``|lambda_max| < 1`` (damped smoothing, true
      for 0 < alpha, gamma < 1; enforced).

    Returns the input plus ``level`` and ``trend``.
    """
    import cmath

    import numpy as np

    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1) exclusive")
    if not 0.0 < gamma < 1.0:
        raise ValueError("gamma must be in (0, 1) exclusive")
    mat = np.array(
        [[1 - alpha, 1 - alpha], [-gamma * alpha, 1 - gamma * alpha]]
    )
    u1, u2 = alpha, gamma * alpha
    eig = np.linalg.eigvals(mat)
    lam_max, lam_min = np.abs(eig).max(), np.abs(eig).min()
    if lam_max >= 1.0:
        raise ValueError(
            f"spectral radius {lam_max:.4f} >= 1: the recurrence does "
            "not damp and no bounded carry frame exists"
        )
    if lam_min <= 0.0:
        raise ValueError("singular transition matrix")
    spread = math.log(lam_max / lam_min)
    grow = -math.log(lam_min)
    if chunk_rows:
        mlen = int(chunk_rows)
    else:
        # spread^len <= e^20 keeps the in-chunk cancellation error
        # ~eps * e^20 ~ 1e-7 relative worst-case (stiff eigenvalue
        # ratios trade shorter chunks / wider carry frames for it)
        mlen = min(128, int(700 / grow), int(20 / spread) if spread > 1e-9 else 128)
        mlen = max(2, mlen)
    decay = -math.log(lam_max)
    w_chunks = max(1, math.ceil(745.0 / (mlen * decay)))

    # Cayley-Hamilton scalar coefficients: M^e = a(e)*I + b(e)*M.
    l1, l2 = eig[0], eig[1]

    def _ab(e):
        """(a_e, b_e) as Column expressions of integer exponent ``e``
        (a double-valued column; pow with negative base is exact for
        integral exponents)."""
        if abs(l1.imag) > 1e-12:  # complex conjugate pair
            r = abs(l1)
            th = abs(cmath.phase(l1))
            sin_th = math.sin(th)
            b = (
                F.pow(F.lit(r), e - 1) * F.sin(e * F.lit(th)) / F.lit(sin_th)
            )
            a = (
                F.pow(F.lit(r), e) * F.cos(e * F.lit(th))
                - b * F.lit(r * math.cos(th))
            )
            return a, b
        r1, r2 = l1.real, l2.real
        if abs(r1 - r2) > 1e-12 * max(abs(r1), abs(r2)):  # distinct real
            p1c, p2c = F.pow(F.lit(r1), e), F.pow(F.lit(r2), e)
            b = (p1c - p2c) / F.lit(r1 - r2)
            a = p1c - b * F.lit(r1)
            return a, b
        lam = r1  # repeated real root
        b = e * F.pow(F.lit(lam), e - 1)
        a = F.pow(F.lit(lam), e) * (1 - e)
        return a, b

    m11c, m12c = float(mat[0, 0]), float(mat[0, 1])
    m21c, m22c = float(mat[1, 0]), float(mat[1, 1])
    mu1 = m11c * u1 + m12c * u2  # (M u) components
    mu2 = m21c * u1 + m22c * u2

    def _apply_pow(e, v1, v2):
        """M^e @ (v1, v2) via a(e)*(v) + b(e)*(M v)."""
        a, b = _ab(e)
        mv1 = F.lit(m11c) * v1 + F.lit(m12c) * v2
        mv2 = F.lit(m21c) * v1 + F.lit(m22c) * v2
        return a * v1 + b * mv1, a * v2 + b * mv2

    key_names = list(on)
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w_key = Window.partitionBy(*key_names).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    numbered = (
        series.withColumn("__n", F.row_number().over(w_key))
        .withColumn("__chunk", ((F.col("__n") - 1) / mlen).cast("bigint"))
        .withColumn(
            "__p",
            (F.col("__n") - F.col("__chunk") * mlen).cast("double"),
        )
    )
    # per-row z contribution: y_q * (M^-q u) = y*(a(-q)u + b(-q)Mu)
    negq = -F.col("__p")
    a_nq, b_nq = _ab(negq)
    y = F.col(value_col).cast("double")
    w_chunk = (
        Window.partitionBy(*key_names, "__chunk")
        .orderBy(F.asc("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = numbered.withColumn(
        "__z1",
        F.sum(y * (a_nq * F.lit(u1) + b_nq * F.lit(mu1))).over(w_chunk),
    ).withColumn(
        "__z2",
        F.sum(y * (a_nq * F.lit(u2) + b_nq * F.lit(mu2))).over(w_chunk),
    )

    end_l, end_b = _apply_pow(F.col("__p"), F.col("__z1"), F.col("__z2"))
    summaries = (
        local.withColumn("__bl", end_l)
        .withColumn("__bb", end_b)
        .groupBy(*key_names, "__chunk")
        .agg(
            F.max_by(F.struct("__bl", "__bb"), "__p").alias("__B"),
            F.count(F.lit(1)).alias("__len"),
            F.min_by(y, F.col("__n")).alias("__first"),
        )
    )
    w_cw = Window.partitionBy(*key_names).orderBy(F.asc("__chunk"))
    frame = w_cw.rowsBetween(-w_chunks, -1)
    chunk_states = (
        summaries.withColumn(
            "__N",
            F.sum("__len").over(
                w_cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("__N_prev", (F.col("__N") - F.col("__len")).cast("double"))
        .withColumn("__y1", F.first("__first").over(w_cw))
        .withColumn(
            "__hist", F.collect_list(F.struct("__B", "__N")).over(frame)
        )
    )
    zero2 = F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("b"))

    def fold(acc, x):
        e = F.col("__N_prev") - x["__N"].cast("double")
        nl, nb = _apply_pow(e, x["__B"]["__bl"], x["__B"]["__bb"])
        return F.struct(
            (acc["l"] + nl).alias("l"), (acc["b"] + nb).alias("b")
        )

    init_l, init_b = _apply_pow(
        F.col("__N_prev"), F.col("__y1"), F.lit(0.0)
    )
    chunk_states = chunk_states.withColumn(
        "__acc", F.aggregate(F.col("__hist"), zero2, fold)
    ).select(
        *key_names,
        "__chunk",
        (F.col("__acc.l") + init_l).alias("__in_l"),
        (F.col("__acc.b") + init_b).alias("__in_b"),
    )

    joined = local.join(chunk_states, [*key_names, "__chunk"])
    lvl, trd = _apply_pow(
        F.col("__p"),
        F.col("__in_l") + F.col("__z1"),
        F.col("__in_b") + F.col("__z2"),
    )
    return (
        joined.withColumn(level_col, lvl)
        .withColumn(trend_col, trd)
        .drop("__n", "__chunk", "__p", "__z1", "__z2", "__in_l", "__in_b")
    )


def holt_winters_smooth(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    alpha: float,
    gamma: float,
    delta: float,
    season_length: int,
    level_col: str = "level",
    trend_col: str = "trend",
    season_col: str = "season",
    chunk_rows: int | None = None,
    impl: str = "auto",
    phi: float = 1.0,
) -> DataFrame:
    """Exact per-series Holt-Winters ADDITIVE-seasonal smoothing — the
    3-state member of the chunked affine-scan family (``ewma_smooth``,
    ``holt_smooth``), for series with a repeating cycle (circadian
    wearable rhythms — the reference's Fitbit intraday shape,
    ``SURVEY.md`` Fitbit sources).  The recurrence (season length L,
    ``l`` level, ``b`` trend, ``s`` season):

        l_t = alpha*(y_t - s_{t-L}) + (1-alpha)*(l_{t-1} + phi*b_{t-1})
        b_t = gamma*(l_t - l_{t-1}) + (1-gamma)*phi*b_{t-1}
        s_t = delta*(y_t - l_t) + (1-delta)*s_{t-L}

    ``phi`` is Gardner's damped-trend coefficient — ``phi = 1`` (the
    default) is the classic undamped form, ``phi < 1`` shrinks the
    carried trend each step (the standard forecasting variant that
    stops linear extrapolation from running away).  Damping stays
    LINEAR on the state vector: only three entries of M pick up a phi
    factor (the b-column of each of l/b/s), the level/season gauge
    mode is untouched (its b-component is zero), and the damped
    remainder's spectral gap only widens — so the identical scan,
    split, and kernel-table machinery serves both variants.

    with ``l_0 = y_1``, ``b_0 = 0``, all seasons 0 (the recurrence runs
    from the first row; step 1 therefore reproduces Holt's
    ``l_1 = y_1, b_1 = 0`` start and seasons are learned from the
    data).  It is linear on the (L+2)-dim state ``x = (l, b, s_t, ...,
    s_{t-L+1})``: ``x_t = M x_{t-1} + y_t u``, so chunks compose
    affinely — but unlike EWMA/Holt the transition is NOT strictly
    damped: ``w = (1, 0, -1, ..., -1)`` satisfies ``M w = w``
    STRUCTURALLY (the level/season gauge freedom — add c to the level,
    subtract c from every season, nothing observable changes), so M has
    an exact unit eigenvalue and no bounded carry frame exists for the
    raw state.  The scan therefore SPLITS the propagator:

        M^e  =  V1  +  R(e),      V1 = spectral projector onto the
                                       unit mode,  R(e) -> 0

    - the **unit-mode part** of the incoming state is ``V1 @ (x_0 +
      sum of ALL previous chunk increments)`` — a plain unbounded
      per-key cumulative sum (D running sums over the chunk-level
      table), exact with no decay argument needed;
    - the **damped remainder** uses the family's bounded frame: R(e)
      contributions older than W chunks are below the smallest
      subnormal double (|lambda_2|^(W*m) < 1e-323) and identically
      zero in any double-precision evaluation — including the
      sequential reference — so truncation loses nothing.

    Within a chunk the closed form is a direct convolution with
    driver-precomputed numpy kernel tables (``v_e = M^e u`` as literal
    arrays, POSITIVE powers only — no matrix inversion, no
    eigenvalue-spread cancellation, the hazards the 2-D Holt scan had
    to bound away simply do not arise): each row folds the chunk's
    preceding (offset, y) pairs against the kernel, O(m) work per row
    at JVM speed.  Chunk summaries carry the full D-vector increment
    ``B = sum y_q M^(len-q) u``; cross-chunk exponents are exact
    multiples of the chunk length (interior chunks are always full),
    so ``R(k*m)`` comes from a small precomputed table.

    Plan shape: one exchange for the (key, chunk) windows, one
    key-level window pass over the chunk table (~m x smaller than the
    data), one equi-join carrying incoming states back to the rows —
    identical to the other scans, skew-proof the same way (a hot key's
    timeline parallelizes across its chunks by construction).

    Cost scales as O(D^2) expression terms in the cross-chunk fold and
    O(m) per row in the conv — sized for daily/weekly cycles (L up to
    a few dozen); the kernel-table guard raises before building an
    unreasonable literal table.  Returns the input plus ``level``,
    ``trend``, ``season``.

    ``impl`` picks the ROW-evaluation engine (the chunk-state
    machinery — windows, summaries, spectral split — is identical):

    - ``"hof"`` (and ``"auto"``, the default): the pure-Catalyst
      higher-order-function fold — zero Python in the plan.  With the
      kernel tables shipped as a broadcast row (below) this measured
      FASTEST across every probe on local[32]: 2.6 s at 10x data
      (0.99x scale ratio) and a 1.01x ratio under a 20%-hot-key skew.
    - ``"arrow"``: per-(key, chunk) ``applyInPandas`` computes the
      in-chunk convolution as a numpy ``convolve`` against the same
      kernel table and the carried-state term as one (m, 3, D) x D
      contraction.  The group key equals the join key, so no extra
      exchange; kept for deployments where Python workers outnumber
      the per-executor JVM threads — the fold's arithmetic is the
      same closed form, byte-compared by the hypothesis fuzz.
    """
    import numpy as np

    if impl not in ("auto", "arrow", "hof"):
        raise ValueError(f"unknown impl {impl!r}")
    use_arrow = impl == "arrow"
    for name, v in (("alpha", alpha), ("gamma", gamma), ("delta", delta)):
        if not 0.0 < v < 1.0:
            raise ValueError(f"{name} must be in (0, 1) exclusive")
    if not 0.0 < phi <= 1.0:
        raise ValueError("phi must be in (0, 1]")
    if season_length < 2:
        raise ValueError("season_length must be >= 2")
    L = int(season_length)
    D = L + 2
    M = np.zeros((D, D))
    M[0, 0] = 1 - alpha
    M[0, 1] = (1 - alpha) * phi
    M[0, D - 1] = -alpha
    M[1, 0] = -gamma * alpha
    M[1, 1] = (1 - gamma * alpha) * phi
    M[1, D - 1] = -gamma * alpha
    M[2, 0] = -delta * (1 - alpha)
    M[2, 1] = -delta * (1 - alpha) * phi
    M[2, D - 1] = 1 - delta + delta * alpha
    for j in range(3, D):
        M[j, j - 1] = 1.0
    u = np.zeros(D)
    u[0], u[1], u[2] = alpha, gamma * alpha, delta * (1 - alpha)

    # spectral split: unit modes (the structural gauge eigenvalue)
    # vs the strictly damped remainder
    eigvals, eigvecs = np.linalg.eig(M)
    unit = np.abs(eigvals - 1.0) < 1e-9
    damped_mod = np.abs(eigvals[~unit]) if (~unit).any() else np.array([0.0])
    lam2 = float(damped_mod.max())
    if np.abs(eigvals[~unit]).max(initial=0.0) >= 1.0 - 1e-9:
        raise ValueError(
            "a non-gauge eigenvalue has modulus >= 1 "
            f"(|lambda_2| = {lam2:.6f}): the remainder does not damp "
            "and no bounded carry frame exists for these parameters"
        )
    # projector onto the unit eigenspace via left/right eigvecs:
    # V1 = sum_i r_i l_i^T / (l_i^T r_i); verified numerically below
    left_eigvecs = np.linalg.inv(eigvecs).conj().T
    V1 = np.zeros((D, D), dtype=complex)
    for i in np.nonzero(unit)[0]:
        r, lv = eigvecs[:, i], left_eigvecs[:, i]
        V1 += np.outer(r, lv.conj()) / (lv.conj() @ r)
    V1 = np.real_if_close(V1, tol=1e6)
    if np.iscomplexobj(V1) or not np.allclose(M @ V1, V1, atol=1e-10):
        raise ValueError(
            "unit eigenspace is defective for these parameters; the "
            "spectral split does not apply"
        )
    V1 = V1.astype(float)

    decay = -math.log(lam2) if lam2 > 0 else float("inf")
    if chunk_rows:
        m = int(chunk_rows)
    elif math.isfinite(decay):
        # balance the two data-sized costs: per-row conv is O(m) per
        # row, the cross-chunk fold is O(W*D^2) per chunk row with
        # W ~ 745/(m*decay) and n/m chunk rows — equating gives
        # m ~ (745*D^2/decay)^(1/3); the measured optimum at sf0.1
        # sits ~2x above the model (fold steps cost more than conv
        # lookups), hence the factor
        m = int(
            max(32, min(320, 2.0 * (745.0 * D * D / decay) ** (1.0 / 3.0)))
        )
    else:
        m = 32
    w_chunks = (
        max(1, math.ceil(745.0 / (m * decay))) if math.isfinite(decay) else 1
    )
    if w_chunks * D * D > 500_000:
        raise ValueError(
            f"carry-frame table would hold {w_chunks * D * D} doubles "
            f"(W={w_chunks} chunks, D={D}); raise chunk_rows or use "
            "stronger damping (larger delta)"
        )

    # kernel tables (numpy, driver-side, all positive powers):
    #   conv kernel   v_e = M^e u              e = 0..m-1   (rows 0..2)
    #   row powers    M^p rows 0..2            p = 1..m
    #   summary krnl  v_e full vector          e = 0..m-1
    #   cross-chunk   R(k*m) = M^(k*m) - V1    k = 0..w_chunks-1
    pows = [np.eye(D)]
    for _ in range(m):
        pows.append(M @ pows[-1])
    v_tab = np.stack([pows[e] @ u for e in range(m)])        # (m, D)
    Mm = pows[m]
    Rk = []
    acc = np.eye(D)
    for _ in range(w_chunks):
        Rk.append(acc - V1)
        acc = Mm @ acc
    Rk = np.stack(Rk)                                        # (W, D, D)

    # The kernel tables hold ~20k doubles.  As literal expression
    # nodes they made every eager withColumn analysis walk all of
    # them (the r6 bench's ~10 s driver-side constant — VERDICT r6
    # #6); instead they ship as a ONE-ROW broadcast table joined in
    # exactly where consumed — data, not expression tree.  Catalyst
    # prunes unused table columns per branch and the broadcast row
    # never enters a shuffle.
    from pyspark.sql import types as _T

    spark = series.sparkSession
    tab_names: list[str] = []
    tab_row: list[list[float]] = []

    def add_tab(name: str, arr) -> None:
        tab_names.append(name)
        tab_row.append([float(x) for x in np.asarray(arr).ravel()])

    for j in range(3):
        add_tab(f"__ck{j}", v_tab[:, j])                      # len m
        add_tab(
            f"__rp{j}",
            np.stack([pows[p][j] for p in range(m + 1)]),     # (m+1)*D
        )
    for j in range(D):
        add_tab(f"__sk{j}", v_tab[:, j])                      # len m
        add_tab(f"__rt{j}", Rk[:, j, :])                      # W*D
    tables_df = tiny_df(
        spark,
        [tuple(tab_row)],
        _T.StructType(
            [
                _T.StructField(n, _T.ArrayType(_T.DoubleType()), False)
                for n in tab_names
            ]
        ),
    )
    conv_k = [F.col(f"__ck{j}") for j in range(3)]
    sum_k = [F.col(f"__sk{j}") for j in range(D)]
    v1_rows = [[float(V1[j, k]) for k in range(D)] for j in range(D)]

    key_names = list(on)
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w_key = Window.partitionBy(*key_names).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    numbered = (
        series.withColumn("__n", F.row_number().over(w_key))
        .withColumn("__chunk", ((F.col("__n") - 1) / m).cast("bigint"))
        .withColumn("__p", (F.col("__n") - F.col("__chunk") * m).cast("int"))
    )
    y = F.col(value_col).cast("double")

    w_chunk_all = Window.partitionBy(*key_names, "__chunk").orderBy(
        F.asc("__p")
    )
    w_chunk_cum = w_chunk_all.rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = numbered.withColumn(
        "__len", F.count(F.lit(1)).over(
            w_chunk_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    )
    if not use_arrow:
        # per-row in-chunk convolution: fold the preceding (offset, y)
        # pairs of this chunk against the kernel v_(p-q).  Tables
        # attach (broadcast row) for the fold projection only and are
        # dropped immediately — they never enter a shuffle.
        local = local.withColumn(
            "__pref",
            F.collect_list(
                F.struct(F.col("__p").alias("q"), y.alias("yv"))
            ).over(w_chunk_cum),
        ).crossJoin(F.broadcast(tables_df))
        zero3 = F.struct(
            F.lit(0.0).alias("c0"),
            F.lit(0.0).alias("c1"),
            F.lit(0.0).alias("c2"),
        )

        def conv_fold(acc, e):
            idx = F.col("__p") - e["q"] + 1
            return F.struct(
                (acc["c0"] + e["yv"] * F.element_at(conv_k[0], idx)).alias("c0"),
                (acc["c1"] + e["yv"] * F.element_at(conv_k[1], idx)).alias("c1"),
                (acc["c2"] + e["yv"] * F.element_at(conv_k[2], idx)).alias("c2"),
            )

        local = local.withColumn(
            "__conv", F.aggregate(F.col("__pref"), zero3, conv_fold)
        ).drop("__pref", *tab_names)
    # NOTE deliberately NOT pinned: the plan shows the `local` subtree
    # twice (summaries + row join), but column pruning strips the conv
    # fold from the summaries branch — the recompute is the cheap
    # window pass only, and a localCheckpoint pin measured SLOWER
    # (materialization cost exceeds the pruned recompute; contrast the
    # round-5 tokenize-once barrier, where the duplicated branch was
    # NOT prunable)

    # chunk summaries: full-vector increment B and the first value
    b_sums = [
        F.sum(
            y
            * F.element_at(
                sum_k[j],
                (F.col("__len") - F.col("__p") + 1).cast("int"),
            )
        ).alias(f"__b{j}")
        for j in range(D)
    ]
    # tables attach to the agg INPUT: element_at folds into the
    # map-side partial aggregate, so the shuffle carries only buffers
    summaries = (
        local.crossJoin(F.broadcast(tables_df))
        .groupBy(*key_names, "__chunk")
        .agg(
            *b_sums,
            F.max("__len").alias("__clen"),
            F.min_by(y, F.col("__n")).alias("__cfirst"),
        )
        .withColumn("__Bvec", F.array(*[F.col(f"__b{j}") for j in range(D)]))
        .drop(*[f"__b{j}" for j in range(D)])
    )
    w_cw = Window.partitionBy(*key_names).orderBy(F.asc("__chunk"))
    prev_all = w_cw.rowsBetween(Window.unboundedPreceding, -1)
    frame = w_cw.rowsBetween(-w_chunks, -1)
    chunk_states = (
        summaries.withColumn("__y1", F.first("__cfirst").over(w_cw))
        .withColumn(
            "__runsum",
            F.array(
                *[
                    F.coalesce(
                        F.sum(F.element_at("__Bvec", j + 1)).over(prev_all),
                        F.lit(0.0),
                    )
                    for j in range(D)
                ]
            ),
        )
        .withColumn(
            "__hist",
            F.collect_list(F.struct("__chunk", "__Bvec")).over(frame),
        )
    )

    # The three D- and D^2-sized expression tables below ship as ONE
    # F.expr SQL string each (r14 optimization, the ANN _doubles_sql
    # lesson): built element-wise with Column operators they cost
    # D^2 * ~8 py4j round trips per call — ~13,400 measured for
    # holt_winters at D=9, ~2.3 s of pure DRIVER time per build, the
    # dominant cost of every ts_holt_winters/ts_forecast bench rep.
    # The SQL text parses to the IDENTICAL Catalyst expressions
    # (left-associated adds in the same order, CAST('<repr>' AS
    # DOUBLE) folds to the bit-identical double), so plans and values
    # are unchanged.
    def _dsql(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    zero_sql = "array(" + ", ".join(["0.0D"] * D) + ")"

    # R(dist*m) @ e.__Bvec, dist = __chunk - e.__chunk - 1, folded
    # over the carry-frame history (the r_apply/hist_fold pair)
    contrib_sql = ", ".join(
        " + ".join(
            ["0.0D"]
            + [
                f"element_at(__rt{j}, CAST(__chunk - e.__chunk - 1 AS INT)"
                f" * {D} + {k} + 1) * element_at(e.__Bvec, {k + 1})"
                for k in range(D)
            ]
        )
        for j in range(D)
    )
    damped_expr = F.expr(
        f"aggregate(__hist, {zero_sql}, (acc, e) -> "
        f"zip_with(acc, array({contrib_sql}), (a, b) -> a + b))"
    )

    # x0 = (y_first, 0, ..., 0): unit part V1[:,0]*y1, damped part
    # R(c*m)[:,0]*y1 (zero beyond the frame)
    x0_terms = ", ".join(
        f"element_at(__rt{j}, CAST(__chunk AS INT) * {D} + 1) * __y1"
        for j in range(D)
    )
    x0_damped = F.expr(
        f"CASE WHEN CAST(__chunk AS INT) < {w_chunks} "
        f"THEN array({x0_terms}) ELSE {zero_sql} END"
    )
    unit_part = F.expr(
        "array("
        + ", ".join(
            " + ".join(
                ["0.0D"]
                + [
                    f"{_dsql(v1_rows[j][k])} * (element_at(__runsum, "
                    f"{k + 1}) + "
                    + ("__y1" if k == 0 else "0.0D")
                    + ")"
                    for k in range(D)
                ]
            )
            for j in range(D)
        )
        + ")"
    )
    # tables attach AFTER the key-level windows (the chunk table plus
    # a broadcast row — nothing table-sized ever shuffles) and the
    # select immediately prunes them away
    chunk_states = chunk_states.crossJoin(
        F.broadcast(tables_df)
    ).withColumn(
        "__damped", damped_expr
    ).select(
        *key_names,
        "__chunk",
        F.zip_with(
            F.zip_with("__damped", x0_damped, lambda a, b: a + b),
            unit_part,
            lambda a, b: a + b,
        ).alias("__xin"),
    )

    joined = local.join(chunk_states, [*key_names, "__chunk"])

    if use_arrow:
        import pandas as pd
        from pyspark.sql import types as T

        # worker-shipped tables: the SAME driver-built kernels the HOF
        # path reads as literals — (m, 3) conv kernel, (m+1, 3, D)
        # row-power slabs
        conv_k3 = np.ascontiguousarray(v_tab[:, :3])
        pows3 = np.ascontiguousarray(
            np.stack([pows[p][:3, :] for p in range(m + 1)])
        )
        value_name = value_col
        out_cols = [
            c for c in series.columns
        ] + [level_col, trend_col, season_col]
        out_schema = T.StructType(
            [series.schema[c] for c in series.columns]
            + [
                T.StructField(level_col, T.DoubleType()),
                T.StructField(trend_col, T.DoubleType()),
                T.StructField(season_col, T.DoubleType()),
            ]
        )

        def hw_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("__p")
            yv = pdf[value_name].to_numpy(dtype=float)
            n = len(yv)
            xin = np.asarray(pdf["__xin"].iloc[0], dtype=float)
            carried = pows3[1 : n + 1] @ xin            # (n, 3)
            for j in range(3):
                carried[:, j] += np.convolve(yv, conv_k3[:, j])[:n]
            pdf = pdf.assign(
                **{
                    level_col: carried[:, 0],
                    trend_col: carried[:, 1],
                    season_col: carried[:, 2],
                }
            )
            return pdf[out_cols]

        # group key == join key, so the grouping reuses the join's
        # (key, chunk) partitioning — no extra exchange
        return joined.groupBy(*key_names, "__chunk").applyInPandas(
            hw_rows, out_schema
        )

    def row_out(j):
        # one SQL string per output column (the damped_expr/unit_part
        # convention above): D element_at products, left-assoc adds
        mp_dot = " + ".join(
            ["0.0D"]
            + [
                f"element_at(__rp{j}, __p * {D} + {k} + 1)"
                f" * element_at(__xin, {k + 1})"
                for k in range(D)
            ]
        )
        return F.expr(f"{mp_dot} + __conv.c{j}")

    # post-join projection only — the table row rides the broadcast
    # side and is dropped with the helpers
    return (
        joined.crossJoin(F.broadcast(tables_df))
        .withColumn(level_col, row_out(0))
        .withColumn(trend_col, row_out(1))
        .withColumn(season_col, row_out(2))
        .drop("__n", "__chunk", "__p", "__len", "__conv", "__xin", *tab_names)
    )


def holt_winters_forecast(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    alpha: float,
    gamma: float,
    delta: float,
    season_length: int,
    horizon: int,
    phi: float = 1.0,
    horizon_col: str = "h",
    forecast_col: str = "forecast",
    **smooth_kwargs,
) -> DataFrame:
    """h-step-ahead Holt-Winters forecasts per series — the consumer
    the smoothing states exist for:

        yhat_{T+h} = l_T + (phi + phi^2 + ... + phi^h) * b_T
                     + s_{T + h - L * ceil(h / L)}

    (the classic additive forecast; phi=1 degenerates the trend sum to
    ``h * b_T``, phi<1 is Gardner's damped extrapolation that
    plateaus instead of running away).  One ``holt_winters_smooth``
    pass produces the states; the per-key tail (the last L rows'
    seasons plus the final level/trend — bounded by L, never
    data-sized) joins a ``horizon``-row literal frame.  The phi power
    sums are DRIVER-computed literals shared verbatim with the SQL
    oracle, so no cross-engine ``pow`` drift enters the result.
    Series shorter than L use season 0 for the unobserved phases (the
    recurrence's init convention).  Output: one row per (key, h) with
    ``forecast``.
    """
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    L = int(season_length)
    sm = holt_winters_smooth(
        series, on, ts_col, value_col, alpha, gamma, delta,
        season_length, phi=phi, **smooth_kwargs,
    )
    keys = list(on)
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w_desc = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    tail = sm.withColumn("__rd", F.row_number().over(w_desc)).filter(
        F.col("__rd") <= L
    )
    state = tail.filter(F.col("__rd") == 1).select(
        *keys, F.col("level").alias("__l"), F.col("trend").alias("__b")
    )
    seasons = tail.select(*keys, "__rd", F.col("season").alias("__s"))
    # phi power sums as driver literals (exact cross-engine sharing)
    ps, acc, p = [], 0.0, 1.0
    for _ in range(horizon):
        p *= phi
        acc += p
        ps.append(acc)
    frame = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h + 1).alias("h"),
                    F.lit(float(ps[h])).alias("ps"),
                )
                for h in range(horizon)
            ]
        )
    )
    return (
        state.select(*keys, "__l", "__b", frame.alias("__hp"))
        .select(
            *keys,
            "__l",
            "__b",
            F.col("__hp.h").alias(horizon_col),
            F.col("__hp.ps").alias("__ps"),
        )
        .withColumn(
            "__rd", F.lit(L) - ((F.col(horizon_col) - 1) % F.lit(L))
        )
        .join(seasons, [*keys, "__rd"], "left")
        .select(
            *keys,
            horizon_col,
            (
                F.col("__l")
                + F.col("__ps") * F.col("__b")
                + F.coalesce(F.col("__s"), F.lit(0.0))
            ).alias(forecast_col),
        )
    )


def holt_winters_anomalies(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    alpha: float,
    gamma: float,
    delta: float,
    season_length: int,
    phi: float = 1.0,
    z_threshold: float = 3.0,
    resid_col: str = "resid",
    z_col: str = "z",
    flag_col: str = "is_anomaly",
    **smooth_kwargs,
) -> DataFrame:
    """Seasonal-aware anomaly detection: score each observation by its
    ONE-STEP-AHEAD Holt-Winters forecast error,

        resid_t = y_t - (l_{t-1} + phi * b_{t-1} + s_{t-L})

    then z-score the residuals per series.  The plain trailing-window
    z-score (``ts_anomaly``) flags every rush-hour peak of a circadian
    signal; subtracting the level+trend+season prediction first means
    only departures from the PATTERN score — the anomaly monitor a
    wearable pipeline actually wants.  One smoothing pass + one keyed
    window for the lags + one keyed aggregate window for mean/std; no
    new exchange beyond the smoothing's own.

    The first row of each series has no prediction (``resid`` NULL,
    flag NULL); a (near-)constant-residual series has no meaningful
    variance (``z`` NULL, flag NULL) — degenerate cases surface as
    NULL, not as arbitrary flags.  "Near" is load-bearing: a perfectly
    flat series has residuals that are EXACTLY zero under sequential
    arithmetic but ~1e-15 noise under the scan's closed form, and
    z-scoring that noise would amplify it to arbitrary flags — so the
    std is floored at 1e-9 x the series' mean |value| scale, below
    which ``z`` is NULL in every arithmetic.
    """
    L = int(season_length)
    sm = holt_winters_smooth(
        series, on, ts_col, value_col, alpha, gamma, delta,
        season_length, phi=phi, **smooth_kwargs,
    )
    keys = list(on)
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_cols])
    pred = (
        F.lag("level").over(w)
        + F.lit(float(phi)) * F.lag("trend").over(w)
        + F.coalesce(F.lag("season", L).over(w), F.lit(0.0))
    )
    out = sm.withColumn(
        resid_col, F.col(value_col).cast("double") - pred
    )
    w_all = Window.partitionBy(*keys)
    scale = F.avg(F.abs(F.col(value_col).cast("double"))).over(w_all)
    std = F.stddev_samp(resid_col).over(w_all)
    std_eff = F.when(std > 1e-9 * (scale + F.lit(1.0)), std)
    z = (F.col(resid_col) - F.avg(resid_col).over(w_all)) / std_eff
    return out.withColumn(z_col, z).withColumn(
        flag_col, F.abs(F.col(z_col)) > F.lit(float(z_threshold))
    )


def seasonal_decompose(
    series: DataFrame,
    on: Sequence[str],
    ts_col: str | Sequence[str],
    value_col: str,
    season_length: int,
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    resid_col: str = "resid",
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of statsmodels ``seasonal_decompose``), per key:

        trend_t    = centered moving average of length L
                     (even L: the standard 2xL MA — endpoints of the
                     window weighted 1/2 — so the average is centered
                     on t exactly); NULL where the window is partial
                     (the first/last floor(L/2) rows — the classical
                     convention, no edge extrapolation)
        seasonal_p = mean of (y - trend) at phase p, centered so the
                     L phase effects sum to zero
        resid_t    = y_t - trend_t - seasonal_{t mod L}

    The diagnostic companion to ``holt_winters_smooth``: HW answers
    "smooth and forecast", this answers "how big IS the cycle vs the
    trend vs the noise" — the first question a wearable-data analyst
    asks of circadian series.

    Plan shape: the moving average and the phase numbering ride ONE
    key-partitioned window sort; phase means are a (keys x L)-sized
    aggregate joined back on (key, phase).  Everything is built-in
    expressions over two shuffles — no UDF, no driver loop, and every
    window frame is bounded by L (no per-key unbounded state beyond
    the tiny phase table).
    """
    if season_length < 2:
        raise ValueError("season_length must be >= 2")
    L = int(season_length)
    key_names = list(on)
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    w_key = Window.partitionBy(*key_names).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    y = F.col(value_col).cast("double")
    half = L // 2
    if L % 2 == 1:
        frame = w_key.rowsBetween(-half, half)
        trend = F.when(
            F.count(y).over(frame) == L, F.avg(y).over(frame)
        )
    else:
        # 2xL MA: average of the two length-L windows straddling t
        f1 = w_key.rowsBetween(-half, half - 1)
        f2 = w_key.rowsBetween(-half + 1, half)
        trend = F.when(
            (F.count(y).over(f1) == L) & (F.count(y).over(f2) == L),
            (F.avg(y).over(f1) + F.avg(y).over(f2)) / 2.0,
        )
    numbered = series.withColumn("__n", F.row_number().over(w_key))
    with_trend = numbered.withColumn(trend_col, trend).withColumn(
        "__phase", (F.col("__n") - 1) % L
    )
    detr = (y - F.col(trend_col)).alias("__detr")
    phase_means = (
        with_trend.select(*key_names, "__phase", detr)
        .groupBy(*key_names, "__phase")
        .agg(F.avg("__detr").alias("__pm"))
    )
    w_k = Window.partitionBy(*key_names)
    centered = phase_means.withColumn(
        seasonal_col, F.col("__pm") - F.avg("__pm").over(w_k)
    ).select(*key_names, "__phase", seasonal_col)
    out = with_trend.join(centered, [*key_names, "__phase"], "left")
    return out.withColumn(
        resid_col, y - F.col(trend_col) - F.col(seasonal_col)
    ).drop("__n", "__phase")


def autocorrelation(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    max_lag: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key sample autocorrelation function (ACF) at lags
    ``1..max_lag`` — the periodicity/seasonality screen run before
    anyone picks a Holt-Winters season length or calls a series
    "noise": a peak at lag L says the series repeats every L steps.

    Definition (the standard sample ACF): with series mean ``m`` over
    all n points,

        acf(k) = sum_{t>k} (x_t - m)(x_{t-k} - m)
                 / sum_t (x_t - m)^2

    Engine shape — ONE window exchange + ONE aggregate, no joins, no
    per-lag jobs: all ``max_lag`` lagged copies ride the same
    (key-partitioned, order-sorted) window pass, and the centered
    products expand algebraically —

        num_k = S_xy(k) - m*(S_a(k) + S_b(k)) + c_k*m^2

    with S_xy(k) = sum x_t*x_{t-k}, S_a/S_b the co-present sums and
    c_k their count — so every lag's moments are plain SUM/COUNT
    partials of one groupBy.  The division is the only non-mergeable
    step.  Skew note: one window sort per key, same cost class as any
    per-key scan; the aggregate is map-side combinable.

    Output is long-form (key..., lag, acf, n) — acf NULL for a
    zero-variance or too-short series (``try_divide`` contract).
    NULL values are excluded up front (a gap re-indexes the series;
    resample first if gaps must count).
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    key_cols = list(key_cols)
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        *key_cols, *(F.col(c) for c in order_cols), v.alias("__x")
    )
    lagged = base.select(
        *key_cols,
        "__x",
        *[
            F.lag("__x", k).over(w).alias(f"__l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count("__x").alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__ss"),
    ]
    # per-lag aggregates and the acf fold ship as SQL text (the
    # bucket_chain/affine-scan lesson): ~30 py4j round trips per lag
    # as Column operators, one per expression as text — identical
    # Catalyst trees (same coalesce/try_divide/round shapes, the
    # shared mean subexpression expanded in place exactly as Column
    # reuse expands it)
    for k in range(1, max_lag + 1):
        aggs += [
            F.expr(f"sum(__x * __l{k})").alias(f"__pxy{k}"),
            F.expr(
                f"sum(CASE WHEN __l{k} IS NOT NULL THEN __x END)"
            ).alias(f"__pa{k}"),
            F.expr(f"sum(__l{k})").alias(f"__pb{k}"),
            F.expr(f"count(__l{k})").alias(f"__pc{k}"),
        ]
    g = lagged.groupBy(*key_cols).agg(*aggs)
    m_sql = "(__s / __n)"
    denom_sql = f"__ss - __n * {m_sql} * {m_sql}"
    eps = f"CAST('{1e-9!r}' AS DOUBLE)"
    zero = "0.0D"
    rows = F.explode(
        F.expr(
            "array("
            + ", ".join(
                f"struct({k} AS lag, round(try_divide("
                f"coalesce(__pxy{k}, {zero}) - {m_sql} * "
                f"(coalesce(__pa{k}, {zero}) + coalesce(__pb{k}, {zero}))"
                f" + __pc{k} * {m_sql} * {m_sql}, {denom_sql}) + {eps}, "
                f"{int(round_digits)}) AS acf)"
                for k in range(1, max_lag + 1)
            )
            + ")"
        )
    ).alias("__r")
    return g.select(*key_cols, F.col("__n").alias("n"), rows).select(
        *key_cols, "__r.lag", "__r.acf", "n"
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    slack: float = 0.5,
    threshold: float = 4.0,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key two-sided CUSUM change detection — WHEN did the level
    shift: the classic Page cumulative-sum statistic on the key's
    z-normalized series,

        s+_t = max(0, s+_{t-1} + z_t - slack)
        s-_t = max(0, s-_{t-1} - z_t - slack)

    flagged where either side exceeds ``threshold`` (both in sigma
    units).  The drift monitors (PSI/KS/JS) say THAT two eras differ;
    CUSUM localizes the shift to an observation index and catches
    slow drifts a fixed-window z-score misses (small persistent
    offsets accumulate).

    The max(0, ...) recurrence looks sequential but is exactly a
    running-minimum identity: with S_t = cumsum(z_t - slack),

        s+_t = S_t - min(0, min_{j<=t} S_j)

    so the whole scan is ONE key-partitioned window exchange: mean and
    stddev over the unbounded frame z-normalize map-side, two
    cumulative sums and two running minima ride the same sort.  No
    iteration, no driver round-trip, no join — the same skew class as
    any per-key ordered scan.

    Statistics are rounded BEFORE thresholding so the alarm flag is
    reproducible across engines.  A zero-variance key yields NULL
    scores and no alarms (``try_divide`` contract).
    """
    key_cols = list(key_cols)
    order = [F.col(c) for c in order_cols]
    w_all = Window.partitionBy(*key_cols)
    w_ord = Window.partitionBy(*key_cols).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull())
    z = F.try_divide(v - F.avg(v).over(w_all), F.stddev_samp(v).over(w_all))
    scored = base.select(
        *key_cols,
        *(F.col(c) for c in order_cols),
        v.alias(value_col),
        (z - F.lit(float(slack))).alias("__up"),
        (-z - F.lit(float(slack))).alias("__dn"),
    )
    # two projections because window functions cannot nest in one
    # expression; both ride the SAME (partitioning, ordering) spec so
    # the planner keeps a single exchange + sort
    summed = scored.select(
        *key_cols,
        *(F.col(c) for c in order_cols),
        value_col,
        F.sum("__up").over(w_run).alias("__S_up"),
        F.sum("__dn").over(w_run).alias("__S_dn"),
    )
    cusum_pos = F.round(
        F.col("__S_up")
        - F.least(F.lit(0.0), F.min("__S_up").over(w_run))
        + F.lit(1e-9),
        round_digits,
    )
    cusum_neg = F.round(
        F.col("__S_dn")
        - F.least(F.lit(0.0), F.min("__S_dn").over(w_run))
        + F.lit(1e-9),
        round_digits,
    )
    out = summed.select(
        *key_cols,
        *(F.col(c) for c in order_cols),
        value_col,
        cusum_pos.alias("cusum_pos"),
        cusum_neg.alias("cusum_neg"),
    )
    h = F.lit(float(threshold))
    return out.withColumn(
        "is_change",
        F.when(
            F.col("cusum_pos").isNotNull(),
            (F.col("cusum_pos") > h) | (F.col("cusum_neg") > h),
        ),
    )


def changepoint_binary(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    min_segment: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key single best changepoint by EXACT SSE reduction — the
    binary-segmentation step (Scott & Knott; the building block of
    PELT-family detectors): the split position that most reduces
    total within-segment squared error,

        gain(k) = SSE(all) - SSE(first k) - SSE(rest),
        SSE(seg) = sum(v²) - (sum v)² / n,

    maximized over k in [min_segment, n - min_segment].  CUSUM
    (``cusum_changepoints``) flags THAT and roughly WHERE a level
    shifted as a sequential monitor; this gives the single best
    retrospective split with its variance-explained gain — the
    number an era-cut (train/validation boundary, drift epoch) is
    chosen by.

    Engine shape: ONE key-partitioned exchange; running prefix sums
    (sum v, sum v², row index) and the per-key totals ride the same
    (partition, order) window spec, so the planner keeps a single
    sort; gain is map-side arithmetic per row and the winner is a
    per-key top-1 window (WindowGroupLimit, no second shuffle).
    Determinism: the argmax compares the ROUNDED gain (ties -> the
    earliest split in ``order_cols``), so the verdict is reproducible
    across engines — the emb_outliers rounded-comparison contract;
    prefix sums accumulate left-to-right identically in any
    windowed-SQL engine.

    Keys with fewer than ``2 * min_segment`` observations emit no row
    (no valid split).  Output: key_cols + (split_at = order_cols of
    the LAST left-segment row, n_left, n_right, mean_left, mean_right,
    gain), one row per key.

    At 100 TB the shuffle is keyed on the series id — the standard
    per-series window class (ts_cusum, scd2_history); a single series
    too large for one task should be pre-aggregated to a coarser
    bucket grain first (the hourly-series pattern the exposed query
    uses).
    """
    keys = list(key_cols)
    order = list(order_cols)
    v = F.col(value_col).cast("double")
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    pre = df.select(
        *keys,
        *(F.col(c) for c in order),
        F.sum(v).over(w_run).alias("__ls"),
        F.sum(v * v).over(w_run).alias("__ls2"),
        F.count(F.lit(1)).over(w_run).alias("__i"),
        F.sum(v).over(w_all).alias("__ts"),
        F.sum(v * v).over(w_all).alias("__ts2"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    i = F.col("__i").cast("double")
    n = F.col("__n").cast("double")
    sse_all = F.col("__ts2") - F.col("__ts") * F.col("__ts") / n
    sse_l = F.col("__ls2") - F.col("__ls") * F.col("__ls") / i
    r_s = F.col("__ts") - F.col("__ls")
    r_s2 = F.col("__ts2") - F.col("__ls2")
    sse_r = r_s2 - r_s * r_s / (n - i)
    gain = F.round(sse_all - sse_l - sse_r + F.lit(1e-9), round_digits)
    m = int(min_segment)
    cand = pre.filter(
        (F.col("__i") >= m) & (F.col("__n") - F.col("__i") >= m)
    ).select(
        *keys,
        *(F.col(c) for c in order),
        gain.alias("gain"),
        F.col("__i").cast("long").alias("n_left"),
        (F.col("__n") - F.col("__i")).cast("long").alias("n_right"),
        F.round(F.col("__ls") / i + F.lit(1e-9), round_digits).alias(
            "mean_left"
        ),
        F.round(r_s / (n - i) + F.lit(1e-9), round_digits).alias(
            "mean_right"
        ),
    )
    w_pick = Window.partitionBy(*keys).orderBy(
        F.col("gain").desc(), *[F.col(c).asc() for c in order]
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w_pick))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .withColumnsRenamed({c: f"split_{c}" for c in order})
    )


def mad_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.5,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key ROBUST outlier detection via the median absolute
    deviation: the modified z-score ``0.6745 * (x - median) / MAD``
    flagged beyond ``threshold`` (3.5 is the Iglewicz-Hoaglin
    recommendation).  The companion to the rolling z-score detectors:
    mean/stddev break down exactly when outliers are present (one
    spike inflates sigma and masks itself — up to half the data can
    be corrupt before the median moves), so the robust screen is what
    runs FIRST on an untrusted export.

    Engine shape: two grouped exact-percentile aggregates (median,
    then median of |x - median|) joined back by key — Catalyst
    broadcasts the per-key stat tables when keys are dim-sized, and
    both joins co-partition on the same key otherwise.  Exact
    ``percentile`` buffers per-group distincts; for extreme per-key
    cardinality substitute ``approx_percentile`` upstream (the
    PSI edge-mode contract).  Medians round to 9 digits before use —
    the interpolation tie pin shared with quantile_edge_row.

    A zero-MAD key (>= half the values identical) yields NULL scores
    and no alarms (``try_divide`` contract): the statistic is
    undefined there, and the right instrument is the categorical
    drift monitor, not a z-score.
    """
    key_cols = list(key_cols)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull())
    med = base.groupBy(*key_cols).agg(
        F.round(F.percentile(v, F.lit(0.5)), 9).alias("__med")
    )
    with_med = base.join(med, key_cols)
    mad = with_med.groupBy(*key_cols).agg(
        F.round(
            F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)), 9
        ).alias("__mad")
    )
    scored = with_med.join(mad, key_cols)
    z = F.round(
        F.lit(0.6745)
        * F.try_divide(v - F.col("__med"), F.col("__mad"))
        + F.lit(1e-9),
        round_digits,
    )
    return scored.select(
        *key_cols,
        F.col(value_col),
        F.col("__med").alias("key_median"),
        F.col("__mad").alias("key_mad"),
        z.alias("mad_z"),
        F.when(
            F.col("__mad") > 0, F.abs(z) > F.lit(float(threshold))
        ).alias("is_outlier"),
    )


def theil_sen_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    y_col: str,
    x_col: str,
    max_points: int = 5000,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key Theil-Sen robust trend: slope = median of all pairwise
    slopes (y_j - y_i)/(x_j - x_i) over x_i < x_j, intercept = median
    of (y - slope * x) — the robust companion to ``trend_regression``
    the way ``mad_anomalies`` is to the z-score detectors: OLS has
    breakdown point 0 (one corrupt export week bends the fitted
    drift line arbitrarily), Theil-Sen tolerates ~29% corrupt points
    before the slope moves.  Equal-x pairs are excluded (slope
    undefined there), the standard estimator convention.

    Engine shape: a key-keyed self-join generates pairs — an
    equi-join co-partitioned on the key, never a cartesian — and
    pairs collapse per key through the exact-percentile aggregate.
    The quadratic term is sum(n_k^2) over key sizes: this is an
    O(n^2)-pairs-per-key estimator BY DEFINITION, so a loud guard
    raises when any key exceeds ``max_points`` (the apss contract:
    refuse to degrade silently; downsample per key upstream, or use
    ``trend_regression`` at telemetry scale).  Medians round to 9
    digits before reuse (the interpolation tie pin), and the slope
    re-enters the residual pass via a key join — never as a group
    key (the aggregate-derived-key rule).
    """
    key_cols = list(key_cols)
    pts = df.select(
        *key_cols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    biggest = (
        pts.groupBy(*key_cols)
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    if biggest is not None and biggest > max_points:
        raise ValueError(
            f"theil_sen_trend: a key holds {biggest} points; pairwise "
            f"slopes are quadratic per key (max_points={max_points}). "
            "Downsample per key or use trend_regression."
        )

    a, b = pts.alias("a"), pts.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for k in key_cols:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    slopes = a.join(b, cond).select(
        *[F.col(f"a.{k}").alias(k) for k in key_cols],
        (
            (F.col("b.__y") - F.col("a.__y"))
            / (F.col("b.__x") - F.col("a.__x"))
        ).alias("__s"),
    )
    per_key = slopes.groupBy(*key_cols).agg(
        F.round(F.percentile(F.col("__s"), F.lit(0.5)), 9).alias("__slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = pts.join(per_key, key_cols).groupBy(*key_cols).agg(
        F.round(
            F.percentile(
                F.col("__y") - F.col("__slope") * F.col("__x"), F.lit(0.5)
            ),
            9,
        ).alias("__icept"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.max("__slope").alias("__slope_out"),
        F.max("n_pairs").alias("__pairs_out"),
    )
    return resid.select(
        *key_cols,
        F.round(F.col("__slope_out") + F.lit(1e-9), round_digits).alias(
            "slope"
        ),
        F.round(F.col("__icept") + F.lit(1e-9), round_digits).alias(
            "intercept"
        ),
        "n_points",
        F.col("__pairs_out").alias("n_pairs"),
    )


def sequence_pattern_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    patterns: dict[str, str],
    alphabet: dict[str, str],
    tiebreakers: Sequence[str] = (),
    max_sequence: int = 100_000,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern matching per key —
    the row-pattern query (conversion funnels with arbitrary
    repetition/alternation, error-recovery shapes) that SQL engines
    express with MATCH_RECOGNIZE and Spark has no native operator for.

    Each key's events are ordered by (ts, *tiebreakers) and encoded as
    a STRING over a caller-supplied single-character ``alphabet``
    (event type -> one char; unmapped types raise at execution — a
    silently skipped type would corrupt adjacency, the property the
    whole operator exists to preserve).  Every named regex in
    ``patterns`` is counted with non-overlapping left-to-right
    ``regexp_count`` semantics — identical in Spark and DuckDB/
    Postgres, so results are oracle-checkable.

    Scale shape (100 TB): ONE shuffle on the key; the sequence build
    is sort_array over collected per-key structs (bounded by the
    events-per-key contract — ``max_sequence`` raises loudly on keys
    exceeding it rather than silently OOMing a task, the
    refuse-to-degrade convention); matching is a map-side regex over
    the encoded string, vectorized JVM-side, no UDF.  Keys are
    independent, so AQE skew splitting applies to the single
    exchange.

    Output: (key, n_events, <one bigint count column per pattern>).
    """
    if not patterns:
        raise ValueError("patterns must be non-empty")
    if not alphabet:
        raise ValueError("alphabet must be non-empty")
    for t, ch in alphabet.items():
        if len(ch) != 1:
            raise ValueError(
                f"alphabet must map to single characters, got {t!r} -> {ch!r}"
            )
    # Encode via a broadcast map literal: NULL for unmapped types.  A
    # per-row raise_error here would kick the whole projection out of
    # whole-stage codegen (measured 2x on the encode stage); instead
    # both guards fire at GROUP level — concat_ws skips NULL chars, so
    # length(seq) < n_events detects any unmapped row, and the
    # offending type name rides a max() aggregate into the message.
    enc = F.element_at(
        F.create_map(
            *[x for t, ch in sorted(alphabet.items()) for x in (F.lit(t), F.lit(ch))]
        ),
        F.col(type_col),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("__ts"),
                *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreakers)],
                F.col("__ch").alias("__ch"),
            )
        )
    )
    grouped = (
        df.withColumn("__ch", enc)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws("", F.transform(ordered, lambda x: x["__ch"])).alias(
                "__seq"
            ),
            F.max(
                F.when(F.col("__ch").isNull(), F.col(type_col))
            ).alias("__unmapped"),
        )
    )
    guarded = grouped.withColumn(
        "__seq",
        F.when(
            F.col("__unmapped").isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("sequence_pattern_counts: unmapped event type '"),
                    F.col("__unmapped"),
                    F.lit("' — extend the alphabet"),
                )
            ),
        )
        .when(F.col("n_events") <= max_sequence, F.col("__seq"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "sequence_pattern_counts: key exceeds max_sequence="
                        f"{max_sequence} events ("
                    ),
                    F.col("n_events").cast("string"),
                    F.lit(") — session-window the stream first"),
                )
            )
        ),
    )
    out_cols = [F.col(key_col), F.col("n_events")]
    for name, rx in patterns.items():
        out_cols.append(
            F.regexp_count(F.col("__seq"), F.lit(rx)).cast("bigint").alias(name)
        )
    return guarded.select(*out_cols)


def kalman_filter(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    process_var: float,
    obs_var: float,
    tiebreakers: Sequence[str] = (),
    max_points: int = 100_000,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key 1-D Kalman filter, local-level (random-walk) model — the
    optimal linear denoiser the moving-average/EWMA smoothers
    approximate: per step ``P_pred = P + q``, gain
    ``K = P_pred/(P_pred + r)``, ``x += K (z - x)``,
    ``P = (1 - K) P_pred``, initialized at the first observation with
    ``P = r``.  Unlike a fixed-alpha EWMA the gain ADAPTS: it starts
    high (trust the data while uncertain) and settles to the
    steady-state ratio fixed by q/r.

    The recursion is inherently sequential and NOT affine in (x, P)
    (the P update is rational), so it cannot ride the chunked
    affine-scan used by exact EWMA; instead each key's series folds
    through ONE Catalyst ``aggregate`` over its sorted value array —
    JVM-side, no UDF, one key shuffle, sequence length bounded by the
    loud ``max_points`` guard (group-level, the codegen-safe
    convention).  The oracle replays the identical operation order as
    a lockstep recursive CTE, so filtered values hash bit-for-bit.

    Output: one row per observation — (key, ts, *tiebreakers, value,
    x_filtered) with ``x_filtered`` rounded to ``round_digits``; the
    CARRIED state is never rounded.
    """
    if process_var < 0 or obs_var <= 0:
        raise ValueError("need process_var >= 0 and obs_var > 0")
    q = float(process_var)
    r = float(obs_var)
    tb_fields = [F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreakers)]
    ev = F.struct(
        F.col(ts_col).alias("__ts"),
        *tb_fields,
        F.col(value_col).cast("double").alias("__z"),
    )
    grouped = (
        df.groupBy(key_col)
        .agg(
            F.array_sort(F.collect_list(ev)).alias("__evs"),
            F.count(F.lit(1)).alias("__n"),
        )
        .withColumn(
            "__evs",
            F.when(F.col("__n") <= max_points, F.col("__evs")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "kalman_filter: key exceeds max_points="
                            f"{max_points} observations ("
                        ),
                        F.col("__n").cast("string"),
                        F.lit(") — window the series first"),
                    )
                )
            ),
        )
    )
    # Fold: accumulator (x, P, out[]) advances through the sorted
    # series; out collects each step's filtered x.  Operation order
    # matches the oracle CTE exactly: K = (P+q)/(P+q+r).
    fold = (
        "aggregate(__evs, "
        " named_struct("
        "   'x', CAST(NULL AS DOUBLE), 'P', CAST(0.0 AS DOUBLE), "
        "   'out', CAST(array() AS ARRAY<DOUBLE>)), "
        " (acc, e) -> CASE WHEN acc.x IS NULL THEN named_struct("
        "     'x', e.__z, 'P', CAST({r} AS DOUBLE), "
        "     'out', array_append(acc.out, e.__z)) "
        "   ELSE named_struct("
        "     'x', acc.x + ((acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (e.__z - acc.x), "
        "     'P', (1.0 - (acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (acc.P + {q}), "
        "     'out', array_append(acc.out, "
        "        acc.x + ((acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (e.__z - acc.x))) END, "
        " acc -> acc.out)"
    ).format(q=repr(q), r=repr(r))
    out = (
        grouped.withColumn("__xs", F.expr(fold))
        .select(
            key_col,
            F.posexplode(
                F.arrays_zip(F.col("__evs"), F.col("__xs"))
            ).alias("__i", "__pair"),
        )
        .select(
            key_col,
            F.col("__pair.__evs.__ts").alias(ts_col),
            *[
                F.col(f"__pair.__evs.__tb{i}").alias(c)
                for i, c in enumerate(tiebreakers)
            ],
            F.col("__pair.__evs.__z").alias(value_col),
            (
                F.round(F.col("__pair.__xs") + F.lit(1e-9), round_digits)
                + F.lit(0.0)
            ).alias("x_filtered"),
        )
    )
    return out


def kalman_smoother(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    process_var: float,
    obs_var: float,
    tiebreakers: Sequence[str] = (),
    max_points: int = 100_000,
    round_digits: int = 6,
) -> DataFrame:
    """Rauch-Tung-Striebel smoother over :func:`kalman_filter`'s
    local-level model — the OFFLINE companion: where the filter may
    only look backward (online estimate at time t uses z_1..z_t), the
    smoother runs a backward pass so every estimate conditions on the
    WHOLE series, ``x_s[t] = x_f[t] + C_t (x_s[t+1] - x_f[t])`` with
    smoother gain ``C_t = P_f[t] / (P_f[t] + q)`` (the random-walk
    prediction makes ``x_pred[t+1] = x_f[t]``).

    Both passes are Catalyst ``aggregate`` folds over each key's
    sorted array — forward carrying (x, P) and emitting both, backward
    over the REVERSED pair array carrying the smoothed successor.  One
    key shuffle total, JVM-side, no UDF, the group-level
    ``max_points`` guard.  The oracle replays both recursions
    (forward, then an anchored backward walk) in lockstep CTEs with
    the identical operation order.

    Output: (key, ts, *tiebreakers, value, x_filtered, x_smoothed).
    """
    if process_var < 0 or obs_var <= 0:
        raise ValueError("need process_var >= 0 and obs_var > 0")
    q = float(process_var)
    r = float(obs_var)
    tb_fields = [F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreakers)]
    ev = F.struct(
        F.col(ts_col).alias("__ts"),
        *tb_fields,
        F.col(value_col).cast("double").alias("__z"),
    )
    grouped = (
        df.groupBy(key_col)
        .agg(
            F.array_sort(F.collect_list(ev)).alias("__evs"),
            F.count(F.lit(1)).alias("__n"),
        )
        .withColumn(
            "__evs",
            F.when(F.col("__n") <= max_points, F.col("__evs")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "kalman_smoother: key exceeds max_points="
                            f"{max_points} observations ("
                        ),
                        F.col("__n").cast("string"),
                        F.lit(") — window the series first"),
                    )
                )
            ),
        )
    )
    fwd = (
        "aggregate(__evs, "
        " named_struct("
        "   'x', CAST(NULL AS DOUBLE), 'P', CAST(0.0 AS DOUBLE), "
        "   'out', CAST(array() AS ARRAY<STRUCT<x: DOUBLE, P: DOUBLE>>)), "
        " (acc, e) -> CASE WHEN acc.x IS NULL THEN named_struct("
        "     'x', e.__z, 'P', CAST({r} AS DOUBLE), "
        "     'out', array_append(acc.out, "
        "        named_struct('x', e.__z, 'P', CAST({r} AS DOUBLE)))) "
        "   ELSE named_struct("
        "     'x', acc.x + ((acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (e.__z - acc.x), "
        "     'P', (1.0 - (acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (acc.P + {q}), "
        "     'out', array_append(acc.out, named_struct("
        "        'x', acc.x + ((acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (e.__z - acc.x), "
        "        'P', (1.0 - (acc.P + {q}) / (acc.P + {q} + {r})) "
        "            * (acc.P + {q})))) END, "
        " acc -> acc.out)"
    ).format(q=repr(q), r=repr(r))
    bwd = (
        "reverse(aggregate(reverse(__fwd), "
        " named_struct('xs', CAST(NULL AS DOUBLE), "
        "   'out', CAST(array() AS ARRAY<DOUBLE>)), "
        " (acc, f) -> CASE WHEN acc.xs IS NULL THEN named_struct("
        "     'xs', f.x, 'out', array_append(acc.out, f.x)) "
        "   ELSE named_struct("
        "     'xs', f.x + (f.P / (f.P + {q})) * (acc.xs - f.x), "
        "     'out', array_append(acc.out, "
        "        f.x + (f.P / (f.P + {q})) * (acc.xs - f.x))) END, "
        " acc -> acc.out))"
    ).format(q=repr(q))
    return (
        grouped.withColumn("__fwd", F.expr(fwd))
        .withColumn("__bwd", F.expr(bwd))
        .select(
            key_col,
            F.posexplode(
                F.arrays_zip(F.col("__evs"), F.col("__fwd"), F.col("__bwd"))
            ).alias("__i", "__p"),
        )
        .select(
            key_col,
            F.col("__p.__evs.__ts").alias(ts_col),
            *[
                F.col(f"__p.__evs.__tb{i}").alias(c)
                for i, c in enumerate(tiebreakers)
            ],
            F.col("__p.__evs.__z").alias(value_col),
            (
                F.round(F.col("__p.__fwd.x") + F.lit(1e-9), round_digits)
                + F.lit(0.0)
            ).alias("x_filtered"),
            (
                F.round(F.col("__p.__bwd") + F.lit(1e-9), round_digits)
                + F.lit(0.0)
            ).alias("x_smoothed"),
        )
    )
