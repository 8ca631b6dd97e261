"""MERGE-style keyed upsert: apply a change batch to a snapshot.

The reference maintains datasets by replace-with-archive (K5,
json_to_parquet.py:304-367) plus delete anti-joins (J1) and
latest-wins dedup (W1).  ``merge_upsert`` is the single-operator
composition of those semantics — the ``MERGE INTO`` every warehouse
load (the reference's Snowflake ELT, K7) performs: update matched
keys, insert unmatched ones, optionally delete marked ones.

Spark-first shape: ONE full-outer equi-join on the key, then per-row
resolution with ``coalesce``/``when`` column expressions.  (Full-outer
joins cannot broadcast — Spark plans a sort-merge/shuffled-hash join;
AQE sizes it from the actual change-batch size, so a small batch costs
one cheap shuffle of itself while the giant target shuffles once on
the same key it would for any MERGE.)  No RDDs, no driver-side row
handling; at scale this is the same plan Delta Lake generates for a
MERGE without file pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    broadcast_updates: bool | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``keys``.

    - matched key, update row not marked deleted -> update's values win
    - matched key, update marked deleted (``delete_col`` true) -> row dropped
    - unmatched update -> inserted
    - unmatched target -> kept unchanged

    Both frames must share the same value columns (``delete_col``
    excluded); output schema equals the target's, plus a ``__merge_op``
    audit column (``insert``/``update``/``keep``) so record accounting
    (A1) can ledger the merge.

    ``broadcast_updates``: None (default) lets Catalyst/AQE pick the
    join strategy from actual sizes instead of force-broadcasting an
    arbitrarily large change batch.  True attaches the broadcast hint
    (Spark ignores it for full-outer joins — kept for callers that
    specialize to left joins); False pins a shuffled-hash join.
    """
    value_cols = [c for c in target.columns if c not in keys]
    upd_cols = set(updates.columns)
    missing = [c for c in value_cols if c not in upd_cols]
    if missing:
        raise ValueError(f"updates missing value columns: {missing}")

    # explicit presence markers survive the outer join even when every
    # value column is legitimately null
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    u = updates.withColumn("__u_present", F.lit(True)).alias("u")
    if broadcast_updates is True:
        u = F.broadcast(u)
    elif broadcast_updates is False:
        u = u.hint("shuffle_hash")
    joined = t.join(u, on=list(keys), how="full_outer")

    has_t = F.coalesce(F.col("t.__t_present"), F.lit(False))
    has_u = F.coalesce(F.col("u.__u_present"), F.lit(False))
    if delete_col is not None and delete_col in updates.columns:
        deleted = has_u & F.coalesce(F.col(f"u.{delete_col}"), F.lit(False))
    else:
        deleted = F.lit(False)

    # update wins outright when present (it may intentionally set null)
    out_vals = [
        F.when(has_u, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    op = (
        F.when(has_u & has_t, F.lit("update"))
        .when(has_u, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return joined.filter(~deleted).select(
        *keys, *out_vals, op.alias("__merge_op")
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    effective: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: fold a new snapshot of
    ``updates`` into a versioned ``history`` table.

    ``history`` rows carry (keys, attrs, valid_from, valid_to) with
    ``valid_to`` null on the current version.  For each key whose
    ``compare_cols`` changed, the open row is CLOSED (valid_to =
    ``effective``) and a new open row inserted; unchanged keys pass
    through; brand-new keys insert as open rows; already-closed history
    never moves.  This is the reference's replace-with-archive (K5)
    upgraded to in-table versioning — the warehouse-dimension idiom the
    Snowflake ELT side (K7) would maintain.

    Plan shape: closed history is a pass-through scan union'd back; the
    open slice full-outer-joins the updates on the key (ONE shuffle,
    AQE-sized like merge_upsert) and every verdict (close / keep /
    insert / new) is a column expression — no second join, no window.
    Change detection is null-safe (``<=>``).
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    eff = F.lit(effective)

    closed_history = history.filter(F.col(valid_to_col).isNotNull())
    open_rows = history.filter(F.col(valid_to_col).isNull())

    attr_cols = [c for c in history.columns if c not in (*keys, valid_from_col, valid_to_col)]
    missing = [c for c in (*compare_cols, *attr_cols) if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing columns: {missing}")

    t = open_rows.withColumn("__t", F.lit(True)).alias("t")
    u = updates.withColumn("__u", F.lit(True)).alias("u")
    j = t.join(u, on=keys, how="full_outer")
    has_t = F.coalesce(F.col("t.__t"), F.lit(False))
    has_u = F.coalesce(F.col("u.__u"), F.lit(False))
    diff = F.lit(False)
    for c in compare_cols:
        diff = diff | ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
    changed = has_t & has_u & diff

    # existing open rows: close if changed, keep open otherwise
    survived = j.filter(has_t).select(
        *keys,
        *[F.col(f"t.{c}").alias(c) for c in attr_cols],
        F.col(f"t.{valid_from_col}").alias(valid_from_col),
        F.when(changed, eff).otherwise(F.lit(None)).alias(valid_to_col),
    )
    # new versions: changed keys + brand-new keys
    fresh = j.filter((changed) | (has_u & ~has_t)).select(
        *keys,
        *[F.col(f"u.{c}").alias(c) for c in attr_cols],
        eff.alias(valid_from_col),
        F.lit(None).cast("string").alias(valid_to_col),
    )
    cast_to = dict(history.dtypes)
    fresh = fresh.select(
        *[F.col(c).cast(cast_to[c]).alias(c) for c in fresh.columns]
    )
    survived = survived.select(
        *[F.col(c).cast(cast_to[c]).alias(c) for c in survived.columns]
    )
    return closed_history.select(*survived.columns).unionByName(
        survived
    ).unionByName(fresh)


def scd2_build(
    log: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Build the FULL type-2 version history from an append-only
    change log in one pass — the backfill twin of :func:`scd2_apply`
    (which folds one new snapshot into existing history): consecutive
    duplicate states per key collapse, and each surviving change opens
    a version valid [its ``ts_col``, the next change's) with the last
    version open-ended.  This is how a warehouse dimension is
    initialized from CDC/event history before per-batch scd2_apply
    takes over.

    ``order_cols`` must be a deterministic total order per key (add a
    unique id as tiebreaker); ``ts_col`` (default: the first order
    column) supplies the validity boundaries.  Change detection is
    null-safe per attribute.

    Plan shape: ONE shuffle on the key; the lag (change detection),
    lead (valid_to) and row_number (version) windows all share the
    (keys x order_cols) partitioning+sort, and the in-between filter
    preserves it, so Catalyst plans a single Exchange with no re-sort
    fan-out.  Per-key state is bounded by that key's own history — no
    global window anywhere.
    """
    from pyspark.sql import Window

    keys = list(keys)
    attr_cols = list(attr_cols)
    order_cols = list(order_cols)
    vf = ts_col if ts_col is not None else order_cols[0]
    base_cols = list(dict.fromkeys([*keys, *attr_cols, *order_cols, vf]))

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(F.lit(1)).over(w).isNull()

    ch = (
        log.select(*base_cols)
        .withColumn("__keep", first | changed)
        .filter(F.col("__keep"))
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return ch.select(
        *keys,
        *attr_cols,
        F.col(vf).alias("valid_from"),
        F.lead(vf).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(vf).over(w2).isNull().cast("int").alias("is_current"),
    )
