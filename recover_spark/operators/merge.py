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
