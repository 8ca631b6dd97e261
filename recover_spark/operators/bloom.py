"""Bitset (Bloom-style) semi-join reduction, pure Catalyst.

At reference scale the deleted-key set (J1, src/glue/jobs/
json_to_parquet.py:224-301) is small enough to broadcast whole.  At
100 TB a key set can be billions of rows — too big to broadcast as
keys, while a *fixed-size* bit array summarizing it still fits in a few
megabytes.  This module builds that bit array as a DataFrame (so the
build is a distributed aggregate, never a driver collect) and uses it
to pre-filter the probe side before the exact join:

- build: ``pos = hash(key) mod M``; the M-bit array is represented as
  ``M/64`` (word_idx, 64-bit mask) rows via ``bit_or(shiftleft(1,
  pos%64))`` — one tiny groupBy, output size FIXED by M regardless of
  key count.
- probe: each row computes its (word_idx, bit) map-side and left-joins
  the broadcast bitmap on word_idx (a broadcast hash join of bounded
  size).  Bit clear → the key is DEFINITELY absent; bit set → candidate
  (true match or false positive, rate ≈ n_keys/M for this single-probe
  scheme).

``drop_deleted_filtered`` composes it into an EXACT anti-join: rows
proven absent bypass the join entirely (map-side branch, no shuffle);
only candidates — a small fraction when deletes are sparse — flow into
the exact anti-join.  This is manual semi-join reduction, the same idea
as Spark's runtime bloom-filter injection but explicit and usable where
the optimizer won't inject one.  The cost is a second scan of the probe relation (one
per branch); both branches are scan+filter map work with pushdown, so
at scale this trades cheap re-scan I/O for eliminating the fact-side
shuffle of a sort-merge anti-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _bit_position(key_cols: Sequence[str], bits: int, salt: str) -> Column:
    """Bit index of a composite key: xxhash64 (JVM intrinsic, ~20x
    cheaper than the md5-derived portable hash) — the bitmap is
    internal routing state, never compared against an external oracle,
    so engine-portability is not required here."""
    key = [F.lit(salt)] + [F.col(c).cast("string") for c in key_cols]
    return F.pmod(F.xxhash64(*key), F.lit(int(bits)))


def build_key_bitset(
    keys_df: DataFrame,
    key_cols: Sequence[str],
    bits: int = 1 << 20,
    salt: str = "bitset",
) -> DataFrame:
    """Aggregate a key set into an M-bit membership bitmap:
    (word_idx BIGINT, mask BIGINT) rows, at most ``bits/64`` of them.

    One groupBy on word_idx with map-side partial ``bit_or`` — the
    shuffle carries at most M/64 rows per map task no matter how many
    keys the build side has.
    """
    pos = _bit_position(key_cols, bits, salt)
    return (
        keys_df.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / _WORD).cast("bigint").alias("word_idx"),
            # the pyspark shiftleft wrapper only takes a literal shift;
            # the SQL form accepts a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {_WORD} AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("mask"))
    )


def _candidate_flag(
    df: DataFrame,
    key_cols: Sequence[str],
    bitset: DataFrame,
    bits: int,
    salt: str,
) -> DataFrame:
    """Attach ``__maybe`` — true iff the row's key MAY be in the set.

    The fact table's schema is arbitrary, so every internal column uses
    a ``__bloom_`` prefix and the bitset side is referenced through the
    bitset DataFrame's own column objects — a user column named
    ``mask`` or ``word_idx`` neither collides nor shadows.
    """
    pos = _bit_position(key_cols, bits, salt)
    probe = (
        df.withColumn("__bloom_pos", pos)
        .withColumn("__bloom_word", (F.col("__bloom_pos") / _WORD).cast("bigint"))
        .withColumn(
            "__bloom_bit",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(__bloom_pos % {_WORD} AS INT))"
            ),
        )
        .drop("__bloom_pos")
    )
    return (
        probe.join(
            F.broadcast(bitset),
            probe["__bloom_word"] == bitset["word_idx"],
            "left",
        )
        .withColumn(
            "__maybe",
            bitset["mask"].isNotNull()
            & (bitset["mask"].bitwiseAND(F.col("__bloom_bit")) != 0),
        )
        .drop(bitset["word_idx"])
        .drop(bitset["mask"])
        .drop("__bloom_word", "__bloom_bit")
    )


def drop_deleted_filtered(
    df: DataFrame,
    deleted: DataFrame,
    index_fields: Sequence[str],
    bits: int = 1 << 20,
    salt: str = "bitset",
) -> DataFrame:
    """EXACT left-anti delete application with bitset pre-filtering.

    Result is identical to ``drop_deleted`` (J1): the bitmap only
    routes rows.  Proven-absent rows (bit clear) are kept without ever
    entering a join; candidate rows go through the exact anti-join.
    False positives cost only a redundant probe of the exact join —
    they are still removed/kept correctly.
    """
    keys = list(index_fields)
    deleted_keys = deleted.select(*keys).dropDuplicates(keys)
    bitset = build_key_bitset(deleted_keys, keys, bits=bits, salt=salt)

    flagged = _candidate_flag(df, keys, bitset, bits, salt)
    clean = flagged.filter(~F.col("__maybe")).drop("__maybe")
    candidates = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(deleted_keys, on=keys, how="left_anti")
    )
    return clean.unionByName(candidates)
