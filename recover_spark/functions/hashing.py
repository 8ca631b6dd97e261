"""Engine-portable hashing for dedup/fingerprint operators.

``F.hash``/``F.xxhash64`` are Spark-specific (Murmur3/xxHash) and cannot
be reproduced by an external SQL oracle.  For operators whose results
must be checkable across engines (MinHash, SimHash, fingerprints) we
derive integers from ``md5`` — available with identical semantics in
Spark, DuckDB, Postgres, Snowflake.

hash64(s) = first 16 hex chars of md5(s) as an unsigned-ish bigint via
``conv(hex, 16, 10)``; hash32 uses 8 hex chars (fits in a signed 64-bit
range, so cross-engine casts are exact).

These stay inside whole-stage codegen (md5/conv/substring are JVM
intrinsics) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash_hex(col: Column | str, *, salt: str | None = None) -> Column:
    """Full md5 hex digest of a (salted) string column."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt), F.lit("|"), c)
    return F.md5(c.cast("string"))


def portable_hash32(col: Column | str, *, salt: str | None = None) -> Column:
    """Deterministic 32-bit-range hash as BIGINT (8 md5 hex chars).

    Oracle equivalent (DuckDB):
    ``CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)``.
    """
    return F.conv(F.substring(portable_hash_hex(col, salt=salt), 1, 8), 16, 10).cast(
        "bigint"
    )


def portable_hash64(col: Column | str, *, salt: str | None = None) -> Column:
    """Deterministic 60-bit hash as BIGINT (15 md5 hex chars — keeps the
    value positive and exactly representable in signed 64-bit on every
    engine)."""
    return F.conv(F.substring(portable_hash_hex(col, salt=salt), 1, 15), 16, 10).cast(
        "bigint"
    )
