"""S6/S7 — zip-archive member source.

Reference: exports arrive as zip archives of NDJSON files; the dispatch
Lambda enumerates members and filters out directories, Manifests and
empty entries (src/lambda_function/dispatch/app.py:85-118,
src/glue/jobs/s3_to_json.py:864-874), while raw_sync lists members
without downloading via ranged central-directory reads
(src/lambda_function/raw_sync/app.py:237-273,308-435).

Spark-first shape: archive enumeration is a *file-listing* concern, so
it stays on the driver (zipfile reads only the central directory — the
S7 metadata-only optimization comes free with local/posix reads); the
member CONTENT is processed by executors.  Two paths:

- ``list_archive_members``: the S7 listing -> a small DataFrame of
  member metadata (joinable against manifests for reconciliation).
- ``read_archive_ndjson``: extract eligible members to a scratch dir
  (driver streams bytes; ~100 MB parts per the reference's rotation) and
  hand the directory to Spark's distributed JSON reader with a declared
  schema — executors do all parsing.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def eligible_member(name: str, size: int) -> bool:
    """Dispatch filter: non-dir, non-Manifest, size>0, not dotfile
    (dispatch/app.py:85-118)."""
    base = name.rsplit("/", 1)[-1]
    return (
        not name.endswith("/")
        and size > 0
        and "Manifest" not in base
        and not base.startswith(".")
        and "/" not in name  # reference rejects nested paths (s3_to_json.py:868)
    )


def list_archive_members(spark: SparkSession, archive_path: str) -> DataFrame:
    """S7 — metadata-only member listing (central directory read)."""
    with zipfile.ZipFile(archive_path) as zf:
        rows = [
            (info.filename, info.file_size, info.compress_size,
             eligible_member(info.filename, info.file_size))
            for info in zf.infolist()
        ]
    schema = T.StructType(
        [
            T.StructField("member_name", T.StringType()),
            T.StructField("file_size", T.LongType()),
            T.StructField("compress_size", T.LongType()),
            T.StructField("eligible", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


class LocalRangedFile:
    """Ranged-read adapter over a local path — the test/posix stand-in
    for an object-store client's ``GetObject(Range=bytes=a-b)``.  Any
    object with ``size`` and ``read(offset, length)`` works (wrap your
    store's ranged GET in the same two methods)."""

    def __init__(self, path: str):
        self._path = path
        self.size = os.path.getsize(path)

    def read(self, offset: int, length: int) -> bytes:
        with open(self._path, "rb") as fh:
            fh.seek(offset)
            return fh.read(length)


_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_EOCD64_SIG = b"PK\x06\x06"
_CDH_SIG = b"PK\x01\x02"
_EOCD_TAIL_GUESS = 64 * 1024  # EOCD + max comment (65535) fits in 64K+22


def _ranged_central_directory(reader) -> list[tuple[str, int, int]]:
    """(name, file_size, compress_size) for every member, from ranged
    reads ONLY — the raw_sync trick (raw_sync/app.py:237-273,308-435):
    one tail read finds the end-of-central-directory record (scanning
    backwards past any archive comment), an optional second pins the
    ZIP64 EOCD when the classic fields are saturated, and one more
    fetches exactly the central directory span.  Bytes transferred are
    O(members), never O(archive) — the part that matters when the
    archive sits in object storage."""
    import struct

    size = reader.size
    tail_len = min(size, _EOCD_TAIL_GUESS + 22)
    tail = reader.read(size - tail_len, tail_len)
    at = tail.rfind(_EOCD_SIG)
    if at < 0:
        raise ValueError("not a zip archive: EOCD signature not found")
    eocd = tail[at:at + 22]
    # EOCD fixed fields: total entries (u16 @10), central-directory
    # size (u32 @12) and offset (u32 @16)
    n_entries = struct.unpack_from("<H", eocd, 10)[0]
    cd_size = struct.unpack_from("<I", eocd, 12)[0]
    cd_offset = struct.unpack_from("<I", eocd, 16)[0]
    if 0xFFFFFFFF in (cd_size, cd_offset) or n_entries == 0xFFFF:
        # ZIP64: the EOCD64 locator sits 20 bytes before the EOCD
        loc_at = at - 20
        loc = (
            tail[loc_at:loc_at + 20]
            if loc_at >= 0
            else reader.read(size - tail_len + at - 20, 20)
        )
        if loc[:4] != _EOCD64_LOC_SIG:
            raise ValueError("saturated EOCD without a ZIP64 locator")
        eocd64_off = struct.unpack_from("<Q", loc, 8)[0]
        eocd64 = reader.read(eocd64_off, 56)
        if eocd64[:4] != _EOCD64_SIG:
            raise ValueError("bad ZIP64 EOCD signature")
        n_entries = struct.unpack_from("<Q", eocd64, 32)[0]
        cd_size = struct.unpack_from("<Q", eocd64, 40)[0]
        cd_offset = struct.unpack_from("<Q", eocd64, 48)[0]
    cd = reader.read(cd_offset, cd_size)
    out: list[tuple[str, int, int]] = []
    p = 0
    for _ in range(n_entries):
        if cd[p:p + 4] != _CDH_SIG:
            raise ValueError(f"bad central-directory entry at {p}")
        comp_size = struct.unpack_from("<I", cd, p + 20)[0]
        file_size = struct.unpack_from("<I", cd, p + 24)[0]
        name_len = struct.unpack_from("<H", cd, p + 28)[0]
        extra_len = struct.unpack_from("<H", cd, p + 30)[0]
        comment_len = struct.unpack_from("<H", cd, p + 32)[0]
        name = cd[p + 46:p + 46 + name_len].decode("utf-8")
        if 0xFFFFFFFF in (comp_size, file_size):
            # sizes overflowed into the ZIP64 extra field (id 0x0001):
            # uncompressed then compressed, only the saturated ones
            extra = cd[p + 46 + name_len:p + 46 + name_len + extra_len]
            q = 0
            while q + 4 <= len(extra):
                fid, flen = struct.unpack_from("<HH", extra, q)
                if fid == 0x0001:
                    r = q + 4
                    if file_size == 0xFFFFFFFF:
                        file_size = struct.unpack_from("<Q", extra, r)[0]
                        r += 8
                    if comp_size == 0xFFFFFFFF:
                        comp_size = struct.unpack_from("<Q", extra, r)[0]
                    break
                q += 4 + flen
        out.append((name, file_size, comp_size))
        p += 46 + name_len + extra_len + comment_len
    return out


def list_archive_members_ranged(spark: SparkSession, reader) -> DataFrame:
    """S7 over a REMOTE store: the same member listing as
    ``list_archive_members``, from byte-range reads alone (2-3 ranged
    GETs regardless of archive size) — the reference's
    list-without-downloading behavior (raw_sync/app.py:237-273).
    ``reader`` is any object with ``size`` and ``read(offset, length)``
    (``LocalRangedFile`` adapts a posix path)."""
    rows = [
        (name, fsize, csize, eligible_member(name, fsize))
        for name, fsize, csize in _ranged_central_directory(reader)
    ]
    schema = T.StructType(
        [
            T.StructField("member_name", T.StringType()),
            T.StructField("file_size", T.LongType()),
            T.StructField("compress_size", T.LongType()),
            T.StructField("eligible", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def read_archive_ndjson(
    spark: SparkSession,
    archive_path: str,
    schema: T.StructType,
    scratch_dir: str,
    chunk_size: int = 1 << 20,
) -> DataFrame:
    """S6 — stream eligible members out of the archive and scan them as
    schema'd NDJSON.

    Extraction is a streaming copy (fixed memory, like the reference's
    8 MB-chunk recompression, raw/app.py:186-248); parsing happens on
    executors via the JSON source.
    """
    out = Path(scratch_dir)
    out.mkdir(parents=True, exist_ok=True)
    extracted = []
    with zipfile.ZipFile(archive_path) as zf:
        for info in zf.infolist():
            if not eligible_member(info.filename, info.file_size):
                continue
            dest = out / info.filename.rsplit("/", 1)[-1]
            with zf.open(info) as src, open(dest, "wb") as dst:
                while True:
                    chunk = src.read(chunk_size)
                    if not chunk:
                        break
                    dst.write(chunk)
            extracted.append(str(dest))
    if not extracted:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(
        str(out)
    )
