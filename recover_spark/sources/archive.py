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
