"""Distributed file transfer — the engine-side replacement for the
reference's ssh/scp run-directory shipping (S14:
igf_data/utils/fileutils.py copy_remote_file / remote_file_checkmd5,
igf_data/process/seqrun_processing transfer paths).

A Spark cluster does not ssh files around: storage is a shared path
namespace, so "transfer" becomes a DISTRIBUTED COPY: one
``binaryFile`` scan of the source
tree (Spark lists, splits, and schedules the files across executors),
one executor-side write per file preserving relative layout, and a
returned manifest with per-file sizes + md5s — the integrity check
the reference runs as a separate remote md5sum pass comes free in the
same job.

Scope: both ends must be LOCALLY-MOUNTED paths (local disk, shared
filesystem, FUSE mount) — the writer uses plain os/open, and
:func:`_require_local_path` rejects cloud URIs explicitly; object
stores get the storage layer's native copy plus this module's
manifest/verify pass over a mount.

Scale shape: files never route through the driver; per-task memory is
bounded by the largest single file in its batch (media-sized blobs —
for multi-GB objects use the storage layer's native copy and keep the
manifest pass).  The manifest is the verification artifact AND the
idempotence key: re-running compares md5s instead of re-copying.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSFER_MANIFEST_SCHEMA = StructType(
    [
        StructField("rel_path", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("md5", StringType(), False),
    ]
)


def _strip_file_scheme(path: str) -> str:
    """file:/abs or file:///abs -> /abs; raw paths pass through.
    Deliberately NOT urllib unquoting: Spark's binaryFile ``path`` is
    a raw Hadoop Path string (spaces and percent signs appear
    literally), so decoding would corrupt names containing '%'."""
    if path.startswith("file:"):
        rest = path[5:]
        # collapse any number of leading slashes to one
        return "/" + rest.lstrip("/")
    return path


def _require_local_path(path: str, what: str) -> str:
    """This implementation writes with os/open, so both ends must be
    locally-mounted paths (plain paths or file:// URIs) — a shared
    filesystem or FUSE mount on a cluster, local disk in local mode.
    Cloud object-store URIs (s3a://, hdfs://, gs://) need the storage
    layer's native copy; run the manifest/verify pass on the mount.
    Raising beats silently creating a literal './s3a:' directory."""
    from urllib.parse import urlparse  # noqa: PLC0415

    parsed = urlparse(path)
    if parsed.scheme and parsed.scheme != "file":
        raise ValueError(
            f"{what} {path!r}: only locally-mounted paths are supported "
            f"(scheme {parsed.scheme!r}); use the object store's native "
            "copy for cloud URIs and verify_transfer on a mount"
        )
    return os.path.abspath(parsed.path if parsed.scheme else path)


def transfer_tree(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    glob: str = "*",
    batch_rows: int = 8,
) -> DataFrame:
    """Copy every file under ``src_dir`` matching ``glob`` into
    ``dest_dir`` (relative layout preserved) and return the
    (rel_path, n_bytes, md5) manifest.

    The copy executes EAGERLY inside this call (the returned manifest
    is checkpointed): a side-effecting plan must run exactly once, not
    once per downstream action — verify_transfer joining a lazy copy
    plan would re-copy files WHILE hashing them.  ``dest_dir`` must be
    writable from the executors (true in local mode and for shared
    filesystems, the same contract as write_media_shards); see
    :func:`_require_local_path` for the scheme contract.
    """
    src_root = _require_local_path(src_dir, "src_dir")
    dest_root = _require_local_path(dest_dir, "dest_dir")
    dest_dir = dest_root

    def copy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rels, sizes, sums = [], [], []
            for _, row in pdf.iterrows():
                local = _strip_file_scheme(row["path"])
                rel = os.path.relpath(local, src_root)
                blob = bytes(row["content"])
                dest = os.path.join(dest_dir, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "wb") as f:
                    f.write(blob)
                rels.append(rel)
                sizes.append(len(blob))
                sums.append(hashlib.md5(blob).hexdigest())
            yield pd.DataFrame(
                {"rel_path": rels, "n_bytes": sizes, "md5": sums}
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(src_root)
        .select("path", "content")
    )
    plan = files.mapInPandas(copy, schema=TRANSFER_MANIFEST_SCHEMA)
    # bound Arrow batches for the blob-sized rows ONLY for this job,
    # restoring the session value after — and materialize eagerly so
    # the copy side effect happens exactly once, here
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, "10000")
    spark.conf.set(key, str(batch_rows))
    try:
        return plan.localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, prev)


def verify_transfer(
    spark: SparkSession, manifest: DataFrame, dest_dir: str
) -> DataFrame:
    """Re-hash the destination tree and anti-join against the source
    manifest: returns the rows that are MISSING or CORRUPT at the
    destination (empty = transfer verified) — the reference's
    remote_file_checkmd5 as one distributed comparison instead of a
    per-file ssh round-trip."""
    from typing import Iterator as _Iter  # noqa: PLC0415

    from pyspark.sql import functions as F

    root = _require_local_path(dest_dir, "dest_dir")

    # rel_path must decode EXACTLY like transfer_tree's
    # (_strip_file_scheme, NO percent-decoding: Spark's binaryFile
    # path column is a raw Hadoop Path string, so a literal '%20' in a
    # filename must stay '%20') or names falsely mismatch
    def relpaths(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            rels, sums = [], []
            for _, row in pdf.iterrows():
                local = _strip_file_scheme(row["path"])
                rels.append(os.path.relpath(local, root))
                sums.append(hashlib.md5(bytes(row["content"])).hexdigest())
            yield pd.DataFrame({"rel_path": rels, "dest_md5": sums})

    dest = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
        .mapInPandas(relpaths, schema="rel_path string, dest_md5 string")
    )
    return (
        manifest.join(dest, "rel_path", "left")
        .filter(
            F.col("dest_md5").isNull()
            | (F.col("dest_md5") != F.col("md5"))
        )
        .select("rel_path", "md5", "dest_md5")
    )
