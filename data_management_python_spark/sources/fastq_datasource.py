"""FASTQ as a first-class Spark 4 Python DataSource.

``spark.read.format("fastq").load(path)`` yields one row per sequencing
read — the record-level complement to the metadata-level helpers in
:mod:`.fastq` (which list/pair/count files without parsing them).
Re-expresses the reference's per-read access (fastq_utils.py and the
zcat-based record iteration in collect_seqrun_fastq_to_db.py:248-291)
as a distributed scan instead of per-file shell-outs.

Scale shape: one InputPartition per file — gzip'd FASTQ is not
splittable, so the file is the natural parallel unit and a 100 TB run
directory fans out across executors file-per-task exactly like Spark's
built-in binaryFile source.  Record parsing streams line-quadruplets
(constant memory per task); no driver-side content reads — the driver
only lists paths.

Registration: ``register_fastq_source(spark)`` once per session, then
any reader in the session can ``.format("fastq")``.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FASTQ_DS_SCHEMA = (
    "file_path string, record_no bigint, read_id string, "
    "sequence string, quality string"
)


def _list_fastq_paths(path: str) -> list[str]:
    """Resolve a file, directory, or glob into sorted fastq paths."""
    if os.path.isdir(path):
        pattern = os.path.join(path, "**", "*.fastq*")
        hits = _glob.glob(pattern, recursive=True)
    elif any(ch in path for ch in "*?["):
        hits = _glob.glob(path, recursive=True)
    else:
        hits = [path]
    return sorted(p for p in hits if os.path.isfile(p))


def _open_text(path: str) -> io.TextIOBase:
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "rt", encoding="ascii")


class FastqDataSource(DataSource):
    """``format("fastq")``: record-per-row FASTQ scan.

    Options: ``path`` (file / directory / glob).  Schema is fixed:
    (file_path, record_no, read_id, sequence, quality); record_no is
    0-based within its file, read_id drops the leading ``@``.
    """

    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return FASTQ_DS_SCHEMA

    def reader(self, schema) -> "FastqReader":
        return FastqReader(self.options)


class FastqReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("fastq source requires a path")
        self._paths = _list_fastq_paths(path)

    def partitions(self):
        # file == partition: gz members are unsplittable and plain-text
        # fastq records span 4 lines, so byte-ranges can't cut cleanly
        return [InputPartition(p) for p in self._paths]

    def read(self, partition):
        path = partition.value
        with _open_text(path) as fh:
            record_no = 0
            while True:
                header = fh.readline()
                if not header:
                    break
                seq = fh.readline()
                plus = fh.readline()
                qual = fh.readline()
                if not qual:
                    raise ValueError(
                        f"truncated FASTQ record {record_no} in {path}"
                    )
                if not header.startswith("@") or not plus.startswith("+"):
                    raise ValueError(
                        f"malformed FASTQ record {record_no} in {path}"
                    )
                yield (
                    path,
                    record_no,
                    header[1:].rstrip("\n"),
                    seq.rstrip("\n"),
                    qual.rstrip("\n"),
                )
                record_no += 1


def register_fastq_source(spark) -> None:
    """Idempotently register ``format("fastq")`` with the session."""
    spark.dataSource.register(FastqDataSource)
