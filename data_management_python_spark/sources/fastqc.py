"""FastQC zip scrape (SURVEY §2.1 S12).

FastQC emits ``<name>_fastqc.zip`` containing ``fastqc_data.txt`` with
``Total Sequences\\t<n>`` / ``Sequence length\\t<range>`` lines
(reference igf_data/utils/fastqc_utils.py:4-39).

Implemented over ``spark.read.format('binaryFile')`` + a mapInPandas
batch that opens each zip in-memory — a fleet of QC zips scrapes in one
distributed pass (the reference loops one zip at a time).
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FASTQC_SCHEMA = "file_path string, total_sequences bigint, sequence_length string"

_TOTAL_RE = re.compile(r"Total Sequences\t(\d+)")
_LEN_RE = re.compile(r"Sequence length\t([\d-]+)")


def scrape_fastqc_member(blob: bytes) -> tuple[int | None, str | None]:
    """Extract (total_sequences, sequence_length) from one zip blob."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        member = next(
            (n for n in zf.namelist() if n.endswith("fastqc_data.txt")), None
        )
        if member is None:
            return None, None
        text = zf.read(member).decode("utf-8", errors="replace")
    total = _TOTAL_RE.search(text)
    length = _LEN_RE.search(text)
    return (int(total.group(1)) if total else None,
            length.group(1) if length else None)


def read_fastqc_zips(spark: SparkSession, root: str) -> DataFrame:
    """Scrape every ``*_fastqc.zip`` under root ->
    (file_path, total_sequences, sequence_length)."""
    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*_fastqc.zip")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            totals, lengths = [], []
            for blob in pdf["content"]:
                t, ln = scrape_fastqc_member(bytes(blob))
                totals.append(t)
                lengths.append(ln)
            yield pd.DataFrame(
                {
                    "file_path": pdf["path"].str.replace("^file:/*", "/", regex=True),
                    "total_sequences": pd.array(totals, dtype="Int64"),
                    "sequence_length": lengths,
                }
            )

    return bins.mapInPandas(process, schema=FASTQC_SCHEMA)
