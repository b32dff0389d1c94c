"""Fastq discovery, R1/R2 pairing, and read counting.

Reference behaviors re-expressed:
  - directory scan for ``*_R1_*.fastq(.gz)`` files + samplesheet match
    (collect_seqrun_fastq_to_db.py:84-144 _get_fastq_and_samplesheet)
  - R1<->R2 pairing by filename convention
    (igf_data/utils/fastq_utils.py:5-57: regex ``_R1_`` swapped to _R2_)
  - read count = line count / 4 (collect_seqrun_fastq_to_db.py:248-291,
    zcat | wc -l): here ``spark.read.text().count()/4`` — gz codecs are
    handled by Spark; counting distributes across the cluster instead
    of one zcat per file.

Filename convention (public Illumina naming):
``{Sample_Name}_S{n}_L{lane:03d}_R{read}_{chunk:03d}.fastq[.gz]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FASTQ_NAME_RE = r"^(.+)_S(\d+)_L(\d{3})_R([12])_(\d{3})\.fastq(?:\.gz|\.bz2)?$"


def list_fastq_files(spark: SparkSession, root: str) -> DataFrame:
    """Recursive fastq listing -> (file_path, size) via binaryFile
    metadata only (content not read)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fastq*")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.regexp_replace(F.col("path"), "^file:/*", "/").alias("file_path"),
            F.col("length").alias("size"),
        )
    )


def parse_fastq_names(files: DataFrame, path_col: str = "file_path") -> DataFrame:
    """Decompose fastq paths into (sample_name, s_index, lane, read, chunk)."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return (
        files.withColumn("__base", base)
        .withColumn("sample_name", F.regexp_extract("__base", FASTQ_NAME_RE, 1))
        .withColumn("s_index", F.regexp_extract("__base", FASTQ_NAME_RE, 2).cast("int"))
        .withColumn("lane", F.regexp_extract("__base", FASTQ_NAME_RE, 3).cast("int").cast("string"))
        .withColumn("read", F.regexp_extract("__base", FASTQ_NAME_RE, 4))
        .withColumn("chunk", F.regexp_extract("__base", FASTQ_NAME_RE, 5))
        .filter(F.col("sample_name") != "")
        .drop("__base")
    )


def pair_fastq_files(files: DataFrame, path_col: str = "file_path") -> DataFrame:
    """Pair R1 with R2 by normalized key (fastq_utils.py:5-57).

    Output: (sample_name, lane, chunk, R1 path, R2 path, library_layout)
    — PAIRED when both present, SINGLE when only R1 (reference treats
    R1-only as single-end).
    """
    parsed = parse_fastq_names(files, path_col)
    keys = ["sample_name", "s_index", "lane", "chunk"]
    r1 = parsed.filter(F.col("read") == "1").select(
        *keys, F.col(path_col).alias("R1")
    )
    r2 = parsed.filter(F.col("read") == "2").select(
        *keys, F.col(path_col).alias("R2")
    )
    return (
        r1.join(r2, on=keys, how="left")
        .withColumn(
            "library_layout",
            F.when(F.col("R2").isNotNull(), F.lit("PAIRED")).otherwise(F.lit("SINGLE")),
        )
    )


def count_fastq_reads(spark: SparkSession, path: str) -> int:
    """Read count of one fastq (4 lines per record)."""
    return spark.read.text(path).count() // 4


def count_fastq_reads_many(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-file read counts in one distributed job: (file_path, n_reads).

    ``input_file_name()`` groups lines by source file, so a thousand
    fastqs count in one stage instead of a thousand driver loops."""
    lines = spark.read.text(list(paths)).select(
        F.regexp_replace(F.input_file_name(), "^file:/*", "/").alias("file_path")
    )
    return lines.groupBy("file_path").agg(
        (F.count(F.lit(1)) / 4).cast("long").alias("n_reads")
    )
