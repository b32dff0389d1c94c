"""bcl2fastq/BCLConvert Stats.json flatten.

Structure (public bcl2fastq2 output spec):
  ConversionResults[lane].DemuxResults[sample].IndexMetrics[] +
  UnknownBarcodes[lane].Barcodes{barcode: count}.

The reference flattens this with nested Python loops into a Pandas
frame (igf_data/process/data_qc/check_sequence_index_barcodes.py:33-83).
Here it is one ``spark.read.json`` with an explicit schema (dynamic
barcode keys parse as a MapType; no inference scan) + ``explode``s — a
parallel scan that handles one Stats.json or a directory of thousands
(demux farms emit one per flowcell).

Output row shape (FIXTURES.md §4): (runid, lane, sample, index, reads,
tag, total_read) with tag ∈ {known, unknown}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_SCHEMA = (
    "RunId string, "
    "ConversionResults array<struct<"
    "  LaneNumber: bigint, TotalClustersPF: bigint,"
    "  DemuxResults: array<struct<"
    "    SampleId: string, SampleName: string, NumberReads: bigint,"
    "    IndexMetrics: array<struct<IndexSequence: string,"
    "                               MismatchCounts: map<string,bigint>>>"
    "  >>"
    ">>, "
    "UnknownBarcodes array<struct<Lane: bigint, Barcodes: map<string,bigint>>>"
)


def read_demux_stats(spark: SparkSession, path: str) -> DataFrame:
    """Flatten Stats.json (file, glob, or directory) to known+unknown
    barcode rows."""
    raw = spark.read.schema(STATS_SCHEMA).option("multiLine", "true").json(path)

    lanes = raw.select(
        F.col("RunId").alias("runid"),
        F.explode("ConversionResults").alias("cr"),
        F.col("UnknownBarcodes"),
    )
    known = (
        lanes.select(
            "runid",
            F.col("cr.LaneNumber").cast("int").alias("lane"),
            F.col("cr.TotalClustersPF").alias("total_read"),
            F.explode("cr.DemuxResults").alias("dr"),
        )
        .select(
            "runid",
            "lane",
            "total_read",
            F.col("dr.SampleId").alias("sample"),
            F.col("dr.NumberReads").alias("reads"),
            F.explode_outer("dr.IndexMetrics").alias("im"),
        )
        .select(
            "runid",
            "lane",
            "sample",
            F.coalesce(F.col("im.IndexSequence"), F.lit("")).alias("index"),
            "reads",
            F.lit("known").alias("tag"),
            "total_read",
        )
    )

    totals = raw.select(
        F.col("RunId").alias("runid"), F.explode("ConversionResults").alias("cr")
    ).select(
        "runid",
        F.col("cr.LaneNumber").cast("int").alias("lane"),
        F.col("cr.TotalClustersPF").alias("total_read"),
    )
    unknown = (
        raw.select(
            F.col("RunId").alias("runid"), F.explode("UnknownBarcodes").alias("ub")
        )
        .select(
            "runid",
            F.col("ub.Lane").cast("int").alias("lane"),
            F.explode(F.col("ub.Barcodes")).alias("index", "reads"),
        )
        .withColumn("sample", F.lit("undetermined"))
        .withColumn("tag", F.lit("unknown"))
        .join(totals, on=["runid", "lane"], how="left")
        .select("runid", "lane", "sample", "index", "reads", "tag", "total_read")
    )
    return known.unionByName(unknown)


def with_mapping_stats(stats: DataFrame) -> DataFrame:
    """Attach mapping_ratio and log_total_read (reference :82, :152)."""
    return stats.withColumn(
        "mapping_ratio", F.col("reads") / F.col("total_read")
    ).withColumn("log_total_read", F.log2("total_read"))
