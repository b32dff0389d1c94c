"""Disk-usage / storage-cost reporting (SURVEY §2 A13, F12, S6, O3).

Reference: igf_data/utils/disk_usage_utils.py:5-141 (merge per-server
usage JSON dumps, GB conversion, per-storage totals, sort desc) and
calculate_disk_usage_costs.py:104-114 (cost = usage x rate).

Spark-first: per-server dumps union (schema-merged), totals are one
partial-friendly groupBy, costs are a broadcast join against the tiny
rate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_management_python_spark.functions import bytes_to_gb


def read_usage_dumps(spark: SparkSession, path: str) -> DataFrame:
    """Per-server disk-usage JSON dumps -> one frame
    (storage, used, available, server_name)."""
    return spark.read.json(path)


def merge_usage(frames: list[DataFrame]) -> DataFrame:
    """UNION ALL of per-server frames, tolerant of missing columns
    (pd.concat analog, disk_usage_utils.py:66-105)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def storage_totals(usage: DataFrame) -> DataFrame:
    """Per-storage totals in GB, sorted desc (disk_usage_utils.py:
    106-141).  ``used`` is bytes."""
    return (
        usage.withColumn("used_gb", bytes_to_gb("used"))
        .groupBy("storage")
        .agg(
            F.sum("used_gb").alias("total_used_gb"),
            F.count(F.lit(1)).alias("n_servers"),
        )
        .orderBy(F.col("total_used_gb").desc())
    )


def storage_costs(usage: DataFrame, rates: DataFrame) -> DataFrame:
    """Per-storage monthly cost: usage GB x rate (broadcast join with the
    rate dim; __calculate_storage_costs analog)."""
    return (
        storage_totals(usage)
        .join(broadcast(rates), on="storage", how="left")
        .withColumn(
            "monthly_cost",
            F.col("total_used_gb") * F.coalesce(F.col("rate_per_gb"), F.lit(0.0)),
        )
    )
