"""Incremental sequencing-run discovery + pipeline seeding (SURVEY §2.9).

The reference polls the filesystem from Airflow: list run directories,
subtract those already registered, gate on a completion marker file,
then seed pipelines exactly-once
(find_and_process_new_seqrun.py:18-39,148-211; pipeline_seed
anti-join pipelineadaptor.py:523-569).

Spark-first re-expression:
  - batch mode: one listing scan + left_anti vs the registry table —
    idempotent, exactly-once by natural key.
  - streaming mode: Structured Streaming file source with
    ``Trigger.AvailableNow`` — Spark's checkpointed file listing IS the
    exactly-once registry, replacing the hand-rolled DB bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_python_spark.operators.joins import anti_join

COMPLETION_MARKER = "RTAComplete.txt"


def list_run_dirs(spark: SparkSession, root: str, marker: str = COMPLETION_MARKER) -> DataFrame:
    """Finished run directories under root: (seqrun_igf_id, run_path).

    A run is 'finished' when its completion marker exists (reference
    check_finished_seqrun_dir, find_and_process_new_seqrun.py:148-185)
    — the file-arrival watermark of the batch world.
    """
    marker_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", marker)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.regexp_replace("path", "^file:/*", "/").alias("marker_path"))
    )
    run_path = F.regexp_replace("marker_path", f"/{marker}$", "")
    return marker_files.select(
        F.element_at(F.split(run_path, "/"), -1).alias("seqrun_igf_id"),
        run_path.alias("run_path"),
    )


def discover_new_runs(
    spark: SparkSession, root: str, registry: DataFrame
) -> DataFrame:
    """Finished run dirs not yet in the registry (anti-join on
    seqrun_igf_id) — check_seqrun_dir_in_db analog
    (find_and_process_new_seqrun.py:186-211)."""
    finished = list_run_dirs(spark, root)
    return anti_join(
        finished, registry.select("seqrun_igf_id"), on="seqrun_igf_id"
    )


def seed_new_runs(
    seeds: DataFrame,
    new_runs: DataFrame,
    pipeline_id: int,
    reject_runs: DataFrame | None = None,
) -> DataFrame:
    """Exactly-once pipeline seeding: SEEDED rows for unseen runs,
    skipping rejected ones (pipelineadaptor.py:533-548 seed_new_seqruns;
    reject_run='Y' exclusion :536,547).

    ``seeds`` columns: (pipeline_id, seed_id, seed_table, status);
    ``new_runs`` must carry seqrun_igf_id + a surrogate ``seed_id``.
    """
    candidates = new_runs.select(
        F.lit(pipeline_id).cast("long").alias("pipeline_id"),
        F.col("seed_id").cast("long"),
        F.lit("seqrun").alias("seed_table"),
        F.lit("SEEDED").alias("status"),
    )
    if reject_runs is not None:
        rejected = reject_runs.filter(F.col("reject_run") == "Y").select("seed_id")
        candidates = anti_join(candidates, rejected, on="seed_id")
    fresh = anti_join(
        candidates, seeds.select("pipeline_id", "seed_id", "seed_table"),
        on=["pipeline_id", "seed_id", "seed_table"],
    )
    return seeds.unionByName(fresh.select(*seeds.columns))


def stream_new_run_markers(
    spark: SparkSession,
    root: str,
    checkpoint_dir: str,
    out_dir: str,
    marker: str = COMPLETION_MARKER,
):
    """Structured Streaming discovery: the file source's checkpointed
    listing provides exactly-once marker pickup; each micro-batch
    appends newly finished runs to ``out_dir``.

    Returns the started StreamingQuery (Trigger.AvailableNow — drains
    the backlog then stops, the Airflow-schedule analog)."""
    stream = (
        spark.readStream.format("text")
        .option("pathGlobFilter", marker)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1000)
        .load(root)
        .select(F.input_file_name().alias("marker_path"))
        .distinct()
        .select(
            F.element_at(
                F.split(F.regexp_replace("marker_path", f"/{marker}$", ""), "/"), -1
            ).alias("seqrun_igf_id"),
            F.regexp_replace(
                F.regexp_replace("marker_path", "^file:/*", "/"), f"/{marker}$", ""
            ).alias("run_path"),
        )
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def register_seqrun_batch(
    registry: DataFrame, new_runs: DataFrame, platform: DataFrame
) -> DataFrame:
    """Append newly discovered runs to the seqrun registry with platform
    FK resolution by instrument-name convention
    (_check_and_load_seqrun_to_db, dag22:5835-5895): seqrun id format
    yymmdd_INSTRUMENT_NNNN_FLOWCELL."""
    parts = F.split("seqrun_igf_id", "_")
    enriched = new_runs.select(
        "seqrun_igf_id",
        parts.getItem(1).alias("platform_igf_id"),
        F.element_at(parts, -1).alias("flowcell_id"),
        F.lit("N").alias("reject_run"),
    ).join(
        F.broadcast(platform.select("platform_igf_id", "platform_id")),
        on="platform_igf_id",
        how="left",
    ).drop("platform_igf_id")
    fresh = anti_join(enriched, registry.select("seqrun_igf_id"), on="seqrun_igf_id")
    return registry.unionByName(fresh.select(*registry.columns), allowMissingColumns=True)
