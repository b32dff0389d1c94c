"""End-to-end demultiplexing dataflow — the Spark re-expression of the
reference's flagship Airflow DAG (dag22_bclconvert_demult_utils.py,
5937 LoC; lifecycle in SURVEY §3.3).

The reference splits this into ~30 Airflow tasks passing state through
XCom and the MySQL DB, with per-task HPC jobs.  Here the whole flow is
one declarative composition over DataFrames:

  1. samplesheet normalize + 10X expansion        (stage 3 of the DAG)
  2. work-unit partitioning by (project, lane,
     index-length group)                          (:5344-5565)
  3. bases-mask derivation per work unit          (:5568-5639)
  4. [external] bclconvert runs per work unit — out of engine scope;
     its outputs (fastq files + Stats.json) are the inputs of:
  5. fastq discovery + pairing + read counting    (:2714-2979)
  6. experiment/run id synthesis + registration   (:2814; same logic as
     collect_seqrun_fastq_to_db.py:294-348)
  7. barcode QC gates                             (:3968)

The work-unit split that the reference implements by WRITING one
samplesheet file per unit becomes a ``repartition`` on the unit key —
the same parallelism, no files, and downstream stages inherit the
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_python_spark.functions import (
    synthesize_experiment_id,
    synthesize_run_id,
)
from data_management_python_spark.sources.samplesheet import (
    add_pseudo_lane,
    group_by_index_length,
)
from data_management_python_spark.sources.singlecell import expand_tenx_barcodes
from data_management_python_spark.sources.fastq import pair_fastq_files


def build_work_units(
    sheet: DataFrame, platform_series: str
) -> DataFrame:
    """Stages 1-2: normalized sheet -> rows tagged with their demux
    work-unit key (project, lane, index-length group) and repartitioned
    on it, mirroring the reference's per-unit samplesheet split
    (dag22:5344-5565)."""
    expanded = expand_tenx_barcodes(sheet)
    laned = add_pseudo_lane(expanded, platform_series)
    grouped = group_by_index_length(laned)
    # zero-length-index rows are excluded from demux grouping
    # (reference samplesheet.py:158-159: groups only truthy lengths),
    # and duplicate combined barcodes within a lane collapse
    # (samplesheet_utils.py:104-106 drop_duplicates on combined index)
    combined = F.concat_ws(
        "+", F.col("index"),
        F.col("index2") if "index2" in grouped.columns else F.lit(""),
    )
    unit = (
        grouped.filter(F.col("index_length_group") > 0)
        .withColumn("__c_index", combined)
        .dropDuplicates(["PseudoLane", "__c_index"])
        .drop("__c_index")
        .withColumn(
            "work_unit",
            F.concat_ws(
                ":",
                F.col("Sample_Project"),
                F.col("PseudoLane"),
                F.col("index_length_group"),
            ),
        )
    )
    return unit.repartition("work_unit")


def work_unit_manifest(units: DataFrame) -> DataFrame:
    """Per-work-unit summary: sample count + index lengths — what the
    reference materializes as one samplesheet file per unit."""
    return units.groupBy(
        "work_unit", "Sample_Project", "PseudoLane", "index_length_group"
    ).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.array_join(F.sort_array(F.collect_set("Sample_ID")), ";").alias(
            "sample_ids"
        ),
    )


def register_fastq_outputs(
    units: DataFrame,
    fastq_files: DataFrame,
    read_counts: DataFrame,
    platform_model: str,
    flowcell_id: str,
) -> DataFrame:
    """Stages 5-6: pair fastq files, join them back to their samplesheet
    rows, synthesize experiment/run ids, attach read counts.

    Output grain: one row per (sample, lane, chunk) with R1/R2 paths,
    library layout, experiment_igf_id and run_igf_id — the rows the
    reference loads into experiment/run/collection/file tables
    (register_experiment_and_runs_to_db, dag22:2814;
    collect_seqrun_fastq_to_db.py:294-348).
    """
    pairs = pair_fastq_files(fastq_files)
    r1_counts = read_counts.withColumnRenamed("file_path", "R1").withColumnRenamed(
        "n_reads", "R1_READ_COUNT"
    )
    sheet_cols = units.select(
        F.col("Sample_ID"),
        F.col("Sample_Name").alias("sample_name"),
        F.col("Sample_Project").alias("project_igf_id"),
        F.col("PseudoLane").alias("lane_number"),
    ).dropDuplicates(["sample_name", "lane_number"])
    out = (
        pairs.join(
            sheet_cols,
            on=(
                (pairs.sample_name == sheet_cols.sample_name)
                & (pairs.lane.cast("string") == F.regexp_replace(sheet_cols.lane_number, "^0+", ""))
            ),
            how="inner",
        )
        .drop(sheet_cols.sample_name)
        .join(r1_counts, on="R1", how="left")
    )
    exp_id = synthesize_experiment_id(F.col("Sample_ID"), F.lit(platform_model))
    return out.select(
        "project_igf_id",
        "Sample_ID",
        "sample_name",
        "lane_number",
        "R1",
        "R2",
        "library_layout",
        F.coalesce("R1_READ_COUNT", F.lit(0)).alias("R1_READ_COUNT"),
        exp_id.alias("experiment_igf_id"),
        synthesize_run_id(exp_id, F.lit(flowcell_id), F.col("lane_number")).alias(
            "run_igf_id"
        ),
    )


def demux_report(registered: DataFrame) -> DataFrame:
    """Stage 7 companion: per-project read totals from the registered
    rows (feeds plans.read_count / gviz sinks)."""
    return registered.groupBy("project_igf_id").agg(
        F.countDistinct("Sample_ID").alias("n_samples"),
        F.sum("R1_READ_COUNT").alias("total_reads"),
        F.count(F.when(F.col("library_layout") == "PAIRED", 1)).alias(
            "n_paired_units"
        ),
    )
