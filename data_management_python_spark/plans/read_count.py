"""The reference's flagship report: per-project sample read counts.

Re-expresses the two-stage reference pipeline:
  1. get_project_read_count (igf_data/utils/projectutils.py:13-78):
     project ⋈ sample ⋈ experiment ⋈ run ⋈ seqrun ⋈ run_attribute
     (R1_READ_COUNT), ACTIVE-status chain filters.
  2. convert_project_data_gviz_data
     (igf_data/utils/project_data_display_utils.py:31-122): pivot
     rows=sample x cols=flowcell -> per-row total.

Inputs are reference-shaped DataFrames (catalog.CORE_SCHEMAS); output
feeds sinks.to_gviz_json for the dashboard.  The EAV read is a
filter+project (attribute_value_of), NOT a pivot — at fleet scale only
one attribute is consumed, so the name predicate pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_management_python_spark.eav import attribute_value_of
from data_management_python_spark.operators.aggregates import pivot_sum
from data_management_python_spark.operators.filters import filter_status_chain


def project_read_counts(
    project: DataFrame,
    sample: DataFrame,
    experiment: DataFrame,
    run: DataFrame,
    seqrun: DataFrame,
    run_attribute: DataFrame,
    project_igf_id: str | None = None,
) -> DataFrame:
    """Long-form read counts: (project_igf_id, sample_igf_id,
    flowcell_id, read_count).  Status chain: ACTIVE samples,
    experiments, runs (projectutils.py:65-67)."""
    p = project.select("project_id", "project_igf_id")
    if project_igf_id is not None:
        p = p.filter(F.col("project_igf_id") == project_igf_id)
    s = filter_status_chain(
        sample.select("sample_id", "sample_igf_id", "project_id", "status"),
        ["status"],
    ).drop("status")
    e = filter_status_chain(
        experiment.select("experiment_id", "sample_id", "status"), ["status"]
    ).drop("status")
    r = filter_status_chain(
        run.select("run_id", "experiment_id", "seqrun_id", "status"), ["status"]
    ).drop("status")
    sr = seqrun.select("seqrun_id", "flowcell_id")
    counts = attribute_value_of(
        run_attribute, "run_id", "R1_READ_COUNT", out_col="read_count"
    ).withColumn("read_count", F.col("read_count").cast("long"))

    return (
        r.join(counts, on="run_id")
        .join(broadcast(e), on="experiment_id")
        .join(broadcast(s), on="sample_id")
        .join(broadcast(p), on="project_id")
        .join(broadcast(sr), on="seqrun_id")
        .select("project_igf_id", "sample_igf_id", "flowcell_id", "read_count")
    )


def read_count_matrix(
    long_counts: DataFrame, flowcells: list[str] | None = None
) -> DataFrame:
    """Wide dashboard matrix: rows=sample, cols=flowcell, + total
    (project_data_display_utils.py:60-120).  Pass ``flowcells`` at
    scale to skip the pivot-values scan."""
    return pivot_sum(
        long_counts,
        row_key=["project_igf_id", "sample_igf_id"],
        pivot_col="flowcell_id",
        value_col="read_count",
        pivot_values=flowcells,
        add_total=True,
        total_col="total_read",
    )
