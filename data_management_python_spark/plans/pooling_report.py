"""Project pooling report + experiment metadata updator plans.

1. Pooling report (igf_data/utils/project_pooling_info.py:55-141):
   project ⟕ sample ⟕ sample_attribute(expected_read) ⟕ experiment ⟕
   run ⟕ run_attribute(R1_READ_COUNT), per-sample max(expected) vs
   sum(actual), then per-project pass/fail counts + failed-sample list,
   html-decorated project label.

2. Experiment metadata updator
   (igf_data/utils/experiment_metadata_updator.py:33-58): per sample,
   ';'-joined distinct attribute values (library_source / strategy /
   experiment_type) pushed onto experiments missing them.

Both are single declarative plans: EAV reads are filter+project,
dims broadcast, aggregates partial-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_management_python_spark.eav import attribute_value_of
from data_management_python_spark.functions import html_anchor
from data_management_python_spark.operators.aggregates import group_pass_fail


def sample_read_progress(
    project: DataFrame,
    sample: DataFrame,
    sample_attribute: DataFrame,
    run: DataFrame,
    experiment: DataFrame,
    run_attribute: DataFrame,
) -> DataFrame:
    """Per-sample expected vs actual reads (project_pooling_info.py:
    55-77): (project_igf_id, sample_igf_id, expected_read, total_read)."""
    # max() over possibly-repeated expected_read attribute rows — the
    # reference aggregates func.max (project_pooling_info.py:58); a
    # plain join would fan out samples with duplicate attributes
    expected = (
        attribute_value_of(sample_attribute, "sample_id", "expected_read")
        .withColumn("expected_read", F.col("expected_read").cast("long"))
        .groupBy("sample_id")
        .agg(F.max("expected_read").alias("expected_read"))
    )
    actual = attribute_value_of(
        run_attribute, "run_id", "R1_READ_COUNT", out_col="r1_reads"
    ).withColumn("r1_reads", F.col("r1_reads").cast("long"))

    runs = run.select("run_id", "experiment_id").join(actual, on="run_id")
    per_exp = runs.join(
        broadcast(experiment.select("experiment_id", "sample_id")),
        on="experiment_id",
    )
    per_sample = per_exp.groupBy("sample_id").agg(
        F.sum("r1_reads").alias("total_read")
    )
    return (
        sample.select("sample_id", "sample_igf_id", "project_id")
        .join(broadcast(expected), on="sample_id", how="left")
        .join(per_sample, on="sample_id", how="left")
        .join(broadcast(project.select("project_id", "project_igf_id")), on="project_id")
        .select(
            "project_igf_id",
            "sample_igf_id",
            F.coalesce("expected_read", F.lit(0)).alias("expected_read"),
            F.coalesce("total_read", F.lit(0)).alias("total_read"),
        )
    )


def project_pooling_report(
    progress: DataFrame, portal_base_url: str = "/project"
) -> DataFrame:
    """Per-project pass/fail rollup with failed-sample list and html
    project link (project_pooling_info.py:78-141)."""
    # strictly greater, as the reference computes it
    # (project_pooling_info.py:100: pass when max(expected) < sum(total))
    report = group_pass_fail(
        progress,
        group_cols=["project_igf_id"],
        pass_condition=F.col("total_read") > F.col("expected_read"),
        sample_col="sample_igf_id",
    )
    return report.withColumn(
        "project_link",
        html_anchor(
            F.col("project_igf_id"),
            F.concat(F.lit(portal_base_url + "/"), F.col("project_igf_id")),
        ),
    )


def update_experiment_metadata_from_samples(
    experiment: DataFrame,
    sample_attribute: DataFrame,
    attributes: tuple[str, ...] = (
        "library_source",
        "library_strategy",
        "experiment_type",
    ),
) -> DataFrame:
    """Fill missing experiment metadata from per-sample attributes:
    value = ';'-joined sorted distinct attribute values per sample
    (experiment_metadata_updator.py:33-58); existing experiment values
    win (coalesce)."""
    out = experiment
    for attr in attributes:
        vals = (
            sample_attribute.filter(F.col("attribute_name") == attr)
            .groupBy("sample_id")
            .agg(
                F.array_join(
                    F.sort_array(F.collect_set("attribute_value")), ";"
                ).alias(f"__{attr}")
            )
        )
        out = out.join(broadcast(vals), on="sample_id", how="left").withColumn(
            attr, F.coalesce(F.col(attr), F.col(f"__{attr}"))
        ).drop(f"__{attr}")
    return out
