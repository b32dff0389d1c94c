"""Tests: pooling report plan, experiment metadata updator, index
min-truncation, session windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_management_python_spark.catalog import load_table
from data_management_python_spark.plans.pooling_report import (
    project_pooling_report,
    sample_read_progress,
    update_experiment_metadata_from_samples,
)
from data_management_python_spark.sources.samplesheet import (
    truncate_indexes_to_lane_min,
)
from data_management_python_spark.streaming.windows import session_window_counts


def test_pooling_report(spark):
    project = spark.createDataFrame(
        [(1, "PROJ_A")], "project_id long, project_igf_id string"
    )
    sample = spark.createDataFrame(
        [(10, "S1", 1), (11, "S2", 1)],
        "sample_id long, sample_igf_id string, project_id long",
    )
    sample_attr = spark.createDataFrame(
        [(10, "expected_read", "1000"), (11, "expected_read", "5000")],
        "sample_id long, attribute_name string, attribute_value string",
    )
    experiment = spark.createDataFrame(
        [(100, 10), (101, 11)], "experiment_id long, sample_id long"
    )
    run = spark.createDataFrame(
        [(1000, 100), (1001, 100), (1002, 101)],
        "run_id long, experiment_id long",
    )
    run_attr = spark.createDataFrame(
        [(1000, "R1_READ_COUNT", "600"), (1001, "R1_READ_COUNT", "500"),
         (1002, "R1_READ_COUNT", "100")],
        "run_id long, attribute_name string, attribute_value string",
    )
    progress = sample_read_progress(
        project, sample, sample_attr, run, experiment, run_attr
    )
    rows = {r.sample_igf_id: r for r in progress.collect()}
    assert rows["S1"].total_read == 1100 and rows["S1"].expected_read == 1000
    assert rows["S2"].total_read == 100

    report = project_pooling_report(progress).collect()[0]
    assert report.pass_count == 1 and report.fail_count == 1
    assert report.failed_list == "S2"
    assert report.project_link == '<a href="/project/PROJ_A">PROJ_A</a>'


def test_experiment_metadata_updator(spark):
    experiment = spark.createDataFrame(
        [(100, 10, None, "WGS"), (101, 11, "GENOMIC", None)],
        "experiment_id long, sample_id long, library_source string, "
        "library_strategy string",
    )
    sample_attr = spark.createDataFrame(
        [(10, "library_source", "TRANSCRIPTOMIC"),
         (10, "library_source", "GENOMIC"),
         (11, "library_strategy", "RNA-SEQ")],
        "sample_id long, attribute_name string, attribute_value string",
    )
    out = update_experiment_metadata_from_samples(
        experiment, sample_attr, attributes=("library_source", "library_strategy")
    )
    rows = {r.experiment_id: r for r in out.collect()}
    # missing value filled from sorted distinct sample attrs, ';'-joined
    assert rows[100].library_source == "GENOMIC;TRANSCRIPTOMIC"
    assert rows[100].library_strategy == "WGS"  # existing value wins
    assert rows[101].library_strategy == "RNA-SEQ"


def test_truncate_indexes_to_lane_min(spark):
    df = spark.createDataFrame(
        [("1", "ACGTACGT", "TTGGCCAA"), ("1", "ACGTAC", ""),
         ("2", "GGGGCCCC", "AATTGGCC")],
        "Lane string, index string, index2 string",
    )
    out = {(r.Lane, r["index"]): r for r in
           truncate_indexes_to_lane_min(df).collect()}
    # lane 1 min non-empty index length = 6 -> 8bp index truncated
    assert ("1", "ACGTAC") in out
    assert ("1", "ACGTAC") in out and ("2", "GGGGCCCC") in out
    lane1 = [k for k in out if k[0] == "1"]
    assert all(len(k[1]) == 6 for k in lane1)
    # index2: lane 1 has one empty -> min over non-empty = 8, unchanged
    assert out[("1", "ACGTAC")].index2 == ""


def test_session_window_counts_matches_manual_sessionize(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    sess = session_window_counts(ev, gap="30 minutes")
    # session count per user must match the lag/running-sum sessionizer
    from data_management_python_spark.plans.relational import e_sessionize

    manual = e_sessionize(spark, "/root/testdata/sf0.001")
    a = {r.user_id: r.n for r in
         sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {r.user_id: r.n for r in
         manual.groupBy("user_id").agg(F.countDistinct("session_id").alias("n")).collect()}
    assert a == b
