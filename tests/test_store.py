"""TableStore facade tests — the adaptor-API parity layer, exercised
the way the reference's adaptor tests do (fixture rows in, fetch and
assert; SURVEY §5 pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_management_python_spark.store import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "catalog"))


def test_store_and_fetch_project(store, spark):
    projects = spark.createDataFrame(
        [(1, "IGFQ0001_test", "Test project", None, None, "ACTIVE", "FASTQ")],
        "project_id long, project_igf_id string, project_name string, "
        "start_timestamp timestamp, description string, status string, deliverable string",
    )
    store.store_records("project", projects)
    got = store.fetch_by("project", project_igf_id="IGFQ0001_test")
    assert got.count() == 1
    assert store.exists("project", status="ACTIVE")
    assert not store.exists("project", status="WITHDRAWN")


def test_enum_validation_on_store(store, spark):
    bad = spark.createDataFrame(
        [(2, "IGFQ0002", None, None, None, "NOT_A_STATUS", "FASTQ")],
        "project_id long, project_igf_id string, project_name string, "
        "start_timestamp timestamp, description string, status string, deliverable string",
    )
    with pytest.raises(ValueError, match="enum violation"):
        store.store_records("project", bad)


def test_store_with_attributes_and_fk(store, spark):
    projects = spark.createDataFrame(
        [(1, "IGFQ0001_test", None, None, None, "ACTIVE", "FASTQ")],
        "project_id long, project_igf_id string, project_name string, "
        "start_timestamp timestamp, description string, status string, deliverable string",
    )
    store.store_records("project", projects)
    # wide sample rows carrying unknown columns -> EAV, with FK by natural key
    samples = spark.createDataFrame(
        [
            ("IGF0001", "IGFQ0001_test", "ACTIVE", "96", "batch7"),
            ("IGF0002", "IGFQ0001_test", "ACTIVE", "48", None),
        ],
        "sample_igf_id string, project_igf_id string, status string, "
        "expected_read string, batch string",
    ).withColumn("sample_id", F.monotonically_increasing_id() + 10)
    store.store_with_attributes(
        "sample",
        samples,
        key_column="sample_id",
        fk=("project", "project_igf_id", "project_id"),
    )
    main = store.table("sample")
    assert main.count() == 2
    assert {r.project_id for r in main.collect()} == {1}
    # unknown columns melted to the attribute table, NULLs pruned
    eav = store.table("sample_attribute")
    names = {r.attribute_name for r in eav.collect()}
    assert names == {"expected_read", "batch"}
    assert eav.count() == 3

    wide = store.attributes_of(
        "sample", main.select("sample_id"), ["expected_read", "batch"]
    )
    by_id = {r.sample_id: r for r in wide.collect()}
    ids = sorted(by_id)
    assert by_id[ids[0]].expected_read == "96"
    assert by_id[ids[1]].batch is None


def test_upsert_and_delete(store, spark):
    pipelines = spark.createDataFrame(
        [(1, "demult", None, None, None, "AIRFLOW", "Y", None)],
        "pipeline_id long, pipeline_name string, pipeline_db string, "
        "pipeline_init_conf string, pipeline_run_conf string, "
        "pipeline_type string, is_active string, date_stamp timestamp",
    )
    store.store_records("pipeline", pipelines)
    updates = spark.createDataFrame(
        [(1, "N"), (2, "Y")], "pipeline_id long, is_active string"
    )
    store.upsert("pipeline", updates, on=["pipeline_id"], update_columns=["is_active"])
    rows = {r.pipeline_id: r for r in store.table("pipeline").collect()}
    assert rows[1].is_active == "N"
    assert rows[2].is_active == "Y" and rows[2].pipeline_name is None

    store.delete_where(
        "pipeline",
        spark.createDataFrame([(2,)], "pipeline_id long"),
        on=["pipeline_id"],
    )
    assert store.table("pipeline").count() == 1


def test_store_rerun_read_after_swap(store, spark):
    files = spark.createDataFrame(
        [(1, "/data/f1.fastq.gz", "HPC_PROJECT", "ACTIVE", "md5x", "100", None, None)],
        "file_id long, file_path string, location string, status string, "
        "md5 string, size string, date_created timestamp, date_updated timestamp",
    )
    store.store_records("file", files)
    more = files.withColumn("file_id", F.lit(2).cast("long")).withColumn(
        "file_path", F.lit("/data/f2.fastq.gz")
    )
    store.store_records("file", more)
    assert store.table("file").count() == 2
