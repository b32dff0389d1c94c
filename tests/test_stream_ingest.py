"""Exactly-once streaming ingestion into TableStore (round-8).

Reference anchor: incremental seqrun registration — discover new runs,
register each exactly once, survive restarts.  Here the guarantee is
foreachBatch at-least-once delivery composed with the store's
transactional append+marker commit: kill-and-restart must produce no
duplicates and no loss, and the store must stay bucket-clustered."""

from __future__ import annotations

import os

import pytest

from data_management_python_spark.store import TableStore
from data_management_python_spark.streaming.ingest import (
    ingest_batch,
    stream_into_store,
)

PROJECT_SCHEMA = (
    "project_id long, project_igf_id string, project_name string, "
    "start_timestamp timestamp, description string, status string, "
    "deliverable string"
)


def _rows(spark, ids):
    return spark.createDataFrame(
        [(i, f"IGFQ{i:04d}", None, None, None, "ACTIVE", "FASTQ")
         for i in ids],
        PROJECT_SCHEMA,
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "input": str(tmp_path / "in"),
        "ckpt": str(tmp_path / "ckpt"),
        "root": str(tmp_path / "cat"),
    }
    os.makedirs(d["input"])
    return d


def _drain(spark, store, dirs, fail_marker=False):
    stream = spark.readStream.schema(PROJECT_SCHEMA).parquet(dirs["input"])
    if fail_marker:
        real = store.set_stream_marker

        def boom(stream_id, batch_id):
            raise RuntimeError("injected crash between append and marker")

        store.set_stream_marker = boom
        try:
            q = stream_into_store(
                stream, store, "project", "proj-ingest", dirs["ckpt"],
                trigger_once=True,
            )
            with pytest.raises(Exception, match="injected crash"):
                q.awaitTermination()
        finally:
            store.set_stream_marker = real
        return
    q = stream_into_store(
        stream, store, "project", "proj-ingest", dirs["ckpt"],
        trigger_once=True,
    )
    q.awaitTermination()


def test_stream_ingest_restart_no_dup_no_loss(spark, dirs):
    """Two drain cycles over a growing file source with one shared
    checkpoint: every input row lands exactly once and the bucketed
    layout survives."""
    store = TableStore(spark, dirs["root"])
    store.enable_partitioning("project", ["project_id"], 8)
    _rows(spark, range(1, 11)).coalesce(1).write.mode("append").parquet(
        dirs["input"]
    )
    _drain(spark, store, dirs)
    assert store.table("project").count() == 10
    assert store.get_stream_marker("proj-ingest") >= 0

    _rows(spark, range(11, 21)).coalesce(1).write.mode("append").parquet(
        dirs["input"]
    )
    _drain(spark, store, dirs)
    got = sorted(r.project_id for r in store.table("project").collect())
    assert got == list(range(1, 21))
    # bucket-clustered: appends landed under kb= dirs, layout intact
    assert store.partitioning_of("project") == (["project_id"], 8)
    assert any(
        d.startswith("kb=")
        for d in os.listdir(os.path.join(dirs["root"], "project"))
    )


def test_stream_ingest_crash_between_append_and_marker(spark, dirs):
    """Injected failure AFTER the batch's append, BEFORE the marker
    commit: the transaction rolls the append back, the restart
    re-delivers the batch, and the final table has the rows exactly
    once."""
    store = TableStore(spark, dirs["root"])
    store.enable_partitioning("project", ["project_id"], 8)
    _rows(spark, range(1, 11)).coalesce(1).write.mode("append").parquet(
        dirs["input"]
    )
    _drain(spark, store, dirs, fail_marker=True)
    # nothing committed: append and marker rolled back together
    assert store.table("project").count() == 0
    assert store.get_stream_marker("proj-ingest") == -1
    # restart with the SAME checkpoint: batch re-delivered, applied once
    _drain(spark, store, dirs)
    got = sorted(r.project_id for r in store.table("project").collect())
    assert got == list(range(1, 11))


def test_ingest_batch_redelivery_skipped(spark, dirs):
    """A batch id at or below the committed marker is a no-op — the
    crash-after-commit-before-checkpoint window (Spark re-runs the
    same batch_id) cannot duplicate rows."""
    store = TableStore(spark, dirs["root"])
    b = _rows(spark, range(1, 6))
    assert ingest_batch(store, "project", b, 0, "s1") is True
    assert ingest_batch(store, "project", b, 0, "s1") is False  # replay
    assert ingest_batch(store, "project", b, 0, "s1") is False
    nxt = _rows(spark, range(6, 9))
    assert ingest_batch(store, "project", nxt, 1, "s1") is True
    assert store.table("project").count() == 8
    # distinct streams track independently
    assert store.get_stream_marker("s2") == -1
    with pytest.raises(ValueError, match="stream_id"):
        store.get_stream_marker("../evil")
