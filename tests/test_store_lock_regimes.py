"""Writer-lock capability regimes (round-11, verdict item 2).

``put_if_absent`` is a TRUE conditional PUT on some backends (local
O_EXCL link; S3 If-None-Match with HADOOP-19256 conditional create;
GCS generation-0; Azure If-None-Match) and only CHECK-THEN-CREATE on
others (s3a without the flag).  fsio backends now advertise which
(``conditional_put_atomic``), HadoopObjectFsIO probes the connector
(PathCapabilities, then the s3a enable flag), and TableStore:

- records the active regime in every journal spec (durable store
  metadata) and warns at construction under the weak regime;
- bounds the weak regime's residual race: read-back verification
  right after acquisition, ownership RE-verification before every
  journal write (a usurped writer aborts within one op), heartbeat
  that never clobbers a usurper's journal, and rollback that never
  unlinks one.

The race window that remains: two writers completing check->PUT->
read-back inside one round-trip window can both proceed until one's
next journal write — at most one journaled op of exposure, after
which the loser aborts with ConcurrentWriterError.  That bound is
what these tests pin, with a deterministic race hook.
"""

from __future__ import annotations

import json

import pytest

import data_management_python_spark.store as store_module
from data_management_python_spark.fsio import (
    CheckThenCreateFsIO,
    LocalFsIO,
    ObjectStoreFsIO,
)
from data_management_python_spark.store import ConcurrentWriterError, TableStore
from tests.test_store_ptr_shards import _samples


class WeakObjectModeStore(TableStore):
    """Object-mode store over the CHECK-THEN-CREATE simulation — the
    weaker of the two real connector regimes."""

    def __init__(self, spark, root, **kw):
        kw.setdefault("object_store", True)
        super().__init__(spark, root, **kw)


@pytest.fixture()
def weak_cls(monkeypatch):
    monkeypatch.setattr(store_module, "ObjectStoreFsIO", CheckThenCreateFsIO)
    return WeakObjectModeStore


def test_backends_advertise_conditional_put_capability():
    assert LocalFsIO.conditional_put_atomic is True
    assert ObjectStoreFsIO.conditional_put_atomic is True
    assert CheckThenCreateFsIO.conditional_put_atomic is False


def test_weak_regime_warns_and_is_recorded(spark, tmp_path, weak_cls):
    with pytest.warns(UserWarning, match="check-then-create"):
        s = weak_cls(spark, str(tmp_path / "cat"))
    assert s.lock_regime == "check-then-create+lease"
    # the regime lands in the DURABLE journal spec of every txn
    s._acquire_lock(explicit=True)
    pend = json.loads(s.fs.read_text(s._txn_path("pending")))
    assert pend["lock_regime"] == "check-then-create+lease"
    s._commit()
    s._txn = None


def test_strong_regimes_recorded(spark, tmp_path):
    from tests.test_store_objectstore import ObjectModeStore

    ren = TableStore(spark, str(tmp_path / "ren"))
    assert ren.lock_regime == "exclusive-create"
    obj = ObjectModeStore(spark, str(tmp_path / "obj"))
    assert obj.lock_regime == "conditional-put"
    obj._acquire_lock(explicit=True)
    pend = json.loads(obj.fs.read_text(obj._txn_path("pending")))
    assert pend["lock_regime"] == "conditional-put"
    obj._commit()
    obj._txn = None


def test_weak_regime_single_writer_unaffected(spark, tmp_path, weak_cls):
    """The re-verification machinery must be invisible to an
    uncontended writer: verbs, explicit txns, and recovery all work."""
    with pytest.warns(UserWarning):
        s = weak_cls(spark, str(tmp_path / "cat"))
    s.enable_partitioning("sample", ["sample_id"], 4)
    s.store_records("sample", _samples(spark, range(1, 9)))
    s.upsert(
        "sample", _samples(spark, [3], status="FAILED"), on=["sample_id"]
    )
    with s.transaction():
        s.store_records("sample", _samples(spark, [100]))
        s.set_stream_marker("w", 1)
    rows = {r.sample_id: r.status for r in s.table("sample").collect()}
    assert rows[3] == "FAILED" and 100 in rows and len(rows) == 9
    assert s.get_stream_marker("w") == 1


def test_weak_regime_usurped_writer_aborts_within_one_op(
    spark, tmp_path, weak_cls
):
    """The documented residual-race bound, forced deterministically:
    writer B's check passes while the lock is absent, writer A then
    acquires and starts working, B's PUT clobbers A's journal.  A
    must abort at its NEXT journal write (ConcurrentWriterError), A's
    rollback must NOT destroy B's journal, and B must be able to
    finish its work normally."""
    root = str(tmp_path / "cat")
    with pytest.warns(UserWarning):
        a = weak_cls(spark, root)
    with pytest.warns(UserWarning):
        b = weak_cls(spark, root)
    a.store_records("project", _proj(spark, [1]))  # root exists, no lock

    def hook():
        b.fs.race_hook = None  # fire once
        a._acquire_lock(explicit=True)  # A lands INSIDE B's window

    b.fs.race_hook = hook
    b._acquire_lock(explicit=True)  # B clobbers A's journal, wins
    # A is usurped: its next journal write detects the foreign token
    with pytest.raises(ConcurrentWriterError, match="usurped"):
        a._journal_op(
            "project", {"kind": "filewrite", "rel": "x.json", "had": None}
        )
    # A's abort path must leave B's journal intact
    a._stop_lease_heartbeat()
    a._drop_own_pending()
    a._txn = None
    pend = json.loads(b.fs.read_text(b._txn_path("pending")))
    assert pend["token"] == b._txn.token
    # B finishes normally
    b.store_records("project", _proj(spark, [2]))
    b._commit()
    b._txn = None
    assert sorted(
        r.project_id for r in b.table("project").collect()
    ) == [1, 2]


def test_weak_regime_readback_rejects_lost_put(spark, tmp_path, weak_cls):
    """The acquisition read-back: when OUR PUT is immediately
    clobbered by another writer's (the reverse interleaving), the
    read-back sees the foreign token and acquisition retries/times
    out instead of proceeding unlocked."""
    root = str(tmp_path / "cat")
    with pytest.warns(UserWarning):
        a = weak_cls(spark, root)
    a.lock_timeout = 0.2

    orig_put = a.fs.put_text
    foreign = {"done": False}

    def clobbering_put(p, text):
        orig_put(p, text)
        if p.endswith("pending.json") and not foreign["done"]:
            foreign["done"] = True
            doc = json.loads(text)
            doc["token"] = "f" * 32  # another writer's PUT lands last
            doc["host"] = "race-elsewhere"  # foreign host: lease-based
            orig_put(p, json.dumps(doc))

    a.fs.put_text = clobbering_put
    with pytest.raises(ConcurrentWriterError):
        a._acquire_lock(explicit=True)
    a.fs.put_text = orig_put
    assert a._txn is None


def _proj(spark, ids):
    return spark.createDataFrame(
        [(i, f"IGFQ{i:04d}", None, None, None, "ACTIVE", "FASTQ")
         for i in ids],
        "project_id long, project_igf_id string, project_name string, "
        "start_timestamp timestamp, description string, status string, "
        "deliverable string",
    )


def test_weak_regime_journals_objptr_post_image(spark, tmp_path, weak_cls):
    """Under check-then-create the commit journals the objptr op's
    POST-image root text before the PUT (so rollback can distinguish
    'still ours' from 'usurper moved on'); the strong regimes skip the
    extra journal write entirely."""
    with pytest.warns(UserWarning):
        s = weak_cls(spark, str(tmp_path / "weak"))
    s._acquire_lock(explicit=True)
    try:
        s.store_records("project", _proj(spark, [1]))
        ops = [o for o in s._txn.ops if o["kind"] == "objptr"]
        assert ops and ops[-1]["new"] == s.fs.read_text(
            s._ptr_path("project")
        )
        # and it is DURABLE, not just in-memory
        pend = json.loads(s.fs.read_text(s._txn_path("pending")))
        jops = [o for o in pend["ops"] if o["kind"] == "objptr"]
        assert jops[-1]["new"] == ops[-1]["new"]
    finally:
        s._commit()
        s._txn = None


def test_strong_regime_skips_objptr_post_image(spark, tmp_path):
    """conditional-put regime: no post-image journaling (no extra
    journal write per commit on the strong path)."""
    from tests.test_store_objectstore import ObjectModeStore

    strong = ObjectModeStore(spark, str(tmp_path / "strong"))
    assert strong.lock_regime == "conditional-put"
    strong._acquire_lock(explicit=True)
    try:
        strong.store_records("project", _proj(spark, [1]))
        ops = [o for o in strong._txn.ops if o["kind"] == "objptr"]
        assert ops and "new" not in ops[-1]
    finally:
        strong._commit()
        strong._txn = None


def test_weak_regime_usurper_commit_survives_loser_rollback(
    spark, tmp_path, weak_cls
):
    """ROUND-12 ADVICE (low): a usurped writer's rollback used to
    restore op['old'] root pointers unconditionally, clobbering any
    NEWER commit the usurper had landed on the same table.  Now the
    weak-regime undo re-reads the current root and SKIPS the restore
    (leaving state for recovery) when it matches neither our pre- nor
    our journaled post-image."""
    with pytest.warns(UserWarning):
        a = weak_cls(spark, str(tmp_path / "cat"))
    a.store_records("project", _proj(spark, [1]))
    pre_txn_root = a.fs.read_text(a._ptr_path("project"))
    a._acquire_lock(explicit=True)
    a.store_records("project", _proj(spark, [2]))  # objptr op, eager PUT
    # a usurper steals the lock and commits a NEWER root for the table
    usurper_doc = json.loads(a.fs.read_text(a._ptr_path("project")))
    usurper_doc["commits"] = usurper_doc.get("commits", 0) + 7
    usurper_root = json.dumps(usurper_doc)
    a.fs.write_text_atomic(a._ptr_path("project"), usurper_root)
    # loser A aborts; its undo must NOT restore its own pre-image
    a._rollback()
    a._txn = None
    assert a.fs.read_text(a._ptr_path("project")) == usurper_root
    assert a.fs.read_text(a._ptr_path("project")) != pre_txn_root
    # control: same flow WITHOUT a usurper restores the pre-image
    with pytest.warns(UserWarning):
        b = weak_cls(spark, str(tmp_path / "cat2"))
    b.store_records("project", _proj(spark, [1]))
    pre = b.fs.read_text(b._ptr_path("project"))
    b._acquire_lock(explicit=True)
    b.store_records("project", _proj(spark, [2]))
    assert b.fs.read_text(b._ptr_path("project")) != pre
    b._rollback()
    b._txn = None
    assert b.fs.read_text(b._ptr_path("project")) == pre
    assert [r.project_id for r in b.table("project").collect()] == [1]
