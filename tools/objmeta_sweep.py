"""Object-mode METADATA sweeps (round-11, verdict items 1 and 4).

Two measurements, both recorded in SCALE.md:

1. ``--shards``: commit metadata I/O vs live-file count, monolithic
   (format-1) root vs sharded (format-2) root.  The table's data
   files are zero-byte stand-ins (only their POINTER entries matter —
   this sweep measures exactly the metadata plane), laid out as
   ``kb=<b>/part-*.parquet`` across 256 buckets; the measured op is a
   single-bucket pointer flip (the 1-row-upsert shape).  Bytes
   written/read are counted by wrapping the store's FsIO — the same
   calls a real object store would see as PUT/GET payloads.

2. ``--sprawl``: read-plan construction cost vs segment count.  A
   long append stream leaves one segment per commit and _obj_frame
   pays one reader per segment; the sweep measures a full-table
   count at N segments, then folds (_obj_maybe_fold_segments) and
   re-measures — the auto-compaction trigger's payoff, quantified.

Usage: python tools/objmeta_sweep.py --shards|--sprawl
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


class MeterFs:
    """Wrap a store's FsIO: count metadata bytes written and read
    under ``_ptr/`` (root + shard objects) — the object-store
    PUT/GET payload of a commit."""

    def __init__(self, fs):
        self._fs = fs
        self.written = 0
        self.read = 0

    def __getattr__(self, name):
        return getattr(self._fs, name)

    def write_text_atomic(self, p, text, tmp=None):
        if "/_ptr/" in p or p.endswith(".json") and "_ptr" in p:
            self.written += len(text)
        return self._fs.write_text_atomic(p, text, tmp=tmp)

    def put_text(self, p, text):
        if "/_ptr/" in p:
            self.written += len(text)
        return self._fs.put_text(p, text)

    def read_text(self, p):
        out = self._fs.read_text(p)
        if "/_ptr/" in p:
            self.read += len(out)
        return out


def _fake_table(store, name, n_buckets, files_per_bucket):
    """Lay a segment of zero-byte 'parquet' files under the table and
    commit its pointer — the metadata shape of a real bucketed table
    without the Spark write cost (this sweep measures metadata only).
    Returns the number of live entries."""
    seg_rel = os.path.join(name, "seg-sweep-0")
    for b in range(n_buckets):
        d = os.path.join(store.root, seg_rel, f"kb={b}")
        os.makedirs(d, exist_ok=True)
        for f in range(files_per_bucket):
            open(os.path.join(d, f"part-{f:05d}.parquet"), "w").close()
    store._acquire_lock(explicit=False)
    try:
        op = store._obj_journal_ptr(name, None, seg_rel, [])
        store._obj_commit_ptr(name, None, seg_rel, [], op=op)
    finally:
        store._txn.ops = []
        store._write_journal()
        store.fs.unlink(store._txn_path("pending"))
        store._txn = None
    return n_buckets * files_per_bucket


def _one_bucket_flip(store, name, bucket):
    """The 1-row-upsert metadata shape: retire bucket ``bucket``'s
    entries, add one new file for it in a fresh segment."""
    old = store._read_ptr_text(name)
    doc = store._ptr_doc_of_text(old)
    retired = [
        (e[0], e[1])
        for e in store._obj_entries_for_buckets(name, doc, [bucket])
    ]
    seg_rel = store._obj_new_seg(name)
    d = os.path.join(store.root, seg_rel, f"kb={bucket}")
    os.makedirs(d)
    open(os.path.join(d, "part-00000.parquet"), "w").close()
    op = store._obj_journal_ptr(name, old, seg_rel, retired)
    store._obj_commit_ptr(name, old, seg_rel, retired, op=op)


def main_shards() -> None:
    from pyspark.sql import SparkSession

    from data_management_python_spark.store import TableStore

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"{'live files':>11s} {'mode':>9s} {'commit PUT B':>13s} "
        f"{'commit GET B':>13s} {'full ptr B':>11s}"
    )
    for files_per_bucket in (4, 16, 64):
        n_buckets = 256
        for mode, threshold in (("mono", 10**9), ("sharded", 512)):
            root = tempfile.mkdtemp(prefix="ptrsweep_")
            store = TableStore(spark, root, object_store=True)
            store.ptr_shard_threshold = threshold
            store.ptr_n_shards = 64
            n = _fake_table(store, "t", n_buckets, files_per_bucket)
            full = sum(
                len(open(os.path.join(root, "_ptr", f)).read())
                for f in os.listdir(os.path.join(root, "_ptr"))
                if f.endswith(".json")
            )
            full += sum(
                len(open(os.path.join(dp, f)).read())
                for dp, _d, fs in os.walk(
                    os.path.join(root, "_ptr", "t.shards")
                )
                for f in fs
            ) if os.path.isdir(
                os.path.join(root, "_ptr", "t.shards")
            ) else 0
            meter = MeterFs(store.fs)
            store.fs = meter
            store._acquire_lock(explicit=False)
            try:
                _one_bucket_flip(store, "t", 7)
            finally:
                store._txn.ops = []
                store._write_journal()
                store.fs.unlink(store._txn_path("pending"))
                store._txn = None
            print(
                f"{n:11d} {mode:>9s} {meter.written:13d} "
                f"{meter.read:13d} {full:11d}"
            )
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def main_sprawl() -> None:
    from data_management_python_spark.session import get_spark
    from data_management_python_spark.store import TableStore

    spark = get_spark(app_name="sprawl_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sprawl_")
    store = TableStore(spark, root, object_store=True)
    store.auto_compact_commits = 0  # sprawl freely first
    store.declare_table("t", "k long, v long")
    df = spark.range(200).selectExpr(
        "id as k", "cast(id * 2 as long) as v"
    )
    batches = [
        df.filter(f"k % 64 = {i % 64}").withColumn(
            "k", df.k + i * 1000
        )
        for i in range(64)
    ]
    for i, b in enumerate(batches):
        store.store_records("t", b)
    n_segs = len({e[0] for e in store._obj_current_files("t")})

    def read_time():
        ts = []
        for _ in range(3):
            t0 = time.time()
            store.table("t").count()
            ts.append(time.time() - t0)
        return min(ts)

    t_sprawl = read_time()
    rows_before = store.table("t").count()
    # fold: flip the trigger and let the policy run once
    store.auto_compact_commits = 1
    store._acquire_lock(explicit=False)
    try:
        store._obj_maybe_fold_segments("t")
    finally:
        store._txn.ops = []
        store._write_journal()
        store.fs.unlink(store._txn_path("pending"))
        store._txn = None
    n_segs_after = len({e[0] for e in store._obj_current_files("t")})
    t_folded = read_time()
    rows_after = store.table("t").count()
    assert rows_before == rows_after, (rows_before, rows_after)
    print(
        json.dumps(
            {
                "segments_before": n_segs,
                "read_sec_before": round(t_sprawl, 3),
                "segments_after": n_segs_after,
                "read_sec_after": round(t_folded, 3),
                "rows": rows_after,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if "--shards" in sys.argv:
        main_shards()
    elif "--sprawl" in sys.argv:
        main_sprawl()
    else:
        main_shards()
        main_sprawl()
