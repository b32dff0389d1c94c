"""Per-session materialization cache for expensive intermediate frames
shared by a QUERY FAMILY (graph edge sets, verified near-dup pairs,
duplicate-cluster assignments).

Several registered queries are views over the same expensive
intermediate: the co-purchase edge set feeds both triangle counting
and link prediction, the verified near-dup pair set feeds the pair
report, the cluster assignment, and the survivor pick.  Re-deriving
the intermediate per query made the shared build — not each query's
own analytics — the dominant steady cost of the family.

``session_cached`` materializes the build ONCE per (application id,
name, sf_dir) as an eager localCheckpoint and hands every family
member the same tiny materialized frame.  Keying on the application id
means entries from a stopped session are unreachable garbage, pruned
on the next call — nothing leaks into a NEW session (the round-2
persist leak was a cached frame surviving inside one long-lived
session; this cache deliberately shares within a session and drops
across).  At 100 TB the same seam is where a real deployment
materializes the intermediate as a bucketed table instead.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_CACHE_LOCK = threading.Lock()  # guards _CACHE and _KEY_LOCKS maps
_KEY_LOCKS: dict[tuple[str, str, str], threading.Lock] = {}
# keys whose build() is running on THIS thread — re-entrant/nested
# session_cached calls from inside a build must not take a second key
# lock (same key: self-deadlock; another build's key: lock-order
# inversion between two threads whose builds nest on each other's keys)
_BUILDING = threading.local()


_PERSIST_ROOT_ENV = "SPARK_GRAFT_FAMILY_CACHE"


def _persist_root() -> str:
    """Default persist root is PER-USER, not the shared world-writable
    tempdir: on a multi-user host a shared path lets another user
    pre-create the directory (permission failures) or pre-populate
    poisoned snapshots that loads would trust.  XDG cache dir when
    resolvable, else tempdir suffixed with the uid; created 0700."""
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    explicit = os.environ.get(_PERSIST_ROOT_ENV)
    if explicit:
        return explicit
    home = os.path.expanduser("~")
    if home and home != "~":
        root = os.path.join(home, ".cache", "spark_graft_family_cache")
    else:
        root = os.path.join(
            tempfile.gettempdir(),
            f"spark_graft_family_cache-{os.getuid()}",
        )
    try:
        os.makedirs(root, mode=0o700, exist_ok=True)
    except OSError:
        pass  # creation failure surfaces (best-effort) at first use
    return root


def _corpus_fingerprint(sf_dir: str) -> str:
    """Content key for a test-data dir: path + every file's
    (relpath, size, mtime_ns), hashed — RECURSIVELY, because parquet
    tables are directories: an in-place rewrite of a nested part file
    changes neither the top-level entry set nor the subdir's own stat,
    and a top-level-only fingerprint would serve a stale snapshot.  A
    regenerated corpus changes the key, so a stale snapshot can never
    be served — it is simply never found."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415

    parts = [sf_dir]
    try:
        entries = []
        for dirpath, dirnames, filenames in os.walk(sf_dir):
            dirnames.sort()
            rel_dir = os.path.relpath(dirpath, sf_dir)
            for fn in sorted(filenames):
                st = os.stat(os.path.join(dirpath, fn))
                rel = fn if rel_dir == "." else os.path.join(rel_dir, fn)
                entries.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
        parts.extend(entries)
        if not entries:
            parts.append("<empty>")
    except OSError:
        parts.append("<unlistable>")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:20]


def _persist_store(spark: SparkSession, sf_dir: str):
    import os  # noqa: PLC0415

    from data_management_python_spark.store import (  # noqa: PLC0415
        TableStore,
    )

    root = os.path.join(_persist_root(), _corpus_fingerprint(sf_dir))
    return TableStore(spark, root)


def _table_slug(name: str) -> str:
    import re  # noqa: PLC0415

    return "fam_" + re.sub(r"[^A-Za-z0-9_]", "_", name)


def _persist_load(spark: SparkSession, name: str, sf_dir: str):
    """The snapshot frame (eagerly checkpointed, matching the build
    path's contract) or None."""
    try:
        store = _persist_store(spark, sf_dir)
        slug = _table_slug(name)
        if not store.has_data(slug):
            return None
        return store.table(slug).localCheckpoint(eager=True)
    except Exception:  # noqa: BLE001 — cache read is best-effort
        return None


def _persist_save(
    spark: SparkSession, name: str, sf_dir: str, df: DataFrame
) -> None:
    try:
        store = _persist_store(spark, sf_dir)
        slug = _table_slug(name)
        # probe + append must be ATOMIC under the store's cross-process
        # writer lock: store_records is a TRUE append, so two sessions
        # both passing a bare has_data==False would each append and
        # permanently DOUBLE the snapshot every later session loads.
        # The re-check runs inside the transaction, after the lock.
        with store.transaction():
            if store.has_data(slug):
                return  # another session won the race
            store.declare_table(slug, df.schema)
            store.store_records(slug, df, validate=False)
    except Exception:  # noqa: BLE001 — cache write is best-effort
        pass


def session_cached(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    persist: bool = False,
    storage_level=None,
) -> DataFrame:
    """Return the frame built by ``build()``, eagerly localCheckpointed
    once per (session, name, sf_dir) and shared by later calls.

    Concurrency-safe once-per-key: the miss path holds a PER-KEY lock
    (bench's 8-stream throughput phase can race two family members
    into the same build; without the lock one eager localCheckpoint
    per racer is orphaned).  Distinct keys build concurrently — the
    global lock only guards the map lookups, never a build.

    ``persist=True`` (round-9) additionally snapshots the built frame
    into a TableStore under a CONTENT-KEYED cache root (the input
    dir's file sizes+mtimes fingerprint the corpus), so a FRESH
    session whose inputs are unchanged reads the prior session's
    build back in milliseconds instead of re-deriving it — the
    "cold first family member pays the whole trajectory" cost
    becomes once per corpus, not once per session.  Best-effort by
    design: any cache I/O failure falls back to building (the store's
    writer lock serializes concurrent sessions; a changed corpus gets
    a new root, so staleness is structurally impossible).  Opt-in per
    family because the snapshot must be a pure function of
    (name, sf_dir) — builds that capture other state must not persist.

    Re-entrancy-safe: a ``build`` that itself calls ``session_cached``
    (for its own key or another family's) is detected via a
    thread-local build stack and falls through to an UNLOCKED build —
    no self-deadlock, no lock-order inversion.  The cost is that a
    concurrent thread may duplicate the nested build; the loser's
    checkpoint is orphaned session-local garbage and the cache keeps
    exactly one winner (``setdefault``).
    """
    app_id = spark.sparkContext.applicationId
    key = (app_id, name, sf_dir)
    with _CACHE_LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            return hit
        # prune CACHE entries left behind by stopped sessions — but
        # never the lock objects: a second live SparkSession in the
        # same process would otherwise pop a lock a concurrent builder
        # still holds, hand out a fresh one for the same key, and
        # double-build.  Locks are ~100 bytes; the frames are what
        # must not leak.
        for k in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[k]
        key_lock = _KEY_LOCKS.setdefault(key, threading.Lock())
    held: list = getattr(_BUILDING, "held", None) or []
    _BUILDING.held = held
    if held:
        if key in held:
            # SAME-key re-entry: build(key) calling session_cached(key)
            # is an infinite-recursion bug in the build, not a family
            # nesting.  The old unlocked fallback "worked" but cached
            # the INNER result and silently discarded what the outer
            # build() returned (setdefault keeps the first writer) —
            # the outer caller got a frame its own build never
            # produced.  Fail loudly instead.
            raise RuntimeError(
                f"session_cached re-entered for its own key {key[1]!r}: "
                "the build function for this entry called "
                "session_cached with the same (name, sf_dir) — derive "
                "the frame directly instead of recursing"
            )
        # nested call from inside ANOTHER build on this thread.  A
        # warm nested key must still HIT (the lock-free build below is
        # a fallback, not a bypass): without this check every outer
        # build miss would rebuild and eagerly checkpoint an
        # already-cached family, orphaning the loser's blocks
        with _CACHE_LOCK:
            hit = _CACHE.get(key)
        if hit is not None:
            return hit
        # push this key too: without it a depth-2 chain
        # (A -> B -> B) would miss the `key in held` check above and
        # recurse unboundedly — the guard must see every build on the
        # stack, not only the outermost one
        held.append(key)
        try:
            df = _persist_load(spark, name, sf_dir) if persist else None
            if df is None:
                df = build().localCheckpoint(
                    eager=True, storageLevel=storage_level
                )
                if persist:
                    _persist_save(spark, name, sf_dir, df)
        finally:
            held.pop()
        with _CACHE_LOCK:
            return _CACHE.setdefault(key, df)
    with key_lock:
        with _CACHE_LOCK:
            hit = _CACHE.get(key)  # a concurrent builder may have won
        if hit is not None:
            return hit
        held.append(key)
        try:
            df = _persist_load(spark, name, sf_dir) if persist else None
            if df is None:
                df = build().localCheckpoint(
                    eager=True, storageLevel=storage_level
                )
                if persist:
                    _persist_save(spark, name, sf_dir, df)
        finally:
            held.pop()
        with _CACHE_LOCK:
            return _CACHE.setdefault(key, df)
