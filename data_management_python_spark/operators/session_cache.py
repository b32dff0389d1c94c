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
across).  Nothing is ever written outside the session: the round-9
cross-run snapshot path (``persist=True`` + a corpus-fingerprint-keyed
on-disk store) was removed in rounds 12–13 because intermediates keyed
on the input dir violate the compute-from-parquet contract.  At 100 TB
the same seam is where a real deployment materializes the intermediate
as a bucketed table instead.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_CACHE_LOCK = threading.Lock()  # guards _CACHE / _KEY_LOCKS / _STATS maps
_KEY_LOCKS: dict[tuple[str, str, str], threading.Lock] = {}
# keys whose build() is running on THIS thread — re-entrant/nested
# session_cached calls from inside a build must not take a second key
# lock (same key: self-deadlock; another build's key: lock-order
# inversion between two threads whose builds nest on each other's keys)
_BUILDING = threading.local()

# Observability for the bench (round-13): per-family one-time build
# seconds and a monotonically increasing hit counter, so bench.py can
# report which steady timings are cache reads and what each family's
# build actually cost.  Reporting only — never consulted by the cache.
_BUILD_SEC: dict[str, float] = {}
_HITS: int = 0


def stats() -> tuple[int, dict[str, float]]:
    """(total cache hits so far, {family name: build seconds}).

    The dict is a snapshot copy; keyed by family name only (the bench
    runs one session against one sf_dir, so name is unique there)."""
    with _CACHE_LOCK:
        return _HITS, dict(_BUILD_SEC)


def _record_hit() -> None:
    global _HITS  # noqa: PLW0603 — counter, guarded by _CACHE_LOCK
    with _CACHE_LOCK:
        _HITS += 1


def _timed_build(
    name: str, build: Callable[[], DataFrame], storage_level
) -> DataFrame:
    t0 = time.time()
    df = build().localCheckpoint(eager=True, storageLevel=storage_level)
    dt = time.time() - t0
    with _CACHE_LOCK:
        # keep the FIRST (per-session cold) build cost; a losing racer's
        # duplicate build must not overwrite the representative number
        _BUILD_SEC.setdefault(name, round(dt, 4))
    return df


def session_cached(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    storage_level=None,
) -> DataFrame:
    """Return the frame built by ``build()``, eagerly localCheckpointed
    once per (session, name, sf_dir) and shared by later calls.

    Concurrency-safe once-per-key: the miss path holds a PER-KEY lock
    (bench's 8-stream throughput phase can race two family members
    into the same build; without the lock one eager localCheckpoint
    per racer is orphaned).  Distinct keys build concurrently — the
    global lock only guards the map lookups, never a build.

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
            pass  # count outside the lock-held fast path below
        else:
            # prune CACHE entries left behind by stopped sessions — but
            # never the lock objects: a second live SparkSession in the
            # same process would otherwise pop a lock a concurrent
            # builder still holds, hand out a fresh one for the same
            # key, and double-build.  Locks are ~100 bytes; the frames
            # are what must not leak.
            for k in [k for k in _CACHE if k[0] != app_id]:
                del _CACHE[k]
            key_lock = _KEY_LOCKS.setdefault(key, threading.Lock())
    if hit is not None:
        _record_hit()
        return hit
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
            _record_hit()
            return hit
        # push this key too: without it a depth-2 chain
        # (A -> B -> B) would miss the `key in held` check above and
        # recurse unboundedly — the guard must see every build on the
        # stack, not only the outermost one
        held.append(key)
        try:
            df = _timed_build(name, build, storage_level)
        finally:
            held.pop()
        with _CACHE_LOCK:
            return _CACHE.setdefault(key, df)
    with key_lock:
        with _CACHE_LOCK:
            hit = _CACHE.get(key)  # a concurrent builder may have won
        if hit is not None:
            _record_hit()
            return hit
        held.append(key)
        try:
            df = _timed_build(name, build, storage_level)
        finally:
            held.pop()
        with _CACHE_LOCK:
            return _CACHE.setdefault(key, df)
