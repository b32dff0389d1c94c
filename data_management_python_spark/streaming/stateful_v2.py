"""Spark 4 ``transformWithStateInPandas`` operators (the successor to
``applyInPandasWithState``: typed state handles, timers, RocksDB-backed
state store).

The reference has no streaming at all (SURVEY §2.9); windows.py carries
the classic applyInPandasWithState patterns.  This module shows the
same per-key stateful semantics on the NEW API so both stateful
surfaces of Spark 4 are covered — new pipelines should start here, the
old API stays for parity.

Requires the ``protobuf`` Python package (the state-server protocol;
gated with importorskip in tests — absent in minimal containers) and
the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``);
the HDFS-backed default does not support transformWithState.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_TOTALS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (event count, value sum) via a ValueState —
    the transformWithState analog of windows.running_user_counter.
    State is O(1) per key on the RocksDB store; each micro-batch emits
    the updated totals for keys that saw input."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _TOTALS_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            prev = self._totals.get()
            n, s = int(prev[0]), float(prev[1])
        else:
            n, s = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals on the transformWithState API.

    ``events`` needs (user_id, value) columns.  Update-mode output:
    one row per (key, batch) with the cumulative totals.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


SESSION_OUTPUT_V2 = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_V2 = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


class SessionGapProcessor(StatefulProcessor):
    """Gap-based sessionization on the transformWithState API with
    EVENT-TIME TIMERS — the typed-state successor of
    windows.stream_session_gap (same contract: a session closes and
    emits exactly one row when the watermark passes its last event +
    gap; ``session_end_ms`` is the LAST EVENT's timestamp, matching
    stream_session_gap's output, not native session_window's
    last+gap).  Merge rule is the engine-wide INCLUSIVE one: an event
    exactly ``gap`` after the previous one extends the session; only
    diff > gap splits (see the round-6 session-window boundary fix).

    EXACT under out-of-order arrival: state per key is the LIST of
    open sessions as (start_ms, last_ms, n) intervals (a ListState),
    not just the newest one, and a session closes ONLY when the
    watermark passes its last event + gap — never eagerly.  Incoming
    events interval-gap-cluster with every open session (the
    engine-wide INCLUSIVE rule), so a late in-watermark event can
    extend, bridge, or create any session, exactly matching what a
    full batch recompute over the same in-watermark events would
    produce.  One timer per open session (the set is rebuilt on every
    update); state size is O(open sessions inside the watermark
    horizon), which the watermark itself bounds.  Append mode —
    closed sessions are immutable.
    """

    def __init__(self, gap_seconds: int = 1800) -> None:
        self._gap_ms = int(gap_seconds) * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", _SESSION_STATE_V2)

    def _open_sessions(self) -> list[tuple[int, int, int]]:
        if not self._sessions.exists():
            return []
        return [
            (int(s), int(e), int(c)) for s, e, c in self._sessions.get()
        ]

    def _store(self, sessions: list[tuple[int, int, int]]) -> None:
        if sessions:
            self._sessions.put(sessions)
        else:
            self._sessions.clear()
        # timer set mirrors the open-session close times exactly
        want = {e + self._gap_ms for _, e, _ in sessions}
        have = set(self._handle.listTimers())
        for t in have - want:
            self._handle.deleteTimer(t)
        for t in want - have:
            self._handle.registerTimer(t)

    @staticmethod
    def _frame(key, closed: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            [(key[0], s, e, c) for s, e, c in sorted(closed)],
            columns=[
                "user_id", "session_start_ms", "session_end_ms", "n_events",
            ],
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # concatenate the key's Arrow chunks before sorting — event
        # order must hold across chunk boundaries, not within each
        ts_ms = sorted(
            int(v)
            for pdf in rows
            if len(pdf)
            for v in pdf["ts"].astype("int64") // 10**6
        )
        if not ts_ms:
            return
        intervals = sorted(
            self._open_sessions() + [(t, t, 1) for t in ts_ms]
        )
        merged: list[list[int]] = []
        for s0, e0, c0 in intervals:
            if merged and s0 - merged[-1][1] <= self._gap_ms:
                merged[-1][1] = max(merged[-1][1], e0)
                merged[-1][2] += c0
            else:
                merged.append([s0, e0, c0])
        # ALL clusters stay open here; closure belongs to the timers
        # exclusively.  An eager "close what the watermark already
        # passed" branch is both redundant (every kept session carries
        # its own live timer, which fires within this same micro-batch
        # once its close time trails the watermark; a cluster holding a
        # fresh event always closes AFTER the watermark, since admitted
        # events have ts >= wm) and hazardous: a hand-rolled
        # `close <= wm` comparison closes at exact equality, yet an
        # event at ts == wm == close still passes Spark's late filter
        # and must MERGE under the engine-wide inclusive rule — the
        # round-6 third-review boundary finding.
        self._store([tuple(c) for c in merged])
        return
        yield  # pragma: no cover - keeps this a generator

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        sessions = self._open_sessions()
        if not sessions:
            return
        exp = expiredTimerInfo.getExpiryTimeInMs()
        # close everything the CURRENT watermark has strictly passed,
        # not just this timer's session (round-7): when the watermark
        # jumps over K open sessions, K timers expire in one batch —
        # per-timer closure made the first callback close 1 session
        # and REWRITE the K-1 others, an O(K^2) ListState storm.
        # Watermark-wide closure drains them all in the first callback
        # (O(K)); the remaining K-1 callbacks see an empty/short list.
        # Strictness matters: a session with close == wm may still
        # legally absorb an admitted ts == wm event, so only
        # `close < wm` sessions close by watermark; the firing timer's
        # own session (close == exp < wm by Spark's fire rule) is
        # always covered, with `<= exp` kept as the fallback bound
        # when timerValues is absent (unit drives).
        wm = 0
        if timerValues is not None:
            try:
                wm = int(timerValues.getCurrentWatermarkInMs())
            except Exception:  # noqa: BLE001 - fallback to expiry bound
                wm = 0
        closed = [
            (s, e, c)
            for s, e, c in sessions
            if e + self._gap_ms <= exp or e + self._gap_ms < wm
        ]
        if not closed:
            return  # stale timer for a since-extended/merged session
        drop = set(closed)
        self._store([x for x in sessions if x not in drop])
        yield self._frame(key, closed)

    def close(self) -> None:
        pass


def session_gap_v2(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming gap sessionization on transformWithStateInPandas with
    event-time timers; see :class:`SessionGapProcessor`.  ``events``
    needs (user_id, ts) columns; late events older than the watermark
    are dropped by the upstream ``withWatermark``."""
    from data_management_python_spark.streaming.windows import (  # noqa: PLC0415
        ensure_event_time_ltz,
    )

    src = ensure_event_time_ltz(events, "ts").withWatermark(
        "ts", watermark_delay
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionGapProcessor(gap_seconds),
        outputStructType=SESSION_OUTPUT_V2,
        outputMode="Append",
        timeMode="EventTime",
    )


PROFILE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("n_types", LongType()),
        StructField("top_type", StringType()),
        StructField("recent_max", DoubleType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """Per-user event profile exercising the remaining typed-state
    primitives: a MapState (event_type -> running count) and a
    bounded ListState (the last K (ts_us, event_id, value) triples by
    (event time, event_id) — the union is RE-SORTED before truncation,
    so out-of-order micro-batches cannot evict newer events).  Emits
    one row per (key, batch): total events, distinct
    types, the modal event type (ties broken lexicographically —
    deterministic), and the max value among the K most recent events
    (max, not avg: order-insensitive exact arithmetic, so the batch
    twin's SQL oracle can hash-match without float-summation-order
    hazards).

    State per key is O(|event types| + K); the ListState is truncated
    to K on every update so it never grows with the stream.
    """

    K = 5

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n long"
        )
        self._recent = handle.getListState(
            "recent", "ts_us long, event_id long, value double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in rows if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for et, cnt in pdf["event_type"].value_counts().items():
            prev = self._counts.getValue((et,))
            n = (int(prev[0]) if prev is not None else 0) + int(cnt)
            self._counts.updateValue((et,), (n,))
        new = [
            (int(t), int(e), float(v))
            for t, e, v in zip(
                pdf["ts"].astype("int64") // 10**3,  # microseconds
                pdf["event_id"],
                pdf["value"],
            )
        ]
        old = (
            [(int(t), int(e), float(v)) for t, e, v in self._recent.get()]
            if self._recent.exists()
            else []
        )
        # micro-batches need NOT arrive in event-time order (no
        # watermark constrains this query): re-sort the union by
        # (event time, event_id) before truncating, or a late batch
        # would evict newer events from the window.  Microsecond
        # precision + the event_id tiebreak keep the order identical
        # to the SQL oracle's ORDER BY ts DESC, event_id DESC.
        merged = sorted(old + new)[-self.K :]
        self._recent.put(merged)
        entries = [
            (k[0], int(v[0])) for k, v in self._counts.iterator()
        ]
        best = max(n for _, n in entries)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_events": [sum(n for _, n in entries)],
                "n_types": [len(entries)],
                "top_type": [min(t for t, n in entries if n == best)],
                "recent_max": [max(v for _, _, v in merged)],
            }
        )

    def close(self) -> None:
        pass


def user_event_profile_v2(events: DataFrame) -> DataFrame:
    """Streaming per-user profile on transformWithStateInPandas; see
    :class:`UserProfileProcessor`.  ``events`` needs (user_id,
    event_id, ts, event_type, value)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


def user_event_profile_v2_batch(events: DataFrame) -> DataFrame:
    """Batch-contract twin of :func:`user_event_profile_v2`: the SAME
    ``UserProfileProcessor`` (MapState + bounded ListState arithmetic)
    driven through in-memory state handles inside ``applyInPandas`` —
    one pdf per user in (ts, event_id) order, exactly what the
    streaming query sees when batches arrive time-ordered.  Output
    equals the streaming query's final per-user row."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        proc = UserProfileProcessor()
        proc.init(_LocalHandle())
        out = list(proc.handleInputRows(key, iter([pdf]), None))
        proc.close()
        return out[-1]

    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandas(run, PROFILE_OUTPUT)
    )


class _LocalValueState:
    """In-memory ValueState with the StatefulProcessorHandle value-state
    API surface the processors above touch (exists/get/update)."""

    def __init__(self) -> None:
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v

    def clear(self) -> None:
        self._v = None


class _LocalListState:
    """In-memory ListState (exists/get/put/appendValue)."""

    def __init__(self) -> None:
        self._items: list = []

    def exists(self) -> bool:
        return bool(self._items)

    def get(self):
        return iter(self._items)

    def put(self, items) -> None:
        self._items = list(items)

    def appendValue(self, item) -> None:
        self._items.append(item)

    def clear(self) -> None:
        self._items = []


class _LocalMapState:
    """In-memory MapState (getValue/containsKey/updateValue/iterator)."""

    def __init__(self) -> None:
        self._m: dict = {}

    def exists(self) -> bool:
        return bool(self._m)

    def getValue(self, key):
        return self._m.get(tuple(key))

    def containsKey(self, key) -> bool:
        return tuple(key) in self._m

    def updateValue(self, key, value) -> None:
        self._m[tuple(key)] = tuple(value)

    def iterator(self):
        return iter(self._m.items())


class _LocalHandle:
    """Minimal StatefulProcessorHandle stand-in for batch-contract
    execution: hands out in-memory value/list/map states and records
    timer registrations (so timer-driven processors can be unit-driven
    without a streaming query)."""

    def __init__(self) -> None:
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return _LocalValueState()

    def getListState(self, name, schema, ttlDurationMs=None):
        return _LocalListState()

    def getMapState(self, name, key_schema, value_schema, ttlDurationMs=None):
        return _LocalMapState()

    def registerTimer(self, expiryTimestampMs: int) -> None:
        self.timers.append(int(expiryTimestampMs))

    def deleteTimer(self, expiryTimestampMs: int) -> None:
        self.timers = [t for t in self.timers if t != int(expiryTimestampMs)]

    def listTimers(self):
        return iter(list(self.timers))


def running_user_totals_v2_batch(events: DataFrame) -> DataFrame:
    """Batch-contract twin of :func:`running_user_totals_v2`: drives
    the SAME ``RunningTotalsProcessor`` (init + handleInputRows, the
    exact per-key arithmetic the streaming query runs) through an
    in-memory state handle inside ``applyInPandas``.  The only thing
    not exercised is the protobuf state-server transport to the
    RocksDB store — absent in minimal containers, which is why the
    typed-state path needs a batch twin for a driver-checkable
    CORRECTNESS row at all.  Output equals the streaming query's
    final per-user state after all input is consumed."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        proc = RunningTotalsProcessor()
        proc.init(_LocalHandle())
        out = list(proc.handleInputRows(key, iter([pdf]), None))
        proc.close()
        return out[-1]

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandas(run, TOTALS_OUTPUT)
    )
