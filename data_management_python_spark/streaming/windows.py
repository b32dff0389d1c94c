"""Structured Streaming windowed aggregation + custom stateful operator.

The reference has no true streaming (§2.9) — these are the
beyond-reference streaming primitives a large-scale pipeline needs:

  - watermarked tumbling-window aggregation (late data handled by the
    watermark instead of the reference's file-arrival polling)
  - a custom per-key stateful operator via ``applyInPandasWithState``
    (running per-user event counter with session-style timeout) — the
    pattern for operators Spark lacks natively.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def ensure_event_time_ltz(df: DataFrame, col: str) -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP_LTZ.

    Structured Streaming watermarks require TIMESTAMP (LTZ); parquet
    naive timestamps arrive as NTZ.  With the session timezone pinned
    to UTC (session.py) the cast is value-preserving.  No-op for
    columns already LTZ.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window aggregate with a watermark.

    Works on both a streaming frame (readStream) and a batch frame —
    same plan, which is how the batch oracle query e_tumbling_window
    cross-checks the streaming semantics.
    """
    src = (
        ensure_event_time_ltz(events, "ts").withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    return src.groupBy(
        F.window("ts", window).alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: per (user, activity session) event counts using
    Spark's native session_window (gap-based close).  The streaming
    analog of the batch lag/running-sum sessionization in
    plans.relational.e_sessionize.

    Boundary semantics (pinned by a hypothesis property test against a
    pure-Python sweep): Spark's session merge is INCLUSIVE — an event
    exactly ``gap`` after the previous one still joins the open
    session; only ``diff > gap`` starts a new session.  Session end is
    last event + gap.  This matches e_sessionize and
    stream_session_gap, which both use the ``diff > gap`` split rule.
    """
    src = (
        ensure_event_time_ltz(events, "ts").withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    return src.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        "user_id",
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "n_events",
    )


STATE_SCHEMA = StructType([StructField("n_events", LongType(), False)])
COUNTER_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("last_ts", TimestampType(), True),
    ]
)


def running_user_counter(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user cumulative event count.

    ``applyInPandasWithState`` keeps O(1) state per key on the state
    store; each micro-batch emits the updated counter.  This is the
    template for reference-free stateful semantics (e.g. pipeline-seed
    progress tracking as a stream instead of Delta MERGE polling).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        last = None
        for pdf in pdfs:
            n += len(pdf)
            mx = pdf["ts"].max()
            last = mx if last is None else max(last, mx)
        state.update((n,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_ts": [last]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=COUNTER_OUTPUT,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("starts_ms", ArrayType(LongType())),
        StructField("lasts_ms", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)


def stream_session_gap(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Custom gap-based sessionization with EVENT-TIME timeouts: a
    session closes (and emits exactly one row) when the watermark
    passes its last event + gap — the hand-rolled equivalent of
    ``session_window`` that additionally shows the
    ``GroupStateTimeout.EventTimeTimeout`` pattern for stateful
    operators whose close condition is not expressible as a window
    (count caps, value triggers, cross-field predicates...).

    EXACT under out-of-order arrival, same contract as the typed-state
    twin (stateful_v2.SessionGapProcessor): state per key is the LIST
    of open sessions as parallel (start_ms, last_ms, n) arrays — every
    cluster whose close time the watermark has not strictly passed
    stays open, because a late in-watermark event may still extend,
    BRIDGE, or precede it (round-7: the old O(1)-newest-cluster state
    eagerly flushed earlier clusters, so cross-batch late events could
    emit as two sessions where a recompute merges them).  Closure is
    watermark-gated on both paths: the data path closes clusters whose
    ``last + gap < watermark`` (STRICTLY — an admitted event at
    ``ts == watermark == close`` must still merge under the inclusive
    rule), and this API's single per-key event-time timeout is armed
    at the EARLIEST open close time (clamped above the watermark), so
    sessions drain even when a key stops receiving data.  State size
    is O(open sessions inside the watermark horizon) — bounded by the
    watermark itself.  Append mode; late events older than the
    watermark are dropped by the upstream ``withWatermark``.

    .. warning:: **Checkpoint compatibility.** Round-7 changed the
       state format from one (start, last, n) timestamp struct to the
       parallel long arrays above.  ``applyInPandasWithState`` has NO
       state-schema evolution: a pre-round-7 deployment of this
       operator restarted on its existing checkpoint will fail (or
       worse, misdecode state).  Restart such pipelines with a FRESH
       checkpoint location deliberately; the exactly-once story then
       restarts from the source's retained offsets, not from state.
    """
    gap_ms = int(gap_seconds) * 1000

    def _emit(key, closed: list[tuple[int, int, int]]) -> pd.DataFrame:
        rows = [
            (
                key[0],
                pd.Timestamp(s, unit="ms"),
                pd.Timestamp(e, unit="ms"),
                c,
            )
            for s, e, c in sorted(closed)
        ]
        return pd.DataFrame(
            rows,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    def _partition(sessions, wm_ms):
        closed = [x for x in sessions if x[1] + gap_ms < wm_ms]
        return closed, [x for x in sessions if x[1] + gap_ms >= wm_ms]

    def _arm_and_store(state: GroupState, open_: list) -> None:
        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [e for _, e, _ in open_],
                    [c for _, _, c in open_],
                )
            )
            # one timeout per key on this API: arm at the earliest open
            # close time; later closes re-arm when it fires.  Clamped
            # strictly above the watermark (API requirement — and a
            # close time AT the watermark may still absorb a ts == wm
            # event, so it must wait for the next advance anyway).
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(min(e + gap_ms for _, e, _ in open_), wm + 1)
            )
        else:
            state.remove()

    def _open_sessions(state: GroupState) -> list[tuple[int, int, int]]:
        if not state.exists:
            return []
        starts, lasts, ns = state.get
        return [
            (int(s), int(e), int(c))
            for s, e, c in zip(starts, lasts, ns)
        ]

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            closed, open_ = _partition(_open_sessions(state), wm)
            _arm_and_store(state, open_)
            if closed:
                yield _emit(key, closed)
            return
        # concatenate the key's Arrow chunks before sorting — event
        # order must hold across chunk boundaries, not within each
        chunks = [pdf for pdf in pdfs if len(pdf)]
        ts_ms = (
            sorted(
                int(v)
                for pdf in chunks
                for v in pdf["ts"].astype("int64") // 10**6
            )
            if chunks
            else []
        )
        # watermark bounds LATENESS, not order: a later micro-batch may
        # deliver events preceding any open session — even before its
        # start.  Interval-gap clustering over the incoming points plus
        # EVERY open session as an interval (internal gaps <= gap by
        # construction): merge neighbors whose gap <= threshold (the
        # engine-wide inclusive rule).  Same algorithm as the
        # typed-state twin (stateful_v2.SessionGapProcessor).
        intervals = sorted(
            _open_sessions(state) + [(t, t, 1) for t in ts_ms]
        )
        merged: list[list[int]] = []
        for s0, e0, c0 in intervals:
            if merged and s0 - merged[-1][1] <= gap_ms:
                merged[-1][1] = max(merged[-1][1], e0)
                merged[-1][2] += c0
            else:
                merged.append([s0, e0, c0])
        # close ONLY what the watermark already strictly passed — an
        # admitted event (ts >= wm) can never merge into such a
        # cluster (diff > gap by definition), so this is exact; every
        # other cluster stays open for potential late merges
        closed, open_ = _partition(
            [tuple(c) for c in merged], wm
        )
        _arm_and_store(state, open_)
        if closed:
            yield _emit(key, closed)

    return (
        ensure_event_time_ltz(events, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_ohlc(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming OHLC downsampling: per (user, tumbling window) bars
    with open/close picked by min_by/max_by on a zero-padded
    (epoch_ms, event_id) key — the streaming twin of the batch
    `e_ohlc_resample` query (plans/analytics.py), same bar semantics.

    min_by/max_by are full aggregate functions, so the bars maintain
    O(1) state per open window under the watermark and emit once the
    watermark passes window end (append mode).  Works on a batch frame
    too (no watermark), which is how the parity test cross-checks the
    streaming output bar-for-bar against the batch query.
    """
    from data_management_python_spark.functions import epoch_ms

    src = (
        ensure_event_time_ltz(events, "ts").withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    key = F.concat(
        F.lpad(epoch_ms("ts").cast("string"), 15, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        src.groupBy(F.window("ts", window).alias("win"), "user_id")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
