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
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
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

    State per user is O(1): (session start, last event ts, count).
    Append mode — closed sessions are immutable.  Late events older
    than the watermark are dropped by the upstream ``withWatermark``.

    Within a batch, incoming events interval-gap-cluster with the open
    session (exact).  ACROSS batches the O(1) state keeps only the
    newest cluster: earlier clusters flush eagerly, so two
    in-watermark late events arriving in SEPARATE batches can emit as
    two sessions where a full recompute would merge them — the
    documented trade for fixed-size state on this API.  The
    typed-state successor (stateful_v2.SessionGapProcessor) keeps the
    LIST of open sessions and is exact; new pipelines should use it.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                }
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        # concatenate the key's Arrow chunks before sorting — event
        # order must hold across chunk boundaries, not within each
        chunks = [pdf for pdf in pdfs if len(pdf)]
        all_ts = sorted(pd.concat(chunks)["ts"]) if chunks else []
        # watermark bounds LATENESS, not order: a later micro-batch may
        # deliver events preceding the open session — even before its
        # start.  Interval-gap clustering over the incoming points plus
        # the open session as one interval (internal gaps <= gap by
        # construction): merge neighbors whose gap <= threshold (the
        # engine-wide inclusive rule); the last cluster stays open,
        # earlier clusters close immediately.  Same algorithm as the
        # typed-state twin (stateful_v2.SessionGapProcessor).
        intervals = [
            (t.to_pydatetime(), t.to_pydatetime(), 1) for t in all_ts
        ]
        if last is not None:
            intervals.append((start, last, n))
        intervals.sort()
        merged: list[list] = []
        for s0, e0, c0 in intervals:
            if merged and (
                (s0 - merged[-1][1]).total_seconds() <= gap_seconds
            ):
                merged[-1][1] = max(merged[-1][1], e0)
                merged[-1][2] += c0
            else:
                merged.append([s0, e0, c0])
        closed = [(key[0], s0, e0, c0) for s0, e0, c0 in merged[:-1]]
        if merged:
            start, last, n = merged[-1]
            state.update((start, last, n))
            # close when the watermark passes last + gap
            state.setTimeoutTimestamp(
                int(last.timestamp() * 1000) + gap_seconds * 1000
            )
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

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
