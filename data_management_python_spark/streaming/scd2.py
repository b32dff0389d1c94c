"""Streaming SCD Type-2 maintenance.

Batch side: ``operators.upsert.scd2_from_changelog`` rebuilds the full
span history from a changelog; ``scd2_apply`` merges update batches.
This module closes the loop for continuous ingestion: spans are
maintained incrementally from a change STREAM, emitting each closed
span exactly once (append mode) the moment the tracked value changes.
The open span per key lives in O(1) stream state — at any time the
dimension's current rows are the state, and its history is the sink.

The reference mutates status columns in place with no history
(igfTables.py status ENUMs; pipelineadaptor.py seed updates); a lake
keeps the timeline instead, and this operator keeps it fresh without
re-reading the changelog.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_management_python_spark.streaming.windows import ensure_event_time_ltz

SCD2_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("status", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
    ]
)

_SCD2_STATE = StructType(
    [
        StructField("status", StringType()),
        StructField("valid_from", TimestampType()),
    ]
)


def stream_scd2(
    changes: DataFrame,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Incremental SCD2 span maintenance over a keyed change stream.

    Input: a stream of (user_id, event_type, ts) changes, watermarked
    on ``ts``.  For each key the operator tracks the open span
    (status, valid_from) in state; when a change batch brings a
    DIFFERENT value, the open span is emitted as a closed row
    (valid_to = change time) and the new value opens the next span.
    Same-value changes are no-ops, so re-delivered unchanged snapshots
    produce no output (idempotent history).

    Scale shape: state is two fields per key regardless of event
    volume; output volume equals the number of genuine transitions.
    No timeout is registered — an open span stays open until its key
    changes, exactly like the batch semantics
    (``scd2_from_changelog``'s NULL-``valid_to`` rows, which here live
    in state rather than the sink).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        status, valid_from = state.get if state.exists else (None, None)
        closed: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # order must hold across Arrow chunk boundaries
            rows = pd.concat(chunks).sort_values("ts")
            for _, r in rows.iterrows():
                t = r["ts"].to_pydatetime()
                v = r["event_type"]
                if status is None:
                    status, valid_from = v, t
                elif v != status:
                    closed.append((key[0], status, valid_from, t))
                    status, valid_from = v, t
        if status is not None:
            state.update((status, valid_from))
        yield pd.DataFrame(
            closed, columns=["user_id", "status", "valid_from", "valid_to"]
        )

    return (
        ensure_event_time_ltz(changes, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SCD2_OUTPUT,
            stateStructType=_SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
