"""Streaming conversion funnel — the continuous counterpart of the
batch ``e_funnel`` query (plans/analytics.py): per-user ordered step
completion tracked across micro-batches with ``applyInPandasWithState``.

State per user is THREE timestamps (first qualifying completion of
each step) — O(1) regardless of event volume, the property that lets
the operator run forever.  A step qualifies exactly as in the batch
query: its event must strictly follow the user's first completion of
the previous step.

Ordering caveat (documented, inherent to O(1) state): events are
folded in event-time order WITHIN each batch, but a straggler arriving
in a later batch cannot retroactively re-qualify an earlier event of
the next step (that would require keeping every candidate event).
Feed batches in event-time order — the usual ingestion contract — and
the stream's step completions equal the batch query's exactly (the
parity test pins this).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("step_order", LongType(), False),
        StructField("step", StringType(), False),
        StructField("ts_us", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
    ]
)


def stream_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit (user_id, step_order, step, ts_us) the first time a user
    completes each funnel step, across micro-batches.

    Grouped-state fold: events sort by (ts, event_id) inside the
    batch, then each event advances the user's (t1, t2, t3) exactly
    like the batch cascade — step N's timestamp only sets when step
    N-1 is already set and strictly earlier.  Output rows appear only
    on transitions, so downstream counts are incremental.
    """
    s1, s2, s3 = steps

    def fold(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            t1, t2, t3 = state.get
        else:
            t1 = t2 = t3 = None
        before = (t1, t2, t3)
        rows = []
        for pdf in pdfs:
            rows.append(pdf[[type_col, "__ts_us", id_col]])
        ev = pd.concat(rows).sort_values(["__ts_us", id_col])
        out_rows = []
        for et, ts, _eid in ev.itertuples(index=False):
            ts = int(ts)
            if et == s1:
                if t1 is None or ts < t1:
                    t1 = ts
            elif et == s2:
                if t1 is not None and ts > t1 and (t2 is None or ts < t2):
                    t2 = ts
            elif et == s3:
                if t2 is not None and ts > t2 and (t3 is None or ts < t3):
                    t3 = ts
        state.update((t1, t2, t3))
        uid = key[0]
        for order, (name, prev, now) in enumerate(
            zip(steps, before, (t1, t2, t3)), start=1
        ):
            if now is not None and prev != now:
                out_rows.append((uid, order, name, now))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "step_order", "step", "ts_us"]
            )

    prepped = events.select(
        F.col(user_col),
        F.col(type_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("__ts_us"),
    )
    return prepped.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
