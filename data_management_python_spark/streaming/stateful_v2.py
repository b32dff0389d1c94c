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


class _LocalHandle:
    """Minimal StatefulProcessorHandle stand-in for batch-contract
    execution: hands out in-memory value states."""

    def getValueState(self, name, schema):
        return _LocalValueState()


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
