"""Size-gated eager materialization (r13, verdict item 2).

Several operators derive a NARROW intermediate (a label frame, a
vocabulary, a signature table) that their plan consumes several times.
Spark shares no subtrees across consumers in one plan (AQE exchange
reuse fires only within one executed stage graph, and re-planned
branches re-run the whole upstream lineage), so each extra consumer is
a full corpus pass at scale.  An eager ``localCheckpoint`` pin fixes
that — but at bench scale the pin's fixed cost (a materialization job
+ checkpoint round-trip) EXCEEDS the re-planned map work, which is why
rounds 10/12 built and rejected unconditional pins for the job-floor
queries (measured ~0.3-0.4 s slower each; OPTIMIZATION_r12.md batches
10/19/22).

``pin_if_large`` is the recorded resolution: pin ONLY when the
operator's input is big enough that re-running its lineage dominates
the pin cost.  The gate reads the optimizer's size estimate for the
gate frame (file-size-derived for parquet scans) — a driver-side
metadata lookup, NO Spark job — so the gate itself is free.

Threshold: ``SPARK_GRAFT_PIN_MIN_BYTES`` (default 32 MB of estimated
input).  Measured calibration on the salted replica corpora: the
documents scan estimates ~0.6 MB at sf0.1, ~6 MB at the 10x replica,
~61 MB at the 100x replica — so the default engages at the 100x
(sf10-equivalent) tier where the pinned shapes were measured to win,
and stays off at bench scale where they were measured to lose.  A
cluster deployment tunes the env with its own task floor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_MIN_BYTES = 32 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """The optimizer's size estimate for ``df`` (bytes) — driver-side
    metadata only, never a job.  -1 when the estimate is unavailable
    (callers treat that as 'small': never pin blind)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — estimate is best-effort
        return -1


def pin_min_bytes() -> int:
    try:
        return int(
            os.environ.get("SPARK_GRAFT_PIN_MIN_BYTES", DEFAULT_MIN_BYTES)
        )
    except ValueError:
        return DEFAULT_MIN_BYTES


def pin_if_large(
    df: DataFrame,
    gate: DataFrame | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """Eagerly localCheckpoint ``df`` iff the size estimate of
    ``gate`` (default: ``df`` itself) meets the threshold; otherwise
    return ``df`` unchanged.  Pass the operator's INPUT scan as
    ``gate`` when ``df`` is a derived frame whose own estimate is
    unreliable (aggregates over explodes inherit garbage estimates);
    the input scan's estimate is file-size-accurate.  Result-identical
    either way — only the plan shape changes."""
    limit = pin_min_bytes() if min_bytes is None else min_bytes
    src = df if gate is None else gate
    if plan_size_bytes(src) >= limit:
        return df.localCheckpoint(eager=True)
    return df
