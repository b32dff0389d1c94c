"""Stream-stream joins: watermarked interval join between two live
event streams.

Beyond-reference (the reference has no streaming; SURVEY §2.9 maps its
incremental behavior to file-discovery polling).  This is the
Structured Streaming primitive the batch `e_attribution` query
(plans/analytics.py) incrementalizes to: match each purchase to the
same user's clicks that happened in a bounded window before it, with
BOTH sides unbounded.

Scale/state design — the part that matters at 100 TB/day:

- Both sides carry a watermark, and the join condition bounds the
  event-time distance (``purchase.ts BETWEEN click.ts AND click.ts +
  horizon``).  That pair of constraints is exactly what lets Spark
  evict join state: a click older than ``watermark - horizon`` can
  never match a future purchase and is dropped from the state store.
  An unconstrained stream-stream join would grow state forever.
- The join is keyed on user_id + the time-range predicate, so state
  is hash-partitioned by user — no broadcast, no replay.
- Inner join emits as soon as both sides arrive; the left-outer
  variant additionally emits unmatched purchases once the watermark
  proves no click can still arrive (null-extended, exactly once).
  Operational note: the GLOBAL watermark is the minimum across both
  input streams — a quiet click stream pins it and defers null
  emission indefinitely (the standard stream-stream outer-join
  caveat; tests/test_streaming_sc.py demonstrates both the pin and
  the flush).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_python_spark.streaming.windows import ensure_event_time_ltz


def stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
    watermark_minutes: int = 10,
    how: str = "inner",
) -> DataFrame:
    """Join purchase events to same-user clicks at most
    ``horizon_minutes`` older, both sides streaming.

    ``clicks`` / ``purchases`` need (user_id, event_id, ts).  Returns
    one row per (purchase, qualifying click) pair: inner drops
    purchases with no click in the horizon; ``how="leftOuter"`` emits
    them null-extended after the watermark closes the horizon.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how}")
    c = ensure_event_time_ltz(
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        ),
        "click_ts",
    ).withWatermark("click_ts", f"{watermark_minutes} minutes")
    p = ensure_event_time_ltz(
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        ),
        "purchase_ts",
    ).withWatermark("purchase_ts", f"{watermark_minutes} minutes")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    joined = p.join(c, cond, how)
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )
