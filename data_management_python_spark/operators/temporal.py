"""Temporal join operators: as-of join and interval range join.

The reference engine has no temporal joins (its dataflows are batch
metadata reconciliations, SURVEY §2.3); these are the beyond-reference
operators a training-data / event pipeline needs: align each fact row
with the latest dimension state at its event time (as-of), and match
points to time intervals (range join) without a cartesian product.

Scale design (the whole point — neither op exists in Spark as a
primitive, and the naive formulations collapse at 100 TB):

- ``asof_join``: the textbook formulation is a non-equi theta join
  (``l.ts >= r.ts`` + argmax), which Spark executes as a broadcast
  nested-loop or cartesian — O(|L|·|R|) per key. Instead we UNION the
  two sides, hash-partition by key, sort within partition by
  (time, side), and carry the right payload forward with
  ``last(ignorenulls)`` over a running window. One shuffle, one sort,
  linear scan — the same merge-scan plan a native as-of join (e.g.
  DuckDB's ASOF JOIN or kdb's aj) uses, expressed with stock Catalyst
  operators so AQE/codegen still apply.

- ``range_join``: points-in-intervals as a pure inequality join is a
  cartesian. We quantize time into fixed buckets, explode each
  interval to the buckets it overlaps, and equi-join on the bucket id
  — shuffle both sides by bucket, then refine with the exact
  predicate. With bucket_seconds ≈ the typical interval length each
  interval lands in ~2 buckets, so the join stays linear and
  hash-partitioned (this is Databricks' bin-based range-join strategy
  re-expressed with explode + equi-join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_management_python_spark.functions import epoch_us

_T = "__asof_t"
_ORD = "__asof_ord"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the closest ``right`` row per key.

    ``direction="backward"`` (default): the latest right row with
    ``right_ts <= left_ts``; ``"forward"``: the earliest right row
    with ``right_ts >= left_ts``. Both bounds are inclusive.

    ``right`` must have at most one row per (key, right_ts) — dedupe
    upstream (e.g. row_number) or the carried payload is ambiguous.
    Non-key column names must not collide between the two sides.

    ``tolerance_seconds`` (timestamp columns only) nulls the match
    when the matched right_ts is further than the tolerance from
    left_ts, like pandas ``merge_asof(tolerance=...)``.

    Returns all left columns plus all right non-key columns
    (including ``right_ts``, the matched state's effective time).
    ``how="inner"`` drops left rows with no match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    # side ordinal: at equal time the RIGHT row must be visible to the
    # left row's frame, so it sorts toward the frame's interior
    r_ord, l_ord = (0, 1) if direction == "backward" else (1, 0)
    l2 = left.select(
        *keys,
        F.col(left_ts).alias(_T),
        F.lit(l_ord).alias(_ORD),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias(_T),
        F.lit(r_ord).alias(_ORD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    w = Window.partitionBy(*keys).orderBy(_T, _ORD)
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, 0)
        fill = [F.last(c, ignorenulls=True).over(frame).alias(f"__f_{c}") for c in rcols]
    else:
        frame = w.rowsBetween(0, Window.unboundedFollowing)
        fill = [F.first(c, ignorenulls=True).over(frame).alias(f"__f_{c}") for c in rcols]

    # pre-partition the union on the window's keys at the operator's
    # width: the window's required HashPartitioning(keys) is then
    # satisfied by THIS exchange (one, operator-sized) instead of an
    # implicit one at the session's shuffle width — a default-conf
    # session would otherwise sort 200 slivers of a tiny union
    from data_management_python_spark.session import operator_width  # noqa: PLC0415

    width = operator_width(left.sparkSession)
    filled = (
        l2.unionByName(r2)
        .repartition(width, *keys)
        .select(*keys, _T, _ORD, *lcols, *fill)
    )
    matched: Column = F.col(f"__f_{right_ts}").isNotNull()
    if tolerance_seconds is not None:
        gap = F.abs(epoch_us(F.col(_T)) - epoch_us(F.col(f"__f_{right_ts}")))
        matched = matched & (gap <= int(tolerance_seconds * 1_000_000))
    out = filled.filter(F.col(_ORD) == l_ord).select(
        *keys,
        *lcols,
        *[
            F.when(matched, F.col(f"__f_{c}")).alias(c)
            for c in rcols
        ],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out


def range_join(
    intervals: DataFrame,
    probe: DataFrame,
    start: str,
    end: str,
    probe_ts: str,
    bucket_seconds: float,
    on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Match ``probe`` rows to the ``intervals`` rows whose
    ``[start, end)`` window contains ``probe_ts`` (plus optional
    equality keys ``on``), without a cartesian product.

    Pick ``bucket_seconds`` close to the typical interval length so
    each interval explodes into ~2 bucket rows; much smaller values
    multiply the interval side, much larger ones degrade pruning
    (every probe in a bucket meets every interval overlapping it).

    Returns interval columns + probe columns for every matching pair;
    aggregate downstream. ``how="left"`` keeps empty intervals with
    null probe columns.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    clash = (set(intervals.columns) & set(probe.columns)) - set(on)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    bkt_us = int(bucket_seconds * 1_000_000)
    i2 = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(epoch_us(F.col(start)) / bkt_us),
                F.floor(epoch_us(F.col(end)) / bkt_us),
            )
        ),
    )
    p2 = probe.withColumn("__bkt", F.floor(epoch_us(F.col(probe_ts)) / bkt_us))
    cond = (F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) < F.col(end))
    pairs = i2.join(p2, on=["__bkt", *on], how="inner").filter(cond).drop("__bkt")
    if how == "left":
        probe_cols = [c for c in probe.columns if c not in on]
        pairs = intervals.join(
            pairs.select(*intervals.columns, *probe_cols),
            on=list(intervals.columns),
            how="left",
        )
    return pairs
