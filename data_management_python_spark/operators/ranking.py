"""Global ordered ranking without a single-reducer sort.

The reference engine never needs a global row number (its Pandas frames
are single-node, ``df.reset_index()`` is free — e.g.
igf_data/utils/gviz_utils.py renders frames in index order).  At 100 TB
the naive Spark translation — ``row_number() OVER (ORDER BY ...)`` —
is a SinglePartition window: every row funnels through one task.

``global_row_number`` keeps the sort distributed with the classic
two-pass shape:

1. ``repartitionByRange`` on the order keys (reservoir-sampled range
   boundaries keep partitions balanced under skew) + a partition-local
   sort — the same plan a global ``orderBy`` produces, minus the final
   single-reducer collapse.
2. One tiny job counts rows per range partition (one row per
   partition); the driver folds those counts into exclusive offsets —
   O(num_partitions) state, never row data.
3. A partition-local ``row_number`` (window keyed on the physical
   partition id, so every window group is exactly one range slice)
   plus the broadcast offset yields the exact global rank.

Equal keys land in one range partition, so ranks are total and exact —
but tie order inside an equal-key run is engine-dependent; pass a
unique key suffix (id column) whenever downstream consumers need
reproducible ranks, same as any ORDER BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__grn_pid"


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based global row number in ``order_by`` order.

    The order key should be unique (append an id column to break
    ties); otherwise ranks are still total and exact but tie order is
    engine-dependent.
    """
    cols = list(order_by)
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # The range partitioning is sampled once and reused by both jobs
    # below (same lineage, deterministic sampling), so the per-partition
    # counts and the final ranks agree.
    parted = parted.persist()
    with_pid = parted.withColumn(_PID, F.spark_partition_id())
    counts = (
        with_pid.groupBy(_PID).count().collect()
    )  # bounded: one row per partition
    sizes = {int(r[_PID]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col(_PID) == pid, F.lit(off)).otherwise(off_expr)
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        with_pid.withColumn(
            out_col, (F.row_number().over(w) + off_expr).cast("long")
        )
        .drop(_PID)
    )


def ntile_from_rank(rank_col: str, n_rows: int, k: int):
    """Closed-form NTILE bucket from a 1-based global rank.

    Matches SQL NTILE(k) OVER (ORDER BY ...): the first ``n mod k``
    buckets hold ``ceil(n/k)`` rows, the rest ``floor(n/k)``.  Lets
    equi-depth bucketing ride :func:`global_row_number` instead of a
    SinglePartition NTILE window.
    """
    if n_rows <= 0:
        return F.lit(None).cast("int")
    if k >= n_rows:
        return F.col(rank_col).cast("int")
    big = n_rows % k
    size_big = n_rows // k + 1
    size_small = n_rows // k
    r0 = F.col(rank_col) - 1  # 0-based
    cut = big * size_big
    return (
        F.when(r0 < cut, F.floor(r0 / size_big))
        .otherwise(big + F.floor((r0 - cut) / size_small))
        .cast("int")
        + 1
    )


def multi_ntile(
    df: DataFrame,
    keys: Sequence[tuple[str, Column]],
    tie_col: str,
    n_rows: int,
    k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equi-depth NTILE(k) scores over SEVERAL order keys in ONE
    distributed ranking pass.

    Chaining :func:`global_row_number` once per dimension pays one
    range shuffle + one offset-count job + one window codegen unit PER
    dimension.  Here the dimensions are melted into (dim, kv) rows —
    each ``keys`` entry supplies an ORDER-PRESERVING long encoding of
    its column — so a single range shuffle on (dim, kv, tie) sorts
    every dimension at once, one O(dims x partitions) count job folds
    the per-(dim, partition) offsets, and one window emits all ranks.
    Scores fold back to one row per ``tie_col`` with a grouped
    max-when (every melted row of an id carries identical payload
    columns, so ``first`` is deterministic).

    ``tie_col`` must be unique per row (it breaks order ties, exactly
    as the chained shape's trailing key).  Output: all original
    columns plus one int score column per ``keys`` entry.
    """
    score_cols = [name for name, _ in keys]
    payload = [c for c in df.columns if c != tie_col]
    melted = df.select(
        tie_col,
        *payload,
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(i + 1).alias("dim"), kv.cast("long").alias("kv")
                    )
                    for i, (_, kv) in enumerate(keys)
                )
            )
        ).alias("__d"),
    ).select(
        tie_col, *payload, F.col("__d.dim").alias("__dim"), F.col("__d.kv").alias("__kv")
    )
    cols = ["__dim", "__kv", tie_col]
    parted = (
        melted.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else melted.repartitionByRange(*cols)
    )
    parted = parted.persist()
    with_pid = parted.withColumn(_PID, F.spark_partition_id())
    counts = with_pid.groupBy("__dim", _PID).count().collect()
    sizes = {
        (int(r["__dim"]), int(r[_PID])): int(r["count"]) for r in counts
    }
    off_expr = F.lit(0).cast("long")
    for d in range(1, len(keys) + 1):
        acc = 0
        for pid in sorted(p for (dd, p) in sizes if dd == d):
            if acc:
                off_expr = F.when(
                    (F.col("__dim") == d) & (F.col(_PID) == pid),
                    F.lit(acc),
                ).otherwise(off_expr)
            acc += sizes[(d, pid)]
    w = Window.partitionBy("__dim", _PID).orderBy("__kv", tie_col)
    ranked = with_pid.withColumn(
        "__rn", (F.row_number().over(w) + off_expr).cast("long")
    ).withColumn("__score", ntile_from_rank("__rn", n_rows, k))
    return ranked.groupBy(tie_col).agg(
        *(F.first(c).alias(c) for c in payload),
        *(
            F.max(F.when(F.col("__dim") == i + 1, F.col("__score"))).alias(
                name
            )
            for i, name in enumerate(score_cols)
        ),
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "cum",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running total of ``value_col`` in global ``order_by`` order —
    the SinglePartition ``SUM() OVER (ORDER BY ...)`` window, kept
    distributed, in ONE pass over the data:

    1. ``repartitionByRange`` on the (ascending, unique) order keys;
    2. one tiny job folds each range slice's value total into a base
       offset per slice — O(num_partitions) driver state, never rows;
    3. ``applyInPandas`` per slice sorts locally and adds base +
       local cumsum.

    Fuses what :func:`global_row_number` + a rank-keyed prefix sum do
    in two passes (rank job, then bin job) when the consumer only
    needs the running SUM, not the rank itself.  ``value_col`` must be
    integral so bases and local sums are exact in any fold order;
    descending order = pass a negated helper column, same as
    global_row_number.

    r12: the per-slice scan is a JVM window over ``_PID`` (the shape
    :func:`global_row_number` already uses), not ``applyInPandas`` —
    the Python boundary shipped every row out and back through Arrow
    for a cumsum codegen does natively (guide §4.1), and the window's
    required hashpartitioning(_PID) is the SAME exchange the pandas
    groupBy paid.  ROWS frame (not the default RANGE) keeps per-row
    accumulation identical to the old local cumsum; NULL values add 0
    via coalesce, matching SUM OVER's ignore-nulls semantics.
    """
    cols = list(order_by)
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # eager localCheckpoint, not persist(): the range-shuffled frame is
    # needed twice (offset job + final scan) but must not stay pinned in
    # the cache for the session lifetime after the caller materializes
    # the returned plan — checkpoint blocks release on GC
    parted = parted.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    partials = parted.groupBy(_PID).agg(F.sum(value_col).alias("__s")).collect()
    # a slice whose values are all NULL sums to NULL -> contributes 0,
    # matching SUM OVER's ignore-nulls accumulation
    sums = {
        int(r[_PID]): 0 if r["__s"] is None else int(r["__s"])
        for r in partials
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        bases[pid] = acc
        acc += sums[pid]

    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    if not inclusive:
        run = run - F.coalesce(F.col(value_col), F.lit(0))
    # O(num slices) literal base map — the same driver state the scan
    # closure carried; the dummy entry keeps the map typed when the
    # input has no partitions at all (no rows ever read it then)
    base_map = F.create_map(
        *[
            x
            for pid, b in (bases or {0: 0}).items()
            for x in (F.lit(pid), F.lit(b))
        ]
    )
    return parted.withColumn(
        out_col,
        (F.element_at(base_map, F.col(_PID)) + run).cast("long"),
    ).drop(_PID)
