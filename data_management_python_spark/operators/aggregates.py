"""Aggregation operators (SURVEY §2.4).

Everything here is partial-aggregation-friendly (map-side combine) —
the groupBy/agg forms Spark executes as HashAggregate(partial) →
exchange → HashAggregate(final), which is the 100 TB-safe shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_rows(df: DataFrame, key_columns: Sequence[str]) -> DataFrame:
    """Key groups appearing more than once, with their count.

    Reference duplicate detection: duplicate full rows / duplicate
    (Lane, index[, index2]) barcodes / duplicate Sample_Name per lane
    (metadata_validation.py:69-189).
    """
    return (
        df.groupBy(*key_columns)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def pivot_sum(
    df: DataFrame,
    row_key: str | Sequence[str],
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str] | None = None,
    add_total: bool = True,
    total_col: str = "total",
) -> DataFrame:
    """Wide matrix: rows=row_key, cols=pivot values, cells=sum(value).

    Reference A3: read-count matrix rows=sample, cols=flowcell, + per-row
    total (project_data_display_utils.py:60-120).  Pass ``pivot_values``
    at scale so the planner skips the distinct-values job.
    """
    keys = [row_key] if isinstance(row_key, str) else list(row_key)
    pvt = df.groupBy(*keys).pivot(pivot_col, list(pivot_values) if pivot_values else None)
    out = pvt.agg(F.sum(value_col))
    if add_total:
        value_cols = [c for c in out.columns if c not in keys]
        total = None
        for c in value_cols:
            term = F.coalesce(F.col(c), F.lit(0))
            total = term if total is None else total + term
        out = out.withColumn(total_col, total)
    return out


def concat_agg(
    df: DataFrame,
    key_columns: Sequence[str],
    value_col: str,
    sep: str = ";",
    out_col: str | None = None,
    distinct: bool = True,
    sort: bool = True,
) -> DataFrame:
    """Per-group string-concatenated values (';'.join analog).

    Reference A12: experiment_metadata_updator.py:33-37.  Sorted by
    default so output is deterministic across partitionings.
    """
    out = out_col or f"{value_col}_list"
    coll = F.collect_set(value_col) if distinct else F.collect_list(value_col)
    if sort:
        coll = F.sort_array(coll)
    return df.groupBy(*key_columns).agg(F.array_join(coll, sep).alias(out))


def group_pass_fail(
    df: DataFrame,
    group_cols: Sequence[str],
    pass_condition,
    sample_col: str,
) -> DataFrame:
    """Per-group pass/fail counts + sorted list of failing members.

    Reference A6: per project count samples whose total reads meet the
    expectation, plus the failed-sample list
    (project_pooling_info.py:78-121).
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.when(pass_condition, F.lit(1))).alias("pass_count"),
        F.count(F.when(~pass_condition, F.lit(1))).alias("fail_count"),
        F.array_join(
            F.sort_array(F.collect_set(F.when(~pass_condition, F.col(sample_col)))),
            ";",
        ).alias("failed_list"),
    )


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Per-column data profile: row count, null count, distinct count.

    The data-quality primitive behind the reference's per-table sanity
    checks (metadata_validation.py's required/duplicate scans): one
    branch per column, each a column-PRUNED scan feeding a two-phase
    COUNT / COUNT(col) / COUNT(DISTINCT col) aggregate, unioned into
    tidy rows.  All branches run in one job.

    Why not one pass with N distinct aggregates: Catalyst plans that
    as a single Expand — every full-width row is replicated N+1 times
    through the shuffle (measured 8x slower at bench scale, and at
    100 TB the Expand shuffles N× the table while the union shape
    shuffles only N tiny partial-aggregate states and reads each
    column exactly once from columnar storage).
    """
    cols = list(columns) if columns else list(df.columns)
    parts = [
        df.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
