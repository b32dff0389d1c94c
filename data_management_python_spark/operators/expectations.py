"""Declarative data-quality expectations over a DataFrame — the
Deequ/Great-Expectations-shaped layer a lakehouse runs before
publishing a table.

The reference hand-rolls the same checks imperatively per file type
(igf_data/process/metadata/metadata_validation.py row loops;
igf_data/utils/validation_check/metadata_validation.py column scans);
here they are ONE declarative rule list compiled into a single
conditional-aggregate pass:

- every ROW-level rule (not-null ratio, range, regex, accepted
  values) becomes one ``avg(when(...))`` column in a shared ``agg`` —
  the table is scanned ONCE regardless of rule count, with map-side
  partials (the 100 TB shape: rule count never multiplies scans);
- UNIQUENESS rules add ``count_distinct`` columns to the same agg;
- REFERENTIAL rules (foreign key into a parent table) are the only
  ones that need a second input, and run as a left-anti count against
  the parent's key projection (AQE broadcasts small parents).

Output: one row per rule —
``(rule, column, metric, threshold, passed)`` — metric rounded to 6
so the report is engine-stable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule.

    ``kind``: not_null | unique | between | matches | accepted_values
    | fk.  ``threshold``: minimum satisfying ratio in [0, 1] (1.0 =
    every row).  ``params``: kind-specific (lo/hi, pattern, values,
    parent DataFrame + key).
    """

    name: str
    kind: str
    column: str
    threshold: float = 1.0
    params: dict = field(default_factory=dict)


def rule_condition(exp: Expectation) -> Column:
    """The row-local satisfying condition for one rule — THE single
    definition both the batch metric (:func:`evaluate`) and the
    streaming violation flag (streaming.expectations) compile from,
    so batch and stream can never measure a rule differently.
    Raises for kinds that need cross-row state (unique, fk)."""
    c = F.col(exp.column)
    if exp.kind == "not_null":
        return c.isNotNull()
    if exp.kind == "between":
        return c.isNotNull() & (c >= F.lit(exp.params["lo"])) & (
            c <= F.lit(exp.params["hi"])
        )
    if exp.kind == "matches":
        return c.isNotNull() & c.rlike(exp.params["pattern"])
    if exp.kind == "accepted_values":
        return c.isNotNull() & c.isin(list(exp.params["values"]))
    raise ValueError(
        f"kind {exp.kind!r} is not row-local (unique/fk need cross-row "
        "state)"
    )


def _row_metric(exp: Expectation) -> Column:
    # avg over 0/1 = satisfying ratio; empty input -> NULL, coalesced
    # to 1.0 (an empty table violates nothing)
    return F.coalesce(
        F.avg(rule_condition(exp).cast("double")), F.lit(1.0)
    ).alias(f"__m_{exp.name}")


REPORT_COLS = ["rule", "column", "metric", "threshold", "passed"]


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all rules; returns the (rule, column, metric,
    threshold, passed) report, one row per rule, in rule order.

    One aggregate job covers every row-level + uniqueness rule PLUS
    every fk rule's child-row count (``count(col)`` is the non-null
    child count — it rides the same single scan); each ``fk`` rule
    then adds only its semi-join match count.  All per-rule-group
    frames are one row, so they crossJoin into a single row and every
    report row explodes from ONE array — no union branch ever
    re-plans the child scan (r12; the previous shape re-planned the
    child once per fk aggregate and once per union leg).  ``passed``
    compares the ROUNDED metric against the threshold so both engines
    classify identically at the boundary.
    """
    aggs: list[Column] = []
    row_rules: list[Expectation] = []
    fk_rules: list[Expectation] = []
    for exp in expectations:
        if exp.kind == "fk":
            # the child-row denominator rides the shared wide scan:
            # count(col) == rows with a non-null fk value
            aggs.append(
                F.count(F.col(exp.column)).alias(f"__n_fk_{exp.name}")
            )
            fk_rules.append(exp)
        elif exp.kind == "unique":
            aggs.append(
                F.count_distinct(F.col(exp.column)).alias(f"__d_{exp.name}")
            )
            aggs.append(F.count(F.col(exp.column)).alias(f"__n_{exp.name}"))
            row_rules.append(exp)
        else:
            aggs.append(_row_metric(exp))
            row_rules.append(exp)

    spark = df.sparkSession
    one_row_frames: list[DataFrame] = []
    report_cols: list[Column] = []
    if aggs:
        one_row_frames.append(df.agg(*aggs))
        for exp in row_rules:
            if exp.kind == "unique":
                metric = F.round(
                    F.when(F.col(f"__n_{exp.name}") == 0, F.lit(1.0)).otherwise(
                        F.col(f"__d_{exp.name}").cast("double")
                        / F.col(f"__n_{exp.name}")
                    ),
                    6,
                )
            else:
                metric = F.round(F.col(f"__m_{exp.name}"), 6)
            report_cols.append(
                F.struct(
                    F.lit(exp.name).alias("rule"),
                    F.lit(exp.column).alias("column"),
                    metric.alias("metric"),
                    F.lit(float(exp.threshold)).alias("threshold"),
                    (metric >= F.lit(float(exp.threshold))).alias("passed"),
                )
            )

    for exp in fk_rules:
        parent: DataFrame = exp.params["parent"]
        parent_key: str = exp.params["parent_key"]
        child = df.select(F.col(exp.column).alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        matched = child.join(
            parent.select(F.col(parent_key).alias("__k")),
            on="__k",
            how="left_semi",
        )
        one_row_frames.append(
            matched.agg(F.count(F.lit(1)).alias(f"__ok_fk_{exp.name}"))
        )
        metric = F.round(
            F.when(F.col(f"__n_fk_{exp.name}") == 0, F.lit(1.0)).otherwise(
                F.col(f"__ok_fk_{exp.name}").cast("double")
                / F.col(f"__n_fk_{exp.name}")
            ),
            6,
        )
        report_cols.append(
            F.struct(
                F.lit(exp.name).alias("rule"),
                F.lit(exp.column).alias("column"),
                metric.alias("metric"),
                F.lit(float(exp.threshold)).alias("threshold"),
                (metric >= F.lit(float(exp.threshold))).alias("passed"),
            )
        )

    if not one_row_frames:
        return spark.createDataFrame(
            [], "rule string, column string, metric double, "
            "threshold double, passed boolean"
        )
    combined = one_row_frames[0]
    for p in one_row_frames[1:]:
        combined = combined.crossJoin(p)
    return combined.select(
        F.explode(F.array(*report_cols)).alias("r")
    ).select("r.*")
