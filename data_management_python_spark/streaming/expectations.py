"""Streaming data-quality monitor — the continuous counterpart of
``operators.expectations`` for event streams.

Two shapes:

  - :func:`stream_expectation_report`: per-micro-batch rule report via
    ``foreachBatch`` — each batch runs the SAME compiled
    single-scan conditional aggregate as the batch engine
    (``operators.expectations.evaluate``), so batch and stream
    measure rules identically (batch-parity by construction), and
    appends ``(batch_id, rule, column, metric, threshold, passed)``
    rows to a sink the caller provides.
  - :func:`windowed_violation_counts`: a pure streaming aggregation —
    tumbling event-time windows counting violating rows per rule,
    watermarked so state is bounded by the lateness horizon.  This is
    the alerting feed (violations/minute), while the report above is
    the audit artifact.

Scale notes: both shapes keep rule evaluation ROW-LOCAL (a boolean
column per rule) and aggregate map-side; rule count widens the
projection, never adds passes or shuffles.  State for the windowed
form is O(windows x rules), independent of stream volume.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_python_spark.operators.expectations import (
    Expectation,
    evaluate,
)


def stream_expectation_report(
    stream: DataFrame,
    expectations: list[Expectation],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "expectation_report",
):
    """Run the declarative rule list on every micro-batch and hand the
    per-batch report (with a ``batch_id`` column) to ``sink``.

    ``foreachBatch`` is the right integration point because the rule
    metrics are BATCH-scoped aggregates (satisfying ratio of the rows
    that just arrived), not running totals — a continuous aggregation
    would conflate batches, and re-using :func:`evaluate` verbatim
    guarantees the stream measures exactly what the batch gate
    measures (tests assert this parity).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        report = evaluate(batch_df, expectations).withColumn(
            "batch_id", F.lit(batch_id)
        )
        sink(report, batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def _violation_flag(exp: Expectation) -> F.Column:
    """1 when the row violates the rule — compiled from the SAME
    rule_condition the batch engine uses (parity by shared code); the
    helper raises for non-row-local kinds (unique/fk) — use
    stream_expectation_report or the batch engine for those."""
    from data_management_python_spark.operators.expectations import (  # noqa: PLC0415
        rule_condition,
    )

    return (~rule_condition(exp)).cast("long")


def windowed_drift_psi(
    stream: DataFrame,
    baseline_probs: list[float],
    lo: float,
    hi: float,
    value_col: str,
    event_time_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    epsilon: float = 1e-6,
) -> DataFrame:
    """Per-window population-stability-index against a FROZEN baseline
    distribution — the streaming counterpart of the batch v_drift_psi
    query (plans/analytics.py): the baseline's bin probabilities and
    grid bounds are computed once offline (e.g. from yesterday's
    partition) and ride along as literals, so the stream side is one
    watermarked windowed count per bin and a row-local PSI fold.

    Emits (window_start, window_end, n_rows, psi) per closed window —
    alert when psi crosses 0.1/0.25.  State is O(open windows x bins);
    bins outside [lo, hi] clamp into the edge bins via the SHARED
    fixed-width rule (operators.layout.fixed_width_bin, clamp_low=True
    — frozen baseline bounds, unlike the batch min/max).  NULL values
    carry no distribution information and are EXCLUDED (from n_rows
    too) rather than silently landing in an edge bin.
    """
    from data_management_python_spark.operators.layout import (  # noqa: PLC0415
        fixed_width_bin,
    )

    if not hi > lo:
        raise ValueError(f"baseline bounds must satisfy hi > lo, got "
                         f"[{lo}, {hi}]")
    nbins = len(baseline_probs)
    c = F.col(value_col)
    bin_col = fixed_width_bin(
        c, F.lit(lo), F.lit(hi), nbins, clamp_low=True
    )
    binned = (
        stream.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp_ltz")
        )
        .withWatermark(event_time_col, watermark)
        .filter(c.isNotNull())
        .select(event_time_col, bin_col.alias("__bin"))
    )
    counts = binned.groupBy(
        F.window(event_time_col, window).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(
                F.when(F.col("__bin") == b, 1).otherwise(0)
            ).alias(f"__b{b}")
            for b in range(nbins)
        ],
    )
    psi = None
    for b, p_base in enumerate(baseline_probs):
        p_cur = F.greatest(
            F.col(f"__b{b}") / F.col("n_rows"), F.lit(epsilon)
        )
        pb = max(p_base, epsilon)
        term = (p_cur - F.lit(pb)) * F.log(p_cur / F.lit(pb))
        psi = term if psi is None else psi + term
    return counts.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_rows",
        F.round(psi, 6).alias("psi"),
    )


def windowed_violation_counts(
    stream: DataFrame,
    expectations: list[Expectation],
    event_time_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window violation counts per rule — the alerting feed.

    Row-local rules only (see :func:`_violation_flag`).  One boolean
    projection per rule feeds a single windowed aggregate: state is
    O(open windows x rules) and the watermark closes windows, so the
    operator runs forever on unbounded input.  Returns a streaming
    DataFrame of (window_start, window_end, rule, n_rows,
    n_violations).
    """
    # watermarks reject TIMESTAMP_NTZ; with the session timezone pinned
    # UTC the ltz cast is value-preserving (same rule as functions.epoch_us)
    flags = (
        stream.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp_ltz")
        )
        .withWatermark(event_time_col, watermark)
        .select(
            event_time_col,
            *[
                _violation_flag(exp).alias(f"__v_{exp.name}")
                for exp in expectations
            ],
        )
    )
    agg = flags.groupBy(
        F.window(event_time_col, window).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(f"__v_{exp.name}").alias(f"__s_{exp.name}")
            for exp in expectations
        ],
    )
    per_rule = F.array(
        *[
            F.struct(
                F.lit(exp.name).alias("rule"),
                F.col(f"__s_{exp.name}").alias("n_violations"),
            )
            for exp in expectations
        ]
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_rows",
        F.explode(per_rule).alias("r"),
    ).select(
        "window_start", "window_end", "r.rule", "n_rows", "r.n_violations"
    )
