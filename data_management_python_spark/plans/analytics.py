"""Warehouse-analytics queries: profiling, distribution statistics,
outlier gating, correlation, and event attribution.

Beyond-reference additions (the reference's closest analogs are the
single-node Pandas sanity scans in
igf_data/process/metadata/metadata_validation.py and the static
project-report rollups in igf_portal/metadata_utils.py) re-expressed
as one-pass distributed aggregates:

- profiling = one multi-aggregate job + stack unpivot,
- equi-depth deciles = two-pass global rank (operators/ranking.py)
  instead of a SinglePartition NTILE window,
- IQR fences = per-group exact percentiles broadcast back onto the
  stream,
- correlation = co-moment aggregates (corr/stddev) with map-side
  partials,
- last-touch attribution = the running last(ignorenulls) carry that
  also powers the as-of join (operators/temporal.py), keyed per user.

Determinism: ratios rounded at the final projection only; every
window that feeds row-level output orders by a unique key suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_management_python_spark.catalog import load_table
from data_management_python_spark.functions import epoch_us
from data_management_python_spark.operators.aggregates import profile_columns
from data_management_python_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
)
from data_management_python_spark.plans import Query

QUERIES: list[Query] = []


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, fn=fn, oracle=oracle, doc=doc))
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,"
    f" COUNT(*) - COUNT({c}) AS n_nulls,"
    f" COUNT(DISTINCT {c}) AS n_distinct FROM lineitem"
    for c in _LINEITEM_COLS
)


@_q(
    "a_profile_table",
    _PROFILE_ORACLE,
    doc="full-table column profile (rows/nulls/distincts per column) in "
    "ONE multi-aggregate pass + stack unpivot — the data-quality scan "
    "the reference runs column-by-column in Pandas "
    "(metadata_validation.py), planned as a single Expand + two-phase "
    "HashAggregate instead of N table scans",
)
def a_profile_table(spark, sf_dir):
    return profile_columns(
        T(spark, sf_dir, "lineitem"), _LINEITEM_COLS
    )


@_q(
    "a_decile_histogram",
    """
    SELECT bucket, COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    ) GROUP BY bucket
    """,
    doc="equi-depth decile histogram of order value — NTILE semantics "
    "computed from a two-pass distributed global rank "
    "(operators/ranking.py: range partition + offset fold) instead of "
    "the SinglePartition NTILE window; buckets match SQL NTILE exactly "
    "via the closed-form big/small bucket split",
)
def a_decile_histogram(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n = o.count()  # scalar aggregate; drives the closed-form bucket math
    ranked = global_row_number(o, ["o_totalprice", "o_orderkey"], "rn")
    return (
        ranked.withColumn("bucket", ntile_from_rank("rn", n, 10))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@_q(
    "a_iqr_outliers",
    """
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (
             WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
           ) AS n_outliers,
           ROUND(MIN(q.q1), 6) AS q1,
           ROUND(MIN(q.q3), 6) AS q3
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    doc="IQR outlier gate per event type: exact per-group quartiles "
    "(one aggregate over a handful of groups), fences broadcast back "
    "onto the event stream, outliers counted in a second hash "
    "aggregate — the Tukey-fence data-quality filter with no sort of "
    "the fact table",
)
def a_iqr_outliers(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.min("q1"), 6).alias("q1"),
            F.round(F.min("q3"), 6).alias("q3"),
        )
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]

_CORR_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{x}' AS col_x, '{y}' AS col_y,"
    f" ROUND(corr({x}, {y}), 6) AS pearson_r FROM lineitem"
    for x, y in _CORR_PAIRS
)


@_q(
    "a_corr_matrix",
    _CORR_ORACLE,
    doc="pairwise Pearson correlation matrix over the lineitem measures "
    "— all six co-moment aggregates in one scan (map-side partials, "
    "one 1-row shuffle), unpivoted to tidy (col_x, col_y, r) rows; "
    "correlation is scale-free so 6-decimal rounding is "
    "accumulation-order-safe cross-engine",
)
def a_corr_matrix(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    aggs = [
        F.round(F.corr(x, y), 6).alias(f"r_{i}")
        for i, (x, y) in enumerate(_CORR_PAIRS)
    ]
    row = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{x}', '{y}', r_{i}" for i, (x, y) in enumerate(_CORR_PAIRS)
    )
    return row.selectExpr(
        f"stack({len(_CORR_PAIRS)}, {stack_args}) as (col_x, col_y, pearson_r)"
    )


@_q(
    "w_percent_rank_cume",
    """
    SELECT event_id, event_type,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value)
    """,
    doc="distribution-position windows (percent_rank + cume_dist) per "
    "event type — both are peer-group functions, so row output is "
    "deterministic under value ties without a synthetic tie-break; "
    "partitioned by type, no global sort",
)
def w_percent_rank_cume(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy("value")
    return T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@_q(
    "e_attribution",
    """
    SELECT user_id, event_id AS purchase_id, click_id,
           epoch_us(ts) - epoch_us(click_ts) AS us_since_click
    FROM (
      SELECT user_id, event_id, ts, event_type,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS click_id,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER w AS click_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ) WHERE event_type = 'purchase'
    """,
    doc="last-touch attribution: each purchase attributed to the user's "
    "most recent strictly-prior click via a running last(ignorenulls) "
    "carry — the same single-shuffle merge-scan shape as the as-of "
    "join (operators/temporal.py), keyed per user, never a "
    "purchase×click self-join",
)
def e_attribution(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
    )
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "click_id",
        (epoch_us("ts") - epoch_us("click_ts")).alias("us_since_click"),
    )
