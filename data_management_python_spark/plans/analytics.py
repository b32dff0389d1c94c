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
    multi_ntile,
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
    doc="full-table column profile (rows/nulls/distincts per column) — "
    "the data-quality scan the reference runs column-by-column in "
    "Pandas (metadata_validation.py), planned as one job of "
    "column-pruned union branches (each a two-phase distinct "
    "aggregate); measured 8x faster than the N-distinct Expand shape, "
    "whose shuffle is N x the table at scale",
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


@_q(
    "a_abc_classification",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100, 0)
                  AS BIGINT) AS rc
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rc) AS t FROM rev),
    c AS (
      SELECT l_partkey, rc,
             SUM(rc) OVER (ORDER BY rc DESC, l_partkey) AS cum
      FROM rev
    )
    SELECT CASE WHEN cum * 100 <= t * 80 THEN 'A'
                WHEN cum * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rc) AS BIGINT) AS class_revenue_cents
    FROM c, tot GROUP BY 1
    """,
    doc="Pareto/ABC inventory classification: per-part revenue in exact "
    "integer cents, globally-ordered cumulative share WITHOUT a "
    "SinglePartition window — operators.ranking.ordered_prefix_sum "
    "computes the running total in one range shuffle (per-slice local "
    "cumsum + O(partitions) base offsets); integer cum*100 <= total*80 "
    "comparisons make class cuts bit-exact cross-engine",
)
def a_abc_classification(spark, sf_dir):
    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    li = T(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 100,
                0,
            )
            .cast("long")
            .alias("rc")
        )
    )
    # the per-part aggregate feeds the prefix-sum partials, the total,
    # and the final plan — pin it once; it is part-count-sized, tiny
    # relative to the fact scan it condenses
    rev = rev.localCheckpoint(eager=True)
    # ordered_prefix_sum fuses the old rank + rank-binned-cumsum pair
    # of passes into one range shuffle (half the jobs, same result)
    cum = ordered_prefix_sum(
        rev.withColumn("__neg", -F.col("rc")),
        ["__neg", "l_partkey"],
        "rc",
        "cum",
        inclusive=True,
    ).drop("__neg")
    total = rev.agg(F.sum("rc").alias("__t"))  # 1 row; joins in-plan
    cls = (
        F.when(F.col("cum") * 100 <= F.col("__t") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("__t") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .withColumn("abc_class", cls)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rc").alias("class_revenue_cents"),
        )
    )


@_q(
    "e_gap_fill",
    """
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             ROUND(AVG(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    u AS (SELECT DISTINCT user_id FROM d),
    spine AS (
      SELECT u.user_id, CAST(g.day AS DATE) AS day
      FROM u, b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g(day)
    ),
    f AS (
      SELECT s.user_id, s.day, d.v,
             LAST_VALUE(d.v IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day) AS filled
      FROM spine s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day
    )
    SELECT user_id, day, filled, v IS NULL AS was_filled
    FROM f WHERE filled IS NOT NULL
    """,
    doc="time-series gap fill: daily per-user averages joined onto a "
    "generated calendar spine (sequence+explode — no driver loop), "
    "missing days forward-filled with the running last(ignorenulls) "
    "carry; leading days before a user's first observation stay absent "
    "— the resampling primitive behind feature tables and SCD-style "
    "snapshots",
)
def e_gap_fill(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).first()  # 2 scalars; the spine's date range
    users = daily.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(bounds["lo"]), F.lit(bounds["hi"]),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("filled"),
        F.col("v").isNull().alias("was_filled"),
    )
    return filled.filter(F.col("filled").isNotNull())


@_q(
    "w_ratio_to_report",
    """
    SELECT event_id, event_type,
           ROUND(value / SUM(value) OVER (PARTITION BY event_type), 6)
               AS share
    FROM events
    """,
    doc="ratio-to-report: each event's share of its type's total via a "
    "partition-total window — whole-partition frame, no ordering, so "
    "ties are irrelevant; partitioned by type, never a global window",
)
def w_ratio_to_report(spark, sf_dir):
    w = Window.partitionBy("event_type")
    return T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") / F.sum("value").over(w), 6).alias("share"),
    )


@_q(
    "w_range_rolling_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id
             ORDER BY epoch_ms(ts)
             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_10m
    FROM events
    """,
    doc="time-based RANGE frame: each event's trailing-10-minute spend "
    "per user — the frame is bounded by the ORDER BY *value* (epoch "
    "milliseconds), not a row count, so simultaneous events share one "
    "frame and sparse gaps shrink it to the current row.  Summed in "
    "integer cents (value is cent-exact in the testdata) so the "
    "windowed sum is engine-exact with no rounding; partitioned per "
    "user, never a global window",
)
def w_range_rolling_sum(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms

    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_ms("ts"))
        .rangeBetween(-600000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("cents_10m"),
    )


@_q(
    "a_exact_median",
    """
    SELECT c_mktsegment,
           ROUND(median(c_acctbal), 4) AS median_bal,
           ROUND(quantile_cont(c_acctbal, 0.25), 4) AS q1_bal,
           ROUND(quantile_cont(c_acctbal, 0.75), 4) AS q3_bal,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="exact grouped median + quartiles (percentile_cont linear "
    "interpolation, identical definition in both engines: index "
    "(n-1)*p, interpolate between floor/ceil neighbors) — the exact "
    "counterpart to the approx_percentile sketch in a_sketch_accuracy. "
    "Exact percentiles buffer each group's values; grouped by segment "
    "the state is per-group bounded, and the sketch variant is the "
    "documented 100 TB path",
)
def a_exact_median(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 4).alias("median_bal"),
            F.round(F.percentile("c_acctbal", 0.25), 4).alias("q1_bal"),
            F.round(F.percentile("c_acctbal", 0.75), 4).alias("q3_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "e_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM cnt
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: LAG pairs each event with its predecessor (one "
    "user-keyed shuffle), integer bigram counts, then row-normalized "
    "probabilities via a whole-partition window over the TINY "
    "(types x types) count table — the heavy data never sees the "
    "normalizing window",
)
def e_markov_transitions(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"),
    )


@_q(
    "a_rollup_revenue",
    """
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="hierarchical subtotals via ROLLUP(region, nation): detail rows "
    "+ per-region subtotal + grand total in ONE pass (Spark's Expand "
    "operator replicates each row once per grouping level BEFORE the "
    "hash agg, so partial aggregation still applies — no re-scan per "
    "level). Grouping-level NULLs are labeled 'ALL' (no NULL keys in "
    "the dims, so the label is unambiguous)",
)
def a_rollup_revenue(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = T(spark, sf_dir, "region")
    dims = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(dims, c.c_nationkey == F.col("n_nationkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


@_q(
    "a_cube_counts",
    """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    doc="full cross-tabulation via CUBE(priority, status): all four "
    "grouping levels (detail, each margin, grand total) from one scan "
    "through the Expand operator — the multi-margin report shape that "
    "would otherwise be four scans UNION ALLed; counts are integers, "
    "engine-exact",
)
def a_cube_counts(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


@_q(
    "e_ohlc_resample",
    """
    SELECT user_id,
           CAST(FLOOR(epoch_ms(ts) / 300000) AS BIGINT) AS bucket_5m,
           arg_min(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id, bucket_5m
    """,
    doc="time-series downsampling to 5-minute OHLC bars per user — the "
    "resample primitive for event streams.  open/close are "
    "first/last-by-time via min_by/max_by on a zero-padded "
    "(epoch_ms, event_id) string key: totally ordered, unique, and "
    "identical lexicographic comparison in both engines, so bar edges "
    "are deterministic even with simultaneous events.  One hash agg "
    "keyed (user, bucket); no window, no sort",
)
def e_ohlc_resample(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms

    ev = T(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(epoch_ms("ts").cast("string"), 15, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            "user_id",
            F.floor(epoch_ms("ts") / 300000).cast("bigint").alias("bucket_5m"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@_q(
    "u_except_intersect_all",
    """
    WITH hi AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 25),
    lo AS (SELECT l_partkey FROM lineitem WHERE l_quantity < 25),
    ea AS (SELECT l_partkey, 'except_all' AS op FROM
           (SELECT l_partkey FROM hi EXCEPT ALL SELECT l_partkey FROM lo)),
    ia AS (SELECT l_partkey, 'intersect_all' AS op FROM
           (SELECT l_partkey FROM hi INTERSECT ALL SELECT l_partkey FROM lo))
    SELECT op, l_partkey, COUNT(*) AS n
    FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia)
    GROUP BY op, l_partkey
    """,
    doc="bag-semantics set ops (EXCEPT ALL / INTERSECT ALL): duplicate "
    "multiplicities subtract / take-the-min instead of vanishing — "
    "Spark plans both as an aggregate of per-side counts, one shuffle "
    "each, no distinct pre-pass; tallied per key so the multiplicity "
    "arithmetic itself is what the oracle checks",
)
def u_except_intersect_all(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") >= 25).select("l_partkey")
    lo = li.filter(F.col("l_quantity") < 25).select("l_partkey")
    ea = hi.exceptAll(lo).withColumn("op", F.lit("except_all"))
    ia = hi.intersectAll(lo).withColumn("op", F.lit("intersect_all"))
    return (
        ea.unionByName(ia)
        .groupBy("op", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "w_first_last_nth",
    """
    SELECT user_id, event_id,
           FIRST_VALUE(value) OVER w AS first_v,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_v,
           NTH_VALUE(value, 3) OVER w AS third_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="navigation window functions (FIRST_VALUE / LAST_VALUE / "
    "NTH_VALUE) over the full per-user frame — session anchor values "
    "stamped onto every event.  The frame is explicitly UNBOUNDED "
    "FOLLOWING on all three: the SQL default frame stops at CURRENT "
    "ROW, which silently turns LAST_VALUE into 'current value' (the "
    "classic trap); ordered by the unique (ts, event_id) pair so "
    "anchors are engine-deterministic",
)
def w_first_last_nth(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
    )


@_q(
    "a_fk_orphan_audit",
    """
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
               AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
             ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
             ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
    """,
    doc="referential-integrity audit across the star schema's four FK "
    "edges: child count + orphan count per edge in one result — the "
    "ingest-gate check a warehouse runs after every load.  Each orphan "
    "count is a left-ANTI join against the parent key set (parents "
    "broadcast when small, AQE otherwise); counts are integers, "
    "engine-exact",
)
def a_fk_orphan_audit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")

    def edge(name, child, key, parent, pkey):
        orphans = child.select(key).join(
            parent.select(pkey), F.col(key) == F.col(pkey), "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("fk_edge"), "n_child", "n_orphans"
            )
        )

    parts = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey",
             T(spark, sf_dir, "part"), "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey",
             T(spark, sf_dir, "supplier"), "s_suppkey"),
        edge("orders->customer", o, "o_custkey",
             T(spark, sf_dir, "customer"), "c_custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# shared with the streaming drift monitor — ONE binning definition
from data_management_python_spark.operators.layout import (  # noqa: E402
    fixed_width_bin,
    fixed_width_bin_sql,
)


@_q(
    "a_value_histogram",
    f"""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT {fixed_width_bin_sql("o_totalprice", "lo", "hi", 20)} AS bin,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS bin_min,
           ROUND(MAX(o_totalprice), 2) AS bin_max
    FROM orders CROSS JOIN b
    GROUP BY 1
    """,
    doc="fixed-width 20-bin value histogram of order totals — the "
    "equal-INTERVAL profiling twin of the equal-COUNT decile histogram "
    "(a_decile_histogram).  Bounds are a 1-row min/max aggregate "
    "broadcast back; the bin expression floor((x-lo)*20/(hi-lo)) is "
    "the identical IEEE arithmetic in both engines, with the top edge "
    "clamped into the last bin.  One scan + one tiny hash agg; never "
    "a sort",
)
def a_value_histogram(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_totalprice")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bin_col = fixed_width_bin(
        F.col("o_totalprice"), F.col("lo"), F.col("hi"), 20
    )
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


@_q(
    "e_longest_streak",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len,
             MIN(day) AS streak_start
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id, len AS longest_streak, streak_start FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, streak_start) AS rk
      FROM streaks
    ) WHERE rk = 1
    """,
    doc="longest consecutive-day activity streak per user — the "
    "gaps-and-islands date variant: distinct active days, day minus "
    "per-user row_number is constant within a consecutive run "
    "(the anchor), one aggregate per run, keep the longest (earliest "
    "start on ties).  All stages keyed by user_id: one shuffle "
    "partitioning serves the distinct, the window, and both "
    "aggregates",
)
def e_longest_streak(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
    )
    wbest = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("len").alias("longest_streak"), "streak_start")
    )


@_q(
    "e_session_stats",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
                 AS duration_us,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           ROUND(AVG(CAST(n_events AS DOUBLE)), 6) AS avg_events,
           CAST(SUM(duration_us) AS BIGINT) AS total_duration_us,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM per_session
    """,
    doc="session-level rollup on top of the gap sessionization: bounce "
    "count (single-event sessions), mean session depth, total dwell "
    "time in exact integer microseconds, and integer-cents spend — "
    "the product-analytics layer above e_sessionize, still one "
    "user-keyed shuffle for the windows and a tiny final aggregate",
)
def e_session_stats(spark, sf_dir):
    from data_management_python_spark.functions import epoch_us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (
                epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
                > 1800 * 1_000_000
            )
            | F.lag("ts").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts")))
        .cast("bigint")
        .alias("duration_us"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        F.round(F.avg(F.col("n_events").cast("double")), 6).alias(
            "avg_events"
        ),
        F.sum("duration_us").cast("bigint").alias("total_duration_us"),
        F.sum("cents").alias("total_cents"),
    )


@_q(
    "e_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS step_order, 'view' AS step, n1 AS n_users,
           CASE WHEN n1 = 0 THEN NULL ELSE CAST(1.0 AS DOUBLE) END
             AS conversion
    FROM n
    UNION ALL
    SELECT 2, 'click', n2,
           CASE WHEN n1 = 0 THEN NULL
                ELSE ROUND(CAST(n2 AS DOUBLE) / n1, 6) END
    FROM n
    UNION ALL
    SELECT 3, 'purchase', n3,
           CASE WHEN n1 = 0 THEN NULL
                ELSE ROUND(CAST(n3 AS DOUBLE) / n1, 6) END
    FROM n
    """,
    doc="ordered conversion funnel view -> click -> purchase: each "
    "step counts users whose FIRST qualifying event strictly follows "
    "their first event of the previous step (min-timestamp cascade, "
    "one per-user aggregate per step on progressively smaller "
    "inputs — never a sort of the event stream or a window over all "
    "events).  The ClickHouse windowFunnel / product-analytics "
    "staple, absent from both Spark and the reference",
)
def e_funnel(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n3"))
    wide = n1.crossJoin(n2).crossJoin(n3)  # three 1-row scalar frames
    conv = lambda c: F.when(  # noqa: E731
        F.col("n1") == 0, F.lit(None).cast("double")
    ).otherwise(F.round(F.col(c).cast("double") / F.col("n1"), 6))
    steps = F.array(
        F.struct(
            F.lit(1).alias("step_order"),
            F.lit("view").alias("step"),
            F.col("n1").alias("n_users"),
            F.when(F.col("n1") == 0, F.lit(None).cast("double"))
            .otherwise(F.lit(1.0))
            .alias("conversion"),
        ),
        F.struct(
            F.lit(2).alias("step_order"),
            F.lit("click").alias("step"),
            F.col("n2").alias("n_users"),
            conv("n2").alias("conversion"),
        ),
        F.struct(
            F.lit(3).alias("step_order"),
            F.lit("purchase").alias("step"),
            F.col("n3").alias("n_users"),
            conv("n3").alias("conversion"),
        ),
    )
    return wide.select(F.explode(steps).alias("s")).select("s.*")


@_q(
    "e_peak_concurrency",
    """
    WITH pts AS (
      SELECT epoch_us(ts) AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT epoch_us(ts) + 300000000, -1, event_id FROM events
    ),
    c AS (
      SELECT t, CAST(SUM(delta) OVER (
               ORDER BY t, delta, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      FROM pts
    )
    SELECT conc AS peak_concurrency, t AS peak_at_us
    FROM c ORDER BY conc DESC, t LIMIT 1
    """,
    doc="sweep-line peak concurrency: each event opens a 5-minute "
    "interval; +1/-1 deltas in global time order, running sum, max.  "
    "The oracle's global ORDER BY window is a SinglePartition sort — "
    "the Spark plan instead runs operators.ranking.ordered_prefix_sum "
    "(range shuffle + O(partitions) driver offsets + per-slice local "
    "cumsum), the same 100x-safe shape as a_abc_classification; ends "
    "sort before starts at the same microsecond (half-open intervals)",
)
def e_peak_concurrency(spark, sf_dir):
    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    ev = T(spark, sf_dir, "events").select(
        epoch_us("ts").alias("t"), "event_id"
    )
    pts = ev.select("t", F.lit(1).alias("delta"), "event_id").unionAll(
        ev.select(
            (F.col("t") + F.lit(300_000_000)).alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    cum = ordered_prefix_sum(pts, ["t", "delta", "event_id"], "delta", "conc")
    return (
        cum.orderBy(F.col("conc").desc(), F.col("t"))
        .limit(1)
        .select(
            F.col("conc").alias("peak_concurrency"),
            F.col("t").alias("peak_at_us"),
        )
    )


@_q(
    "e_decayed_engagement",
    """
    WITH t AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    m AS (SELECT MAX(t) AS mx FROM t)
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(POWER(0.5,
                 FLOOR((mx - t) / 86400000000.0) / 7.0)), 6)
             AS decayed_score
    FROM t CROSS JOIN m GROUP BY user_id
    """,
    doc="exponential time-decay engagement score per user (7-day "
    "half-life, decay anchored at the corpus max timestamp so the "
    "result is deterministic): the recency-weighted activity metric "
    "feature stores serve.  A plain conditional aggregate — decay "
    "weights are row-local once the 1-row max broadcasts back, so the "
    "plan is one scan + one per-user hash agg; age is whole days so "
    "both engines exponentiate identical rationals",
)
def e_decayed_engagement(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("t")
    )
    mx = ev.agg(F.max("t").alias("mx"))
    age_days = F.floor((F.col("mx") - F.col("t")) / F.lit(86400000000.0))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.pow(F.lit(0.5), age_days / F.lit(7.0))), 6
            ).alias("decayed_score"),
        )
    )


@_q(
    "a_skew_profile",
    """
    WITH k AS (
      SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
    )
    SELECT 'l_orderkey' AS key_col,
           COUNT(*) AS n_keys,
           MAX(cnt) AS max_rows_per_key,
           ROUND(AVG(CAST(cnt AS DOUBLE)), 6) AS avg_rows_per_key,
           ROUND(quantile_cont(cnt, 0.90), 6) AS p90,
           ROUND(quantile_cont(cnt, 0.99), 6) AS p99,
           ROUND(MAX(cnt) / AVG(CAST(cnt AS DOUBLE)), 6) AS skew_ratio,
           CAST(CEIL(ROUND(
                MAX(cnt) / GREATEST(quantile_cont(cnt, 0.99), 1.0), 6))
                AS BIGINT) AS recommended_salt
    FROM k
    """,
    doc="join-key skew diagnostic: per-key row counts -> distribution "
    "stats (max, mean, p90/p99 exact percentiles) plus the derived "
    "salt factor (max/p99) a salted-join repair would use "
    "(operators.joins.salted_join).  The planning query you run "
    "BEFORE a 100 TB shuffle join: two hash aggregates, the second "
    "over one row per key; no sort, no window",
)
def a_skew_profile(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_orderkey")
    k = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    return k.agg(
        F.lit("l_orderkey").alias("key_col"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_rows_per_key"),
        F.round(F.avg(F.col("cnt").cast("double")), 6).alias(
            "avg_rows_per_key"
        ),
        F.round(F.expr("percentile(cnt, 0.90)"), 6).alias("p90"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99"),
        F.round(
            F.max("cnt") / F.avg(F.col("cnt").cast("double")), 6
        ).alias("skew_ratio"),
        # round before CEIL: a sub-ulp interpolation divergence at an
        # exact integer ratio must not flip the discrete salt by 1
        F.ceil(
            F.round(
                F.max("cnt")
                / F.greatest(F.expr("percentile(cnt, 0.99)"), F.lit(1.0)),
                6,
            )
        )
        .cast("bigint")
        .alias("recommended_salt"),
    )


_EXPECT_PRIORITIES = (
    "'1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'"
)


@_q(
    "v_expectations",
    f"""
    WITH m AS (
      SELECT
        ROUND(AVG(CASE WHEN o_orderkey IS NOT NULL
                       THEN 1.0 ELSE 0.0 END), 6) AS m_nn,
        ROUND(CASE WHEN COUNT(o_orderkey) = 0 THEN 1.0
                   ELSE CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
                        / COUNT(o_orderkey) END, 6) AS m_uq,
        ROUND(AVG(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice BETWEEN 0 AND 1000000
                       THEN 1.0 ELSE 0.0 END), 6) AS m_rng,
        ROUND(AVG(CASE WHEN o_orderpriority IN ({_EXPECT_PRIORITIES})
                       THEN 1.0 ELSE 0.0 END), 6) AS m_dom,
        ROUND(AVG(CASE WHEN o_orderstatus IS NOT NULL
                        AND regexp_matches(o_orderstatus, '^[OFP]$')
                       THEN 1.0 ELSE 0.0 END), 6) AS m_re
      FROM orders
    ),
    fk AS (
      SELECT ROUND(CASE WHEN COUNT(*) = 0 THEN 1.0
                   ELSE CAST(COUNT(c.c_custkey) AS DOUBLE) / COUNT(*)
                   END, 6) AS m_fk
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL
    )
    SELECT 'orderkey_not_null' AS rule, 'o_orderkey' AS "column",
           m_nn AS metric, CAST(1.0 AS DOUBLE) AS threshold,
           m_nn >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'orderkey_unique', 'o_orderkey', m_uq,
           CAST(1.0 AS DOUBLE), m_uq >= 1.0 FROM m
    UNION ALL
    SELECT 'totalprice_range', 'o_totalprice', m_rng,
           CAST(1.0 AS DOUBLE), m_rng >= 1.0 FROM m
    UNION ALL
    SELECT 'priority_domain', 'o_orderpriority', m_dom,
           CAST(1.0 AS DOUBLE), m_dom >= 1.0 FROM m
    UNION ALL
    SELECT 'status_regex', 'o_orderstatus', m_re,
           CAST(1.0 AS DOUBLE), m_re >= 1.0 FROM m
    UNION ALL
    SELECT 'custkey_fk', 'o_custkey', m_fk,
           CAST(1.0 AS DOUBLE), m_fk >= 1.0 FROM fk
    """,
    doc="declarative data-quality expectations (Deequ/Great-"
    "Expectations shape) compiled into ONE conditional-aggregate scan "
    "regardless of rule count, plus one semi-join count per foreign-"
    "key rule: not-null / uniqueness / range / accepted-values / "
    "regex over orders and FK integrity into customer "
    "(operators.expectations.evaluate).  The reference hand-rolls "
    "the same checks per file type in row loops "
    "(igf_data/process/metadata/metadata_validation.py)",
)
def v_expectations(spark, sf_dir):
    from data_management_python_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    rules = [
        Expectation("orderkey_not_null", "not_null", "o_orderkey"),
        Expectation("orderkey_unique", "unique", "o_orderkey"),
        Expectation(
            "totalprice_range", "between", "o_totalprice",
            params={"lo": 0, "hi": 1_000_000},
        ),
        Expectation(
            "priority_domain", "accepted_values", "o_orderpriority",
            params={"values": [
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                "5-LOW",
            ]},
        ),
        Expectation(
            "status_regex", "matches", "o_orderstatus",
            params={"pattern": "^[OFP]$"},
        ),
        Expectation(
            "custkey_fk", "fk", "o_custkey",
            params={"parent": c, "parent_key": "c_custkey"},
        ),
    ]
    return evaluate(o, rules)


def _zorder_oracle() -> str:
    from data_management_python_spark.operators.layout import zorder_sql_expr

    zx = zorder_sql_expr(["x", "y"], 16)
    scale = (
        "CASE WHEN {hi} = {lo} THEN 0 ELSE LEAST(CAST(FLOOR("
        "(CAST({c} AS DOUBLE) - {lo}) / ({hi} - {lo}) * 65535.0"
        ") AS BIGINT), 65535) END"
    )
    sx = scale.format(c="l_orderkey", lo="lo1", hi="hi1")
    sy = scale.format(c="l_partkey", lo="lo2", hi="hi2")
    return f"""
    WITH b AS (
      SELECT CAST(MIN(l_orderkey) AS DOUBLE) AS lo1,
             CAST(MAX(l_orderkey) AS DOUBLE) AS hi1,
             CAST(MIN(l_partkey) AS DOUBLE) AS lo2,
             CAST(MAX(l_partkey) AS DOUBLE) AS hi2
      FROM lineitem
    ),
    s AS (
      SELECT {sx} AS x, {sy} AS y
      FROM lineitem CROSS JOIN b
    ),
    z AS (SELECT x, y, ({zx}) AS zv FROM s)
    SELECT zv >> 22 AS cell, COUNT(*) AS n_rows,
           MIN(x) AS min_gx, MAX(x) AS max_gx,
           MIN(y) AS min_gy, MAX(y) AS max_gy
    FROM z GROUP BY 1
    """


@_q(
    "a_zorder_cells",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering cells over (l_orderkey, "
    "l_partkey): both keys min-max scaled to a 16-bit grid, bits "
    "interleaved into one locality-preserving value, top 10 bits = "
    "the cell the zordered writer (sources.sinks.write_zorder_dataset) "
    "would group into a file.  Per-cell "
    "min/max of BOTH grid coordinates demonstrate the point of the "
    "layout: every cell is tight in x AND y, so a reader filtering "
    "on either column prunes most files from footer stats.  Pure "
    "shift/mask codegen arithmetic — the bit formula is generated "
    "from one Python loop for both engines (layout.zorder_sql_expr)",
)
def a_zorder_cells(spark, sf_dir):
    from data_management_python_spark.operators.layout import (
        interleave_bits,
        scale_to_grid,
    )

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bounds = li.agg(
        F.min("l_orderkey").cast("double").alias("lo1"),
        F.max("l_orderkey").cast("double").alias("hi1"),
        F.min("l_partkey").cast("double").alias("lo2"),
        F.max("l_partkey").cast("double").alias("hi2"),
    )
    withb = li.crossJoin(F.broadcast(bounds))
    gx = scale_to_grid(F.col("l_orderkey"), F.col("lo1"), F.col("hi1"), 16)
    gy = scale_to_grid(F.col("l_partkey"), F.col("lo2"), F.col("hi2"), 16)
    zv = interleave_bits([gx, gy], 16)
    return (
        withb.select(
            F.shiftright(zv, 22).alias("cell"),
            gx.alias("x"),
            gy.alias("y"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_gx"),
            F.max("x").alias("max_gx"),
            F.min("y").alias("min_gy"),
            F.max("y").alias("max_gy"),
        )
    )


@_q(
    "v_drift_psi",
    f"""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    ),
    x AS (
      SELECT o_orderkey % 2 AS side,
             {fixed_width_bin_sql("o_totalprice", "lo", "hi", 10)} AS bin
      FROM orders CROSS JOIN b
    ),
    c AS (
      SELECT bin,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_base,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM x GROUP BY bin
    ),
    t AS (
      SELECT CAST(SUM(n_base) AS DOUBLE) AS tb,
             CAST(SUM(n_cur) AS DOUBLE) AS tc
      FROM c
    )
    SELECT bin, n_base, n_cur,
           ROUND(pb, 6) AS p_base, ROUND(pc, 6) AS p_cur,
           ROUND((pc - pb) * LN(pc / pb), 8) AS psi_term
    FROM (
      SELECT bin, n_base, n_cur,
             GREATEST(n_base / tb, 0.000001) AS pb,
             GREATEST(n_cur / tc, 0.000001) AS pc
      FROM c CROSS JOIN t
    )
    """,
    doc="population-stability-index drift report: the baseline/current "
    "split (even/odd order keys stand in for yesterday/today "
    "partitions) is binned on ONE shared fixed-width grid and each "
    "bin contributes (p_cur - p_base) * ln(p_cur/p_base); the sum is "
    "the PSI the monitoring alert thresholds on (0.1 drifting / 0.25 "
    "drifted).  One scan + one 10-row aggregate + a 1-row total "
    "broadcast — the model-input drift check every feature pipeline "
    "schedules, epsilon-floored so empty bins stay finite",
)
def v_drift_psi(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bin_col = fixed_width_bin(
        F.col("o_totalprice"), F.col("lo"), F.col("hi"), 10
    )
    c = (
        o.crossJoin(F.broadcast(b))
        .select((F.col("o_orderkey") % 2).alias("side"), bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n_base"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_cur"),
        )
    )
    t = c.agg(
        F.sum("n_base").cast("double").alias("tb"),
        F.sum("n_cur").cast("double").alias("tc"),
    )
    pb = F.greatest(F.col("n_base") / F.col("tb"), F.lit(0.000001))
    pc = F.greatest(F.col("n_cur") / F.col("tc"), F.lit(0.000001))
    return c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_base",
        "n_cur",
        F.round(pb, 6).alias("p_base"),
        F.round(pc, 6).alias("p_cur"),
        F.round((pc - pb) * F.log(pc / pb), 8).alias("psi_term"),
    )


@_q(
    "e_top_paths",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    ), ranked AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM sessions
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5
      GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
    doc="top user journeys: the first five event types of every "
    "session (gap sessionization, same flag+cumsum as e_sessionize) "
    "concatenated into a path string, counted, top-15.  All stages "
    "before the final tiny path aggregate share ONE user_id "
    "partitioning — the windows, the per-session truncation, and the "
    "per-session concat never reshuffle; the path-frequency table is "
    "bounded by event-type-arity^5 regardless of corpus size",
)
def e_top_paths(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (
                epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
                > 1800 * 1_000_000
            )
            | F.lag("ts").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    ranked = sessions.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= 5
    )
    paths = ranked.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@_q(
    "e_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             quantile_cont(ABS(e.value - med.m), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN mad.mad > 0
                          AND ROUND(0.6745 * ABS(e.value - med.m) / mad.mad, 6)
                              > 3.500001
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(MIN(med.m), 6) AS median_value,
           ROUND(MIN(mad.mad), 6) AS mad
    FROM events e
    JOIN med USING (event_type)
    JOIN mad USING (event_type)
    GROUP BY e.event_type
    """,
    doc="robust anomaly gate per event type: median absolute deviation "
    "-> modified z-score 0.6745*|x-med|/MAD > 3.5 (Iglewicz-Hoaglin), "
    "the outlier rule that, unlike the IQR fence (a_iqr_outliers) or "
    "stddev z-scores, is not itself dragged by the outliers it hunts.  "
    "Two grouped exact-percentile aggregates over a handful of groups, "
    "fences broadcast back, one counting pass — no sort of the fact "
    "stream.  The score is ROUNDED before the 3.5 fence with a "
    "half-grid epsilon so an exactly-on-fence value classifies "
    "identically in both engines",
)
def e_anomaly_mad(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(ABS(value - m), 0.5)").alias("mad"))
    )
    score = F.round(
        0.6745 * F.abs(F.col("value") - F.col("m")) / F.col("mad"), 6
    )
    is_anom = (F.col("mad") > 0) & (score > F.lit(3.500001))
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.min("m"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
    )


@_q(
    "a_benford_check",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM counts)
    SELECT d AS first_digit, n,
           ROUND(n / t, 6) AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / d), 6) AS benford_share,
           ROUND(POWER(n / t - LOG10(1.0 + 1.0 / d), 2)
                 / LOG10(1.0 + 1.0 / d), 8) AS chi2_term
    FROM counts CROSS JOIN tot
    """,
    doc="Benford's-law conformance of order totals: first significant "
    "digit distribution vs log10(1+1/d), with per-digit chi-square "
    "terms — the forensic data-quality screen for fabricated or "
    "truncated monetary columns (naturally-arising amounts follow "
    "Benford; uniform or clamped synthetic data does not, as this "
    "table's flat chi2 profile shows).  First digit via integer "
    "string prefix — no float formatting divergence between engines; "
    "one scan + 9-row aggregate + 1-row total broadcast",
)
def a_benford_check(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_totalprice")
    # FLOOR explicitly: DuckDB's double->BIGINT cast ROUNDS while
    # Spark's truncates — a 899.7 would land in different digit bins
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
        .cast("bigint")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("double").alias("t"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    share = F.col("n") / F.col("t")
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        "n",
        F.round(share, 6).alias("observed_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.pow(share - benford, 2) / benford, 8).alias("chi2_term"),
    )


@_q(
    "a_seasonality_profile",
    """
    WITH cells AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hod,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_cell
          FROM cells)
    SELECT dow, hod, n_events, n_purchases,
           ROUND(n_events / mean_cell, 6) AS load_ratio
    FROM cells CROSS JOIN t
    """,
    doc="weekly seasonality heatmap: events per (day-of-week, hour) "
    "cell with purchase counts and load ratio vs the mean cell — the "
    "capacity-planning / anomaly-baseline profile behind 'is this "
    "Tuesday 3pm normal?'.  One hash aggregate over at most 168 "
    "cells + a 1-row mean broadcast; DuckDB dayofweek is 0-6 "
    "Sunday-first and Spark dayofweek 1-7 Sunday-first, so the Spark "
    "side subtracts 1 to align the calendars",
)
def a_seasonality_profile(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("ts", "event_type")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("n_purchases"),
    )
    t = cells.agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "mean_cell"
        )
    )
    return cells.crossJoin(F.broadcast(t)).select(
        "dow",
        "hod",
        "n_events",
        "n_purchases",
        F.round(F.col("n_events") / F.col("mean_cell"), 6).alias(
            "load_ratio"
        ),
    )


@_q(
    "s_ohlc_windowed",
    """
    SELECT CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT)
             AS window_start_ms,
           user_id,
           arg_min(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, lpad(CAST(epoch_ms(ts) AS VARCHAR), 15, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY window_start_ms, user_id
    """,
    doc="the STREAMING OHLC operator (streaming.windows.windowed_ohlc) "
    "run in batch mode — the exact code path the readStream pipeline "
    "executes (tumbling F.window + min_by/max_by bars; the watermark "
    "branch is a no-op on batch frames), registered so the driver "
    "hash-checks the streaming semantics' batch contract, not just a "
    "lookalike query.  Epoch-aligned 5-minute tumbling windows "
    "projected as epoch ms; one hash agg keyed (window, user), no "
    "sort.  Stream-vs-batch bar equality is separately pinned by "
    "tests/test_streaming test_windowed_ohlc_stream_matches_batch",
)
def s_ohlc_windowed(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms
    from data_management_python_spark.streaming.windows import windowed_ohlc

    ev = T(spark, sf_dir, "events")
    bars = windowed_ohlc(ev, window="5 minutes")
    return bars.select(
        epoch_ms("window_start").cast("bigint").alias("window_start_ms"),
        "user_id",
        "open",
        "high",
        "low",
        "close",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@_q(
    "s_session_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(epoch_ms(ts)) AS BIGINT) AS session_start_ms,
           CAST(MAX(epoch_ms(ts)) + 1800000 AS BIGINT) AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="the STREAMING session-window operator "
    "(streaming.windows.session_window_counts, native "
    "F.session_window with 30-minute gap) run in batch mode — "
    "registered so the driver hash-checks the streaming semantics' "
    "batch contract.  Session merge rule is Spark's INCLUSIVE one: "
    "an event joins the open session iff its gap from the previous "
    "event is <= the gap duration (only diff > gap starts a new "
    "session — verified against Spark 4.1 by probe and pinned by "
    "tests/test_properties.py), and session_end = last event + gap "
    "— both encoded in the oracle's islands rewrite.  This matches "
    "e_sessionize's lag-sum sessionization (diff > gap) and "
    "stream_session_gap's event-time-timeout path at the boundary.  "
    "Output in epoch ms",
)
def s_session_windows(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms
    from data_management_python_spark.streaming.windows import (
        session_window_counts,
    )

    ev = T(spark, sf_dir, "events")
    sessions = session_window_counts(ev, gap="30 minutes")
    return sessions.select(
        "user_id",
        epoch_ms("session_start").cast("bigint").alias("session_start_ms"),
        epoch_ms("session_end").cast("bigint").alias("session_end_ms"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@_q(
    "s_interval_join",
    """
    SELECT p.user_id,
           p.event_id AS purchase_id,
           CAST(epoch_ms(p.ts) AS BIGINT) AS purchase_ts_ms,
           c.event_id AS click_id,
           CAST(epoch_ms(c.ts) AS BIGINT) AS click_ts_ms
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    doc="the STREAM-STREAM interval join "
    "(streaming.joins.stream_interval_join: purchases matched to "
    "same-user clicks at most 30 minutes older, the attribution-join "
    "shape) run in batch mode — the watermark declarations are "
    "no-ops on batch frames, everything else is the identical code "
    "path, so the driver hash-checks the streaming semantics' batch "
    "contract.  The equi-key on user_id keeps the plan a hash join "
    "with the interval as residual predicates — never a cross "
    "product; at stream scale the same bounds are what let the "
    "watermark expire join state.  Timestamps projected as epoch ms",
)
def s_interval_join(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms
    from data_management_python_spark.streaming.joins import (
        stream_interval_join,
    )

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = stream_interval_join(clicks, purchases, 30, 10, "inner")
    return out.select(
        "user_id",
        "purchase_id",
        epoch_ms("purchase_ts").cast("bigint").alias("purchase_ts_ms"),
        "click_id",
        epoch_ms("click_ts").cast("bigint").alias("click_ts_ms"),
    )


@_q(
    "a_rfm_segments",
    """
    WITH cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency, monetary,
             NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS total_monetary,
           CAST(SUM(frequency) AS BIGINT) AS total_orders
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    doc="RFM customer segmentation (recency/frequency/monetary "
    "quartiles): one customer-grain aggregate, then THREE equi-depth "
    "quartile scores each via the two-pass distributed global rank "
    "(operators/ranking.py: range partition + offset fold, NTILE "
    "semantics matched closed-form) — never a SinglePartition NTILE "
    "window; final rollup to the 4x4x4 segment grid so output is "
    "bounded.  The classic CRM/marketing warehouse segmentation, "
    "grid-aggregated the way a 100 TB customer table needs",
)
def a_rfm_segments(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    # monetary sums as DECIMAL(18,2): decimal addition is EXACT and
    # order-independent, so the quartile ORDER KEY cannot flip on a
    # one-ulp double-summation difference between engines (a rounded
    # double sum near a half-cent boundary could land a customer in a
    # different bucket per engine and break hash parity row-wide)
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    n = cust.count()  # scalar; drives the closed-form bucket math
    # all three quartile ranks in ONE melted ranking pass (r12,
    # guide §2.4: one range shuffle + one offset job + one window
    # instead of three chained global_row_number passes).  The long
    # encodings are order-preserving: days-since-epoch for the date,
    # cents for the DECIMAL(18,2) sum (max |sum| 1e16 -> 1e18 cents,
    # inside bigint range), so per-dimension rank order — ties broken
    # by o_custkey — is unchanged from ORDER BY on the raw columns.
    scored = multi_ntile(
        cust,
        [
            (
                "r_score",
                F.datediff(
                    F.col("last_order"), F.to_date(F.lit("1970-01-01"))
                ),
            ),
            ("f_score", F.col("frequency")),
            ("m_score", F.col("monetary") * 100),
        ],
        "o_custkey",
        n,
        4,
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("total_monetary"),
        F.sum("frequency").cast("bigint").alias("total_orders"),
    )


@_q(
    "e_ab_conversion",
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                  THEN 'control' ELSE 'treatment' END AS variant
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    agg AS (
      SELECT a.variant,
             e.user_id,
             MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
               AS viewed,
             MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM events e JOIN assigned a ON a.user_id = e.user_id
      GROUP BY a.variant, e.user_id
    )
    SELECT variant,
           COUNT(*) AS n_users,
           CAST(SUM(viewed) AS BIGINT) AS n_viewers,
           CAST(SUM(CASE WHEN viewed = 1 THEN purchased ELSE 0 END)
             AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(CASE WHEN viewed = 1 THEN purchased ELSE 0 END)
                   AS DOUBLE)
                 / NULLIF(SUM(viewed), 0), 6) AS conversion_rate
    FROM agg GROUP BY variant
    """,
    doc="A/B experiment readout: users assigned to control/treatment "
    "by the same deterministic id-hash prefix t_train_split uses "
    "(~50/50, seedless, stable across re-runs and incremental loads "
    "— the property an experiment assignment MUST have), conversion "
    "= purchased among viewers, per-variant rates.  One user-grain "
    "conditional aggregate + a final 2-row rollup; the assignment is "
    "a pure column expression so the plan is one events shuffle on "
    "user_id.  Beyond-reference: the experimentation readout every "
    "event warehouse serves",
)
def e_ab_conversion(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("user_id", "event_type")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "80",
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("viewed"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchased"),
        )
        .withColumn("variant", variant)
    )
    converted = F.when(F.col("viewed") == 1, F.col("purchased")).otherwise(0)
    return per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").cast("bigint").alias("n_viewers"),
        F.sum(converted).cast("bigint").alias("n_converted"),
        F.round(
            F.sum(converted).cast("double")
            / F.nullif(F.sum("viewed"), F.lit(0)),
            6,
        ).alias("conversion_rate"),
    )


@_q(
    "s_windowed_counts",
    """
    SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT)
             AS window_start_ms,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY window_start_ms, event_type
    """,
    doc="the STREAMING tumbling-window aggregate "
    "(streaming.windows.windowed_event_counts, F.window + watermark) "
    "run in batch mode — the exact readStream code path, completing "
    "the batch-contract family (OHLC, session windows, interval join, "
    "windowed counts): every batch-capable streaming operator now has "
    "a driver-hash-checked registered twin.  Epoch-aligned 1-hour "
    "tumbling windows as epoch ms; one hash agg keyed (window, type)",
)
def s_windowed_counts(spark, sf_dir):
    from data_management_python_spark.functions import epoch_ms
    from data_management_python_spark.streaming.windows import (
        windowed_event_counts,
    )

    ev = T(spark, sf_dir, "events")
    out = windowed_event_counts(ev, window="1 hour")
    return out.select(
        epoch_ms("window_start").cast("bigint").alias("window_start_ms"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        "sum_value",
    )


@_q(
    "s_running_user_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE user_id % 5 = 0
    GROUP BY user_id
    """,
    doc="batch-contract twin of the Spark-4 transformWithStateInPandas "
    "running-totals operator (streaming.stateful_v2."
    "running_user_totals_v2): drives the SAME RunningTotalsProcessor "
    "(init + handleInputRows per-key arithmetic) through an in-memory "
    "value-state handle inside applyInPandas — everything but the "
    "protobuf state-server transport, which minimal containers lack "
    "(the streaming test importorskips).  Output = the streaming "
    "query's final per-user state; sum rounded to 2 at the engine "
    "boundary.  Scoped to a deterministic 20% user slice: the check "
    "is PROCESSOR-LOGIC parity per key, and one pandas group per user "
    "prices the full table at per-group Python overhead the streaming "
    "path never pays (its groups batch per micro-partition)",
)
def s_running_user_totals(spark, sf_dir):
    from data_management_python_spark.streaming.stateful_v2 import (
        running_user_totals_v2_batch,
    )

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    out = running_user_totals_v2_batch(ev)
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
    )


@_q(
    "s_user_event_profile",
    """
    WITH scoped AS (
      SELECT * FROM events WHERE user_id % 5 = 1
    ), counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM scoped GROUP BY user_id, event_type
    ), tot AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS total_events,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM counts GROUP BY user_id
    ), top AS (
      SELECT user_id, MIN(event_type) AS top_type
      FROM counts c
      WHERE n = (SELECT MAX(n) FROM counts c2 WHERE c2.user_id = c.user_id)
      GROUP BY user_id
    ), recent AS (
      SELECT user_id, MAX(value) AS recent_max FROM (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM scoped
      ) WHERE rk <= 5 GROUP BY user_id
    )
    SELECT t.user_id, t.total_events, t.n_types, p.top_type, r.recent_max
    FROM tot t JOIN top p ON p.user_id = t.user_id
    JOIN recent r ON r.user_id = t.user_id
    """,
    doc="batch-contract twin of the typed-state MapState+ListState "
    "profile operator (streaming.stateful_v2.user_event_profile_v2): "
    "drives the SAME UserProfileProcessor — MapState event-type "
    "counts, bounded last-5 ListState, modal type with deterministic "
    "lexicographic tie-break, max-of-recent (order-insensitive exact "
    "arithmetic, so no float-summation-order hazard against the SQL "
    "oracle) — through in-memory state handles inside applyInPandas.  "
    "Completes the typed-state primitive surface (ValueState in "
    "s_running_user_totals, timers in the session-gap e2e test, "
    "Map/ListState here).  Same deterministic 20% user slice "
    "discipline as s_running_user_totals",
)
def s_user_event_profile(spark, sf_dir):
    from data_management_python_spark.streaming.stateful_v2 import (
        user_event_profile_v2_batch,
    )

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 1)
    return user_event_profile_v2_batch(ev)
