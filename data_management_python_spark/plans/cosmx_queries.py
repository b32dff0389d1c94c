"""CosMx FOV QC dataflows as oracle-checked queries.

The CosMx tables (cosmx.py schemas, reference igfTables.py:1250-1504)
do not exist in the driver's synthetic star, so these queries first
shape the synthetic tables into the CosMx model — nation as slides,
customer as FOVs, orders as per-FOV count metrics — then run the REAL
operator code (cosmx.slide_fov_qc_rollup, cosmx.seed_new_fovs) on the
shaped frames; the DuckDB oracle repeats the same shaping + semantics
in SQL.  What is being hash-checked is therefore the operator
machinery (join/rollup/range-expand/anti-join), not a toy copy of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_python_spark import cosmx
from data_management_python_spark.catalog import load_table
from data_management_python_spark.plans import Query

QUERIES: list[Query] = []


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, fn=fn, oracle=oracle, doc=doc))
        return fn

    return deco


def _shaped(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    slides = nation.select(
        F.col("n_nationkey").alias("cosmx_slide_id"),
        F.col("n_name").alias("cosmx_slide_igf_id"),
        F.lit("RNA").alias("assay_type"),
    )
    fovs = customer.select(
        F.col("c_custkey").alias("cosmx_fov_id"),
        F.col("c_nationkey").alias("cosmx_slide_id"),
        F.col("c_custkey").alias("fov_number"),
    )
    rna_qc = (
        orders.groupBy(F.col("o_custkey").alias("cosmx_fov_id"))
        .agg(
            F.count(F.lit(1)).alias("cell_count"),
            F.avg("o_totalprice").alias("mean_counts_per_cell"),
            F.min("o_totalprice").alias("pct_counts_10th_percentile"),
            F.max("o_totalprice").alias("pct_counts_90th_percentile"),
        )
    )
    return {"slides": slides, "fovs": fovs, "rna_qc": rna_qc}


@_q(
    "cosmx_fov_qc_rollup",
    """
    WITH rna_qc AS (
      SELECT o_custkey AS cosmx_fov_id,
             COUNT(*) AS cell_count,
             AVG(o_totalprice) AS mean_counts_per_cell,
             MIN(o_totalprice) AS p10,
             MAX(o_totalprice) AS p90
      FROM orders GROUP BY o_custkey
    )
    SELECT n.n_name AS cosmx_slide_igf_id,
           COUNT(*) AS n_fovs,
           CAST(SUM(q.cell_count) AS BIGINT) AS total_cells,
           ROUND(AVG(q.mean_counts_per_cell), 4) AS avg_counts_per_cell,
           ROUND(MIN(q.p10), 2) AS min_p10,
           ROUND(MAX(q.p90), 2) AS max_p90
    FROM rna_qc q
    JOIN customer c ON c.c_custkey = q.cosmx_fov_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    doc="per-slide FOV QC rollup (cosmx.slide_fov_qc_rollup; reference "
    "cosmxutils.py:422-554 count-QC aggregation surface) over "
    "CosMx-shaped synthetic tables — FOV->QC join + grouped metrics + "
    "broadcast slide join",
)
def cosmx_fov_qc_rollup(spark, sf_dir):
    t = _shaped(spark, sf_dir)
    out = cosmx.slide_fov_qc_rollup(t["slides"], t["fovs"], t["rna_qc"])
    return out.select(
        "cosmx_slide_igf_id",
        "n_fovs",
        "total_cells",
        F.round("avg_counts_per_cell", 4).alias("avg_counts_per_cell"),
        F.round("min_p10", 2).alias("min_p10"),
        F.round("max_p90", 2).alias("max_p90"),
    )


@_q(
    "cosmx_fov_seeding",
    """
    WITH requests AS (
      SELECT n_name AS cosmx_slide_igf_id,
             n_nationkey AS cosmx_slide_id,
             '1-' || CAST(10 + n_nationkey AS VARCHAR) AS fov_range,
             'RNA' AS slide_type
      FROM nation
    ),
    expanded AS (
      SELECT r.cosmx_slide_id, r.slide_type, u.fov_number
      FROM requests r,
           UNNEST(generate_series(1, 10 + r.cosmx_slide_id)) AS u(fov_number)
    ),
    existing AS (
      SELECT c_nationkey AS cosmx_slide_id,
             c_custkey % 20 AS fov_number
      FROM customer
    )
    SELECT e.cosmx_slide_id, e.fov_number, e.slide_type
    FROM expanded e
    LEFT JOIN (SELECT DISTINCT cosmx_slide_id, fov_number FROM existing) x
      ON x.cosmx_slide_id = e.cosmx_slide_id
      AND x.fov_number = e.fov_number
    WHERE x.cosmx_slide_id IS NULL
    """,
    doc="FOV registration seeding (cosmx.seed_new_fovs; reference "
    "create_or_update_cosmx_slide_fov cosmxutils.py:213-290): range "
    "string -> explode -> anti-join against registered FOVs",
)
def cosmx_fov_seeding(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    requests = nation.select(
        F.col("n_name").alias("cosmx_slide_igf_id"),
        F.concat(
            F.lit("1-"), (F.lit(10) + F.col("n_nationkey")).cast("string")
        ).alias("fov_range"),
        F.lit("RNA").alias("slide_type"),
    )
    slides = nation.select(
        F.col("n_name").alias("cosmx_slide_igf_id"),
        F.col("n_nationkey").alias("cosmx_slide_id"),
    )
    existing = customer.select(
        F.col("c_nationkey").alias("cosmx_slide_id"),
        (F.col("c_custkey") % 20).alias("fov_number"),
    )
    return cosmx.seed_new_fovs(requests, slides, existing).select(
        "cosmx_slide_id", "fov_number", "slide_type"
    )
