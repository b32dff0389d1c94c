"""CosMx spatial-omics extension (SURVEY §1.3).

Schemas for the reference's 9 CosMx tables (igfTables.py:1250-1504) and
the query helpers cosmxutils.py (555 LoC) provides: per-slide FOV QC
rollups and JSON-metadata reads.  DECIMAL QC metrics map to
DecimalType(10,2/3) as declared; JSON metadata columns are strings read
via ``from_json`` with caller-supplied shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

L, S, T = LongType(), StringType(), TimestampType()
D2, D3 = DecimalType(10, 2), DecimalType(10, 3)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for (n, t, nullable) in fields])


COSMX_SCHEMAS: dict[str, StructType] = {
    # igfTables.py:1250-1276
    "cosmx_platform": _s(
        ("cosmx_platform_id", L, False), ("cosmx_platform_igf_id", S, False),
        ("version", S, True), ("date_created", T, True),
    ),
    # igfTables.py:1278-1305
    "cosmx_run": _s(
        ("cosmx_run_id", L, False), ("cosmx_run_igf_id", S, False),
        ("cosmx_platform_id", L, True), ("run_status", S, True),
        ("date_created", T, True),
    ),
    # igfTables.py:1307-1348 (JSON slide_metadata, DECIMAL QC)
    "cosmx_slide": _s(
        ("cosmx_slide_id", L, False), ("cosmx_slide_igf_id", S, False),
        ("cosmx_run_id", L, True), ("project_id", L, True),
        ("slide_metadata", S, True), ("assay_type", S, True),
        ("panel_info", S, True), ("date_created", T, True),
    ),
    # igfTables.py:1350-1372
    "cosmx_fov": _s(
        ("cosmx_fov_id", L, False), ("cosmx_slide_id", L, False),
        ("fov_number", L, False), ("x_position", D3, True),
        ("y_position", D3, True),
    ),
    # igfTables.py:1374-1396
    "cosmx_fov_annotation": _s(
        ("cosmx_fov_annotation_id", L, False), ("cosmx_fov_id", L, False),
        ("annotation_name", S, True), ("annotation_value", S, True),
    ),
    # igfTables.py:1398-1423 (percentile metric columns)
    "cosmx_fov_rna_qc": _s(
        ("cosmx_fov_rna_qc_id", L, False), ("cosmx_fov_id", L, False),
        ("cell_count", L, True), ("mean_counts_per_cell", D2, True),
        ("pct_counts_10th_percentile", D2, True),
        ("pct_counts_90th_percentile", D2, True),
        ("mean_genes_per_cell", D2, True),
    ),
    # igfTables.py:1425-1450
    "cosmx_fov_protein_qc": _s(
        ("cosmx_fov_protein_qc_id", L, False), ("cosmx_fov_id", L, False),
        ("cell_count", L, True), ("mean_intensity", D2, True),
        ("pct_valid_cells", D2, True),
    ),
}

# two JSON-valued attribute tables (igfTables.py:1452-1504)
for parent in ("cosmx_run", "cosmx_slide"):
    COSMX_SCHEMAS[f"{parent}_attribute"] = _s(
        (f"{parent}_attribute_id", L, False),
        ("attribute_name", S, True),
        ("attribute_value", S, True),  # JSON payloads as strings
        (f"{parent}_id", L, False),
    )


def slide_fov_qc_rollup(
    slides: DataFrame, fovs: DataFrame, rna_qc: DataFrame
) -> DataFrame:
    """Per-slide RNA QC rollup (cosmxutils.py query analog): FOV counts
    and aggregated cell metrics, decimal-safe."""
    return (
        fovs.join(rna_qc, on="cosmx_fov_id")
        .groupBy("cosmx_slide_id")
        .agg(
            F.count(F.lit(1)).alias("n_fovs"),
            F.sum("cell_count").alias("total_cells"),
            F.avg("mean_counts_per_cell").alias("avg_counts_per_cell"),
            F.min("pct_counts_10th_percentile").alias("min_p10"),
            F.max("pct_counts_90th_percentile").alias("max_p90"),
        )
        .join(
            slides.select("cosmx_slide_id", "cosmx_slide_igf_id", "assay_type"),
            on="cosmx_slide_id",
        )
    )


def slide_metadata_field(slides: DataFrame, json_path: str, out_col: str) -> DataFrame:
    """Extract one field from the JSON slide_metadata column."""
    return slides.select(
        "cosmx_slide_id",
        "cosmx_slide_igf_id",
        F.get_json_object("slide_metadata", json_path).alias(out_col),
    )
