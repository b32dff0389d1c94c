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


# ---------------------------------------------------------------------------
# cosmxutils.py dataflows re-expressed as set operations
# ---------------------------------------------------------------------------

from pyspark.sql import Column  # noqa: E402


def fov_range_to_array(col: Column | str) -> Column:
    """``"1-4"`` -> [1,2,3,4]; ``"1,2,5"`` -> [1,2,5]; anything else ->
    NULL (the row-level analog of cosmxutils.py:189-210
    fov_range_to_list's ValueError — callers filter NULL rows into a
    rejects frame instead of aborting the batch)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return (
        F.when(
            c.rlike("^\\d+(,\\s*\\d+)+$"),
            F.transform(F.split(c, ","), lambda x: F.trim(x).cast("long")),
        )
        .when(
            c.rlike("^\\d+-\\d+$"),
            # guard start<=end: F.sequence counts DOWN for start>end,
            # but the reference's range(start, end+1) is empty there
            F.when(
                F.regexp_extract(c, r"^(\d+)-(\d+)$", 1).cast("long")
                <= F.regexp_extract(c, r"^(\d+)-(\d+)$", 2).cast("long"),
                F.sequence(
                    F.regexp_extract(c, r"^(\d+)-(\d+)$", 1).cast("long"),
                    F.regexp_extract(c, r"^(\d+)-(\d+)$", 2).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>")),
        )
        .when(c.rlike("^\\d+$"), F.array(c.cast("long")))
    )


def seed_new_fovs(
    requests: DataFrame, slides: DataFrame, existing_fovs: DataFrame
) -> DataFrame:
    """New FOV rows to insert, per registration request — the set-op
    core of create_or_update_cosmx_slide_fov (cosmxutils.py:213-290):
    resolve slide id (step 2), expand the range (step 1), drop FOVs
    already present (steps 3-4's set difference) via anti-join.

    ``requests``: (cosmx_slide_igf_id, fov_range, slide_type).
    Unknown slides are dropped here; surface them with
    :func:`unknown_slides` first (the reference raises instead).
    Output: (cosmx_slide_id, fov_number, slide_type).
    """
    resolved = requests.join(
        F.broadcast(
            slides.select("cosmx_slide_igf_id", "cosmx_slide_id")
        ),
        "cosmx_slide_igf_id",
    )
    expanded = resolved.select(
        "cosmx_slide_id",
        "slide_type",
        F.explode(fov_range_to_array("fov_range")).alias("fov_number"),
    ).dropDuplicates(["cosmx_slide_id", "fov_number"])
    return expanded.join(
        existing_fovs.select("cosmx_slide_id", "fov_number"),
        ["cosmx_slide_id", "fov_number"],
        "left_anti",
    )


def unknown_slides(requests: DataFrame, slides: DataFrame) -> DataFrame:
    """Requests naming a slide the DB does not know (the reference's
    'Cosmx slide ... is not in DB' ValueError, cosmxutils.py:240-247,
    as a rejects frame)."""
    return requests.join(
        F.broadcast(slides.select("cosmx_slide_igf_id")),
        "cosmx_slide_igf_id",
        "left_anti",
    )


def annotate_fovs(
    requests: DataFrame,
    slides: DataFrame,
    fovs: DataFrame,
    annotation_cols: tuple[str, ...] = (
        "tissue_annotation",
        "tissue_ontology",
        "tissue_condition",
        "species",
    ),
) -> DataFrame:
    """FOV annotation rows in EAV shape from range-addressed requests —
    create_or_update_cosmx_slide_fov_annotation (cosmxutils.py:293-371)
    melts each request's annotation fields over every FOV in range.

    Output: (cosmx_fov_id, annotation_name, annotation_value).
    """
    resolved = requests.join(
        F.broadcast(slides.select("cosmx_slide_igf_id", "cosmx_slide_id")),
        "cosmx_slide_igf_id",
    )
    in_range = resolved.select(
        "cosmx_slide_id",
        *annotation_cols,
        F.explode(fov_range_to_array("fov_range")).alias("fov_number"),
    ).join(
        fovs.select("cosmx_slide_id", "fov_number", "cosmx_fov_id"),
        ["cosmx_slide_id", "fov_number"],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("annotation_name"),
                F.col(c).cast("string").alias("annotation_value"),
            )
            for c in annotation_cols
        ]
    )
    return in_range.select(
        "cosmx_fov_id", F.explode(pairs).alias("kv")
    ).select("cosmx_fov_id", "kv.annotation_name", "kv.annotation_value")


def count_qc_violations(
    counts: DataFrame,
    fovs: DataFrame,
    slide_id: int,
    fov_range: str | None = None,
) -> DataFrame:
    """Pre-load gate for FOV count files — the check half of
    create_cosmx_slide_fov_count_qc (cosmxutils.py:422-554) as one
    violations frame (empty == loadable):

      - ``out_of_range``: count rows whose fov_id is outside the
        declared range (step 4's unknown_fov ValueError)
      - ``unregistered_fov``: count rows with no cosmx_fov row for
        this slide (steps 6-7)

    ``counts``: (fov_id, metrics...).  Schema-shape validation of the
    count file itself is validation.schema_rules territory
    (validate_cosmx_count_file:374-411 runs Draft4Validator; use
    ``schema_violations`` with the matching constraint dict).
    """
    slide_fovs = fovs.filter(
        F.col("cosmx_slide_id") == F.lit(slide_id)
    ).select(F.col("fov_number").alias("fov_id"), "cosmx_fov_id")
    checks = counts.join(F.broadcast(slide_fovs), "fov_id", "left")
    in_range = (
        F.array_contains(
            fov_range_to_array(F.lit(fov_range)), F.col("fov_id")
        )
        if fov_range is not None
        else F.lit(True)
    )
    return (
        checks.withColumn(
            "violation",
            F.when(~in_range, F.lit("out_of_range")).when(
                F.col("cosmx_fov_id").isNull(), F.lit("unregistered_fov")
            ),
        )
        .filter(F.col("violation").isNotNull())
        .select("fov_id", "violation")
    )


def map_counts_to_fov_ids(
    counts: DataFrame, fovs: DataFrame, slide_id: int
) -> DataFrame:
    """Step 9 of create_cosmx_slide_fov_count_qc: swap the file's
    fov_id for the DB surrogate cosmx_fov_id (broadcast join replaces
    the pandas ``.map(fov_id_dict)``)."""
    slide_fovs = fovs.filter(
        F.col("cosmx_slide_id") == F.lit(slide_id)
    ).select(F.col("fov_number").alias("fov_id"), "cosmx_fov_id")
    return (
        counts.join(F.broadcast(slide_fovs), "fov_id")
        .drop("fov_id")
    )
