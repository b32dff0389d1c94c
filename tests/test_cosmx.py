"""CosMx extension tests (SURVEY §1.3)."""

from __future__ import annotations

from decimal import Decimal

from data_management_python_spark.cosmx import (
    COSMX_SCHEMAS,
    slide_fov_qc_rollup,
    slide_metadata_field,
)


def test_schema_inventory():
    assert len(COSMX_SCHEMAS) == 9
    assert "cosmx_fov_rna_qc" in COSMX_SCHEMAS
    qc = {f.name: f.dataType.simpleString() for f in COSMX_SCHEMAS["cosmx_fov_rna_qc"]}
    assert qc["mean_counts_per_cell"] == "decimal(10,2)"


def test_slide_rollup_and_metadata(spark):
    slides = spark.createDataFrame(
        [(1, "CSLIDE1", 10, 100, '{"tissue": "liver", "thickness_um": 5}',
          "RNA", "WTx", None)],
        COSMX_SCHEMAS["cosmx_slide"],
    )
    fovs = spark.createDataFrame(
        [(1, 1, 1, Decimal("1.000"), Decimal("2.000")),
         (2, 1, 2, Decimal("3.500"), Decimal("4.250"))],
        COSMX_SCHEMAS["cosmx_fov"],
    )
    qc = spark.createDataFrame(
        [(1, 1, 500, Decimal("120.50"), Decimal("10.00"), Decimal("90.00"), Decimal("45.25")),
         (2, 2, 700, Decimal("130.00"), Decimal("12.00"), Decimal("95.00"), Decimal("50.00"))],
        COSMX_SCHEMAS["cosmx_fov_rna_qc"],
    )
    roll = slide_fov_qc_rollup(slides, fovs, qc).collect()
    assert len(roll) == 1
    r = roll[0]
    assert r.n_fovs == 2 and r.total_cells == 1200
    assert r.min_p10 == Decimal("10.00") and r.max_p90 == Decimal("95.00")
    assert r.cosmx_slide_igf_id == "CSLIDE1"

    meta = slide_metadata_field(slides, "$.tissue", "tissue").collect()[0]
    assert meta.tissue == "liver"
