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


def test_fov_range_expand_and_seeding(spark):
    """fov_range_to_list analog (cosmxutils.py:189-210) + the
    registration anti-join (create_or_update_cosmx_slide_fov:213-290)."""
    from data_management_python_spark import cosmx

    ranges = spark.createDataFrame(
        [("1-4",), ("7",), ("2, 5, 9",), ("bad-range-x",), ("3-1",)],
        "fov_range string",
    )
    got = {
        r.fov_range: r.fovs
        for r in ranges.select(
            "fov_range",
            cosmx.fov_range_to_array("fov_range").alias("fovs"),
        ).collect()
    }
    assert got["1-4"] == [1, 2, 3, 4]
    assert got["7"] == [7]
    assert got["2, 5, 9"] == [2, 5, 9]
    assert got["bad-range-x"] is None  # reference raises; we null-mark
    assert got["3-1"] == []  # empty range

    slides = spark.createDataFrame(
        [("CSLIDE1", 1), ("CSLIDE2", 2)],
        "cosmx_slide_igf_id string, cosmx_slide_id long",
    )
    requests = spark.createDataFrame(
        [("CSLIDE1", "1-4", "RNA"), ("GHOST", "1-2", "RNA")],
        "cosmx_slide_igf_id string, fov_range string, slide_type string",
    )
    existing = spark.createDataFrame(
        [(1, 2), (1, 3)], "cosmx_slide_id long, fov_number long"
    )
    new = cosmx.seed_new_fovs(requests, slides, existing)
    assert {(r.cosmx_slide_id, r.fov_number) for r in new.collect()} == {
        (1, 1), (1, 4)
    }
    ghosts = cosmx.unknown_slides(requests, slides)
    assert [r.cosmx_slide_igf_id for r in ghosts.collect()] == ["GHOST"]


def test_fov_annotation_and_count_qc_load(spark):
    """Annotation melt (cosmxutils.py:293-371) and the count-file load
    gate + id mapping (create_cosmx_slide_fov_count_qc:422-554)."""
    from data_management_python_spark import cosmx

    slides = spark.createDataFrame(
        [("CSLIDE1", 1)], "cosmx_slide_igf_id string, cosmx_slide_id long"
    )
    fovs = spark.createDataFrame(
        [(11, 1, 1), (12, 1, 2), (13, 1, 3)],
        "cosmx_fov_id long, cosmx_slide_id long, fov_number long",
    )
    ann_req = spark.createDataFrame(
        [("CSLIDE1", "1-2", "liver", "UBERON:0002107", "healthy", "human")],
        "cosmx_slide_igf_id string, fov_range string, "
        "tissue_annotation string, tissue_ontology string, "
        "tissue_condition string, species string",
    )
    ann = cosmx.annotate_fovs(ann_req, slides, fovs)
    rows = {(r.cosmx_fov_id, r.annotation_name, r.annotation_value)
            for r in ann.collect()}
    assert (11, "tissue_annotation", "liver") in rows
    assert (12, "species", "human") in rows
    assert len(rows) == 8  # 2 FOVs x 4 annotation fields
    assert not any(fid == 13 for fid, _, _ in rows)  # out of range

    counts = spark.createDataFrame(
        [(1, 100), (2, 200), (5, 300), (9, 400)],
        "fov_id long, cell_count long",
    )
    bad = cosmx.count_qc_violations(counts, fovs, slide_id=1, fov_range="1-5")
    got = {(r.fov_id, r.violation) for r in bad.collect()}
    assert got == {(9, "out_of_range"), (5, "unregistered_fov")}

    mapped = cosmx.map_counts_to_fov_ids(counts, fovs, slide_id=1)
    assert {(r.cosmx_fov_id, r.cell_count) for r in mapped.collect()} == {
        (11, 100), (12, 200)
    }
