"""Tests: validation rules, barcode QC pipeline, read-count plan,
incremental discovery."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from data_management_python_spark.plans.read_count import (
    project_read_counts,
    read_count_matrix,
)
from data_management_python_spark.qc.barcode_qc import barcode_qc
from data_management_python_spark.sources.stats_json import read_demux_stats
from data_management_python_spark.streaming import discovery
from data_management_python_spark.validation import metadata as mv

FIX = Path(__file__).parent / "fixtures"


# --- validation -------------------------------------------------------------


def test_invalid_library_combinations(spark):
    md = spark.createDataFrame(
        [
            ("P1", "S1", "GENOMIC", "WGS", "WGS"),
            ("P1", "S2", "TRANSCRIPTOMIC", "RNA-SEQ", "POLYA-RNA"),
            ("P1", "S3", "GENOMIC", "RNA-SEQ", "WGS"),  # incompatible
        ],
        "project_igf_id string, sample_igf_id string, library_source string, "
        "library_strategy string, experiment_type string",
    )
    bad = mv.invalid_library_combinations(md).collect()
    assert [r.sample_igf_id for r in bad] == ["S3"]


def test_duplicates_and_authority(spark):
    md = spark.createDataFrame(
        [
            ("P1", "S1", "Alice A", "a@x.org"),
            ("P1", "S1", "Alice A", "a@x.org"),   # dup sample
            ("P2", "S9", "Bob B", "b@x.org"),
            ("P2", "S8", "Carol C", "c@x.org"),    # second authority for P2
        ],
        "project_igf_id string, sample_igf_id string, name string, email_id string",
    )
    dups = mv.duplicate_samples(md).collect()
    assert len(dups) == 1 and dups[0].sample_igf_id == "S1"
    auth = mv.projects_with_multiple_authorities(md).collect()
    assert [r.project_igf_id for r in auth] == ["P2"]


def test_unregistered_and_required(spark):
    ss_df = spark.createDataFrame(
        [("PROJ_A", "SMP001"), ("PROJ_Z", "SMP999")],
        "Sample_Project string, Sample_ID string",
    )
    md = spark.createDataFrame(
        [("PROJ_A", "SMP001")], "project_igf_id string, sample_igf_id string"
    )
    missing = mv.unregistered_in_metadata(ss_df, md).collect()
    assert [(r.project_igf_id, r.sample_igf_id) for r in missing] == [
        ("PROJ_Z", "SMP999")
    ]
    req = mv.required_columns_missing(
        spark.createDataFrame(
            [("P1", None), ("P2", "t")], "project_igf_id string, taxon string"
        ),
        ["project_igf_id", "taxon"],
    ).collect()
    assert len(req) == 1 and req[0].missing_fields == "taxon"


# --- barcode QC -------------------------------------------------------------


def test_barcode_qc_pipeline(spark):
    stats = read_demux_stats(spark, str(FIX / "Stats.json"))
    out = barcode_qc(stats, min_known_pct=80.0, platform_name="NEXTSEQ")

    retagged = {
        (r.lane, r["index"]): r.tag  # r.index would be Row.index (method)
        for r in out["retagged"].filter(F.col("sample") == "undetermined").collect()
    }
    # revcomp'd index1 + EXACT index2 match -> only_index_1_revcomp
    # (reference CASE 4, check_sequence_index_barcodes.py:332-341)
    assert retagged[(1, "CGAGTAAT+TATAGCCT")] == "only_index_1_revcomp"
    assert retagged[(2, "AATGAGCG+CCTATCCT")] == "only_index_1_revcomp"
    # all-G artifact detected (two-color platform gate on)
    assert retagged[(1, "GGGGGGGG+GGGGGGGG")] == "index_1_G_homopolymer"
    # genuinely unknown barcode keeps its tag
    assert retagged[(1, "ACGTACGT+ACGTACGT")] == "unknown"

    report = {r.lane: r for r in out["lane_report"].collect()}
    # reference semantics: only literal known/unknown groups feed the
    # gates — retagged classes (revcomp, homopolymer) count in neither.
    # lane 1: known 900k vs unknown 5k (ACGTACGT) -> 99.45%
    assert report[1].qc_pass
    assert abs(report[1].known_pct - 900000 / 905000 * 100) < 1e-9
    # lane 2: known 700k, unknown 2k (TTTTTTTT) -> pass
    assert report[2].qc_pass
    assert abs(report[2].known_pct - 700000 / 702000 * 100) < 1e-9


# --- read-count flagship over reference-shaped tables -----------------------


def test_project_read_count_plan(spark):
    project = spark.createDataFrame(
        [(1, "PROJ_A")], "project_id long, project_igf_id string"
    )
    sample = spark.createDataFrame(
        [(10, "IGF001", 1, "ACTIVE"), (11, "IGF002", 1, "ACTIVE"),
         (12, "IGF003", 1, "FAILED")],
        "sample_id long, sample_igf_id string, project_id long, status string",
    )
    experiment = spark.createDataFrame(
        [(100, 10, "ACTIVE"), (101, 11, "ACTIVE"), (102, 12, "ACTIVE")],
        "experiment_id long, sample_id long, status string",
    )
    run = spark.createDataFrame(
        [(1000, 100, 500, "ACTIVE"), (1001, 100, 501, "ACTIVE"),
         (1002, 101, 500, "ACTIVE"), (1003, 102, 500, "ACTIVE")],
        "run_id long, experiment_id long, seqrun_id long, status string",
    )
    seqrun = spark.createDataFrame(
        [(500, "FC01"), (501, "FC02")], "seqrun_id long, flowcell_id string"
    )
    run_attr = spark.createDataFrame(
        [(1000, "R1_READ_COUNT", "1000"), (1001, "R1_READ_COUNT", "2000"),
         (1002, "R1_READ_COUNT", "3000"), (1003, "R1_READ_COUNT", "9999"),
         (1000, "other_attr", "x")],
        "run_id long, attribute_name string, attribute_value string",
    )
    long = project_read_counts(project, sample, experiment, run, seqrun, run_attr)
    rows = {(r.sample_igf_id, r.flowcell_id): r.read_count for r in long.collect()}
    # FAILED sample excluded by the status chain
    assert rows == {("IGF001", "FC01"): 1000, ("IGF001", "FC02"): 2000,
                    ("IGF002", "FC01"): 3000}

    matrix = read_count_matrix(long, flowcells=["FC01", "FC02"])
    m = {r.sample_igf_id: r for r in matrix.collect()}
    assert m["IGF001"].total_read == 3000
    assert m["IGF002"].FC02 is None and m["IGF002"].total_read == 3000


# --- incremental discovery ---------------------------------------------------


def _mk_run_dir(
    root: Path, name: str, finished: bool = True, empty_marker: bool = False
) -> None:
    d = root / name
    d.mkdir(parents=True)
    (d / "RunInfo.xml").write_text("<RunInfo/>")
    if finished:
        if empty_marker:
            (d / "RTAComplete.txt").touch()  # NovaSeq RTA3 writes 0 bytes
        else:
            (d / "RTAComplete.txt").write_text("done")


def test_discovery_and_seeding(spark, tmp_path):
    _mk_run_dir(tmp_path, "260110_NS9001_0040_AHAAA", finished=True)
    _mk_run_dir(tmp_path, "260112_NS9001_0041_AHBBB", finished=True)
    _mk_run_dir(tmp_path, "260114_NS9001_0042_AHCCC", finished=False)
    # zero-byte marker (RTA3) must still count as finished
    _mk_run_dir(tmp_path, "260115_NS9001_0043_AHDDD", finished=True,
                empty_marker=True)

    registry = spark.createDataFrame(
        [("260110_NS9001_0040_AHAAA",)], "seqrun_igf_id string"
    )
    new = discovery.discover_new_runs(spark, str(tmp_path), registry)
    names = sorted(r.seqrun_igf_id for r in new.collect())
    # unfinished run (no marker) invisible; registered run anti-joined away
    assert names == ["260112_NS9001_0041_AHBBB", "260115_NS9001_0043_AHDDD"]

    seeds = spark.createDataFrame(
        [(7, 1, "seqrun", "SEEDED")],
        "pipeline_id long, seed_id long, seed_table string, status string",
    )
    from pyspark.sql.window import Window

    new_with_ids = new.withColumn(
        "seed_id",
        F.row_number().over(Window.orderBy("seqrun_igf_id")) + 1,
    )
    seeded_once = discovery.seed_new_runs(seeds, new_with_ids, pipeline_id=7)
    seeded_twice = discovery.seed_new_runs(seeded_once, new_with_ids, pipeline_id=7)
    assert seeded_once.count() == 3 and seeded_twice.count() == 3  # idempotent


def test_streaming_discovery(spark, tmp_path):
    runs = tmp_path / "runs"
    _mk_run_dir(runs, "260115_NS9001_0043_AHDDD", finished=True)
    q = discovery.stream_new_run_markers(
        spark,
        str(runs),
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
    )
    q.awaitTermination(60)
    first = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r.seqrun_igf_id for r in first] == ["260115_NS9001_0043_AHDDD"]

    # second run dir arrives; a new availableNow pass picks up ONLY it
    _mk_run_dir(runs, "260116_NS9001_0044_AHEEE", finished=True)
    q2 = discovery.stream_new_run_markers(
        spark, str(runs), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q2.awaitTermination(60)
    all_rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted(r.seqrun_igf_id for r in all_rows) == [
        "260115_NS9001_0043_AHDDD",
        "260116_NS9001_0044_AHEEE",
    ]


def test_schema_violations_parity_with_jsonschema(spark):
    """Draft-4 constraint engine parity: run the reference's actual
    validator (jsonschema.Draft4Validator, samplesheet.py:111) over the
    reference's own incorrect_samplesheet.csv fixture and require the
    Spark one-pass validator to report the identical
    (row, column, rule) set."""
    from jsonschema import Draft4Validator

    from data_management_python_spark.sources.samplesheet import (
        parse_samplesheet_text,
    )
    from data_management_python_spark.validation import schema_rules as sr

    text = Path(
        "/root/reference/data/metadata_validation/metadata_reformatting/"
        "incorrect_samplesheet.csv"
    ).read_text()
    _, rows, _ = parse_samplesheet_text(text)
    cols = list(rows[0].keys())
    # reference semantics: fillna("") + str() on every cell
    recs = [{c: str(r.get(c) or "") for c in cols} for r in rows]

    ref_schema = {
        "type": "object",
        "properties": {
            k: {"type": "string", **v}
            for k, v in sr.SAMPLESHEET_SCHEMA["properties"].items()
        },
        "required": sr.SAMPLESHEET_SCHEMA["required"],
    }
    validator = Draft4Validator(ref_schema)
    expected = set()
    for i, rec in enumerate(recs):
        for err in validator.iter_errors(rec):
            path = list(err.path)
            expected.add((i, path[0] if path else None, err.validator))

    df = spark.createDataFrame(
        [{**rec, "row_id": i} for i, rec in enumerate(recs)]
    )
    out = sr.schema_violations(df, sr.SAMPLESHEET_SCHEMA, ["row_id"])
    got = {(r.row_id, r.column, r.rule) for r in out.collect()}
    assert got == expected
    assert got, "fixture must actually contain violations"


def test_schema_violations_metadata_fixture(spark):
    """METADATA_SCHEMA over the reference's metadata_file.csv: the known
    bad cells (malformed email, underscore submitter id) are flagged,
    and jsonschema agrees cell-for-cell on the shared columns."""
    from jsonschema import Draft4Validator

    from data_management_python_spark.validation import schema_rules as sr

    path = "/root/reference/data/metadata_validation/metadata_file.csv"
    df = (
        spark.read.option("header", "true").csv(path)
        .withColumn("row_id", F.monotonically_increasing_id())
    )
    out = sr.schema_violations(df, sr.METADATA_SCHEMA, ["row_id"])
    got_cols = {(r.column, r.value) for r in out.collect()}
    assert ("email_id", "c.s#imperial.ac.uk") in got_cols
    assert ("sample_submitter_id", "KDSC_77") in got_cols

    shared = [
        c for c in df.columns
        if c in sr.METADATA_SCHEMA["properties"]
    ]
    recs = [
        {c: str(r[c] or "") for c in shared}
        for r in df.drop("row_id").collect()
    ]
    ref_schema = {
        "type": "object",
        "properties": {
            k: {"type": "string", **v}
            for k, v in sr.METADATA_SCHEMA["properties"].items()
            if k in shared
        },
    }
    validator = Draft4Validator(ref_schema)
    n_expected = sum(len(list(validator.iter_errors(r))) for r in recs)
    assert out.count() == n_expected


def test_schema_violations_required_and_helpers(spark):
    """fillna_empty=False mode: required fires on null, other rules
    skip nulls; unknown/missing column helpers."""
    from data_management_python_spark.validation import schema_rules as sr

    df = spark.createDataFrame(
        [(1, None, "ok-name"), (2, "IGF77", None), (3, "bad id", "x y")],
        "row_id long, Sample_ID string, Sample_Name string",
    )
    out = sr.schema_violations(
        df, sr.SAMPLESHEET_SCHEMA, ["row_id"], fillna_empty=False
    )
    got = {(r.row_id, r.column, r.rule) for r in out.collect()}
    assert (1, "Sample_ID", "required") in got
    assert (3, "Sample_ID", "pattern") in got
    assert (3, "Sample_Name", "pattern") in got
    # null Sample_Name on row 2: required (it IS required) but no pattern
    assert (2, "Sample_Name", "required") in got
    assert (2, "Sample_Name", "pattern") not in got

    assert sr.unknown_columns(df, sr.SAMPLESHEET_SCHEMA) == ["row_id"]
    missing = sr.missing_required_columns(df, sr.SAMPLESHEET_SCHEMA)
    assert missing == ["I7_Index_ID", "Sample_Project", "index"]


def test_reformat_metadata_derivation(spark):
    """Assay/species derivation chain (reformat_metadata_file.py
    populate_metadata_values:441-511) on rows shaped like the
    reference's metadata_file.csv fixture."""
    from data_management_python_spark.validation import reformat as rf

    df = spark.createDataFrame(
        [
            # pre-made library -> key = library_type (nuclei variant
            # also fills biomaterial_type)
            ("IGF (1)", "a b_c!", "Not Applicable", "Pre made library",
             "SINGLE CELL-3' RNA (NUCLEI)", "", "human", "", ""),
            # explicit library_preparation -> key = preparation
            ("IGF 2", "x", "ATAC Seq", "fresh sample", "", "CELL_LINE",
             "mouse", "0", "2"),
            # unknown everything
            ("IGF3", "y", "", "", "", "", "alien", "5", ""),
        ],
        "sample_igf_id string, sample_submitter_id string, "
        "library_preparation string, sample_description string, "
        "library_type string, biomaterial_type string, "
        "species_text string, expected_reads string, "
        "expected_lanes string",
    )
    out = {r.sample_igf_id: r for r in rf.reformat_metadata(df).collect()}

    r1 = out["IGF-1"]  # "IGF (1)" -> punctuation/space collapse
    assert r1.sample_submitter_id == "a-b-c"  # underscore restricted too
    assert r1.experiment_type == "TENX-TRANSCRIPTOME-3P"
    assert r1.library_source == "TRANSCRIPTOMIC_SINGLE_CELL"
    assert r1.biomaterial_type == "SINGLE_NUCLEI"  # filled from lookup
    assert (r1.taxon_id, r1.species_name) == ("9606", "HG38")
    assert r1.expected_reads == "2000000" and r1.expected_lanes == "1"

    r2 = out["IGF-2"]
    assert r2.library_strategy == "ATAC-SEQ"
    assert r2.biomaterial_type == "CELL_LINE"  # user value preserved
    assert (r2.taxon_id, r2.scientific_name) == ("10090", "Mus musculus")
    assert r2.expected_reads == "2000000" and r2.expected_lanes == "2"

    r3 = out["IGF3"]
    assert r3.experiment_type == "UNKNOWN"
    assert r3.species_name == "UNKNOWN"
    assert r3.expected_reads == "5" and r3.expected_lanes == "1"


def test_reformat_tag_vs_reference_regex(spark):
    """tag/sample reformat parity with the reference's regex chain
    (sample_and_project_reformat:321-347, sample_name_reformat:295-318)
    evaluated in plain Python."""
    import re
    import string

    from data_management_python_spark.validation import reformat as rf

    def ref_chain(value, keep_underscore):
        restricted = string.punctuation
        if keep_underscore:
            restricted = "".join(c for c in restricted if c != "_")
        value = re.sub(r"\s+?", "-", value)
        value = re.sub("[{0}]".format(re.escape(restricted)), "-", value)
        value = re.sub("-+", "-", value)
        value = re.sub("-$", "", value)
        return re.sub("^-", "", value)

    samples = ["IGF (1)", "a b_c!", " x--y__z. ", "A#B@C", "-lead", "trail-",
               "already-ok", "under_score", "mix 'n match/2"]
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = df.select(
        "v",
        rf.tag_reformat("v").alias("tag"),
        rf.sample_name_reformat("v").alias("name"),
    ).collect()
    for r in got:
        assert r.tag == ref_chain(r.v, keep_underscore=True), r.v
        assert r.name == ref_chain(r.v, keep_underscore=False), r.v
