"""JSON-Schema (Draft 4/6 subset) validation as one-pass column rules.

The reference validates samplesheets and metadata sheets by running
``jsonschema.Draft4Validator.iter_errors`` over row dicts
(igf_data/illumina/samplesheet.py:91-132 validate_samplesheet_data;
igf_data/process/metadata/metadata_validation.py:223) against the
checked-in schemas in ``data/validation_schema/*.json``.  That is a
Python row loop; here each constraint kind — ``pattern``,
``maxLength``, ``minLength``, ``enum``, ``required`` — compiles to a
native Column predicate, so a million-row sheet validates in ONE scan
with zero Python in the row path and the violation report is itself a
DataFrame (empty == valid).

Semantics matched to the reference engine:

  - the reference does ``fillna("")`` before validating, so every key
    is always present and ``required`` never fires — an empty required
    cell instead fails its ``pattern`` (none of the required columns'
    patterns admit ``^$``).  ``schema_violations`` reproduces this
    with ``coalesce(col, '')`` by default (``fillna_empty=True``).
  - ``pattern`` is a *search*, not a full match, in jsonschema; Spark
    ``rlike`` has the same find-anywhere semantics, so anchored
    reference patterns behave identically.
  - only columns present in the DataFrame are checked (jsonschema
    validates only present keys); schema columns absent from the
    frame are reported by :func:`missing_required_columns`, unknown
    frame columns by :func:`unknown_columns` — mirroring the
    reference's per-column "Unknown column" errors
    (samplesheet.py:124-129).

Tested for parity against ``jsonschema`` itself on the reference's own
``incorrect_samplesheet.csv`` fixture (tests/test_validation_qc.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Re-expression of data/validation_schema/samplesheet_validation.json
# (constraints only; $schema/title/version metadata dropped).
SAMPLESHEET_SCHEMA: dict[str, Any] = {
    "properties": {
        "Lane": {"enum": ["1", "2", "3", "4", "5", "6", "7", "8"]},
        "Sample_ID": {"pattern": r"^IGF[a-zA-Z0-9-_]+$"},
        "Sample_Name": {"pattern": r"^[a-zA-Z0-9-]+$"},
        "Sample_Project": {"pattern": r"^IGF[a-zA-Z0-9-_]+$"},
        "I7_Index_ID": {},
        "index": {"pattern": r"^[ATCG]+$|^SI-[GNT][ATN]-[A-Z][0-9]+$"},
        "I5_Index_ID": {},
        "index2": {"pattern": r"^[ATCG]+$|^$"},
        "Sample_Plate": {},
        "Sample_Well": {},
        "Description": {"pattern": r"^10[Xx]$|^$"},
    },
    "required": ["Sample_ID", "Sample_Name", "Sample_Project",
                 "I7_Index_ID", "index"],
}

# Representative subset of
# data/validation_schema/metadata_validation.json — the constrained
# columns with their patterns/enums (full controlled vocabularies
# abbreviated to the values the fixtures exercise plus UNKNOWN/'').
METADATA_SCHEMA: dict[str, Any] = {
    "properties": {
        "project_igf_id": {"pattern": r"^IGF[a-zA-Z0-9-_]+$",
                           "maxLength": 50},
        "name": {"pattern": r"^\w+\s\w+\s?\w+?$"},
        "hpc_username": {"pattern": r"^\S+$|^$"},
        "username": {"pattern": r"^\S+$|^$", "maxLength": 10},
        "email_id": {"pattern": r"\S+\@\S+\.\w+"},
        "sample_igf_id": {"pattern": r"^IGF[a-zA-Z0-9-_]+$"},
        "sample_submitter_id": {"pattern": r"^[a-zA-Z0-9-]+$",
                                "maxLength": 40},
        "barcode_check": {"enum": ["ON", "OFF", ""]},
        "species_name": {"enum": ["HG38", "HG19", "HG19_MM10", "UNKNOWN",
                                  "MM10", "MM9", ""]},
        "library_name": {"pattern": r"^IGF[a-zA-Z0-9-_]+$|^$"},
        "library_source": {"enum": ["GENOMIC", "TRANSCRIPTOMIC",
                                    "GENOMIC_SINGLE_CELL",
                                    "TRANSCRIPTOMIC_SINGLE_CELL",
                                    "METAGENOMIC", "METATRANSCRIPTOMIC",
                                    "SYNTHETIC", "VIRAL_RNA", "OTHER",
                                    "UNKNOWN", ""]},
        "sex": {"enum": ["FEMALE", "MALE", "MIXED", "UNKNOWN", ""]},
        "biomaterial_type": {"enum": ["PRIMARY_TISSUE", "PRIMARY_CELL",
                                      "PRIMARY_CELL_CULTURE", "CELL_LINE",
                                      "SINGLE_NUCLEI", "UNKNOWN", ""]},
        "donor_age": {"pattern": r"^(\d+)?\-?(\d+)?\w+$|^$"},
        "expected_reads": {"pattern": r"^(\d+)?$|^$"},
        "expected_lanes": {"pattern": r"^(\d+)?$|^$"},
    },
    "required": ["project_igf_id", "name", "email_id", "sample_igf_id"],
}


def _column_checks(
    name: str, spec: dict[str, Any], value: Column, required: bool
) -> list[tuple[str, Column]]:
    """(rule, violated-predicate) pairs for one schema property."""
    checks: list[tuple[str, Column]] = []
    if required:
        checks.append(("required", value.isNull()))
    present = value.isNotNull()
    if "pattern" in spec:
        checks.append(("pattern", present & ~value.rlike(spec["pattern"])))
    if "enum" in spec:
        checks.append(("enum", present & ~value.isin(spec["enum"])))
    if "maxLength" in spec:
        checks.append(
            ("maxLength", present & (F.length(value) > spec["maxLength"]))
        )
    if "minLength" in spec:
        checks.append(
            ("minLength", present & (F.length(value) < spec["minLength"]))
        )
    return checks


def schema_violations(
    df: DataFrame,
    schema: dict[str, Any],
    key_cols: list[str],
    fillna_empty: bool = True,
) -> DataFrame:
    """Violation report: one row per (row, column, broken rule).

    Output: ``*key_cols, column, rule, value``.  All constraints for
    all columns evaluate in a single projection — the per-row rule
    array is built map-side and exploded, so the plan is one scan +
    one Generate, no joins, no shuffle.

    ``fillna_empty=True`` (default) mirrors the reference's
    ``fillna("")``: nulls validate as empty strings and ``required``
    cannot fire.  Set it False for frames where null means absent —
    then ``required`` fires on null and other rules skip nulls.
    """
    props: dict[str, Any] = schema.get("properties", {})
    required = set(schema.get("required", []))
    structs: list[Column] = []
    for name, spec in props.items():
        if name not in df.columns:
            continue
        value = F.col(name).cast("string")
        if fillna_empty:
            value = F.coalesce(value, F.lit(""))
        for rule, bad in _column_checks(name, spec, value, name in required):
            structs.append(
                F.when(
                    bad,
                    F.struct(
                        F.lit(name).alias("column"),
                        F.lit(rule).alias("rule"),
                        value.alias("value"),
                    ),
                )
            )
    if not structs:
        return df.select(*key_cols).limit(0).select(
            *key_cols,
            F.lit("").alias("column"),
            F.lit("").alias("rule"),
            F.lit("").alias("value"),
        )
    return (
        df.select(
            *key_cols,
            F.explode(
                F.filter(F.array(*structs), lambda s: s.isNotNull())
            ).alias("__v"),
        )
        .select(*key_cols, "__v.column", "__v.rule", "__v.value")
    )


def unknown_columns(df: DataFrame, schema: dict[str, Any]) -> list[str]:
    """Frame columns the schema does not know — the reference appends
    one 'Unknown column X' error per extra column
    (samplesheet.py:124-129).  Pure schema arithmetic; no job runs."""
    return sorted(set(df.columns) - set(schema.get("properties", {})))


def missing_required_columns(
    df: DataFrame, schema: dict[str, Any]
) -> list[str]:
    """Schema-required columns absent from the frame entirely (a
    malformed sheet, not a row problem)."""
    return sorted(set(schema.get("required", [])) - set(df.columns))
