"""Metadata reformatting + assay/species derivation (reference
igf_data/process/metadata_reformat/reformat_metadata_file.py) as
native column expressions and broadcast lookups — the row-apply
``populate_metadata_values`` (:441-511) becomes one projection plus
two tiny broadcast joins, so a million-row registration sheet derives
in a single distributed pass.

Covered semantics:
  - ``sample_and_project_reformat`` (:321-347): whitespace and
    punctuation (except underscore) collapse to '-', runs of '-'
    collapse, leading/trailing '-' stripped.
  - ``sample_name_reformat`` (:295-318): same but underscore is also
    restricted.
  - ``get_assay_info`` (:348-393): pick the lookup key — library_type
    when (library_preparation, sample_description) say PRE MADE
    LIBRARY, else library_preparation when set — then resolve
    (library_source, library_strategy, experiment_type,
    biomaterial_type) from the EXPERIMENT_TYPE_LOOKUP table;
    biomaterial_type only fills an empty/UNKNOWN user value.
  - ``get_species_info`` (:418-440): species_text -> (taxon_id,
    scientific_name, species_name) via SPECIES_LOOKUP, UNKNOWN
    fallbacks.
  - expected_reads / expected_lanes defaults (:500-506).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# Representative subset of EXPERIMENT_TYPE_LOOKUP
# (reformat_metadata_file.py:4-175, 57 entries) — enough rows to
# exercise every derivation branch incl. the SINGLE_NUCLEI
# biomaterial override; extend in deployment with the full facility
# catalogue.
ASSAY_LOOKUP: list[dict[str, str]] = [
    {"library_preparation": "WHOLE GENOME SEQUENCING - SAMPLE",
     "library_type": "WHOLE GENOME", "library_strategy": "WGS",
     "experiment_type": "WGS", "library_source": "GENOMIC",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "WHOLE EXOME CAPTURE - EXONS - SAMPLE",
     "library_type": "HYBRID CAPTURE - EXOME", "library_strategy": "WXS",
     "experiment_type": "WXS", "library_source": "GENOMIC",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "RNA SEQUENCING - TOTAL RNA",
     "library_type": "TOTAL RNA", "library_strategy": "RNA-SEQ",
     "experiment_type": "TOTAL-RNA", "library_source": "TRANSCRIPTOMIC",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "RNA SEQUENCING - MRNA",
     "library_type": "MRNA", "library_strategy": "RNA-SEQ",
     "experiment_type": "POLYA-RNA", "library_source": "TRANSCRIPTOMIC",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "SINGLE CELL -3' RNASEQ- SAMPLE",
     "library_type": "SINGLE CELL-3' RNA", "library_strategy": "RNA-SEQ",
     "experiment_type": "TENX-TRANSCRIPTOME-3P",
     "library_source": "TRANSCRIPTOMIC_SINGLE_CELL",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "SINGLE CELL -3' RNASEQ- SAMPLE NUCLEI",
     "library_type": "SINGLE CELL-3' RNA (NUCLEI)",
     "library_strategy": "RNA-SEQ",
     "experiment_type": "TENX-TRANSCRIPTOME-3P",
     "library_source": "TRANSCRIPTOMIC_SINGLE_CELL",
     "biomaterial_type": "SINGLE_NUCLEI"},
    {"library_preparation": "SINGLE CELL -5' RNASEQ- SAMPLE",
     "library_type": "SINGLE CELL-5' RNA", "library_strategy": "RNA-SEQ",
     "experiment_type": "TENX-TRANSCRIPTOME-5P",
     "library_source": "TRANSCRIPTOMIC_SINGLE_CELL",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "ATAC SEQ", "library_type": "ATAC SEQ",
     "library_strategy": "ATAC-SEQ", "experiment_type": "ATAC-SEQ",
     "library_source": "GENOMIC", "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "RNA SEQUENCING - SMALL RNA - SAMPLE",
     "library_type": "SMALL RNA", "library_strategy": "MIRNA-SEQ",
     "experiment_type": "SMALL-RNA", "library_source": "TRANSCRIPTOMIC",
     "biomaterial_type": "UNKNOWN"},
    {"library_preparation": "HI-C SEQ", "library_type": "HI-C SEQ",
     "library_strategy": "HI-C", "experiment_type": "HI-C",
     "library_source": "GENOMIC", "biomaterial_type": "UNKNOWN"},
]

# SPECIES_LOOKUP (reformat_metadata_file.py:176-181), complete.
SPECIES_LOOKUP: list[dict[str, object]] = [
    {"species_text": "HUMAN", "species_name": "HG38", "taxon_id": 9606,
     "scientific_name": "Homo sapiens"},
    {"species_text": "HUMAN_HG37", "species_name": "HG37",
     "taxon_id": 9606, "scientific_name": "Homo sapiens"},
    {"species_text": "MOUSE", "species_name": "MM10", "taxon_id": 10090,
     "scientific_name": "Mus musculus"},
    {"species_text": "MOUSE_MM9", "species_name": "MM9",
     "taxon_id": 10090, "scientific_name": "Mus musculus"},
]

DEFAULT_EXPECTED_READS = 2_000_000
DEFAULT_EXPECTED_LANES = 1

# string.punctuation, regex-escaped, minus underscore / including it
_PUNCT_NO_UNDERSCORE = r"""!"#$%&'()*+,\-./:;<=>?@\[\\\]^`{|}~"""
_PUNCT_ALL = _PUNCT_NO_UNDERSCORE + "_"


def _dash_collapse(c: Column, charclass: str) -> Column:
    c = F.regexp_replace(c, r"\s+", "-")
    c = F.regexp_replace(c, f"[{charclass}]", "-")
    c = F.regexp_replace(c, "-+", "-")
    c = F.regexp_replace(c, "-$", "")
    return F.regexp_replace(c, "^-", "")


def tag_reformat(col: Column | str) -> Column:
    """sample/project id cleanup (sample_and_project_reformat,
    :321-347): punctuation except underscore -> '-'."""
    c = F.col(col) if isinstance(col, str) else col
    return _dash_collapse(c, _PUNCT_NO_UNDERSCORE)


def sample_name_reformat(col: Column | str) -> Column:
    """submitter-name cleanup (sample_name_reformat, :295-318): all
    punctuation including underscore -> '-'."""
    c = F.col(col) if isinstance(col, str) else col
    return _dash_collapse(c, _PUNCT_ALL)


def _norm(col: str) -> Column:
    return F.upper(F.trim(F.coalesce(F.col(col), F.lit(""))))


_DERIVED = ["library_source", "library_strategy", "experiment_type"]


def derive_assay_columns(df: DataFrame) -> DataFrame:
    """get_assay_info as two broadcast left joins + a key-choice
    when-chain (no row apply).

    Requires library_preparation, library_type, sample_description
    columns.  Adds/overwrites library_source, library_strategy,
    experiment_type; fills biomaterial_type only when the user value
    is empty/UNKNOWN and the lookup knows better (reference
    populate_metadata_values:475-478).
    """
    spark = df.sparkSession
    lookup = spark.createDataFrame(
        [
            (d["library_preparation"], d["library_type"],
             d["library_source"], d["library_strategy"],
             d["experiment_type"], d["biomaterial_type"])
            for d in ASSAY_LOOKUP
        ],
        "lp string, lt string, lu_source string, lu_strategy string, "
        "lu_etype string, lu_biomaterial string",
    )
    by_prep = broadcast(
        lookup.select(
            F.col("lp").alias("__k_prep"),
            *[F.col(c).alias(f"{c}_p") for c in
              ("lu_source", "lu_strategy", "lu_etype", "lu_biomaterial")],
        ).dropDuplicates(["__k_prep"])
    )
    by_type = broadcast(
        lookup.select(
            F.col("lt").alias("__k_type"),
            *[F.col(c).alias(f"{c}_t") for c in
              ("lu_source", "lu_strategy", "lu_etype", "lu_biomaterial")],
        ).dropDuplicates(["__k_type"])
    )
    prep = _norm("library_preparation")
    desc = _norm("sample_description")
    ltype = _norm("library_type")
    use_type = (prep == "NOT APPLICABLE") & (desc == "PRE MADE LIBRARY")
    use_prep = (prep != "NOT APPLICABLE") & (prep != "")
    out = (
        df.withColumn("__k_prep", F.when(use_prep, prep))
        .withColumn("__k_type", F.when(use_type, ltype))
        .join(by_prep, "__k_prep", "left")
        .join(by_type, "__k_type", "left")
    )
    pick = {
        c: F.coalesce(F.col(f"{c}_p"), F.col(f"{c}_t"), F.lit("UNKNOWN"))
        for c in ("lu_source", "lu_strategy", "lu_etype", "lu_biomaterial")
    }
    out = (
        out.withColumn("library_source", pick["lu_source"])
        .withColumn("library_strategy", pick["lu_strategy"])
        .withColumn("experiment_type", pick["lu_etype"])
    )
    if "biomaterial_type" in df.columns:
        user_bio = F.upper(F.coalesce(F.col("biomaterial_type"), F.lit("")))
        out = out.withColumn(
            "biomaterial_type",
            F.when(
                user_bio.isin("", "UNKNOWN")
                & (pick["lu_biomaterial"] != "UNKNOWN"),
                pick["lu_biomaterial"],
            ).otherwise(F.col("biomaterial_type")),
        )
    drop = ["__k_prep", "__k_type"] + [
        f"{c}_{s}"
        for c in ("lu_source", "lu_strategy", "lu_etype", "lu_biomaterial")
        for s in ("p", "t")
    ]
    return out.drop(*drop)


def derive_species_columns(df: DataFrame) -> DataFrame:
    """get_species_info: broadcast join on upper(species_text); adds
    taxon_id (string, like the reference's str(taxon_id)),
    scientific_name, species_name with UNKNOWN fallbacks."""
    spark = df.sparkSession
    lookup = broadcast(
        spark.createDataFrame(
            [
                (d["species_text"], str(d["taxon_id"]),
                 d["scientific_name"], d["species_name"])
                for d in SPECIES_LOOKUP
            ],
            "__sp string, lu_taxon string, lu_sci string, lu_name string",
        )
    )
    out = df.withColumn("__sp", _norm("species_text")).join(
        lookup, "__sp", "left"
    )
    return (
        out.withColumn("taxon_id", F.coalesce("lu_taxon", F.lit("UNKNOWN")))
        .withColumn(
            "scientific_name", F.coalesce("lu_sci", F.lit("UNKNOWN"))
        )
        .withColumn("species_name", F.coalesce("lu_name", F.lit("UNKNOWN")))
        .drop("__sp", "lu_taxon", "lu_sci", "lu_name")
    )


def reformat_metadata(df: DataFrame) -> DataFrame:
    """Full populate_metadata_values (:441-511) pipeline: id/name
    cleanup, assay + species derivation, expected_reads/lanes
    defaults.  Column-presence gates mirror the reference's
    ``if col in row.keys()`` checks."""
    out = df
    if "sample_igf_id" in out.columns:
        out = out.withColumn("sample_igf_id", tag_reformat("sample_igf_id"))
    if "project_igf_id" in out.columns:
        out = out.withColumn(
            "project_igf_id", tag_reformat("project_igf_id")
        )
    if "sample_submitter_id" in out.columns:
        out = out.withColumn(
            "sample_submitter_id",
            sample_name_reformat("sample_submitter_id"),
        )
    if {"library_preparation", "library_type", "sample_description"} <= set(
        out.columns
    ):
        out = derive_assay_columns(out)
    if "species_text" in out.columns:
        out = derive_species_columns(out)
    for col, default in (
        ("expected_reads", DEFAULT_EXPECTED_READS),
        ("expected_lanes", DEFAULT_EXPECTED_LANES),
    ):
        if col in out.columns:
            v = F.coalesce(F.col(col).cast("string"), F.lit(""))
            out = out.withColumn(
                col,
                F.when(v.isin("", "0"), F.lit(str(default))).otherwise(v),
            )
    return out
