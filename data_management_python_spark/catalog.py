"""Schemas + catalog for the engine.

Two families of tables:

1. The reference's ENA-style relational core (18 tables + 7 EAV attribute
   tables + CosMx extension), declared as explicit ``StructType`` so writes
   are schema-checked the way the reference's SQLAlchemy ORM checks them
   (reference: igf_data/igfdb/igfTables.py:12-1504).  Enum columns are
   StringType + a validation helper (`validate_enums`) since Spark has no
   CHECK constraints; surrogate keys LongType; JSON columns StringType
   (reference JSONType, igf_data/igfdb/datatype.py:7-36) readable via
   ``from_json``.

2. The driver's synthetic TPC-H-ish star schema under /root/testdata
   (TESTDATA.md) used by correctness/bench harnesses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType(
        [StructField(n, t, nullable) for (n, t, nullable) in fields]
    )


# --------------------------------------------------------------------------
# Reference core tables (igfTables.py). Enum domains kept as metadata so the
# write path can validate (Spark-side CHECK emulation).
# --------------------------------------------------------------------------

ENUMS: dict[str, dict[str, list[str]]] = {
    "project": {
        "status": ["ACTIVE", "FINISHED", "WITHDRAWN"],
        "deliverable": ["FASTQ", "ALIGNMENT", "ANALYSIS", "COSMX"],
    },
    "user": {
        "category": ["HPC_USER", "NON_HPC_USER", "EXTERNAL"],
        "status": ["ACTIVE", "BLOCKED", "WITHDRAWN"],
    },
    "sample": {
        "sex": ["FEMALE", "MALE", "MIXED", "UNKNOWN"],
        "status": ["ACTIVE", "FAILED", "WITHDRAWN"],
        "biomaterial_type": [
            "PRIMARY_TISSUE",
            "PRIMARY_CELL",
            "PRIMARY_CELL_CULTURE",
            "CELL_LINE",
            "SINGLE_NUCLEI",
            "UNKNOWN",
        ],
    },
    "platform": {
        "model_name": [
            "HISEQ2500", "HISEQ4000", "MISEQ", "NEXTSEQ", "NEXTSEQ2000",
            "NOVASEQ6000", "NANOPORE_MINION", "DNBSEQ-G400", "DNBSEQ-G50",
            "DNBSEQ-T7", "SEQUEL2",
        ],
        "vendor_name": ["ILLUMINA", "NANOPORE", "MGI", "PACBIO"],
        "software_name": ["RTA", "UNKNOWN"],
    },
    "flowcell_barcode_rule": {
        "index_1": ["NO_CHANGE", "REVCOMP", "UNKNOWN"],
        "index_2": ["NO_CHANGE", "REVCOMP", "UNKNOWN"],
    },
    "seqrun": {"reject_run": ["Y", "N"]},
    "experiment": {
        "library_layout": ["SINGLE", "PAIRED", "UNKNOWN"],
        "status": ["ACTIVE", "FAILED", "WITHDRAWN"],
    },
    "run": {
        "status": ["ACTIVE", "FAILED", "WITHDRAWN"],
        "lane_number": [str(i) for i in range(1, 9)],
    },
    "collection": {
        "table": [
            "sample", "experiment", "run", "file", "project", "seqrun",
            "analysis", "unknown",
        ],
    },
    "file": {
        "location": ["ORWELL", "HPC_PROJECT", "ELIOT", "IRODS", "UNKNOWN"],
        "status": ["ACTIVE", "WITHDRAWN"],
    },
    "pipeline": {
        "pipeline_type": ["EHIVE", "AIRFLOW", "NEXTFLOW", "UNKNOWN"],
        "is_active": ["Y", "N"],
    },
    "pipeline_seed": {
        "status": ["SEEDED", "RUNNING", "FINISHED", "FAILED", "UNKNOWN"],
        "seed_table": [
            "project", "sample", "experiment", "run", "file", "seqrun",
            "analysis", "collection", "unknown",
        ],
    },
}

L, S, D, T = LongType(), StringType(), DoubleType(), TimestampType()

CORE_SCHEMAS: dict[str, StructType] = {
    # igfTables.py:12-63
    "project": _s(
        ("project_id", L, False), ("project_igf_id", S, False),
        ("project_name", S, True), ("start_timestamp", T, True),
        ("description", S, True), ("status", S, False),
        ("deliverable", S, True),
    ),
    # igfTables.py:66-135
    "user": _s(
        ("user_id", L, False), ("user_igf_id", S, True), ("name", S, False),
        ("email_id", S, False), ("username", S, True),
        ("hpc_username", S, True), ("category", S, True),
        ("status", S, False), ("date_created", T, True),
        ("password", S, True), ("encryption_salt", S, True),
    ),
    # igfTables.py:138-169
    "project_user": _s(
        ("project_user_id", L, False), ("project_id", L, False),
        ("user_id", L, False), ("data_authority", S, True),
    ),
    # igfTables.py:172-261
    "sample": _s(
        ("sample_id", L, False), ("sample_igf_id", S, False),
        ("sample_submitter_id", S, True), ("taxon_id", L, True),
        ("scientific_name", S, True), ("species_name", S, True),
        ("phenotype", S, True), ("sex", S, True), ("status", S, False),
        ("biomaterial_type", S, True), ("date_created", T, True),
        ("project_id", L, True),
    ),
    # igfTables.py:264-323
    "platform": _s(
        ("platform_id", L, False), ("platform_igf_id", S, False),
        ("model_name", S, False), ("vendor_name", S, False),
        ("software_name", S, False), ("software_version", S, True),
        ("date_created", T, True),
    ),
    # igfTables.py:326-366
    "flowcell_barcode_rule": _s(
        ("flowcell_rule_id", L, False), ("platform_id", L, True),
        ("flowcell_type", S, True), ("index_1", S, True),
        ("index_2", S, True),
    ),
    # igfTables.py:369-408
    "seqrun": _s(
        ("seqrun_id", L, False), ("seqrun_igf_id", S, False),
        ("reject_run", S, False), ("date_created", T, True),
        ("flowcell_id", S, False), ("platform_id", L, True),
    ),
    # igfTables.py:411-450 (JSON cols as string; from_json on read)
    "seqrun_stats": _s(
        ("seqrun_stats_id", L, False), ("seqrun_id", L, False),
        ("lane_number", S, False), ("bases_mask", S, True),
        ("undetermined_barcodes", S, True), ("known_barcodes", S, True),
        ("undetermined_fastqc", S, True),
    ),
    # igfTables.py:453-676
    "experiment": _s(
        ("experiment_id", L, False), ("experiment_igf_id", S, False),
        ("project_id", L, True), ("sample_id", L, True),
        ("library_name", S, False), ("library_source", S, True),
        ("library_strategy", S, True), ("experiment_type", S, True),
        ("library_layout", S, True), ("status", S, False),
        ("date_created", T, True), ("date_updated", T, True),
        ("platform_name", S, True),
    ),
    # igfTables.py:679-726
    "run": _s(
        ("run_id", L, False), ("run_igf_id", S, False),
        ("experiment_id", L, True), ("seqrun_id", L, True),
        ("status", S, False), ("lane_number", S, False),
        ("date_created", T, True),
    ),
    # igfTables.py:729-760
    "analysis": _s(
        ("analysis_id", L, False), ("project_id", L, True),
        ("analysis_name", S, False), ("analysis_type", S, True),
        ("analysis_description", S, True),
    ),
    # igfTables.py:763-797
    "collection": _s(
        ("collection_id", L, False), ("name", S, False), ("type", S, False),
        ("table", S, True), ("date_stamp", T, True),
    ),
    # igfTables.py:800-854 — NB md5/size are strings in the reference
    "file": _s(
        ("file_id", L, False), ("file_path", S, False),
        ("location", S, True), ("status", S, True), ("md5", S, True),
        ("size", S, True), ("date_created", T, True),
        ("date_updated", T, True),
    ),
    # igfTables.py:857-884
    "collection_group": _s(
        ("collection_group_id", L, False), ("collection_id", L, False),
        ("file_id", L, False),
    ),
    # igfTables.py:887-935
    "pipeline": _s(
        ("pipeline_id", L, False), ("pipeline_name", S, False),
        ("pipeline_db", S, True), ("pipeline_init_conf", S, True),
        ("pipeline_run_conf", S, True), ("pipeline_type", S, True),
        ("is_active", S, True), ("date_stamp", T, True),
    ),
    # igfTables.py:938-982
    "pipeline_seed": _s(
        ("pipeline_seed_id", L, False), ("seed_id", L, False),
        ("seed_table", S, True), ("pipeline_id", L, False),
        ("status", S, False), ("date_stamp", T, True),
    ),
}

# EAV attribute side-tables (igfTables.py:1037-1247): one per parent entity.
ATTRIBUTE_PARENTS = [
    "project", "sample", "experiment", "run", "seqrun", "collection", "file",
]


def attribute_schema(parent: str) -> StructType:
    """Schema of ``{parent}_attribute`` (narrow EAV table)."""
    return _s(
        (f"{parent}_attribute_id", L, False),
        ("attribute_name", S, True),
        ("attribute_value", S, True),
        (f"{parent}_id", L, False),
    )


def validate_enums(
    df: DataFrame,
    table: str,
    extra_domains: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Return rows violating any enum domain of ``table`` with an
    ``enum_violation`` column naming the offending column.

    Spark-side emulation of the reference's SQL Enum CHECK
    (igfTables.py, e.g. :38 status enum). Empty result == valid.
    ``extra_domains`` overrides/extends per-column domains — the
    MODIFY COLUMN ... ENUM(...) migration surface (TableStore
    ``modify_enum``; reference migrations/versions/*, e.g. pipeline
    pipeline_type gaining AIRFLOW/NEXTFLOW).
    """
    doms = dict(ENUMS.get(table, {}))
    if extra_domains:
        doms.update(extra_domains)
    checks = [
        F.when(
            F.col(c).isNotNull() & ~F.col(c).isin(vals), F.lit(c)
        )
        for c, vals in doms.items()
        if c in df.columns
    ]
    if not checks:
        return df.limit(0).withColumn("enum_violation", F.lit(None).cast("string"))
    viol = F.array_compact(F.array(*checks))
    return (
        df.withColumn("enum_violation", viol)
        .filter(F.size("enum_violation") > 0)
        .withColumn("enum_violation", F.array_join("enum_violation", ","))
    )


# --------------------------------------------------------------------------
# Synthetic star schema (driver testdata)
# --------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_READER_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table. Filters/projections push down.

    events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read it as long nanos (legacy conf) and convert to
    a proper timestamp column (micros floor — matches DuckDB epoch_us).

    The unresolved reader DataFrame is memoized per (session, dir,
    table) so repeated queries skip file listing + schema read; plans
    built from it remain independent.
    """
    key = (id(spark), sf_dir, name)
    if key in _READER_CACHE:
        return _READER_CACHE[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    _READER_CACHE[key] = df
    return df


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All synthetic tables, keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each synthetic table as a temp view for spark.sql()."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
