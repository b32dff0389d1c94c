"""Scalar function tests — semantics mirror the reference
(sequtils rev_comp, samplesheet index ops, seqrun date parse, etc.)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_management_python_spark import functions as fn
from data_management_python_spark.catalog import validate_enums


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_rev_comp(spark):
    # reference sequtils.py:3-14: revcomp('ATGC') == 'GCAT'
    df = spark.createDataFrame([("ATGC",), ("acgtN",)], "seq string")
    out = [r.v for r in df.select(fn.rev_comp("seq").alias("v")).collect()]
    assert out[0] == "GCAT"
    assert out[1] == "NACGT"


def test_normalize_index(spark):
    df = spark.createDataFrame([("ACGTNN",), ("nACGT",)], "i string")
    out = [r.v for r in df.select(fn.normalize_index("i").alias("v")).collect()]
    assert out == ["ACGT", "ACGT"]


def test_split_dual_barcode(spark):
    df = spark.createDataFrame([("ACGT+TTTT",), ("ACGT",)], "b string")
    i1, i2 = fn.split_dual_barcode("b")
    rows = df.select(i1.alias("a"), i2.alias("b2")).collect()
    assert (rows[0].a, rows[0].b2) == ("ACGT", "TTTT")
    assert (rows[1].a, rows[1].b2) == ("ACGT", "")


def test_g_homopolymer(spark):
    df = spark.createDataFrame([("GGGG",), ("GAGG",)], "b string")
    out = [r.v for r in df.select(fn.is_g_homopolymer("b").alias("v")).collect()]
    assert out == [True, False]


def test_id_synthesis(spark):
    # collect_seqrun_fastq_to_db.py:299-313 conventions
    df = spark.createDataFrame(
        [("IGF00001", "MISEQ", "000000000-D0YLK", "1")],
        "sample string, platform string, fc string, lane string",
    )
    exp = fn.synthesize_experiment_id("sample", "platform")
    run = fn.synthesize_run_id(exp, "fc", "lane")
    r = df.select(exp.alias("e"), run.alias("r")).collect()[0]
    assert r.e == "IGF00001_MISEQ"
    assert r.r == "IGF00001_MISEQ_000000000-D0YLK_1"


def test_seqrun_date_century_pivot(spark):
    # seqrunutils.py:23-41: strptime('%y%m%d') — 171003 -> 2017, 951003 -> 1995
    df = spark.createDataFrame(
        [("171003_M00001_0089_000000000-TEST",), ("951003_M1_1_FC",)], "s string"
    )
    out = [r.v for r in df.select(fn.seqrun_date("s").alias("v")).collect()]
    assert out == [datetime.date(2017, 10, 3), datetime.date(1995, 10, 3)]


def test_sanitize_sample_name(spark):
    # reformat_metadata_file.py:295-347
    df = spark.createDataFrame([("My Sample!!Name_1 ",), ("--x--",)], "n string")
    out = [r.v for r in df.select(fn.sanitize_sample_name("n").alias("v")).collect()]
    assert out == ["My-Sample-Name-1", "x"]


def test_project_suffix_and_description(spark):
    df = spark.createDataFrame([("IGFP001:user1", "10x:a")], "p string, d string")
    r = df.select(
        fn.strip_project_user_suffix("p").alias("p"),
        fn.normalize_description("d").alias("d"),
    ).collect()[0]
    assert r.p == "IGFP001" and r.d == "10X-A"


def test_is_tenx_kit_code(spark):
    df = spark.createDataFrame([("SI-GA-A1",), ("ACGTACGT",)], "i string")
    out = [r.v for r in df.select(fn.is_tenx_kit_code("i").alias("v")).collect()]
    assert out == [True, False]


def test_email_and_paths(spark):
    df = spark.createDataFrame(
        [("a@b.com", "/path/to/file.fastq.gz")], "e string, p string"
    )
    r = df.select(
        fn.is_valid_email("e").alias("ok"),
        fn.path_basename("p").alias("b"),
        fn.path_dirname("p").alias("d"),
    ).collect()[0]
    assert r.ok is True and r.b == "file.fastq.gz" and r.d == "/path/to"


def test_validate_enums(spark):
    df = spark.createDataFrame(
        [(1, "ACTIVE", "FASTQ"), (2, "BOGUS", "FASTQ"), (3, "ACTIVE", "NOPE")],
        "project_id long, status string, deliverable string",
    )
    bad = validate_enums(df, "project").collect()
    viol = {r.project_id: r.enum_violation for r in bad}
    assert viol == {2: "status", 3: "deliverable"}


def test_password_hash_pbkdf2_parity_and_verification(spark):
    """Column PBKDF2 matches hashlib exactly; verification is a plain
    column predicate; NULLs hash to NULL."""
    import hashlib

    from pyspark.sql import functions as F

    from data_management_python_spark.functions import password_hash

    df = spark.createDataFrame(
        [("hunter2", "salt-a"), ("pässwörd", "salt-b"), (None, "salt-c")],
        "pw string, salt string",
    )
    got = df.select(
        "pw", "salt", password_hash("pw", "salt", iterations=1000).alias("h")
    ).collect()
    by_salt = {r.salt: r for r in got}
    for pw, salt in [("hunter2", "salt-a"), ("pässwörd", "salt-b")]:
        want = hashlib.pbkdf2_hmac(
            "sha256", pw.encode(), salt.encode(), 1000
        ).hex()
        assert by_salt[salt].h == want
    assert by_salt["salt-c"].h is None

    stored = df.filter(F.col("pw").isNotNull()).select(
        "salt", password_hash("pw", "salt", iterations=1000).alias("stored")
    )
    attempt = spark.createDataFrame(
        [("hunter2", "salt-a"), ("wrong", "salt-b")], "cand string, salt string"
    )
    ok = (
        attempt.join(stored, "salt")
        .select(
            "salt",
            (
                password_hash("cand", "salt", iterations=1000)
                == F.col("stored")
            ).alias("ok"),
        )
        .collect()
    )
    assert {r.salt: r.ok for r in ok} == {"salt-a": True, "salt-b": False}
