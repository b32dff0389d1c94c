"""Scalar function library (SURVEY §2.7).

All functions are pure Column expressions (JVM-side, whole-stage-codegen
friendly) — no Python UDFs in this module.  Each cites the reference
behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch, tolerant of TIMESTAMP_NTZ inputs.

    Spark 4's ``unix_micros`` rejects TIMESTAMP_NTZ; with the session
    timezone pinned to UTC (session.py) the NTZ->TIMESTAMP cast is
    value-preserving, matching DuckDB ``epoch_us`` on naive timestamps.
    """
    c = F.col(col) if isinstance(col, str) else col
    # "timestamp_ltz" (not "timestamp"): the bare name resolves via
    # spark.sql.timestampType and can mean NTZ, making the cast a no-op
    return F.unix_micros(c.cast("timestamp_ltz"))


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since epoch, tolerant of TIMESTAMP_NTZ (see epoch_us)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp_ltz"))


def rev_comp(col: Column | str) -> Column:
    """DNA reverse complement: upper, ACGT->TGCA translate, reverse.

    Reference: igf_data/utils/sequtils.py:3-14 (also inline
    samplesheet.py:413-417).
    """
    return F.reverse(F.translate(F.upper(F.col(col) if isinstance(col, str) else col), "ACGT", "TGCA"))


def normalize_index(col: Column | str) -> Column:
    """Strip N/n placeholder bases from an index barcode.

    Reference: samplesheet.py:154-156,280 (replace('N','').replace('n','')).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[Nn]", "")


def split_dual_barcode(col: Column | str) -> tuple[Column, Column]:
    """Split ``ACGT..+ACGT..`` dual barcode into (index1, index2).

    Reference regex ``([ATGCN]+)(\\+)?([ATCGN]+)?``
    (check_sequence_index_barcodes.py:266).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_extract(c, r"^([ATGCN]+)", 1),
        F.regexp_extract(c, r"\+([ATGCN]+)$", 1),
    )


def is_g_homopolymer(col: Column | str) -> Column:
    """True when a barcode is all-G (NovaSeq dark-cycle artifact).

    Reference: check_sequence_index_barcodes.py:347 (``^[G]+$``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^G+$")


def synthesize_experiment_id(sample_igf_id: Column | str, platform_model: Column | str) -> Column:
    """``{sample_igf_id}_{platform_model}`` (collect_seqrun_fastq_to_db.py:299-302)."""
    return F.concat_ws("_", F.col(sample_igf_id) if isinstance(sample_igf_id, str) else sample_igf_id,
                       F.col(platform_model) if isinstance(platform_model, str) else platform_model)


def synthesize_run_id(experiment_igf_id: Column | str, flowcell_id: Column | str, lane: Column | str) -> Column:
    """``{experiment_igf_id}_{flowcell_id}_{lane}`` (collect_seqrun_fastq_to_db.py:303-313)."""
    cols = [
        F.col(x) if isinstance(x, str) else x
        for x in (experiment_igf_id, flowcell_id, lane)
    ]
    return F.concat_ws("_", *cols)


def parse_yymmdd(col: Column | str) -> Column:
    """Parse a ``yymmdd`` string into a date with Python's strptime
    century pivot (00-68 -> 20xx, 69-99 -> 19xx).

    Spark's ``to_date(..., 'yyMMdd')`` maps 95 -> 2095 (relative to the
    current century), which diverges from the reference's
    ``datetime.strptime`` semantics — so build the date explicitly.
    """
    c = F.col(col) if isinstance(col, str) else col
    yy = F.substring(c, 1, 2).cast("int")
    year = F.when(yy >= 69, yy + 1900).otherwise(yy + 2000)
    return F.make_date(year, F.substring(c, 3, 2).cast("int"), F.substring(c, 5, 2).cast("int"))


def seqrun_date(seqrun_igf_id: Column | str) -> Column:
    """Parse leading ``yymmdd`` of a seqrun id into a date.

    Reference: igf_data/utils/seqrunutils.py:23-41 (datetime.strptime).
    """
    c = F.col(seqrun_igf_id) if isinstance(seqrun_igf_id, str) else seqrun_igf_id
    return parse_yymmdd(F.substring(c, 1, 6))


def sanitize_sample_name(col: Column | str) -> Column:
    """Replace runs of non-alphanumerics with '-' and trim the ends.

    Reference: reformat_metadata_file.py:295-347.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "[^A-Za-z0-9]+", "-"), "^-+|-+$", "")


def strip_project_user_suffix(col: Column | str) -> Column:
    """``project:user`` -> ``project`` (samplesheet.py:388-389)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, ":").getItem(0)


def normalize_description(col: Column | str) -> Column:
    """Uppercase and ':'->'-' (samplesheet.py:390-392)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.upper(c), ":", "-")


def mapping_ratio(reads: Column | str, total: Column | str) -> Column:
    """reads/total_read (check_sequence_index_barcodes.py:82)."""
    r = F.col(reads) if isinstance(reads, str) else reads
    t = F.col(total) if isinstance(total, str) else total
    return r / t


def pct_of(part: Column | str, whole: Column | str) -> Column:
    """part/whole*100 (check_sequence_index_barcodes.py:86-96)."""
    p = F.col(part) if isinstance(part, str) else part
    w = F.col(whole) if isinstance(whole, str) else whole
    return p / w * F.lit(100.0)


def insert_length(fragment_mean: Column | str, adapter: int = 120) -> Column:
    """fragment_length_distribution_mean - adapter (reformat_metadata_file.py:396-417)."""
    c = F.col(fragment_mean) if isinstance(fragment_mean, str) else fragment_mean
    return c - F.lit(adapter)


def bytes_to_gb(col: Column | str) -> Column:
    """bytes / 1024^3 (disk_usage_utils.py:26-27,135)."""
    c = F.col(col) if isinstance(col, str) else col
    return c / F.lit(1024.0**3)


def is_valid_email(col: Column | str) -> Column:
    """Email shape check (useradaptor.py:10-19)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$")


def path_basename(col: Column | str) -> Column:
    """Filename component of a path (os.path.basename analog,
    collect_seqrun_fastq_to_db.py:434-438)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "/"), -1)


def path_dirname(col: Column | str) -> Column:
    """Directory component of a path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "/[^/]*$", "")


def html_anchor(text: Column | str, url: Column | str) -> Column:
    """Wrap text in an <a href> tag (project_analysis_utils.py:51-93)."""
    t = F.col(text) if isinstance(text, str) else text
    u = F.col(url) if isinstance(url, str) else url
    return F.format_string('<a href="%s">%s</a>', u, t)


def is_tenx_kit_code(col: Column | str) -> Column:
    """10X Genomics index-kit code, e.g. SI-GA-A1 (samplesheet.py:67)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^SI-[GNT][ATN]-[A-Z][0-9]+$")


def password_hash(
    password: Column | str,
    salt: Column | str,
    iterations: int = 100_000,
) -> Column:
    """PBKDF2-HMAC-SHA256 credential hash as a column expression (F17:
    the reference bcrypt-hashes portal passwords row-at-a-time,
    igf_portal useradaptor.py:20-59).  In an analytics engine this is
    the INGEST-side protection for any credential/PII column: hash
    with a per-row salt before the row ever lands in the lake.

    Arrow-batched pandas UDF over hashlib.pbkdf2_hmac (C speed per
    row; there is no JVM builtin for PBKDF2) — NULL password or salt
    hashes to NULL.  Verification is equality against the recomputed
    hash: ``password_hash(candidate, salt) == stored`` as a column
    predicate, no driver round-trip.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    # no inline type hints: postponed-annotation strings can't resolve
    # the locally-imported pd at registration time
    def _pbkdf2_fn(pw, sa):
        import hashlib  # noqa: PLC0415

        def one(p, s):
            if p is None or s is None:
                return None
            return hashlib.pbkdf2_hmac(
                "sha256", p.encode(), s.encode(), iterations
            ).hex()

        return pd.Series([one(p, s) for p, s in zip(pw, sa)])

    _pbkdf2_fn.__annotations__ = {
        "pw": pd.Series, "sa": pd.Series, "return": pd.Series,
    }
    _pbkdf2 = pandas_udf("string")(_pbkdf2_fn)

    p = F.col(password) if isinstance(password, str) else password
    s = F.col(salt) if isinstance(salt, str) else salt
    return _pbkdf2(p, s)
