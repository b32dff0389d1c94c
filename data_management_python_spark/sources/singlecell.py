"""10X single-cell samplesheet processing.

The reference substitutes 10X index-kit codes (``SI-GA-A1`` style) with
their four constituent barcodes, expanding each 10X sample row to four
rows with Original_Sample_* audit columns
(igf_data/process/singlecell_seqrun/processsinglecellsamplesheet.py:
119-271, _replace_sc_dual_barcodes kit lookup JSON).

Spark-first: the kit map is a broadcast literal map; expansion is
explode over the looked-up barcode array — map-only, no UDF.  The kit
table here is a small representative set; a production deployment loads
the full 10X kit JSON into the same (kit_code -> [barcodes]) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_python_spark.functions import is_tenx_kit_code

# Representative 10X kit entries (kit code -> 4 barcodes), same shape as
# the reference's chromium index JSON lookup.
TENX_KIT_BARCODES: dict[str, list[str]] = {
    "SI-GA-A1": ["GGTTTACT", "CTAAACGG", "TCGGCGTC", "AACCGTAA"],
    "SI-GA-A2": ["TTTCATGA", "ACGTCCCT", "CGCATGTG", "GAAGGAAC"],
    "SI-GA-B1": ["GTAATCTT", "TCCGGAAG", "AGTTCGGC", "CAGCATCA"],
    "SI-NA-A1": ["AAACGGCG", "CCTACCAT", "GGCGTTTC", "TTGTAAGA"],
}


def expand_tenx_barcodes(
    sheet: DataFrame,
    index_col: str = "index",
    id_col: str = "Sample_ID",
    name_col: str = "Sample_Name",
    kit_map: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Expand 10X kit-coded rows to one row per constituent barcode.

    Non-10X rows pass through unchanged.  Expanded rows get
    ``Original_Sample_ID``/``Original_Sample_Name`` plus a numbered
    Sample_ID suffix, mirroring the reference's audit columns
    (processsinglecellsamplesheet.py:177-271).
    """
    kits = kit_map or TENX_KIT_BARCODES
    mapping = F.create_map(
        *[x for code, bcs in sorted(kits.items())
          for x in (F.lit(code), F.array(*[F.lit(b) for b in bcs]))]
    )
    has_name = name_col in sheet.columns
    base = sheet.withColumn("__bcs", mapping[F.col(index_col)])

    plain = base.filter(F.col("__bcs").isNull()).drop("__bcs").withColumn(
        "Original_Sample_ID", F.lit(None).cast("string")
    )
    if has_name:
        plain = plain.withColumn("Original_Sample_Name", F.lit(None).cast("string"))

    # kit-shaped codes absent from the kit map must fail fast — the
    # reference raises for any 10X index not found in its lookup JSON
    # (processsinglecellsamplesheet.py:258-260); passing them through
    # would feed a literal 'SI-GA-xx' string to the demultiplexer
    unmapped = base.filter(
        F.col("__bcs").isNull() & is_tenx_kit_code(F.col(index_col))
    )
    if not unmapped.isEmpty():
        bad = unmapped.select(index_col).first()[0]
        raise ValueError(f"10X kit code not found in kit table: {bad!r}")

    tenx = base.filter(F.col("__bcs").isNotNull())
    expanded = (
        tenx.select(
            "*", F.posexplode("__bcs").alias("__pos", "__bc")
        )
        .withColumn("Original_Sample_ID", F.col(id_col))
        .withColumn(
            id_col, F.concat_ws("_", F.col(id_col), (F.col("__pos") + 1))
        )
        .withColumn(index_col, F.col("__bc"))
    )
    if has_name:
        expanded = expanded.withColumn("Original_Sample_Name", F.col(name_col)) \
            .withColumn(name_col, F.concat_ws("_", F.col(name_col), (F.col("__pos") + 1)))
    expanded = expanded.drop("__bcs", "__pos", "__bc")
    return plain.unionByName(expanded.select(*plain.columns))
