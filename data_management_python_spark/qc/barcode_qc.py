"""Barcode QC pipeline (SURVEY §7 step 7).

End-to-end re-expression of
igf_data/process/data_qc/check_sequence_index_barcodes.py: flatten
demux stats -> per-lane known/unknown split -> fuzzy retag of unknown
barcodes that match known ones (J9) -> pivot summaries -> pass/fail
gates.  The reference does this per-run in Pandas with a quadratic row
apply (:145-149, :247-354); this version is one declarative plan whose
heavy step is a broadcast join, so a whole fleet of runs QCs in one
job.

Gates (reference :225-241):
  - min(known mapping_ratio) must exceed max(unknown mapping_ratio)
  - known read percentage >= threshold (default 80)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_management_python_spark.operators.joins import fuzzy_barcode_match
from data_management_python_spark.sources.stats_json import with_mapping_stats


def retag_unknown_barcodes(
    stats: DataFrame, platform_name: str | None = None
) -> DataFrame:
    """Apply the fuzzy matcher to unknown rows; known rows pass through.

    Matches the reference guards: barcodes at or below the mapping-ratio
    threshold stay untouched, and the all-G retag only applies on
    two-color platforms (platform_name in NEXTSEQ/NOVASEQ6000,
    check_sequence_index_barcodes.py:248-265).
    """
    from data_management_python_spark.operators.joins import (  # noqa: PLC0415
        G_HOMOPOLYMER_PLATFORMS,
    )

    enriched = with_mapping_stats(stats)
    known = enriched.filter(F.col("tag") == "known")
    unknown = enriched.filter(F.col("tag") == "unknown")
    # unknown barcodes that EXACTLY match a known index of the lane are
    # dropped from the stats entirely (reference :143-145 isin filter) —
    # they are demux artifacts, counted in neither group
    unknown = unknown.join(
        known.select("lane", "index").distinct(),
        on=["lane", "index"],
        how="left_anti",
    )
    retagged = fuzzy_barcode_match(
        unknown,
        known,
        index_col="index",
        lane_col="lane",
        tag_col="tag",
        mapping_ratio_col="mapping_ratio",
        check_g_homopolymer=platform_name in G_HOMOPOLYMER_PLATFORMS,
    )
    cols = stats.columns
    return known.select(*cols).unionByName(retagged.select(*cols))


def summarize_by_tag(stats: DataFrame) -> DataFrame:
    """(tag, lane, runid) -> total reads (reference pivot :153-155)."""
    return stats.groupBy("tag", "lane", "runid").agg(
        F.sum("reads").alias("reads")
    )


def lane_gate_report(stats: DataFrame, min_known_pct: float = 80.0) -> DataFrame:
    """Per (runid, lane): known/unknown totals, percentages, ratio gate,
    and the overall pass flag.

    Faithful to the reference (:152-167, :225-241): only the literal
    'known' and 'unknown' groups feed the counts, percentages and the
    mapping-ratio gate — retagged classes (mix_index_match, *_revcomp,
    G-homopolymer) are excluded from both sides.
    """
    enriched = with_mapping_stats(stats)
    per_lane = enriched.groupBy("runid", "lane").agg(
        F.sum(F.when(F.col("tag") == "known", F.col("reads")).otherwise(0)).alias(
            "known_read"
        ),
        F.sum(F.when(F.col("tag") == "unknown", F.col("reads")).otherwise(0)).alias(
            "unknown_read"
        ),
        F.min(
            F.when(F.col("tag") == "known", F.col("mapping_ratio"))
        ).alias("min_known_ratio"),
        F.max(
            F.when(F.col("tag") == "unknown", F.col("mapping_ratio"))
        ).alias("max_unknown_ratio"),
    )
    total = F.col("known_read") + F.col("unknown_read")
    return (
        per_lane.withColumn("known_pct", F.col("known_read") / total * 100.0)
        .withColumn("unknown_pct", F.col("unknown_read") / total * 100.0)
        .withColumn(
            "ratio_gate_ok",
            F.coalesce(
                F.col("min_known_ratio") >= F.col("max_unknown_ratio"), F.lit(True)
            ),
        )
        .withColumn("pct_gate_ok", F.col("known_pct") >= min_known_pct)
        .withColumn("qc_pass", F.col("ratio_gate_ok") & F.col("pct_gate_ok"))
    )


def barcode_qc(
    stats: DataFrame,
    min_known_pct: float = 80.0,
    platform_name: str | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline: retag -> summaries + gates.  Returns
    {'retagged', 'by_tag', 'lane_report'} DataFrames."""
    retagged = retag_unknown_barcodes(stats, platform_name=platform_name)
    return {
        "retagged": retagged,
        "by_tag": summarize_by_tag(retagged),
        "lane_report": lane_gate_report(retagged, min_known_pct),
    }
