"""Join operators (SURVEY §2.3).

Anti/semi joins replace the reference's NOT-IN / IN subqueries
(pipelineadaptor.py:533-548, analysis_fastq_fetch_utils.py:97-112);
FK resolution replaces per-row natural-key lookups
(baseadaptor.py:198-266); the fuzzy barcode matcher re-expresses the
row-wise ``_check_index_for_match`` apply
(check_sequence_index_barcodes.py:247-354) as a broadcast join +
case-expression pipeline — no Python in the hot path.

Scale notes: dimension sides of FK joins and known-barcode sets are
small → ``broadcast()`` them explicitly so a 100 TB fact side never
shuffles for them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_management_python_spark.functions import (
    is_g_homopolymer,
    normalize_index,
    rev_comp,
    split_dual_barcode,
)


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` with no key match in ``right`` (NOT-IN subquery,
    pipelineadaptor.py:544-548)."""
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` with a key match in ``right`` (IN subquery,
    analysis_fastq_fetch_utils.py:97-112)."""
    return left.join(right, on=on, how="left_semi")


def exists(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> bool:
    """True when any key of ``left`` appears in ``right``.

    Reference existence checks return one_or_none→bool
    (sampleadaptor.py:252-281, seqrunadaptor.py:231).
    """
    return not semi_join(left, right, on).isEmpty()


def resolve_foreign_key(
    data: DataFrame,
    dim: DataFrame,
    natural_key: str,
    surrogate_key: str,
    drop_natural: bool = True,
    required: bool = False,
) -> DataFrame:
    """Map natural key -> surrogate id via broadcast join with the dim.

    Replaces the reference's per-row lookup loop
    (map_foreign_table_and_store_attribute, baseadaptor.py:198-266)
    with one broadcast hash join — the dim is metadata-sized even when
    the fact side is 100 TB.  ``required=True`` raises if any row fails
    to resolve (the reference raises per row).
    """
    lookup = dim.select(natural_key, surrogate_key).dropDuplicates([natural_key])
    out = data.join(broadcast(lookup), on=natural_key, how="left")
    if required:
        missing = out.filter(F.col(surrogate_key).isNull()).limit(1).count()
        if missing:
            raise ValueError(f"unresolved foreign key for {natural_key!r}")
    if drop_natural:
        out = out.drop(natural_key)
    return out


def tag_existing(
    data: DataFrame, existing: DataFrame, on: str | Sequence[str], tag_col: str = "EXISTS"
) -> DataFrame:
    """Decorate rows with an EXISTS flag vs the target table.

    Reference: ``_tag_existing_collection_data``
    (collectionadaptor.py:485-522) — left join + null test, used to
    filter inserts idempotently.
    """
    keys = [on] if isinstance(on, str) else list(on)
    marker = existing.select(*keys).dropDuplicates(keys).withColumn("__hit__", F.lit(1))
    return (
        data.join(broadcast(marker), on=keys, how="left")
        .withColumn(tag_col, F.col("__hit__").isNotNull())
        .drop("__hit__")
    )


# ---------------------------------------------------------------------------
# J9 — fuzzy index-barcode matching (the reference's only nontrivial join)
# ---------------------------------------------------------------------------

_MATCH_TAGS = [
    "mix_index_match",
    "index_1_revcomp",
    "only_index_1_revcomp",
    "index_1_and_index_2_revcomp",
    "only_index_2_revcomp",
    "index_1_G_homopolymer",
]


def fuzzy_barcode_match(
    unknown: DataFrame,
    known: DataFrame,
    index_col: str = "index",
    lane_col: str = "lane",
    tag_col: str = "tag",
) -> DataFrame:
    """Retag unknown barcodes that fuzzily match a known barcode in the
    same lane.

    Re-expresses ``_check_index_for_match``
    (check_sequence_index_barcodes.py:247-354): for each unknown
    (lane, barcode) test against every known barcode of that lane —
    exact-after-truncation (6 vs 8bp kits), index1 reverse-complement,
    dual-index revcomp combinations, and the homopolymer-G artifact —
    and replace ``tag`` with the match class.  The reference does this
    as a Pandas row apply (quadratic, single-threaded); here the known
    set (O(#samples), tiny) is broadcast and the six cases are column
    predicates evaluated in codegen, so the unknown side streams
    through one broadcast join at any scale.

    Output: ``unknown`` with ``tag`` replaced where matched.
    """
    u1, u2 = split_dual_barcode(F.col(index_col))
    k1, k2 = split_dual_barcode(F.col("__k_index"))

    # match per DISTINCT (lane, barcode) — a deterministic key (row ids
    # would be nondeterministic across plan branches); duplicates of the
    # same barcode in a lane correctly share one match verdict
    u = (
        unknown.select(F.col(lane_col), F.col(index_col))
        .dropDuplicates([lane_col, index_col])
        .withColumn("__u1", normalize_index(u1))
        .withColumn("__u2", normalize_index(u2))
    )
    k = (
        known.select(
            F.col(lane_col).alias("__k_lane"),
            F.col(index_col).alias("__k_index"),
        )
        .withColumn("__k1", normalize_index(k1))
        .withColumn("__k2", normalize_index(k2))
        .dropDuplicates(["__k_lane", "__k1", "__k2"])
    )

    min_len = F.least(F.length("__u1"), F.length("__k1"))
    u1t = F.expr("substring(__u1, 1, least(length(__u1), length(__k1)))")
    k1t = F.expr("substring(__k1, 1, least(length(__u1), length(__k1)))")

    match_tag = (
        F.when(
            (F.length("__u1") != F.length("__k1")) & (min_len >= 6) & (u1t == k1t),
            F.lit("mix_index_match"),
        )
        .when(
            (rev_comp(F.col("__u1")) == F.col("__k1"))
            & (F.col("__u2") == F.col("__k2"))
            & (F.col("__k2") != ""),
            F.lit("index_1_revcomp"),
        )
        .when(
            (rev_comp(F.col("__u1")) == F.col("__k1")) & (F.col("__k2") == ""),
            F.lit("only_index_1_revcomp"),
        )
        .when(
            (rev_comp(F.col("__u1")) == F.col("__k1"))
            & (rev_comp(F.col("__u2")) == F.col("__k2"))
            & (F.col("__k2") != ""),
            F.lit("index_1_and_index_2_revcomp"),
        )
        .when(
            (F.col("__u1") == F.col("__k1"))
            & (rev_comp(F.col("__u2")) == F.col("__k2"))
            & (F.col("__k2") != ""),
            F.lit("only_index_2_revcomp"),
        )
        .when(is_g_homopolymer(F.col("__u1")), F.lit("index_1_G_homopolymer"))
        .otherwise(F.lit(None))
    )

    matched = (
        u.join(broadcast(k), on=(F.col(lane_col) == F.col("__k_lane")), how="left")
        .withColumn("__match", match_tag)
        .groupBy(lane_col, index_col)
        .agg(F.max("__match").alias("__match"))
    )

    return (
        unknown.join(broadcast(matched), on=[lane_col, index_col], how="left")
        .withColumn(tag_col, F.coalesce(F.col("__match"), F.col(tag_col)))
        .drop("__match")
    )
