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


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    null_safe: bool = False,
) -> DataFrame:
    """Rows of ``left`` with no key match in ``right`` (NOT-IN subquery,
    pipelineadaptor.py:544-548).

    ``null_safe=True`` matches NULL keys to NULL keys (SQL
    ``IS NOT DISTINCT FROM``) — the uniqueness notion DISTINCT and
    uniq constraints use.  Exactly-once dedup paths need it: under
    plain equality a NULL-keyed row NEVER matches its stored twin and
    re-inserts on every run (round-7 review finding, fixed for the
    EAV store and insert_if_absent alike)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    keys = [on] if isinstance(on, str) else list(on)
    if not null_safe:
        return left.join(right, on=keys, how="left_anti")
    lhs = left.alias("__aj_l")
    rhs = right.alias("__aj_r")
    cond = None
    for k in keys:
        c = F.col(f"__aj_l.{k}").eqNullSafe(F.col(f"__aj_r.{k}"))
        cond = c if cond is None else (cond & c)
    return lhs.join(rhs, on=cond, how="left_anti")


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

# deterministic precedence when one unknown barcode matches several known
# barcodes with different classes (the reference's per-row loop is
# last-match-wins over samplesheet order — order-dependent; we pick the
# most informative class instead, documented deviation)
_TAG_PRIORITY = [
    "known",
    "mix_index_match",
    "only_index_1_revcomp",
    "index_1_and_index_2_revcomp",
    "index_1_revcomp",
    "only_index_2_revcomp",
]

G_HOMOPOLYMER_PLATFORMS = ("NEXTSEQ", "NOVASEQ6000")


def fuzzy_barcode_match(
    unknown: DataFrame,
    known: DataFrame,
    index_col: str = "index",
    lane_col: str = "lane",
    tag_col: str = "tag",
    mapping_ratio_col: str | None = None,
    mapping_ratio_th: float = 0.0001,
    check_g_homopolymer: bool = False,
) -> DataFrame:
    """Retag unknown barcodes that fuzzily match a known barcode in the
    same lane — faithful re-expression of ``_check_index_for_match``
    (check_sequence_index_barcodes.py:247-354):

      CASE 1  equal-length exact index1: 'mix_index_match' when either
              side is single-index; 'known' when index2 also matches.
      CASE 2/3 truncation match (shorter side vs sliced longer side),
              index2 sliced and compared too when both are dual.
      CASE 4  revcomp(index1) == known index1: 'index_1_revcomp' base;
              'only_index_1_revcomp' when index2 matches exactly;
              'index_1_and_index_2_revcomp' when index2 also revcomps.
      CASE 5  index1 exact + revcomp(index2) match:
              'only_index_2_revcomp'.  (Dead code in the reference —
              CASE 1 shadows it; implemented here as evidently intended,
              at lowest match priority.)
      CASE 6  all-G index1 -> 'index_1_G_homopolymer', only on two-color
              platforms (``check_g_homopolymer``; reference gates on
              platform_name in NEXTSEQ/NOVASEQ6000) and only when no
              other case matched.

    Rows with ``mapping_ratio <= mapping_ratio_th`` are never retagged
    (reference :265).  The reference resolves multiple matching knowns
    by list order; this version uses the deterministic ``_TAG_PRIORITY``.

    The known set (O(#samples), tiny) is broadcast; the six cases are
    column predicates in codegen, so the unknown side streams through
    one broadcast join at any scale.  Output: ``unknown`` with ``tag``
    replaced where matched.
    """
    u1e, u2e = split_dual_barcode(F.col(index_col))
    k1e, k2e = split_dual_barcode(F.col("__k_index"))

    u = (
        unknown.select(F.col(lane_col), F.col(index_col))
        .dropDuplicates([lane_col, index_col])
        .withColumn("__u1", F.trim(u1e))
        .withColumn("__u2", F.trim(u2e))
    )
    k = (
        known.select(
            F.col(lane_col).alias("__k_lane"),
            F.col(index_col).alias("__k_index"),
        )
        .withColumn("__k1", F.trim(k1e))
        .withColumn("__k2", F.trim(k2e))
        .dropDuplicates(["__k_lane", "__k1", "__k2"])
    )

    u1, u2 = F.col("__u1"), F.col("__u2")
    k1, k2 = F.col("__k1"), F.col("__k2")
    both_dual = (u2 != "") & (k2 != "")
    either_single = (u2 == "") | (k2 == "")

    # CASE 2/3 slices: shorter side compared against the sliced longer
    # side, on index1 always and on index2 when both are dual
    u1s = u1.substr(F.lit(1), F.least(F.length(u1), F.length(k1)))
    k1s = k1.substr(F.lit(1), F.least(F.length(u1), F.length(k1)))
    u2s = u2.substr(F.lit(1), F.least(F.length(u2), F.length(k2)))
    k2s = k2.substr(F.lit(1), F.least(F.length(u2), F.length(k2)))

    case1 = (F.length(u1) == F.length(k1)) & (u1 == k1)
    case1_tag = F.when(either_single, F.lit("mix_index_match")).when(
        both_dual & (u2 == k2), F.lit("known")
    )
    trunc = (F.length(u1) != F.length(k1)) & (u1s == k1s)
    case23_tag = F.when(
        trunc & (F.when(both_dual, u2s == k2s).otherwise(F.lit(True))),
        F.lit("mix_index_match"),
    )
    rc1 = rev_comp(u1) == k1
    case4_tag = (
        F.when(rc1 & both_dual & (u2 == k2), F.lit("only_index_1_revcomp"))
        .when(rc1 & both_dual & (rev_comp(u2) == k2), F.lit("index_1_and_index_2_revcomp"))
        .when(rc1, F.lit("index_1_revcomp"))
    )
    case5_tag = F.when(
        both_dual & (u1 == k1) & (u2 != k2) & (rev_comp(u2) == k2),
        F.lit("only_index_2_revcomp"),
    )

    # CASE 1 may produce no tag (dual barcodes whose index2 differs both
    # ways) — CASE 5 is the fallback for exactly that state; CASE 2-4
    # only apply when CASE 1's condition is false
    pair_tag = F.coalesce(
        F.when(case1, case1_tag),
        F.when(~case1, F.coalesce(case23_tag, case4_tag)),
        case5_tag,
    )
    rank_map = F.create_map(
        *[x for i, t in enumerate(_TAG_PRIORITY) for x in (F.lit(t), F.lit(i))]
    )
    unrank_map = F.create_map(
        *[x for i, t in enumerate(_TAG_PRIORITY) for x in (F.lit(i), F.lit(t))]
    )

    matched = (
        u.join(broadcast(k), on=(F.col(lane_col) == F.col("__k_lane")), how="left")
        .withColumn("__rank", rank_map[pair_tag])
        .groupBy(lane_col, index_col)
        .agg(F.min("__rank").alias("__rank"))
        .withColumn("__match", unrank_map[F.col("__rank")])
        .drop("__rank")
    )

    out = unknown.join(matched, on=[lane_col, index_col], how="left")
    eligible = (
        F.col(mapping_ratio_col) > mapping_ratio_th
        if mapping_ratio_col
        else F.lit(True)
    )
    new_tag = F.coalesce(F.col("__match"), F.col(tag_col))
    if check_g_homopolymer:
        homo = F.regexp_extract(F.col(index_col), r"^([ATGCN]+)", 1).rlike("^G+$")
        new_tag = F.coalesce(
            F.col("__match"),
            F.when(homo, F.lit("index_1_G_homopolymer")),
            F.col(tag_col),
        )
    return out.withColumn(
        tag_col,
        F.when(eligible & (F.col(tag_col) == "unknown"), new_tag).otherwise(
            F.col(tag_col)
        ),
    ).drop("__match")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small.

    When one join key carries a disproportionate share of the big side
    (hot customer, empty-string barcode, null-ish sentinel), the plain
    shuffle join lands that key's entire volume on one task.  Salting
    splits it ``salts`` ways: the big side gets a salt derived from the
    WHOLE row (so rows sharing the hot key spread across salts), the
    small side is replicated once per salt value (a bounded explode of
    the smaller input), and the join key becomes (key, salt).  Results
    are identical to the plain join — each big row still meets every
    matching small row exactly once — which is what the oracle checks.

    AQE's skew-join split handles sort-merge skew automatically; this
    operator is for when you need the spread *before* an aggregation
    or with a hinted shuffle-hash join where AQE skew handling does
    not apply.  ``how`` supports inner/left (each big row appears once
    per match as usual; left keeps unmatched big rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    big2 = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    small2 = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salts - 1)))
    )
    # shuffle-hash hint: the replicated small side builds the hash map,
    # sparing both sides the sort-merge sort (salting already bounded
    # the per-task build size — that was its purpose)
    return big2.join(
        small2.hint("shuffle_hash"), on=[*keys, "__salt"], how=how
    ).drop("__salt")
