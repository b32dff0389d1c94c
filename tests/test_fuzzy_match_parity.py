"""Fuzzy barcode matcher parity against the reference's CASE semantics
(check_sequence_index_barcodes.py:247-354), case by case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_management_python_spark.operators.joins import fuzzy_barcode_match


def run_match(spark, unknown_idx, known_idx, ratio=1.0, homopolymer=False):
    unknown = spark.createDataFrame(
        [(1, unknown_idx, "unknown", ratio)],
        "lane int, index string, tag string, mapping_ratio double",
    )
    known = spark.createDataFrame(
        [(1, k, "known") for k in known_idx], "lane int, index string, tag string"
    )
    out = fuzzy_barcode_match(
        unknown, known,
        mapping_ratio_col="mapping_ratio",
        check_g_homopolymer=homopolymer,
    )
    return out.collect()[0].tag


CASES = [
    # CASE 1: equal-length exact index1
    ("AAAAAAAA", ["AAAAAAAA+TATAGCCT"], "mix_index_match"),     # one side single
    ("AAAAAAAA+TATAGCCT", ["AAAAAAAA"], "mix_index_match"),
    ("AAAAAAAA+TATAGCCT", ["AAAAAAAA+TATAGCCT"], "known"),      # exact dual
    ("AAAAAAAA+CCCCCCCC", ["AAAAAAAA+TATAGCCT"], "unknown"),    # index2 differs both ways
    # CASE 2: unknown shorter, truncation match (incl. index2 when dual)
    ("AAAAAA", ["AAAAAAGG+TATAGCCT"], "mix_index_match"),
    ("AAAAAA+TATAGC", ["AAAAAAGG+TATAGCCT"], "mix_index_match"),
    ("AAAAAA+CCCCCC", ["AAAAAAGG+TATAGCCT"], "unknown"),        # index2 slice mismatch
    ("AAAA", ["AAAAGGGG+TATAGCCT"], "mix_index_match"),         # no min-6 guard
    # CASE 3: unknown longer
    ("AAAAAAGG+TATAGCCT", ["AAAAAA+TATAGC"], "mix_index_match"),
    ("AAAAAAGG", ["AAAAAA+TATAGCCT"], "mix_index_match"),
    # CASE 4: revcomp variants
    ("CGAGTAAT+TATAGCCT", ["ATTACTCG+TATAGCCT"], "only_index_1_revcomp"),
    ("CGAGTAAT+AGGCTATA", ["ATTACTCG+TATAGCCT"], "index_1_and_index_2_revcomp"),
    ("CGAGTAAT+CCCCCCCC", ["ATTACTCG+TATAGCCT"], "index_1_revcomp"),
    ("CGAGTAAT", ["ATTACTCG"], "index_1_revcomp"),
    # CASE 5 (reference intent; dead code there): index2-only revcomp
    ("ATTACTCG+AGGCTATA", ["ATTACTCG+TATAGCCT"], "only_index_2_revcomp"),
    # no match at all
    ("GTGTGTGT+GTGTGTGT", ["ATTACTCG+TATAGCCT"], "unknown"),
]


@pytest.mark.parametrize("u,k,expected", CASES)
def test_case_semantics(spark, u, k, expected):
    assert run_match(spark, u, k) == expected


def test_priority_most_informative_wins(spark):
    # matches known A as mix_index_match and known B exactly -> 'known' wins
    tag = run_match(
        spark, "AAAAAAAA+TATAGCCT",
        ["AAAAAAAA", "AAAAAAAA+TATAGCCT"],
    )
    assert tag == "known"


def test_mapping_ratio_guard(spark):
    # below-threshold barcodes are never retagged (reference :265)
    assert run_match(spark, "CGAGTAAT+TATAGCCT", ["ATTACTCG+TATAGCCT"],
                     ratio=0.00005) == "unknown"


def test_homopolymer_platform_gate(spark):
    assert run_match(spark, "GGGGGGGG+GGGGGGGG", ["ATTACTCG+TATAGCCT"],
                     homopolymer=True) == "index_1_G_homopolymer"
    assert run_match(spark, "GGGGGGGG+GGGGGGGG", ["ATTACTCG+TATAGCCT"],
                     homopolymer=False) == "unknown"
