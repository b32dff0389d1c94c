"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "n_name", "n_lines", "sum_qty", "revenue"} <= set(df.columns)


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # every query runs and yields a stable schema at smoke scale
    for name in ["p1_eq_filter", "a3_pivot_matrix", "d_minhash_lsh"]:
        df = qs[name](spark, SF_DIR)
        assert df.columns == qs[name](spark, SF_DIR).columns
        assert df.count() >= 0
