"""SQL-surface parity: the ANSI subset of the oracle SQL runs on
Spark SQL itself (via catalog.register_views) and returns exactly what
the DataFrame implementations return.

This is the "users can keep their SQL" guarantee: every query here is
the same string the DuckDB oracle executes — no Spark-specific
rewrite — so reports written against the reference's relational model
port verbatim.  (DuckDB-dialect oracles — list_* lambdas, UNNEST
tricks — are exercised by tools/selfcheck.py instead.)
"""

from __future__ import annotations

import math

import pytest

from data_management_python_spark.catalog import register_views
from data_management_python_spark.plans import collect_queries

SF_DIR = "/root/testdata/sf0.001"

# oracles that are pure ANSI (parse and evaluate identically on Spark)
PORTABLE = [
    "p1_eq_filter",
    "p2_conjunctive_filter",
    "p4_in_filter",
    "p5_notin_anti_filter",
    "p6_null_disjunction",
    "p7_like_prefix",
    "j1_readcount_multiway",
    "j2_join_distinct",
    "j3_leftouter_group_agg",
    "j5_semi_join",
    "j6_nonfk_equi_join",
    "a1_group_max_sum",
    "a2_grouped_sum_multikey",
    "a5_minmax_gate",
    "a8_distinct",
    "a15_count_distinct",
    "o2_topk",
    "u1_union_all",
    "u2_except",
    "q3_topk_revenue",
    "w_rank_per_group",
    "w_running_total",
    "tj_range_join",
    # round-6: the write-substrate twins' oracles are plain ANSI —
    # running them on Spark SQL against the raw tables must equal the
    # store-backed DataFrame result (the "users keep their SQL" bar
    # for the new default-bucketed EAV path and the typed-state twin)
    "m_eav_bucketed_store",
    "s_user_event_profile",
]


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(_canon(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(out)


@pytest.fixture(scope="module")
def sql_env(spark):
    register_views(spark, SF_DIR)
    return collect_queries()


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(spark, sql_env, name):
    q = sql_env[name]
    assert q.oracle, f"{name} has no oracle SQL"
    got_cols, got = _rows(spark.sql(q.oracle))
    exp_cols, exp = _rows(q.fn(spark, SF_DIR))
    assert got_cols == exp_cols
    assert got == exp
