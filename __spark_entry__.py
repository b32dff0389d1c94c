"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (5-way star join + grouped
aggregate — the Spark re-expression of the reference's
get_project_read_count, projectutils.py:46-71) on sf0.001.

``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-data operators; pairs are hash-matched against
DuckDB by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_management_python_spark.plans import collect_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = collect_queries()
    return qs["j1_readcount_multiway"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ llmdata)."""
    return {name: q.fn for name, q in collect_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return {
        name: q.oracle for name, q in collect_queries().items() if q.oracle is not None
    }
