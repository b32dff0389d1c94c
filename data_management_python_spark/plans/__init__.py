"""Query plans: the engine's operator inventory expressed as runnable
queries over the driver's synthetic star schema (FIXTURES.md §7 mapping),
each paired with an ANSI-SQL oracle for DuckDB hash-matching.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One operator query: a Spark plan + its DuckDB oracle SQL.

    ``oracle`` None => not SQL-expressible; the driver records a
    rows-only check.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def collect_queries() -> dict[str, Query]:
    """All registered queries across plan modules."""
    from data_management_python_spark.plans import cosmx_queries  # noqa: PLC0415
    from data_management_python_spark.plans import relational  # noqa: PLC0415
    from data_management_python_spark.llmdata import queries as llm  # noqa: PLC0415

    out: dict[str, Query] = {}
    for mod in (relational, llm, cosmx_queries):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
