"""Filter/predicate builders (SURVEY §2.2).

The reference's generic query surface is equality/IN filtering built
imperatively over SQLAlchemy (BaseAdaptor._construct_query,
igf_data/igfdb/baseadaptor.py:385-418; fetch_records_by_column :450-475;
fetch_records_by_multiple_column :478-504).  Here the same surface is a
predicate-expression builder — Catalyst pushes the result down to the
parquet scan (PushedFilters), so these are zero-cost abstractions.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "in": lambda c, v: c.isin(list(v)),
    "not in": lambda c, v: ~c.isin(list(v)),
    "like": lambda c, v: c.like(v),
    "startswith": lambda c, v: c.startswith(v),
    "is null": lambda c, v: c.isNull(),
    "is not null": lambda c, v: c.isNotNull(),
}


def build_predicate(conditions: Iterable[tuple[str, str, Any]]) -> Column:
    """[(column, op, value), ...] -> conjunctive Column predicate.

    Superset of the reference's 3-tuple builder (baseadaptor.py:385-418,
    which supports only ``==``); ops: ==, !=, <, <=, >, >=, in, not in,
    like, startswith, is null, is not null.
    """
    pred: Column | None = None
    for col, op, val in conditions:
        key = op.lower()
        if key not in _OPS:
            raise ValueError(f"unsupported predicate op: {op!r}")
        term = _OPS[key](F.col(col), val)
        pred = term if pred is None else (pred & term)
    if pred is None:
        raise ValueError("empty condition list")
    return pred


def filter_by_columns(df: DataFrame, **values: Any) -> DataFrame:
    """Conjunctive equality/IN filter per keyword column.

    List values become IN-lists — mirroring
    ``fetch_records_by_multiple_column`` (baseadaptor.py:478-504).
    """
    out = df
    for col, val in values.items():
        if isinstance(val, (list, tuple, set)):
            out = out.filter(F.col(col).isin(list(val)))
        else:
            out = out.filter(F.col(col) == val)
    return out


def filter_case_insensitive(
    df: DataFrame, column: str, values: Iterable[str], include: bool = True
) -> DataFrame:
    """Case-insensitive include/exclude by key match.

    Reference: SampleSheet.filter_sample_data (samplesheet.py:662-694).
    """
    upper_vals = [v.upper() for v in values]
    cond = F.upper(F.col(column)).isin(upper_vals)
    return df.filter(cond if include else ~cond)


def filter_status_chain(
    df: DataFrame, status_columns: Iterable[str], status: str = "ACTIVE"
) -> DataFrame:
    """All listed status columns equal ``status`` (projectutils.py:65-67)."""
    out = df
    for c in status_columns:
        out = out.filter(F.col(c) == status)
    return out
