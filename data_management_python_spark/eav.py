"""EAV attribute melt/unmelt — the reference's schema-flexibility mechanism.

The reference stores arbitrary per-row metadata in narrow
``(parent_id, attribute_name, attribute_value)`` tables and converts
wide frames to EAV on write (BaseAdaptor.divide_data_to_table_and_attribute,
igf_data/igfdb/baseadaptor.py:148-195) and EAV back to wide on read
(get_attributes_by_dbid, baseadaptor.py:507-539).

Spark-first design:
  - melt: native ``DataFrame.unpivot`` (no shuffle; a generate/project)
  - unmelt: ``groupBy(parent).pivot(name, values).agg(first(value))`` —
    callers at scale SHOULD pass ``attribute_names`` explicitly so the
    planner does not need a distinct-scan to enumerate pivot values
    (SURVEY §7 risk register: EAV pivot on high-cardinality names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt_attributes(
    df: DataFrame,
    key_columns: list[str],
    table_columns: list[str],
    name_col: str = "attribute_name",
    value_col: str = "attribute_value",
) -> tuple[DataFrame, DataFrame]:
    """Split a wide frame into (main, eav).

    Columns in ``table_columns`` stay in the main frame; every other
    column is unpivoted to (key_columns..., attribute_name,
    attribute_value) rows with NULL values dropped — mirroring
    ``divide_data_to_table_and_attribute`` + ``_format_attribute_table_row``
    (baseadaptor.py:79-195), which prunes empty values.
    """
    main_cols = [c for c in df.columns if c in set(table_columns)]
    attr_cols = [
        c for c in df.columns if c not in set(table_columns) and c not in set(key_columns)
    ]
    main = df.select(*dict.fromkeys(key_columns + main_cols))
    if not attr_cols:
        eav = df.select(
            *key_columns,
            F.lit(None).cast("string").alias(name_col),
            F.lit(None).cast("string").alias(value_col),
        ).limit(0)
        return main, eav
    eav = (
        df.unpivot(
            ids=key_columns,
            values=[F.col(c).cast("string").alias(c) for c in attr_cols],
            variableColumnName=name_col,
            valueColumnName=value_col,
        )
        .filter(F.col(value_col).isNotNull() & (F.col(value_col) != ""))
    )
    return main, eav


def unmelt_attributes(
    eav: DataFrame,
    parent_key: str,
    attribute_names: list[str] | None = None,
    name_col: str = "attribute_name",
    value_col: str = "attribute_value",
) -> DataFrame:
    """EAV rows back to one wide row per parent.

    Reference read path ``get_attributes_by_dbid`` (baseadaptor.py:507-539).
    Pass ``attribute_names`` at scale to skip the pivot-values scan.
    The per-cell aggregate is ``max`` — deterministic when the
    reference's uniq(parent, name, value) constraint still admits
    multiple values per (parent, name), where ``first`` would depend on
    partition scheduling.
    """
    pvt = eav.groupBy(parent_key).pivot(name_col, attribute_names)
    return pvt.agg(F.max(value_col))


def attribute_value_of(
    eav: DataFrame,
    parent_key: str,
    attribute_name: str,
    out_col: str | None = None,
    name_col: str = "attribute_name",
    value_col: str = "attribute_value",
) -> DataFrame:
    """Narrow projection of one attribute: (parent_key, out_col).

    The common hot path (e.g. R1_READ_COUNT reads,
    igf_data/utils/projectutils.py:17,52-64): a filter+project that
    pushes the name predicate down to the scan — far cheaper than a
    pivot when only one attribute is consumed.
    """
    out = out_col or attribute_name
    return (
        eav.filter(F.col(name_col) == attribute_name)
        .select(F.col(parent_key), F.col(value_col).alias(out))
    )
