"""Relational operator layer (SURVEY §2.2-2.6, §2.8)."""

from data_management_python_spark.operators.filters import (  # noqa: F401
    build_predicate,
    filter_by_columns,
    filter_case_insensitive,
    filter_status_chain,
)
from data_management_python_spark.operators.joins import (  # noqa: F401
    anti_join,
    exists,
    fuzzy_barcode_match,
    resolve_foreign_key,
    salted_join,
    semi_join,
    tag_existing,
)
from data_management_python_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_join,
)
from data_management_python_spark.operators.aggregates import (  # noqa: F401
    concat_agg,
    duplicate_rows,
    pivot_sum,
)
from data_management_python_spark.operators.upsert import (  # noqa: F401
    cascade_delete,
    merge_upsert,
)
from data_management_python_spark.operators.session_cache import (  # noqa: F401
    session_cached,
)
