"""TableStore — the adaptor-facade over a parquet-backed catalog.

Mirrors the reference's adaptor API surface (igf_data/igfdb/*adaptor.py)
so a user of data-management-python can switch with familiar verbs:

  reference                                   here
  ------------------------------------------  -------------------------------
  BaseAdaptor.store_records                   TableStore.store_records
  store_project_and_attribute_data (M2)       store_with_attributes
  fetch_records_by_column (P1)                fetch_by
  check_* existence probes (J8)               exists
  create_or_update_* (M3)                     upsert
  map_foreign_table_and_store_attribute (M1)  resolve_fk option on store
  get_attributes_by_dbid (EAV read)           attributes_of

Transaction semantics: the reference wraps one ORM session per call
(dbconnect.py:122-141); a lake gives per-table atomicity (each write is
one full-table swap).  ``store_records``/``store_with_attributes`` are
APPENDS — like the reference's bulk insert, re-running them duplicates
rows unless the caller goes through ``upsert`` or pre-filters with
``exists``/``tag_existing`` (the reference's own idempotency mechanism,
M6).  EAV appends ARE deduplicated on (parent, name, value) — the
uniq constraint the reference's schema enforces (igfTables.py:1037+).
On Delta, `_swap` becomes a MERGE and the read-back is versioned; the
parquet implementation keeps the same call contract.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_python_spark.catalog import (
    ATTRIBUTE_PARENTS,
    CORE_SCHEMAS,
    attribute_schema,
    validate_enums,
)
from data_management_python_spark.eav import (
    melt_attributes,
    unmelt_attributes,
)
from data_management_python_spark.operators.filters import filter_by_columns
from data_management_python_spark.operators.joins import (
    resolve_foreign_key,
    semi_join,
)
from data_management_python_spark.operators.upsert import merge_upsert


class TableStore:
    """Parquet-backed catalog of the reference's core tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- storage primitives -------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def table(self, name: str) -> DataFrame:
        """Read a table; empty frame with the declared schema if never
        written."""
        p = self._path(name)
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        if name in CORE_SCHEMAS:
            return self.spark.createDataFrame([], CORE_SCHEMAS[name])
        parent = name.removesuffix("_attribute")
        if parent in ATTRIBUTE_PARENTS:
            return self.spark.createDataFrame([], attribute_schema(parent))
        raise KeyError(f"unknown table {name!r}")

    def _swap(self, name: str, df: DataFrame) -> None:
        """Atomic-enough table replace: write to a temp dir, then move
        into place (Delta MERGE territory; same call contract)."""
        tmp = self._path(name) + "__tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self._path(name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    # -- reference-adaptor verbs --------------------------------------------

    def store_records(
        self, name: str, data: DataFrame, validate: bool = True
    ) -> None:
        """Append rows (bulk path; S4).  Enum domains are checked the
        way the reference's SQL Enum columns would reject bad rows."""
        if validate and name in CORE_SCHEMAS:
            bad = validate_enums(data, name)
            if not bad.isEmpty():
                row = bad.first()
                raise ValueError(
                    f"enum violation in {name}: {row['enum_violation']}"
                )
        current = self.table(name)
        dtypes = dict(current.dtypes)
        padded = data
        for c in current.columns:  # absent columns load as NULL, as the
            if c not in data.columns:  # reference's serial store does
                padded = padded.withColumn(c, F.lit(None).cast(dtypes[c]))
        self._swap(name, current.unionByName(padded.select(*current.columns)))

    def store_with_attributes(
        self,
        name: str,
        data: DataFrame,
        key_column: str,
        fk: tuple[str, str, str] | None = None,
    ) -> None:
        """Wide frame -> main table + EAV attribute table (M2;
        store_project_and_attribute_data, projectadaptor.py:10-33).

        ``fk`` = (dim_table, natural_key, surrogate_key) resolves a
        parent reference via broadcast join before the split (M1).
        """
        if fk is not None:
            dim_table, natural, surrogate = fk
            data = resolve_foreign_key(
                data, self.table(dim_table), natural, surrogate, required=True
            )
        table_cols = [f.name for f in CORE_SCHEMAS[name].fields]
        main, eav = melt_attributes(
            data, key_columns=[key_column], table_columns=table_cols
        )
        self.store_records(name, main)
        attr_table = f"{name}_attribute"
        current = self.table(attr_table)
        eav_named = eav.withColumnRenamed(key_column, f"{name}_id")
        out = current.unionByName(
            eav_named.withColumn(
                f"{name}_attribute_id", F.lit(None).cast("long")
            ).select(*current.columns)
        ).dropDuplicates([f"{name}_id", "attribute_name", "attribute_value"])
        self._swap(attr_table, out)

    def fetch_by(self, name: str, **filters: Any) -> DataFrame:
        """Equality/IN fetch (fetch_records_by_column /
        _by_multiple_column, baseadaptor.py:450-504)."""
        return filter_by_columns(self.table(name), **filters)

    def exists(self, name: str, **filters: Any) -> bool:
        """Existence probe (J8; check_seqrun_exists etc.)."""
        return not self.fetch_by(name, **filters).isEmpty()

    def upsert(
        self,
        name: str,
        updates: DataFrame,
        on: list[str],
        update_columns: list[str] | None = None,
    ) -> None:
        """create-or-update by natural key (M3/M5; Delta MERGE analog)."""
        merged = merge_upsert(self.table(name), updates, on, update_columns)
        self._swap(name, merged)

    def delete_where(self, name: str, keys: DataFrame, on: list[str]) -> None:
        """Key-addressed delete (M7 building block)."""
        self._swap(name, self.table(name).join(keys, on=on, how="left_anti"))

    def attributes_of(
        self, parent: str, parent_ids: DataFrame, attribute_names: list[str] | None = None
    ) -> DataFrame:
        """Wide attribute read for a set of parent rows
        (get_attributes_by_dbid, baseadaptor.py:507-539)."""
        eav = self.table(f"{parent}_attribute")
        key = f"{parent}_id"
        scoped = semi_join(eav, parent_ids, on=key)
        return unmelt_attributes(scoped, key, attribute_names=attribute_names)
