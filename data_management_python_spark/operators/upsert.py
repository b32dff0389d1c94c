"""Mutation operators — upsert/merge/delete semantics (SURVEY §2.8).

The reference mutates MySQL rows inside an ORM session (create_or_update
collection attributes, collectionadaptor.py:101-261; pipeline-seed state
machine, pipelineadaptor.py:293-494; cascade deletes,
collectionadaptor.py:694-860).  On a lake there is no in-place row
update, so the same semantics are expressed as *dataframe merges* that a
caller persists atomically (Delta MERGE where available; in this
environment, parquet overwrite-by-partition).  All merges are pure
DataFrame plans — idempotent, re-runnable, and shuffle-only-on-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assert_unique_keys(updates: DataFrame, keys: list[str], what: str) -> None:
    """Delta MERGE raises when multiple source rows match one target
    row; mirror that contract instead of silently fanning out."""
    dup = (
        updates.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key_vals = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"{what}: duplicate keys in updates (e.g. {key_vals}); "
            "dedupe the source or aggregate it before merging"
        )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    on: Sequence[str],
    update_columns: Sequence[str] | None = None,
    validate_unique: bool = True,
) -> DataFrame:
    """MERGE: matched target rows take the update's values; unmatched
    updates are inserted; untouched target rows pass through.

    Equivalent to Delta ``WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``
    (reference M3/M4/M5).  When ``update_columns`` is given, only those
    columns are overwritten on match — including to NULL (the matched
    flag, not coalesce, decides).  Like Delta, duplicate keys in
    ``updates`` are an error (``validate_unique=False`` skips the check
    when the caller has already deduplicated).  Column set of the
    result == column set of ``target``.
    """
    keys = list(on)
    if validate_unique:
        _assert_unique_keys(updates, keys, "merge_upsert")
    if update_columns is None:
        missing = [c for c in target.columns if c not in updates.columns]
        upd = updates
        for c in missing:
            upd = upd.withColumn(c, F.lit(None).cast(dict(target.dtypes)[c]))
        replaced = target.join(updates.select(*keys), on=keys, how="left_anti")
        return replaced.unionByName(upd.select(*target.columns))

    upd = updates.select(
        *keys,
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(f"__new_{c}") for c in update_columns],
    )
    merged = target.join(upd, on=keys, how="left")
    for c in update_columns:
        merged = merged.withColumn(
            c,
            F.when(F.col("__matched"), F.col(f"__new_{c}")).otherwise(F.col(c)),
        )
    merged = merged.drop("__matched", *[f"__new_{c}" for c in update_columns])
    inserts = updates.join(target.select(*keys), on=keys, how="left_anti")
    for c in target.columns:
        if c not in inserts.columns:
            inserts = inserts.withColumn(c, F.lit(None).cast(dict(target.dtypes)[c]))
    return merged.unionByName(inserts.select(*target.columns))


def insert_if_absent(
    target: DataFrame, candidates: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Exactly-once seeding: insert only keys not already present.

    Reference: pipeline_seed uniq(pipeline, seed, table) + anti-join on
    already-seeded (pipelineadaptor.py:523-569).  Candidates are also
    deduplicated within the batch on the key — the uniq constraint the
    reference's DB would enforce on the second insert.  NULL-safe on
    the key (like the uniq constraint and dropDuplicates): a
    NULL-keyed candidate matches its stored twin instead of
    re-inserting on every run.
    """
    from data_management_python_spark.operators.joins import (  # noqa: PLC0415
        anti_join,
    )

    keys = list(on)
    fresh = anti_join(
        candidates.dropDuplicates(keys),
        target.select(*keys),
        on=keys,
        null_safe=True,
    )
    return target.unionByName(fresh.select(*target.columns))


def transition_status(
    seeds: DataFrame,
    key_cols: Sequence[str],
    changes: DataFrame,
    status_col: str = "status",
    allowed: dict[str, set[str]] | None = None,
) -> DataFrame:
    """Pipeline-seed state machine: apply (key -> new_status) changes,
    optionally enforcing the SEEDED→RUNNING→FINISHED/FAILED transitions
    (pipelineadaptor.py:357-494).  ``changes`` must carry key_cols +
    ``new_status``; duplicate change keys are rejected like merge_upsert.
    """
    _assert_unique_keys(changes, list(key_cols), "transition_status")
    merged = seeds.join(changes, on=list(key_cols), how="left")
    new = F.col("new_status")
    if allowed:
        cond = F.lit(False)
        for frm, tos in allowed.items():
            cond = cond | ((F.col(status_col) == frm) & new.isin(list(tos)))
        new = F.when(cond, new).otherwise(F.lit(None))
    return (
        merged.withColumn(status_col, F.coalesce(new, F.col(status_col)))
        .drop("new_status")
    )


def cascade_delete(
    parents: DataFrame,
    children: DataFrame,
    on: Sequence[str],
    delete_parents_keys: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """FK-ordered delete: drop parent keys and their child rows.

    Emulates the reference's ordered deletes (remove file +
    collection_group rows, fileadaptor.py:184-216;
    collectionadaptor.py:694-860).  Returns (parents', children').
    """
    keys = list(on)
    kept_parents = parents.join(delete_parents_keys, on=keys, how="left_anti")
    kept_children = children.join(delete_parents_keys, on=keys, how="left_anti")
    return kept_parents, kept_children


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Rebuild an SCD Type-2 dimension history from an event changelog.

    Collapses each key's event sequence into runs of consecutive equal
    ``attr`` values (gaps-and-islands) and emits one validity span per
    run: (key, version, status, valid_from, valid_to) with
    ``valid_to = NULL`` for the current span.  Beyond-reference: the
    reference mutates status in place (status ENUMs all over
    igfTables.py) and keeps no history; a lake keeps the full SCD2
    timeline instead.

    Scale shape: two window passes and one aggregate, all partitioned
    by ``key`` — a single hash shuffle of the changelog, state bounded
    per key, no self-join.  ``tiebreak`` makes same-timestamp ordering
    total so the run numbering is deterministic.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(attr).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0)
    runs = df.withColumn(
        "version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = runs.groupBy(key, "version", F.col(attr).alias("status")).agg(
        F.min(ts).alias("valid_from")
    )
    w2 = Window.partitionBy(key).orderBy("version")
    return spans.select(
        key,
        "version",
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    on: Sequence[str],
    tracked: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a batch of updates to an SCD Type-2 history table.

    For each update key: if the current span (``valid_to IS NULL``)
    differs on any tracked column, the span is closed at the update's
    effective timestamp and a new current span opens; identical values
    are a no-op; unseen keys insert their first span.  Closed spans
    always pass through untouched.  One key-partitioned join + unions —
    the Delta-MERGE-shaped plan, expressed as pure DataFrames so any
    sink can persist it atomically.  ``updates`` must be unique per key
    (same contract as merge_upsert).
    """
    keys = list(on)
    _assert_unique_keys(updates, keys, "scd2_apply")
    closed = history.filter(F.col(valid_to).isNotNull())
    current = history.filter(F.col(valid_to).isNull())
    upd = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.col(effective_col).alias("__eff"),
    )
    joined = current.join(upd, on=keys, how="full_outer")
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_cur = F.col(valid_from).isNotNull()
    has_upd = F.col("__eff").isNotNull()
    # old spans: keep as-is when no update or unchanged; close when changed
    old = joined.filter(has_cur).select(
        *keys,
        *tracked,
        F.col(valid_from),
        F.when(has_upd & differs, F.col("__eff")).otherwise(F.col(valid_to)).alias(valid_to),
    )
    # new spans: updates that changed an existing key or introduced one
    new = joined.filter(has_upd & (~has_cur | differs)).select(
        *keys,
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(dict(history.dtypes)[valid_to]).alias(valid_to),
    )
    cols = [*keys, *tracked, valid_from, valid_to]
    return closed.select(*cols).unionByName(old).unionByName(new)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    on: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: classify every key as added / removed /
    changed between two table versions.

    The distributed form of the reference's checksum change detection
    (file_path keyed md5 compare, fileutils/collect flows): one FULL
    OUTER equi-join on the key, row content reduced to an md5 over the
    compared columns (null-safe sentinel encoding) so the comparison
    is one string equality regardless of width.  Unchanged rows are
    dropped — output size is bounded by the churn, not the table.

    Returns key columns + ``diff_status`` ('added'|'removed'|'changed').
    """
    keys = list(on)
    cols = list(compare) if compare else [
        c for c in old.columns if c not in keys
    ]

    def rhash(df: DataFrame):
        return F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in cols
                ],
            )
        )

    o = old.select(*keys, rhash(old).alias("__h_old"))
    n = new.select(*keys, rhash(new).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("diff_status", status)
        .filter(F.col("diff_status").isNotNull())
        .select(*keys, "diff_status")
    )


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Materialize the current snapshot from an insert/update/delete
    CDC changelog: per key, the highest-version event wins; if that
    event is a delete, the key is absent from the snapshot.

    The replication-consumer primitive (Debezium/DMS-style feeds):
    one key-partitioned window ranks events by ``version_cols``
    descending (callers must pass a total order per key — ship a
    unique tiebreaker like the event id as the last column, or
    same-version events pick an arbitrary winner), one filter keeps
    rank 1, one filter drops tombstones.  Shuffle is a single
    key-partitioned exchange regardless of how many times a key was
    rewritten — at 100 TB the changelog is typically much larger than
    the key space, and the window's map-side ranking discards
    superseded events before anything wider happens.  No unpartitioned
    window, no driver state.

    Reference analog: the adaptor store/update/delete cycle
    (baseadaptor.py store/modify/delete records applied row-at-a-time
    via the ORM session) — here the whole history applies in one pass.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in version_cols]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(op_col) != delete_op)
    )
