"""Output sinks (SURVEY §2.1 S15-S18).

  - manifest TSV: (path, md5, size) per file
    (collect_seqrun_fastq_to_db.py:419-450 _write_manifest_file)
  - JSON records (project_data_display_utils.py:177 to_json)
  - gviz DataTable JSON for Google Charts dashboards
    (igf_data/utils/gviz_utils.py:3-23) — built from a DataFrame
    without pandas/gviz_api dependencies
  - whole-catalog JSON dump (igf_portal/metadata_utils.py:33-121)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

GVIZ_TYPE_MAP = {
    "string": "string",
    "bigint": "number",
    "int": "number",
    "smallint": "number",
    "tinyint": "number",
    "double": "number",
    "float": "number",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "datetime",
}


def write_manifest_tsv(df: DataFrame, path: str) -> None:
    """Tab-separated manifest (single file per partition dir)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)


def write_json_records(df: DataFrame, path: str) -> None:
    """Newline-delimited JSON records."""
    df.write.mode("overwrite").json(path)


def to_gviz_json(
    df: DataFrame, column_order: list[str] | None = None, limit: int = 10000
) -> str:
    """DataFrame -> Google Charts DataTable JSON string.

    Row data is collected (reports are human-scale by definition);
    ``limit`` guards against accidentally feeding a fact table.
    """
    cols = column_order or df.columns
    dtypes = dict(df.dtypes)
    table_cols = [
        {"id": c, "label": c, "type": GVIZ_TYPE_MAP.get(dtypes.get(c, "string"), "string")}
        for c in cols
    ]
    rows = []
    for r in df.select(*cols).limit(limit).collect():
        cells = []
        for c in cols:
            v = r[c]
            if v is not None and table_cols[cols.index(c)]["type"] in ("date", "datetime"):
                v = v.isoformat()
            cells.append({"v": v})
        rows.append({"c": cells})
    return json.dumps({"cols": table_cols, "rows": rows})


def dump_catalog_json(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Whole-DB export: one JSON dir per table (portal dump analog).

    The scale path — each table is written by the executors in
    parallel; no table ever passes through the driver.
    """
    for name, df in tables.items():
        df.write.mode("overwrite").json(os.path.join(out_dir, name))


def _stringify_temporals(df: DataFrame) -> DataFrame:
    """Cast timestamp/date columns to strings, like the reference dump's
    per-table ``astype(str)`` blocks (metadata_utils.py:75-110) but
    driven by the schema instead of a hand-kept table/column list."""
    from pyspark.sql import functions as F

    temporal = {
        c for c, t in df.dtypes if t in ("timestamp", "timestamp_ntz", "date")
    }
    if not temporal:
        return df
    return df.select(
        *[
            F.col(c).cast("string").alias(c) if c in temporal else F.col(c)
            for c in df.columns
        ]
    )


def dump_catalog_single_json(tables: dict[str, DataFrame], path: str) -> None:
    """Whole-DB export as ONE JSON document ``{table: [records...]}`` —
    the exact shape of the reference portal dump
    (igf_portal/metadata_utils.py:33-121
    get_db_data_and_create_json_dump: every table serialized into a
    single metadata.json, temporal columns stringified).

    Refuses to overwrite an existing file, like the reference.  Rows
    stream through ``toJSON().toLocalIterator()`` one partition at a
    time, so driver memory is bounded by a partition, not the catalog —
    but the single-file output is inherently driver-written; it exists
    for portal-dump parity (metadata catalogs, millions of rows at
    most).  For datasets, use :func:`dump_catalog_json`.
    """
    if os.path.exists(path):
        raise OSError(
            f"Output file {path} already present, remove it before rerunning"
        )
    with open(path, "w") as fp:
        fp.write("{")
        for ti, (name, df) in enumerate(tables.items()):
            fp.write(("," if ti else "") + json.dumps(name) + ": [")
            for ri, row_json in enumerate(
                _stringify_temporals(df).toJSON().toLocalIterator()
            ):
                fp.write(("," if ri else "") + row_json)
            fp.write("]")
        fp.write("}")


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Hive-layout dataset writer (S15/S16 generalized to lake layout).

    Pre-clusters rows by the partition columns before ``partitionBy``
    so each task writes to few partition directories — without it,
    every task holds a writer per partition value it happens to see
    (the classic small-files explosion at 1000 executors).  Optional
    ``sort_by`` orders rows within files (better column-stats pruning
    for readers that filter on those columns).
    """
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    out.write.partitionBy(*partition_by).mode(mode).format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table writer: co-locates rows by key hash so
    two tables bucketed the same way join WITHOUT a shuffle — the
    pre-paid-shuffle strategy for fact tables joined repeatedly on the
    same key at 100 TB.  (Bucketing requires the table catalog, hence
    ``saveAsTable`` rather than a path write.)
    """
    w = df.write.bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.mode(mode).format("parquet").saveAsTable(name)


def write_sorted_dataset(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Globally-sorted dataset writer: ``repartitionByRange`` on the
    sort keys, then sort within each partition — total order across
    files without ever funneling through one reducer (a global
    ``orderBy`` + single write would).  Range boundaries come from
    Spark's reservoir sampling, so partitions stay balanced under
    skew; readers get per-file min/max column stats that prune range
    scans (the property a time-series or id-ordered lake layout is
    built on).
    """
    out = (
        df.repartitionByRange(num_files, *sort_by)
        if num_files
        else df.repartitionByRange(*sort_by)
    )
    out.sortWithinPartitions(*sort_by).write.mode(mode).format(fmt).save(path)


def write_zorder_dataset(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Z-order (Morton-curve) clustered dataset writer: multi-column
    data skipping, the layout Delta's OPTIMIZE ZORDER BY builds.

    ``write_sorted_dataset`` clusters ONE key perfectly and leaves
    every other column's per-file min/max spanning the full domain; a
    scan filtered on the second column prunes nothing.  Z-ordering
    interleaves the bits of all keys into one Morton code and
    range-sorts on that, so every file covers a small hyper-rectangle
    of the key space and predicates on ANY z-column prune files.

    Plan shape: one tiny min/max aggregate (1 row), then a map-only
    quantize+interleave expression (pure column bit math, codegen'd),
    then the same repartitionByRange + in-partition sort as the sorted
    writer — no extra shuffle versus a plain sorted write.

    Quantization is linear min→max at ``bits`` per column; heavily
    skewed columns get uneven occupancy (the classic caveat) — pre-map
    them (log, rank) upstream if needed.  Timestamp columns are
    z-ordered on their epoch value.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_management_python_spark.functions import epoch_us  # noqa: PLC0415

    ncols = len(zorder_by)
    if ncols < 2:
        raise ValueError("z-order needs >= 2 columns; use write_sorted_dataset")

    def numeric(c: str):
        if dict(df.dtypes)[c].startswith("timestamp"):
            return epoch_us(F.col(c)).cast("double")
        return F.col(c).cast("double")

    stats = df.agg(
        *[F.min(numeric(c)).alias(f"mn_{i}") for i, c in enumerate(zorder_by)],
        *[F.max(numeric(c)).alias(f"mx_{i}") for i, c in enumerate(zorder_by)],
    ).first()  # bounded: one row

    from data_management_python_spark.operators.layout import (  # noqa: PLC0415
        interleave_bits,
    )

    top = (1 << bits) - 1
    quantized = []
    for i, c in enumerate(zorder_by):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        quantized.append(
            F.least(
                F.lit(top),
                F.floor((numeric(c) - F.lit(mn)) / F.lit(span) * (1 << bits)),
            ).cast("long")
        )
    # shared Morton math (operators.layout) — the same formula the
    # oracle-checked a_zorder_cells query and its SQL twin use
    z = interleave_bits(quantized, bits)
    cols = df.columns
    zed = df.withColumn("__z", z)
    parted = (
        zed.repartitionByRange(num_files, "__z")
        if num_files
        else zed.repartitionByRange("__z")
    )
    (
        parted.sortWithinPartitions("__z")
        .select(*cols)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """Idempotent partition-level backfill: replace ONLY the hive
    partitions present in ``df``, leaving every other partition
    untouched — Spark's dynamic ``partitionOverwriteMode``, the
    incremental-load primitive behind "re-run yesterday" jobs.

    With static overwrite (the default) a one-day backfill would
    DELETE the whole dataset first; dynamic mode scopes the overwrite
    to the partitions the frame actually contains, so re-running the
    same day's load is a no-op-equivalent replace.  Rows are
    pre-clustered per partition value (same small-files discipline as
    ``write_partitioned_dataset``).  The session conf is restored
    afterwards: mode is per-write semantics, not engine state.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.repartition(*partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .format(fmt)
            .save(path)
        )
    finally:
        spark.conf.set(key, prev)


def compact_dataset(
    df: DataFrame,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a dataset into files near
    ``target_file_bytes``.  Returns the output file count.

    The lake-maintenance primitive behind OPTIMIZE/compaction jobs:
    streaming sinks and fine-grained ingestion leave thousands of tiny
    files whose per-file open/footer cost dominates scans at 100 TB.
    Sizing uses the source's actual on-disk bytes (Hadoop FileSystem
    listing through the JVM — works on any scheme, no driver-side
    os.walk), then a single round-robin ``repartition`` writes evenly
    sized files; row order inside files is not preserved — run
    ``write_sorted_dataset``/``write_zorder_dataset`` instead when the
    layout must also cluster.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    n_files = max(1, -(-total // target_file_bytes))
    df.repartition(n_files).write.mode(mode).format(fmt).save(dest_path)
    return n_files


def plan_partition_compaction(
    spark,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
    min_small_files: int = 2,
) -> DataFrame:
    """Partition-aware compaction PLAN for a hive-partitioned dataset:
    one row per leaf partition with its file census and whether it
    needs compaction — the metadata pass an OPTIMIZE job runs before
    touching any data.

    At 100 TB the point is what this does NOT do: it reads zero data
    bytes (Hadoop FileSystem listing only, any scheme) and the
    executor-side rewrite that follows (:func:`compact_partitions`)
    touches ONLY flagged partitions — a single hot streaming partition
    does not trigger a whole-table rewrite.  A partition needs
    compaction when it holds at least ``min_small_files`` files below
    ``small_file_bytes`` (default: half the target size).

    Reference analog: igf_data/utils/disk_usage_utils.py:5-141 walks
    directories per server to report usage; this is the same census
    distilled to the decision a lake maintenance job needs.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.types import (  # noqa: PLC0415
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if small_file_bytes is None:
        small_file_bytes = target_file_bytes // 2
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(conf)

    rows = []

    def walk(path, rel):
        files, dirs = [], []
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if st.isDirectory():
                if name.endswith(("__compacting", "__precompact")):
                    # a stranded temp dir means a prior compaction
                    # crashed mid-swap; plain reads would double-count
                    # the pre-swap copy, so surface it instead of
                    # silently planning around it
                    raise ValueError(
                        f"stranded compaction temp dir {st.getPath()}: "
                        "run cleanup_compaction_leftovers before "
                        "planning"
                    )
                if not name.startswith(("_", ".")):
                    dirs.append((st.getPath(), name))
            elif not name.startswith(("_", ".")):
                files.append(st.getLen())
        if files:
            small = [b for b in files if b < small_file_bytes]
            rows.append(
                (
                    rel or ".",
                    len(files),
                    len(small),
                    int(sum(files)),
                    int(sum(small)),
                )
            )
        for sub, name in dirs:
            walk(sub, f"{rel}/{name}" if rel else name)

    walk(root_path, "")
    schema = StructType(
        [
            StructField("partition", StringType(), False),
            StructField("n_files", LongType(), False),
            StructField("n_small_files", LongType(), False),
            StructField("total_bytes", LongType(), False),
            StructField("small_bytes", LongType(), False),
        ]
    )
    plan = spark.createDataFrame(rows, schema)
    return plan.withColumn(
        "needs_compaction", F.col("n_small_files") >= min_small_files
    ).withColumn(
        "target_n_files",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("total_bytes") / F.lit(target_file_bytes)).cast(
                "long"
            ),
        ),
    )


def compact_partitions(
    spark,
    root: str,
    plan: DataFrame,
    fmt: str = "parquet",
) -> list[str]:
    """Execute a :func:`plan_partition_compaction` plan: rewrite ONLY
    the flagged partitions, each coalesced to its planned file count,
    atomically per partition (write to a sibling temp dir, then swap).
    Returns the rewritten partition names.

    Each partition's rewrite is one bounded Spark job (read the
    partition's files, coalesce, write); untouched partitions keep
    their files byte-identical, so re-running after a partial failure
    re-plans and finishes the remainder — the idempotence contract
    overwrite_partitions established for backfills, applied to
    layout maintenance.  A crash AFTER a partition's swap can strand a
    ``{part}__precompact`` copy of the old files; plain Spark reads of
    the tree would double-count it, which is why the planner REFUSES
    to plan over a tree with stranded temp dirs — run
    :func:`cleanup_compaction_leftovers` first.
    """
    todo = [
        (r["partition"], int(r["target_n_files"]))
        for r in plan.filter("needs_compaction").collect()
    ]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _is_real_subdir(name: str) -> bool:
        # hidden/metadata dirs (_spark_metadata, .hive-staging) and
        # this operator's temp dirs are not partitions — same filter
        # the planner applies
        return not (
            name.startswith(("_", "."))
            or name.endswith(("__compacting", "__precompact"))
        )

    # the root-partition guard runs BEFORE any rewrite: aborting
    # mid-loop would strand the plan half-applied
    if any(part == "." for part, _ in todo):
        root_path = jvm.org.apache.hadoop.fs.Path(root)
        fs = root_path.getFileSystem(conf)
        if any(
            st.isDirectory() and _is_real_subdir(st.getPath().getName())
            for st in fs.listStatus(root_path)
        ):
            raise ValueError(
                "refusing to compact root-level files of a "
                f"partitioned tree ({root}): move or remove the "
                "loose files, or compact the whole dataset with "
                "compact_dataset"
            )

    done = []
    for part, n_files in todo:
        src_dir = root if part == "." else f"{root}/{part}"
        tmp_dir = f"{src_dir}__compacting"
        (
            spark.read.format(fmt)
            .load(src_dir)
            .coalesce(n_files)
            .write.mode("overwrite")
            .format(fmt)
            .save(tmp_dir)
        )
        swap_directory(spark, src_dir, tmp_dir)
        done.append(part)
    return done


def swap_directory(spark, src_dir: str, tmp_dir: str) -> None:
    """Crash-safe atomic-enough replace of ``src_dir`` with the
    already-written ``tmp_dir`` — the shared swap primitive behind
    partition compaction AND partition-scoped MERGE
    (:meth:`TableStore.upsert` on a bucketed table).

    The original is RENAMED aside to ``{src_dir}__precompact``
    (recoverable), never deleted before the replacement is in place;
    every Hadoop rename/delete reports failure by returning false, so
    every return is checked.  A crash between the two renames leaves
    the only copy in ``__precompact`` — exactly the state
    :func:`cleanup_compaction_leftovers` RESTORES (never deletes).
    An absent ``src_dir`` (a brand-new partition) degrades to a plain
    rename of the temp dir into place.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = src_path.getFileSystem(conf)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp_dir)
    old_path = jvm.org.apache.hadoop.fs.Path(f"{src_dir}__precompact")
    if fs.exists(old_path) and not fs.delete(old_path, True):
        raise OSError(
            f"cannot clear leftover {src_dir}__precompact; aborting "
            "before touching live data"
        )
    had_src = fs.exists(src_path)
    if had_src and not fs.rename(src_path, old_path):
        raise OSError(f"rename {src_dir} -> {src_dir}__precompact failed")
    if not fs.rename(tmp_path, src_path):
        if had_src and fs.rename(old_path, src_path):
            raise OSError(
                f"rename {tmp_dir} -> {src_dir} failed; original "
                "restored, replacement output left in the temp dir"
            )
        if not had_src:
            raise OSError(
                f"rename {tmp_dir} -> {src_dir} failed (new partition); "
                "replacement output left in the temp dir"
            )
        raise OSError(
            f"rename {tmp_dir} -> {src_dir} failed AND rollback "
            f"failed: the partition's data is in "
            f"{src_dir}__precompact and {src_dir} is ABSENT — "
            "run cleanup_compaction_leftovers to restore it before "
            "reading the dataset"
        )
    if had_src and not fs.delete(old_path, True):
        raise OSError(
            f"swap of {src_dir} succeeded but deleting the superseded "
            f"copy {src_dir}__precompact failed; remove it "
            "(cleanup_compaction_leftovers) before plain reads of the "
            "tree, which would double-count the partition"
        )


def cleanup_compaction_leftovers(spark, root: str) -> list[str]:
    """Recover stranded ``*__compacting`` / ``*__precompact`` /
    ``*__tmp`` / ``*__merging`` temp dirs under ``root`` (artifacts of
    a crashed :func:`compact_partitions`, ``TableStore._swap``,
    ``enable_partitioning``, or ``_merge_partitioned`` run).  The
    planner refuses to plan over a tree containing them — a stranded
    pre-swap copy would be double-counted by plain Spark reads — so
    this is the first step of crash recovery.

    NOT a blind delete: a crash BETWEEN the two swap renames leaves the
    live partition dir ABSENT, with ``{part}__precompact`` holding the
    ONLY copy of the original data (and the compacted copy complete in
    ``{part}__compacting``).  In that state the original is RESTORED —
    ``__precompact`` is renamed back into place — and only then are
    temp dirs deleted.  A ``__precompact``/``__compacting`` dir is
    deleted only when the corresponding live partition dir exists (the
    data it shadows is safely in place).  Returns the handled paths
    (restores listed with a ``restored:`` prefix)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(conf)
    handled = []

    def walk(path):
        for st in fs.listStatus(path):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if not name.endswith(
                ("__compacting", "__precompact", "__tmp", "__merging")
            ):
                walk(st.getPath())
                continue
            suffix = next(
                s
                for s in (
                    "__precompact", "__compacting", "__tmp", "__merging"
                )
                if name.endswith(s)
            )
            live = jvm.org.apache.hadoop.fs.Path(
                path, name[: -len(suffix)]
            )
            if not fs.exists(live):
                if suffix == "__precompact":
                    # crash between the two renames: this dir is the
                    # only copy of the partition — restore it, never
                    # delete it
                    if not fs.rename(st.getPath(), live):
                        raise OSError(
                            f"cannot restore {st.getPath()} -> {live}"
                        )
                    handled.append(f"restored:{live}")
                # a live-absent __compacting/__tmp/__merging is left
                # for the SECOND walk pass below: its sibling
                # __precompact (processed in listing order, possibly
                # after it) restores the live dir first; deleting it
                # now would be safe but deleting it before checking
                # the sibling would race the restore
                continue
            if not fs.delete(st.getPath(), True):
                raise OSError(f"cannot delete {st.getPath()}")
            handled.append(str(st.getPath()))

    walk(root_path)
    # second pass: temp dirs skipped because their live dir was absent
    # at first sight are re-checked now that every restorable
    # __precompact has been renamed back.  A __compacting whose live
    # dir is STILL absent means the partition never existed pre-crash
    # (a crashed first-time write) — deleting it loses nothing.
    def sweep(path):
        for st in fs.listStatus(path):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.endswith(("__compacting", "__tmp", "__merging")) or (
                name == "_temporary"
            ):
                # replacement/merge temp copies are never the only
                # copy of acknowledged data: live-absent means a
                # crashed first-time write (nothing acknowledged) —
                # deleting loses nothing.  __merging additionally
                # holds __deleted_kb= dirs renamed aside by a
                # partition-scoped delete, whose removal COMPLETES
                # the crashed delete's durable intent.  A _temporary
                # dir is a crashed append's staging: deleting it
                # ABORTS the uncommitted tasks; task outputs already
                # moved live stay (an append is not atomic under a
                # crash mid-job-commit — callers needing exactly-once
                # go through the keyed upsert / insert_if_absent).
                if not fs.delete(st.getPath(), True):
                    raise OSError(f"cannot delete {st.getPath()}")
                handled.append(str(st.getPath()))
            elif not name.endswith("__precompact"):
                sweep(st.getPath())

    sweep(root_path)
    return handled


def write_columnar_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    codec: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar dataset writer with format + compression choice:
    ``parquet`` (zstd/snappy/gzip/lz4) or ``orc`` (zstd/snappy/zlib).

    The format knob matters operationally, not semantically — ORC for
    Hive-ecosystem consumers, parquet elsewhere; zstd trades ~10-20%
    write CPU for ~25-40% smaller files, which at 100 TB is read
    bandwidth.  Both formats keep the engine's scan contract: column
    pruning + predicate pushdown + min/max row-group/stripe skipping
    (explain shows PushedFilters for either).
    """
    w = df.write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    w.format(fmt).save(path)


def read_columnar_dataset(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan back a :func:`write_columnar_dataset` output — pushdown and
    pruning verified by test for both formats."""
    return spark.read.format(fmt).load(path)
