"""Unit tests for the relational operator layer — small literal frames,
mirroring the reference's adaptor-test pattern
(test/dbadaptor/sampleadaptor_test.py style: load fixtures, assert on
fetched values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_management_python_spark.eav import (
    attribute_value_of,
    melt_attributes,
    unmelt_attributes,
)
from data_management_python_spark.operators.filters import (
    build_predicate,
    filter_by_columns,
    filter_case_insensitive,
)
from data_management_python_spark.operators.joins import (
    anti_join,
    exists,
    resolve_foreign_key,
    semi_join,
    tag_existing,
)
from data_management_python_spark.operators.aggregates import (
    concat_agg,
    duplicate_rows,
    pivot_sum,
)
from data_management_python_spark.operators.upsert import (
    cascade_delete,
    insert_if_absent,
    merge_upsert,
    transition_status,
)


def test_build_predicate(spark):
    df = spark.createDataFrame(
        [(1, "A", 5), (2, "B", 15), (3, "A", 25)], "id int, cat string, v int"
    )
    out = df.filter(build_predicate([("cat", "==", "A"), ("v", ">", 10)])).collect()
    assert [r.id for r in out] == [3]


def test_filter_by_columns_in_list(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id int, s string")
    out = filter_by_columns(df, s=["x", "z"]).collect()
    assert sorted(r.id for r in out) == [1, 3]


def test_filter_case_insensitive(spark):
    df = spark.createDataFrame([(1, "10X"), (2, "10x"), (3, "WGS")], "id int, d string")
    inc = filter_case_insensitive(df, "d", ["10x"], include=True)
    exc = filter_case_insensitive(df, "d", ["10x"], include=False)
    assert inc.count() == 2 and exc.count() == 1


def test_anti_semi_exists(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    assert sorted(r.k for r in anti_join(left, right, "k").collect()) == [1]
    assert sorted(r.k for r in semi_join(left, right, "k").collect()) == [2, 3]
    assert exists(left, right, "k") is True
    assert exists(left, spark.createDataFrame([(9,)], "k int"), "k") is False


def test_resolve_foreign_key(spark):
    data = spark.createDataFrame(
        [("IGFP1", "s1"), ("IGFP2", "s2")], "project_igf_id string, sample string"
    )
    dim = spark.createDataFrame(
        [("IGFP1", 10), ("IGFP2", 20)], "project_igf_id string, project_id long"
    )
    out = resolve_foreign_key(data, dim, "project_igf_id", "project_id")
    assert sorted((r.sample, r.project_id) for r in out.collect()) == [
        ("s1", 10),
        ("s2", 20),
    ]


def test_resolve_foreign_key_required_raises(spark):
    data = spark.createDataFrame([("MISSING", "s1")], "k string, sample string")
    dim = spark.createDataFrame([("IGFP1", 10)], "k string, id long")
    try:
        resolve_foreign_key(data, dim, "k", "id", required=True)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_tag_existing(spark):
    data = spark.createDataFrame([("a",), ("b",)], "name string")
    existing = spark.createDataFrame([("a",)], "name string")
    out = {r.name: r.EXISTS for r in tag_existing(data, existing, "name").collect()}
    assert out == {"a": True, "b": False}


def test_eav_melt_unmelt_roundtrip(spark):
    wide = spark.createDataFrame(
        [(1, "P1", "ACTIVE", "42", None), (2, "P2", "FAILED", "7", "x")],
        "project_id long, project_igf_id string, status string, "
        "R1_READ_COUNT string, extra string",
    )
    main, eav = melt_attributes(
        wide,
        key_columns=["project_id"],
        table_columns=["project_igf_id", "status"],
    )
    assert set(main.columns) == {"project_id", "project_igf_id", "status"}
    # NULL attribute values are pruned (reference baseadaptor.py:39)
    names = {(r.project_id, r.attribute_name) for r in eav.collect()}
    assert (1, "extra") not in names and (2, "extra") in names
    back = unmelt_attributes(
        eav, "project_id", attribute_names=["R1_READ_COUNT", "extra"]
    )
    row = {r.project_id: r for r in back.collect()}
    assert row[1].R1_READ_COUNT == "42" and row[1].extra is None

    one = attribute_value_of(eav, "project_id", "R1_READ_COUNT")
    assert {(r.project_id, r.R1_READ_COUNT) for r in one.collect()} == {
        (1, "42"),
        (2, "7"),
    }


def test_duplicate_rows(spark):
    df = spark.createDataFrame(
        [("1", "AAA"), ("1", "AAA"), ("2", "CCC")], "lane string, idx string"
    )
    dups = duplicate_rows(df, ["lane", "idx"]).collect()
    assert len(dups) == 1 and dups[0].dup_count == 2


def test_pivot_sum_with_total(spark):
    df = spark.createDataFrame(
        [("s1", "FC1", 10), ("s1", "FC2", 5), ("s2", "FC1", 7)],
        "sample string, flowcell string, reads int",
    )
    out = pivot_sum(df, "sample", "flowcell", "reads", pivot_values=["FC1", "FC2"])
    rows = {r.sample: r for r in out.collect()}
    assert rows["s1"].total == 15 and rows["s2"].total == 7
    assert rows["s2"].FC2 is None


def test_concat_agg_sorted(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "b")], "k int, v string"
    )
    out = concat_agg(df, ["k"], "v").collect()
    assert out[0].v_list == "a;b"


def test_merge_upsert_update_and_insert(spark):
    target = spark.createDataFrame(
        [(1, "SEEDED", 1.0), (2, "RUNNING", 2.0)], "id long, status string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "FINISHED", 2.5), (3, "SEEDED", 3.0)], "id long, status string, v double"
    )
    out = {r.id: r for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out[1].status == "SEEDED"
    assert out[2].status == "FINISHED" and out[2].v == 2.5
    assert out[3].status == "SEEDED"


def test_merge_upsert_partial_columns(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, keep string, v double"
    )
    updates = spark.createDataFrame([(2, 9.0)], "id long, v double")
    out = {r.id: r for r in
           merge_upsert(target, updates, ["id"], update_columns=["v"]).collect()}
    assert out[2].v == 9.0 and out[2].keep == "b" and out[1].v == 1.0


def test_insert_if_absent_idempotent(spark):
    target = spark.createDataFrame([(1, "x")], "id long, v string")
    cand = spark.createDataFrame([(1, "dup"), (2, "new")], "id long, v string")
    once = insert_if_absent(target, cand, ["id"])
    twice = insert_if_absent(once, cand, ["id"])
    assert once.count() == 2 and twice.count() == 2
    assert {r.v for r in once.filter(F.col("id") == 1).collect()} == {"x"}


def test_transition_status_allowed(spark):
    seeds = spark.createDataFrame(
        [(1, "SEEDED"), (2, "RUNNING")], "seed_id long, status string"
    )
    changes = spark.createDataFrame(
        [(1, "RUNNING"), (2, "SEEDED")], "seed_id long, new_status string"
    )
    out = transition_status(
        seeds, ["seed_id"], changes,
        allowed={"SEEDED": {"RUNNING"}, "RUNNING": {"FINISHED", "FAILED"}},
    )
    rows = {r.seed_id: r.status for r in out.collect()}
    # 1: SEEDED->RUNNING allowed; 2: RUNNING->SEEDED rejected
    assert rows == {1: "RUNNING", 2: "RUNNING"}


def test_cascade_delete(spark):
    files = spark.createDataFrame([(1, "/a"), (2, "/b")], "file_id long, p string")
    groups = spark.createDataFrame([(1, 10), (2, 20)], "file_id long, cg long")
    doomed = spark.createDataFrame([(1,)], "file_id long")
    f2, g2 = cascade_delete(files, groups, ["file_id"], doomed)
    assert f2.count() == 1 and g2.count() == 1
    assert f2.collect()[0].file_id == 2


def test_salted_join_matches_plain_join_and_spreads(spark):
    from data_management_python_spark.operators.joins import salted_join
    from pyspark.sql import functions as F

    # hot key: 90% of the big side shares key 1
    big = spark.createDataFrame(
        [(1 if i < 90 else i % 7 + 2, i) for i in range(100)], "k long, payload long"
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], "k long, attr string"
    )
    plain = {(r.k, r.payload, r.attr) for r in big.join(small, "k").collect()}
    salted = salted_join(big, small, on="k", salts=4)
    got = {(r.k, r.payload, r.attr) for r in salted.collect()}
    assert got == plain
    # the hot key's rows really spread across multiple salt values
    spread = (
        big.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(4))
        )
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1
    # left join keeps unmatched big rows exactly once
    left = salted_join(big, small, on="k", salts=4, how="left")
    assert left.count() == big.count()
    assert left.filter(F.col("attr").isNull()).count() == big.filter(
        ~F.col("k").isin(*range(1, 9))
    ).count()


def test_sketch_accuracy_bounds(spark):
    """HLL++ distinct and KLL-style approx percentile stay within their
    advertised error against the exact aggregates on driver testdata."""
    from data_management_python_spark.plans import collect_queries

    q = collect_queries()["a_sketch_accuracy"]
    rows = q.fn(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.distinct_within_tol      # rsd 2% -> 6% = 3 sigma
        assert r.p50_within_tol           # accuracy 10000 -> 5%


def test_scd2_from_changelog_runs_and_spans(spark):
    from data_management_python_spark.operators.upsert import scd2_from_changelog

    ev = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 00:00:00", 10),
            (1, "A", "2024-01-02 00:00:00", 11),  # same value: same span
            (1, "B", "2024-01-03 00:00:00", 12),  # change -> new span
            (1, "A", "2024-01-04 00:00:00", 13),  # back to A: third span
            (2, "X", "2024-01-01 00:00:00", 14),
        ],
        "user_id long, status string, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_from_changelog(ev, "user_id", "status", "ts", "event_id")
    rows = {(r.user_id, r.version): r for r in out.collect()}
    assert len(rows) == 4  # 3 spans for user 1, 1 for user 2
    assert rows[(1, 1)].status == "A" and rows[(1, 1)].valid_to is not None
    assert rows[(1, 2)].status == "B"
    assert rows[(1, 3)].status == "A" and rows[(1, 3)].valid_to is None
    assert rows[(2, 1)].valid_to is None
    # spans tile the timeline: valid_to of span n == valid_from of n+1
    assert rows[(1, 1)].valid_to == rows[(1, 2)].valid_from


def test_scd2_apply_close_insert_noop(spark):
    from data_management_python_spark.operators.upsert import scd2_apply

    hist = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),  # closed
            (1, "B", "2024-02-01 00:00:00", None),  # current
            (2, "C", "2024-01-15 00:00:00", None),  # current, will be no-op
        ],
        "id long, status string, valid_from string, valid_to string",
    ).select(
        "id", "status",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [
            (1, "Z", "2024-03-01 00:00:00"),  # change -> close + open
            (2, "C", "2024-03-01 00:00:00"),  # unchanged -> no-op
            (3, "N", "2024-03-01 00:00:00"),  # new key -> first span
        ],
        "id long, status string, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(hist, upd, on=["id"], tracked=["status"])
    rows = sorted(
        ((r.id, r.status, r.valid_to is None) for r in out.collect())
    )
    # id1: old closed span + B closed at 03-01 + new current Z
    # id2: untouched current C; id3: new current N
    assert rows == [
        (1, "A", False),
        (1, "B", False),
        (1, "Z", True),
        (2, "C", True),
        (3, "N", True),
    ]
    cur = {r.id: r for r in out.filter(F.col("valid_to").isNull()).collect()}
    assert str(cur[1].valid_from).startswith("2024-03-01")
    # idempotent re-apply of the same batch changes nothing
    again = scd2_apply(out, upd, on=["id"], tracked=["status"])
    assert again.count() == out.count()


def test_global_row_number_total_order(spark):
    from data_management_python_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(100)], "k int, id int"
    )
    out = global_row_number(df, ["k", "id"], "rn", num_partitions=5)
    rows = out.orderBy("rn").collect()
    assert [r.rn for r in rows] == list(range(1, 101))
    # ranks follow the (k, id) sort exactly
    assert [(r.k, r.id) for r in rows] == sorted(
        [(i % 7, i) for i in range(100)]
    )
    # NTILE closed form matches Spark's own ntile window on a single
    # partition (the semantics we refuse to pay for at scale)
    from pyspark.sql import Window

    expected = df.select(
        "k",
        "id",
        F.ntile(7).over(Window.orderBy("k", "id")).alias("b"),
    )
    got = out.select("k", "id", ntile_from_rank("rn", 100, 7).alias("b"))
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )


def test_multi_ntile_matches_chained_global_rank(spark):
    """multi_ntile's one-shuffle melted ranking == chaining
    global_row_number + ntile_from_rank once per dimension (the shape
    it replaces in a_rfm_segments)."""
    import random

    from data_management_python_spark.operators.ranking import (
        global_row_number,
        multi_ntile,
        ntile_from_rank,
    )

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(50), rng.randrange(1000), rng.randrange(10))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    n = df.count()

    def chained(df):
        out = df
        for col, name in (("a", "sa"), ("b", "sb"), ("c", "sc")):
            ranked = global_row_number(out, [col, "id"], "__rn")
            out = ranked.withColumn(
                name, ntile_from_rank("__rn", n, 4)
            ).drop("__rn")
        return out

    expected = {tuple(r) for r in chained(df).collect()}
    got = {
        tuple(r)
        for r in multi_ntile(
            df,
            [("sa", F.col("a")), ("sb", F.col("b")), ("sc", F.col("c"))],
            "id",
            n,
            4,
        )
        .select("id", "a", "b", "c", "sa", "sb", "sc")
        .collect()
    }
    assert got == expected

    # k >= n branch and a single-row frame
    one = spark.createDataFrame([(1, 5, 6)], "id long, a long, b long")
    r = multi_ntile(
        one, [("sa", F.col("a")), ("sb", F.col("b"))], "id", 1, 4
    ).first()
    assert (r.sa, r.sb) == (1, 1)


def test_global_row_number_empty_and_single(spark):
    from data_management_python_spark.operators.ranking import global_row_number

    empty = spark.createDataFrame([], "k int, id int")
    assert global_row_number(empty, ["k", "id"]).count() == 0
    one = spark.createDataFrame([(5, 1)], "k int, id int")
    assert global_row_number(one, ["k", "id"]).first().row_num == 1


def test_profile_columns(spark):
    from data_management_python_spark.operators.aggregates import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    prof = {r.column_name: r for r in profile_columns(df).collect()}
    assert prof["x"].n_rows == 4
    assert prof["x"].n_nulls == 1
    assert prof["x"].n_distinct == 2
    assert prof["s"].n_nulls == 1
    assert prof["s"].n_distinct == 2


def test_table_diff_classifies_churn(spark):
    from data_management_python_spark.operators.upsert import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0), (5, "e", 50.0)],
        "id long, s string, v double",
    )
    got = {r.id: r.diff_status for r in table_diff(old, new, ["id"]).collect()}
    # id1 removed, id3 changed (NULL -> 30.0), id5 added; 2 & 4 unchanged
    assert got == {1: "removed", 3: "changed", 5: "added"}
    # compare= restriction: ignoring v hides the id3 change
    got2 = {
        r.id: r.diff_status
        for r in table_diff(old, new, ["id"], compare=["s"]).collect()
    }
    assert got2 == {1: "removed", 5: "added"}


def test_compact_dataset_reduces_files(spark, tmp_path):
    from data_management_python_spark.sources.sinks import compact_dataset

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    frag = str(tmp_path / "frag")
    orders.repartition(32).write.parquet(frag)
    src = spark.read.parquet(frag)
    assert len(src.inputFiles()) == 32
    dest = str(tmp_path / "compact")
    n = compact_dataset(src, dest, target_file_bytes=64 * 1024 * 1024)
    out = spark.read.parquet(dest)
    assert len(out.inputFiles()) == n <= 2
    assert out.count() == orders.count()


def test_partition_compaction_plan_and_execute(spark, tmp_path):
    """Planner flags only fragmented partitions; executor rewrites only
    those, preserves every row, and leaves healthy partitions' files
    byte-identical (the incremental-OPTIMIZE contract)."""
    import os

    from pyspark.sql import functions as F

    from data_management_python_spark.sources.sinks import (
        compact_partitions,
        plan_partition_compaction,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    root = str(tmp_path / "lake")
    # partition A: fragmented (16 tiny files); partition B: healthy (1)
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 1)
    a.repartition(16).write.parquet(f"{root}/day=A")
    b.coalesce(1).write.parquet(f"{root}/day=B")
    healthy_files = sorted(
        f for f in os.listdir(f"{root}/day=B") if f.endswith(".parquet")
    )

    plan = plan_partition_compaction(
        spark, root, target_file_bytes=64 * 1024 * 1024, min_small_files=4
    )
    by_part = {r["partition"]: r for r in plan.collect()}
    assert by_part["day=A"]["needs_compaction"] is True
    assert by_part["day=A"]["n_files"] == 16
    assert by_part["day=B"]["needs_compaction"] is False

    done = compact_partitions(spark, root, plan)
    assert done == ["day=A"]
    # flagged partition compacted to its planned count; rows intact
    out_a = spark.read.parquet(f"{root}/day=A")
    assert len(out_a.inputFiles()) == by_part["day=A"]["target_n_files"]
    assert out_a.count() == a.count()
    # healthy partition untouched, same files on disk
    assert (
        sorted(
            f for f in os.listdir(f"{root}/day=B") if f.endswith(".parquet")
        )
        == healthy_files
    )
    # idempotence: re-plan flags nothing, re-execute is a no-op
    plan2 = plan_partition_compaction(
        spark, root, target_file_bytes=64 * 1024 * 1024, min_small_files=4
    )
    assert plan2.filter("needs_compaction").count() == 0
    assert compact_partitions(spark, root, plan2) == []


def test_ordered_prefix_sum_matches_window(spark):
    """ordered_prefix_sum == the SinglePartition window it replaces,
    for inclusive and exclusive modes, across a multi-partition input."""
    import random

    from pyspark.sql import Window

    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expect = {
        r.k: r.c
        for r in df.select("k", F.sum("v").over(w).alias("c")).collect()
    }
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(df, ["k"], "v", "cum").collect()
    }
    assert got == expect
    got_ex = {
        r.k: r.cum
        for r in ordered_prefix_sum(
            df, ["k"], "v", "cum", inclusive=False
        ).collect()
    }
    assert got_ex == {r[0]: expect[r[0]] - dict(rows)[r[0]] for r in rows}


def test_ordered_prefix_sum_descending_via_negation(spark):
    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    ).withColumn("__neg", -F.col("k"))
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(df, ["__neg"], "v", "cum").collect()
    }
    # descending k order: 3 first
    assert got == {3: 30, 2: 50, 1: 60}


def test_operator_width_caps_at_cores_and_conf(spark):
    from data_management_python_spark.session import operator_width

    cores = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        assert operator_width(spark) == min(cores, 200)
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert operator_width(spark) == 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_expectations_detects_planted_violations(spark):
    """Each rule kind must measure the exact violating ratio and fail
    when below threshold; the clean column passes."""
    from data_management_python_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "x-1"),
            (2, 20.0, "A", "x-2"),
            (2, -5.0, "B", "bad"),   # dup id, out-of-range, bad pattern
            (None, 30.0, "Z", "x-3"),  # null id, bad domain
        ],
        "id long, v double, cat string, code string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    rules = [
        Expectation("id_not_null", "not_null", "id"),
        Expectation("id_unique", "unique", "id"),
        Expectation("v_range", "between", "v", params={"lo": 0, "hi": 100}),
        Expectation(
            "cat_domain", "accepted_values", "cat",
            params={"values": ["A", "B"]},
        ),
        Expectation(
            "code_pattern", "matches", "code", params={"pattern": r"^x-\d$"},
        ),
        Expectation(
            "id_fk", "fk", "id", threshold=1.0,
            params={"parent": parent, "parent_key": "pid"},
        ),
    ]
    got = {r.rule: r for r in evaluate(df, rules).collect()}
    assert got["id_not_null"].metric == 0.75 and not got["id_not_null"].passed
    # 2 distinct of 3 non-null
    assert round(got["id_unique"].metric, 6) == round(2 / 3, 6)
    assert got["v_range"].metric == 0.75
    assert got["cat_domain"].metric == 0.75
    assert got["code_pattern"].metric == 0.75
    assert got["id_fk"].metric == 1.0 and got["id_fk"].passed


def test_expectations_empty_table_passes(spark):
    from data_management_python_spark.operators.expectations import (
        Expectation,
        evaluate,
    )

    empty = spark.createDataFrame([], "id long, v double")
    rows = evaluate(
        empty,
        [
            Expectation("nn", "not_null", "id"),
            Expectation("uq", "unique", "id"),
        ],
    ).collect()
    assert all(r.passed and r.metric == 1.0 for r in rows)


def test_funnel_requires_step_order(spark):
    """A user whose purchase precedes their click must not count as
    converted at step 3; step events AT the same instant don't count
    (strict >)."""
    from data_management_python_spark.plans import collect_queries

    rows = [
        # user 1: proper view -> click -> purchase
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 01:00:00", "click"),
        (3, 1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase BEFORE click
        (4, 2, "2024-01-01 00:00:00", "view"),
        (5, 2, "2024-01-01 00:30:00", "purchase"),
        (6, 2, "2024-01-01 01:00:00", "click"),
        # user 3: click only, no view -> not even step 2
        (7, 3, "2024-01-01 00:00:00", "click"),
    ]
    import os
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            os.path.join(d, "events.parquet")
        )
        q = collect_queries()["e_funnel"]
        got = {r.step: r for r in q.fn(spark, d).collect()}
    assert got["view"].n_users == 2       # users 1, 2
    assert got["click"].n_users == 2      # users 1, 2 (click after view)
    assert got["purchase"].n_users == 1   # only user 1
    assert got["purchase"].conversion == 0.5


def test_peak_concurrency_hand_built(spark):
    """Three overlapping 5-min intervals -> peak 3 at the third start;
    an interval ending exactly when another starts does not overlap it
    (end sorts before start at the same instant)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_management_python_spark.plans import collect_queries

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:01:00"),
        (3, 1, "2024-01-01 00:02:00"),
        # starts exactly at event 1's end (00:05:00): not concurrent
        # with it (half-open), concurrent with 2 and 3 -> still 3
        (4, 1, "2024-01-01 00:05:00"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            os.path.join(d, "events.parquet")
        )
        q = collect_queries()["e_peak_concurrency"]
        r = q.fn(spark, d).collect()[0]
    assert r.peak_concurrency == 3
    # first instant reaching 3: the third start
    import datetime

    expect_us = int(
        datetime.datetime(
            2024, 1, 1, 0, 2, 0, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    assert r.peak_at_us == expect_us


def test_session_cache_shares_and_prunes(spark):
    """session_cached builds once per (session, name, sf_dir), returns
    the same materialized frame on later calls, keeps distinct keys
    separate, and prunes entries left by stopped sessions (different
    application id) on the next call."""
    from data_management_python_spark.operators.session_cache import (
        _CACHE,
        session_cached,
    )

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).withColumnRenamed("id", "v")

    a1 = session_cached(spark, "t_cache_a", "sfX", build)
    a2 = session_cached(spark, "t_cache_a", "sfX", build)
    assert calls["n"] == 1 and a1 is a2
    assert a1.count() == 5
    # a different sf_dir is a different asset
    session_cached(spark, "t_cache_a", "sfY", build)
    assert calls["n"] == 2
    # entries from a stopped session (stale app id) are pruned
    _CACHE[("app-from-a-previous-life", "t_cache_old", "sfX")] = a1
    session_cached(spark, "t_cache_b", "sfX", build)
    assert ("app-from-a-previous-life", "t_cache_old", "sfX") not in _CACHE
    app_id = spark.sparkContext.applicationId
    for key in [k for k in _CACHE if k[1].startswith("t_cache_")]:
        del _CACHE[key]  # leave no test entries for other tests
    assert all(k[0] == app_id or not k[1].startswith("t_cache_") for k in _CACHE)


def test_session_cache_reentrant_build_no_deadlock(spark):
    """A build() that calls session_cached for ANOTHER family key must
    complete instead of self-deadlocking on the per-key lock (round-5
    advice: nested calls take an unlocked path via a thread-local build
    stack).  A build() that re-enters its OWN key must raise a clear
    error (round-6 advice: the old unlocked fallback silently cached
    the inner result and discarded the outer build's frame — a
    substitution no row-count assertion could see)."""
    from data_management_python_spark.operators.session_cache import (
        _CACHE,
        session_cached,
    )

    def inner():
        return spark.range(3).withColumnRenamed("id", "v")

    def build_nested_other():
        base = session_cached(spark, "t_reent_inner", "sfX", inner)
        return base.selectExpr("v * 2 AS v")

    def build_nested_same():
        # same-key re-entry: a recursion bug in the build — must fail
        # loudly, not silently swap in the inner frame
        base = session_cached(spark, "t_reent_same", "sfX", inner)
        return base.selectExpr("v + 1 AS v")

    import threading

    results = {}

    def drive():  # worker thread so a deadlock regression fails the
        results["other"] = session_cached(  # test instead of hanging it
            spark, "t_reent_outer", "sfX", build_nested_other
        )
        try:
            session_cached(spark, "t_reent_same", "sfX", build_nested_same)
            results["same_error"] = None
        except RuntimeError as e:
            results["same_error"] = e

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "re-entrant session_cached deadlocked"
    assert results["other"].count() == 3
    assert results["same_error"] is not None
    assert "re-entered for its own key" in str(results["same_error"])
    # the failed same-key build must leave nothing cached for its key
    assert not any(k[1] == "t_reent_same" for k in _CACHE)
    # ...and the cache stays usable for that key afterwards
    ok = session_cached(spark, "t_reent_same", "sfX", inner)
    assert ok.count() == 3
    # the nested winner is cached and shared
    again = session_cached(spark, "t_reent_inner", "sfX", inner)
    assert again.count() == 3
    for key in [k for k in _CACHE if k[1].startswith("t_reent_")]:
        del _CACHE[key]


def test_cdc_apply_latest_wins_and_tombstones_drop(spark):
    """cdc_apply: highest version wins per key; a tombstone as the
    latest event removes the key; a tombstone superseded by a later
    upsert resurrects it."""
    from data_management_python_spark.operators.upsert import cdc_apply

    log = spark.createDataFrame(
        [
            # key 1: U(v1) -> U(v2): latest value wins
            (1, 1, "U", "a"),
            (1, 2, "U", "b"),
            # key 2: U(v1) -> D(v2): deleted
            (2, 1, "U", "x"),
            (2, 2, "D", None),
            # key 3: D(v1) -> U(v2): resurrected
            (3, 1, "D", None),
            (3, 2, "U", "z"),
            # key 4: single delete: never appears
            (4, 1, "D", None),
        ],
        "k long, v long, op string, payload string",
    )
    got = {
        r.k: (r.v, r.payload)
        for r in cdc_apply(log, ["k"], ["v"]).collect()
    }
    assert got == {1: (2, "b"), 3: (2, "z")}


def test_compaction_stranded_dir_refusal_and_cleanup(spark, tmp_path):
    """A stranded pre-swap copy makes plain reads double-count, so the
    planner refuses to plan over it; cleanup_compaction_leftovers
    removes the stranded dirs and planning resumes."""
    import pytest

    from data_management_python_spark.sources.sinks import (
        cleanup_compaction_leftovers,
        plan_partition_compaction,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    root = str(tmp_path / "lake")
    orders.coalesce(1).write.parquet(f"{root}/day=A")
    # simulate a crash that left both temp-dir flavors behind
    orders.coalesce(1).write.parquet(f"{root}/day=A__precompact")
    orders.coalesce(1).write.parquet(f"{root}/day=B__compacting")

    with pytest.raises(ValueError, match="stranded compaction temp dir"):
        plan_partition_compaction(spark, root)

    deleted = cleanup_compaction_leftovers(spark, root)
    assert len(deleted) == 2
    plan = plan_partition_compaction(spark, root)
    assert [r["partition"] for r in plan.collect()] == ["day=A"]


def test_compaction_cleanup_restores_crash_between_renames(spark, tmp_path):
    """Crash state BETWEEN the two swap renames: the live partition dir
    is ABSENT and {part}__precompact holds the ONLY copy (the compacted
    copy sits in {part}__compacting).  The documented recovery path
    (cleanup_compaction_leftovers) must RESTORE the partition, never
    delete the sole surviving copy."""
    from pyspark.sql import functions as F

    from data_management_python_spark.sources.sinks import (
        cleanup_compaction_leftovers,
        plan_partition_compaction,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    root = str(tmp_path / "lake")
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    n_a = a.count()
    # simulate compact_partitions crashing after rename(src ->
    # __precompact) but before rename(__compacting -> src): original
    # data only in __precompact, compacted copy in __compacting, live
    # dir absent
    a.coalesce(2).write.parquet(f"{root}/day=A__precompact")
    a.coalesce(1).write.parquet(f"{root}/day=A__compacting")

    handled = cleanup_compaction_leftovers(spark, root)
    assert any(h.startswith("restored:") for h in handled)
    # the partition is back, with every row, and planning resumes clean
    assert spark.read.parquet(f"{root}/day=A").count() == n_a
    plan = plan_partition_compaction(spark, root)
    assert [r["partition"] for r in plan.collect()] == ["day=A"]
    # second invocation is a no-op (idempotent recovery)
    assert cleanup_compaction_leftovers(spark, root) == []


def test_session_cache_builds_once_under_concurrency(spark):
    """The per-key lock must hold the once-per-key contract under the
    8-stream bench shape: concurrent callers for the SAME key share
    one build; distinct keys build independently."""
    import threading

    from data_management_python_spark.operators.session_cache import (
        session_cached,
    )

    builds = {"a": 0, "b": 0}
    lock = threading.Lock()

    def make_build(name):
        def build():
            with lock:
                builds[name] += 1
            return spark.range(5).withColumnRenamed("id", name)

        return build

    results = []

    def worker(name):
        df = session_cached(
            spark, f"test_cc_{name}", "/tmp/test_cc", make_build(name)
        )
        results.append((name, df.count()))

    threads = [
        threading.Thread(target=worker, args=(n,))
        for n in ("a", "a", "a", "b", "b", "a")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert builds == {"a": 1, "b": 1}
    assert all(c == 5 for _, c in results)


def test_session_cache_deep_same_key_recursion_raises(spark):
    """Round-7 review fix: same-key re-entry must be detected at ANY
    nesting depth — A -> B -> B used to slip past the guard (only the
    outermost build pushed its key) and recurse unboundedly."""
    from data_management_python_spark.operators.session_cache import (
        _CACHE,
        session_cached,
    )

    def build_b():
        return session_cached(spark, "t_deep_b", "sfX", build_b).limit(1)

    def build_a():
        return session_cached(spark, "t_deep_b", "sfX", build_b)

    import threading

    result = {}

    def drive():
        try:
            session_cached(spark, "t_deep_a", "sfX", build_a)
            result["err"] = None
        except RuntimeError as e:
            result["err"] = e

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive()
    assert result["err"] is not None
    assert "re-entered for its own key" in str(result["err"])
    for key in [k for k in _CACHE if k[1].startswith("t_deep_")]:
        del _CACHE[key]


def test_pin_if_large_gate(spark, tmp_path, monkeypatch):
    """r13 size-gated pin: below the threshold the frame is returned
    UNCHANGED (same plan object semantics — no checkpoint job); above
    it the result is an eager checkpoint with identical rows."""
    from data_management_python_spark.operators import pinning

    src = tmp_path / "t.parquet"
    spark.range(1000).selectExpr("id", "id * 2 AS v").write.mode(
        "overwrite"
    ).parquet(str(src))
    df = spark.read.parquet(str(src))
    sz = pinning.plan_size_bytes(df)
    assert sz > 0  # file-size-derived estimate available

    agg = df.groupBy((df.id % 7).alias("k")).count()
    # gate OFF: threshold above the estimate -> same object back
    monkeypatch.setenv("SPARK_GRAFT_PIN_MIN_BYTES", str(sz + 1))
    assert pinning.pin_if_large(agg, gate=df) is agg
    # gate ON: threshold at/below the estimate -> checkpointed twin
    monkeypatch.setenv("SPARK_GRAFT_PIN_MIN_BYTES", str(sz))
    pinned = pinning.pin_if_large(agg, gate=df)
    assert pinned is not agg
    assert sorted(map(tuple, pinned.collect())) == sorted(
        map(tuple, agg.collect())
    )
    # checkpointed plan no longer scans the source file
    assert "LogicalRDD" in pinned._jdf.queryExecution().optimizedPlan().toString()
    # unavailable estimate is treated as small: never pin blind
    monkeypatch.setenv("SPARK_GRAFT_PIN_MIN_BYTES", "0")
    assert pinning.plan_size_bytes(None) == -1
