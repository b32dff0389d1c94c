"""Empty-input and edge-case behavior across operators — the states a
small scale factor or a fresh catalog actually produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_management_python_spark.eav import melt_attributes, unmelt_attributes
from data_management_python_spark.llmdata import dedup, similarity
from data_management_python_spark.operators.joins import fuzzy_barcode_match
from data_management_python_spark.operators.upsert import (
    insert_if_absent,
    merge_upsert,
)
from data_management_python_spark.qc.barcode_qc import barcode_qc
from data_management_python_spark.validation import metadata as mv


def empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_merge_upsert_empty_sides(spark):
    t = spark.createDataFrame([(1, "a")], "id long, v string")
    e = empty(spark, "id long, v string")
    assert merge_upsert(t, e, ["id"]).count() == 1
    assert merge_upsert(e, t, ["id"]).count() == 1
    assert insert_if_absent(e, t, ["id"]).count() == 1
    assert insert_if_absent(t, e, ["id"]).count() == 1


def test_eav_empty_and_all_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, extra string"
    )
    main, eav = melt_attributes(df, ["id"], [])
    assert eav.count() == 0  # all-NULL attributes pruned entirely
    wide = unmelt_attributes(eav, "id", attribute_names=["extra"])
    assert wide.count() == 0  # no parents had any attribute


def test_fuzzy_match_empty_known_set(spark):
    unknown = spark.createDataFrame(
        [(1, "ACGTACGT", "unknown")], "lane int, index string, tag string"
    )
    known = empty(spark, "lane int, index string, tag string")
    out = fuzzy_barcode_match(unknown, known).collect()
    assert out[0].tag == "unknown"  # nothing to match against, tag kept


def test_barcode_qc_no_unknown_rows(spark):
    stats = spark.createDataFrame(
        [("r1", 1, "S1", "ACGT", 100, "known", 100)],
        "runid string, lane int, sample string, index string, "
        "reads long, tag string, total_read long",
    )
    rep = barcode_qc(stats)["lane_report"].collect()[0]
    assert rep.qc_pass  # no unknowns: ratio gate coalesces to pass
    assert rep.known_pct == 100.0


def test_dedup_empty_and_single_doc(spark):
    one = spark.createDataFrame([(1, "only doc here now")], "doc_id long, text string")
    assert dedup.ngram_jaccard_pairs(one, "doc_id", "text").count() == 0
    assert dedup.lsh_candidate_pairs(one, "doc_id", "text").count() == 0
    assert dedup.near_dup_pairs(one, "doc_id", "text").count() == 0
    short = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    # fewer tokens than the shingle width -> no shingles, no pairs, no error
    assert dedup.word_shingles(short, "doc_id", "text", n=3).count() == 0
    assert dedup.simhash(short, "doc_id", "text").count() == 1


def test_cosine_topk_single_vector_corpus(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = similarity.cosine_topk(emb, emb, k=3)
    assert out.count() == 0  # only itself, which is excluded


def test_validation_on_empty_frames(spark):
    md = empty(
        spark,
        "project_igf_id string, sample_igf_id string, library_source string, "
        "library_strategy string, experiment_type string, name string, email_id string",
    )
    assert mv.invalid_library_combinations(md).count() == 0
    assert mv.duplicate_samples(md).count() == 0
    assert mv.projects_with_multiple_authorities(md).count() == 0


def test_heavy_hitters_empty_and_single_doc(spark):
    from pyspark.sql import functions as F

    from data_management_python_spark.llmdata import text as t

    empty = spark.createDataFrame([], "text string")
    assert t.heavy_hitters(empty, "text", support=0.1).count() == 0
    one = spark.createDataFrame([("a a a b",)], "text string")
    got = {
        (r.term, r.cnt)
        for r in t.heavy_hitters(one, "text", support=0.5).collect()
    }
    assert got == {("a", 3)}


def test_knn_graph_cell_smaller_than_k(spark):
    """A cell with fewer members than k emits what it has (m-1 rows
    per member), never fabricates neighbors."""
    from data_management_python_spark.llmdata import similarity as sim

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sim.knn_graph(emb, "vec_id", "embedding", n_centroids=3, k=5)
    rows_out = got.collect()
    # 3 singleton-ish cells (each vector is its own centroid): vectors
    # alone in their cell emit nothing
    for r in rows_out:
        assert r.q_id != r.neighbor_id


def test_ordered_prefix_sum_empty(spark):
    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    empty = spark.createDataFrame([], "k long, v long")
    assert ordered_prefix_sum(empty, ["k"], "v", "cum").count() == 0


def test_markov_transitions_single_event_users(spark, tmp_path):
    """Users with one event produce no transition rows (LAG is NULL)."""
    from pyspark.sql import functions as F

    from data_management_python_spark.plans import collect_queries

    qs = collect_queries()
    df = qs["e_markov_transitions"].fn(spark, "/root/testdata/sf0.001")
    total_pairs = df.agg(F.sum("n")).first()[0]
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_pairs == n_events - n_users  # one lost pair per user


def test_heavy_hitters_rejects_undersized_capacity(spark):
    """capacity below ceil(1/support) would silently break the
    Misra-Gries superset guarantee — must refuse, not drop terms."""
    import pytest

    from data_management_python_spark.llmdata import text as t

    docs = spark.createDataFrame([("a b c",)], "text string")
    with pytest.raises(ValueError, match="capacity"):
        t.heavy_hitters(docs, "text", support=0.01, capacity=10)
    # at exactly the bound it must be accepted
    t.heavy_hitters(docs, "text", support=0.5, capacity=2).collect()


def test_jpeg_sniff_fill_bytes_and_standalone_markers():
    """Spec-legal 0xFF padding before a marker and length-less
    standalone markers (TEM, RSTn) must not derail the SOF walk."""
    from data_management_python_spark.llmdata.multimodal import _sniff_image

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (100).to_bytes(2, "big") + (200).to_bytes(2, "big") + b"\x03"
    )
    assert _sniff_image(b"\xff\xd8" + app0 + sof0) == ("jpeg", 200, 100)
    # single fill byte before SOF0
    assert _sniff_image(b"\xff\xd8" + app0 + b"\xff" + sof0) == (
        "jpeg", 200, 100,
    )
    # standalone TEM and RST0 markers between segments
    assert _sniff_image(b"\xff\xd8" + app0 + b"\xff\x01\xff\xd0" + sof0) == (
        "jpeg", 200, 100,
    )
    # entropy-coded scan begins before any SOF: dimensions unknown
    assert _sniff_image(b"\xff\xd8" + app0 + b"\xff\xda\x00\x02") == (
        "jpeg", None, None,
    )


def test_ordered_prefix_sum_null_values(spark):
    """NULL values accumulate as 0 (SUM OVER ignore-nulls semantics);
    an all-NULL range slice must not crash the offset job."""
    from data_management_python_spark.operators.ranking import (
        ordered_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5), (4, None), (5, 7)],
        "k long, v long",
    )
    got = {
        r.k: r.cum
        for r in ordered_prefix_sum(
            df, ["k"], "v", "cum", num_partitions=3
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 5, 4: 5, 5: 12}


def test_value_histogram_degenerate_all_equal(spark, tmp_path):
    """All-equal values: one bin 0 holding every row, no div-by-zero
    null/NaN divergence between engines."""
    import duckdb
    from data_management_python_spark.plans import collect_queries

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 42.0) for i in range(10)], "o_orderkey long, o_totalprice double"
    ).write.parquet(f"{sf}/orders.parquet")
    q = collect_queries()["a_value_histogram"]
    rows = q.fn(spark, sf).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n_orders == 10
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    drows = con.sql(q.oracle).fetchall()
    assert len(drows) == 1 and drows[0][0] == 0 and drows[0][1] == 10


def test_driver_history_classification_buckets():
    """_driver_history: explicit failure wins, green needs a positive
    match signal, unrecognized/partial records stay never-checked, and
    a later green clears an earlier red (latest round wins)."""
    import json

    from data_management_python_spark.plans import _driver_history

    root = __import__("os").path.dirname(
        __import__("os").path.dirname(
            __import__("data_management_python_spark").__file__
        )
    )
    tmp1 = f"{root}/CORRECTNESS_r98.json"
    tmp2 = f"{root}/CORRECTNESS_r99.json"
    try:
        with open(tmp1, "w") as f:
            json.dump(
                {
                    "zz_red_then_green": {"err": "boom"},
                    "zz_red_stays": {"hash_match": False},
                    "zz_partial": {"some_future_key": 1},
                },
                f,
            )
        with open(tmp2, "w") as f:
            json.dump(
                {
                    "zz_red_then_green": {
                        "rows_match": True,
                        "hash_match": True,
                        "err": None,
                    }
                },
                f,
            )
        failed, green = _driver_history()
        assert "zz_red_then_green" in green
        assert "zz_red_then_green" not in failed
        assert "zz_red_stays" in failed
        # partial record: neither bucket -> ordering treats it as
        # never-checked
        assert "zz_partial" not in failed and "zz_partial" not in green
    finally:
        import os

        os.remove(tmp1)
        os.remove(tmp2)


def test_registry_rotates_greens_oldest_verified_first():
    """With every query green, the truncated driver window must
    re-verify the LONGEST-unverified greens first: _driver_history
    records the round that last verified each green, and
    collect_queries orders the green tier by that staleness index
    (non-decreasing), so every green rotates through a 50-slot window
    within ~ceil(N/50) rounds."""
    import json
    import os

    from data_management_python_spark.plans import (
        _driver_history,
        collect_queries,
    )

    root = os.path.dirname(
        os.path.dirname(
            __import__("data_management_python_spark").__file__
        )
    )
    tmp1 = f"{root}/CORRECTNESS_r98.json"
    tmp2 = f"{root}/CORRECTNESS_r99.json"
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "err": None}
    try:
        # q6 last verified one synthetic round BEFORE q7
        with open(tmp1, "w") as f:
            json.dump({"q6_forecast_revenue": ok}, f)
        with open(tmp2, "w") as f:
            json.dump({"q7_nation_volume": ok}, f)
        failed, green = _driver_history()
        assert green["q6_forecast_revenue"] < green["q7_nation_volume"]
        names = list(collect_queries())
        # both still green; the staler one re-runs first (same
        # plan-staleness class: both digests predate the synthetic
        # rounds 98/99, so neither is plan-stale)
        assert names.index("q6_forecast_revenue") < names.index(
            "q7_nation_volume"
        )
        # global invariant: within the green tier, (plan-stale,
        # verification staleness) is lexicographically non-decreasing
        # over the emitted order — plan-changed greens jump the queue
        from data_management_python_spark.plans import _plan_since_rounds

        since = _plan_since_rounds()

        def key(n):
            plan_stale = 0 if since.get(n, -1) > green[n] else 1
            return (plan_stale, green[n])

        keys = [key(n) for n in names if n in green and n not in failed]
        assert keys == sorted(keys)
    finally:
        os.remove(tmp1)
        os.remove(tmp2)


def test_registry_orders_plan_changed_greens_ahead_of_stale_greens():
    """Round-6 registry hygiene: a green query whose PLAN DIGEST
    changed after its last driver verification must re-enter the
    window ahead of merely-stale greens (and behind failed/
    never-checked tiers) — otherwise a plan change on an unrotated
    green ships unverified for ~ceil(N/window) rounds."""
    from data_management_python_spark.plans import _order_names

    failed = {"f1"}
    # green: name -> 0-based round index of last verification
    green = {"g_old": 0, "g_new": 3, "g_changed": 3}
    # plan digests: g_changed's digest changed when 4 files existed
    # (i.e. AFTER its round-index-3 verification); g_new's digest has
    # been stable since round count 1; g_old predates everything
    plan_since = {"g_changed": 4, "g_new": 1, "g_old": 0}
    names = ["g_new", "g_old", "never1", "g_changed", "f1"]
    out = _order_names(names, failed, green, plan_since, {})
    assert out == ["f1", "never1", "g_changed", "g_old", "g_new"]
    # boundary: digest change detected at exactly the verification
    # round's file count means the change POSTDATES the verification
    assert _order_names(
        ["a", "b"], set(), {"a": 2, "b": 0}, {"a": 3, "b": 0}, {}
    ) == ["a", "b"]
    # re-verified after the change -> no longer plan-stale
    assert _order_names(
        ["a", "b"], set(), {"a": 3, "b": 0}, {"a": 3, "b": 0}, {}
    ) == ["b", "a"]
    # no sidecar at all -> pure staleness order
    assert _order_names(
        ["a", "b"], set(), {"a": 2, "b": 0}, {}, {}
    ) == ["b", "a"]


def test_eav_unmelt_hostile_attribute_cardinality(spark):
    """SURVEY §7 risk register: EAV pivot at thousands of distinct
    attribute names.  With an EXPLICIT pivot-value list the planner
    never distinct-scans for values, the plan stays one hash aggregate
    (no per-attribute joins), and a 2000-column unmelt round-trips
    correct cell values — the planner-blowup guard, exercised at the
    width a real metadata table reaches."""
    from pyspark.sql import functions as F

    from data_management_python_spark.eav import unmelt_attributes

    n_attrs, n_parents = 2000, 300
    names = [f"attr_{i:04d}" for i in range(n_attrs)]
    # each parent carries a deterministic 1/20 slice of the attributes
    eav = (
        spark.range(n_parents)
        .withColumnRenamed("id", "sample_id")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(n_attrs // 20 - 1))))
        .select(
            "sample_id",
            F.format_string(
                "attr_%04d", (F.col("i") * 20 + F.col("sample_id") % 20)
            ).alias("attribute_name"),
            F.concat(
                F.lit("v"), F.col("sample_id"), F.lit("_"), F.col("i")
            ).alias("attribute_value"),
        )
    )
    wide = unmelt_attributes(eav, "sample_id", attribute_names=names)
    assert len(wide.columns) == n_attrs + 1
    # the explicit value list keeps the pivot a single aggregate: no
    # distinct-scan subquery, exactly one shuffle exchange in the plan
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("+- Exchange") <= 1
    row = wide.filter("sample_id = 7").first()
    assert row["attr_0007"] == "v7_0"
    assert row["attr_0027"] == "v7_1"
    assert row["attr_0008"] is None  # parent 7 never wrote attr_0008
    # population: every parent got exactly n_attrs/20 non-null cells
    # (flat array constructor — a folded 2000-deep Add tree would
    # overflow Catalyst's recursion, and that's a test bug, not a
    # pivot bug)
    non_null = wide.select(
        F.size(
            F.filter(
                F.array(*[F.col(c) for c in names]),
                lambda x: x.isNotNull(),
            )
        ).alias("n")
    ).agg(F.min("n"), F.max("n")).first()
    assert non_null[0] == non_null[1] == n_attrs // 20
