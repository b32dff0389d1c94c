"""Physical-plan property gate: the scale rules the engine is designed
around must hold in the plans Catalyst actually produces.

Mirrors tools/explain_audit.py as a pytest so plan regressions (lost
pushdown, a dim join degrading to sort-merge, an accidental cartesian)
fail CI instead of only showing up in the audit tool.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from explain_audit import audit  # noqa: E402

from data_management_python_spark.plans import collect_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# scale-critical representatives: star join, selective filters, dedup
# family, EAV, windows, ANN family
AUDITED = [
    "m_eav_bucketed_store",
    "s_user_event_profile",
    "j1_readcount_multiway",
    "q3_topk_revenue",
    "p1_eq_filter",
    "p7_like_prefix",
    "j4_anti_join_seeding",
    "j5_semi_join",
    "a3_pivot_matrix",
    "eav_melt",
    "w_rank_per_group",
    "d_exact_dedup",
    "d_minhash_lsh",
    "d_near_dup_verified",
    "sim_ivf_ann",
    "d_embed_cosine",
    "tj_asof_join",
    "tj_range_join",
    "sim_pq_ann",
    "t_pack_sequences",
    "d_ngram_jaccard",
    "t_gopher_rules",
    "t_contamination",
    "cosmx_fov_qc_rollup",
    "cosmx_fov_seeding",
    "t_chunk_documents",
    "d_span_dedup",
    "t_temperature_sample",
    "sim_ivf_pq_ann",
    "e_cohort_retention",
    # round-2 additions: TPC-H suite representatives + hybrid retrieval
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_ored_predicates",
    "q22_idle_customers",
    "t_bm25_topk",
    "t_train_split",
    "d_semantic_dedup",
    "sim_hybrid_rrf",
    "m_scd2_changelog",
    "e_rolling_active_users",
    # round-2 additions, batch 5: remaining TPC-H shapes + knn graph
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_priority_shipping",
    "q21_waiting_suppliers",
    "sim_knn_graph",
    "t_perplexity_buckets",
    "w_range_rolling_sum",
    "e_markov_transitions",
    "a_rollup_revenue",
    "a_cube_counts",
    "e_ohlc_resample",
    "t_heavy_hitters",
    "a_abc_classification",
    "d_incremental_dedup",
    "a_fk_orphan_audit",
    "a_value_histogram",
    "e_longest_streak",
    "d_minhash_estimate",
    # round-3 additions: funnel/concurrency/decay/skew/expectations/asof
    "e_funnel",
    "e_peak_concurrency",
    "e_decayed_engagement",
    "a_skew_profile",
    "v_expectations",
    "m_scd2_asof",
    "a_zorder_cells",
    "v_drift_psi",
    "t_bigram_pairs",
    "e_top_paths",
    "d_source_priority_dedup",
    "t_budget_select",
    "e_anomaly_mad",
    "a_benford_check",
    "g_link_prediction",
    "t_exact_contamination",
    "a_seasonality_profile",
    # round-4 additions
    "t_bpe_encode",
    "s_ohlc_windowed",
    "s_session_windows",
    "s_interval_join",
    "g_label_propagation",
    "m_cdc_snapshot",
    "a_rfm_segments",
    "e_ab_conversion",
    "s_windowed_counts",
    # round-5 additions
    "s_running_user_totals",
    # sim_kcenter_diverse is NOT auditable here: the query returns a
    # driver-local createDataFrame (k rows), so the audit would see a
    # bare LocalTableScan, not the k per-round distributed scans —
    # those plans are map-only projections + TakeOrdered by
    # construction (see kcenter_select's docstring + parity test).
    # m_partitioned_merge is excluded for the same reason: it returns
    # an eager checkpoint of the post-merge table (the temp store is
    # removed before returning), so the audit would see only the
    # checkpoint scan; the merge plan's partition pruning and bucket
    # swaps are pinned by the file-listing tests in test_store.py
    # m_rebucket_split: same checkpoint-return shape; the split's
    # rename protocol and crash windows are pinned in test_store.py
    # round-8 additions (e_store_ingest excluded: checkpoint-return
    # shape like m_partitioned_merge — the ingest commit path is
    # pinned by tests/test_stream_ingest.py)
    "mm_image_neardup",
    "mm_audio_neardup",
    "mm_video_neardup",
    "mm_incremental_neardup",
    "d_span_dedup_rewrite",
    "t_nb_quality",
    # round-8, this session: DSIR / novelty / CDC curation ops
    "t_dsir_weights",
    "t_ngram_novelty",
    "d_cdc_chunks",
    # round-8, this session: deterministic sketches
    "a_hll_distinct",
    "a_cms_counts",
    "d_bloom_probe",
    "e_hll_user_cardinality",
]


@pytest.fixture(scope="module")
def queries():
    return collect_queries()


@pytest.mark.parametrize("name", AUDITED)
def test_plan_properties(spark, queries, name):
    df = queries[name].fn(spark, SF_DIR)
    df.count()  # let AQE finalize the executed plan
    flags, errors = audit(name, df)
    assert not errors, f"{name}: {errors} (flags: {flags})"


def test_star_join_broadcasts_all_dims(spark, queries):
    """j1's three dimension joins must all be broadcast — the fact side
    shuffles at most once (for the orders join), never for dims."""
    df = queries["j1_readcount_multiway"].fn(spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_selective_filter_reaches_scan(spark, queries):
    df = queries["p1_eq_filter"].fn(spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderstatus)" in plan or "EqualTo(o_orderstatus" in plan


def test_pagerank_fixed_sums_to_one(spark):
    from pyspark.sql import functions as F

    from data_management_python_spark.plans.graph import pagerank_fixed

    # square graph: symmetric edges, all degrees 2 -> uniform PR
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]]
        + [(b, a) for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]],
        "src int, dst int",
    )
    pr = pagerank_fixed(edges, iterations=5).collect()
    total = sum(r.pr for r in pr)
    assert abs(total - 1.0) < 1e-9
    for r in pr:
        assert abs(r.pr - 0.25) < 1e-9
    # star graph: hub outranks leaves
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        "src int, dst int",
    )
    got = {r.node: r.pr for r in pagerank_fixed(star, iterations=5).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_pagerank_non_broadcast_path_same_fixed_point(spark):
    """Round-8 VERDICT item: the AQE-strategy path (broadcast hints
    OFF — what a beyond-broadcast rank table must run) reaches the
    same fixed point as the hinted path on the real sf0.001 graph,
    and the hinted plan really does broadcast while the unhinted one
    is free to choose."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.plans.graph import pagerank_fixed

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    hinted = pagerank_fixed(edges, iterations=3)
    unhinted = pagerank_fixed(edges, iterations=3, broadcast_hints=False)
    a = {r.node: round(r.pr, 9) for r in hinted.collect()}
    b = {r.node: round(r.pr, 9) for r in unhinted.collect()}
    assert a == b  # same fixed point (float-accumulation-safe at 9dp)
    assert "BroadcastHashJoin" in (
        hinted._jdf.queryExecution().executedPlan().toString()
    )


def test_dynamic_partition_pruning_fires(spark, tmp_path_factory):
    """A hive-partitioned fact joined to a selectively-filtered dim must
    plan a dynamic partition pruning subquery — at 100 TB this is what
    keeps a dim-filtered star join from scanning every partition."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.sources.sinks import (
        write_partitioned_dataset,
    )

    d = tmp_path_factory.mktemp("dpp")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(d / "li_parted")
    write_partitioned_dataset(li, path, ["ship_year"])

    years = li.select("ship_year").distinct().withColumn(
        "flag", (F.col("ship_year") % 3 == 0)
    )
    fact = spark.read.parquet(path)
    joined = fact.join(
        years.filter("flag"), "ship_year"
    ).agg(F.sum("l_quantity").alias("q"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    joined.count()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan, (
        plan[:2000]
    )
