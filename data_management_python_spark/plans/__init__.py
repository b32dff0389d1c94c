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


def _driver_history() -> tuple[set[str], dict[str, int]]:
    """(failed, green-with-staleness) across all driver CORRECTNESS runs.

    The driver's correctness gate truncates at 50 queries per round in
    registration order, so ordering matters: previously-FAILED queries
    must re-run first (to convert red rows to green), never-checked
    queries next (to grow the verified union), and already-green last.
    A query is "green" only if its most recent driver check passed.
    ``green`` maps each green name to the INDEX of the round that last
    verified it — the staleness key: with every query green, the
    50-slot window should re-check the LONGEST-unverified greens first
    so a silent regression cannot hide behind an old green row for
    more than ~ceil(N/50) rounds.
    Reads CORRECTNESS_r*.json from the repo root; self-maintains as
    rounds accumulate.  Full (untruncated) runs see the same set with
    the same per-query results, so ordering is correctness-neutral.
    """
    import glob  # noqa: PLC0415
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    failed: set[str] = set()
    green: dict[str, int] = {}
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    for round_idx, path in enumerate(paths):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            # one classification, three buckets: explicit failure wins;
            # green requires a POSITIVE match signal (a record lacking
            # every known key — schema drift, partial write — counts as
            # never-checked, not silently green); latest round wins.
            explicit_fail = (
                rec.get("err") not in (None, "")
                or rec.get("rows_match") is False
                or rec.get("schema_match") is False
                or rec.get("hash_match") is False
            )
            positive = (
                rec.get("hash_match") is True
                or rec.get("rows_match") is True
            )
            if explicit_fail:
                failed.add(name)
                green.pop(name, None)
            elif positive:
                green[name] = round_idx
                failed.discard(name)
            # else: unrecognized/partial record -> never-checked
    return failed, green


def _plan_since_rounds() -> dict[str, int]:
    """name -> round count at which the query's plan digest last
    changed, from PLAN_HASHES.json (written by tools/plan_hashes.py).
    A green query whose plan changed AFTER its last verification must
    re-enter the driver window ahead of merely-stale greens — a plan
    change on an unrotated green would otherwise ship unverified for
    ~ceil(N/window) rounds.  Missing/unreadable sidecar -> empty map
    (ordering degrades to pure staleness)."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    try:
        with open(os.path.join(root, "PLAN_HASHES.json")) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    out: dict[str, int] = {}
    for name, rec in data.items():
        if isinstance(rec, dict) and isinstance(
            rec.get("since_round"), int
        ):
            out[name] = rec["since_round"]
    return out


def _order_names(
    names,
    failed: set[str],
    green: dict[str, int],
    plan_since: dict[str, int],
    reg_order: dict[str, int],
) -> list[str]:
    """Deterministic driver-window ordering (pure; unit-tested):
    failed first, never-checked next, then greens — and within greens,
    PLAN-CHANGED-since-verification first, then oldest-verified."""

    def _prio(name: str) -> int:
        if name in failed:
            return 0
        if name not in green:
            return 1
        return 2

    def _plan_stale(name: str) -> int:
        # a green verified at round index r (0-based over CORRECTNESS
        # files) is plan-stale iff the digest change was detected when
        # the file for round r already existed (since_round is a FILE
        # COUNT, r+1 files exist through round r): the code change
        # postdates the verification, so the green row no longer
        # covers the shipped plan
        r = green.get(name)
        since = plan_since.get(name)
        if r is None or since is None:
            return 1
        return 0 if since > r else 1

    return sorted(
        names,
        key=lambda n: (
            _prio(n),
            _plan_stale(n),
            green.get(n, 0),
            reg_order.get(n, 1_000_000),
            n,
        ),
    )


def collect_queries() -> dict[str, Query]:
    """All registered queries across plan modules.

    Emitted failed-first, then never-driver-checked, then green — so a
    driver run truncated at N queries maximizes newly-verified rows.
    """
    from data_management_python_spark.plans import analytics  # noqa: PLC0415
    from data_management_python_spark.plans import cosmx_queries  # noqa: PLC0415
    from data_management_python_spark.plans import graph  # noqa: PLC0415
    from data_management_python_spark.plans import relational  # noqa: PLC0415
    from data_management_python_spark.plans import tpch  # noqa: PLC0415
    from data_management_python_spark.llmdata import queries as llm  # noqa: PLC0415

    out: dict[str, Query] = {}
    for mod in (relational, llm, cosmx_queries, tpch, analytics, graph):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    failed, green = _driver_history()
    # names absent from _REG_ORDER (e.g. queries added after the map
    # was drawn) rank LAST within their tier — they must not leapfrog
    # the explicitly-prioritized backlog in a truncated driver window.
    # Within the GREEN tier, plan-changed-since-verification queries
    # rule (tools/plan_hashes.py sidecar), then staleness: the green
    # verified longest ago sorts first, so the truncated window rotates
    # through every green in ~ceil(N/window) rounds and a silent
    # regression cannot hide indefinitely behind an old green row.
    ordered = _order_names(
        out, failed, green, _plan_since_rounds(), _REG_ORDER
    )
    return {n: out[n] for n in ordered}


# Within each priority tier, registration order is refined so the
# highest-frequency user surface lands inside a truncated driver
# window first: TPC-H shapes, then windowed/rollup analytics, then
# graph/cosmx, then llmdata.  Names absent from this map keep their
# module order after all ranked names (stable sort).
_REG_ORDER: dict[str, int] = {}


def _build_reg_order() -> None:
    tiers = [
        # tier 0: the round-3 additions never driver-checked through r3.
        # Pinned explicitly so round-4+ queries (absent from this map →
        # rank 1_000_000) cannot leapfrog them inside the never-checked
        # priority tier via module iteration order.
        ["d_minhash_estimate", "sim_knn_graph", "sim_hybrid_rrf",
         "sim_pca_project", "a_embed_covariance", "t_train_split",
         "t_bm25_topk", "t_heavy_hitters", "t_perplexity_buckets",
         "t_temperature_sample", "t_weighted_sample", "m_scd2_asof",
         "t_bigram_pairs", "d_source_priority_dedup", "t_budget_select",
         "t_exact_contamination", "e_funnel", "e_peak_concurrency",
         "e_decayed_engagement", "a_skew_profile", "v_expectations",
         "a_zorder_cells", "v_drift_psi", "e_top_paths", "e_anomaly_mad",
         "a_benford_check", "a_seasonality_profile", "g_link_prediction"],
        # tier 1: TPC-H query shapes (most common user surface)
        ["q2_min_cost_supplier", "q4_priority_exists", "q6_forecast_revenue",
         "q7_nation_volume", "q8_market_share", "q9_product_profit",
         "q10_returned_items", "q11_important_parts", "q12_priority_shipping",
         "q13_order_count_distribution", "q14_promo_revenue",
         "q15_top_supplier", "q16_supplier_part_counts",
         "q17_small_quantity_revenue", "q18_large_volume_customers",
         "q19_ored_predicates", "q20_supplier_volume_semi",
         "q21_waiting_suppliers", "q22_idle_customers"],
        # tier 2: rollup/cube/median + window analytics
        ["a_rollup_revenue", "a_cube_counts", "a_exact_median",
         "a_abc_classification", "a_value_histogram", "a_profile_table",
         "a_decile_histogram", "a_iqr_outliers", "a_corr_matrix",
         "a_fk_orphan_audit", "w_percent_rank_cume", "w_ratio_to_report",
         "w_range_rolling_sum", "w_first_last_nth",
         "u_except_intersect_all"],
        # tier 3: event/graph/cosmx
        ["e_attribution", "e_gap_fill", "e_markov_transitions",
         "e_ohlc_resample", "e_longest_streak", "e_session_stats",
         "g_pagerank", "g_triangle_count", "cosmx_fov_qc_rollup",
         "cosmx_fov_seeding"],
        # tier 4: llmdata batch 4/5
        ["d_span_dedup", "d_semantic_dedup", "d_incremental_dedup",
         "d_minhash_estimate", "sim_knn_graph", "sim_hybrid_rrf",
         "sim_pca_project", "a_embed_covariance", "t_train_split",
         "t_bm25_topk", "t_heavy_hitters", "t_perplexity_buckets",
         "t_temperature_sample", "t_weighted_sample"],
    ]
    rank = 1
    for tier in tiers:
        for name in tier:
            # first (highest-priority) occurrence wins — tier 0 pins
            # names that also appear in later thematic tiers
            if name not in _REG_ORDER:
                _REG_ORDER[name] = rank
            rank += 1


_build_reg_order()
