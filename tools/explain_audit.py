"""Physical-plan audit: verifies the scale-critical plan properties the
engine is designed around, per query:

  - parquet pushdown: PushedFilters non-empty when the query filters a
    scanned column; ReadSchema contains only needed columns
  - join strategy: small dims use BroadcastHashJoin (no shuffle of the
    fact side); no accidental CartesianProduct/BroadcastNestedLoopJoin
    outside the queries that genuinely need one
  - whole-stage codegen present

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Prints one line per query: flags + a short verdict, then a non-zero
exit if any REQUIRED property fails.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# queries where a nested-loop/cartesian join is expected and bounded
# (literal probe sets / explicit small cross sections / 1-row
# broadcast scalar-threshold cross joins)
NESTED_LOOP_OK = {"t_nb_quality", "sim_lsh_ann", "q15_top_supplier", "q22_idle_customers",
                  "t_bm25_topk", "q11_important_parts", "t_heavy_hitters",
                  "a_abc_classification", "t_unigram_xent",
                  "t_perplexity_buckets", "a_fk_orphan_audit",
                  "a_value_histogram",
                  # round-3: 1-row scalar crossJoins (funnel step counts,
                  # decay anchor max, expectations FK ratio)
                  "e_funnel", "e_decayed_engagement", "v_expectations",
                  "a_zorder_cells", "v_drift_psi",
                  "a_benford_check", "a_seasonality_profile",
                  # substring-predicate join against a BOUNDED broadcast
                  # probe set: non-equi by nature, BNLJ is the plan
                  "t_exact_contamination",
                  # round-4: temperature quotas normalizer moved from a
                  # global window to the standard 1-row scalar crossJoin
                  "t_temperature_sample",
                  # round-8: DSIR's corpus-total normalizer — the same
                  # 1-row scalar crossJoin shape as t_unigram_xent
                  "t_dsir_weights",
                  # round-8: the HLL QA column's 1-row exact-count
                  # crossJoin (same scalar-broadcast shape)
                  "a_hll_distinct"}

# queries allowed an UNPARTITIONED window (Exchange SinglePartition
# feeding a WindowExec): each one's window frame is a small AGGREGATED
# table (deciles, ABC classes, ratio-to-report groups), documented in
# the query's docstring — a global window over base-table rows is
# never allowed
GLOBAL_WINDOW_OK: set[str] = set()

# map-only or tiny-input queries where no exchange at all is fine
NO_SHUFFLE_OK = True


def audit(name, df) -> tuple[list[str], list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()
    flags, errors = [], []
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if any(p.strip() for p in pushed):
            flags.append("pushdown")
    if "BroadcastHashJoin" in plan:
        flags.append("bhj")
    if "SortMergeJoin" in plan:
        flags.append("smj")
    if "WholeStageCodegen" in plan:
        flags.append("wscg")
    n_exchanges = plan.count("Exchange ") + plan.count("Exchange\n")
    flags.append(f"exch={plan.count('+- Exchange')}")
    if "CartesianProduct" in plan:
        errors.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
        errors.append("BroadcastNestedLoopJoin")
    # unpartitioned WindowExec: a Window fed by Exchange SinglePartition
    # serializes the whole frame through one task — only allowed where
    # the frame is a documented small aggregate.  The exchange is not
    # necessarily adjacent (ORDERED global windows interpose a Sort,
    # AQE wraps stages), so walk the Window's SUBTREE by indentation:
    # descendants print at a deeper offset; the subtree ends at the
    # first line back at or above the Window's own offset.  The first
    # Exchange met inside the subtree is the one feeding the window —
    # SinglePartition there means a global frame.
    raw = plan.splitlines()

    def _node_offset(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in " :+-*":
            i += 1
        return i

    plan_has_single = "Exchange SinglePartition" in plan
    for i, ln in enumerate(raw):
        if "Window [" not in ln:
            continue
        w_off = _node_offset(ln)
        for nxt in raw[i + 1 :]:
            if not nxt.strip():
                continue
            if _node_offset(nxt) <= w_off:
                break  # left the Window's subtree
            if "Exchange SinglePartition" in nxt:
                # covers both a direct exchange and a ReusedExchange
                # line whose description names the reused target
                if name not in GLOBAL_WINDOW_OK:
                    errors.append("unpartitioned WindowExec")
                break
            if "ReusedExchange" in nxt:
                # deduplicated exchange whose description does NOT
                # name the target: resolve conservatively — if the
                # plan contains any SinglePartition exchange the
                # reused one may be it, so treat as unpartitioned
                # (unknown), never silently as partitioned
                if plan_has_single and name not in GLOBAL_WINDOW_OK:
                    errors.append(
                        "unpartitioned WindowExec (unresolved "
                        "ReusedExchange)"
                    )
                break
            if "Exchange " in nxt or "Window [" in nxt:
                break  # a partitioned exchange / nested window feeds it
        if any(e.startswith("unpartitioned WindowExec") for e in errors):
            break
    # scans should never read every column of a wide table for narrow
    # output.  Count the FileScan output attribute list, not ReadSchema:
    # Spark truncates ReadSchema at spark.sql.maxMetadataStringLength
    # (100 chars, "...," no closing ">"), which made the old regex merge
    # adjacent schemas and report phantom 20+-column scans.
    scan_lists = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    widest = max((len(s.split(",")) for s in scan_lists if s.strip()), default=0)
    flags.append(f"maxcols={widest}")
    if widest >= 11:  # lineitem full width — projection pruning failed
        errors.append(f"scan reads {widest} cols")
    # duplicated Python UDF evaluation (guide §4.4): a filter on a
    # UDF-computed column pushed below the projection clones the UDF —
    # the same expression then appears in two ArrowEvalPython /
    # BatchEvalPython nodes and every row pays the Python boundary
    # twice.  Normalize away expression ids and count repeats.  A
    # repeat is a warning flag, not an error: re-evaluating a CHEAP udf
    # can beat blocking other pushdowns (asNondeterministic's cost).
    py_nodes = re.findall(
        r"(?:ArrowEvalPython|BatchEvalPython) \[([^\]]*)\]", plan
    )
    sigs = [re.sub(r"#\d+", "", s) for s in py_nodes]
    n_dup = len(sigs) - len(set(sigs))
    if n_dup:
        flags.append(f"pydup={n_dup}")
    return flags, errors


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="explain_audit")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name, q in collect_queries().items():
        if only and name not in only:
            continue
        df = q.fn(spark, sf_dir)
        df.count()  # let AQE finalize the executed plan
        flags, errors = audit(name, df)
        status = "OK " if not errors else "BAD"
        if errors:
            failures += 1
        print(f"{status} {name:28s} {' '.join(flags)}"
              + (f"  !! {', '.join(errors)}" if errors else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
