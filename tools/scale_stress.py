"""Scale stress: replicate sf0.1 10x into /tmp and compare heavy-query
runtimes — the 'would this survive a scale-up' check (results recorded
in SCALE.md).

Replication shifts natural keys per copy so join/group cardinalities
scale realistically (10x docs means 10x distinct doc_ids, not 10 copies
of the same id).

Usage: python tools/scale_stress.py [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

HEAVY = [
    "j1_readcount_multiway",
    "q3_topk_revenue",
    "a1_group_max_sum",
    "d_exact_dedup",
    "d_minhash_lsh",
    "d_ngram_jaccard",
    "d_near_dup_verified",
    "sim_cosine_topk",
    "e_sessionize",
    "w_running_total",
    "tj_asof_join",
    "tj_range_join",
    "sim_pq_ann",
    "t_pack_sequences",
    "t_tfidf_topk",
    "d_dup_clusters",
    "sim_ivf_pq_ann",
    "t_contamination",
    "t_gopher_rules",
    "e_cohort_retention",
    "cosmx_fov_qc_rollup",
    # round-2 batch 2/3 additions
    "q7_nation_volume",
    "q9_product_profit",
    "q18_large_volume_customers",
    "t_bm25_topk",
    "d_semantic_dedup",
    "sim_hybrid_rrf",
    "t_train_split",
    "m_scd2_changelog",
    "e_rolling_active_users",
    # round-2 batch 4 additions
    "a_profile_table",
    "a_decile_histogram",
    "a_iqr_outliers",
    "e_attribution",
    "a_embed_covariance",
    "t_weighted_sample",
    "g_pagerank",
    "g_triangle_count",
    # round-2 batch 5 additions
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "sim_knn_graph",
    "t_heavy_hitters",
    "t_perplexity_buckets",
    "e_ohlc_resample",
    "w_range_rolling_sum",
    "e_markov_transitions",
    "a_abc_classification",
    "a_rollup_revenue",
    "u_except_intersect_all",
    "d_incremental_dedup",
    "a_fk_orphan_audit",
    # round-3 additions
    "e_funnel",
    "e_peak_concurrency",
    "e_decayed_engagement",
    "a_skew_profile",
    "v_expectations",
    "m_scd2_asof",
    "a_zorder_cells",
    "v_drift_psi",
    "e_top_paths",
    "t_bigram_pairs",
    "d_source_priority_dedup",
    "t_budget_select",
    # round-4 additions
    "t_bpe_encode",
    "d_minhash_estimate",
    "s_ohlc_windowed",
    "s_session_windows",
    "s_interval_join",
    "g_label_propagation",
    "m_cdc_snapshot",
    "a_rfm_segments",
    "e_ab_conversion",
    "sim_kcenter_diverse",
    "s_windowed_counts",
    # round-5 additions
    "s_running_user_totals",
    "m_partitioned_merge",
    # round-6 additions
    "m_eav_bucketed_store",
    "s_user_event_profile",
    # round-7 additions
    "m_rebucket_split",
    # round-8 additions
    "mm_image_neardup",
    "mm_audio_neardup",
    "mm_incremental_neardup",
    "mm_video_neardup",
    "d_span_dedup_rewrite",
    "e_store_ingest",
    # round-8 session additions
    "t_dsir_weights",
    "t_ngram_novelty",
    "d_cdc_chunks",
    "m_time_travel",
    "sim_kmeans_clusters",
    "d_semdedup_kmeans",
    "a_hll_distinct",
    "a_cms_counts",
    "d_bloom_probe",
    "m_schema_evolution",
    "m_version_diff",
]

KEY_SHIFT = {
    "lineitem": [("l_orderkey", 10_000_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "customer": [("c_custkey", 1_000_000)],
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
    "part": [("p_partkey", 1_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
}


def build(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import TESTDATA_TABLES, load_table

    os.makedirs(dst, exist_ok=True)
    for t in TESTDATA_TABLES:
        base = load_table(spark, src, t)
        if t in ("region", "nation"):
            out = base
        else:
            parts = []
            for i in range(factor):
                c = base
                for col, stride in KEY_SHIFT.get(t, []):
                    c = c.withColumn(col, F.col(col) + F.lit(i * stride))
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if t == "events":
                # plant same-user pairs exactly 1800 s (the session
                # gap) apart: the shared corpus has none, which let a
                # strict-vs-inclusive boundary bug stay oracle-green
                # for four rounds (round-5 verdict).  With these rows
                # any regression in the session family goes hash-red.
                import datetime as dt

                b = dt.datetime(2024, 6, 1, 0, 0, 0)
                eid = factor * 10_000_000 + 1
                uid = factor * 1_000_000 + 1
                boundary = spark.createDataFrame(
                    [
                        (eid, b, uid, "click", 1.0, "{}"),
                        (eid + 1, b + dt.timedelta(seconds=1800),
                         uid, "click", 1.0, "{}"),
                        (eid + 2, b, uid + 1, "click", 1.0, "{}"),
                        (eid + 3, b + dt.timedelta(seconds=1801),
                         uid + 1, "click", 1.0, "{}"),
                    ],
                    out.schema,
                )
                out = out.unionByName(boundary)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))


#: round-7 "past 10x" validation set: the three scale-critical
#: families whose 100-TB story rests on bounded work per item —
#: delta->base band probing, codes-only PQ serving, and the
#: prefix-filtered exact-Jaccard branch.  documents/embeddings-only
#: corpora suffice (these queries touch no other table).
#: round-9 additions: the round-8 families whose 100x rows were
#: missing (verdict item 6) — perceptual video near-dup, the rolling-
#: hash CDC scan, DSIR weights, SemDeDup (k scales with corpus), and
#: the store substrate pair (time travel, exactly-once ingest), which
#: read ``customer`` — hence its replication below.
MEGA = [
    "d_incremental_dedup",
    "sim_ivf_pq_ann",
    "d_ngram_jaccard",
    "mm_video_neardup",
    "d_cdc_chunks",
    "t_dsir_weights",
    "m_time_travel",
    "e_store_ingest",
    "d_semdedup_kmeans",
    # round-10 additions (verdict item 3 + the new span family).
    # d_incremental_spans' standing anchor assets are session-cached,
    # so min-of-2 measures the PROBE cost — which is the operator's
    # steady-state contract (the base is tokenized once per corpus).
    "d_suffix_spans",
    "e_cms_stream_registers",
    "d_incremental_spans",
    "d_exact_span_rewrite",
]
MEGA_TABLES = ("documents", "embeddings", "customer", "events")


def build_docs_only(spark, src: str, dst: str, factor: int) -> None:
    """documents+embeddings corpus at ``factor``x with shifted keys —
    the bounded-disk way to push the MEGA families to 50-100x on a
    single box (full-table replication at 100x would 100x lineitem
    too, which none of these queries read).

    Byte-identical replication would be a DEGENERATE corpus for
    frequency-sensitive ops: every shingle's document frequency
    inflates by ``factor``, so hot-shingle caps prune everything and
    exact-Jaccard measures an empty join (observed: 8s at 100x vs
    104s at 10x).  Copies are therefore SALTED — every word gets a
    per-copy suffix (shingle doc-frequencies stay at base level, like
    ``factor`` distinct domains, while intra-copy dup structure is
    preserved), and embeddings get a small per-copy perturbation so
    vector sets aren't exact duplicates."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table

    os.makedirs(dst, exist_ok=True)
    for t in MEGA_TABLES:
        if os.path.exists(os.path.join(dst, f"{t}.parquet")):
            continue  # incremental: later rounds add tables to a dir
        base = load_table(spark, src, t)
        parts = []
        for i in range(factor):
            c = base
            for col, stride in KEY_SHIFT.get(t, []):
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents" and i:
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"~{i}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and i:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.lit(i * 1e-3)).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )


def main_mega(factor: int, only: list[str] | None = None) -> None:
    """Measure the MEGA families at 10x and ``factor``x (default 100x):
    the printed ratio is big/10x against a data growth of factor/10 —
    a ratio at or below that growth means no super-linear blow-up
    survived past the 10x contracts."""
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    src = "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_mega")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {}
    for f in (10, factor):
        d = f"/tmp/mega_sf{f}x"
        # per-table incremental: build_docs_only skips tables already
        # replicated, so later rounds can add tables to existing dirs
        build_docs_only(spark, src, d, f)
        dirs[f] = d
    qs = collect_queries()
    growth = factor / 10
    print(f"{'query':24s} {'x10':>9s} {'x' + str(factor):>9s} "
          f"{'ratio':>7s}  (data growth {growth:.0f}x, steady min-of-2)")
    for name in (only or MEGA):
        times = {}
        for f in (10, factor):
            # min of two runs: the first invocation in a session pays
            # codegen/session-cache costs that would otherwise land
            # entirely on the x10 column and fake a sub-linear ratio
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[name].fn(spark, dirs[f]).count()
                ts.append(time.time() - t0)
            times[f] = min(ts)
        ratio = times[factor] / times[10]
        flag = "" if ratio <= growth * 1.25 else "  SUPER-LINEAR"
        print(f"{name:24s} {times[10]:9.2f} {times[factor]:9.2f} "
              f"{ratio:7.1f}{flag}")
    spark.stop()


def main_boiler() -> None:
    """Boilerplate stress for the suffix-span frequency gate (round-10
    verdict item 3): a corpus where a fixed 30-token boilerplate
    header precedes 20% of documents, swept over max_gram_freq — the
    gate's recall truncation (gated-gram share) and the pair fan-out
    it prevents (sum of C(n,2) over kept grams) become measurable
    instead of silent.  Records: runtime, result pairs, gated share,
    and the anchor-pair upper bound the join would face."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.llmdata import dedup
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="boiler_stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    boiler = " ".join(f"bp{i}" for i in range(30))
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(boiler + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint(eager=True)
    n_docs = corpus.count()
    n_boiler = corpus.filter(F.col("text").startswith("bp0 ")).count()
    print(f"corpus: {n_docs} docs, {n_boiler} carrying the 30-token "
          "boilerplate header (23 identical 8-grams each)")
    print(f"{'cap':>6s} {'secs':>7s} {'pairs':>8s} {'gated_share':>12s} "
          f"{'join fan-out bound':>19s}")
    for cap in (16, 64, 256, 1024):
        stats = dedup.suffix_gate_stats(
            corpus, k=8, max_gram_freq=cap
        ).first()
        # pair fan-out the self-join faces under this cap: sum over
        # KEPT grams of C(n, 2) (cheap: per-gram counts only)
        _, occ = dedup._suffix_occurrences(corpus, "doc_id", "text", 8)
        bound = (
            occ.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= cap)
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2))
            .first()[0]
        )
        t0 = time.time()
        pairs = dedup.longest_duplicate_spans(
            corpus, k=8, max_gram_freq=cap
        ).count()
        secs = time.time() - t0
        print(f"{cap:6d} {secs:7.2f} {pairs:8d} "
              f"{stats.gated_share:12.4f} {int(bound):19d}")
    spark.stop()


def main_dims() -> None:
    """High-dimensional embedding stress (round-10 verdict item 6):
    sim_ivf_pq_ann and sim_knn_graph at 64d (the testdata width) vs a
    384d synthetic corpus (the real-embedding width) at the SAME row
    count — the codes-only serving claim predicts IVF-PQ's growth to
    be bounded by the train/encode passes (linear in dims) while the
    kNN graph's exact verify pays the full dims factor."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="dims_stress")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    dst = "/tmp/embed_384d"
    if not os.path.exists(os.path.join(dst, "embeddings.parquet")):
        os.makedirs(dst, exist_ok=True)
        emb = load_table(spark, src, "embeddings")
        # 384d = 6 tiled copies of the 64d vector, each tile slightly
        # rotated by a per-tile offset: cosine structure (and the
        # planted near-dup pairs) survive, dims grow 6x
        tiled = emb.select(
            "vec_id",
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(5)),
                    lambda tile: F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x + (tile * F.lit(0.01)) * ((i % 7) - 3)
                        ).cast("float"),
                    ),
                )
            ).alias("embedding"),
        )
        tiled.repartition(8).write.mode("overwrite").parquet(
            os.path.join(dst, "embeddings.parquet")
        )
    qs = collect_queries()
    print(f"{'query':16s} {'64d':>8s} {'384d':>8s} {'ratio':>6s}  "
          "(same rows; dims grow 6x)")
    for name in ("sim_ivf_pq_ann", "sim_knn_graph"):
        times = {}
        for label, d in (("64d", src), ("384d", dst)):
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[name].fn(spark, d).count()
                ts.append(time.time() - t0)
            times[label] = min(ts)
        print(f"{name:16s} {times['64d']:8.2f} {times['384d']:8.2f} "
              f"{times['384d'] / times['64d']:6.1f}")
    spark.stop()


def main_megadims() -> None:
    """100k x 384d ANN stress (round-11 verdict item 5): the 384-d
    round-10 stress held N at 2000 rows; this row holds the
    codes-only-serving claim at realistic N x d — 100k vectors of
    384 dims (50x rows, 6x dims = 300x data vs the 2000x64 base).
    Three corpora separate the axes: base (2000x64), 100k x 64
    (rows only), 100k x 384 (rows x dims).  Claim under test: IVF-PQ
    serving is dims-independent (codes only — the 384/64 ratio at
    100k rows stays ~1), and the kNN graph pays dims only in its
    bounded exact-verify stage."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="megadims_stress")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    factor = 50

    def tile384(df):
        # same tiling as main_dims: 6 slightly-rotated copies of the
        # 64d vector — cosine structure and planted near-dups survive
        return df.select(
            "vec_id",
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(5)),
                    lambda tile: F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x + (tile * F.lit(0.01)) * ((i % 7) - 3)
                        ).cast("float"),
                    ),
                )
            ).alias("embedding"),
            "label",
        )

    def replicate(df):
        parts = []
        for i in range(factor):
            c = df.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 1_000_000)
            )
            if i:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.lit(i * 1e-3)).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    base = load_table(spark, src, "embeddings")
    dirs = {"2000x64": src}
    for name, df in (
        ("100kx64", replicate(base)),
        ("100kx384", replicate(tile384(base))),
    ):
        d = f"/tmp/embed_{name}"
        dirs[name] = d
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            os.makedirs(d, exist_ok=True)
            df.repartition(32).write.mode("overwrite").parquet(
                os.path.join(d, "embeddings.parquet")
            )
    qs = collect_queries()
    print(f"{'query':16s} {'2000x64':>9s} {'100kx64':>9s} "
          f"{'100kx384':>9s} {'rows50x':>8s} {'dims6x':>7s}")
    for name in ("sim_ivf_pq_ann", "sim_knn_graph"):
        times = {}
        for label in ("2000x64", "100kx64", "100kx384"):
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[name].fn(spark, dirs[label]).count()
                ts.append(time.time() - t0)
            times[label] = min(ts)
        print(
            f"{name:16s} {times['2000x64']:9.2f} "
            f"{times['100kx64']:9.2f} {times['100kx384']:9.2f} "
            f"{times['100kx64'] / times['2000x64']:8.1f} "
            f"{times['100kx384'] / times['100kx64']:7.2f}"
        )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--megadims":
        main_megadims()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--mega":
        main_mega(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100,
            sys.argv[3].split(",") if len(sys.argv) > 3 else None,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--boiler":
        main_boiler()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--dims":
        main_dims()
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    dst = f"/tmp/scale_sf{factor}x"
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.session import get_spark

    spark = get_spark(app_name="scale_stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        print(f"building {dst} (factor {factor})...")
        build(spark, src, dst, factor)

    qs = collect_queries()
    qs["p1_eq_filter"].fn(spark, src).collect()  # warm
    print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(factor):>8s} {'ratio':>6s}")
    for name in HEAVY:
        t0 = time.time()
        qs[name].fn(spark, src).count()
        base_t = time.time() - t0
        t0 = time.time()
        qs[name].fn(spark, dst).count()
        big_t = time.time() - t0
        print(f"{name:28s} {base_t:8.2f} {big_t:8.2f} {big_t / base_t:6.1f}")
    spark.stop()


if __name__ == "__main__":
    try:
        main()
    finally:
        pass  # keep the dataset for re-runs; /tmp cleans itself
