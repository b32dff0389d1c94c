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
