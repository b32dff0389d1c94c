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
