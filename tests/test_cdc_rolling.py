"""Rolling-hash CDC parity: the production O(1)-per-byte scan must
chunk EXACTLY like the engine-portable explode twin (round-9, verdict
item 3).  The two paths share constants and the downstream plan; what
these tests pin is the boundary math itself — numpy window sums +
hashlib md5 versus Catalyst column expressions — across multibyte
text, short docs, degenerate repetition, and planted duplication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_management_python_spark.llmdata import dedup

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog " * 20),
    (2, "hello world"),
    (3, "a" * 100),
    (4, "x"),
    (5, "".join(chr(97 + (i * i + 3 * i) % 26) + (" " if i % 9 == 0 else "")
                for i in range(2000))),
    (6, "naïve café résumé ünïcode — ©2024 " * 30),
    # 7 shares a long verbatim span with 5: shared chunks must appear
    (7, "PREFIX " + "".join(chr(97 + (i * i + 3 * i) % 26)
                            + (" " if i % 9 == 0 else "")
                            for i in range(800)) + " SUFFIX"),
]


def _chunks(spark, engine, boundary):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    if engine == "rolling":
        f = dedup._cdc_chunks_rolling(docs, "doc_id", "text", 24, 4)
    else:
        f = dedup._cdc_chunks_explode(
            docs, "doc_id", "text", 24, 4, boundary
        )
    return sorted(
        (r["doc_id"], r["__clen"], r["__h"]) for r in f.collect()
    )


def test_rolling_matches_explode_twin(spark):
    assert _chunks(spark, "rolling", "poly") == _chunks(
        spark, "explode", "poly"
    )


def test_rolling_stats_match_explode_stats(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = sorted(
        tuple(r) for r in dedup.cdc_chunk_stats(
            docs, boundary="poly", engine="rolling"
        ).collect()
    )
    b = sorted(
        tuple(r) for r in dedup.cdc_chunk_stats(
            docs, boundary="poly", engine="explode"
        ).collect()
    )
    assert a == b
    # the planted 5/7 overlap surfaces as shared chunks
    by_id = {r[0]: r for r in a}
    assert by_id[5][2] > 0 and by_id[7][2] > 0  # n_shared_chunks
    assert by_id[2][2] == 0  # "hello world" shares nothing


def test_insertion_stability(spark):
    """One inserted character shifts only its own chunk: every chunk
    hash outside the edited one survives verbatim."""
    base = CORPUS[4][1]
    edited = base[:900] + "Z" + base[900:]
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    f = dedup._cdc_chunks_rolling(docs, "doc_id", "text", 24, 4)
    rows = f.collect()
    h1 = {r["__h"] for r in rows if r["doc_id"] == 1}
    h2 = {r["__h"] for r in rows if r["doc_id"] == 2}
    # all but O(1) chunks shared between the original and the edit
    assert len(h1 - h2) <= 2 and len(h2 - h1) <= 2


def test_rolling_requires_poly():
    with pytest.raises(ValueError, match="rolling"):
        dedup.cdc_chunk_stats(None, engine="rolling", boundary="md5")


def test_md5_explode_path_unchanged(spark):
    """The original md5 boundary rule still runs (back-compat for any
    caller pinned to the rsync-flavored rule)."""
    docs = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
    out = dedup.cdc_chunk_stats(docs, boundary="md5", engine="explode")
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.n_chunks >= 1 for r in rows.values())
