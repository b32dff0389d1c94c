"""Tests: 10X barcode expansion, storage stats, streaming windows +
stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_management_python_spark.plans import storage_stats
from data_management_python_spark.sources.singlecell import expand_tenx_barcodes
from data_management_python_spark.streaming.windows import (
    running_user_counter,
    windowed_event_counts,
)


def test_expand_tenx_barcodes(spark):
    sheet = spark.createDataFrame(
        [
            ("SMP1", "NameOne", "ACGTACGT", ""),
            ("SMP2", "NameTwo", "SI-GA-A1", "10X"),
        ],
        "Sample_ID string, Sample_Name string, index string, Description string",
    )
    out = expand_tenx_barcodes(sheet)
    rows = out.collect()
    assert len(rows) == 5  # 1 plain + 4 expanded
    expanded = [r for r in rows if r.Original_Sample_ID == "SMP2"]
    assert sorted(r["index"] for r in expanded) == sorted(
        ["GGTTTACT", "CTAAACGG", "TCGGCGTC", "AACCGTAA"]
    )
    assert sorted(r.Sample_ID for r in expanded) == [
        "SMP2_1", "SMP2_2", "SMP2_3", "SMP2_4"
    ]
    plain = [r for r in rows if r.Sample_ID == "SMP1"]
    assert plain[0].Original_Sample_ID is None


def test_storage_stats(spark):
    a = spark.createDataFrame(
        [("scratch", 2.0 * 1024**3, 10.0, "hpc1")],
        "storage string, used double, available double, server_name string",
    )
    b = spark.createDataFrame(
        [("scratch", 1.0 * 1024**3, 5.0, "hpc2"), ("archive", 4.0 * 1024**3, 1.0, "hpc2")],
        "storage string, used double, available double, server_name string",
    )
    merged = storage_stats.merge_usage([a, b])
    totals = {r.storage: r for r in storage_stats.storage_totals(merged).collect()}
    assert abs(totals["scratch"].total_used_gb - 3.0) < 1e-9
    assert totals["scratch"].n_servers == 2
    rates = spark.createDataFrame(
        [("scratch", 0.5)], "storage string, rate_per_gb double"
    )
    costs = {r.storage: r.monthly_cost
             for r in storage_stats.storage_costs(merged, rates).collect()}
    assert abs(costs["scratch"] - 1.5) < 1e-9
    assert costs["archive"] == 0.0  # no rate -> coalesce 0


def test_windowed_event_counts_batch_parity(spark):
    from data_management_python_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    win = windowed_event_counts(ev)
    direct = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    a = {(r.window_start, r.event_type): r.n_events for r in win.collect()}
    b = {(r.window_start, r.event_type): r.n_events for r in direct.collect()}
    assert a == b


def test_running_user_counter_stream(spark, tmp_path):
    from data_management_python_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src_dir = tmp_path / "events_src"
    ev.write.parquet(str(src_dir))
    stream = spark.readStream.schema(ev.schema).parquet(str(src_dir))
    counted = running_user_counter(stream)
    q = (
        counted.writeStream.format("memory")
        .queryName("user_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: r.n_events
        for r in spark.sql("select * from user_counts").collect()
    }
    expect = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect


def test_stream_exact_dedup_across_microbatches(spark, tmp_path):
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.streaming.dedup import stream_exact_dedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "docs_src"
    # same corpus written twice -> the second micro-batch is 100%
    # duplicate content and must be fully dropped by cross-batch state
    docs.write.parquet(str(src / "a"))
    docs.write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_exact_dedup(stream, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select text_md5 from dedup_out").collect()
    n_distinct = docs.select(F.md5("text").alias("h")).distinct().count()
    assert len(got) == n_distinct
    assert len({r.text_md5 for r in got}) == n_distinct


def test_running_dup_counter_matches_batch_groups(spark, tmp_path):
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.llmdata.dedup import exact_dedup_groups
    from data_management_python_spark.streaming.dedup import running_dup_counter

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "docs_src2"
    docs.write.parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = (
        running_dup_counter(stream, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("dupcount_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_dup2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.text_md5: (r.keep_id, r.n_copies)
        for r in spark.sql("select * from dupcount_out").collect()
    }
    expect = {
        r.text_md5: (r.keep_id, r.n_copies)
        for r in exact_dedup_groups(docs, "doc_id", "text").collect()
    }
    assert got == expect


def test_stream_pack_sequences_single_batch_greedy(spark, tmp_path):
    from data_management_python_spark.streaming.packing import stream_pack_sequences

    rows = [("s", i, [12, 30, 25, 40, 8, 55, 10, 90, 5, 20][i]) for i in range(10)]
    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tokens long")
    src = tmp_path / "pack_src1"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        stream_pack_sequences(stream, budget=60)
        .writeStream.format("memory")
        .queryName("pack_out1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pack1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.pack_seq, r.pack_filled)
        for r in spark.sql("select * from pack_out1").collect()
    }
    # local greedy simulation in doc_id order
    seq = filled = 0
    expect = {}
    for _, doc_id, n in rows:
        if filled > 0 and filled + n > 60:
            seq, filled = seq + 1, 0
        filled += n
        expect[doc_id] = (seq, filled)
    assert got == expect
    # the oversized doc (90 > budget) sits alone in its pack
    oversized_seq = expect[7][0]
    assert [d for d, (s, _) in expect.items() if s == oversized_seq] == [7]


def test_stream_pack_sequences_state_carries_across_batches(spark, tmp_path):
    from data_management_python_spark.streaming.packing import stream_pack_sequences

    schema = "shard string, doc_id long, n_tokens long"
    a = spark.createDataFrame([("s", i, 10) for i in range(5)], schema)
    b = spark.createDataFrame([("s", i, 10) for i in range(5, 10)], schema)
    src = tmp_path / "pack_src2"
    a.write.parquet(str(src / "a"))
    b.write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_pack_sequences(stream, budget=60)
        .writeStream.format("memory")
        .queryName("pack_out2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pack2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from pack_out2").collect()
    assert sorted(r.doc_id for r in rows) == list(range(10))  # each doc once
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r.pack_seq, 0)
        per_pack[r.pack_seq] += r.n_tokens
    # without cross-batch state the second batch would restart at
    # (seq 0, filled 0) and overfill pack 0 to 100 tokens
    assert all(tot <= 60 for tot in per_pack.values())
    assert per_pack == {0: 60, 1: 40}


def test_stream_session_gap_event_time_timeout(spark, tmp_path):
    import os
    import time
    from datetime import datetime, timedelta

    from data_management_python_spark.streaming.windows import stream_session_gap

    base = datetime(2024, 1, 1, 10, 0, 0)
    schema = "user_id long, ts timestamp"
    batches = [
        # user 1: two events 10s apart -> one session
        [(1, base), (1, base + timedelta(seconds=10))],
        # much later event advances the watermark far past 1's gap
        [(2, base + timedelta(seconds=3600))],
        # third batch lets the timeout fire against the new watermark
        [(2, base + timedelta(seconds=3700))],
    ]
    src = tmp_path / "sess_src"
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):  # force oldest-first pickup
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_session_gap(stream, gap_seconds=60, watermark_delay="5 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sess_out").collect()
    closed = {r.user_id: r for r in rows}
    assert 1 in closed  # user 1's session closed via event-time timeout
    s = closed[1]
    assert s.session_start == base
    assert s.session_end == base + timedelta(seconds=10)
    assert s.n_events == 2


def test_stream_session_gap_in_batch_split(spark, tmp_path):
    from datetime import datetime, timedelta

    from data_management_python_spark.streaming.windows import stream_session_gap

    base = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, base + timedelta(seconds=10)),
        (1, base + timedelta(seconds=200)),  # > gap -> closes the first
    ]
    src = tmp_path / "sess_src2"
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))
    q = (
        stream_session_gap(stream, gap_seconds=60, watermark_delay="5 seconds")
        .writeStream.format("memory")
        .queryName("sess_out2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql("select * from sess_out2").collect()
    assert len(rows_out) == 1  # first session closed by the in-batch gap
    s = rows_out[0]
    assert s.session_start == base
    assert s.session_end == base + timedelta(seconds=10)
    assert s.n_events == 2


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-user running totals with
    a RocksDB-backed ValueState, across two micro-batches."""
    import os
    import time

    import pytest

    # the transformWithState protocol speaks protobuf between the JVM
    # and the Python state server; without it the worker crashes
    pytest.importorskip("google.protobuf")

    from data_management_python_spark.streaming.stateful_v2 import (
        ROCKSDB_PROVIDER,
        running_user_totals_v2,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        schema = "user_id long, value double"
        batches = [
            [(1, 10.0), (1, 5.0), (2, 1.0)],
            [(1, 2.5), (3, 7.0)],
        ]
        src = tmp_path / "twst_src"
        now = time.time()
        for i, rows in enumerate(batches):
            p = src / f"b{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(p)
            )
            for root, _dirs, files in os.walk(p):
                for f in files:
                    os.utime(
                        os.path.join(root, f), (now - 300 + i, now - 300 + i)
                    )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            running_user_totals_v2(stream)
            .writeStream.format("memory")
            .queryName("twst_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_twst"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from twst_out").collect()
        # final cumulative totals per user across batches
        final = {}
        for r in rows:
            final[r.user_id] = (r.n_events, r.sum_value)
        assert final[1] == (3, 17.5)  # 10+5 then +2.5
        assert final[2] == (1, 1.0)
        assert final[3] == (1, 7.0)
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_lsh_candidates(spark, tmp_path):
    """Streaming near-dup candidates: a later near-identical document is
    flagged against the first-seen bucket owner; novel docs emit
    nothing."""
    import os
    import time

    from data_management_python_spark.streaming.dedup import (
        stream_lsh_candidates,
    )

    base = "spark makes distributed data processing simple and fast for everyone " * 3
    other = "completely unrelated text about gardening tulips and soil quality here " * 3
    batches = [
        [(1, base), (2, other)],
        # 10: near-identical to 1 (one word appended) -> same band sigs
        # 11: novel
        [(10, base + "indeed"), (11, "yet another different topic entirely with new words " * 3)],
    ]
    src = tmp_path / "lshsrc"
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_lsh_candidates(stream)
        .writeStream.format("memory")
        .queryName("lsh_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lsh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from lsh_out").collect()
    flagged = {(r.doc_id, r.first_id) for r in rows}
    assert (10, 1) in flagged  # near-dup of first-seen doc 1
    assert all(d == 10 for d, _ in flagged)  # 2 and 11 are novel


def test_stream_near_dup_verified_end_to_end(spark, tmp_path):
    """Candidates-then-verify composed INSIDE one streaming query:
    stream_lsh_candidates -> stream-static joins -> map-side exact
    Jaccard; only truly-similar pairs survive."""
    import os
    import time

    from data_management_python_spark.llmdata.dedup import (
        verify_candidates_against_corpus,
    )
    from data_management_python_spark.streaming.dedup import (
        stream_lsh_candidates,
    )

    base = "spark makes distributed data processing simple and fast for everyone " * 3
    docs = [
        (1, base),
        (2, "completely unrelated text about gardening tulips and soil here " * 3),
        (10, base + "indeed"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")

    src = tmp_path / "ndv_src"
    now = time.time()
    for i, row in enumerate(docs):
        p = src / f"b{i}"
        spark.createDataFrame([row], "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    verified = verify_candidates_against_corpus(
        stream_lsh_candidates(stream), corpus, threshold=0.2
    )
    q = (
        verified.writeStream.format("memory")
        .queryName("ndv_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ndv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from ndv_out").collect()
    pairs = {(r.doc_id, r.first_id) for r in rows}
    assert pairs == {(10, 1)}
    assert all(r.jaccard >= 0.2 for r in rows)


def test_stream_scd2_closes_spans_across_batches(spark, tmp_path):
    import os
    import time
    from datetime import datetime, timedelta

    from data_management_python_spark.streaming.scd2 import stream_scd2

    base = datetime(2024, 1, 1, 10, 0, 0)
    schema = "user_id long, event_type string, ts timestamp"
    batches = [
        # batch 0: user 1 opens A, flips to B in the same batch
        [(1, "A", base), (1, "B", base + timedelta(seconds=30))],
        # batch 1: user 1 unchanged (no-op), user 2 opens X
        [(1, "B", base + timedelta(seconds=60)),
         (2, "X", base + timedelta(seconds=60))],
        # batch 2: user 1 flips back to A -> closes the B span opened
        # in batch 0 (state carried across micro-batches)
        [(1, "A", base + timedelta(seconds=120))],
    ]
    src = tmp_path / "scd2_src"
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_scd2(stream, watermark_delay="5 seconds")
        .writeStream.format("memory")
        .queryName("scd2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from scd2_out order by user_id, valid_from").collect()
    spans = [(r.user_id, r.status) for r in rows]
    # user 1: A closed at +30s, B closed at +120s; open A span is in
    # state (not emitted); user 2's open X span likewise unemitted
    assert spans == [(1, "A"), (1, "B")]
    assert rows[0].valid_to == rows[1].valid_from  # spans tile
    assert rows[1].valid_to - rows[1].valid_from == timedelta(seconds=90)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.streaming.joins import stream_interval_join

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    clicks_b = ev.filter(F.col("event_type") == "click").drop("event_type")
    purch_b = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    csrc, psrc = tmp_path / "clicks", tmp_path / "purch"
    clicks_b.write.parquet(str(csrc))
    purch_b.write.parquet(str(psrc))

    cs = spark.readStream.schema(clicks_b.schema).parquet(str(csrc))
    ps = spark.readStream.schema(purch_b.schema).parquet(str(psrc))
    q = (
        stream_interval_join(cs, ps, horizon_minutes=30)
        .writeStream.format("memory")
        .queryName("sij_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from sij_out").collect()
    }

    # batch oracle: same interval join, static frames
    c = clicks_b.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purch_b.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        ).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    from data_management_python_spark.streaming.joins import stream_interval_join

    # one user: click at t0, purchase at t0+5min (matched), purchase at
    # t0+90min (outside the 30min horizon -> null-extended after the
    # watermark passes, which the final batch's max ts guarantees here)
    rows_c = [(1, 100, "2024-01-01 10:00:00")]
    rows_p = [
        (1, 200, "2024-01-01 10:05:00"),
        (1, 201, "2024-01-01 11:30:00"),
    ]
    # the watermark pusher arrives in a LATER micro-batch: null-extended
    # rows only flush when a subsequent batch runs with an advanced
    # watermark, so the pusher must not share a batch with the rows it
    # is meant to expire (maxFilesPerTrigger=1 sequences the files)
    rows_push = [(1, 202, "2024-01-01 23:00:00")]

    def w(rows, path):
        (
            spark.createDataFrame(
                rows, "user_id long, event_id long, ts string"
            )
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.parquet(str(path))
        )

    csrc, psrc = tmp_path / "c", tmp_path / "p"
    w(rows_c, csrc / "a")
    # the GLOBAL watermark is the min over both streams, so BOTH sides
    # need a late event or the click side pins it at its first batch
    w([(9, 900, "2024-01-01 23:00:00")], csrc / "b")
    w(rows_p, psrc / "a")
    w(rows_push, psrc / "b")
    schema = "user_id long, event_id long, ts timestamp"
    cs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(csrc / "*"))
    )
    ps = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(psrc / "*"))
    )
    q = (
        stream_interval_join(cs, ps, horizon_minutes=30, how="leftOuter")
        .writeStream.format("memory")
        .queryName("sij_lo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.purchase_id: r.click_id
        for r in spark.sql("select * from sij_lo").collect()
    }
    assert got[200] == 100  # matched within horizon
    assert 201 in got and got[201] is None  # horizon elapsed -> null row


def test_windowed_ohlc_stream_matches_batch(spark, tmp_path):
    """Streaming OHLC bars == the same aggregation run in batch: every
    bar's open/high/low/close and count, exactly."""
    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.streaming.windows import windowed_ohlc

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src_dir = tmp_path / "ohlc_src"
    ev.write.parquet(str(src_dir))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src_dir)).schema
    ).parquet(str(src_dir))
    q = (
        windowed_ohlc(stream, window="5 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("ohlc_bars")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ohlc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(r):
        return (r.window_start, r.user_id)

    got = {
        key(r): (r.open, r.high, r.low, r.close, r.n_events)
        for r in spark.sql("select * from ohlc_bars").collect()
    }
    expect = {
        key(r): (r.open, r.high, r.low, r.close, r.n_events)
        for r in windowed_ohlc(ev, window="5 minutes").collect()
    }
    # append mode only emits bars the watermark has passed; every
    # emitted bar must match batch exactly, and only bars inside the
    # final watermark horizon (10 min = 2 windows) may be withheld
    for k, v in got.items():
        assert expect[k] == v
    missing = set(expect) - set(got)
    horizon = max(s for s, _ in expect)
    import datetime

    cutoff = horizon - datetime.timedelta(minutes=10)
    assert all(s > cutoff for s, _ in missing)
    assert len(got) >= 0.9 * len(expect)


def test_stream_expectation_report_batch_parity(spark, tmp_path):
    """Each micro-batch's streamed rule report must equal the batch
    engine's report over the same rows (evaluate() is shared, so this
    pins the wiring: per-batch scoping + batch_id column)."""
    from data_management_python_spark.operators.expectations import (
        Expectation,
        evaluate,
    )
    from data_management_python_spark.streaming.expectations import (
        stream_expectation_report,
    )

    rules = [
        Expectation("v_nonneg", "between", "v", params={"lo": 0, "hi": 100}),
        Expectation("id_not_null", "not_null", "id"),
    ]
    b1 = spark.createDataFrame(
        [(1, 5.0), (2, -1.0)], "id long, v double"
    )
    b2 = spark.createDataFrame(
        [(None, 50.0), (4, 200.0)], "id long, v double"
    )
    src = tmp_path / "exp_src"
    b1.coalesce(1).write.parquet(str(src / "a"))
    b2.coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    reports = {}

    def sink(df, batch_id):
        reports[batch_id] = {r.rule: r for r in df.collect()}

    q = stream_expectation_report(
        stream, rules, sink, str(tmp_path / "ckpt_exp")
    )
    # availableNow semantics: drain with processAllAvailable then stop
    q.processAllAvailable()
    q.stop()
    assert len(reports) == 2
    # batches may arrive in either order; match by metric signature
    flat = list(reports.values())
    metrics = sorted(
        (rep["v_nonneg"].metric, rep["id_not_null"].metric) for rep in flat
    )
    # one batch: v violation (0.5 ok), ids all present (1.0)
    # other batch: v violation (0.5), one null id (0.5)
    assert metrics == [(0.5, 0.5), (0.5, 1.0)]
    # parity vs the batch engine on the same rows
    batch_rep = {r.rule: r.metric for r in evaluate(b1, rules).collect()}
    assert batch_rep == {"v_nonneg": 0.5, "id_not_null": 1.0}


def test_windowed_violation_counts_stream(spark, tmp_path):
    """Tumbling-window violation counts: row-local rules aggregated per
    window, one output row per (window, rule)."""
    from pyspark.sql import functions as F

    from data_management_python_spark.operators.expectations import Expectation
    from data_management_python_spark.streaming.expectations import (
        windowed_violation_counts,
    )

    rows = [
        ("2024-01-01 00:00:10", 5.0),
        ("2024-01-01 00:00:40", -3.0),   # violation, window 0
        ("2024-01-01 00:01:20", 7.0),
        ("2024-01-01 00:01:30", -1.0),   # violation, window 1
        ("2024-01-01 00:01:50", -2.0),   # violation, window 1
    ]
    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # a later second batch advances the watermark past both windows so
    # append mode emits them (a single batch would leave all open)
    late = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1.0)], "ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = tmp_path / "viol_src"
    df.coalesce(1).write.parquet(str(src / "a"))
    late.coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = windowed_violation_counts(
        stream,
        [Expectation("v_nonneg", "between", "v", params={"lo": 0, "hi": 100})],
        event_time_col="ts",
        window="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("viol_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_viol"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.minute, r.rule): (r.n_rows, r.n_violations)
        for r in spark.sql("select * from viol_out").collect()
    }
    # append mode only emits CLOSED windows (watermark passed)
    assert got[(0, "v_nonneg")] == (2, 1)
    assert got[(1, "v_nonneg")] == (3, 2)


def test_stream_funnel_matches_batch_query(spark, tmp_path):
    """Streaming funnel completions, fed in event-time-ordered batches,
    aggregate to EXACTLY the batch e_funnel step counts on the same
    events — and a cross-batch completion (view in batch 1, click in
    batch 2) is credited."""
    from pyspark.sql import functions as F

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.plans import collect_queries
    from data_management_python_spark.streaming.funnel import stream_funnel

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    cut = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP_LTZ)), 0.5)")
    ).first()[0]
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    src = tmp_path / "funnel_src"
    # event-time-ordered batches: all of batch a precedes batch b
    ev.filter(us <= cut).coalesce(1).write.parquet(str(src / "a"))
    ev.filter(us > cut).coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select step, count(distinct user_id) as n from funnel_out group by step"
    ).collect()
    stream_counts = {r.step: r.n for r in got}
    batch = {
        r.step: r.n_users
        for r in collect_queries()["e_funnel"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    for step in ("view", "click", "purchase"):
        assert stream_counts.get(step, 0) == batch[step], (
            step, stream_counts, batch,
        )


def test_windowed_drift_psi_stream(spark, tmp_path):
    """Streaming PSI vs a frozen baseline: a window matching the
    baseline distribution scores ~0; a shifted window scores high."""
    import math

    from pyspark.sql import functions as F

    from data_management_python_spark.streaming.expectations import (
        windowed_drift_psi,
    )

    # baseline: uniform over [0, 10) in 2 bins -> p = [0.5, 0.5]
    rows = []
    # window 0 (00:00): matches baseline — 2 low, 2 high
    for i, v in enumerate([1.0, 2.0, 8.0, 9.0]):
        rows.append((f"2024-01-01 00:00:{10 + i:02d}", v))
    # NULL carries no distribution info: must be EXCLUDED (not edge-binned)
    rows.append(("2024-01-01 00:00:30", None))
    # window 1 (00:01): all in the low bin — drifted
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((f"2024-01-01 00:01:{10 + i:02d}", v))
    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    late = spark.createDataFrame(
        [("2024-01-01 00:10:00", 5.0)], "ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = tmp_path / "psi_src"
    df.coalesce(1).write.parquet(str(src / "a"))
    late.coalesce(1).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = windowed_drift_psi(
        stream, [0.5, 0.5], lo=0.0, hi=10.0, value_col="v",
        event_time_col="ts", window="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("psi_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_psi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out_rows = spark.sql("select * from psi_out").collect()
    got = {r.window_start.minute: r.psi for r in out_rows}
    n_rows = {r.window_start.minute: r.n_rows for r in out_rows}
    assert n_rows[0] == 4  # the NULL row was excluded, not edge-binned
    assert got[0] == 0.0  # matches baseline exactly
    # fully drifted: p_cur = [1, eps] vs [0.5, 0.5]
    eps = 1e-6
    want = (1 - 0.5) * math.log(1 / 0.5) + (eps - 0.5) * math.log(eps / 0.5)
    assert abs(got[1] - round(want, 6)) < 1e-6


def test_session_window_counts_stream_matches_batch(spark, tmp_path):
    """Streaming session windows == the same session_window aggregation
    run in batch: every emitted (user, start, end, count) exactly, with
    only watermark-withheld tail sessions allowed missing — pins the
    batch contract s_session_windows registers to the actual
    readStream path."""
    import datetime

    from data_management_python_spark.catalog import load_table
    from data_management_python_spark.streaming.windows import (
        session_window_counts,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id"
    )
    src_dir = tmp_path / "sess_src"
    ev.write.parquet(str(src_dir))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src_dir)).schema
    ).parquet(str(src_dir))
    q = (
        session_window_counts(stream, gap="30 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(r):
        return (r.user_id, r.session_start, r.session_end)

    got = {
        key(r): r.n_events
        for r in spark.sql("select * from sess_windows").collect()
    }
    expect = {
        key(r): r.n_events
        for r in session_window_counts(ev, gap="30 minutes").collect()
    }
    for k, v in got.items():
        assert expect[k] == v, k
    missing = set(expect) - set(got)
    horizon = max(e for _, _, e in expect)
    cutoff = horizon - datetime.timedelta(minutes=60)
    assert all(e > cutoff for _, _, e in missing)
    assert len(got) >= 0.8 * len(expect)


def test_transform_with_state_session_gap_timers(spark, tmp_path):
    """Spark 4 typed-state sessionization with EVENT-TIME TIMERS:
    sessions close EXCLUSIVELY via handleExpiredTimer when the
    watermark passes last event + gap (a split-off cluster stays open
    in the ListState until its own timer fires — nothing emits
    eagerly), and an exact-boundary pair (diff == gap) MERGES — the
    inclusive rule the round-6 boundary fix pinned engine-wide."""
    import os
    import time
    from datetime import datetime, timedelta

    import pytest

    pytest.importorskip("google.protobuf")

    from data_management_python_spark.streaming.stateful_v2 import (
        ROCKSDB_PROVIDER,
        session_gap_v2,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        base = datetime(2024, 1, 1, 10, 0, 0)
        schema = "user_id long, ts timestamp"
        batches = [
            # user 1: events at +0s, +60s (EXACT boundary: merges),
            # then +200s in the same batch (> gap: in-batch split)
            [(1, base), (1, base + timedelta(seconds=60)),
             (1, base + timedelta(seconds=200))],
            # much later event advances the watermark past 1's close
            [(2, base + timedelta(seconds=3600))],
            # third batch fires the timer against the new watermark
            [(2, base + timedelta(seconds=3700))],
        ]
        src = tmp_path / "sessv2_src"
        now = time.time()
        for i, rows in enumerate(batches):
            p = src / f"b{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(p)
            )
            for root, _dirs, files in os.walk(p):
                for f in files:
                    os.utime(
                        os.path.join(root, f), (now - 300 + i, now - 300 + i)
                    )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            session_gap_v2(stream, gap_seconds=60, watermark_delay="5 seconds")
            .writeStream.format("memory")
            .queryName("sessv2_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_sessv2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows_out = spark.sql("select * from sessv2_out").collect()
        by_user = {}
        for r in rows_out:
            by_user.setdefault(r.user_id, []).append(r)
        base_ms = int(base.timestamp() * 1000)
        one = sorted(by_user[1], key=lambda r: r.session_start_ms)
        # first session: the boundary pair merged (2 events), split by
        # the +200s event in the same batch
        assert one[0].session_start_ms == base_ms
        assert one[0].session_end_ms == base_ms + 60_000
        assert one[0].n_events == 2
        # second session (the +200s singleton) closed by the TIMER once
        # the watermark advanced
        assert len(one) == 2
        assert one[1].session_start_ms == base_ms + 200_000
        assert one[1].session_end_ms == base_ms + 200_000
        assert one[1].n_events == 1
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_transform_with_state_map_and_list_state(spark, tmp_path):
    """Spark 4 typed-state MapState + bounded ListState across
    micro-batches: event-type counts accumulate in the map, the
    recent list truncates to K=5, and the final per-user row equals
    the batch twin on the concatenated feed."""
    import os
    import time
    from datetime import datetime, timedelta

    import pytest

    pytest.importorskip("google.protobuf")

    from data_management_python_spark.streaming.stateful_v2 import (
        ROCKSDB_PROVIDER,
        user_event_profile_v2,
        user_event_profile_v2_batch,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        base = datetime(2024, 2, 1, 8, 0, 0)
        schema = (
            "user_id long, event_id long, ts timestamp, "
            "event_type string, value double"
        )

        def ev(i, uid, sec, et, v):
            return (uid, i, base + timedelta(seconds=sec), et, v)

        batches = [
            [ev(0, 1, 0, "view", 1.0), ev(1, 1, 10, "click", 9.0),
             ev(2, 2, 5, "view", 3.0)],
            [ev(3, 1, 20, "view", 2.0), ev(4, 1, 30, "view", 4.0)],
            # 2 more for user 1 -> 7 events total, recent window slides
            # past the 9.0 at +10s
            [ev(5, 1, 40, "buy", 5.0), ev(6, 1, 50, "view", 6.0)],
        ]
        src = tmp_path / "prof_src"
        now = time.time()
        for i, rows in enumerate(batches):
            p = src / f"b{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(p)
            )
            for root, _dirs, files in os.walk(p):
                for f in files:
                    os.utime(
                        os.path.join(root, f), (now - 300 + i, now - 300 + i)
                    )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            user_event_profile_v2(stream)
            .writeStream.format("memory")
            .queryName("prof_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_prof"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update mode: last row per user is the final state
        rows_out = spark.sql(
            "select * from prof_out"
        ).collect()
        final = {}
        for r in rows_out:  # memory sink appends update rows in order
            final[r.user_id] = r
        one = final[1]
        assert one.total_events == 6 and one.n_types == 3
        assert one.top_type == "view"  # 4 views beat click/buy
        # last 5 events of user 1 by time: 10,20,30,40,50s -> max 9.0
        # at +10s is STILL in the window (6 events, window of 5 drops
        # only the +0s value 1.0)
        assert one.recent_max == 9.0
        two = final[2]
        assert two.total_events == 1 and two.top_type == "view"
        assert two.recent_max == 3.0

        # batch twin on the concatenated feed gives the same rows
        full = spark.createDataFrame(
            [e for b in batches for e in b], schema
        )
        twin = {
            r.user_id: r
            for r in user_event_profile_v2_batch(full).collect()
        }
        for uid in (1, 2):
            s, t = final[uid], twin[uid]
            assert (
                s.total_events, s.n_types, s.top_type, s.recent_max
            ) == (t.total_events, t.n_types, t.top_type, t.recent_max)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_stream_session_gap_out_of_order_within_watermark(spark, tmp_path):
    """Watermarks bound LATENESS, not order: a later micro-batch may
    deliver an event that precedes the open session's last event. The
    session must not regress its bounds (a regressed last would arm
    the timeout early and emit a wrong session_end)."""
    import os
    import time
    from datetime import datetime, timedelta

    from data_management_python_spark.streaming.windows import (
        stream_session_gap,
    )

    base = datetime(2024, 1, 1, 10, 0, 0)
    schema = "user_id long, ts timestamp"
    batches = [
        # batch 1: events at +0s and +20s
        [(1, base), (1, base + timedelta(seconds=20))],
        # batch 2: an OUT-OF-ORDER event at +10s (within the generous
        # watermark) — merges into the open session without moving
        # last back from +20s
        [(1, base + timedelta(seconds=10))],
        # advance the watermark far past user 1's close, then once more
        [(2, base + timedelta(seconds=3600))],
        [(2, base + timedelta(seconds=3700))],
    ]
    src = tmp_path / "ooo_src"
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_session_gap(stream, gap_seconds=60, watermark_delay="60 seconds")
        .writeStream.format("memory")
        .queryName("ooo_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows_out = [
        r for r in spark.sql("select * from ooo_out").collect()
        if r.user_id == 1
    ]
    assert len(rows_out) == 1
    s = rows_out[0]
    assert s.session_start == base          # start did not move
    assert s.session_end == base + timedelta(seconds=20)  # no regression
    assert s.n_events == 3                  # late event counted


def test_session_gap_v2_processor_out_of_order_unit():
    """Unit-drive SessionGapProcessor through the local handle (no
    streaming query): out-of-order events inside the watermark must
    not regress session bounds, the timer set mirrors every open
    session's close time, and a too-early event opens its OWN session
    closed only by its watermark timer (exact semantics — no eager
    flush)."""
    import pandas as pd

    from data_management_python_spark.streaming.stateful_v2 import (
        SessionGapProcessor,
        _LocalHandle,
    )

    proc = SessionGapProcessor(gap_seconds=60)
    handle = _LocalHandle()
    proc.init(handle)
    key = (1,)

    def feed(ts_seconds):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime([s * 10**9 for s in ts_seconds])}
        )
        return list(proc.handleInputRows(key, iter([pdf]), None))

    def fire(expiry_ms):
        info = type(
            "I", (), {"getExpiryTimeInMs": lambda self: expiry_ms}
        )()
        return list(proc.handleExpiredTimer(key, None, info))

    # batch 1: events at 1000s and 1020s -> one open session
    assert feed([1000, 1020]) == []
    assert sorted(handle.timers) == [1020_000 + 60_000]
    # batch 2: OUT-OF-ORDER event at 1010s -> merges, timer unchanged
    assert feed([1010]) == []
    assert sorted(handle.timers) == [1020_000 + 60_000]
    # batch 3: event far too early for the open session -> a SECOND
    # open session with its own timer; nothing emits yet
    assert feed([800]) == []
    assert sorted(handle.timers) == [800_000 + 60_000, 1020_000 + 60_000]

    # the early session's timer closes only it
    out = fire(800_000 + 60_000)
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert (row.session_start_ms, row.session_end_ms, row.n_events) == (
        800_000, 800_000, 1,
    )
    assert sorted(handle.timers) == [1020_000 + 60_000]

    # the main session's timer closes it with bounds never regressed
    out = fire(1020_000 + 60_000)
    row = out[0].iloc[0]
    assert (row.session_start_ms, row.session_end_ms, row.n_events) == (
        1000_000, 1020_000, 3,
    )
    assert handle.timers == []


def test_session_gap_v2_too_early_events_cluster_unit():
    """Round-6 second-review regression pins: too-early events (before
    the open session) must gap-cluster among THEMSELVES and with a
    start regressed by a later event in the same batch — not flush as
    isolated singletons."""
    import pandas as pd

    from data_management_python_spark.streaming.stateful_v2 import (
        SessionGapProcessor,
        _LocalHandle,
    )

    def fresh():
        proc = SessionGapProcessor(gap_seconds=60)
        proc.init(_LocalHandle())
        return proc

    key = (1,)

    def feed(proc, ts_seconds):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime([s * 10**9 for s in ts_seconds])}
        )
        out = list(proc.handleInputRows(key, iter([pdf]), None))
        return (
            [tuple(r) for r in out[0].itertuples(index=False)]
            if out
            else []
        )

    def fire(proc, expiry_ms):
        info = type(
            "I", (), {"getExpiryTimeInMs": lambda self: expiry_ms}
        )()
        out = list(proc.handleExpiredTimer((1,), None, info))
        return (
            [tuple(r) for r in out[0].itertuples(index=False)]
            if out
            else []
        )

    # case 1 (review repro): open (1000,1020); late [800, 820] within
    # gap of each other -> ONE session (800,820,2), closed by ITS timer
    p = fresh()
    assert feed(p, [1000, 1020]) == []
    assert feed(p, [800, 820]) == []
    assert fire(p, 820_000 + 60_000) == [(1, 800_000, 820_000, 2)]

    # case 2 (review repro): open (1000,1020); [895, 950] -> 950 merges
    # (inclusive chain 950->1000), 895 is within gap of 950 -> the
    # WHOLE batch merges into one open session (895..1020, 4 events);
    # nothing closes
    p = fresh()
    assert feed(p, [1000, 1020]) == []
    assert feed(p, [895, 950]) == []
    out = list(
        p.handleExpiredTimer(
            key, None, type("I", (), {
                "getExpiryTimeInMs": lambda self: 1020_000 + 60_000
            })()
        )
    )
    row = out[0].iloc[0]
    assert (row.session_start_ms, row.session_end_ms, row.n_events) == (
        895_000, 1020_000, 4,
    )

    # case 3: genuinely separate early cluster closes via its timer
    p = fresh()
    assert feed(p, [1000, 1020]) == []
    assert feed(p, [700]) == []
    assert fire(p, 700_000 + 60_000) == [(1, 700_000, 700_000, 1)]


def test_stream_session_gap_cross_batch_late_bridge_merges(spark, tmp_path):
    """Round-7: the old-API operator is now EXACT across batches.  A
    late in-watermark batch delivers events that BRIDGE the two open
    clusters (0s ... 60s/120s ... 130s, all gaps <= 60s inclusive) —
    the retired O(1)-newest-cluster state had already flushed the
    first cluster eagerly and emitted TWO sessions; the list-state
    rewrite must emit exactly one merged session, matching both a
    batch recompute and the typed-state v2 processor."""
    import os
    import time
    from datetime import datetime, timedelta

    from data_management_python_spark.streaming.windows import (
        stream_session_gap,
    )

    base = datetime(2024, 1, 1, 10, 0, 0)
    schema = "user_id long, ts timestamp"
    batches = [
        [(1, base)],                                 # cluster A opens
        [(1, base + timedelta(seconds=130))],        # cluster B opens
        # late bridge, inside the 600s watermark: 60s joins A
        # (inclusive boundary), 120s joins 60s, 130s joins 120s
        [(1, base + timedelta(seconds=60)),
         (1, base + timedelta(seconds=120))],
        # advance the watermark far past user 1's close, then once
        # more so the event-time timeout fires
        [(2, base + timedelta(seconds=4000))],
        [(2, base + timedelta(seconds=4100))],
    ]
    src = tmp_path / "bridge_src"
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(p))
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 300 + i, now - 300 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_session_gap(
            stream, gap_seconds=60, watermark_delay="600 seconds"
        )
        .writeStream.format("memory")
        .queryName("bridge_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bridge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows_out = [
        r for r in spark.sql("select * from bridge_out").collect()
        if r.user_id == 1
    ]
    assert len(rows_out) == 1, rows_out  # ONE merged session, not two
    s = rows_out[0]
    assert s.session_start == base
    assert s.session_end == base + timedelta(seconds=130)
    assert s.n_events == 4


def test_session_gap_v2_wide_watermark_many_open_sessions(spark, tmp_path):
    """Round-7 state-store stress: a skewed user holds HUNDREDS of open
    sessions under a wide (24 h) watermark horizon, then one watermark
    jump drains them all.  Pins (a) state size tracks the horizon
    (every session stays open until the jump — nothing emits early),
    (b) the closure storm is watermark-wide, not per-timer-quadratic
    (the round-7 handleExpiredTimer fix), (c) every session emits
    exactly once, and (d) the ListState is EMPTY afterwards (asserted
    through the state-store reader when this Spark exposes
    transformWithState state, else via a no-further-emissions batch)."""
    import os
    import time
    from datetime import datetime, timedelta

    import pytest

    pytest.importorskip("google.protobuf")

    from data_management_python_spark.streaming.stateful_v2 import (
        ROCKSDB_PROVIDER,
        session_gap_v2,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        k_open = 400
        base = datetime(2024, 1, 1, 0, 0, 0)
        schema = "user_id long, ts timestamp"
        hot = [
            (1, base + timedelta(seconds=120 * i)) for i in range(k_open)
        ]  # 120s apart > 60s gap: each event is its own session
        cold = [(2, base), (2, base + timedelta(seconds=30))]
        far = base + timedelta(seconds=120 * k_open + 24 * 3600 + 3600)
        batches = [
            hot[: k_open // 2] + cold,
            hot[k_open // 2 :],
            [(3, far)],                              # watermark jump
            [(3, far + timedelta(seconds=3600))],    # fire the timers
        ]
        src = tmp_path / "wide_src"
        now = time.time()
        for i, rows in enumerate(batches):
            p = src / f"b{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(p)
            )
            for root, _dirs, files in os.walk(p):
                for f in files:
                    os.utime(
                        os.path.join(root, f), (now - 300 + i, now - 300 + i)
                    )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        ckpt = str(tmp_path / "ckpt_wide")
        t0 = time.time()
        q = (
            session_gap_v2(
                stream, gap_seconds=60, watermark_delay="24 hours"
            )
            .writeStream.format("memory")
            .queryName("wide_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        wall = time.time() - t0
        rows_out = spark.sql("select * from wide_out").collect()
        one = [r for r in rows_out if r.user_id == 1]
        # every open session drained exactly once, none emitted early
        assert len(one) == k_open
        base_ms = int(base.timestamp() * 1000)
        starts = sorted(r.session_start_ms for r in one)
        assert starts == [base_ms + 120_000 * i for i in range(k_open)]
        assert all(
            r.session_end_ms == r.session_start_ms and r.n_events == 1
            for r in one
        )
        two = [r for r in rows_out if r.user_id == 2]
        assert len(two) == 1 and two[0].n_events == 2
        # final state emptiness through the state-store reader: user
        # 3's open session must be the ONLY surviving ListState entry
        # (its close is still inside the watermark — the positive
        # control proving the reader sees state at all), and every
        # drained user-1/2 session must be GONE from RocksDB
        state = (
            spark.read.format("statestore")
            .option("path", ckpt)
            .option("stateVarName", "sessions")
            .load()
        )
        rows_live = state.collect()
        live_keys = sorted({r.key.user_id for r in rows_live})
        assert live_keys == [3], rows_live
        print(f"wide-watermark stress: {k_open} open sessions drained "
              f"in one jump, wall {wall:.1f}s")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
