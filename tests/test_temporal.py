"""Unit tests for operators.temporal (as-of join, range join) on
hand-built frames where the expected matches are enumerable by eye.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_management_python_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # one key with interleaved state changes, one key never matched
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:10:00"), 102.0),
            ("B", _ts("2024-01-01 10:07:00"), 200.0),
        ],
        "sym string, qts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 1, _ts("2024-01-01 09:59:00")),  # before any quote
            ("A", 2, _ts("2024-01-01 10:05:00")),  # exactly at a quote
            ("A", 3, _ts("2024-01-01 10:07:30")),  # between quotes
            ("A", 4, _ts("2024-01-01 11:00:00")),  # after the last quote
            ("B", 5, _ts("2024-01-01 10:06:00")),  # before B's only quote
            ("C", 6, _ts("2024-01-01 10:00:00")),  # key with no quotes
        ],
        "sym string, trade_id int, tts timestamp",
    )


def _px_by_trade(df):
    return {r["trade_id"]: r["px"] for r in df.collect()}


def test_asof_backward(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    assert out.count() == 6  # left join keeps everything
    px = _px_by_trade(out)
    assert px[1] is None          # no quote yet
    assert px[2] == 101.0         # equality is inclusive
    assert px[3] == 101.0         # latest prior
    assert px[4] == 102.0         # carries arbitrarily far forward
    assert px[5] is None          # B's quote is later
    assert px[6] is None          # no such key


def test_asof_forward(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        direction="forward",
    )
    px = _px_by_trade(out)
    assert px[1] == 100.0         # earliest following
    assert px[2] == 101.0         # equality is inclusive
    assert px[3] == 102.0
    assert px[4] is None          # nothing after
    assert px[5] == 200.0


def test_asof_tolerance_and_inner(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        tolerance_seconds=180,
    )
    px = _px_by_trade(out)
    assert px[2] == 101.0         # gap 0
    assert px[3] == 101.0         # gap 150s <= 180s
    assert px[4] is None          # gap 50min > tolerance
    inner = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts", how="inner"
    )
    assert sorted(r["trade_id"] for r in inner.collect()) == [2, 3, 4]


def test_asof_returns_matched_state_time(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    row = {r["trade_id"]: r for r in out.collect()}[3]
    assert row["qts"] == _ts("2024-01-01 10:05:00")


def test_asof_column_collision_raises(spark, quotes, trades):
    with pytest.raises(ValueError, match="collision"):
        asof_join(
            trades.withColumnRenamed("tts", "qts"),
            quotes, on="sym", left_ts="qts", right_ts="qts",
        )


def test_range_join_bucket_boundaries(spark):
    # interval spans a bucket boundary; probes sit on every edge
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:04:00"), _ts("2024-01-01 10:06:00"))],
        "iv_id int, w_start timestamp, w_end timestamp",
    )
    probes = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:03:59")),  # just before
            (11, _ts("2024-01-01 10:04:00")),  # start inclusive
            (12, _ts("2024-01-01 10:05:00")),  # next bucket, inside
            (13, _ts("2024-01-01 10:05:59")),  # last inside
            (14, _ts("2024-01-01 10:06:00")),  # end exclusive
        ],
        "p_id int, p_ts timestamp",
    )
    out = range_join(iv, probes, "w_start", "w_end", "p_ts", bucket_seconds=60)
    assert sorted(r["p_id"] for r in out.collect()) == [11, 12, 13]


def test_range_join_equality_keys_and_left(spark):
    iv = spark.createDataFrame(
        [
            ("u1", 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("u2", 2, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        "user string, iv_id int, w_start timestamp, w_end timestamp",
    )
    probes = spark.createDataFrame(
        [("u1", 10, _ts("2024-01-01 10:30:00"))],
        "user string, p_id int, p_ts timestamp",
    )
    inner = range_join(
        iv, probes, "w_start", "w_end", "p_ts", bucket_seconds=3600, on=["user"]
    )
    assert [(r["iv_id"], r["p_id"]) for r in inner.collect()] == [(1, 10)]
    left = range_join(
        iv, probes, "w_start", "w_end", "p_ts", bucket_seconds=3600,
        on=["user"], how="left",
    )
    rows = {r["iv_id"]: r["p_id"] for r in left.collect()}
    assert rows == {1: 10, 2: None}


def test_asof_plan_has_no_nested_loop(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_plan_is_equi_join(spark):
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:05:00"))],
        "iv_id int, w_start timestamp, w_end timestamp",
    )
    probes = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:01:00"))], "p_id int, p_ts timestamp"
    )
    out = range_join(iv, probes, "w_start", "w_end", "p_ts", bucket_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
