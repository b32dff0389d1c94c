from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_management_python_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # TIMESTAMP_NTZ: the driver's testdata parquet stores naive
    # timestamps; round-1 shipped an NTZ-only bug that local fixtures
    # (plain TIMESTAMP) could not catch.  Pinning the session timestamp
    # type makes every fixture-created timestamp NTZ like production.
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions="4",
        extra_conf={"spark.sql.timestampType": "TIMESTAMP_NTZ"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
