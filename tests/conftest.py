from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("marketpipe-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def golden_bars(spark):
    """Reference golden fixture: 10 AAPL 1m bars
    (reference: tests/unit/aggregation/test_duckdb_engine.py:33-91)."""
    base = 1_640_995_800_000_000_000
    rows = [
        ("AAPL", base + i * 60_000_000_000, 100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1000 + 100 * i)
        for i in range(10)
    ]
    from marketpipe_spark.schema import BARS_MIN_SCHEMA

    return spark.createDataFrame(rows, BARS_MIN_SCHEMA)
