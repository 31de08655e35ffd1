"""Testdata-contract test: the events ``ts`` column has drifted between
driver generations (round 1: parquet TIMESTAMP(NANOS) → long via
``nanosAsLong``; round 2: TIMESTAMP(MICROS) → timestamp_ntz). ``bars()``
must produce the SAME ``ts_ns`` values for the same instants regardless of
the physical type on disk, so schema drift can never zero the scoreboard
again (reference analog: the typed empty-view fallback discipline in
src/marketpipe/aggregation/infrastructure/duckdb_views.py:44-51).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marketpipe_spark.plans.registry import bars, ts_ns_expr

# µs-precision instants (what both physical encodings can represent exactly)
US_VALUES = [
    1_704_067_200_000_000,  # 2024-01-01T00:00:00Z
    1_704_500_123_456_789,  # sub-second µs precision
    1_705_000_000_999_999,
    1_706_572_800_000_001,
]
GOLDEN_NS = [v * 1000 for v in US_VALUES]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    n = len(US_VALUES)
    if pa.types.is_timestamp(ts_type):
        ts = pa.array(US_VALUES, type=pa.timestamp("us")).cast(ts_type)
    else:
        ts = pa.array([v * 1000 for v in US_VALUES], type=ts_type)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * n, type=pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize(
    "label,ts_type",
    [
        ("long_ns", pa.timestamp("ns")),       # round-1 layout: NANOS → long
        ("timestamp_us", pa.timestamp("us")),  # round-2 layout: MICROS → ntz
    ],
)
def test_bars_ts_ns_identical_across_physical_types(spark, tmp_path, label, ts_type):
    d = tmp_path / label
    d.mkdir()
    _write_events(str(d / "events.parquet"), ts_type)
    got = [r.ts_ns for r in bars(spark, str(d)).select("ts_ns").orderBy("ts_ns").collect()]
    assert got == GOLDEN_NS, f"{label}: ts_ns mismatch"


def test_ts_ns_expr_rejects_nothing_current_testdata(spark):
    """The live testdata (whatever type the driver wrote this round) must
    analyze and produce plausible 2024-era ns epochs."""
    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    row = ev.select(ts_ns_expr(ev).alias("ts_ns")).agg(
        {"ts_ns": "min"}
    ).collect()[0]
    assert row[0] > 1_500_000_000_000_000_000  # after 2017 in ns
