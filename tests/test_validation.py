"""Validation rule tests — fixture shapes from FIXTURES.md §2 / reference
tests/unit/validation."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketpipe_spark.operators.validation import split_valid, validate_bars
from marketpipe_spark.schema import BARS_MIN_SCHEMA

BASE = 1_640_995_800_000_000_000  # 2022-01-01 13:30 UTC (Saturday)
MIN = 60_000_000_000


def _bars(spark, rows):
    return spark.createDataFrame(rows, BARS_MIN_SCHEMA)


def _reasons(df, **kw):
    return {
        (r.symbol, r.ts_ns, r.reason)
        for r in validate_bars(df, **kw).collect()
    }


def test_clean_bars_pass(spark, golden_bars):
    errs = validate_bars(golden_bars, market_hours=False)
    assert errs.count() == 0


def test_non_positive_price(spark):
    df = _bars(spark, [("AAPL", BASE, -1.0, 1.0, 0.5, 1.0, 10)])
    reasons = {r for (_, _, r) in _reasons(df, market_hours=False)}
    assert "non_positive_price" in reasons


def test_ohlc_inconsistent(spark):
    df = _bars(spark, [("AAPL", BASE, 100.0, 99.0, 98.0, 100.0, 10)])  # high < open
    assert "ohlc_inconsistent" in {r for (_, _, r) in _reasons(df, market_hours=False)}


def test_negative_volume_and_alignment(spark):
    df = _bars(spark, [("AAPL", BASE + 500, 1.0, 1.0, 1.0, 1.0, -5)])
    rs = {r for (_, _, r) in _reasons(df, market_hours=False)}
    assert "negative_volume" in rs
    assert "timestamp_not_minute_aligned" in rs


def test_non_monotonic(spark):
    rows = [
        ("AAPL", BASE + MIN, 1.0, 1.0, 1.0, 1.0, 1),
        ("AAPL", BASE, 1.0, 1.0, 1.0, 1.0, 1),
        ("AAPL", BASE, 1.0, 1.0, 1.0, 1.0, 1),  # duplicate ts
    ]
    rs = {r for (_, _, r) in _reasons(_bars(spark, rows), market_hours=False)}
    assert "non_monotonic_timestamp" in rs


def test_extreme_movement(spark):
    rows = [
        ("AAPL", BASE, 100.0, 100.0, 100.0, 100.0, 1),
        ("AAPL", BASE + MIN, 151.0, 151.0, 151.0, 151.0, 1),  # +51% open vs prev close
    ]
    rs = _reasons(_bars(spark, rows), market_hours=False)
    assert ("AAPL", BASE + MIN, "extreme_price_movement") in rs


def test_zero_volume_with_movement_and_sustained(spark):
    rows = [
        ("AAPL", BASE + i * MIN, 1.0, 1.0, 1.0, 1.0 + (0.1 if i == 0 else 0.0), 0)
        for i in range(10)
    ]
    rs = {r for (_, _, r) in _reasons(_bars(spark, rows), market_hours=False)}
    assert "zero_volume_with_movement" in rs
    assert "sustained_zero_volume" in rs


def test_volume_spike(spark):
    rows = [("AAPL", BASE + i * MIN, 1.0, 1.0, 1.0, 1.0, 100) for i in range(20)]
    rows.append(("AAPL", BASE + 20 * MIN, 1.0, 1.0, 1.0, 1.0, 5000))
    rs = _reasons(_bars(spark, rows), market_hours=False)
    assert ("AAPL", BASE + 20 * MIN, "volume_spike") in rs


def test_weekend_and_hours(spark):
    # BASE = 2022-01-01 (Saturday) 13:30 UTC
    df = _bars(spark, [("AAPL", BASE, 1.0, 1.0, 1.0, 1.0, 1)])
    rs = {r for (_, _, r) in _reasons(df, market_hours=True)}
    assert "weekend_bar" in rs
    # 05:00 UTC Monday 2022-01-03 → outside market hours
    mon = 1_641_186_000_000_000_000
    df2 = _bars(spark, [("AAPL", mon, 1.0, 1.0, 1.0, 1.0, 1)])
    rs2 = {r for (_, _, r) in _reasons(df2, market_hours=True)}
    assert "outside_market_hours" in rs2


def test_split_valid(spark, golden_bars):
    # bad bar: negative volume, but prices chosen so it does NOT poison its
    # neighbors' movement checks (a price-corrupt bar would, by design)
    bad = _bars(spark, [("AAPL", BASE + 500, 100.6, 100.7, 100.5, 100.6, -5)])
    allb = golden_bars.union(bad)
    valid, errors = split_valid(allb, market_hours=False)
    assert valid.count() == 10
    assert errors.filter(F.col("ts_ns") == BASE + 500).count() > 0
