from __future__ import annotations

import math

from pyspark.sql import functions as F

from marketpipe_spark.operators.analytics import (
    availability_summary,
    daily_summary,
    rolling_volatility,
    sma,
    vwap,
)
from marketpipe_spark.operators.resample import resample


def test_vwap_golden(golden_bars):
    # price_i = typical = (high+low+close)/3; vol_i = 1000+100i
    rows = golden_bars.collect()
    num = sum(((r.high + r.low + r.close) / 3) * r.volume for r in rows)
    den = sum(r.volume for r in rows)
    out = vwap(golden_bars).collect()
    assert len(out) == 1
    assert math.isclose(out[0].vwap, num / den, rel_tol=1e-12)
    assert out[0].total_volume == den


def test_vwap_skips_zero_volume(spark, golden_bars):
    zero = golden_bars.withColumn("volume", F.lit(0))
    out = vwap(zero).collect()
    assert out[0].vwap is None


def test_daily_summary_golden(golden_bars):
    out = daily_summary(golden_bars).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close) == (100.0, 110.0, 99.0, 109.5)
    assert r.bar_count == 10
    assert r.first_bar_ns < r.last_bar_ns
    assert str(r.trading_date) == "2022-01-01"


def test_sma_null_until_n(golden_bars):
    out = sma(golden_bars, n=5).orderBy("ts_ns").collect()
    assert all(r["sma_5"] is None for r in out[:4])
    # bar 5: avg of closes 100.5..104.5 = 102.5
    assert math.isclose(out[4]["sma_5"], 102.5, rel_tol=1e-12)


def test_volatility_null_until_n(golden_bars):
    out = rolling_volatility(golden_bars, n=5).orderBy("ts_ns").collect()
    # returns start at bar 2 → 5th return at bar 6
    assert all(r["volatility_5"] is None for r in out[:5])
    assert out[5]["volatility_5"] is not None and out[5]["volatility_5"] > 0


def test_availability(golden_bars):
    frames = {"5m": resample(golden_bars, "5m"), "1d": resample(golden_bars, "1d")}
    out = {(r.frame, r.symbol): (r.days, r.row_count) for r in availability_summary(frames).collect()}
    assert out[("5m", "AAPL")] == (1, 2)
    assert out[("1d", "AAPL")] == (1, 1)
