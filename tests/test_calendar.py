"""Trading-calendar functions (reference TradingCalendarService,
domain/services.py:610-689): weekday math on ns timestamps and date-level
next/previous trading day."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketpipe_spark.functions import (
    NS_PER_DAY,
    SESSION_CLOSE_NS,
    SESSION_OPEN_NS,
    is_regular_session_ns,
    is_trading_day_ns,
    next_trading_day,
    previous_trading_day,
    weekday_idx,
)


def _ns(datestr: str, sec_of_day: int = 0) -> int:
    d = dt.datetime.fromisoformat(datestr).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * 10**9 + sec_of_day * 10**9


def test_weekday_idx_matches_python(spark):
    days = [f"2024-01-{d:02d}" for d in range(1, 15)]  # 2024-01-01 was a Monday
    df = spark.createDataFrame([(s, _ns(s)) for s in days], "d string, ts_ns long")
    out = {r.d: r.wd for r in df.select("d", weekday_idx("ts_ns").alias("wd")).collect()}
    for s in days:
        assert out[s] == dt.date.fromisoformat(s).weekday()


def test_trading_day_and_session_bounds(spark):
    rows = [
        ("mon_open", _ns("2024-01-08") + SESSION_OPEN_NS, True),
        ("mon_pre", _ns("2024-01-08") + SESSION_OPEN_NS - 10**9, False),
        ("mon_close", _ns("2024-01-08") + SESSION_CLOSE_NS, False),  # [open, close)
        ("mon_last", _ns("2024-01-08") + SESSION_CLOSE_NS - 10**9, True),
        ("sat_open", _ns("2024-01-06") + SESSION_OPEN_NS, False),  # weekend
    ]
    df = spark.createDataFrame([(n, t) for n, t, _ in rows], "name string, ts_ns long")
    got = {r.name: r.ok for r in df.select("name", is_regular_session_ns("ts_ns").alias("ok")).collect()}
    for name, _, want in rows:
        assert got[name] is want, name
    td = {r.name: r.td for r in df.select("name", is_trading_day_ns("ts_ns").alias("td")).collect()}
    assert td["mon_open"] and not td["sat_open"]


def test_next_previous_trading_day(spark):
    cases = [
        ("2024-01-08", "2024-01-09", "2024-01-05"),  # Mon -> Tue / prev Fri
        ("2024-01-12", "2024-01-15", "2024-01-11"),  # Fri -> Mon
        ("2024-01-13", "2024-01-15", "2024-01-12"),  # Sat -> Mon / Fri
        ("2024-01-14", "2024-01-15", "2024-01-12"),  # Sun -> Mon / Fri
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "d string").select(
        F.col("d"),
        next_trading_day(F.to_date("d")).alias("nxt"),
        previous_trading_day(F.to_date("d")).alias("prv"),
    )
    got = {r.d: (str(r.nxt), str(r.prv)) for r in df.collect()}
    for d, nxt, prv in cases:
        assert got[d] == (nxt, prv), d
