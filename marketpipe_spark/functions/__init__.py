"""Shared column-expression helpers.

All time-bucket math is pure int64 arithmetic on ``ts_ns`` — the reference's
DuckDB ``floor(ts_ns/W)*W`` on BIGINT (aggregation/domain/services.py:36) is
reproduced bit-exactly as ``ts_ns - ts_ns % W`` to avoid double-precision
floor drift at ns magnitudes (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000
NS_PER_MIN = 60 * NS_PER_SEC
NS_PER_DAY = 86_400 * NS_PER_SEC

#: 13:30 UTC (09:30 ET) daily-bar label offset, ns.  The reference labels 1d
#: bars at market open: epoch(utc_day) + 13.5h
#: (aggregation/domain/services.py:16-30).
DAILY_LABEL_OFFSET_NS = 48_600 * NS_PER_SEC


def col_or_expr(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bucket_ns(ts_ns: str | Column, window_ns: int) -> Column:
    """Tumbling-window bucket label: integer-exact ``ts_ns - ts_ns % W``."""
    c = col_or_expr(ts_ns)
    return (c - (c % F.lit(window_ns))).cast("long")


def day_ns(ts_ns: str | Column) -> Column:
    """UTC-day floor of a ns timestamp (integer arithmetic)."""
    return bucket_ns(ts_ns, NS_PER_DAY)


def daily_label_ns(ts_ns: str | Column) -> Column:
    """Reference 1d bar label: UTC midnight + 13:30 (services.py:21)."""
    return (day_ns(ts_ns) + F.lit(DAILY_LABEL_OFFSET_NS)).cast("long")


def ts_ns_from_timestamp(ts: str | Column) -> Column:
    """Instant -> int64 ns.  Timezone-independent (unix_micros is an instant
    op), so results don't depend on the session zone."""
    return (F.unix_micros(col_or_expr(ts)) * F.lit(1000)).cast("long")


def timestamp_from_ts_ns(ts_ns: str | Column) -> Column:
    """int64 ns -> µs TimestampType (display only; truncates sub-µs)."""
    return F.timestamp_micros((col_or_expr(ts_ns) / F.lit(1000)).cast("long"))


def trading_date(ts_ns: str | Column) -> Column:
    """UTC calendar date of a ns timestamp
    (reference: domain/value_objects.py:230-236)."""
    return F.to_date(timestamp_from_ts_ns(day_ns(ts_ns)))


def minute_aligned(ts_ns: str | Column) -> Column:
    """True when the timestamp sits on a minute boundary
    (validation rule 5, validation/domain/services.py:84-87)."""
    return (col_or_expr(ts_ns) % F.lit(NS_PER_MIN)) == 0


def typical_price(high: str | Column, low: str | Column, close: str | Column) -> Column:
    """(H+L+C)/3 — VWAP fallback price (domain/services.py:49-56)."""
    return (col_or_expr(high) + col_or_expr(low) + col_or_expr(close)) / F.lit(3.0)


def pct_change(open_: str | Column, close: str | Column) -> Column:
    """(close-open)/open*100 (reference: domain/entities.py:178-204)."""
    o = col_or_expr(open_)
    return (col_or_expr(close) - o) / o * F.lit(100.0)


def dsum(c: str | Column, scale: int = 4) -> Column:
    """Order-deterministic SUM of a double column.

    Doubles summed across shuffle partitions are non-associative; casting each
    addend to Decimal(38, scale) makes the sum exact and therefore independent
    of partitioning — required for bit-stable parity with a single-threaded
    oracle, and good hygiene for money columns at any scale.
    """
    return F.sum(col_or_expr(c).cast(f"decimal(38,{scale})"))


def dsum_d(c: str | Column, scale: int = 4) -> Column:
    """:func:`dsum` cast back to double (deterministic decimal->double)."""
    return dsum(c, scale).cast("double")
