"""Analytics services: VWAP, daily summary, SMA, rolling volatility,
availability summary — the reference's calculation services as DataFrame ops.

Reference: src/marketpipe/domain/services.py (VWAP :38-76, daily summary
:78-139, SMA :284-326, volatility :328-371) and
src/marketpipe/aggregation/infrastructure/duckdb_views.py:128-162 (A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import NS_PER_DAY, typical_price


def vwap(bars: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """A4 — volume-weighted average price per group.

    Price per bar = ``vwap`` column if present else typical (H+L+C)/3;
    zero-volume bars are skipped (reference: domain/services.py:49-66).
    """
    group_cols = group_cols or ["symbol"]
    price = (
        F.coalesce(F.col("vwap"), typical_price("high", "low", "close"))
        if "vwap" in bars.columns
        else typical_price("high", "low", "close")
    )
    pos = F.col("volume") > 0
    sum_pv = F.sum(F.when(pos, price * F.col("volume")))
    sum_v = F.sum(F.when(pos, F.col("volume")))
    return bars.groupBy(*group_cols).agg(
        F.try_divide(sum_pv, sum_v.cast("double")).alias("vwap"),
        sum_v.alias("total_volume"),
    )


def daily_summary(bars: DataFrame) -> DataFrame:
    """A5 — per (symbol, UTC day): OHLCV + vwap + bar_count + first/last bar
    time (reference: domain/services.py:78-139, aggregates.py:471-499)."""
    day_ns = (F.col("ts_ns") - F.col("ts_ns") % F.lit(NS_PER_DAY)).alias("day_ns")
    price = typical_price("high", "low", "close")
    pos = F.col("volume") > 0
    return (
        bars.withColumn("day_ns", day_ns)
        .groupBy("symbol", "day_ns")
        .agg(
            F.min_by("open", "ts_ns").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "ts_ns").alias("close"),
            F.sum("volume").alias("volume"),
            F.try_divide(
                F.sum(F.when(pos, price * F.col("volume"))),
                F.sum(F.when(pos, F.col("volume"))).cast("double"),
            ).alias("vwap"),
            F.count(F.lit(1)).alias("bar_count"),
            F.min("ts_ns").alias("first_bar_ns"),
            F.max("ts_ns").alias("last_bar_ns"),
        )
        .withColumn(
            "trading_date",
            F.to_date(F.timestamp_micros((F.col("day_ns") / F.lit(1000)).cast("long"))),
        )
        .drop("day_ns")
    )


def sma(
    bars: DataFrame,
    n: int = 20,
    price_col: str = "close",
    skew_span: int | str | None = None,
) -> DataFrame:
    """W4 — trailing-N simple moving average; NULL until N samples
    (reference: domain/services.py:284-326). ``skew_span`` (ns) chunks the
    per-symbol window with a bounded carry — identical output, no hot-symbol
    straggler (see ``skew.chunked_trailing_frame``); ``"auto"`` profiles the
    data first and chunks only diagnosed hot symbols
    (``skew.plan_trailing_skew``)."""
    from .skew import chunked_trailing_frame, resolve_trailing_skew

    skew_span, hot = resolve_trailing_skew(bars, "symbol", "ts_ns", skew_span)
    src, parts = bars, ["symbol"]
    if skew_span is not None:
        src = chunked_trailing_frame(
            bars, "symbol", "ts_ns", n - 1, skew_span, hot_keys=hot
        )
        parts = ["symbol", "_chunk"]
    w = W.partitionBy(*parts).orderBy("ts_ns").rowsBetween(-(n - 1), 0)
    avg_n = F.avg(price_col).over(w)
    cnt = F.count(F.lit(1)).over(w)
    out = src.withColumn(f"sma_{n}", F.when(cnt >= n, avg_n))
    if skew_span is not None:
        out = out.filter(F.col("_carry") == 0).drop("_chunk", "_carry")
    return out


def rolling_volatility(
    bars: DataFrame,
    n: int = 20,
    price_col: str = "close",
    skew_span: int | str | None = None,
) -> DataFrame:
    """W5 — sample stddev of ln-returns over the trailing N returns; NULL
    until enough data (reference: domain/services.py:328-371). ``skew_span``
    as in :func:`sma` (lookback here is n: n-1 frame rows + 1 lag row),
    ``"auto"`` included."""
    from .skew import chunked_trailing_frame, resolve_trailing_skew

    skew_span, hot = resolve_trailing_skew(bars, "symbol", "ts_ns", skew_span)
    src, parts = bars, ["symbol"]
    if skew_span is not None:
        src = chunked_trailing_frame(
            bars, "symbol", "ts_ns", n, skew_span, hot_keys=hot
        )
        parts = ["symbol", "_chunk"]
    wo = W.partitionBy(*parts).orderBy("ts_ns")
    wf = wo.rowsBetween(-(n - 1), 0)
    prev = F.lag(price_col).over(wo)
    ret = F.when(prev.isNotNull() & (prev > 0) & (F.col(price_col) > 0), F.log(F.col(price_col) / prev))
    with_ret = src.withColumn("_ret", ret)
    cnt = F.count("_ret").over(wf)
    vol = F.stddev_samp("_ret").over(wf)
    out = with_ret.withColumn(f"volatility_{n}", F.when(cnt >= n, vol)).drop("_ret")
    if skew_span is not None:
        out = out.filter(F.col("_carry") == 0).drop("_chunk", "_carry")
    return out


def availability_summary(frames: dict[str, DataFrame]) -> DataFrame:
    """A6 — per (frame, symbol): distinct trading days + row count over a
    union of per-frame bar tables (reference: duckdb_views.py:128-162)."""
    parts = []
    for frame, df in frames.items():
        parts.append(
            df.select(
                F.lit(frame).alias("frame"),
                "symbol",
                (F.col("ts_ns") - F.col("ts_ns") % F.lit(NS_PER_DAY)).alias("day_ns"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("frame", "symbol").agg(
        F.countDistinct("day_ns").alias("days"), F.count(F.lit(1)).alias("row_count")
    )
