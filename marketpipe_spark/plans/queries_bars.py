"""MarketPipe-semantics queries over the driver's ``events`` stream mapped to
OHLCV bars. Each reproduces an operator from SURVEY §2 with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import NS_PER_DAY, NS_PER_SEC, DAILY_LABEL_OFFSET_NS
from ..operators.resample import resample_daily, resample_intraday
from .registry import SQL_BARS, bars, register


def _bars_core(spark, sf_dir):
    return bars(spark, sf_dir).select(
        "symbol", "ts_ns", "open", "high", "low", "close", "volume"
    )


# ---------------------------------------------------------------------------
# A1 — intraday resample (reference: aggregation/domain/services.py:31-45)

def _resample_sql(window_ns: int) -> str:
    return f"""
WITH {SQL_BARS},
b AS (SELECT symbol, ts_ns - (ts_ns % {window_ns}) AS bucket,
             ts_ns, open, high, low, close, volume FROM bars)
SELECT symbol, bucket AS ts_ns,
       min_by(open, ts_ns) AS open, max(high) AS high, min(low) AS low,
       max_by(close, ts_ns) AS close, CAST(SUM(volume) AS BIGINT) AS volume
FROM b GROUP BY symbol, bucket
"""


@register(
    "resample_5m",
    _resample_sql(300 * NS_PER_SEC),
    doc="A1 intraday OHLCV resample, 5m frame (services.py:31-45)",
    tags=("agg", "core"),
)
def q_resample_5m(spark, sf_dir):
    return resample_intraday(_bars_core(spark, sf_dir), 300)


@register(
    "resample_1h",
    _resample_sql(3600 * NS_PER_SEC),
    doc="A1 intraday OHLCV resample, 1h frame",
    tags=("agg", "core"),
)
def q_resample_1h(spark, sf_dir):
    return resample_intraday(_bars_core(spark, sf_dir), 3600)


@register(
    "resample_15m",
    _resample_sql(900 * NS_PER_SEC),
    doc="A1 intraday OHLCV resample, 15m frame",
    tags=("agg", "core"),
)
def q_resample_15m(spark, sf_dir):
    return resample_intraday(_bars_core(spark, sf_dir), 900)


@register(
    "resample_4h",
    _resample_sql(14400 * NS_PER_SEC),
    doc="A1 intraday OHLCV resample, 4h frame",
    tags=("agg", "core"),
)
def q_resample_4h(spark, sf_dir):
    return resample_intraday(_bars_core(spark, sf_dir), 14400)


# ---------------------------------------------------------------------------
# A2 — daily resample labeled 13:30 UTC (services.py:16-30)

SQL_RESAMPLE_1D = f"""
WITH {SQL_BARS},
b AS (SELECT symbol, ts_ns - (ts_ns % {NS_PER_DAY}) + {DAILY_LABEL_OFFSET_NS} AS label,
             ts_ns, open, high, low, close, volume FROM bars)
SELECT symbol, label AS ts_ns,
       min_by(open, ts_ns) AS open, max(high) AS high, min(low) AS low,
       max_by(close, ts_ns) AS close, CAST(SUM(volume) AS BIGINT) AS volume
FROM b GROUP BY symbol, label
"""


@register("resample_1d", SQL_RESAMPLE_1D, doc="A2 daily resample @ 13:30 UTC label", tags=("agg", "core"))
def q_resample_1d(spark, sf_dir):
    return resample_daily(_bars_core(spark, sf_dir))


# ---------------------------------------------------------------------------
# A4 — VWAP (reference: domain/services.py:38-76): price falls back to
# typical (H+L+C)/3; zero-volume bars skipped.

SQL_VWAP = f"""
WITH {SQL_BARS}
SELECT symbol,
       CAST(SUM(CASE WHEN volume > 0
                     THEN CAST(((high + low + close) / 3.0) * volume AS DECIMAL(38,6)) END)
            AS DOUBLE)
       / CAST(CAST(SUM(CASE WHEN volume > 0 THEN volume END) AS BIGINT) AS DOUBLE)
       AS vwap,
       CAST(SUM(CASE WHEN volume > 0 THEN volume END) AS BIGINT) AS total_volume
FROM bars GROUP BY symbol
"""


@register("vwap", SQL_VWAP, doc="A4 VWAP with typical-price fallback (domain/services.py:38-76)", tags=("agg",))
def q_vwap(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    pv = ((F.col("high") + F.col("low") + F.col("close")) / F.lit(3.0)) * F.col("volume")
    pos = F.col("volume") > 0
    sum_pv = F.sum(F.when(pos, pv.cast("decimal(38,6)"))).cast("double")
    sum_v = F.sum(F.when(pos, F.col("volume")))
    return b.groupBy("symbol").agg(
        (sum_pv / sum_v.cast("double")).alias("vwap"),
        sum_v.alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# A5 — daily summary (reference: domain/services.py:78-139)

SQL_DAILY_SUMMARY = f"""
WITH {SQL_BARS},
b AS (SELECT *, ts_ns - (ts_ns % {NS_PER_DAY}) AS day_ns FROM bars)
SELECT symbol,
       CAST(make_timestamp(day_ns // 1000) AS DATE) AS trading_date,
       min_by(open, ts_ns) AS open, max(high) AS high, min(low) AS low,
       max_by(close, ts_ns) AS close,
       CAST(SUM(volume) AS BIGINT) AS volume,
       COUNT(*) AS bar_count,
       MIN(ts_ns) AS first_bar_ns, MAX(ts_ns) AS last_bar_ns
FROM b GROUP BY symbol, day_ns
"""


@register("daily_summary", SQL_DAILY_SUMMARY, doc="A5 daily summary (domain/services.py:78-139)", tags=("agg",))
def q_daily_summary(spark, sf_dir):
    b = _bars_core(spark, sf_dir).withColumn(
        "day_ns", F.col("ts_ns") - F.col("ts_ns") % F.lit(NS_PER_DAY)
    )
    return (
        b.groupBy("symbol", "day_ns")
        .agg(
            F.min_by("open", "ts_ns").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "ts_ns").alias("close"),
            F.sum("volume").alias("volume"),
            F.count(F.lit(1)).alias("bar_count"),
            F.min("ts_ns").alias("first_bar_ns"),
            F.max("ts_ns").alias("last_bar_ns"),
        )
        .select(
            "symbol",
            F.to_date(F.timestamp_micros((F.col("day_ns") / F.lit(1000)).cast("long"))).alias(
                "trading_date"
            ),
            "open", "high", "low", "close", "volume", "bar_count",
            "first_bar_ns", "last_bar_ns",
        )
    )


# ---------------------------------------------------------------------------
# A6 — data-availability summary: UNION ALL of frames → per (frame, symbol)
# distinct days + row counts (reference: duckdb_views.py:128-162)

SQL_AVAILABILITY = f"""
WITH {SQL_BARS},
f5 AS (SELECT symbol, ts_ns - (ts_ns % {300 * NS_PER_SEC}) AS b FROM bars),
f1h AS (SELECT symbol, ts_ns - (ts_ns % {3600 * NS_PER_SEC}) AS b FROM bars),
f1d AS (SELECT symbol, ts_ns - (ts_ns % {NS_PER_DAY}) AS b FROM bars),
u AS (
  SELECT '5m' AS frame, symbol, b FROM (SELECT DISTINCT symbol, b FROM f5)
  UNION ALL
  SELECT '1h' AS frame, symbol, b FROM (SELECT DISTINCT symbol, b FROM f1h)
  UNION ALL
  SELECT '1d' AS frame, symbol, b FROM (SELECT DISTINCT symbol, b FROM f1d)
)
SELECT frame, symbol,
       COUNT(DISTINCT b - (b % {NS_PER_DAY})) AS days,
       COUNT(*) AS row_count
FROM u GROUP BY frame, symbol
"""


@register("availability_summary", SQL_AVAILABILITY, doc="A6 per-frame availability (duckdb_views.py:128-162)", tags=("agg", "setop"))
def q_availability(spark, sf_dir):
    # Single scan: each input row explodes to its three frame buckets, then
    # ONE groupBy with two countDistincts (bucket ≡ resampled row, day of
    # bucket) — partial aggregation dedups map-side, so the only exchange
    # carries near-aggregated rows. The UNION-of-three-distincts form this
    # replaces scanned the events three times and shuffled four.
    b = _bars_core(spark, sf_dir)
    frames = F.array(
        *[
            F.struct(
                F.lit(frame).alias("frame"),
                (F.col("ts_ns") - F.col("ts_ns") % F.lit(sec * NS_PER_SEC)).alias("b"),
            )
            for frame, sec in (("5m", 300), ("1h", 3600), ("1d", 86400))
        ]
    )
    x = b.select("symbol", F.explode(frames).alias("x")).select(
        "symbol", F.col("x.frame").alias("frame"), F.col("x.b").alias("b")
    )
    return x.groupBy("frame", "symbol").agg(
        F.countDistinct(F.col("b") - F.col("b") % F.lit(NS_PER_DAY)).alias("days"),
        F.countDistinct("b").alias("row_count"),
    )


# ---------------------------------------------------------------------------
# A8 — bucketed trend: hourly avg/count (reference: metrics.py:218-248,
# rebuilt as one pass instead of N queries)

SQL_BUCKETED_TREND = f"""
WITH {SQL_BARS}
SELECT symbol, ts_ns - (ts_ns % {3600 * NS_PER_SEC}) AS bucket_ns,
       CAST(SUM(CAST(close AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_value,
       COUNT(*) AS n
FROM bars GROUP BY symbol, bucket_ns
"""


@register("bucketed_trend", SQL_BUCKETED_TREND, doc="A8 bucketed trend agg (metrics.py:218-248)", tags=("agg",))
def q_bucketed_trend(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = 3600 * NS_PER_SEC
    return b.groupBy((F.col("ts_ns") - F.col("ts_ns") % F.lit(w)).alias("bucket_ns"), "symbol").agg(
        (F.sum(F.col("close").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_value"
        ),
        F.count(F.lit(1)).alias("n"),
    ).select("symbol", "bucket_ns", "avg_value", "n")


# ---------------------------------------------------------------------------
# A7 — windowed metric average (reference: metrics.py:201-216)

SQL_METRICS_AVG = f"""
WITH {SQL_BARS}
SELECT CAST(SUM(CAST(close AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_value,
       COUNT(*) AS n
FROM bars WHERE symbol = 'click' AND ts_ns >= 1704500000000000000
"""


@register("metrics_avg_window", SQL_METRICS_AVG, doc="A7 avg over time window (metrics.py:201-216)", tags=("agg", "filter"))
def q_metrics_avg(spark, sf_dir):
    b = _bars_core(spark, sf_dir).filter(
        (F.col("symbol") == "click") & (F.col("ts_ns") >= 1704500000000000000)
    )
    return b.agg(
        (F.sum(F.col("close").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_value"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# W3/W1 — latest-version-per-key via dedup rank
# (reference: create_symbol_views.sql:16-37, symbol_normalizer.sql:25-43)

SQL_LATEST_EVENT = f"""
WITH {SQL_BARS},
r AS (SELECT user_id, ts_ns, symbol, close, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_ns DESC, event_id DESC) AS rn
      FROM bars)
SELECT user_id, ts_ns, symbol AS last_event_type, close AS last_value
FROM r WHERE rn = 1
"""


@register("latest_event_per_user", SQL_LATEST_EVENT, doc="W1/W3 latest-per-key dedup rank", tags=("window",))
def q_latest_event(spark, sf_dir):
    b = bars(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("ts_ns"), F.desc("event_id"))
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts_ns",
            F.col("symbol").alias("last_event_type"),
            F.col("close").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# W4 — simple moving average, trailing N bars, NULL until N samples
# (reference: domain/services.py:284-326). Decimal window sum keeps the
# sliding aggregation order-independent (DuckDB uses segment trees).

SQL_SMA = f"""
WITH {SQL_BARS},
r AS (SELECT symbol, ts_ns, close,
             SUM(CAST(FLOOR(close * 1e6) AS BIGINT))
               OVER (PARTITION BY symbol ORDER BY ts_ns
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s,
             COUNT(*) OVER (PARTITION BY symbol ORDER BY ts_ns
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS c
      FROM bars)
SELECT symbol, ts_ns, close,
       CASE WHEN c >= 20 THEN CAST(s AS DOUBLE) / 1e6 / 20.0 END AS sma_20
FROM r
"""


@register("sma_20", SQL_SMA, doc="W4 trailing-20 SMA (domain/services.py:284-326)", tags=("window",))
def q_sma(spark, sf_dir):
    # Sliding sums run as scaled-long fixed point (µ-price quantization):
    # exact and order-independent like decimal, but stays on the codegen
    # long-sum fast path — decimal(38,*) window frames hit the BigDecimal
    # interpreted path and were ~40× slower.
    b = _bars_core(spark, sf_dir)
    w = W.partitionBy("symbol").orderBy("ts_ns").rowsBetween(-19, 0)
    s = F.sum(F.floor(F.col("close") * F.lit(1e6)).cast("long")).over(w)
    c = F.count(F.lit(1)).over(w)
    return b.select(
        "symbol",
        "ts_ns",
        "close",
        F.when(c >= 20, s.cast("double") / F.lit(1e6) / F.lit(20.0)).alias("sma_20"),
    )


# ---------------------------------------------------------------------------
# W5 — rolling volatility over trailing-20 simple returns
# (reference: domain/services.py:328-371 uses ln returns; the oracle query
# uses simple returns because libm ln differs across engines by ULPs — the
# ln variant is covered by unit tests). Returns are winsorized at ±100 to
# bound the fixed-point range; variance comes from exact scaled-long sliding
# sums (decimal window frames are interpreted BigDecimal — ~40× slower — and
# Spark's shortest-repr double→decimal cast can disagree with DuckDB's
# exact-expansion cast in the last digit).

SQL_VOLATILITY = f"""
WITH {SQL_BARS},
r AS (SELECT symbol, ts_ns, close,
             LAG(close) OVER (PARTITION BY symbol ORDER BY ts_ns) AS prev
      FROM bars),
x AS (SELECT symbol, ts_ns,
             LEAST(GREATEST(close / prev - 1.0, -100.0), 100.0) AS ret
      FROM r WHERE prev IS NOT NULL AND prev > 0),
s AS (SELECT symbol, ts_ns,
             SUM(CAST(FLOOR(ret * 1e8) AS BIGINT))
               OVER (PARTITION BY symbol ORDER BY ts_ns
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sr,
             SUM(CAST(FLOOR(ret * ret * 1e8) AS BIGINT))
               OVER (PARTITION BY symbol ORDER BY ts_ns
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS srr,
             COUNT(*) OVER (PARTITION BY symbol ORDER BY ts_ns
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS c
      FROM x)
SELECT symbol, ts_ns,
       CASE WHEN c >= 20 THEN
         sqrt((CAST(srr AS DOUBLE) / 1e8
               - (CAST(sr AS DOUBLE) / 1e8) * (CAST(sr AS DOUBLE) / 1e8) / 20.0) / 19.0)
       END AS vol_20
FROM s
"""


@register("volatility_20", SQL_VOLATILITY, doc="W5 rolling volatility (domain/services.py:328-371)", tags=("window",))
def q_volatility(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    wo = W.partitionBy("symbol").orderBy("ts_ns")
    r = b.withColumn("prev", F.lag("close").over(wo)).filter(
        F.col("prev").isNotNull() & (F.col("prev") > 0)
    )
    ret = F.least(
        F.greatest(F.col("close") / F.col("prev") - F.lit(1.0), F.lit(-100.0)), F.lit(100.0)
    )
    x = r.select("symbol", "ts_ns", ret.alias("ret"))
    wf = wo.rowsBetween(-19, 0)
    # Scaled-long fixed point (see q_sma): exact sliding sums on the codegen
    # fast path instead of interpreted BigDecimal frames.
    sr = F.sum(F.floor(F.col("ret") * F.lit(1e8)).cast("long")).over(wf).cast("double") / F.lit(1e8)
    srr = (
        F.sum(F.floor(F.col("ret") * F.col("ret") * F.lit(1e8)).cast("long")).over(wf).cast("double")
        / F.lit(1e8)
    )
    c = F.count(F.lit(1)).over(wf)
    return x.select(
        "symbol",
        "ts_ns",
        F.when(c >= 20, F.sqrt((srr - sr * sr / F.lit(20.0)) / F.lit(19.0))).alias("vol_20"),
    )


# ---------------------------------------------------------------------------
# W6 + validation rule 7 — extreme movement vs previous close
# (reference: validation/domain/services.py:89-109)

SQL_EXTREME_MOVEMENT = f"""
WITH {SQL_BARS},
r AS (SELECT symbol, ts_ns, open,
             LAG(close) OVER (PARTITION BY symbol ORDER BY ts_ns) AS prev_close
      FROM bars)
SELECT symbol, ts_ns, open, prev_close
FROM r
WHERE prev_close IS NOT NULL AND prev_close > 0
  AND abs(open - prev_close) / prev_close > 0.5
"""


@register("extreme_movement", SQL_EXTREME_MOVEMENT, doc="validation rule 7: >50% jump vs prev close", tags=("window", "validation"))
def q_extreme_movement(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    wo = W.partitionBy("symbol").orderBy("ts_ns")
    r = b.withColumn("prev_close", F.lag("close").over(wo))
    # try_divide: ANSI-safe — Spark may reorder conjuncts, so the prev>0
    # guard alone doesn't protect a plain division from DIVIDE_BY_ZERO.
    return r.filter(
        F.col("prev_close").isNotNull()
        & (F.col("prev_close") > 0)
        & (F.try_divide(F.abs(F.col("open") - F.col("prev_close")), F.col("prev_close")) > 0.5)
    ).select("symbol", "ts_ns", "open", "prev_close")


# ---------------------------------------------------------------------------
# P7/K2 — keep-last dedup: one row per (symbol, 5m bucket), latest wins
# (reference: parquet_engine.py:156-173 drop_duplicates keep="last")

SQL_KEEP_LAST = f"""
WITH {SQL_BARS},
b AS (SELECT symbol, ts_ns - (ts_ns % {300 * NS_PER_SEC}) AS bucket, ts_ns, close, event_id,
             ROW_NUMBER() OVER (PARTITION BY symbol, ts_ns - (ts_ns % {300 * NS_PER_SEC})
                                ORDER BY ts_ns DESC, event_id DESC) AS rn
      FROM bars)
SELECT symbol, bucket AS ts_ns, close AS last_close FROM b WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A12 — running totals as bars accumulate (reference: domain/aggregates.py:
# 124-129 keeps running high/low/volume while bars stream into the
# aggregate). Cumulative window frames; volume accumulates exactly (longs).

SQL_RUNNING_TOTALS = f"""
WITH {SQL_BARS}
SELECT symbol, ts_ns,
       MAX(high) OVER w AS running_high,
       MIN(low)  OVER w AS running_low,
       CAST(SUM(volume) OVER w AS BIGINT) AS running_volume,
       COUNT(*) OVER w AS bar_count
FROM bars
WINDOW w AS (PARTITION BY symbol ORDER BY ts_ns
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "running_totals",
    SQL_RUNNING_TOTALS,
    doc="A12 running high/low/volume per symbol (aggregates.py:124-129)",
    tags=("window",),
)
def q_running_totals(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = (
        W.partitionBy("symbol")
        .orderBy("ts_ns")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return b.select(
        "symbol",
        "ts_ns",
        F.max("high").over(w).alias("running_high"),
        F.min("low").over(w).alias("running_low"),
        F.sum("volume").over(w).alias("running_volume"),
        F.count(F.lit(1)).over(w).alias("bar_count"),
    )


# ---------------------------------------------------------------------------
# §2.7 — the full validation rule set as ONE query: errors(symbol, ts_ns,
# reason), one row per violated rule (reference: validation/domain/
# services.py:14-170; batch variant domain/services.py:374-607). The
# session-hours/weekend rules are off (24/7 event data). All window
# aggregates reduce integers (sums/avgs of longs are exact in double), so
# DuckDB's segment-tree evaluation and Spark's running frames agree bitwise.

SQL_VALIDATION_REPORT = f"""
WITH {SQL_BARS},
w AS (
  SELECT symbol, ts_ns, open, high, low, close, volume,
         LAG(ts_ns)  OVER sw AS prev_ts,
         LAG(close)  OVER sw AS prev_close,
         SUM(CASE WHEN volume = 0 THEN 1 ELSE 0 END)
           OVER (sw ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS zv10,
         AVG(CASE WHEN volume > 0 THEN volume END)
           OVER (sw ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS pva20
  FROM bars
  WINDOW sw AS (PARTITION BY symbol ORDER BY ts_ns)
)
SELECT symbol, ts_ns, 'non_monotonic_timestamp' AS reason FROM w
  WHERE prev_ts IS NOT NULL AND ts_ns <= prev_ts
UNION ALL SELECT symbol, ts_ns, 'non_positive_price' FROM w
  WHERE open <= 0 OR high <= 0 OR low <= 0 OR close <= 0
UNION ALL SELECT symbol, ts_ns, 'negative_volume' FROM w WHERE volume < 0
UNION ALL SELECT symbol, ts_ns, 'ohlc_inconsistent' FROM w
  WHERE high < open OR high < close OR high < low OR low > open OR low > close
UNION ALL SELECT symbol, ts_ns, 'timestamp_not_minute_aligned' FROM w
  WHERE ts_ns % 60000000000 <> 0
UNION ALL SELECT symbol, ts_ns, 'zero_volume_with_movement' FROM w
  WHERE volume = 0 AND open <> close
UNION ALL SELECT symbol, ts_ns, 'extreme_price_movement' FROM w
  WHERE prev_close IS NOT NULL AND prev_close > 0
    AND abs(open - prev_close) / prev_close > 0.5
UNION ALL SELECT symbol, ts_ns, 'volume_above_cap' FROM w WHERE volume > 1000000000
UNION ALL SELECT symbol, ts_ns, 'price_out_of_range' FROM w
  WHERE low < 0.01 OR high > 100000.0
UNION ALL SELECT symbol, ts_ns, 'sustained_zero_volume' FROM w WHERE zv10 >= 5
UNION ALL SELECT symbol, ts_ns, 'volume_spike' FROM w
  WHERE pva20 IS NOT NULL AND volume > pva20 * 10
"""


@register(
    "validation_report",
    SQL_VALIDATION_REPORT,
    doc="§2.7 full validation rule set -> errors(symbol, ts_ns, reason)",
    tags=("validation",),
)
def q_validation_report(spark, sf_dir):
    from ..operators.validation import validate_bars

    return validate_bars(_bars_core(spark, sf_dir), market_hours=False)


#: One day in ns — the chunk width for the skewsafe window twins: minute
#: bars put ≤390 rows in a symbol-day, far above the 20-row lookback, so
#: the carried boundary rows are ~5% overhead while a hot symbol's window
#: work spreads over (days) tasks instead of one.
SKEW_SPAN_DAY_NS = 86_400 * 10**9


@register(
    "validation_report_skewsafe",
    SQL_VALIDATION_REPORT,
    doc="validation_report on the hot-symbol-safe chunked window "
    "(skew.chunked_trailing_frame, 1-day chunks with 20-row carry) — "
    "IDENTICAL oracle as validation_report, so driver parity is the "
    "equivalence proof of the skew mitigation (SURVEY §7.4)",
    tags=("validation", "skew"),
)
def q_validation_report_skewsafe(spark, sf_dir):
    from ..operators.validation import validate_bars

    return validate_bars(
        _bars_core(spark, sf_dir), market_hours=False, skew_span=SKEW_SPAN_DAY_NS
    )


@register(
    "validation_report_skewauto",
    SQL_VALIDATION_REPORT,
    doc="validation_report under skew AUTO-dispatch (skew.plan_trailing_skew "
    "profiles the table; plain plan when no symbol crosses the straggler "
    "threshold, hot-key-targeted chunking when one does) — IDENTICAL oracle "
    "as validation_report: parity proves dispatch never changes rows",
    tags=("validation", "skew"),
)
def q_validation_report_skewauto(spark, sf_dir):
    from ..operators.validation import validate_bars

    # auto:32 pins the dispatch threshold to the deployment partition
    # count so the chosen plan depends only on the DATA — a bare "auto"
    # would read the live session's shuffle.partitions and give the
    # plan-shape baseline a session-dependent answer.
    return validate_bars(
        _bars_core(spark, sf_dir), market_hours=False, skew_span="auto:32"
    )


@register(
    "sma_20_skewsafe",
    SQL_SMA,
    doc="W4 trailing-20 SMA on the chunked window (19-row carry) — same "
    "oracle as sma_20: parity = equivalence proof of the skew mitigation",
    tags=("window", "skew"),
)
def q_sma_skewsafe(spark, sf_dir):
    from ..operators.skew import chunked_trailing_frame

    b = chunked_trailing_frame(
        _bars_core(spark, sf_dir), "symbol", "ts_ns", 19, SKEW_SPAN_DAY_NS
    )
    w = W.partitionBy("symbol", "_chunk").orderBy("ts_ns").rowsBetween(-19, 0)
    s = F.sum(F.floor(F.col("close") * F.lit(1e6)).cast("long")).over(w)
    c = F.count(F.lit(1)).over(w)
    return (
        b.select(
            "symbol",
            "ts_ns",
            "close",
            F.when(c >= 20, s.cast("double") / F.lit(1e6) / F.lit(20.0)).alias("sma_20"),
            "_carry",
        )
        .filter(F.col("_carry") == 0)
        .drop("_carry")
    )


@register("dedup_keep_last", SQL_KEEP_LAST, doc="P7 keep-last dedup (parquet_engine.py:156-173)", tags=("dedup", "window"))
def q_keep_last(spark, sf_dir):
    b = bars(spark, sf_dir)
    bucket = (F.col("ts_ns") - F.col("ts_ns") % F.lit(300 * NS_PER_SEC)).alias("bucket")
    w = W.partitionBy("symbol", "bucket").orderBy(F.desc("ts_ns"), F.desc("event_id"))
    return (
        b.select("symbol", bucket, "ts_ns", "close", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("symbol", F.col("bucket").alias("ts_ns"), F.col("close").alias("last_close"))
    )


@register(
    "dedup_keep_last_skewsafe",
    SQL_KEEP_LAST,
    doc="P7 keep-last as a plain max(struct) AGGREGATION — partial-combined "
    "map-side, so a hot key costs one running max per partition instead of "
    "a single-task window sort; IDENTICAL oracle as dedup_keep_last (ts_ns, "
    "event_id) is a total order, so parity proves the two plans pick the "
    "same rows",
    tags=("dedup", "agg", "skew"),
)
def q_keep_last_skewsafe(spark, sf_dir):
    b = bars(spark, sf_dir)
    bucket = (F.col("ts_ns") - F.col("ts_ns") % F.lit(300 * NS_PER_SEC)).alias("bucket")
    g = (
        b.select("symbol", bucket, "ts_ns", "event_id", "close")
        .groupBy("symbol", "bucket")
        .agg(F.max(F.struct("ts_ns", "event_id", "close")).alias("_m"))
    )
    return g.select(
        "symbol", F.col("bucket").alias("ts_ns"), F.col("_m.close").alias("last_close")
    )


# ---------------------------------------------------------------------------
# Exact percentiles per symbol (O-family: ordered statistics). Spark's exact
# `percentile` and DuckDB's `quantile_cont` both linear-interpolate on the
# sorted values — verified bit-identical on this data. (At 100 TB the
# approximate sketch `approx_percentile` is the right call; the exact form
# is the oracle-checkable one.)

SQL_VALUE_PERCENTILES = f"""
WITH {SQL_BARS}
SELECT symbol,
       quantile_cont(close, 0.25) AS p25,
       quantile_cont(close, 0.50) AS p50,
       quantile_cont(close, 0.75) AS p75,
       quantile_cont(close, 0.99) AS p99,
       quantile_cont(volume, 0.50) AS median_volume
FROM bars GROUP BY symbol
"""


@register("value_percentiles", SQL_VALUE_PERCENTILES, doc="exact per-symbol value percentiles (interpolated order statistics)", tags=("agg", "percentile"))
def q_value_percentiles(spark, sf_dir):
    b = bars(spark, sf_dir)
    return b.groupBy("symbol").agg(
        F.expr("percentile(close, 0.25)").alias("p25"),
        F.expr("percentile(close, 0.50)").alias("p50"),
        F.expr("percentile(close, 0.75)").alias("p75"),
        F.expr("percentile(close, 0.99)").alias("p99"),
        F.expr("percentile(volume, 0.50)").alias("median_volume"),
    )


# ---------------------------------------------------------------------------
# Ranking-window surface (SURVEY §2.5 "free if needed" row): NTILE bucket
# assignment — per-symbol close-price quartiles, aggregated to bucket
# boundaries. The window's total order (close, ts_ns) makes bucket
# membership deterministic; the groupBy collapses output to 4 rows/symbol.

SQL_CLOSE_QUARTILES = f"""
WITH {SQL_BARS},
q AS (
  SELECT symbol, close,
         NTILE(4) OVER (PARTITION BY symbol ORDER BY close, ts_ns) AS quartile
  FROM bars
)
SELECT symbol, quartile, COUNT(*) AS n,
       MIN(close) AS min_close, MAX(close) AS max_close
FROM q GROUP BY symbol, quartile
"""


@register("close_quartiles", SQL_CLOSE_QUARTILES, doc="NTILE(4) close-price quartile boundaries per symbol", tags=("window", "agg"))
def q_close_quartiles(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = W.partitionBy("symbol").orderBy("close", "ts_ns")
    q = b.select("symbol", "close", F.ntile(4).over(w).alias("quartile"))
    return q.groupBy("symbol", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("close").alias("min_close"),
        F.max("close").alias("max_close"),
    )


# ---------------------------------------------------------------------------
# RANGE-frame window (SURVEY §2.5 noted frame RANGE specs unused in the
# reference — covered here): trailing-1-hour event-time window keyed by the
# physical ts_ns long, so the frame is value-based (time), not row-based.
# Bigint sums/counts are exact in any execution order.

_HOUR_NS = 3_600_000_000_000

SQL_ROLLING_VOLUME_1H = f"""
WITH {SQL_BARS}
SELECT symbol, ts_ns,
       CAST(SUM(volume) OVER (PARTITION BY symbol ORDER BY ts_ns
             RANGE BETWEEN {_HOUR_NS} PRECEDING AND CURRENT ROW) AS BIGINT) AS vol_1h,
       COUNT(*) OVER (PARTITION BY symbol ORDER BY ts_ns
             RANGE BETWEEN {_HOUR_NS} PRECEDING AND CURRENT ROW) AS n_1h
FROM bars
"""


@register("rolling_volume_1h", SQL_ROLLING_VOLUME_1H, doc="trailing-1h volume via RANGE frame over ts_ns", tags=("window",))
def q_rolling_volume_1h(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = W.partitionBy("symbol").orderBy("ts_ns").rangeBetween(-_HOUR_NS, 0)
    return b.select(
        "symbol",
        "ts_ns",
        F.sum("volume").over(w).cast("long").alias("vol_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


# ---------------------------------------------------------------------------
# Trading-calendar classification (reference TradingCalendarService,
# domain/services.py:610-689: weekday trading days, UTC-5 session approx).
# Weekday and session predicates are pure integer epoch math — identical in
# any engine, no session-zone dependence (see functions.weekday_idx).

_NSD = 86_400_000_000_000

SQL_SESSION_ACTIVITY = f"""
WITH {SQL_BARS},
f AS (
  SELECT symbol,
         ((((ts_ns - ts_ns % {_NSD}) % {7 * _NSD}) // {_NSD}) + 3) % 7 AS wd,
         ts_ns % {_NSD} AS intra
  FROM bars
)
SELECT symbol,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN wd <= 4 AND intra >= {52_200 * 10**9}
                      AND intra < {75_600 * 10**9} THEN 1 ELSE 0 END) AS BIGINT) AS n_regular_session,
       CAST(SUM(CASE WHEN wd >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
FROM f GROUP BY symbol
"""


@register("session_activity", SQL_SESSION_ACTIVITY, doc="bars per symbol inside regular session / on weekends (trading calendar)", tags=("agg", "calendar"))
def q_session_activity(spark, sf_dir):
    from ..functions import is_regular_session_ns, weekday_idx

    b = _bars_core(spark, sf_dir)
    return b.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(is_regular_session_ns("ts_ns").cast("int")).cast("long").alias("n_regular_session"),
        F.sum((weekday_idx("ts_ns") >= 5).cast("int")).cast("long").alias("n_weekend"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — the value-distribution profile every quality
# dashboard draws. Bin id is per-row floor division (no accumulation →
# deterministic); one hash-agg with map-side partials.

_BIN_WIDTH = 10.0

SQL_CLOSE_HISTOGRAM = f"""
WITH {SQL_BARS}
SELECT symbol,
       CAST(FLOOR(close / {_BIN_WIDTH}) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM bars GROUP BY symbol, bin
"""


@register("close_histogram", SQL_CLOSE_HISTOGRAM, doc="fixed-width value histogram per symbol", tags=("agg",))
def q_close_histogram(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    return (
        b.select("symbol", F.floor(F.col("close") / F.lit(_BIN_WIDTH)).cast("long").alias("bin"))
        .groupBy("symbol", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Deterministic Pearson correlation. Built-in corr() streams co-moments in
# partition order (non-associative doubles → result depends on the shuffle),
# so both engines instead accumulate EXACT integer power sums of µ-quantized
# values (corr is invariant to positive affine scaling, so quantization is
# just a change of units; decimal×decimal was rejected because the two
# engines clamp product scale differently). Each exact sum casts to double
# deterministically, then the identical closed form runs in both engines —
# bit-stable under any partitioning, still one hash-agg pass.

SQL_CORR_CLOSE_VOLUME = f"""
WITH {SQL_BARS},
q AS (
  SELECT symbol,
         CAST(FLOOR(close * 1e6) AS HUGEINT) AS x,
         CAST(volume AS HUGEINT) AS y
  FROM bars
),
s AS (
  SELECT symbol,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM q GROUP BY symbol
)
SELECT symbol, n,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_close_volume
FROM s
"""


@register("corr_close_volume", SQL_CORR_CLOSE_VOLUME, doc="deterministic Pearson correlation from exact integer power sums", tags=("agg",))
def q_corr_close_volume(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    # decimal(38,0) is Spark's 128-bit-exact integer (HUGEINT analog):
    # (38,0)x(38,0) products keep scale 0 and stay exact well past these sums.
    x = F.floor(F.col("close") * F.lit(1e6)).cast("decimal(38,0)")
    y = F.col("volume").cast("decimal(38,0)")
    q = b.select("symbol", x.alias("x"), y.alias("y"))
    s = q.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select("symbol", "n", (num / den).alias("corr_close_volume"))


# ---------------------------------------------------------------------------
# Inter-arrival gap profile — feed-outage detection (the continuous-time
# counterpart of the daily gap anti-join, operators/gaps.py): per-symbol lag
# over event time, then exact integer gap statistics.

SQL_INTERARRIVAL_GAPS = f"""
WITH {SQL_BARS},
g AS (
  SELECT symbol,
         ts_ns - lag(ts_ns) OVER (PARTITION BY symbol ORDER BY ts_ns) AS gap
  FROM bars
)
SELECT symbol,
       COUNT(gap) AS n_gaps,
       CAST(MAX(gap) AS BIGINT) AS max_gap_ns,
       CAST(SUM(gap) AS BIGINT) AS total_gap_ns,
       CAST(SUM(CASE WHEN gap > {_HOUR_NS} THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps_gt_1h
FROM g GROUP BY symbol
"""


@register("interarrival_gaps", SQL_INTERARRIVAL_GAPS, doc="per-symbol inter-arrival gap stats (feed-outage profile)", tags=("window", "agg", "validation"))
def q_interarrival_gaps(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    wo = W.partitionBy("symbol").orderBy("ts_ns")
    gap = (F.col("ts_ns") - F.lag("ts_ns").over(wo)).alias("gap")
    g = b.select("symbol", gap)
    return g.groupBy("symbol").agg(
        F.count("gap").alias("n_gaps"),
        F.max("gap").cast("long").alias("max_gap_ns"),
        F.sum("gap").cast("long").alias("total_gap_ns"),
        F.sum(F.when(F.col("gap") > _HOUR_NS, 1).otherwise(0)).cast("long").alias("n_gaps_gt_1h"),
    )


# ---------------------------------------------------------------------------
# Top-k per group by rank() — the "3 busiest days per symbol" leaderboard.
# rank() (not row_number) so ties share a rank in both engines; the ORDER BY
# carries a day tie-breaker making output membership total anyway.

SQL_TOP_VOLUME_DAYS = f"""
WITH {SQL_BARS},
d AS (
  SELECT symbol,
         ts_ns - ts_ns % {86_400 * 10**9} AS day_ns,
         CAST(SUM(volume) AS BIGINT) AS day_volume
  FROM bars GROUP BY symbol, day_ns
),
r AS (
  SELECT symbol, day_ns, day_volume,
         RANK() OVER (PARTITION BY symbol ORDER BY day_volume DESC, day_ns ASC) AS rk
  FROM d
)
SELECT symbol, day_ns, day_volume, rk FROM r WHERE rk <= 3
"""


@register("top_volume_days", SQL_TOP_VOLUME_DAYS, doc="rank()-based top-3 busiest days per symbol", tags=("window", "agg"))
def q_top_volume_days(spark, sf_dir):
    from ..functions import day_ns as f_day_ns

    b = _bars_core(spark, sf_dir)
    d = b.groupBy("symbol", f_day_ns("ts_ns").alias("day_ns")).agg(
        F.sum("volume").cast("long").alias("day_volume")
    )
    w = W.partitionBy("symbol").orderBy(F.desc("day_volume"), F.asc("day_ns"))
    return d.withColumn("rk", F.rank().over(w)).filter(F.col("rk") <= 3)


# ---------------------------------------------------------------------------
# Bollinger bands — SMA20 ± 2σ. Same exact scaled-long power-sum trick as
# volatility_20: both engines sum identical integers, then run the identical
# closed form, so the doubles agree bitwise. value ≤ ~10⁴ keeps
# Σ floor(close²·1e6) under 2e17 for a 20-row frame — far from int64 range.

SQL_BOLLINGER = f"""
WITH {SQL_BARS},
s AS (SELECT symbol, ts_ns, close,
             SUM(CAST(FLOOR(close * 1e6) AS BIGINT))
               OVER (PARTITION BY symbol ORDER BY ts_ns
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sr,
             SUM(CAST(FLOOR(close * close * 1e6) AS BIGINT))
               OVER (PARTITION BY symbol ORDER BY ts_ns
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS srr,
             COUNT(*) OVER (PARTITION BY symbol ORDER BY ts_ns
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS c
      FROM bars)
SELECT symbol, ts_ns, close,
       CASE WHEN c >= 20 THEN CAST(sr AS DOUBLE) / 1e6 / 20.0 END AS bb_mid,
       CASE WHEN c >= 20 THEN
         CAST(sr AS DOUBLE) / 1e6 / 20.0
         + 2.0 * sqrt((CAST(srr AS DOUBLE) / 1e6
                       - (CAST(sr AS DOUBLE) / 1e6) * (CAST(sr AS DOUBLE) / 1e6) / 20.0) / 19.0)
       END AS bb_upper,
       CASE WHEN c >= 20 THEN
         CAST(sr AS DOUBLE) / 1e6 / 20.0
         - 2.0 * sqrt((CAST(srr AS DOUBLE) / 1e6
                       - (CAST(sr AS DOUBLE) / 1e6) * (CAST(sr AS DOUBLE) / 1e6) / 20.0) / 19.0)
       END AS bb_lower
FROM s
"""


@register("bollinger_20", SQL_BOLLINGER, doc="Bollinger bands: SMA20 ± 2·stddev_samp via exact scaled-long power sums", tags=("window",))
def q_bollinger(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    wf = W.partitionBy("symbol").orderBy("ts_ns").rowsBetween(-19, 0)
    sr = F.sum(F.floor(F.col("close") * F.lit(1e6)).cast("long")).over(wf).cast("double") / F.lit(1e6)
    srr = (
        F.sum(F.floor(F.col("close") * F.col("close") * F.lit(1e6)).cast("long")).over(wf).cast("double")
        / F.lit(1e6)
    )
    c = F.count(F.lit(1)).over(wf)
    mid = sr / F.lit(20.0)
    band = F.lit(2.0) * F.sqrt((srr - sr * sr / F.lit(20.0)) / F.lit(19.0))
    return b.select(
        "symbol",
        "ts_ns",
        "close",
        F.when(c >= 20, mid).alias("bb_mid"),
        F.when(c >= 20, mid + band).alias("bb_upper"),
        F.when(c >= 20, mid - band).alias("bb_lower"),
    )


# ---------------------------------------------------------------------------
# RSI(14) — simple (Cutler's) RSI: average gain / average loss over the
# trailing 14 deltas. Deltas are exact µ-quantized longs, so the final
# 100 − 100/(1 + Σgain/Σloss) runs on identical integers in both engines.

SQL_RSI = f"""
WITH {SQL_BARS},
d AS (SELECT symbol, ts_ns, close,
             CAST(FLOOR(close * 1e6) AS BIGINT)
               - LAG(CAST(FLOOR(close * 1e6) AS BIGINT))
                 OVER (PARTITION BY symbol ORDER BY ts_ns) AS diff
      FROM bars),
g AS (SELECT symbol, ts_ns, close,
             SUM(GREATEST(diff, 0)) OVER (PARTITION BY symbol ORDER BY ts_ns
                                          ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sg,
             SUM(GREATEST(-diff, 0)) OVER (PARTITION BY symbol ORDER BY ts_ns
                                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sl,
             COUNT(diff) OVER (PARTITION BY symbol ORDER BY ts_ns
                               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS c
      FROM d WHERE diff IS NOT NULL)
SELECT symbol, ts_ns, close,
       CASE WHEN c >= 14 THEN
         CASE WHEN sl = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))
         END
       END AS rsi_14
FROM g
"""


@register("rsi_14", SQL_RSI, doc="Cutler's RSI(14) from exact µ-quantized deltas", tags=("window",))
def q_rsi(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    wo = W.partitionBy("symbol").orderBy("ts_ns")
    cu = F.floor(F.col("close") * F.lit(1e6)).cast("long")
    d = b.select(
        "symbol", "ts_ns", "close", (cu - F.lag(cu).over(wo)).alias("diff")
    ).filter(F.col("diff").isNotNull())
    wf = wo.rowsBetween(-13, 0)
    sg = F.sum(F.greatest(F.col("diff"), F.lit(0))).over(wf)
    sl = F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(wf)
    c = F.count("diff").over(wf)
    rsi = F.when(sl == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + sg.cast("double") / sl.cast("double"))
    )
    return d.select("symbol", "ts_ns", "close", F.when(c >= 14, rsi).alias("rsi_14"))


# ---------------------------------------------------------------------------
# Maximum drawdown per symbol — running peak (exact max) then the worst
# peak-to-trough ratio. Division inputs are identical doubles in both
# engines, so the result hashes exactly.

SQL_MAX_DRAWDOWN = f"""
WITH {SQL_BARS},
p AS (SELECT symbol, ts_ns, close,
             MAX(close) OVER (PARTITION BY symbol ORDER BY ts_ns
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM bars)
SELECT symbol,
       MAX(CASE WHEN peak > 0 THEN (peak - close) / peak ELSE 0.0 END) AS max_drawdown,
       COUNT(*) AS n_bars
FROM p GROUP BY symbol
"""


@register("max_drawdown", SQL_MAX_DRAWDOWN, doc="worst peak-to-trough drawdown per symbol (running-max window)", tags=("window", "agg"))
def q_max_drawdown(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = W.partitionBy("symbol").orderBy("ts_ns").rowsBetween(W.unboundedPreceding, 0)
    p = b.withColumn("peak", F.max("close").over(w))
    dd = F.when(F.col("peak") > 0, (F.col("peak") - F.col("close")) / F.col("peak")).otherwise(
        F.lit(0.0)
    )
    return p.groupBy("symbol").agg(
        F.max(dd).alias("max_drawdown"), F.count(F.lit(1)).alias("n_bars")
    )


# ---------------------------------------------------------------------------
# OHLC unpivot (melt) — wide→long reshaping, then per-field stats. Spark uses
# the native unpivot operator; the oracle spells the same relation as a
# 4-way UNION ALL (engine-portable). Sum is decimal-exact (order-free).

SQL_OHLC_UNPIVOT = f"""
WITH {SQL_BARS},
u AS (
  SELECT symbol, 'open' AS field, open AS v FROM bars
  UNION ALL SELECT symbol, 'high', high FROM bars
  UNION ALL SELECT symbol, 'low', low FROM bars
  UNION ALL SELECT symbol, 'close', close FROM bars
)
SELECT symbol, field,
       MIN(v) AS min_v, MAX(v) AS max_v,
       CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
       COUNT(*) AS n
FROM u GROUP BY symbol, field
"""


@register("ohlc_unpivot", SQL_OHLC_UNPIVOT, doc="wide→long unpivot (melt) + per-field stats", tags=("reshape", "agg"))
def q_ohlc_unpivot(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    u = b.unpivot(["symbol"], ["open", "high", "low", "close"], "field", "v")
    return u.groupBy("symbol", "field").agg(
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("sum_v"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# percent_rank / cume_dist — rank-ratio windows are exact small-integer
# ratios, deterministic under ties in both engines.

SQL_CLOSE_PERCENT_RANK = f"""
WITH {SQL_BARS}
SELECT symbol, ts_ns, close,
       PERCENT_RANK() OVER (PARTITION BY symbol ORDER BY close) AS pr,
       CUME_DIST() OVER (PARTITION BY symbol ORDER BY close) AS cd
FROM bars
"""


@register("close_percent_rank", SQL_CLOSE_PERCENT_RANK, doc="percent_rank + cume_dist per symbol (tie-stable rank ratios)", tags=("window",))
def q_close_percent_rank(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    w = W.partitionBy("symbol").orderBy("close")
    return b.select(
        "symbol",
        "ts_ns",
        "close",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Z-order layout profile (bucketing.zorder_key): the multi-dimensional file-
# clustering story. Sorting the lake by a Morton interleave of (user bucket,
# hour bucket) makes every file cover a small RECTANGLE of the key space, so
# parquet min/max stats prune on EITHER dimension — the Delta/Iceberg
# OPTIMIZE ZORDER technique as a pure codegen'd bit expression. The query
# splits the 32-bit Morton space into 64 equal z-ranges (= the file
# boundaries a z-sorted writer would produce) and reports each range's
# bounding box: narrow per-range min/max spans ARE the file-skipping
# guarantee. One projection + one hash-agg; no shuffle beyond the final agg.

_Z_HOUR_NS = 3600 * NS_PER_SEC
_Z_RANGE = 1 << 26  # 2^32 Morton space / 64 ranges

from ..bucketing import zorder_key, zorder_key_sql  # noqa: E402

SQL_ZORDER_PROFILE = f"""
WITH {SQL_BARS},
d AS (
  SELECT user_id % 65536 AS x,
         (ts_ns // {_Z_HOUR_NS}) % 65536 AS y
  FROM bars
),
z AS (SELECT x, y, {zorder_key_sql('x', 'y')} AS zval FROM d)
SELECT zval // {_Z_RANGE} AS zrange,
       COUNT(*) AS n,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z GROUP BY zrange
"""


@register("zorder_profile", SQL_ZORDER_PROFILE, doc="Morton (Z-order) layout key + per-z-range bounding boxes (multi-dim file skipping)", tags=("layout",))
def q_zorder_profile(spark, sf_dir):
    b = bars(spark, sf_dir)
    d = b.select(
        F.pmod(F.col("user_id"), F.lit(65536)).alias("x"),
        F.pmod(F.expr(f"ts_ns div {_Z_HOUR_NS}"), F.lit(65536)).alias("y"),
    )
    z = d.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("zval"))
    return (
        z.select(F.expr(f"zval div {_Z_RANGE}").alias("zrange"), "x", "y")
        .groupBy("zrange")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (operators/resample.refresh_resample): the
# materialized-view refresh path. The Spark side REBUILDS the 5m rollup
# incrementally — resample the oldest ~80% of rows, then land the newest
# ~20% as a batch and refresh only the touched (symbol, bucket) groups
# (broadcast anti-join keeps untouched aggregate rows; broadcast semi-join
# prunes the base scan to touched groups). The oracle is the plain FULL
# recompute, so the value-hash match is a machine-checked proof that the
# incremental path equals rebuild-from-scratch — the invariant that lets a
# 100 TB lake maintain rollups with work proportional to daily arrivals.

@register(
    "incremental_rollup",
    _resample_sql(300 * NS_PER_SEC),
    doc="incremental 5m rollup refresh (touched buckets only) == full recompute",
    tags=("agg", "incremental"),
)
def q_incremental_rollup(spark, sf_dir):
    from ..operators.resample import refresh_resample

    b = _bars_core(spark, sf_dir)
    from .registry import scalar_join

    # NOT pinned (measured): the 1-row min/max aggregate is exchange-
    # terminated, so runtime ReuseExchange dedups it across the two slices
    # — an interleaved A/B at sf0.1 put a pin here at 1.03x.
    mm = b.agg(F.min("ts_ns").alias("_mn"), F.max("ts_ns").alias("_mx"))
    wb = scalar_join(b, "ts_ns", mm).withColumn(
        "_is_new", F.col("ts_ns") >= F.expr("_mn + (((_mx - _mn) * 4) div 5)")
    )
    cols = ["symbol", "ts_ns", "open", "high", "low", "close", "volume"]
    old = wb.filter(~F.col("_is_new")).select(*cols)
    batch = wb.filter(F.col("_is_new")).select(*cols)
    agg_old = resample_intraday(old, 300)
    return refresh_resample(agg_old, base=b, batch=batch, seconds=300)


# ---------------------------------------------------------------------------
# Interval-overlap concurrency sweep: the classic +1/-1 boundary-event
# pattern (how many intervals are open at once), here as peak concurrent
# sessions per (symbol, day) with session = [ts, ts + (volume+1)s). Boundary
# deltas are pre-aggregated per (symbol, ts) BEFORE the running sum, so the
# window's ORDER BY is over unique keys — a total order, deterministic in
# any engine — and the cumulative sum is exact integer math. One shuffle on
# symbol (boundary agg + window share the partitioning); the window is
# per-symbol, never global.

SQL_INTERVAL_CONCURRENCY = f"""
WITH {SQL_BARS},
bd AS (
  SELECT symbol, ts_ns AS t, 1 AS d FROM bars
  UNION ALL
  SELECT symbol, ts_ns + (volume + 1) * {NS_PER_SEC} AS t, -1 AS d FROM bars
),
agg AS (SELECT symbol, t, CAST(SUM(d) AS BIGINT) AS d FROM bd GROUP BY symbol, t),
sweep AS (
  SELECT symbol, t, SUM(d) OVER (PARTITION BY symbol ORDER BY t) AS conc
  FROM agg
)
SELECT symbol, t - (t % {NS_PER_DAY}) AS day_ns,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       COUNT(*) AS n_boundaries
FROM sweep GROUP BY symbol, day_ns
"""


@register("interval_concurrency", SQL_INTERVAL_CONCURRENCY, doc="peak concurrent sessions per symbol/day via +1/-1 boundary sweep", tags=("window", "interval"))
def q_interval_concurrency(spark, sf_dir):
    b = _bars_core(spark, sf_dir)
    start = b.select("symbol", F.col("ts_ns").alias("t"), F.lit(1).alias("d"))
    end = b.select(
        "symbol",
        (F.col("ts_ns") + (F.col("volume") + 1) * F.lit(NS_PER_SEC)).alias("t"),
        F.lit(-1).alias("d"),
    )
    agg = start.unionByName(end).groupBy("symbol", "t").agg(F.sum("d").alias("d"))
    w = W.partitionBy("symbol").orderBy("t")
    sweep = agg.withColumn("conc", F.sum("d").over(w))
    return (
        sweep.select(
            "symbol",
            (F.col("t") - F.col("t") % F.lit(NS_PER_DAY)).alias("day_ns"),
            "conc",
        )
        .groupBy("symbol", "day_ns")
        .agg(
            F.max("conc").alias("peak_concurrency"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered funnel: users reaching signup -> click -> purchase with strictly
# increasing timestamps. Stage k is a conditional-min join against stage
# k-1 (earliest qualifying event AFTER the previous stage), the standard
# relational funnel — each stage is one filtered scan + one equi-join on
# user_id + one hash-agg, all shuffle-partitioned on user_id so AQE reuses
# the partitioning across stages. No window, no per-user collect.

_FUNNEL = ("signup", "click", "purchase")

SQL_FUNNEL = f"""
WITH {SQL_BARS},
a AS (SELECT user_id, MIN(ts_ns) AS ta FROM bars WHERE symbol = '{_FUNNEL[0]}' GROUP BY user_id),
b AS (SELECT e.user_id, MIN(e.ts_ns) AS tb FROM bars e JOIN a USING (user_id)
      WHERE e.symbol = '{_FUNNEL[1]}' AND e.ts_ns > a.ta GROUP BY e.user_id),
c AS (SELECT e.user_id, MIN(e.ts_ns) AS tc FROM bars e JOIN b USING (user_id)
      WHERE e.symbol = '{_FUNNEL[2]}' AND e.ts_ns > b.tb GROUP BY e.user_id)
SELECT '1_{_FUNNEL[0]}' AS step, COUNT(*) AS n_users FROM a
UNION ALL
SELECT '2_{_FUNNEL[1]}' AS step, COUNT(*) AS n_users FROM b
UNION ALL
SELECT '3_{_FUNNEL[2]}' AS step, COUNT(*) AS n_users FROM c
"""


@register("funnel_steps", SQL_FUNNEL, doc="ordered signup->click->purchase funnel (strictly increasing ts), users per stage", tags=("analytics",))
def q_funnel_steps(spark, sf_dir):
    # Single-scan form (was: one filtered scan + equi-join + hash-agg PER
    # STAGE — 6 source scans in the static plan, and because each scan
    # carries a DIFFERENT pushed symbol filter, runtime ReuseExchange
    # cannot dedup them: at 100 TB that is three full passes over the
    # events table). One pass now feeds three chained per-user window
    # aggregates over the SAME partitioning (one exchange, no per-window
    # re-sort): ta = min signup ts; tb = min click ts with ts > ta (the
    # WHEN is null for users outside stage 1, so tb inherits the stage-2
    # ⊆ stage-1 constraint exactly like the old join); tc likewise above
    # tb. Stage counts are then non-null counts per user. Window state is
    # one user's funnel events (no orderBy, spillable), and the final
    # groupBy reuses the window's hash partitioning — plan: 1 scan and 2
    # exchanges instead of 6 scans and 16.
    ev = bars(spark, sf_dir)
    evf = ev.filter(F.col("symbol").isin(*_FUNNEL)).select("symbol", "ts_ns", "user_id")
    w = W.partitionBy("user_id")
    staged = (
        evf.withColumn(
            "ta",
            F.min(F.when(F.col("symbol") == _FUNNEL[0], F.col("ts_ns"))).over(w),
        )
        .withColumn(
            "tb",
            F.min(
                F.when(
                    (F.col("symbol") == _FUNNEL[1]) & (F.col("ts_ns") > F.col("ta")),
                    F.col("ts_ns"),
                )
            ).over(w),
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("symbol") == _FUNNEL[2]) & (F.col("ts_ns") > F.col("tb")),
                    F.col("ts_ns"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("ta").alias("ta"), F.max("tb").alias("tb"), F.max("tc").alias("tc")
    )
    counts = per_user.agg(
        F.count("ta").alias("n1"), F.count("tb").alias("n2"), F.count("tc").alias("n3")
    )
    return counts.select(
        F.expr(
            f"stack(3, '1_{_FUNNEL[0]}', n1, '2_{_FUNNEL[1]}', n2, '3_{_FUNNEL[2]}', n3)"
            " as (step, n_users)"
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen day, counted on each later
# activity day (the classic retention triangle). Two hash-aggs + one
# equi-join on user_id; day offsets are exact int64 ns arithmetic.

SQL_COHORT_RETENTION = f"""
WITH {SQL_BARS},
f AS (SELECT user_id, MIN(ts_ns - (ts_ns % {NS_PER_DAY})) AS cohort_ns FROM bars GROUP BY user_id),
act AS (SELECT DISTINCT user_id, ts_ns - (ts_ns % {NS_PER_DAY}) AS day_ns FROM bars)
SELECT f.cohort_ns, (act.day_ns - f.cohort_ns) // {NS_PER_DAY} AS day_offset,
       COUNT(*) AS n_users
FROM act JOIN f USING (user_id)
GROUP BY f.cohort_ns, day_offset
"""


@register("cohort_retention", SQL_COHORT_RETENTION, doc="retention triangle: first-seen-day cohorts x activity-day offset", tags=("analytics",))
def q_cohort_retention(spark, sf_dir):
    ev = bars(spark, sf_dir)
    day = F.col("ts_ns") - F.col("ts_ns") % F.lit(NS_PER_DAY)
    f = ev.groupBy("user_id").agg(F.min(day).alias("cohort_ns"))
    act = ev.select("user_id", day.alias("day_ns")).distinct()
    return (
        act.join(f, "user_id")
        .select("cohort_ns", F.expr(f"(day_ns - cohort_ns) div {NS_PER_DAY}").alias("day_offset"))
        .groupBy("cohort_ns", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Per-symbol calendar gaps (J3/O7, reference gap_detector.py:62-104): each
# distinct symbol generates its own expected weekday calendar via a
# sequence() generator (no crossJoin node — r3 verdict item 6), anti-joined
# against observed (symbol, day). The window extends past the data's last
# day so genuine gaps appear.

SQL_GAPS_BY_SYMBOL = f"""
WITH {SQL_BARS},
syms AS (SELECT DISTINCT symbol FROM bars),
days AS (SELECT CAST(UNNEST(generate_series(DATE '2024-01-01', DATE '2024-02-09', INTERVAL 1 DAY)) AS DATE) AS day),
expected AS (SELECT symbol, day FROM syms, days WHERE dayofweek(day) NOT IN (0, 6)),
present AS (SELECT DISTINCT symbol, CAST(make_timestamp(ts_ns // 1000) AS DATE) AS day FROM bars)
SELECT symbol, day FROM expected
WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.symbol = expected.symbol AND p.day = expected.day)
ORDER BY symbol, day
"""


@register("gaps_by_symbol", SQL_GAPS_BY_SYMBOL, doc="per-symbol weekday gap days via sequence() generator + anti-join (gap_detector.py:62-104)", tags=("join", "antijoin", "calendar"))
def q_gaps_by_symbol(spark, sf_dir):
    import datetime as _dt

    from ..operators.gaps import gaps_by_symbol

    ev = bars(spark, sf_dir)
    lake = ev.select(
        "symbol", F.to_date(F.timestamp_micros(F.expr("ts_ns div 1000"))).alias("date")
    )
    return gaps_by_symbol(lake, _dt.date(2024, 1, 1), _dt.date(2024, 2, 9), weekdays_only=True)


# ---------------------------------------------------------------------------
# Semi-structured extraction: the events ``props`` column is a JSON string;
# extract a typed field JVM-side (get_json_object — no Python UDF) and
# aggregate per event type. Map-only extraction then one hash-agg shuffle.

SQL_JSON_PROPS_STATS = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS DOUBLE)
         / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
"""


@register("json_props_stats", SQL_JSON_PROPS_STATS, doc="typed JSON field extraction from events.props + per-type aggregate", tags=("json", "agg"))
def q_json_props_stats(spark, sf_dir):
    from .registry import t

    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# Skew machinery (operators/skew.py). hot_key_profile is the one-pass
# diagnostic for join-key skew; salted_join is the explicit mitigation —
# the entry proves the salted physical plan returns EXACTLY the plain
# join's rows (the oracle IS the plain join), which is the whole contract.

SQL_HOT_KEY_PROFILE = """
WITH c AS (SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY user_id),
tot AS (SELECT SUM(n) AS t FROM c),
r AS (SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS rank FROM c)
SELECT key, n,
       CAST(FLOOR(n * 1000000 / t) AS BIGINT) AS share_ppm,
       CAST(rank AS BIGINT) AS rank
FROM r, tot WHERE rank <= 10
"""


@register(
    "hot_key_profile",
    SQL_HOT_KEY_PROFILE,
    doc="join-key skew diagnostic: top-10 heaviest user_id values with exact ppm share and deterministic rank",
    tags=("agg", "skew", "profiling"),
)
def q_hot_key_profile(spark, sf_dir):
    from ..operators.skew import hot_key_profile
    from .registry import t

    return hot_key_profile(t(spark, sf_dir, "events"), "user_id", top=10)


SQL_SALTED_JOIN_PARITY = """
WITH tc AS (SELECT event_type, COUNT(*) AS n_type FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, tc.n_type
FROM events e JOIN tc USING (event_type)
"""


@register(
    "salted_join_parity",
    SQL_SALTED_JOIN_PARITY,
    doc="salted shuffle join (8-way left-row salt, replicated right) returns exactly the plain join's rows; oracle is the plain join",
    tags=("join", "skew"),
)
def q_salted_join_parity(spark, sf_dir):
    from ..operators.skew import salted_join
    from .registry import t

    ev = t(spark, sf_dir, "events")
    tc = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    out = salted_join(ev.select("event_id", "event_type"), tc, on="event_type", salt=8)
    return out.select("event_id", "event_type", "n_type")


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences —
# journey analysis / anomaly baselining over the raw events table. The
# sequence is total-ordered by (ts, event_id), so the matrix is
# deterministic; probabilities are exact integer ppm (no float tolerance).

SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), p AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(FLOOR(n * 1000000 / SUM(n) OVER (PARTITION BY from_type)) AS BIGINT) AS prob_ppm
FROM p
"""


@register(
    "event_transitions",
    SQL_EVENT_TRANSITIONS,
    doc="per-user event-type Markov transition matrix with exact ppm conditional probabilities",
    tags=("window", "agg", "analytics"),
)
def q_event_transitions(spark, sf_dir):
    from ..operators.sessions import event_transitions
    from .registry import t

    return event_transitions(
        t(spark, sf_dir, "events"), key="user_id", ts="ts", order_cols=["event_id"]
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type — the sketch pipeline itself
# (md5_60 hash -> bucket/rho registers -> raw / linear-counting estimate) is
# what the oracle reproduces, completing the sketch family's verification
# story (CMS: cm_top_tokens, KLL: kll_value_quantiles). The exact distinct
# count rides along so a driver row also witnesses the estimate's accuracy.

SQL_HLL_DISTINCT_USERS = """
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
), br AS (
  SELECT event_type, h & 1023 AS bucket,
         CASE WHEN (h >> 10) = 0 THEN 51
              ELSE 51 - length(bin(h >> 10)) END AS rho
  FROM h
), reg AS (
  SELECT event_type, bucket, MAX(rho) AS reg FROM br GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(SUM(1::BIGINT << CAST(52 - reg AS INTEGER)) AS BIGINT) AS s_nonzero
  FROM reg GROUP BY 1
), calc AS (
  SELECT event_type, n_registers,
         1024 - n_registers AS v,
         CAST(FLOOR(CAST(720541::BIGINT * 1048576 AS DOUBLE) * 4503599627370496.0
                    / CAST(s_nonzero + (1024 - n_registers) * (1::BIGINT << 52) AS DOUBLE)
                    / 1000.0) AS BIGINT) AS raw_x1000,
         CAST(FLOOR(1024.0 * ln(1024.0 / CAST(greatest(1024 - n_registers, 1) AS DOUBLE))
                    * 1000.0) AS BIGINT) AS lin_x1000
  FROM agg
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT c.event_type, ex.n_exact, c.n_registers,
       CASE WHEN c.v > 0 AND c.raw_x1000 <= 2560000 THEN c.lin_x1000
            ELSE c.raw_x1000 END AS hll_est_x1000
FROM calc c JOIN ex USING (event_type)
"""


@register(
    "hll_distinct_users",
    SQL_HLL_DISTINCT_USERS,
    doc="HyperLogLog distinct-user estimate per event type (md5_60 registers, linear-counting small-range rule), exact count alongside",
    tags=("agg", "sketch"),
)
def q_hll_distinct_users(spark, sf_dir):
    from ..operators.sketches import hll_distinct
    from .registry import t

    ev = t(spark, sf_dir, "events")
    est = hll_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_exact", "n_registers", "hll_est_x1000"
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — position-based (U-shaped) conversion credit:
# for every purchase, the user's preceding non-purchase events within a
# 7-day lookback are the touchpoints; credit is split 40/20/40 between the
# first touch, the (evenly split) middles, and the last touch, in exact
# integer ppm with truncating DIV (middle remainders are dropped — the
# documented truncation, same both engines). One range join user-bucketed
# on the conversion side, one per-conversion window with a unique
# (ts_ns, event_id) tie-break — fan-out is bounded by events-per-user
# within the lookback window, the knob that caps it at 100 TB.

_ATTR_LOOKBACK_NS = 7 * NS_PER_DAY

SQL_ATTRIBUTION = f"""
WITH {SQL_BARS},
conv AS (SELECT user_id, ts_ns AS conv_ns, event_id AS conv_id
         FROM bars WHERE symbol = 'purchase'),
tp AS (
  SELECT e.symbol AS channel, e.ts_ns, e.event_id, c.conv_id
  FROM bars e JOIN conv c
  ON e.user_id = c.user_id
  AND e.ts_ns < c.conv_ns AND e.ts_ns >= c.conv_ns - {_ATTR_LOOKBACK_NS}
  AND e.symbol <> 'purchase'
),
pos AS (
  SELECT channel, conv_id,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts_ns, event_id) AS p,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM tp
),
cr AS (
  SELECT channel,
         CAST(CASE WHEN n = 1 THEN 1000000
                   WHEN n = 2 THEN 500000
                   WHEN p = 1 OR p = n THEN 400000
                   ELSE 200000 // (n - 2) END AS BIGINT) AS credit_ppm,
         conv_id
  FROM pos
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS touches,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS conversions_touched,
       CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_sum
FROM cr GROUP BY channel
"""


@register(
    "attribution_credits",
    SQL_ATTRIBUTION,
    doc="position-based (40/20/40) multi-touch conversion attribution per channel, exact integer ppm credit, 7-day lookback",
    tags=("analytics", "joins", "window"),
)
def q_attribution_credits(spark, sf_dir):
    b = bars(spark, sf_dir)
    conv = b.where(F.col("symbol") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("ts_ns").alias("conv_ns"),
        F.col("event_id").alias("conv_id"),
    )
    tp = b.where(F.col("symbol") != "purchase").join(
        conv,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("ts_ns") < F.col("conv_ns"))
        & (F.col("ts_ns") >= F.col("conv_ns") - F.lit(_ATTR_LOOKBACK_NS)),
    ).select(F.col("symbol").alias("channel"), "ts_ns", "event_id", "conv_id")
    wp = W.partitionBy("conv_id").orderBy("ts_ns", "event_id")
    pos = tp.select(
        "channel",
        "conv_id",
        F.row_number().over(wp).alias("p"),
        F.count(F.lit(1)).over(W.partitionBy("conv_id")).alias("n"),
    )
    cr = pos.select(
        "channel",
        "conv_id",
        F.expr(
            "CAST(CASE WHEN n = 1 THEN 1000000 WHEN n = 2 THEN 500000 "
            "WHEN p = 1 OR p = n THEN 400000 "
            "ELSE 200000 DIV (n - 2) END AS BIGINT)"
        ).alias("credit_ppm"),
    )
    return cr.groupBy("channel").agg(
        F.count(F.lit(1)).alias("touches"),
        F.countDistinct("conv_id").alias("conversions_touched"),
        F.sum("credit_ppm").cast("long").alias("credit_ppm_sum"),
    )
