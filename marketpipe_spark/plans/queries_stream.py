"""Structured Streaming entries with batch-SQL oracles.

Every other streaming operator in this repo is verified by repo tests only
(the driver's DuckDB oracle cannot run a stream). These entries close that
gap: each runs a REAL Structured Streaming query — file-source ``readStream``
over the driver's parquet, event-time watermarks, stateful operators — drained
with ``Trigger.AvailableNow`` into a memory sink, and returns the sink table
as a plain DataFrame. Because the input is bounded, the streaming semantics
have an exact batch equivalent, so the driver's hash compare applies:

- ``stream_resample_5m``: windowed OHLCV aggregation in COMPLETE mode. With
  all state retained, the final emission over a bounded stream is exactly the
  batch group-by — oracle is the batch resample SQL, unchanged.
- ``stream_dedup_minute``: ``dropDuplicatesWithinWatermark`` emits the first
  row per key; projected to the key columns the output is exactly
  ``SELECT DISTINCT`` regardless of arrival order.
- ``stream_sessions``: ``session_window`` in APPEND mode emits only sessions
  the final watermark closed — the oracle reproduces gaps-and-islands
  sessionization PLUS the watermark rule (session end ≤ max event-time ms −
  delay), so the late-data semantics themselves are what is verified.

Scale notes: the streaming plans are the production shape (keyed state,
watermark-bounded eviction, file-source backlog draining — SURVEY §2.9); the
memory sink exists only so the result can be compared. Production sinks are
``stream_to_lake``'s foreachBatch upsert. Reference semantics cited:
aggregation/domain/services.py:31-45 (A1 resample), validation timestamp-
uniqueness (P8), and the checkpoint-resume loop
(ingestion/application/services.py:470-553) which AvailableNow mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import NS_PER_MIN, NS_PER_SEC
from ..streaming.stream import run_to_memory, windowed_ohlcv
from .queries_bars import _resample_sql
from .registry import SQL_BARS, register, t, ts_ns_expr

#: Watermark delay for the append-mode entries (must match the oracle cutoff).
WM_MIN = 10
GAP_MIN = 30


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's events parquet. The schema comes
    from the (cached) batch relation — a file stream source cannot infer.
    The glob form keeps ``basePath`` a directory while matching one file."""
    schema = t(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")


def _bar_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of :func:`registry.bars` (same column mapping)."""
    ev = _event_stream(spark, sf_dir)
    return ev.select(
        F.col("event_type").alias("symbol"),
        ts_ns_expr(ev).alias("ts_ns"),
        F.col("value").alias("open"),
        F.col("value").alias("high"),
        F.col("value").alias("low"),
        F.col("value").alias("close"),
        (F.col("event_id") % F.lit(1000)).alias("volume"),
        F.col("event_id"),
        F.col("user_id"),
    )


@register(
    "stream_resample_5m",
    _resample_sql(300 * NS_PER_SEC),
    doc="Structured Streaming windowed OHLCV (complete mode, AvailableNow) == batch A1 resample",
    tags=("streaming", "agg"),
)
def q_stream_resample_5m(spark, sf_dir):
    agg = windowed_ohlcv(_bar_stream(spark, sf_dir), minutes=5, watermark=f"{WM_MIN} minutes")
    return run_to_memory(agg, "stream_resample_5m", "complete")


SQL_STREAM_DEDUP_MINUTE = f"""
WITH {SQL_BARS}
SELECT DISTINCT symbol, ts_ns - ts_ns % {NS_PER_MIN} AS minute_ns
FROM bars
"""


def dedup_minute_pipeline(b: DataFrame) -> DataFrame:
    """The stream_dedup_minute transformation over any bars-shaped stream
    (exposed so the property tests can drive the SAME pipeline through
    arbitrary micro-batch splits)."""
    keyed = b.withColumn("minute_ns", F.col("ts_ns") - F.col("ts_ns") % F.lit(NS_PER_MIN))
    return (
        keyed.withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
        .withWatermark("event_time", f"{WM_MIN} minutes")
        .dropDuplicatesWithinWatermark(["symbol", "minute_ns"])
        .select("symbol", "minute_ns")
    )


@register(
    "stream_dedup_minute",
    SQL_STREAM_DEDUP_MINUTE,
    doc="streaming dropDuplicatesWithinWatermark on (symbol, minute) == DISTINCT (P8 duplicate rejection)",
    tags=("streaming", "dedup"),
)
def q_stream_dedup_minute(spark, sf_dir):
    deduped = dedup_minute_pipeline(_bar_stream(spark, sf_dir))
    return run_to_memory(deduped, "stream_dedup_minute", "append")


_GAP_NS = GAP_MIN * 60 * NS_PER_SEC
_WM_MS = WM_MIN * 60 * 1000

# The watermark cutoff reproduces Spark's bookkeeping exactly: event time is
# µs (ts_ns div 1000), the tracked max is truncated to ms, the delay is
# subtracted in ms, and append mode emits sessions whose END is at or below
# the final watermark (end == watermark IS emitted — pinned empirically by
# tests/test_streaming.py::test_session_emission_boundary_rule).
SQL_STREAM_SESSIONS = f"""
WITH {SQL_BARS},
b AS (SELECT user_id, ts_ns, volume FROM bars),
mx AS (SELECT ((MAX(ts_ns) // 1000000) - {_WM_MS}) * 1000000 AS wm_ns FROM b),
ordered AS (
  SELECT user_id, ts_ns, volume,
         LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns) AS prev
  FROM b
),
tagged AS (
  SELECT user_id, ts_ns, volume,
         -- STRICT >: session_window MERGES touching sessions (an event
         -- exactly GAP after the previous one extends the session — probed
         -- on both batch and streaming session_window; the hypothesis
         -- micro-batch sweep found this boundary, which real event data
         -- never hits)
         CASE WHEN prev IS NULL OR ts_ns - prev > {_GAP_NS} THEN 1 ELSE 0 END AS nb
  FROM ordered
),
sids AS (
  SELECT user_id, ts_ns, volume,
         SUM(nb) OVER (PARTITION BY user_id ORDER BY ts_ns ROWS UNBOUNDED PRECEDING) AS sid
  FROM tagged
),
sess AS (
  SELECT user_id,
         MIN(ts_ns) AS session_start_ns,
         MAX(ts_ns) + {_GAP_NS} AS session_end_ns,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(volume) AS BIGINT) AS volume
  FROM sids GROUP BY user_id, sid
)
SELECT user_id, session_start_ns, session_end_ns, n_events, volume
FROM sess, mx
WHERE session_end_ns <= wm_ns
"""


def sessions_pipeline(b: DataFrame) -> DataFrame:
    """The stream_sessions transformation over any bars-shaped stream
    (exposed for the micro-batch property tests)."""
    return (
        b.withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
        .withWatermark("event_time", f"{WM_MIN} minutes")
        .groupBy(F.col("user_id"), F.session_window("event_time", f"{GAP_MIN} minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("volume").alias("volume"),
        )
        .select(
            "user_id",
            (F.unix_micros(F.col("w.start")) * 1000).alias("session_start_ns"),
            (F.unix_micros(F.col("w.end")) * 1000).alias("session_end_ns"),
            "n_events",
            "volume",
        )
    )


@register(
    "stream_sessions",
    SQL_STREAM_SESSIONS,
    doc="streaming session_window (append mode): watermark-closed sessions == gaps-and-islands + watermark-cutoff oracle",
    tags=("streaming", "sessions", "window"),
)
def q_stream_sessions(spark, sf_dir):
    sess = sessions_pipeline(_bar_stream(spark, sf_dir))
    return run_to_memory(sess, "stream_sessions", "append")


# ---------------------------------------------------------------------------
# Stream-stream join: click -> purchase attribution. Two independently
# watermarked event streams joined on user within a 30-minute window after
# the click — the canonical ad-attribution stream-stream inner join (both
# sides keep watermark-bounded state; the range condition is what lets Spark
# evict click state once the purchase-side watermark passes click_time +
# 30 min). Over the driver's bounded input the inner join emits exactly the
# batch self-join, which is the oracle below. Timestamps are µs-precision
# (physical parquet type), so the event-time comparison and the oracle's
# ts_ns arithmetic agree bit-for-bit.

_ATTR_WINDOW_MIN = 30
_ATTR_WINDOW_NS = _ATTR_WINDOW_MIN * 60 * NS_PER_SEC

SQL_STREAM_ATTRIBUTION = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns FROM events)
SELECT a.user_id AS user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       b.ts_ns - a.ts_ns AS gap_ns
FROM e a JOIN e b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ts_ns >= a.ts_ns AND b.ts_ns <= a.ts_ns + {_ATTR_WINDOW_NS}
"""


def attribution_pipeline(mk_leg) -> DataFrame:
    """The stream_attribution_join transformation; ``mk_leg()`` returns a
    fresh source stream with (event_id, user_id, event_type, ts_ns) per call
    (two independent legs — exposed for the micro-batch property tests)."""
    def leg(evtype: str, prefix: str):
        base = mk_leg()
        return (
            base.where(F.col("event_type") == evtype)
            .withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts_ns").alias(f"{prefix}_ts_ns"),
                F.col("event_time").alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", f"{WM_MIN} minutes")
        )

    clicks = leg("click", "click")
    purchases = leg("purchase", "purchase")
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (
            F.col("purchase_time")
            <= F.col("click_time") + F.expr(f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES")
        ),
    ).select(
        F.col("click_user").alias("user_id"),
        F.col("click_id"),
        F.col("purchase_id"),
        (F.col("purchase_ts_ns") - F.col("click_ts_ns")).alias("gap_ns"),
    )
    return joined


@register(
    "stream_attribution_join",
    SQL_STREAM_ATTRIBUTION,
    doc=f"stream-stream inner join (click->purchase within {_ATTR_WINDOW_MIN}m, per-side watermarks + range condition) == batch self-join",
    tags=("streaming", "joins"),
)
def q_stream_attribution_join(spark, sf_dir):
    def mk_leg():
        ev = _event_stream(spark, sf_dir)
        return ev.select(
            "event_id", "user_id", "event_type", ts_ns_expr(ev).alias("ts_ns")
        )

    return run_to_memory(attribution_pipeline(mk_leg), "stream_attribution_join", "append")


# ---------------------------------------------------------------------------
# Complete-mode streaming top-N: global aggregation + sort + limit is legal
# ONLY in complete output mode (append can never re-emit a displaced row) —
# this entry pins that ranking semantics. Over the bounded drained input the
# final complete emission equals the batch top-N with the same total-order
# tie-break (count desc, user_id asc), which is the oracle.

_TOPN_USERS = 20

SQL_STREAM_TOP_USERS = f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT {_TOPN_USERS}
"""


@register(
    "stream_top_users",
    SQL_STREAM_TOP_USERS,
    doc=f"streaming complete-mode top-{_TOPN_USERS} users by event count (agg + sort + limit, the ranking shape only complete mode permits) == batch top-N",
    tags=("streaming", "agg", "sort"),
)
def q_stream_top_users(spark, sf_dir):
    ev = _event_stream(spark, sf_dir)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(_TOPN_USERS)
    )
    return run_to_memory(top, "stream_top_users", "complete")


_SLIDE_NS = 5 * 60 * NS_PER_SEC
_WIN_SLIDES = 3  # 15-minute window / 5-minute slide


def _sliding_sql() -> str:
    # Batch equivalent of the sliding window: every bar belongs to the
    # _WIN_SLIDES consecutive slide-aligned windows whose span covers it —
    # start = floor_slide(ts) - k*slide for k in 0.._WIN_SLIDES-1 (epoch
    # alignment is Spark's F.window contract). COMPLETE mode over a bounded
    # stream emits exactly this group-by.
    ks = ", ".join(str(k) for k in range(_WIN_SLIDES))
    return f"""
WITH {SQL_BARS},
kk AS (SELECT unnest([{ks}]) AS k),
m AS (
  SELECT symbol,
         (ts_ns - ts_ns % {_SLIDE_NS}) - k * {_SLIDE_NS} AS ws,
         volume
  FROM bars CROSS JOIN kk
)
SELECT symbol, CAST(ws AS BIGINT) AS ts_ns,
       CAST(SUM(volume) AS BIGINT) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_bars
FROM m GROUP BY symbol, ws
"""


@register(
    "stream_sliding_volume",
    _sliding_sql(),
    doc="Structured Streaming SLIDING windows (15 min / 5 min slide, complete mode, AvailableNow): per-symbol volume profile == batch k-shift window expansion",
    tags=("streaming", "agg", "window"),
)
def q_stream_sliding_volume(spark, sf_dir):
    from ..streaming.stream import sliding_volume

    agg = sliding_volume(
        _bar_stream(spark, sf_dir),
        window_minutes=15,
        slide_minutes=5,
        watermark=f"{WM_MIN} minutes",
    )
    return run_to_memory(agg, "stream_sliding_volume", "complete")


# ---------------------------------------------------------------------------
# Custom stateful operator under the oracle: anomaly_stream is an
# applyInPandasWithState per-symbol extreme-movement detector (one
# (last_ts, last_close) state pair per symbol, Arrow-chunk-fold before the
# scan). Over a bounded drained stream its emission is exactly the batch
# lag-1 window — so the ONE streaming API family the other entries don't
# cover (arbitrary stateful processing, SURVEY §2.9's custom-operator
# path) gets a full value-hash oracle too, not just unit tests. The input
# contract that makes the scan deterministic: (symbol, ts_ns) is unique in
# the driver's events (checked — the stable sort is then a total order and
# Arrow chunk arrival order is irrelevant); move_frac is the same IEEE
# double division in pandas and both SQL engines.

_ANOM_THRESHOLD = 1.0


SQL_STREAM_ANOMALY = f"""
WITH {SQL_BARS},
sa AS (SELECT symbol, ts_ns, close,
              LAG(close) OVER (PARTITION BY symbol ORDER BY ts_ns) AS prev_close
       FROM bars)
SELECT symbol, ts_ns, close, prev_close,
       abs(close - prev_close) / abs(prev_close) AS move_frac
FROM sa
WHERE prev_close IS NOT NULL AND prev_close <> 0
  AND abs(close - prev_close) / abs(prev_close) > {_ANOM_THRESHOLD}
"""


@register(
    "stream_anomaly_alerts",
    SQL_STREAM_ANOMALY,
    doc=f"applyInPandasWithState extreme-movement detector (per-symbol lag-1 state, move > {_ANOM_THRESHOLD}) == batch lag window over the drained stream",
    tags=("streaming", "window"),
)
def q_stream_anomaly_alerts(spark, sf_dir):
    from ..streaming.stream import anomaly_stream

    alerts = anomaly_stream(_bar_stream(spark, sf_dir), threshold=_ANOM_THRESHOLD)
    return run_to_memory(alerts, "stream_anomaly_alerts", "append")


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER interval join — the null-padding emission
# semantics the inner attribution entry can't exercise: matched pairs emit
# immediately (inner behavior); an UNMATCHED click emits null-padded only
# once the global watermark (min over both legs of max-event-ms − delay)
# passes its join-window close, so clicks near the end of the bounded
# stream stay IN STATE when the query drains — the oracle reproduces the
# join predicate (µs precision, the event_time resolution) PLUS that
# watermark cutoff rule (ms precision, the watermark resolution), i.e. the
# late/outer emission contract itself is what's verified (the
# stream_sessions strategy applied to outer joins). Empirically pinned at
# sf0.001: 5 matched + 204 of 205 unmatched emitted; the one retained
# click is the one whose window outlives the final watermark.

_OUTER_WINDOW_MIN = 60


SQL_STREAM_OUTER = f"""
WITH {SQL_BARS},
ock AS (SELECT user_id, event_id, ts_ns FROM bars WHERE symbol = 'click'),
opu AS (SELECT user_id, event_id, ts_ns FROM bars WHERE symbol = 'purchase'),
owm AS (SELECT LEAST((SELECT MAX(ts_ns) FROM ock), (SELECT MAX(ts_ns) FROM opu))
               // 1000000 - {WM_MIN * 60_000} AS wm_ms),
omt AS (
  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         p.ts_ns - c.ts_ns AS gap_ns
  FROM ock c JOIN opu p ON c.user_id = p.user_id
   AND p.ts_ns // 1000 >= c.ts_ns // 1000
   AND p.ts_ns // 1000 <= c.ts_ns // 1000 + {_OUTER_WINDOW_MIN * 60_000_000}
),
oum AS (
  SELECT c.user_id, c.event_id AS click_id,
         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS BIGINT) AS gap_ns
  FROM ock c
  WHERE NOT EXISTS (
    SELECT 1 FROM opu p WHERE p.user_id = c.user_id
     AND p.ts_ns // 1000 >= c.ts_ns // 1000
     AND p.ts_ns // 1000 <= c.ts_ns // 1000 + {_OUTER_WINDOW_MIN * 60_000_000})
   AND c.ts_ns // 1000000 + {_OUTER_WINDOW_MIN * 60_000} < (SELECT wm_ms FROM owm)
)
SELECT user_id, click_id, purchase_id, gap_ns FROM omt
UNION ALL
SELECT user_id, click_id, purchase_id, gap_ns FROM oum
"""


@register(
    "stream_outer_attribution",
    SQL_STREAM_OUTER,
    doc=f"stream-stream LEFT OUTER interval join (click->purchase within {_OUTER_WINDOW_MIN}m): null-padded emission gated by the min-leg watermark — the outer/late contract itself is oracle-verified",
    tags=("streaming", "joins"),
)
def q_stream_outer_attribution(spark, sf_dir):
    def leg(evtype, prefix):
        ev = _event_stream(spark, sf_dir)
        base = ev.select(
            "event_id", "user_id", "event_type", ts_ns_expr(ev).alias("ts_ns")
        )
        return (
            base.where(F.col("event_type") == evtype)
            .withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts_ns").alias(f"{prefix}_ts_ns"),
                F.col("event_time").alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", f"{WM_MIN} minutes")
        )

    clicks, purchases = leg("click", "click"), leg("purchase", "purchase")
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (
            F.col("purchase_time")
            <= F.col("click_time") + F.expr(f"INTERVAL {_OUTER_WINDOW_MIN} MINUTES")
        ),
        "leftOuter",
    ).select(
        F.col("click_user").alias("user_id"),
        F.col("click_id"),
        F.col("purchase_id"),
        (F.col("purchase_ts_ns") - F.col("click_ts_ns")).alias("gap_ns"),
    )
    return run_to_memory(joined, "stream_outer_attribution", "append")
