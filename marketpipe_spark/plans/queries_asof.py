"""As-of and interval join queries — trade↔quote alignment over the events
stream, oracle-checked against DuckDB's native ASOF JOIN.

Even/odd ``event_id`` splits the bars stream into deterministic "trades" and
"quotes" halves; timestamps within a symbol are unique in this data, so the
backward as-of match is total-order deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join, interval_join
from ..operators.sessions import session_stats
from .registry import SQL_BARS, bars, register

NS_HOUR = 3_600_000_000_000
NS_HALF_HOUR = 1_800_000_000_000

SQL_ASOF = f"""
WITH {SQL_BARS},
trades AS (SELECT symbol, ts_ns, close AS trade_value FROM bars WHERE event_id % 2 = 0),
quotes AS (SELECT symbol, ts_ns AS quote_ts, close AS quote_value FROM bars WHERE event_id % 2 = 1)
SELECT t.symbol, t.ts_ns, t.trade_value, q.quote_ts, q.quote_value
FROM trades t ASOF LEFT JOIN quotes q
  ON t.symbol = q.symbol AND t.ts_ns >= q.quote_ts
"""


@register("asof_trade_quote", SQL_ASOF, doc="backward as-of join: latest quote at/before each trade (union-window, one shuffle)", tags=("join", "asof"))
def q_asof(spark, sf_dir):
    b = bars(spark, sf_dir)
    trades = b.filter(F.col("event_id") % 2 == 0).select("symbol", "ts_ns", F.col("close").alias("trade_value"))
    quotes = b.filter(F.col("event_id") % 2 == 1).select("symbol", "ts_ns", F.col("close").alias("quote_value"))
    out = asof_join(trades, quotes, on="symbol", ts="ts_ns", right_cols=["quote_value"], suffix="_q")
    return out.select(
        "symbol", "ts_ns", "trade_value",
        F.col("ts_ns_q").alias("quote_ts"), F.col("quote_value_q").alias("quote_value"),
    )


@register(
    "asof_trade_quote_skewauto",
    SQL_ASOF,
    doc="asof_trade_quote under skew AUTO-dispatch (plan_trailing_skew over "
    "both sides' keys; plain union-window when no symbol crosses the "
    "straggler threshold, hot-key time-chunking with one-row carry-in when "
    "one does; cold symbols keep the single-task window) — IDENTICAL oracle "
    "as asof_trade_quote: parity proves dispatch never changes rows",
    tags=("join", "asof", "skew"),
)
def q_asof_skewauto(spark, sf_dir):
    b = bars(spark, sf_dir)
    trades = b.filter(F.col("event_id") % 2 == 0).select("symbol", "ts_ns", F.col("close").alias("trade_value"))
    quotes = b.filter(F.col("event_id") % 2 == 1).select("symbol", "ts_ns", F.col("close").alias("quote_value"))
    # auto:32 pins the threshold partition count (plan-shape determinism).
    out = asof_join(
        trades, quotes, on="symbol", ts="ts_ns", right_cols=["quote_value"],
        suffix="_q", skew_span="auto:32",
    )
    return out.select(
        "symbol", "ts_ns", "trade_value",
        F.col("ts_ns_q").alias("quote_ts"), F.col("quote_value_q").alias("quote_value"),
    )


SQL_INTERVAL = f"""
WITH {SQL_BARS},
iv AS (
  SELECT DISTINCT symbol,
         (epoch_ns(ts) // {NS_HOUR}) * {NS_HOUR} AS start_ns,
         (epoch_ns(ts) // {NS_HOUR}) * {NS_HOUR} + {NS_HALF_HOUR} AS end_ns
  FROM events
  WHERE (epoch_ns(ts) // {NS_HOUR}) % 4 = 0
),
b2 AS (SELECT symbol, ts_ns, close FROM bars)
SELECT b2.symbol, b2.ts_ns, b2.close, iv.start_ns, iv.end_ns
FROM b2 JOIN iv ON b2.symbol = iv.symbol
              AND b2.ts_ns >= iv.start_ns AND b2.ts_ns < iv.end_ns
"""


@register("interval_join_sessions", SQL_INTERVAL, doc="point-in-interval join via slab-bucketed equi-join (no nested-loop range join)", tags=("join", "range"))
def q_interval(spark, sf_dir):
    b = bars(spark, sf_dir)
    hours = (
        b.select("symbol", F.expr(f"ts_ns div {NS_HOUR}").alias("h"))
        .distinct()
        .filter(F.col("h") % 4 == 0)
    )
    iv = hours.select(
        "symbol",
        (F.col("h") * NS_HOUR).alias("start_ns"),
        (F.col("h") * NS_HOUR + NS_HALF_HOUR).alias("end_ns"),
    )
    pts = b.select("symbol", "ts_ns", "close")
    return interval_join(pts, iv, on="symbol", ts="ts_ns", slab=NS_HOUR)


@register(
    "interval_join_sessions_skewauto",
    SQL_INTERVAL,
    doc="interval_join_sessions under skew AUTO-dispatch (plan_join_skew "
    "profiles the points' (symbol, slab) shares; plain slab equi-join when "
    "no cell crosses the straggler threshold, salted at a share-sized "
    "factor when one does — the salt never reaches the output) — IDENTICAL "
    "oracle as interval_join_sessions: parity proves dispatch never "
    "changes rows",
    tags=("join", "range", "skew"),
)
def q_interval_skewauto(spark, sf_dir):
    b = bars(spark, sf_dir)
    hours = (
        b.select("symbol", F.expr(f"ts_ns div {NS_HOUR}").alias("h"))
        .distinct()
        .filter(F.col("h") % 4 == 0)
    )
    iv = hours.select(
        "symbol",
        (F.col("h") * NS_HOUR).alias("start_ns"),
        (F.col("h") * NS_HOUR + NS_HALF_HOUR).alias("end_ns"),
    )
    pts = b.select("symbol", "ts_ns", "close")
    return interval_join(
        pts, iv, on="symbol", ts="ts_ns", slab=NS_HOUR, skew_salt="auto:32"
    )


NS_30MIN = 1_800_000_000_000

SQL_SESSIONS = f"""
WITH {SQL_BARS},
ordered AS (
  SELECT user_id, ts_ns, event_id,
         LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev
  FROM bars
),
tagged AS (
  SELECT user_id, ts_ns, event_id,
         CASE WHEN prev IS NULL OR ts_ns - prev > {NS_30MIN} THEN 1 ELSE 0 END AS b
  FROM ordered
),
ses AS (
  SELECT user_id, ts_ns,
         CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM tagged
)
SELECT user_id, session_seq,
       MIN(ts_ns) AS start_ns, MAX(ts_ns) AS end_ns,
       MAX(ts_ns) - MIN(ts_ns) AS duration_ns,
       COUNT(*) AS n_events
FROM ses GROUP BY user_id, session_seq
"""


@register("user_sessions", SQL_SESSIONS, doc="gap-based sessionization (30min quiet gap) with per-session stats", tags=("window", "sessions"))
def q_user_sessions(spark, sf_dir):
    b = bars(spark, sf_dir).select("user_id", "ts_ns", "event_id")
    return session_stats(b, key="user_id", ts="ts_ns", gap=NS_30MIN, order_cols=["event_id"])


NS_DAY = 86_400 * 10**9


@register(
    "user_sessions_skewsafe",
    SQL_SESSIONS,
    doc="user_sessions on the hot-user-safe two-phase sessionizer "
    "(chunk-local boundaries + control-plane chunk-summary offsets, 1-day "
    "chunks) — IDENTICAL oracle as user_sessions, so driver parity is the "
    "equivalence proof (closes the SURVEY §7.4 unbounded-lookback gap "
    "SCALING.md documented in r7)",
    tags=("window", "sessions", "skew"),
)
def q_user_sessions_skewsafe(spark, sf_dir):
    b = bars(spark, sf_dir).select("user_id", "ts_ns", "event_id")
    return session_stats(
        b, key="user_id", ts="ts_ns", gap=NS_30MIN, order_cols=["event_id"],
        skew_span=NS_DAY,
    )


@register(
    "user_sessions_skewauto",
    SQL_SESSIONS,
    doc="user_sessions under skew AUTO-dispatch (plan_trailing_skew profile; "
    "plain plan when no user crosses the straggler threshold, hot-user-"
    "targeted two-phase sessionizer when one does; cold users bypass the "
    "summary/offset machinery entirely) — IDENTICAL oracle as "
    "user_sessions: parity proves dispatch never changes rows",
    tags=("window", "sessions", "skew"),
)
def q_user_sessions_skewauto(spark, sf_dir):
    b = bars(spark, sf_dir).select("user_id", "ts_ns", "event_id")
    # auto:32 pins the threshold partition count (plan-shape determinism —
    # see validation_report_skewauto).
    return session_stats(
        b, key="user_id", ts="ts_ns", gap=NS_30MIN, order_cols=["event_id"],
        skew_span="auto:32",
    )


# ---------------------------------------------------------------------------
# Journey paths: each 30-minute session's first-5 event-type sequence,
# counted corpus-wide — funnel discovery over the same sessionization the
# user_sessions entry verifies. Output is bounded at |types|^5 rows no
# matter how long sessions get.

SQL_SESSION_PATHS = f"""
WITH {SQL_BARS},
ordered AS (
  SELECT user_id, ts_ns, event_id, symbol AS event_type,
         LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev
  FROM bars
),
tagged AS (
  SELECT user_id, ts_ns, event_id, event_type,
         CASE WHEN prev IS NULL OR ts_ns - prev > {NS_30MIN} THEN 1 ELSE 0 END AS b
  FROM ordered
),
ses AS (
  SELECT user_id, ts_ns, event_id, event_type,
         CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM tagged
),
r AS (
  SELECT user_id, session_seq, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts_ns, event_id) AS rn
  FROM ses
),
p AS (
  SELECT user_id, session_seq,
         COALESCE(string_agg(event_type, '>' ORDER BY rn)
                  FILTER (WHERE rn <= 5), '') AS path
  FROM r GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY path
"""


@register(
    "session_paths",
    SQL_SESSION_PATHS,
    doc="top session journey paths: first-5 event-type sequence per 30min session, counted corpus-wide",
    tags=("sessions", "analytics"),
)
def q_session_paths(spark, sf_dir):
    from ..operators.sessions import session_paths

    b = bars(spark, sf_dir).select(
        "user_id", "ts_ns", "event_id", F.col("symbol").alias("event_type")
    )
    return session_paths(
        b, key="user_id", ts="ts_ns", gap=NS_30MIN, order_cols=["event_id"], max_steps=5
    )
