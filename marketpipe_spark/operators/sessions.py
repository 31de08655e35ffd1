"""Gap-based sessionization — the classic event-stream operator: rows for a
key belong to one session until a quiet gap longer than ``gap`` splits them.

One shuffle total: a per-key window computes the boundary flag
(``ts − lag(ts) > gap``) and its running sum is the session ordinal — the
standard formulation that scales as any keyed window does (state per key is
a sort run, no driver involvement). Batch twin of Structured Streaming's
``session_window``; the streaming leg can use that builtin directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_ns",
    gap: int = 1_800_000_000_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Tag each row with ``session_seq`` (1-based per key). ``order_cols``
    breaks ts ties to keep the window total-ordered."""
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    boundary = F.when(prev.isNull() | (F.col(ts) - prev > gap), F.lit(1)).otherwise(F.lit(0))
    run = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn("_b", boundary).withColumn(
        "session_seq", F.sum("_b").over(run)
    ).drop("_b")


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_ns",
    gap: int = 1_800_000_000_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session summary: start/end/duration/event count."""
    s = sessionize(events, key, ts, gap, order_cols)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts).alias("start_ns"),
        F.max(ts).alias("end_ns"),
        (F.max(ts) - F.min(ts)).alias("duration_ns"),
        F.count(F.lit(1)).alias("n_events"),
    )
