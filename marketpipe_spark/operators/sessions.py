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


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    for each ordered (from_type, to_type) adjacency, the count and the
    exact integer parts-per-million conditional probability
    P(to | from) — the journey-analysis / anomaly-baseline operator.

    ``order_cols`` breaks timestamp ties (pass a unique event id) so the
    sequence — and therefore the matrix — is total-order deterministic.
    One window shuffle keyed by ``key`` for the lead, one hash-agg to the
    (from, to) pairs (cardinality = |event types|²), and a window over
    ``from_type`` on that tiny aggregate for the row totals.
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    pairs = events.select(
        F.col(typ).alias("from_type"), F.lead(typ).over(w).alias("to_type")
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = F.sum("n").over(W.partitionBy("from_type"))
    return counts.withColumn(
        "prob_ppm", F.floor(F.col("n") * 1_000_000 / total).cast("long")
    )


def session_paths(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_ns",
    typ: str = "event_type",
    gap: int = 1_800_000_000_000,
    order_cols: list[str] | None = None,
    max_steps: int = 5,
) -> DataFrame:
    """Top journey paths: each session's ordered sequence of its first
    ``max_steps`` event types joined with ``>`` (``signup>view>click``),
    counted across the corpus — the funnel-discovery complement of
    :func:`event_transitions` (full prefixes instead of first-order hops).

    Truncation bounds the output at |event types|^max_steps rows however
    long sessions get. The per-session sequence is assembled with
    ``collect_list`` + ``array_sort`` on (ts, tiebreak) structs — bounded
    per session by construction, deterministic under any partitioning —
    then one hash-agg counts paths. Shuffles: the sessionize window (key),
    the per-session agg (key, seq), the path count (path).
    """
    s = sessionize(events, key, ts, gap, order_cols)
    tie = [F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols or [])]
    item = F.struct(F.col(ts).alias("_ts"), *tie, F.col(typ).alias("_t"))
    ordered = F.array_sort(F.collect_list(item))
    path = F.concat_ws(
        ">", F.transform(F.slice(ordered, 1, max_steps), lambda x: x.getField("_t"))
    )
    per_session = s.groupBy(key, "session_seq").agg(path.alias("path"))
    return per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
