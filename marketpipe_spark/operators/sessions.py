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
    skew_span: int | str | None = None,
) -> DataFrame:
    """Tag each row with ``session_seq`` (1-based per key). ``order_cols``
    breaks ts ties to keep the window total-ordered.

    ``skew_span`` (optional, in ``ts`` units) switches to the skew-tolerant
    two-phase plan for hot keys — see :func:`_sessionize_chunked`. Results
    are bit-identical for any span ≥ 1. ``"auto"`` (or ``"auto:N"`` with a
    pinned partition count) profiles the data first
    (``skew.plan_trailing_skew``) and chunks ONLY diagnosed hot keys —
    cold keys keep the plain single-window plan inside the same pass.
    """
    if skew_span:
        from .skew import resolve_trailing_skew

        skew_span, hot = resolve_trailing_skew(events, key, ts, skew_span)
        if skew_span is not None:
            return _sessionize_chunked(
                events, key, ts, gap, order_cols, skew_span, hot_keys=hot
            )
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = W.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    boundary = F.when(prev.isNull() | (F.col(ts) - prev > gap), F.lit(1)).otherwise(F.lit(0))
    run = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn("_b", boundary).withColumn(
        "session_seq", F.sum("_b").over(run)
    ).drop("_b")


def _sessionize_chunked(
    events: DataFrame,
    key: str,
    ts: str,
    gap: int,
    order_cols: list[str] | None,
    span: int,
    hot_keys: list | None = None,
) -> DataFrame:
    """Exact sessionization that spreads a hot key over time chunks.

    ``Window.partitionBy(key)`` puts a hot key's entire history in ONE task
    (the SURVEY §7.4 straggler). The running session ordinal looks unbounded
    — it cumulates boundary flags over the key's whole history — but it
    decomposes exactly:

    1. chunk the time axis (``_chunk = ts div span``; equal timestamps land
       in the same chunk, so chunk order is strict time order);
    2. per (key, chunk): boundary flags for non-first rows need only lag-1
       INSIDE the chunk; ``_lcum`` is their running sum — both on the
       (key, chunk) window, hot key spread over its chunks;
    3. per key, one pass over the CHUNK SUMMARIES (first/last ts + boundary
       count per chunk — rows = chunks, volume-independent): the chunk's
       first row starts a session iff ``first_ts − prev_chunk_last_ts >
       gap`` (or no previous chunk), and the chunk's session offset is the
       exclusive running sum of (first-row flag + in-chunk boundary count)
       plus its own first-row flag;
    4. join offsets back on (key, chunk): ``session_seq = offset + _lcum``.

    For every row this equals the plain plan's running boundary sum — the
    decomposition only regroups the same flag sequence — so the result is
    bit-identical for ANY span ≥ 1 (a property test sweeps spans including
    1, where every chunk holds one timestamp). Cost: the summary pass and
    one co-keyed join on (key, chunk); pick span ≫ typical gap so carries
    stay rare (e.g. one day for ns timestamps and a 30-minute gap).

    ``hot_keys`` (r8): when given, ONLY those keys are time-chunked; every
    other key keeps a single chunk (``_chunk = -1``) — exactly the plain
    per-key window — and skips both the summary pass and the offset join
    (a single-chunk key's offset is always its first-row flag 1, so
    ``session_seq = 1 + local running sum`` directly). The two-phase
    overhead then scales with the HOT subset, not the table. Requires
    ``ts >= 0`` for hot-key rows (epoch timestamps are).
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    if hot_keys is not None:
        is_hot = F.col(key).isin(list(hot_keys)) if hot_keys else F.lit(False)
        b = events.withColumn(
            "_chunk", F.when(is_hot, F.expr(f"{ts} div {span}")).otherwise(F.lit(-1))
        )
    else:
        is_hot = None
        b = events.withColumn("_chunk", F.expr(f"{ts} div {span}"))

    wc = W.partitionBy(key, "_chunk").orderBy(*order)
    prev = F.lag(ts).over(wc)
    # First row in a chunk (prev NULL) gets 0 here; its flag is decided in
    # the summary pass from the previous chunk's last ts and folded into
    # the offset (it is constant across the chunk's rows).
    local_b = F.when(prev.isNotNull() & (F.col(ts) - prev > gap), F.lit(1)).otherwise(F.lit(0))
    tagged = b.withColumn("_lb", local_b).withColumn(
        "_lcum", F.sum("_lb").over(wc.rowsBetween(W.unboundedPreceding, W.currentRow))
    )

    if is_hot is not None:
        cold = tagged.where(~is_hot).withColumn(
            "session_seq", (F.lit(1) + F.col("_lcum")).cast("long")
        ).drop("_chunk", "_lb", "_lcum")
        tagged = tagged.where(is_hot)
        if not hot_keys:
            return cold

    summ = tagged.groupBy(key, "_chunk").agg(
        F.min(ts).alias("_first"),
        F.max(ts).alias("_last"),
        F.sum("_lb").alias("_nb"),
    )
    wu = W.partitionBy(key).orderBy("_chunk")
    prev_last = F.lag("_last").over(wu)
    first_b = F.when(
        prev_last.isNull() | (F.col("_first") - prev_last > gap), F.lit(1)
    ).otherwise(F.lit(0))
    wexc = wu.rowsBetween(W.unboundedPreceding, -1)
    offs = (
        summ.withColumn("_fb", first_b)
        .withColumn(
            "_off",
            F.coalesce(F.sum(F.col("_fb") + F.col("_nb")).over(wexc), F.lit(0))
            + F.col("_fb"),
        )
        .select(key, "_chunk", "_off")
    )

    out = (
        tagged.join(offs, [key, "_chunk"])
        .withColumn("session_seq", (F.col("_off") + F.col("_lcum")).cast("long"))
        .drop("_chunk", "_lb", "_lcum", "_off")
    )
    if is_hot is not None:
        out = out.unionByName(cold)
    return out


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_ns",
    gap: int = 1_800_000_000_000,
    order_cols: list[str] | None = None,
    skew_span: int | str | None = None,
) -> DataFrame:
    """Per-session summary: start/end/duration/event count.

    The final (key, session_seq) aggregation partial-aggregates map-side, so
    even a single mega-session does not re-concentrate a hot key that
    ``skew_span`` spread out.
    """
    s = sessionize(events, key, ts, gap, order_cols, skew_span=skew_span)
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
    skew_span: int | str | None = None,
) -> DataFrame:
    """Top journey paths: each session's ordered sequence of its first
    ``max_steps`` event types joined with ``>`` (``signup>view>click``),
    counted across the corpus — the funnel-discovery complement of
    :func:`event_transitions` (full prefixes instead of first-order hops).

    Truncation bounds the output at |event types|^max_steps rows however
    long sessions get — and the agg BUFFER is bounded too: a row_number
    over (key, session_seq) keeps only each session's first ``max_steps``
    events BEFORE the collect (a window sort spills to disk; a
    ``collect_list`` buffer holding a mega-session does not — the same
    buffer-bound rationale as ``capped_basket_arrays``), so the collected
    array is ≤ ``max_steps`` structs per session by construction,
    deterministic under any partitioning. Shuffles: the sessionize window
    (key), the per-session window + agg (key, seq — co-partitioned), the
    path count (path).
    """
    s = sessionize(events, key, ts, gap, order_cols, skew_span=skew_span)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    wses = W.partitionBy(key, "session_seq").orderBy(*order)
    s = s.withColumn("_rn", F.row_number().over(wses)).where(F.col("_rn") <= max_steps)
    tie = [F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols or [])]
    item = F.struct(F.col(ts).alias("_ts"), *tie, F.col(typ).alias("_t"))
    ordered = F.array_sort(F.collect_list(item))
    path = F.concat_ws(">", F.transform(ordered, lambda x: x.getField("_t")))
    per_session = s.groupBy(key, "session_seq").agg(path.alias("path"))
    return per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
