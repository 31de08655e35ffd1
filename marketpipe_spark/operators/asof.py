"""As-of and interval (range) joins — time-series join operators Spark has
no native form of, built shuffle-minimal.

The reference's loader aligns bars to requested ranges and its validation
compares each bar to its predecessor (windows); a market-data engine's
missing classic is the trade↔quote **as-of join** (latest quote at or before
each trade). DuckDB — the reference's query engine — ships ASOF JOIN
natively, which is what the registry oracle uses.

Scale design:
- ``asof_join`` is the union-window formulation: tag both sides, one
  shuffle+sort on (key, ts), carry the last right-side payload forward with
  ``last(ignorenulls)``. ONE exchange total — no per-row range join, no
  explosion; at 100 TB this is a sort-merge on the join key, the same cost
  as any keyed window.
- ``interval_join`` buckets time into fixed slabs: points join only the
  slabs an interval overlaps (interval explodes into ceil(len/slab) rows).
  Turns point-in-interval (a cross-join predicate Spark would nested-loop)
  into an equi-join on (key, slab) + residual filter. Slab width trades
  replication (long intervals) against selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "symbol",
    ts: str = "ts_ns",
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
    skew_span: int | str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right.ts <= left.ts`` (inclusive, like DuckDB ``ASOF JOIN ... ON
    l.ts >= r.ts``), NULL when none exists. ``tolerance`` (same unit as
    ``ts``) drops matches older than ``left.ts - tolerance``.

    Ties: a right row at exactly left.ts wins over earlier rows; among
    equal-ts right rows the last in (ts, input) order wins — callers with
    duplicate right keys should pre-dedup with keep_last.

    ``skew_span`` — hot-key dispatch for the union-window plan, whose
    ``partitionBy(on)`` puts a hot symbol's ENTIRE trade+quote history on
    one task (the SURVEY §7.4 straggler). The as-of carry state across any
    time boundary is exactly ONE right row (the latest so far), so hot
    keys time-chunk losslessly: per (key, chunk) the window sees the
    chunk's own rows plus one carried-in right row from all earlier
    chunks, and each left row's match is bit-identical to the global
    plan's. Values: ``None`` (plain, default) /
    ``span`` int (chunk EVERY key at that ts width) / ``"auto"`` or
    ``"auto:N"`` (:func:`~marketpipe_spark.operators.skew.
    resolve_trailing_skew` profiles both sides' keys and chunks ONLY keys
    over the straggler threshold — cold keys keep the plain single-task
    window and never touch the carry machinery). Hot-key rows need
    ``ts >= 0`` (epoch timestamps are).
    """
    from pyspark.sql import types as T

    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    rts = f"{ts}{suffix}"

    # The matched right row travels as ONE struct: carrying each payload
    # column with its own last(ignorenulls) would stitch together fields
    # from DIFFERENT right rows whenever a payload value is NULL (and let
    # stale fields leak past the tolerance check). A struct is non-null
    # exactly when a right row exists, so the whole row moves atomically —
    # NULL payload fields stay NULL, matching DuckDB ASOF JOIN.
    struct_t = T.StructType(
        [T.StructField(rts, right.schema[ts].dataType)]
        + [T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in right_cols]
    )
    left_cols = [c for c in left.columns if c not in (on, ts)]
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts).alias(rts), *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_t).alias("_r"),
        *[F.col(c) for c in left_cols],
    )

    u = r.unionByName(l)

    span, hot_keys = (None, None)
    if skew_span is not None:
        from .skew import resolve_trailing_skew

        # Profile the COMBINED key/ts stream: the window task carries both
        # sides' rows, so either side's hot key is a straggler.
        # sorted_threshold=0.95: the as-of carry is one last() per row, so
        # on near-time-sorted input the hot task's sort is a near-free
        # merge and chunking LOSES (SKEW_BENCH ×256 sorted skewed: chunked
        # 27.3 s vs plain 18.9 s) — the guard keeps the plain plan there
        # while genuinely unordered data still dispatches to chunking.
        span, hot_keys = resolve_trailing_skew(
            left.select(F.col(on), F.col(ts)).unionByName(
                right.select(F.col(on), F.col(ts))
            ),
            on,
            ts,
            skew_span,
            sorted_threshold=0.95,
        )

    if span is None:
        # one shuffle: right rows sort before left rows at equal ts, so an
        # exact-ts quote is visible to its trade
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        out = (
            u.select(on, ts, "_side", F.last("_r", ignorenulls=True).over(w).alias("_r"), *left_cols)
            .filter(F.col("_side") == 1)
            .drop("_side")
        )
    else:
        out = _chunked_asof(u, on, ts, left_cols, span, hot_keys)
    rrow = F.col("_r")
    if tolerance is not None:
        stale = rrow.isNull() | (F.col(ts) - rrow.getField(rts) > tolerance)
        rrow = F.when(~stale, rrow)
    return out.select(
        on,
        ts,
        *left_cols,
        rrow.getField(rts).alias(rts),
        *[rrow.getField(f"{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols],
    )


def _chunked_asof(
    u: DataFrame,
    on: str,
    ts: str,
    left_cols: list[str],
    span: int,
    hot_keys: list | None,
) -> DataFrame:
    """Hot-key time-chunked evaluation of the tagged union-window frame.

    Lossless because as-of carry state is ONE row: for any left row, the
    right rows preceding it in its (key, chunk) partition are the carried
    last-right-row from all earlier chunks plus the chunk's own earlier
    right rows — ``last(_r, ignorenulls)`` therefore picks exactly the row
    the global per-key window would. ``hot_keys=None`` chunks every key;
    otherwise cold keys collapse to a single chunk (``_chunk = -1``,
    byte-identical to the plain plan) and skip the carry machinery.

    Cost: one groupBy over HOT right rows for per-chunk tails, a
    control-plane-sized per-key pass over chunk summaries (rows = chunks,
    bounded by time-range/span), and one carry row per (hot key, chunk).
    The hot key's window now runs on time-range/span tasks instead of one.
    """
    if hot_keys is None:
        is_hot = F.lit(True)
    elif not hot_keys:
        is_hot = F.lit(False)
    else:
        is_hot = F.col(on).isin(list(hot_keys))
    u2 = u.withColumn(
        "_chunk",
        F.when(is_hot, F.expr(f"{ts} div {span}")).otherwise(F.lit(-1)),
    )
    # ONE auxiliary pass produces both the populated-chunk list and each
    # chunk's LAST right row: max of a (ts, _r) struct over right rows only
    # (left rows carry a NULL struct that must not shadow a real quote, so
    # they contribute NULL to the max and only materialize the group). The
    # map-side combine reduces the shuffle to (hot keys × chunks) rows.
    tails = (
        u2.filter(F.col("_chunk") >= 0)
        .groupBy(on, "_chunk")
        .agg(
            F.max(
                F.when(F.col("_side") == 0, F.struct(F.col(ts), F.col("_r")))
            ).alias("_tail")
        )
    )
    # Exclusive running carry over the chunk summaries: what the window in
    # chunk c must see from chunks < c (a left-only chunk still needs its
    # carry — it is a row of `tails` with a NULL _tail).
    wc = (
        W.partitionBy(on)
        .orderBy(F.col("_chunk").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carries = (
        tails.select(
            on,
            "_chunk",
            F.last("_tail", ignorenulls=True).over(wc).getField("_r").alias("_r"),
        )
        .filter(F.col("_r").isNotNull())
        .select(
            F.col(on),
            # Placed at the chunk's start with _side=-1: sorts before every
            # real row of the chunk (all have ts >= chunk*span, sides 0/1).
            (F.col("_chunk") * F.lit(span)).cast(dict(u.dtypes)[ts]).alias(ts),
            F.lit(-1).alias("_side"),
            F.col("_r"),
            *[F.lit(None).cast(dict(u.dtypes)[c]).alias(c) for c in left_cols],
            F.col("_chunk"),
        )
    )
    w = (
        W.partitionBy(on, "_chunk")
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u2.unionByName(carries)
        .select(on, ts, "_side", F.last("_r", ignorenulls=True).over(w).alias("_r"), *left_cols)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for skewed keys: every left row
    gets a random-but-deterministic salt in [0, salt_factor); the right side
    replicates each row ``salt_factor`` times (one per salt value). A hot key
    that would land on one reducer spreads across ``salt_factor`` of them.

    AQE's skew-join split handles most cases at runtime; explicit salting is
    for the pathological key (one symbol = 30% of the lake) where even a
    split partition is one key's rows. Cost: right side shuffles
    salt_factor×, so keep the factor small and the right side the smaller
    input. Salt comes from xxhash64 of the whole left row's key + a
    monotonic disambiguator — deterministic for a deterministic input plan.

    Only inner/left-flavored joins are supported: replicated right rows
    that match nothing would surface ``salt_factor`` times in a right/full
    outer result.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left-flavored joins only (got {how!r}): "
            "unmatched replicated right rows would appear salt_factor times in "
            "a right/full outer result"
        )
    sl = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(salt_factor))
    )
    sr = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<long>"))
    )
    return sl.join(sr, [on, "_salt"], how).drop("_salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "symbol",
    ts: str = "ts_ns",
    start: str = "start_ns",
    end: str = "end_ns",
    slab: int = 3_600_000_000_000,
    skew_salt: int | str | None = None,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start <= ts < end``), via slab bucketing: intervals explode into the
    time slabs they overlap, points hash to their slab, equi-join on
    (key, slab), residual range filter. Replaces the nested-loop cross join
    Spark plans for raw range predicates.

    ``skew_salt`` — hot-composite-key dispatch: slabbing spreads TIME, but
    one (key, slab) cell can still hold a burst (one symbol's busiest hour)
    that lands on one reducer. Values: ``None`` (plain) / an int ≥ 2 (salt
    the equi-join at that factor: points take a deterministic per-row salt,
    intervals replicate once per salt value — result rows identical, the
    salt never reaches the output) / ``"auto"`` or ``"auto:N"``
    (:func:`~marketpipe_spark.operators.skew.resolve_join_skew` profiles
    the points' (key, slab) shares and picks a factor sized to the hot
    cell, or the plain join when nothing crosses the straggler threshold).
    The interval side shuffles salt× its size — it is the small side by
    construction (distinct intervals vs point events)."""
    # integer division only: double math on int64 ns loses precision >2^53
    islab = intervals.withColumn(
        "_slab",
        F.explode(F.sequence(F.expr(f"{start} div {slab}"), F.expr(f"({end} - 1) div {slab}"))),
    )
    pslab = points.withColumn("_slab", F.expr(f"{ts} div {slab}"))
    salt = None
    if skew_salt is not None:
        from .skew import resolve_join_skew

        salt = resolve_join_skew(pslab, [on, "_slab"], skew_salt)
    if salt is None:
        joined = pslab.join(islab, [on, "_slab"])
    else:
        from .skew import salted_join as _salted

        joined = _salted(pslab, islab, [on, "_slab"], salt=salt)
    return (
        joined
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_slab")
    )
