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
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right.ts <= left.ts`` (inclusive, like DuckDB ``ASOF JOIN ... ON
    l.ts >= r.ts``), NULL when none exists. ``tolerance`` (same unit as
    ``ts``) drops matches older than ``left.ts - tolerance``.

    Ties: a right row at exactly left.ts wins over earlier rows; among
    equal-ts right rows the last in (ts, input) order wins — callers with
    duplicate right keys should pre-dedup with keep_last.
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

    # one shuffle: right rows sort before left rows at equal ts, so an
    # exact-ts quote is visible to its trade
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        r.unionByName(l)
        .select(on, ts, "_side", F.last("_r", ignorenulls=True).over(w).alias("_r"), *left_cols)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
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
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start <= ts < end``), via slab bucketing: intervals explode into the
    time slabs they overlap, points hash to their slab, equi-join on
    (key, slab), residual range filter. Replaces the nested-loop cross join
    Spark plans for raw range predicates."""
    # integer division only: double math on int64 ns loses precision >2^53
    islab = intervals.withColumn(
        "_slab",
        F.explode(F.sequence(F.expr(f"{start} div {slab}"), F.expr(f"({end} - 1) div {slab}"))),
    )
    pslab = points.withColumn("_slab", F.expr(f"{ts} div {slab}"))
    return (
        pslab.join(islab, [on, "_slab"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_slab")
    )
