"""Gap detection — expected trading days minus observed partition days.

Reference: src/marketpipe/ingestion/services/gap_detector.py:33-44,62-104
(walks partition directories, set-differences against a weekday calendar).
Spark version: generate the expected-day DataFrame with ``sequence`` and
anti-join the observed distinct days — no filesystem walking, works the same
against a catalog at 100 TB.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_calendar_days(
    df: DataFrame, start: dt.date, end: dt.date, weekdays_only: bool
) -> DataFrame:
    """Append a generated ``day`` column covering [start, end] to every row
    of ``df`` — THE calendar logic, shared by both gap APIs so a future
    holiday/half-day rule changes in exactly one place."""
    out = df.select("*", F.explode(F.sequence(F.lit(start), F.lit(end))).alias("day"))
    if weekdays_only:
        # dayofweek: 1=Sunday ... 7=Saturday
        out = out.filter(~F.dayofweek("day").isin(1, 7))
    return out


def expected_days(
    spark: SparkSession, start: dt.date, end: dt.date, weekdays_only: bool = True
) -> DataFrame:
    return _with_calendar_days(spark.range(1), start, end, weekdays_only).select("day")


def missing_days(
    spark: SparkSession,
    observed: DataFrame,
    start: dt.date,
    end: dt.date,
    day_col: str = "date",
    weekdays_only: bool = True,
) -> DataFrame:
    """J3/O7 — days in [start, end] with no observed data, per the
    reference's gap semantics. ``observed`` is any DataFrame with a date
    column (e.g. a partition-pruned lake scan)."""
    present = observed.select(F.col(day_col).cast("date").alias("day")).distinct()
    return (
        expected_days(spark, start, end, weekdays_only)
        .join(present, "day", "left_anti")
        .orderBy("day")
    )


def gaps_by_symbol(
    lake: DataFrame, start: dt.date, end: dt.date, weekdays_only: bool = True
) -> DataFrame:
    """Per-symbol gap days in one pass: each distinct symbol generates its
    own expected calendar with ``sequence()`` (a per-row generator — no
    crossJoin node, so the plan passes the repo's hygiene ban and the
    expected set is built where the symbol row already lives), anti-joined
    against observed (symbol, day) pairs."""
    from .dedup import _pin

    # One scan, not two: the distinct (symbol, day) frame is pinned and the
    # symbol list derives from it (a distinct of a distinct — identical
    # rows), so the calendar side and the anti-join side share one pass
    # over the lake instead of scanning it once each.
    present = _pin(
        lake.select("symbol", F.col("date").cast("date").alias("day")).distinct()
    )
    symbols = present.select("symbol").distinct()
    expected = _with_calendar_days(symbols, start, end, weekdays_only)
    return expected.join(present, ["symbol", "day"], "left_anti").orderBy("symbol", "day")
