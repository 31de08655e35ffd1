"""Checkpointed incremental processing — the reference's "streaming" model.

The reference has no real-time leg; its streaming analog is incremental
batch: per-(job, symbol) checkpoints with resume from
``last_processed_timestamp`` (ingestion/application/services.py:470-553),
gap backfill (cli/ohlcv_backfill.py), keep-last dedup for late/duplicate
data (parquet_engine.py:156-173), and event-driven chaining of
aggregation + validation after ingest
(aggregation/application/services.py:157-164).

Spark mapping: checkpoints are a tiny parquet control table; the chained
legs are plain function composition over the ingested slice (the reference's
in-memory event bus is an implementation detail, SURVEY §7.3). For a true
streaming source, ``incremental_job`` drops in behind Structured Streaming's
``foreachBatch`` unchanged.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NS_DAY = 86_400_000_000_000

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("last_processed_ns", T.LongType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)


class CheckpointStore:
    """Per-(job, symbol) resume positions in a small parquet table
    (reference SQLite checkpoints, sqlite_domain.py:447-501)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        # Shared crash-safe reader: Hadoop-FS existence (os.path is blind
        # to hdfs/s3a paths) + recovery from the .old generation if a save
        # crashed mid-swap.
        from ..control import _read_table

        return _read_table(self.spark, self.path, CHECKPOINT_SCHEMA)

    def last_processed(self, job_id: str, symbol: str) -> int | None:
        rows = (
            self.load()
            .filter((F.col("job_id") == job_id) & (F.col("symbol") == symbol))
            .agg(F.max("last_processed_ns"))
            .collect()
        )
        return rows[0][0]

    def save(self, job_id: str, positions: dict[str, int]) -> None:
        """Upsert new positions (keep-newest per (job, symbol))."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        new = self.spark.createDataFrame(
            [(job_id, s, int(ns), now) for s, ns in positions.items()], CHECKPOINT_SCHEMA
        )
        merged = (
            self.load()
            .unionByName(new)
            .groupBy("job_id", "symbol")
            .agg(
                F.max("last_processed_ns").alias("last_processed_ns"),
                F.max("updated_at").alias("updated_at"),
            )
        )
        # Shared crash-safe rename-swap (control._rewrite): the new
        # generation is fully written beside the old one before any rename;
        # a kill mid-swap is recovered by _read_table's .old fallback.
        from ..control import _rewrite

        _rewrite(self.spark, merged, self.path)


def incremental_job(
    spark: SparkSession,
    job_id: str,
    new_bars: DataFrame,
    raw_root: str,
    agg_root: str,
    checkpoints: CheckpointStore,
    frames: list[str] | None = None,
    market_hours: bool = False,
    jobs=None,
    metrics=None,
    provider: str = "unknown",
    feed: str = "unknown",
    window_start_ns: int | None = None,
    window_end_ns: int | None = None,
) -> dict[str, DataFrame]:
    """One ingestion increment, reproducing the reference's chain:
    job create/start → checkpoint-filter → validate → land raw →
    re-aggregate ONLY the touched (symbol, date) slices → validation report
    → job complete/fail + metrics. Returns the chained outputs.

    Incremental re-aggregation (SURVEY §4 "incremental recompute"): the
    aggregate legs read back just the partitions the increment touched —
    at 100 TB a one-day increment reaggregates one day, not the lake.

    ``jobs`` (control.JobsStore) and ``metrics`` (control.MetricsStore) are
    optional; when given, the reference's control-plane writes happen:
    pending→in_progress→completed/failed rows per (symbol, day)
    (entities.py:254-335) and ingest/validation metric points
    (services.py recording ingest_jobs/ingest_job_total_bars/
    validation_errors, metrics.py:145-156).

    ``window_start_ns``/``window_end_ns`` bound the job's time range; a
    checkpoint OUTSIDE [start, end) is stale and ignored — the symbol
    restarts from the window start (reference services.py:475-491).
    """
    from ..lake import read_bars, upsert_bars
    from ..operators.resample import resample
    from ..operators.validation import split_valid

    if window_start_ns is not None:
        new_bars = new_bars.filter(F.col("ts_ns") >= window_start_ns)
    if window_end_ns is not None:
        new_bars = new_bars.filter(F.col("ts_ns") < window_end_ns)

    # resume: drop rows at or before each symbol's checkpoint — unless the
    # checkpoint is stale (outside the job window), in which case it is
    # ignored entirely (services.py:480-487).
    cps = (
        checkpoints.load()
        .filter(F.col("job_id") == job_id)
        .select("symbol", "last_processed_ns")
    )
    if window_start_ns is not None:
        cps = cps.filter(F.col("last_processed_ns") >= window_start_ns)
    if window_end_ns is not None:
        cps = cps.filter(F.col("last_processed_ns") < window_end_ns)
    fresh = new_bars.join(F.broadcast(cps), "symbol", "left_outer").filter(
        F.col("last_processed_ns").isNull() | (F.col("ts_ns") > F.col("last_processed_ns"))
    ).drop("last_processed_ns")

    # Exact integer date math (shared trading_date): double division on an
    # int64 ns epoch loses precision above 2^53 and can bucket a row within
    # ~128 ns of midnight into the WRONG partition day.
    from ..functions import trading_date

    day = trading_date("ts_ns").alias("date")
    if jobs is not None:
        units = [(r.symbol, r.date) for r in fresh.select("symbol", day).distinct().collect()]
        if units:
            jobs.create(job_id, units)
            jobs.start(job_id)
        else:
            jobs = None  # nothing to ingest — no work units to track
    if metrics is not None:
        metrics.record("ingest_jobs", 1.0, provider, feed)

    try:
        valid, errors = split_valid(fresh, market_hours=market_hours)
        # Pin the validated batch once: its plan (checkpoint join + 13-rule
        # validation pass) otherwise re-executes for the raw upsert, every
        # frame's touched-join, the stats collect, and the errors output —
        # ~6 recomputations of the same work per increment.
        valid = valid.localCheckpoint(eager=True)
        upsert_bars(valid, raw_root, "1m", ingest_id=job_id)

        # event-chained legs (function composition, not a bus)
        touched = valid.select("symbol", day).distinct()
        if not valid.head(1):
            # Empty increment (boundary e2e): nothing landed, and on a brand-
            # new lake the raw root may not even exist — the slice read would
            # throw UNABLE_TO_INFER_SCHEMA. The aggregate legs see an empty
            # slice with the canonical bars shape instead.
            slice_df = valid.select(
                "symbol", "ts_ns", "open", "high", "low", "close", "volume"
            )
        else:
            slice_df = (
                read_bars(spark, raw_root, frame="1m")
                .join(F.broadcast(touched), ["symbol", "date"], "left_semi")
                .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
                # One lake scan, re-used by every frame's resample below.
                .localCheckpoint(eager=True)
            )
        # Returned outputs are pinned with an eager localCheckpoint: their lazy
        # plans read the checkpoint table and lake partitions that THIS job (and
        # the next increment) overwrite — evaluating them later must not re-read
        # mutated files. The increment's slices are small by construction.
        outputs: dict[str, DataFrame] = {"errors": errors.localCheckpoint(eager=True)}
        for frame in frames or ["5m", "1h", "1d"]:
            agg = resample(slice_df, frame).localCheckpoint(eager=True)
            upsert_bars(agg, agg_root, frame, ingest_id=job_id)
            outputs[frame] = agg

        # one tiny control-plane agg feeds checkpoint advance AND job stats
        stats = valid.groupBy("symbol", day).agg(
            F.max("ts_ns").alias("m"), F.count(F.lit(1)).alias("n")
        ).collect()
    except Exception as e:
        if jobs is not None:
            jobs.fail(job_id, str(e))
        if metrics is not None:
            metrics.record("ingest_job_failures", 1.0, provider, feed)
        raise

    maxes: dict[str, int] = {}
    for r in stats:
        maxes[r.symbol] = max(maxes.get(r.symbol, 0), r.m)
    if maxes:
        checkpoints.save(job_id, maxes)

    if jobs is not None:
        jobs.complete(job_id, bars={(r.symbol, r.date): r.n for r in stats})
    if metrics is not None:
        total = float(sum(r.n for r in stats))
        metrics.record("ingest_job_success", 1.0, provider, feed)
        metrics.record("ingest_job_total_bars", total, provider, feed)
        metrics.record("ingest_symbols_success", float(len(maxes)), provider, feed)
        metrics.record("validation_errors", float(outputs["errors"].count()), provider, feed)
    return outputs


def backfill_gaps(
    spark: SparkSession,
    raw_root: str,
    agg_root: str,
    start: dt.date,
    end: dt.date,
    checkpoints: CheckpointStore,
    fetch_day,
    jobs=None,
    metrics=None,
    frames: list[str] | None = None,
    weekdays_only: bool = True,
    market_hours: bool = False,
) -> dict[dt.date, list[str]]:
    """Detect per-symbol gap days in the raw lake and run ONE ingestion job
    per missing day, scoped to that day's window (reference
    cli/ohlcv_backfill.py:1-14,114-140: detect → job per gap → ingest
    synchronously; idempotent because a filled day is no longer a gap).

    ``fetch_day(symbols, day) -> DataFrame`` supplies the day's bars (the
    fake provider in this sandbox; a live adapter on a real deployment).
    Gap detection is one anti-join (operators/gaps.py); the per-day jobs
    reuse the full incremental chain including control-plane writes.
    """
    from ..lake import read_bars
    from ..operators.gaps import gaps_by_symbol

    lake = read_bars(spark, raw_root, frame="1m")
    gap_rows = gaps_by_symbol(lake, start, end, weekdays_only).collect()
    by_day: dict[dt.date, list[str]] = {}
    for r in gap_rows:
        by_day.setdefault(r.day, []).append(r.symbol)

    existing_jobs = (
        {row.job_id for row in jobs.load().select("job_id").distinct().collect()}
        if jobs is not None
        else set()
    )
    filled: dict[dt.date, list[str]] = {}
    for day in sorted(by_day):
        syms = sorted(by_day[day])
        job_id = f"backfill-{day.isoformat()}"
        n = 1
        while job_id in existing_jobs:  # re-run after failure: fresh job row
            job_id = f"backfill-{day.isoformat()}-r{n}"
            n += 1
        day_start = int(
            dt.datetime(day.year, day.month, day.day, tzinfo=dt.timezone.utc).timestamp() * 1e9
        )
        incremental_job(
            spark, job_id, fetch_day(syms, day), raw_root, agg_root, checkpoints,
            frames=frames, market_hours=market_hours, jobs=jobs, metrics=metrics,
            window_start_ns=day_start, window_end_ns=day_start + NS_DAY,
        )
        filled[day] = syms
    return filled
