"""Control plane: ingestion-job state machine + metrics history.

Reference semantics reproduced:
- ``ProcessingState`` and transition guards (ingestion/domain/entities.py:
  20-27, 254-335): pending → in_progress → completed/failed, with
  fail/cancel also allowed from pending; invalid transitions raise
  ``ValueError("Cannot <verb> job in state <state>")`` exactly like the
  reference entity.
- Job-state summary counts (cli/jobs.py:165-185) — A10.
- Metrics repository (metrics.py:131-255): ``record`` appends
  (ts, name, value, provider, feed); ``get_metrics_history`` /
  ``get_average_metrics`` / ``get_performance_trends`` become the shared
  DataFrame functions below, so the SAME code path serves the parquet store
  and the registry's oracle-checked entries.

Storage: the reference keeps these rows in SQLite. Here they are tiny
parquet control tables (same pattern as ``streaming.incremental.
CheckpointStore``) — driver-side rewrite is deliberate and bounded: the
tables hold one row per (job, symbol, day) / metric point, never data-plane
volume. On a cluster the natural home is a catalog-backed table; the query
functions take any DataFrame and do not care.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import METRICS_SCHEMA

from pyspark.sql import types as T

JOB_STATES = ("pending", "in_progress", "completed", "failed", "cancelled")

#: verb → states it may be applied from (entities.py:254-271)
_CAN = {
    "start": {"pending"},
    "complete": {"in_progress"},
    "fail": {"pending", "in_progress"},
    "cancel": {"pending", "in_progress"},
}
_TARGET = {"start": "in_progress", "complete": "completed", "fail": "failed", "cancel": "cancelled"}

JOBS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("day", T.DateType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("bars_processed", T.LongType(), True),
    ]
)


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def _exists(spark: SparkSession, path: str) -> bool:
    """Hadoop FS existence (os.path is blind to hdfs:///s3a:// paths)."""
    from .lake import _hadoop_fs

    fs, hpath, _ = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def _read_table(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read a control table, recovering from the ``.old`` generation if a
    crash landed between :func:`_rewrite`'s two renames."""
    if _exists(spark, path):
        return spark.read.parquet(path)
    if _exists(spark, path + ".old"):
        return spark.read.parquet(path + ".old")
    return spark.createDataFrame([], schema)


def _rewrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Crash-safe replace of a tiny control table.

    A bare ``mode('overwrite')`` on the destination deletes its files
    BEFORE the job commits — a driver kill in that window loses all job
    state. Instead: fully materialize the new generation beside the old
    one, then swap by rename (atomic on HDFS/posix). A crash between the
    two renames leaves ``.old`` in place, which :func:`_read_table`
    recovers from. (This is the single-writer parquet backend; the SQL
    backends in control_sql.py own the concurrent-writer story.)
    """
    from .lake import _hadoop_fs

    tmp, old = path + ".tmp", path + ".old"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs, hpath, jvm = _hadoop_fs(spark, path)
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    htmp, hold = hadoop_path(tmp), hadoop_path(old)
    fs.delete(hold, True)
    if fs.exists(hpath):
        fs.rename(hpath, hold)
    fs.rename(htmp, hpath)
    fs.delete(hold, True)


class JobsStore:
    """Ingestion-job control table, one row per (job_id, symbol, day)
    (reference ingestion_jobs table, infrastructure/repositories/
    sqlite_domain.py:56-120; state machine entities.py:254-335)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        return _read_table(self.spark, self.path, JOBS_SCHEMA)

    def _rows(self) -> list:
        return self.load().collect()

    def create(self, job_id: str, symbol_days: list[tuple[str, dt.date]]) -> None:
        """Register a job's (symbol, day) work units in state 'pending'."""
        rows = self._rows()
        if any(r.job_id == job_id for r in rows):
            raise ValueError(f"job {job_id!r} already exists")
        now = _now()
        new = [(job_id, s, d, "pending", now, now, None, None) for s, d in symbol_days]
        df = self.load().unionByName(self.spark.createDataFrame(new, JOBS_SCHEMA))
        _rewrite(self.spark, df, self.path)

    def _transition(self, job_id: str, verb: str, error: str | None = None,
                    bars: dict[tuple[str, dt.date], int] | None = None) -> None:
        rows = self._rows()
        mine = [r for r in rows if r.job_id == job_id]
        if not mine:
            raise ValueError(f"job {job_id!r} not found")
        for r in mine:
            if r.state not in _CAN[verb]:
                raise ValueError(f"Cannot {verb} job in state {r.state}")
        now = _now()
        target = _TARGET[verb]
        out = []
        for r in rows:
            if r.job_id != job_id:
                out.append(tuple(r))
                continue
            n = bars.get((r.symbol, r.day)) if bars else r.bars_processed
            out.append((r.job_id, r.symbol, r.day, target, r.created_at, now,
                        error if verb == "fail" else r.error_message,
                        n if n is not None else r.bars_processed))
        _rewrite(self.spark, self.spark.createDataFrame(out, JOBS_SCHEMA), self.path)

    def start(self, job_id: str) -> None:
        self._transition(job_id, "start")

    def complete(self, job_id: str, bars: dict[tuple[str, dt.date], int] | None = None) -> None:
        self._transition(job_id, "complete", bars=bars)

    def fail(self, job_id: str, error_message: str) -> None:
        self._transition(job_id, "fail", error=error_message)

    def cancel(self, job_id: str) -> None:
        self._transition(job_id, "cancel")

    def state_counts(self) -> DataFrame:
        return job_state_counts(self.load())


class MetricsStore:
    """Append-only metrics history (reference metrics.py:145-156 — SQLite
    INSERT becomes a parquet append; the table is control-plane-sized)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        return _read_table(self.spark, self.path, METRICS_SCHEMA)

    def record(self, name: str, value: float, provider: str = "unknown",
               feed: str = "unknown", ts: int | None = None) -> None:
        ts = int(time.time()) if ts is None else int(ts)
        row = self.spark.createDataFrame([(ts, name, float(value), provider, feed)], METRICS_SCHEMA)
        row.coalesce(1).write.mode("append").parquet(self.path)

    def history(self, name: str, since_ts: int | None = None) -> DataFrame:
        return metrics_history(self.load(), name, since_ts)

    def average(self, name: str, window_minutes: int, now_ts: int | None = None) -> DataFrame:
        now_ts = int(time.time()) if now_ts is None else now_ts
        return metrics_average(self.load(), name, now_ts - window_minutes * 60)

    def trend(self, name: str, now_ts: int | None = None, buckets: int = 24,
              bucket_minutes: int = 60) -> DataFrame:
        now_ts = int(time.time()) if now_ts is None else now_ts
        return metrics_trend(self.load(), name, now_ts, buckets, bucket_minutes)

    def list_names(self) -> list[str]:
        return [r.name for r in self.load().select("name").distinct().orderBy("name").collect()]


# ---------------------------------------------------------------------------
# shared query shapes (store methods AND registry entries call these)

def job_state_counts(jobs: DataFrame) -> DataFrame:
    """A10 — jobs per state (reference cli/jobs.py:165-175)."""
    return (
        jobs.groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_jobs"))
        .orderBy(F.desc("n_jobs"), F.asc("state"))
    )


def metrics_history(m: DataFrame, name: str, since_ts: int | None = None) -> DataFrame:
    """Metric time series (reference metrics.py:158-199)."""
    out = m.filter(F.col("name") == name)
    if since_ts is not None:
        out = out.filter(F.col("ts") >= since_ts)
    return out.select("ts", "name", "value", "provider", "feed").orderBy("ts")


def metrics_average(m: DataFrame, name: str, since_ts: int) -> DataFrame:
    """A7 — windowed average (reference metrics.py:201-216). Decimal-exact
    sum so the double result is shuffle-order-independent."""
    return (
        m.filter((F.col("name") == name) & (F.col("ts") >= since_ts))
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def metrics_trend(m: DataFrame, name: str, now_ts: int, buckets: int = 24,
                  bucket_minutes: int = 60) -> DataFrame:
    """A8 — fixed-bucket trend (reference metrics.py:218-248): bucket i spans
    [now − (buckets−i)·step, now − (buckets−i−1)·step); empty buckets emit
    (0.0, 0) like the reference. Integer bucket math only — identical in any
    engine."""
    step = bucket_minutes * 60
    spark = m.sparkSession
    # row → bucket: i = buckets − ceil((now − ts)/step), ceil via int arithmetic
    age = F.lit(now_ts) - F.col("ts")
    idx = F.lit(buckets) - ((age + F.lit(step - 1)) / F.lit(step)).cast("long")
    binned = (
        m.filter(F.col("name") == name)
        .withColumn("bucket_id", idx)
        .filter((F.col("bucket_id") >= 0) & (F.col("bucket_id") < buckets))
        .groupBy("bucket_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ids = spark.range(buckets).select(F.col("id").alias("bucket_id"))
    return (
        ids.join(binned, "bucket_id", "left_outer")
        .select(
            "bucket_id",
            (F.lit(now_ts) - (F.lit(buckets) - F.col("bucket_id")) * F.lit(step)).alias("bucket_start_ts"),
            F.coalesce("avg_value", F.lit(0.0)).alias("avg_value"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .orderBy("bucket_id")
    )


def metrics_average_windowed(m: DataFrame, name: str, window_secs: int) -> DataFrame:
    """A7 without a driver round-trip: ``now = max(ts)`` over the series is
    attached to every row as a broadcast scalar (``registry.scalar_join`` —
    a BroadcastHashJoin, never nested-loop), so the whole query is ONE Spark
    job with no ``collect()`` (reference metrics.py:201-216)."""
    from .plans.registry import scalar_join

    s = m.filter(F.col("name") == name)
    mx = s.agg(F.max("ts").alias("_now_ts"))
    return (
        scalar_join(s, "ts", mx)
        .filter(F.col("ts") >= F.col("_now_ts") - F.lit(window_secs))
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def metrics_trend_windowed(m: DataFrame, name: str, buckets: int = 24,
                           bucket_minutes: int = 60) -> DataFrame:
    """A8 with ``now = max(ts)`` as a broadcast scalar instead of a driver
    ``collect()`` — collect-free end to end (reference metrics.py:218-248).

    Because ``now`` here IS the newest sample's own timestamp, buckets are
    top-inclusive: bucket i spans (now − (buckets−i)·step, now −
    (buckets−i−1)·step]. The reference's half-open-from-above form (used by
    :func:`metrics_trend`, whose ``now`` is a wall clock strictly after
    every sample) would place the ts == max(ts) row outside every bucket —
    silently excluding the newest point from its own trend.
    """
    from .plans.registry import scalar_join

    step = bucket_minutes * 60
    spark = m.sparkSession
    s = m.filter(F.col("name") == name)
    mx = s.agg(F.max("ts").alias("_now_ts"))
    age = F.col("_now_ts") - F.col("ts")
    idx = F.lit(buckets - 1) - (age / F.lit(step)).cast("long")
    binned = (
        scalar_join(s, "ts", mx)
        .withColumn("bucket_id", idx)
        .filter((F.col("bucket_id") >= 0) & (F.col("bucket_id") < buckets))
        .groupBy("bucket_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ids = scalar_join(
        spark.range(buckets).select(F.col("id").alias("bucket_id")), "bucket_id", mx
    )
    return (
        ids.join(binned, "bucket_id", "left_outer")
        .select(
            "bucket_id",
            (F.col("_now_ts") - (F.lit(buckets) - F.col("bucket_id")) * F.lit(step)).alias("bucket_start_ts"),
            F.coalesce("avg_value", F.lit(0.0)).alias("avg_value"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .orderBy("bucket_id")
    )


# ---------------------------------------------------------------------------
# control-store migrations

def _control_schemas() -> dict[str, T.StructType]:
    """Canonical schema per control table, keyed by its directory name under
    the control root (``<lake>_ctl/``)."""
    from .streaming.incremental import CHECKPOINT_SCHEMA

    return {"jobs": JOBS_SCHEMA, "metrics": METRICS_SCHEMA, "checkpoints": CHECKPOINT_SCHEMA}


def migrate_control_store(spark: SparkSession, root: str) -> list[tuple[str, str]]:
    """Bring every control table under ``root`` up to the current canonical
    schema (reference ``marketpipe migrate`` → migrations.apply_pending on
    the SQLite core.db; here the stores are parquet, so a "migration" is
    additive schema evolution: new canonical columns are appended as typed
    nulls, existing data and any extra columns are preserved, and types are
    cast to canonical where the name matches). Idempotent — a second run
    reports every table ``up-to-date``.

    Returns [(table, action)] with action in
    {'absent', 'up-to-date', 'migrated: +col1,+col2', 'migrated: cast(col)'}.
    """
    report: list[tuple[str, str]] = []
    for table, schema in _control_schemas().items():
        path = os.path.join(root, table)
        if not _exists(spark, path):
            report.append((table, "absent"))
            continue
        df = spark.read.parquet(path)
        have = {f.name: f.dataType for f in df.schema.fields}
        added, casted = [], []
        cols = []
        for f in schema.fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                added.append(f.name)
            elif have[f.name] != f.dataType:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
                casted.append(f.name)
            else:
                cols.append(F.col(f.name))
        canonical = {f.name for f in schema.fields}
        extras = [F.col(c) for c in df.columns if c not in canonical]
        if not added and not casted:
            report.append((table, "up-to-date"))
            continue
        _rewrite(spark, df.select(*cols, *extras), path)
        parts = [f"+{c}" for c in added] + [f"cast({c})" for c in casted]
        report.append((table, "migrated: " + ",".join(parts)))
    return report
