"""SQLite control-plane backend + versioned migrations.

The reference keeps its control plane (ingestion jobs, metrics history,
checkpoints) in SQLite behind repository classes, with an idempotent
file-versioned migration runner (reference: src/marketpipe/migrations/
__init__.py:16-100 ``apply_pending``; src/marketpipe/migrations/versions/
001_core_schema.sql, 003_provider_feed_labels.sql,
005_ingestion_jobs_sqlite.sql; repositories in
src/marketpipe/infrastructure/repositories/sqlite_domain.py).

This module provides the same multi-writer story for this engine: drop-in
``Sqlite{Jobs,Metrics,Checkpoint}Store`` classes exposing the exact API of
the parquet stores (``control.JobsStore`` / ``control.MetricsStore`` /
``streaming.incremental.CheckpointStore``), so ``incremental_job`` and the
CLI can run against either backend. Writes go through short IMMEDIATE
transactions (safe under concurrent writers — the reason a SQL backend
exists at all); reads materialize into Spark DataFrames with the same
schemas the parquet stores use, so every downstream query function
(``job_state_counts``, ``metrics_trend`` …) is backend-agnostic.

The control tables are control-plane-sized (one row per job×symbol×day or
metric point) — never data-plane volume — so driver-side SQLite is the
right tool, exactly as in the reference; a 1000-executor deployment would
point the same repository interface at a server-grade DB.
"""

from __future__ import annotations

import datetime as dt
import os
import sqlite3
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .control import _CAN, _TARGET, job_state_counts, metrics_average, metrics_history, metrics_trend
from .schema import METRICS_SCHEMA

# ---------------------------------------------------------------------------
# migrations (reference migrations/__init__.py:16-100, embedded rather than
# sibling .sql files so the package stays single-directory)

MIGRATIONS: dict[str, str] = {
    # core schema (reference versions/001_core_schema.sql + 005_...jobs)
    "001": """
CREATE TABLE IF NOT EXISTS ingestion_jobs (
    job_id TEXT NOT NULL,
    symbol TEXT NOT NULL,
    day DATE NOT NULL,
    state TEXT NOT NULL DEFAULT 'pending'
        CHECK (state IN ('pending','in_progress','completed','failed','cancelled')),
    created_at TIMESTAMP NOT NULL,
    updated_at TIMESTAMP NOT NULL,
    error_message TEXT,
    bars_processed INTEGER,
    UNIQUE(job_id, symbol, day)
);
CREATE TABLE IF NOT EXISTS metrics (
    ts INTEGER NOT NULL,
    name TEXT NOT NULL,
    value REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS checkpoints (
    job_id TEXT NOT NULL,
    symbol TEXT NOT NULL,
    last_processed_ns INTEGER NOT NULL,
    updated_at TIMESTAMP NOT NULL,
    PRIMARY KEY (job_id, symbol)
);
CREATE INDEX IF NOT EXISTS idx_jobs_job ON ingestion_jobs(job_id);
CREATE INDEX IF NOT EXISTS idx_metrics_ts_name ON metrics(ts, name);
CREATE INDEX IF NOT EXISTS idx_metrics_name ON metrics(name);
""",
    # provider/feed labels (reference versions/003_provider_feed_labels.sql)
    "002": """
ALTER TABLE metrics ADD COLUMN provider TEXT NOT NULL DEFAULT 'unknown';
ALTER TABLE metrics ADD COLUMN feed TEXT NOT NULL DEFAULT 'unknown';
""",
}


def apply_pending(db_path: str | os.PathLike) -> list[str]:
    """Apply unapplied migrations in version order, one transaction each,
    tracked in ``schema_version`` (reference apply_pending semantics:
    idempotent, rollback-per-file on failure). Returns applied versions."""
    db_path = os.fspath(db_path)
    parent = os.path.dirname(db_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    applied: list[str] = []
    with sqlite3.connect(db_path) as con:
        con.execute(
            "CREATE TABLE IF NOT EXISTS schema_version ("
            "version TEXT PRIMARY KEY, applied_at TIMESTAMP NOT NULL)"
        )
        done = {r[0] for r in con.execute("SELECT version FROM schema_version")}
        for version in sorted(MIGRATIONS):
            if version in done:
                continue
            try:
                con.executescript(MIGRATIONS[version])
                con.execute(
                    "INSERT INTO schema_version(version, applied_at) VALUES (?, ?)",
                    (version, dt.datetime.now(dt.timezone.utc).isoformat()),
                )
                con.commit()
                applied.append(version)
            except sqlite3.Error as e:
                con.rollback()
                raise RuntimeError(f"migration {version} failed: {e}") from e
    return applied


def applied_versions(db_path: str | os.PathLike) -> list[str]:
    with sqlite3.connect(os.fspath(db_path)) as con:
        try:
            return sorted(r[0] for r in con.execute("SELECT version FROM schema_version"))
        except sqlite3.OperationalError:
            return []


# ---------------------------------------------------------------------------
# shared plumbing

def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


class _SqliteBase:
    def __init__(self, spark: SparkSession, db_path: str):
        self.spark = spark
        self.db_path = os.fspath(db_path)
        apply_pending(self.db_path)

    @contextmanager
    def _tx(self):
        """Short IMMEDIATE transaction: takes the write lock up front so
        concurrent writers serialize instead of failing mid-transaction."""
        con = sqlite3.connect(self.db_path, timeout=30.0)
        try:
            con.execute("BEGIN IMMEDIATE")
            yield con
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    def _read(self, sql: str, params: tuple = ()) -> list[tuple]:
        con = sqlite3.connect(self.db_path, timeout=30.0)
        try:
            return con.execute(sql, params).fetchall()
        finally:
            con.close()


def _parse_ts(v: str | None) -> dt.datetime | None:
    return None if v is None else dt.datetime.fromisoformat(v)


def _parse_day(v: str) -> dt.date:
    return dt.date.fromisoformat(v)


# ---------------------------------------------------------------------------
# jobs (reference sqlite_domain.py ingestion-job repository + the state
# machine guards in ingestion/domain/entities.py:254-335)

class SqliteJobsStore(_SqliteBase):
    """API-compatible with ``control.JobsStore`` — same methods, same
    DataFrame schema, SQLite rows underneath."""

    def load(self) -> DataFrame:
        from .control import JOBS_SCHEMA

        rows = [
            (j, s, _parse_day(d), st, _parse_ts(c), _parse_ts(u), e, b)
            for j, s, d, st, c, u, e, b in self._read(
                "SELECT job_id, symbol, day, state, created_at, updated_at, "
                "error_message, bars_processed FROM ingestion_jobs"
            )
        ]
        return self.spark.createDataFrame(rows, JOBS_SCHEMA)

    def create(self, job_id: str, symbol_days: list[tuple[str, dt.date]]) -> None:
        now = _now().isoformat()
        with self._tx() as con:
            n = con.execute(
                "SELECT COUNT(*) FROM ingestion_jobs WHERE job_id = ?", (job_id,)
            ).fetchone()[0]
            if n:
                raise ValueError(f"job {job_id!r} already exists")
            con.executemany(
                "INSERT INTO ingestion_jobs (job_id, symbol, day, state, created_at, updated_at)"
                " VALUES (?, ?, ?, 'pending', ?, ?)",
                [(job_id, s, d.isoformat(), now, now) for s, d in symbol_days],
            )

    def _transition(self, job_id: str, verb: str, error: str | None = None,
                    bars: dict[tuple[str, dt.date], int] | None = None) -> None:
        target = _TARGET[verb]
        with self._tx() as con:
            mine = con.execute(
                "SELECT symbol, day, state, bars_processed FROM ingestion_jobs WHERE job_id = ?",
                (job_id,),
            ).fetchall()
            if not mine:
                raise ValueError(f"job {job_id!r} not found")
            for _s, _d, state, _b in mine:
                if state not in _CAN[verb]:
                    raise ValueError(f"Cannot {verb} job in state {state}")
            now = _now().isoformat()
            for s, d, _state, b in mine:
                n = bars.get((s, _parse_day(d))) if bars else b
                con.execute(
                    "UPDATE ingestion_jobs SET state = ?, updated_at = ?, error_message = ?,"
                    " bars_processed = ? WHERE job_id = ? AND symbol = ? AND day = ?",
                    (target, now, error if verb == "fail" else None,
                     n if n is not None else b, job_id, s, d),
                )

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


# ---------------------------------------------------------------------------
# metrics (reference metrics.py SQLite repository:131-255)

class SqliteMetricsStore(_SqliteBase):
    """API-compatible with ``control.MetricsStore``; ``record`` is a single
    INSERT (the reference's exact write path) instead of a parquet append."""

    def load(self) -> DataFrame:
        rows = self._read("SELECT ts, name, value, provider, feed FROM metrics")
        return self.spark.createDataFrame(rows, METRICS_SCHEMA)

    def record(self, name: str, value: float, provider: str = "unknown",
               feed: str = "unknown", ts: int | None = None) -> None:
        ts = int(time.time()) if ts is None else int(ts)
        with self._tx() as con:
            con.execute(
                "INSERT INTO metrics (ts, name, value, provider, feed) VALUES (?, ?, ?, ?, ?)",
                (ts, name, float(value), provider, feed),
            )

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
        return [r[0] for r in self._read("SELECT DISTINCT name FROM metrics ORDER BY name")]


# ---------------------------------------------------------------------------
# checkpoints (reference sqlite_domain.py:447-501)

class SqliteCheckpointStore(_SqliteBase):
    """API-compatible with ``streaming.incremental.CheckpointStore``;
    ``save`` is an UPSERT keeping the newest position per (job, symbol)."""

    def load(self) -> DataFrame:
        from .streaming.incremental import CHECKPOINT_SCHEMA

        rows = [
            (j, s, n, _parse_ts(u))
            for j, s, n, u in self._read(
                "SELECT job_id, symbol, last_processed_ns, updated_at FROM checkpoints"
            )
        ]
        return self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA)

    def last_processed(self, job_id: str, symbol: str) -> int | None:
        rows = self._read(
            "SELECT last_processed_ns FROM checkpoints WHERE job_id = ? AND symbol = ?",
            (job_id, symbol),
        )
        return rows[0][0] if rows else None

    def save(self, job_id: str, positions: dict[str, int]) -> None:
        now = _now().isoformat()
        with self._tx() as con:
            con.executemany(
                "INSERT INTO checkpoints (job_id, symbol, last_processed_ns, updated_at)"
                " VALUES (?, ?, ?, ?)"
                " ON CONFLICT(job_id, symbol) DO UPDATE SET"
                "   last_processed_ns = MAX(last_processed_ns, excluded.last_processed_ns),"
                "   updated_at = excluded.updated_at",
                [(job_id, s, int(ns), now) for s, ns in positions.items()],
            )
