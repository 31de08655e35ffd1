"""SQL control-plane backends (SQLite + Postgres) + versioned migrations.

The reference keeps its control plane (ingestion jobs, metrics history,
checkpoints) in SQLite OR Postgres behind repository classes, with an
idempotent file-versioned migration runner (reference: src/marketpipe/
migrations/__init__.py:16-100 ``apply_pending``; src/marketpipe/migrations/
versions/001_core_schema.sql, 003_provider_feed_labels.sql,
005_ingestion_jobs_sqlite.sql; repositories in
src/marketpipe/infrastructure/repositories/sqlite_domain.py and
postgres_domain.py, selected by DATABASE_URL — alembic/env.py).

This module provides the same two-backend story: the store classes are
written once against a small :class:`Dialect` strategy (connection factory,
parameter style, scalar-max spelling, script execution) and instantiated as
``Sqlite{Jobs,Metrics,Checkpoint}Store`` (single-host multi-writer, the
default) or ``Postgres{Jobs,Metrics,Checkpoint}Store`` (multi-host; driver
import-gated — psycopg/psycopg2 — or any injected DB-API connection
factory). All expose the exact API of the parquet stores
(``control.JobsStore`` / ``control.MetricsStore`` /
``streaming.incremental.CheckpointStore``), so ``incremental_job`` and the
CLI run against any backend. Writes go through short transactions (SQLite:
BEGIN IMMEDIATE so concurrent writers serialize; Postgres: MVCC); reads
materialize into Spark DataFrames with the same schemas the parquet stores
use, so every downstream query function (``job_state_counts``,
``metrics_trend`` …) is backend-agnostic.

The control tables are control-plane-sized (one row per job×symbol×day or
metric point) — never data-plane volume — so a driver-side DB is the right
tool, exactly as in the reference; a 1000-executor deployment points the
Postgres dialect at its server.

Canonical SQL is written with ``?`` placeholders and a ``{MAX2}`` macro for
the two-argument scalar max (SQLite ``MAX(a,b)``, Postgres
``GREATEST(a,b)``); dialects translate. No other statement differs.
"""

from __future__ import annotations

import datetime as dt
import os
import re
import sqlite3
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .control import _CAN, _TARGET, job_state_counts, metrics_average, metrics_history, metrics_trend
from .schema import METRICS_SCHEMA

# ---------------------------------------------------------------------------
# migrations (reference migrations/__init__.py:16-100, embedded rather than
# sibling .sql files so the package stays single-directory). The DDL below
# is the portable intersection of the reference's sqlite and postgres
# variants (001_core_schema.sql / 005_ingestion_jobs_sqlite.sql).

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
    bars_processed BIGINT,
    UNIQUE(job_id, symbol, day)
);
CREATE TABLE IF NOT EXISTS metrics (
    ts BIGINT NOT NULL,
    name TEXT NOT NULL,
    value DOUBLE PRECISION NOT NULL
);
CREATE TABLE IF NOT EXISTS checkpoints (
    job_id TEXT NOT NULL,
    symbol TEXT NOT NULL,
    last_processed_ns BIGINT NOT NULL,
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

#: Reverse scripts, one per version (reference alembic ``downgrade()``
#: functions; both dialects support ALTER TABLE DROP COLUMN — SQLite since
#: 3.35). Downgrading is destructive by nature: 002's columns are dropped
#: with their data, 001 removes the control tables entirely.
DOWNGRADES: dict[str, str] = {
    "002": """
ALTER TABLE metrics DROP COLUMN provider;
ALTER TABLE metrics DROP COLUMN feed;
""",
    "001": """
DROP INDEX IF EXISTS idx_jobs_job;
DROP INDEX IF EXISTS idx_metrics_ts_name;
DROP INDEX IF EXISTS idx_metrics_name;
DROP TABLE IF EXISTS ingestion_jobs;
DROP TABLE IF EXISTS metrics;
DROP TABLE IF EXISTS checkpoints;
""",
}


# ---------------------------------------------------------------------------
# dialects

class SqliteDialect:
    """File-backed SQLite: ``?`` placeholders, BEGIN IMMEDIATE write lock."""

    name = "sqlite"

    def __init__(self, db_path: str | os.PathLike):
        self.db_path = os.fspath(db_path)
        parent = os.path.dirname(self.db_path)
        if parent:
            os.makedirs(parent, exist_ok=True)

    def connect(self):
        return sqlite3.connect(self.db_path, timeout=30.0)

    def sql(self, q: str) -> str:
        return q.replace("{MAX2}", "MAX")

    def begin_write(self, con) -> None:
        # Takes the write lock up front so concurrent writers serialize
        # instead of failing mid-transaction.
        con.execute("BEGIN IMMEDIATE")

    def executescript(self, con, script: str) -> None:
        # NOT sqlite3's Connection.executescript: that API commits the open
        # transaction first and runs in autocommit, so a mid-script failure
        # leaves earlier statements applied with no schema_version row —
        # permanently wedging the migration runner ("duplicate column" on
        # every retry). And Python's implicit-transaction rule covers DML
        # only — DDL outside an open transaction autocommits — so an
        # explicit BEGIN is required for the per-version rollback guarantee
        # (SQLite DDL is transactional once inside one).
        cur = con.cursor()
        if not con.in_transaction:
            cur.execute("BEGIN")
        for stmt in script.split(";"):
            if stmt.strip():
                cur.execute(stmt)


#: Postgres DSN shapes: libpq URLs plus SQLAlchemy-style driver-qualified
#: forms (postgresql+psycopg2://...) — the reference's DATABASE_URL
#: convention produces both.
_PG_DSN_RE = re.compile(r"^postgres(ql)?(\+\w+)?://")


def is_postgres_dsn(db: str) -> bool:
    """True for any postgres-flavored URL (mis-sniffing one as a SQLite
    file path would mkdir a junk 'postgresql+psycopg2:' directory and
    silently serve an empty database)."""
    return bool(_PG_DSN_RE.match(db))


def normalize_pg_dsn(dsn: str) -> str:
    """Strip the SQLAlchemy ``+driver`` qualifier — psycopg wants plain
    ``postgresql://``."""
    return _PG_DSN_RE.sub("postgresql://", dsn)


class PostgresDialect:
    """Server Postgres: ``%s`` placeholders, MVCC transactions, GREATEST.

    ``dsn`` is a libpq connection string / URL handed to psycopg (v3) or
    psycopg2, whichever is importable — both are import-gated since neither
    ships in minimal deployments. ``connect_factory`` injects any DB-API
    connection source instead (a pool, a test substitute), mirroring how the
    reference's repositories take an engine/session rather than building
    their own (reference: postgres_domain.py repository constructors).
    """

    name = "postgres"

    def __init__(self, dsn: str | None = None, connect_factory=None):
        if dsn is None and connect_factory is None:
            raise ValueError("PostgresDialect needs a dsn or a connect_factory")
        self.dsn = normalize_pg_dsn(dsn) if dsn is not None else None
        self._factory = connect_factory

    def connect(self):
        if self._factory is not None:
            return self._factory()
        try:
            import psycopg  # type: ignore[import-not-found]

            return psycopg.connect(self.dsn)
        except ImportError:
            try:
                import psycopg2  # type: ignore[import-not-found]

                return psycopg2.connect(self.dsn)
            except ImportError as e:
                raise ImportError(
                    "Postgres backend needs psycopg (v3) or psycopg2 installed, "
                    "or pass connect_factory="
                ) from e

    def sql(self, q: str) -> str:
        return q.replace("?", "%s").replace("{MAX2}", "GREATEST")

    def begin_write(self, con) -> None:
        pass  # DB-API transactions are implicit; commit/rollback by caller

    def executescript(self, con, script: str) -> None:
        cur = con.cursor()
        for stmt in script.split(";"):
            if stmt.strip():
                cur.execute(stmt)


def apply_pending_dialect(dialect) -> list[str]:
    """Apply unapplied migrations in version order, one transaction each,
    tracked in ``schema_version`` (reference apply_pending semantics:
    idempotent, rollback-per-version on failure). Returns applied versions."""
    applied: list[str] = []
    con = dialect.connect()
    try:
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE IF NOT EXISTS schema_version ("
            "version TEXT PRIMARY KEY, applied_at TIMESTAMP NOT NULL)"
        )
        con.commit()
        cur.execute("SELECT version FROM schema_version")
        done = {r[0] for r in cur.fetchall()}
        for version in sorted(MIGRATIONS):
            if version in done:
                continue
            try:
                dialect.executescript(con, MIGRATIONS[version])
                cur = con.cursor()
                cur.execute(
                    dialect.sql(
                        "INSERT INTO schema_version(version, applied_at) VALUES (?, ?)"
                    ),
                    (version, dt.datetime.now(dt.timezone.utc).isoformat()),
                )
                con.commit()
                applied.append(version)
            except Exception as e:
                con.rollback()
                raise RuntimeError(f"migration {version} failed: {e}") from e
    finally:
        con.close()
    return applied


def apply_pending(db_path: str | os.PathLike) -> list[str]:
    """SQLite convenience wrapper (the historical API)."""
    return apply_pending_dialect(SqliteDialect(db_path))


def downgrade_to_dialect(dialect, target: str) -> list[str]:
    """Revert applied migrations ABOVE ``target`` in reverse order, one
    transaction each (reference alembic ``downgrade`` semantics). ``target``
    of ``"000"`` (or any version below the first) reverts everything.
    Returns the reverted versions, newest first.
    """
    if target != "000" and target not in MIGRATIONS:
        raise ValueError(f"unknown target version: {target!r}")
    reverted: list[str] = []
    con = dialect.connect()
    try:
        cur = con.cursor()
        try:
            cur.execute("SELECT version FROM schema_version")
        except Exception:
            con.rollback()
            return []  # never migrated -> nothing to revert
        done = sorted((r[0] for r in cur.fetchall()), reverse=True)
        for version in done:
            if version <= target:
                continue
            if version not in DOWNGRADES:
                raise RuntimeError(f"no downgrade script for version {version}")
            try:
                dialect.executescript(con, DOWNGRADES[version])
                cur = con.cursor()
                cur.execute(
                    dialect.sql("DELETE FROM schema_version WHERE version = ?"),
                    (version,),
                )
                con.commit()
                reverted.append(version)
            except Exception as e:
                con.rollback()
                raise RuntimeError(f"downgrade {version} failed: {e}") from e
    finally:
        con.close()
    return reverted


def downgrade_to(db_path: str | os.PathLike, target: str) -> list[str]:
    """SQLite convenience wrapper for :func:`downgrade_to_dialect`."""
    return downgrade_to_dialect(SqliteDialect(db_path), target)


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


class _SqlBase:
    def __init__(self, spark: SparkSession, dialect):
        self.spark = spark
        self.dialect = dialect
        apply_pending_dialect(dialect)

    @contextmanager
    def _tx(self):
        """Short write transaction (SQLite: IMMEDIATE lock; Postgres: MVCC).

        Yields a cursor-like executor with dialect-translated SQL."""
        con = self.dialect.connect()
        try:
            self.dialect.begin_write(con)
            yield _Executor(con.cursor(), self.dialect)
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    def _read(self, sql: str, params: tuple = ()) -> list[tuple]:
        con = self.dialect.connect()
        try:
            cur = con.cursor()
            cur.execute(self.dialect.sql(sql), params)
            return cur.fetchall()
        finally:
            con.close()


class _Executor:
    """Thin cursor wrapper translating canonical SQL per dialect."""

    def __init__(self, cur, dialect):
        self._cur = cur
        self._dialect = dialect

    def execute(self, sql: str, params: tuple = ()):
        self._cur.execute(self._dialect.sql(sql), params)
        return self._cur

    def executemany(self, sql: str, seq) -> None:
        self._cur.executemany(self._dialect.sql(sql), seq)


def _parse_ts(v) -> dt.datetime | None:
    if v is None or isinstance(v, dt.datetime):
        return v
    return dt.datetime.fromisoformat(v)


def _parse_day(v) -> dt.date:
    if isinstance(v, dt.datetime):
        return v.date()
    if isinstance(v, dt.date):
        return v
    return dt.date.fromisoformat(v)


def _day_param(d: dt.date) -> str:
    return d.isoformat()


# ---------------------------------------------------------------------------
# jobs (reference sqlite_domain.py / postgres_domain.py ingestion-job
# repositories + the state machine guards in ingestion/domain/entities.py:
# 254-335)

class _JobsStoreSql(_SqlBase):
    """API-compatible with ``control.JobsStore`` — same methods, same
    DataFrame schema, SQL rows underneath."""

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
        with self._tx() as x:
            n = x.execute(
                "SELECT COUNT(*) FROM ingestion_jobs WHERE job_id = ?", (job_id,)
            ).fetchone()[0]
            if n:
                raise ValueError(f"job {job_id!r} already exists")
            x.executemany(
                "INSERT INTO ingestion_jobs (job_id, symbol, day, state, created_at, updated_at)"
                " VALUES (?, ?, ?, 'pending', ?, ?)",
                [(job_id, s, _day_param(d), now, now) for s, d in symbol_days],
            )

    def _transition(self, job_id: str, verb: str, error: str | None = None,
                    bars: dict[tuple[str, dt.date], int] | None = None) -> None:
        target = _TARGET[verb]
        with self._tx() as x:
            mine = x.execute(
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
                x.execute(
                    "UPDATE ingestion_jobs SET state = ?, updated_at = ?, error_message = ?,"
                    " bars_processed = ? WHERE job_id = ? AND symbol = ? AND day = ?",
                    (target, now, error if verb == "fail" else None,
                     n if n is not None else b, job_id, s,
                     _day_param(_parse_day(d))),
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
# metrics (reference metrics.py SQLite repository:131-255; postgres mirror)

class _MetricsStoreSql(_SqlBase):
    """API-compatible with ``control.MetricsStore``; ``record`` is a single
    INSERT (the reference's exact write path) instead of a parquet append."""

    def load(self) -> DataFrame:
        rows = self._read("SELECT ts, name, value, provider, feed FROM metrics")
        return self.spark.createDataFrame(rows, METRICS_SCHEMA)

    def record(self, name: str, value: float, provider: str = "unknown",
               feed: str = "unknown", ts: int | None = None) -> None:
        ts = int(time.time()) if ts is None else int(ts)
        with self._tx() as x:
            x.execute(
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

class _CheckpointStoreSql(_SqlBase):
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
        with self._tx() as x:
            x.executemany(
                "INSERT INTO checkpoints (job_id, symbol, last_processed_ns, updated_at)"
                " VALUES (?, ?, ?, ?)"
                " ON CONFLICT(job_id, symbol) DO UPDATE SET"
                "   last_processed_ns = {MAX2}(checkpoints.last_processed_ns, excluded.last_processed_ns),"
                "   updated_at = excluded.updated_at",
                [(job_id, s, int(ns), now) for s, ns in positions.items()],
            )


# ---------------------------------------------------------------------------
# public backends

class SqliteJobsStore(_JobsStoreSql):
    def __init__(self, spark: SparkSession, db_path: str):
        super().__init__(spark, SqliteDialect(db_path))
        self.db_path = os.fspath(db_path)


class SqliteMetricsStore(_MetricsStoreSql):
    def __init__(self, spark: SparkSession, db_path: str):
        super().__init__(spark, SqliteDialect(db_path))
        self.db_path = os.fspath(db_path)


class SqliteCheckpointStore(_CheckpointStoreSql):
    def __init__(self, spark: SparkSession, db_path: str):
        super().__init__(spark, SqliteDialect(db_path))
        self.db_path = os.fspath(db_path)


class PostgresJobsStore(_JobsStoreSql):
    def __init__(self, spark: SparkSession, dsn: str | None = None, connect_factory=None):
        super().__init__(spark, PostgresDialect(dsn, connect_factory))


class PostgresMetricsStore(_MetricsStoreSql):
    def __init__(self, spark: SparkSession, dsn: str | None = None, connect_factory=None):
        super().__init__(spark, PostgresDialect(dsn, connect_factory))


class PostgresCheckpointStore(_CheckpointStoreSql):
    def __init__(self, spark: SparkSession, dsn: str | None = None, connect_factory=None):
        super().__init__(spark, PostgresDialect(dsn, connect_factory))
