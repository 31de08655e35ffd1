"""Prebuilt-plan cache (serving mode): identity, invalidation, parity.

FLOOR_EXPERIMENT.json measured plan REBUILD at ~15% of the sequential bench
wall; serving deployments build each registry plan once and execute it many
times. These tests pin the contract that makes that safe: a cache hit is the
SAME analyzed plan, a conf change or refresh=True rebuilds, and a cached
plan's results are hash-identical to a fresh build's.
"""

from __future__ import annotations

import hashlib

from marketpipe_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _value_hash(df) -> str:
    """Order-insensitive value hash over column-name-sorted rows (the
    driver's compare, reimplemented small)."""
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def test_cache_hit_returns_same_plan_object(spark):
    registry.clear_plan_cache()
    a = registry.prebuilt(spark, "vwap", SF)
    b = registry.prebuilt(spark, "vwap", SF)
    assert a is b


def test_conf_change_invalidates(spark):
    registry.clear_plan_cache()
    a = registry.prebuilt(spark, "vwap", SF)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(old) + 1))
        b = registry.prebuilt(spark, "vwap", SF)
        assert a is not b
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # Restoring the fingerprint does NOT resurrect the stale entry — the
    # cache holds the latest build only.
    c = registry.prebuilt(spark, "vwap", SF)
    assert c is not a
    assert registry.prebuilt(spark, "vwap", SF) is c


def test_refresh_forces_rebuild(spark):
    registry.clear_plan_cache()
    a = registry.prebuilt(spark, "daily_summary", SF)
    b = registry.prebuilt(spark, "daily_summary", SF, refresh=True)
    assert a is not b
    assert registry.prebuilt(spark, "daily_summary", SF) is b


def test_cached_vs_fresh_hash_identity(spark):
    """A served (cached) plan and a from-scratch build produce identical
    results — one entry per major plan family, including a snapshot-fixture
    entry (eager external state) and a window entry."""
    registry.clear_plan_cache()
    qs = registry.all_queries()
    for name in ("vwap", "sma_20", "snapshot_diff", "dedup_keep_last"):
        cached = _value_hash(registry.prebuilt(spark, name, SF))
        fresh = _value_hash(qs[name].fn(spark, SF))
        assert cached == fresh, name


def test_warm_plans_reports_per_entry_build_time(spark):
    registry.clear_plan_cache()
    names = ["vwap", "daily_summary"]
    timings = registry.warm_plans(spark, names, SF)
    assert set(timings) == set(names)
    assert all(t >= 0 for t in timings.values())
    # Warmed entries now hit the cache.
    assert registry.prebuilt(spark, "vwap", SF) is registry.prebuilt(
        spark, "vwap", SF
    )


def test_serve_subcommand_wired():
    from marketpipe_spark.cli import build_parser

    args = build_parser().parse_args(
        ["serve", "--sf-dir", "/tmp/x", "--threads", "4", "--warm", "vwap"]
    )
    assert args.fn.__name__ == "cmd_serve"
    assert args.warm == ["vwap"] and args.threads == 4


def test_stale_session_entries_purged_on_collision(spark):
    """A replaced session's cache entries are evicted wholesale the first
    time a key collision reveals them, and entries whose session was
    GC'd are swept on ANY call — a long-lived serve process must not pin
    dead sessions and their py4j-backed plans forever."""
    import weakref

    class Ghost:  # stands in for a stopped SparkSession
        pass

    registry.clear_plan_cache()
    ghost = Ghost()  # still referenced: collision purge path
    key = (id(spark), "vwap", SF)  # same key the live session will request
    registry._PLAN_CACHE[key] = (weakref.ref(ghost), (), None)
    registry._PLAN_CACHE[(id(ghost), "daily_summary", SF)] = (
        weakref.ref(ghost), (), None,
    )
    # A GC'd session under an unrelated key: the opportunistic sweep path.
    gone = Ghost()
    registry._PLAN_CACHE[(id(gone), "sma_20", SF)] = (weakref.ref(gone), (), None)
    del gone
    df = registry.prebuilt(spark, "vwap", SF)
    assert df is not None
    # Every ghost-pinned AND every dead-session entry is gone.
    assert all(e[0]() is spark for e in registry._PLAN_CACHE.values())
    assert len(registry._PLAN_CACHE) == 1


def test_serve_streams_responses_before_stdin_eof(spark, monkeypatch):
    """cmd_serve must emit each response as the query completes — a
    long-lived client piping requests sees results live, not only after it
    closes its input (r9 ADVICE medium)."""
    import sys
    import threading
    from types import SimpleNamespace

    from marketpipe_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    responded = threading.Event()

    class OutWrap:
        def __init__(self, inner):
            self.inner = inner

        def write(self, s):
            self.inner.write(s)
            if s.strip():
                responded.set()

        def flush(self):
            self.inner.flush()

    class FakeStdin:
        def __iter__(self):
            yield "vwap\n"
            # Block EOF until the first response has been printed. Under the
            # old drain-at-EOF implementation this times out and fails.
            assert responded.wait(120), "no response printed before stdin EOF"

    monkeypatch.setattr(sys, "stdin", FakeStdin())
    monkeypatch.setattr(sys, "stdout", OutWrap(sys.stdout))
    args = SimpleNamespace(warm=None, sf_dir=SF, threads=2)
    assert cli.cmd_serve(args) == 0
    assert responded.is_set()


def test_plan_builders_run_no_eager_jobs(spark, monkeypatch):
    """Building ranksum_returns / embedding_near_dup_lsh must not run a
    Spark job (the r8 verdict nit: eager .count() inside the builder ran a
    full scan+aggregate per invocation; totals now attach via scalar_join /
    parquet footer metadata).

    Built with pins DISABLED (``MP_PIN_MODE=off``): under AQE a shared-
    intermediate ``localCheckpoint`` pin executes its upstream stages at
    plan-build time (AdaptiveSparkPlanExec finalizes the plan to hand back
    an RDD), which is legitimate, timed query work — not the redundant
    eager-scan regression this test guards against. With pins off, any
    job at build is a real eager-count bug again."""
    monkeypatch.setenv("MP_PIN_MODE", "off")
    qs = registry.all_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in ("ranksum_returns", "embedding_near_dup_lsh"):
        qs[name].fn(spark, SF)  # warm: first parquet open may list files
        before = len(tracker.getJobIdsForGroup(None) or [])
        qs[name].fn(spark, SF)  # build only — no action
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before, f"{name} ran {after - before} eager job(s) at build"
