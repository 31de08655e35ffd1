"""Chaos / boundary end-to-end scenarios.

Port of the reference's resilience test strategy
(reference: tests/integration/test_chaos_resilience_e2e.py and
test_boundary_conditions_e2e.py) to the Spark pipeline: corrupt files in
one lake partition, provider failure mid-multi-symbol job with checkpoint
resume, partial-write recovery (raw landed, aggregates did not), and the
boundary inputs — empty, single-bar, all-duplicate, extreme prices,
temporal edges (year boundary / leap day / DST change).

Each scenario asserts a CONCRETE end state (exact lake contents or exact
parity with a never-failed run), not just "no crash".
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from marketpipe_spark.lake import read_bars, upsert_bars, write_bars
from marketpipe_spark.operators.resample import resample
from marketpipe_spark.operators.validation import split_valid, validate_bars
from marketpipe_spark.streaming.incremental import CheckpointStore, incremental_job

NS_MIN = 60_000_000_000
DAY1 = 1_704_153_600_000_000_000  # 2024-01-02 00:00 UTC
BARS_DDL = (
    "symbol string, ts_ns long, open double, high double, low double, "
    "close double, volume long"
)


def _bars(spark, symbol, start_ns, n, base=100.0, step_ns=NS_MIN):
    rows = [
        (symbol, start_ns + i * step_ns, base + i, base + i + 1.0, base + i - 1.0,
         base + i + 0.5, 10 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, BARS_DDL)


def _lake_state(spark, root, frame="1m"):
    df = read_bars(spark, root, frame=frame)
    return sorted(
        (r.symbol, r.ts_ns, r.open, r.high, r.low, r.close, r.volume)
        for r in df.select("symbol", "ts_ns", "open", "high", "low", "close", "volume").collect()
    )


# ---------------------------------------------------------------------------
# 1. Corrupt parquet in one partition: failure isolation + explicit degrade
# ---------------------------------------------------------------------------

def test_corrupt_partition_fails_loud_and_degrades_explicitly(spark, tmp_path):
    root = str(tmp_path / "lake")
    write_bars(_bars(spark, "AAPL", DAY1, 30), root, "1m")
    write_bars(_bars(spark, "MSFT", DAY1, 30, base=200.0), root, "1m")

    # smash every data file in MSFT's partition with garbage bytes
    victims = glob.glob(f"{root}/frame=1m/symbol=MSFT/**/*.parquet", recursive=True)
    assert victims, "expected MSFT parquet files to corrupt"
    for v in victims:
        with open(v, "wb") as f:
            f.write(b"not a parquet file at all")

    # default posture: corruption is an ERROR, never silent data loss
    with pytest.raises(Exception):
        read_bars(spark, root, frame="1m").count()

    # partition pruning isolates the fault: untouched symbols stay queryable
    clean = read_bars(spark, root, frame="1m", symbols=["AAPL"])
    assert clean.count() == 30

    # explicit opt-in degrade: skip corrupt files, keep the healthy partition
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        surv = read_bars(spark, root, frame="1m")
        got = {r.symbol for r in surv.select("symbol").distinct().collect()}
        assert got == {"AAPL"}
        assert surv.count() == 30
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


# ---------------------------------------------------------------------------
# 2. Provider failure mid-multi-symbol fetch: per-symbol isolation
# ---------------------------------------------------------------------------

def test_provider_failure_isolated_per_symbol(spark, tmp_path):
    from marketpipe_spark.sources.httpclient import (
        ClientConfig, FakeTransport, PolygonClient, RetryLimitExceeded,
    )

    def bar_payload(i):
        return {
            "t": (DAY1 + i * NS_MIN) // 1_000_000,
            "o": 100.0, "h": 101.0, "l": 99.0, "c": 100.5, "v": 1000,
        }

    cfg = ClientConfig(base_url="https://x.test", max_retries=2, backoff_base=0.0)
    ok = {"results": [bar_payload(i) for i in range(3)]}

    # AAPL succeeds (the replay transport serves the page twice: fetch_batch
    # + fetch_bars_df below); MSFT's transport 500s past the retry budget
    good = PolygonClient(
        cfg, transport=FakeTransport([(200, ok, {})] * 2), sleeper=lambda s: None
    )
    bad = PolygonClient(
        cfg, transport=FakeTransport([(500, {}, {})] * 8), sleeper=lambda s: None
    )
    got = good.fetch_batch("AAPL", DAY1, DAY1 + 10 * NS_MIN)
    assert len(got) == 3
    with pytest.raises(RetryLimitExceeded):
        bad.fetch_batch("MSFT", DAY1, DAY1 + 10 * NS_MIN)
    # the failed symbol left nothing half-written; the good one is intact
    df = good.fetch_bars_df(spark, "AAPL", DAY1, DAY1 + 10 * NS_MIN)
    assert df.count() == 3 and df.filter(F.col("symbol") != "AAPL").count() == 0


# ---------------------------------------------------------------------------
# 3. Mid-job crash after raw landed, before aggregates: resume == clean run
# ---------------------------------------------------------------------------

def test_partial_write_resume_equals_clean_run(spark, tmp_path):
    bars = _bars(spark, "AAPL", DAY1, 20).union(_bars(spark, "MSFT", DAY1, 20, base=50.0))

    # reference run: the same increment with no failure, separate roots
    ref_raw, ref_agg = str(tmp_path / "ref_raw"), str(tmp_path / "ref_agg")
    ref_cps = CheckpointStore(spark, str(tmp_path / "ref_cps"))
    incremental_job(spark, "job-1", bars, ref_raw, ref_agg, ref_cps, frames=["5m"])

    # chaos run: crash AFTER raw upsert, BEFORE aggregation (frames resample
    # raises on an unknown frame) — the reference's "partial write" window
    raw, agg = str(tmp_path / "raw"), str(tmp_path / "agg")
    cps = CheckpointStore(spark, str(tmp_path / "cps"))
    with pytest.raises(Exception):
        incremental_job(spark, "job-1", bars, raw, agg, cps, frames=["bogus"])
    # crash window verified: raw landed, checkpoint did NOT advance
    assert _lake_state(spark, raw) == _lake_state(spark, ref_raw)
    assert cps.last_processed("job-1", "AAPL") is None

    # retry the SAME increment; keep-last upsert makes the raw leg idempotent
    incremental_job(spark, "job-1", bars, raw, agg, cps, frames=["5m"])
    assert _lake_state(spark, raw) == _lake_state(spark, ref_raw)
    assert _lake_state(spark, agg, frame="5m") == _lake_state(spark, ref_agg, frame="5m")
    assert cps.last_processed("job-1", "AAPL") == DAY1 + 19 * NS_MIN


# ---------------------------------------------------------------------------
# 4. Checkpoint resume across a provider outage for ONE symbol of a job
# ---------------------------------------------------------------------------

def test_per_symbol_outage_then_backfill_matches_one_shot(spark, tmp_path):
    full_a = _bars(spark, "AAPL", DAY1, 10)
    full_b = _bars(spark, "MSFT", DAY1, 10, base=50.0)

    ref_raw, ref_agg = str(tmp_path / "ref_raw"), str(tmp_path / "ref_agg")
    ref_cps = CheckpointStore(spark, str(tmp_path / "ref_cps"))
    incremental_job(spark, "j", full_a.union(full_b), ref_raw, ref_agg, ref_cps, frames=["5m"])

    # outage run: MSFT's provider died mid-job — only half its bars arrived
    raw, agg = str(tmp_path / "raw"), str(tmp_path / "agg")
    cps = CheckpointStore(spark, str(tmp_path / "cps"))
    incremental_job(spark, "j", full_a.union(full_b.limit(5)), raw, agg, cps, frames=["5m"])
    assert cps.last_processed("j", "MSFT") == DAY1 + 4 * NS_MIN

    # recovery increment re-sends EVERYTHING (provider replay); the
    # checkpoint filter must drop the already-landed prefix per symbol
    incremental_job(spark, "j", full_a.union(full_b), raw, agg, cps, frames=["5m"])
    assert _lake_state(spark, raw) == _lake_state(spark, ref_raw)
    assert _lake_state(spark, agg, frame="5m") == _lake_state(spark, ref_agg, frame="5m")


# ---------------------------------------------------------------------------
# 5. Boundary inputs: empty, single bar, all-duplicate
# ---------------------------------------------------------------------------

def test_empty_single_and_all_duplicate_inputs(spark, tmp_path):
    raw, agg = str(tmp_path / "raw"), str(tmp_path / "agg")
    cps = CheckpointStore(spark, str(tmp_path / "cps"))

    # empty increment: completes, writes nothing, advances nothing
    empty = spark.createDataFrame([], BARS_DDL)
    out = incremental_job(spark, "j0", empty, raw, agg, cps, frames=["5m"])
    assert out["errors"].count() == 0 and out["5m"].count() == 0
    assert not os.path.exists(os.path.join(raw, "frame=1m"))

    # single bar: every frame yields exactly that bar's aggregate
    one = _bars(spark, "MIN", DAY1, 1)
    out = incremental_job(spark, "j1", one, raw, agg, cps, frames=["5m", "1h", "1d"])
    for frame in ("5m", "1h", "1d"):
        rows = out[frame].collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.open, r.high, r.low, r.close, r.volume) == (100.0, 101.0, 99.0, 100.5, 10)

    # all-duplicate timestamps: rule 1 flags every copy after the first,
    # and split_valid quarantines ALL rows sharing the bad (symbol, ts_ns)
    # key — so nothing lands and the report carries the evidence
    dup = spark.createDataFrame(
        [("DUP", DAY1, 1.0, 2.0, 0.5, 1.5, 5)] * 4, BARS_DDL
    )
    out = incremental_job(spark, "j2", dup, raw, agg, cps, frames=["5m"])
    assert out["5m"].count() == 0
    errs = out["errors"]
    assert errs.count() == 3
    assert errs.filter(F.col("reason") == "non_monotonic_timestamp").count() == 3
    assert read_bars(spark, raw, frame="1m", symbols=["DUP"]).count() == 0


# ---------------------------------------------------------------------------
# 6. Extreme prices: penny-stock floats, huge values, zero volume
# ---------------------------------------------------------------------------

def test_extreme_price_pipeline(spark, tmp_path):
    rows = [
        ("EXT", DAY1 + 0 * NS_MIN, 1e-6, 2e-6, 5e-7, 1e-6, 0),      # micro + zero vol
        ("EXT", DAY1 + 1 * NS_MIN, 1e6, 1.5e6, 9e5, 1.2e6, 2**40),  # huge
        ("EXT", DAY1 + 2 * NS_MIN, 1e-6, 1.5e6, 1e-7, 42.0, 1),     # absurd range
    ]
    bars = spark.createDataFrame(rows, BARS_DDL)
    # structurally legal (positive prices, OHLC order) but each bar trips
    # the PLAUSIBILITY rules — exactly the reference's posture on extreme
    # data: flag it, never crash on it
    reasons = {r.reason for r in validate_bars(bars, market_hours=False).collect()}
    assert reasons == {"price_out_of_range", "extreme_price_movement", "volume_above_cap"}
    # and the numeric path itself must stay exact on the full double range
    out = resample(bars, "5m").collect()
    assert len(out) == 1
    r = out[0]
    assert r.open == 1e-6 and r.close == 42.0
    assert r.high == 1.5e6 and r.low == 1e-7
    assert r.volume == 2**40 + 1  # int64 arithmetic, no float rounding

    # negative / zero price IS a structural violation and must be caught
    bad = spark.createDataFrame([("EXT", DAY1, -1.0, 1.0, -2.0, 0.5, 5)], BARS_DDL)
    assert validate_bars(bad, market_hours=False).count() > 0


# ---------------------------------------------------------------------------
# 7. Temporal boundaries: year edge, leap day, DST change (UTC invariance)
# ---------------------------------------------------------------------------

def test_temporal_boundaries_partition_and_resample(spark, tmp_path):
    import datetime as dt

    def ns(y, mo, d, h, mi):
        return int(dt.datetime(y, mo, d, h, mi, tzinfo=dt.timezone.utc).timestamp()) * 10**9

    rows = [
        ("T", ns(2023, 12, 31, 23, 59), 1.0, 2.0, 0.5, 1.5, 1),  # year end
        ("T", ns(2024, 1, 1, 0, 0), 1.0, 2.0, 0.5, 1.5, 1),      # year start
        ("T", ns(2024, 2, 29, 12, 0), 1.0, 2.0, 0.5, 1.5, 1),    # leap day
        ("T", ns(2024, 3, 10, 7, 0), 1.0, 2.0, 0.5, 1.5, 1),     # US DST jump
    ]
    bars = spark.createDataFrame(rows, BARS_DDL)
    root = str(tmp_path / "lake")
    write_bars(bars, root, "1m")
    back = read_bars(spark, root, frame="1m")
    dates = {str(r.date) for r in back.select("date").distinct().collect()}
    # UTC partitioning: the 23:59 bar lands on Dec 31, not Jan 1
    assert dates == {"2023-12-31", "2024-01-01", "2024-02-29", "2024-03-10"}

    # daily resample stays calendar-exact across all three edges
    daily = {r.ts_ns: r.volume for r in resample(bars, "1d").collect()}
    assert len(daily) == 4

    # ns-range pruning honors the year boundary exactly
    jan = read_bars(
        spark, root, frame="1m",
        start_ns=ns(2024, 1, 1, 0, 0), end_ns=ns(2024, 1, 1, 23, 59),
    )
    assert jan.count() == 1


# ---------------------------------------------------------------------------
# 8. Cascading-failure prevention: a poisoned increment cannot take down
#    previously landed data, and the job ledger records the failure
# ---------------------------------------------------------------------------

def test_failed_increment_leaves_prior_state_intact(spark, tmp_path):
    from marketpipe_spark.control import JobsStore

    raw, agg = str(tmp_path / "raw"), str(tmp_path / "agg")
    cps = CheckpointStore(spark, str(tmp_path / "cps"))
    jobs = JobsStore(spark, str(tmp_path / "jobs"))

    good = _bars(spark, "AAPL", DAY1, 10)
    incremental_job(spark, "inc-1", good, raw, agg, cps, frames=["5m"], jobs=jobs)
    before = _lake_state(spark, raw)

    nxt = _bars(spark, "AAPL", DAY1 + 10 * NS_MIN, 10)
    with pytest.raises(Exception):
        incremental_job(spark, "inc-2", nxt, raw, agg, cps, frames=["bogus"], jobs=jobs)

    # prior increment untouched; ledger has inc-1 completed and inc-2 failed
    assert [x for x in _lake_state(spark, raw) if x[1] < DAY1 + 10 * NS_MIN] == before
    states = {(r.job_id, r.state) for r in jobs.load().collect()}
    assert states == {("inc-1", "completed"), ("inc-2", "failed")}
    # and the failed job's checkpoint never advanced past the crash
    assert cps.last_processed("inc-2", "AAPL") is None
