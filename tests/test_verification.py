"""Post-ingest verification service (reference:
ingestion/infrastructure/verification.py:43-265) — one aggregation over the
lake instead of a per-symbol query loop."""

from __future__ import annotations

import datetime as dt

import pytest

from marketpipe_spark.lake import write_bars
from marketpipe_spark.operators.verification import (
    VerificationError,
    render_summary,
    verify_ingestion,
)
from marketpipe_spark.sources.fake import fake_bars

START_NS = 1_704_202_200_000_000_000  # 2024-01-02 14:50 UTC
D = dt.date(2024, 1, 2)


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vlake") / "raw")
    write_bars(fake_bars(spark, ["AAPL", "MSFT"], START_NS, 30), root, "1m")
    return root


def test_verify_passes_for_covered_range(spark, lake):
    s = verify_ingestion(spark, lake, ["aapl", "MSFT"], D, D)
    assert s.all_passed and s.total_bars == 60
    by = {r.symbol: r for r in s.results}
    assert by["AAPL"].actual_start == D and by["AAPL"].actual_end == D
    assert "PASS" in render_summary(s)


def test_verify_fails_for_missing_symbol(spark, lake):
    s = verify_ingestion(spark, lake, ["AAPL", "TSLA"], D, D)
    assert not s.all_passed and s.failed_symbols == ["TSLA"]
    by = {r.symbol: r for r in s.results}
    assert by["TSLA"].total_bars == 0 and "No data found" in by["TSLA"].error_message
    assert by["AAPL"].passed


def test_verify_boundary_tolerance(spark, lake):
    # data covers only Jan 2; requesting through Jan 10 exceeds 1d tolerance
    s = verify_ingestion(spark, lake, ["AAPL"], D, dt.date(2024, 1, 10))
    assert not s.all_passed
    assert "does not reach" in s.results[0].error_message
    # ...but a 1-day overshoot is inside default tolerance
    s2 = verify_ingestion(spark, lake, ["AAPL"], D, dt.date(2024, 1, 3))
    assert s2.all_passed


def test_verify_raise_on_failure(spark, lake):
    with pytest.raises(VerificationError) as ei:
        verify_ingestion(spark, lake, ["NOPE"], D, D, raise_on_failure=True)
    assert ei.value.summary.failed_symbols == ["NOPE"]


def test_verify_empty_root(spark, tmp_path):
    s = verify_ingestion(spark, str(tmp_path / "nothing"), ["AAPL"], D, D)
    assert not s.all_passed


def test_cli_verify_ingest(spark, lake, capsys):
    from marketpipe_spark.cli import main

    rc = main(["verify-ingest", lake, "--symbols", "AAPL,MSFT",
               "--start", "2024-01-02", "--end", "2024-01-02"])
    out = capsys.readouterr().out
    assert rc == 0 and "all symbols verified" in out

    rc = main(["verify-ingest", lake, "--symbols", "AAPL,TSLA",
               "--start", "2024-01-02", "--end", "2024-01-02"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAILED: TSLA" in out


def test_verify_schema_drift_surfaces_error_not_absence(spark, tmp_path):
    """A lake whose files lack the expected columns raises an analysis
    error that must surface as the real message, NOT 'No data found'
    (review fix: every AnalysisException was treated as absence)."""
    root = str(tmp_path / "drifted")
    spark.range(5).selectExpr("id AS wrong_col").write.parquet(f"{root}/frame=1m/symbol=AAPL/date=2024-01-02")
    s = verify_ingestion(spark, root, ["AAPL"], D, D)
    assert not s.all_passed
    msg = s.results[0].error_message or ""
    assert "No data found" not in msg
    assert msg  # the real error text came through
