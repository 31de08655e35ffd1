"""End-to-end pipeline roundtrip (reference SURVEY §7.1 minimum slice):
fake bars → partitioned lake → resample → agg lake → views → SQL → loader."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from marketpipe_spark.lake import age_to_cutoff, read_bars, upsert_bars, write_bars
from marketpipe_spark.loader import load_ohlcv
from marketpipe_spark.operators.resample import resample
from marketpipe_spark.plans.views import ensure_views, query, render
from marketpipe_spark.sources.fake import fake_bars

DAY_NS = 86_400 * 10**9
START = 1_704_067_200_000_000_000  # 2024-01-01 00:00 UTC


@pytest.fixture(scope="module")
def lake_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("lake"))


def test_full_roundtrip(spark, lake_root):
    bars = fake_bars(spark, ["AAPL", "MSFT"], START, 120)
    write_bars(bars, f"{lake_root}/raw", "1m", ingest_id="job1")

    raw = read_bars(spark, f"{lake_root}/raw", frame="1m")
    assert raw.count() == 240
    # partition columns materialized by the hive layout
    assert {"frame", "symbol", "date"} <= set(raw.columns)

    five = resample(raw.select("symbol", "ts_ns", "open", "high", "low", "close", "volume"), "5m")
    write_bars(five, f"{lake_root}/agg", "5m")

    views = ensure_views(spark, f"{lake_root}/agg", frames=("5m", "1h"))
    assert views == ["bars_5m", "bars_1h"]
    out = query(spark, "SELECT symbol, count(*) AS n FROM bars_5m GROUP BY symbol ORDER BY symbol")
    rows = out.collect()
    assert [r.symbol for r in rows] == ["AAPL", "MSFT"]
    assert all(r.n == 24 for r in rows)
    # empty-frame fallback view is queryable with typed schema
    assert query(spark, "SELECT * FROM bars_1h").count() == 0
    # K6 rendering
    assert "symbol" in render(out, limit=5)


def test_volume_conservation(spark, lake_root):
    raw = read_bars(spark, f"{lake_root}/raw", frame="1m")
    agg = read_bars(spark, f"{lake_root}/agg", frame="5m")
    v_raw = raw.agg(F.sum("volume")).collect()[0][0]
    v_agg = agg.agg(F.sum("volume")).collect()[0][0]
    assert v_raw == v_agg


def test_loader_api(spark, lake_root):
    df = load_ohlcv(spark, f"{lake_root}/raw", "aapl", "1m")
    assert df.count() == 120
    assert df.select("symbol").distinct().collect()[0][0] == "AAPL"

    sub = load_ohlcv(
        spark,
        f"{lake_root}/raw",
        ["AAPL"],
        "1m",
        start=START + 10 * 60 * 10**9,
        end=START + 19 * 60 * 10**9,
    )
    assert sub.count() == 10  # inclusive BETWEEN

    pdf = load_ohlcv(spark, f"{lake_root}/raw", ["AAPL", "MSFT"], "1m", to_pandas=True)
    assert list(pdf.index.names) == ["timestamp", "symbol"]

    with pytest.raises(ValueError):
        load_ohlcv(spark, f"{lake_root}/raw", "AAPL", "2m")


def test_upsert_keep_last(spark, lake_root):
    root = f"{lake_root}/upsert"
    bars = fake_bars(spark, ["AAPL"], START, 60)
    upsert_bars(bars, root, "1m")  # first write
    # overlapping rewrite: same 30 timestamps, shifted values
    patch = fake_bars(spark, ["AAPL"], START, 30, seed=99)
    upsert_bars(patch, root, "1m")
    out = read_bars(spark, root, frame="1m")
    assert out.count() == 60  # no duplicates on (symbol, ts_ns)
    # patched rows won: values match the seed=99 generation
    patched = {r.ts_ns: r.close for r in patch.collect()}
    got = {r.ts_ns: r.close for r in out.filter(F.col("ts_ns").isin(list(patched))).collect()}
    assert got == patched


def test_age_expressions():
    # reference approximation: month = 30 days, year = 365 days, unit-less =
    # days (cli/prune.py:17-35)
    today = dt.date(2026, 8, 13)
    assert age_to_cutoff("30d", today) == dt.date(2026, 7, 14)
    assert age_to_cutoff("30", today) == dt.date(2026, 7, 14)  # default unit
    assert age_to_cutoff("18m", today) == today - dt.timedelta(days=18 * 30)
    assert age_to_cutoff("5y", today) == today - dt.timedelta(days=5 * 365)
    with pytest.raises(ValueError):
        age_to_cutoff("soon")


def test_upsert_preserves_columns_and_batch_order(spark, lake_root):
    from pyspark.sql import Row

    root = f"{lake_root}/upsert_cols"
    first = fake_bars(spark, ["AAPL"], START, 10)
    upsert_bars(first, root, "1m", ingest_id="job-A")
    # second upsert WITHOUT ingest_id must not erase job-A from old rows
    upsert_bars(fake_bars(spark, ["AAPL"], START + 10 * 60 * 10**9, 5, seed=7), root, "1m")
    out = read_bars(spark, root, frame="1m")
    ids = {r.ts_ns: r.ingest_id for r in out.select("ts_ns", "ingest_id").collect()}
    assert all(ids[r.ts_ns] == "job-A" for r in first.collect())

    # intra-batch duplicate keys: the later row in batch order wins
    # (reference drop_duplicates keep='last', parquet_engine.py:162-164)
    dup = spark.createDataFrame(
        [("AAPL", START, 1.0, 1.0, 1.0, 111.0, 1), ("AAPL", START, 2.0, 2.0, 2.0, 222.0, 2)],
        "symbol string, ts_ns long, open double, high double, low double, close double, volume long",
    ).coalesce(1)
    upsert_bars(dup, root, "1m")
    row = read_bars(spark, root, frame="1m").filter(F.col("ts_ns") == START).collect()
    assert len(row) == 1 and row[0].close == 222.0
