"""End-to-end symbol pipeline (reference §3.4): dummy provider → SCD-2
master across snapshots with persistence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from marketpipe_spark.sources.symbols import dummy_symbols, run_symbol_pipeline


def test_dummy_provider_shape(spark):
    df = dummy_symbols(spark, 30)
    rows = df.collect()
    assert len(rows) == 30
    assert rows[0].ticker == "SYM0000" and rows[0].figi == "BBG000000"
    assert rows[1].figi is None
    assert {r.exchange_mic for r in rows} == {"XNAS", "XNYS"}


def test_pipeline_two_snapshots(spark, tmp_path):
    root = str(tmp_path / "symbols_master")
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 2, 1)

    out1 = run_symbol_pipeline(spark, dummy_symbols(spark, 50, d1), root, d1)
    assert out1["latest"].count() == 50
    assert out1["master"].count() == 50

    # snapshot 2: 10 companies renamed, 5 new listings
    snap2 = dummy_symbols(spark, 55, d2).withColumn(
        "company_name",
        F.when(
            F.col("ticker").isin([f"SYM{i:04d}" for i in range(10)]),
            F.concat(F.col("company_name"), F.lit(" Inc")),
        ).otherwise(F.col("company_name")),
    )
    out2 = run_symbol_pipeline(spark, snap2, root, d2)
    latest = out2["latest"]
    assert latest.count() == 55
    assert out2["master"].count() == 65  # 50 + 10 closed-out versions' replacements? no: 50 + 10 new versions + 5 inserts
    renamed = latest.filter(F.col("company_name").endswith("Inc"))
    assert renamed.count() == 10
    closed = out2["master"].filter(F.col("valid_to").isNotNull())
    assert closed.count() == 10
    assert closed.select(F.max("valid_to")).collect()[0][0] == d2 - dt.timedelta(days=1)
    # partition layout: year=/month= dirs under the root
    import glob

    assert glob.glob(f"{root}/year=2024/month=1") and glob.glob(f"{root}/year=2024/month=2")


# ---------------------------------------------------------------------------
# provider translations on canned payloads (reference polygon.py:140-217,
# nasdaq_dl.py:107-259 — field maps without network)

def test_polygon_translation(spark):
    from marketpipe_spark.sources.symbols import polygon_symbols

    payload = [
        {"ticker": "aapl", "name": "Apple Inc.", "primary_exchange": "XNAS", "type": "CS",
         "active": True, "currency_name": "usd", "locale": "us", "figi": "BBG000B9XRY4"},
        {"ticker": "SPY", "name": "SPDR S&P 500", "primary_exchange": "ARCX", "type": "ETF",
         "active": True, "currency_name": "usd", "locale": "us", "figi": None},
        {"ticker": "OLD", "name": "Delisted Co", "primary_exchange": "IEX", "type": "ADRC",
         "active": False, "currency_name": None, "locale": None, "figi": None},
        {"ticker": "WEIRD", "name": "Unknown Exchange", "primary_exchange": "xose!", "type": "XXX",
         "active": True, "currency_name": "eur", "locale": "gb", "figi": None},
        {"ticker": "", "name": "No Ticker"},  # dropped (safe_create skip)
    ]
    out = {r.ticker: r for r in polygon_symbols(spark, payload, dt.date(2024, 3, 1)).collect()}
    assert set(out) == {"AAPL", "SPY", "OLD", "WEIRD"}
    assert out["AAPL"].exchange_mic == "XNAS" and out["AAPL"].asset_type == "equity"
    assert out["AAPL"].currency == "USD" and out["AAPL"].country == "US"
    assert out["SPY"].asset_type == "etf"
    assert out["OLD"].status == "delisted" and out["OLD"].exchange_mic == "IEXG"
    assert out["OLD"].currency == "USD"  # null currency_name -> default
    assert out["WEIRD"].exchange_mic == "XOSE"  # unknown code: first-4 upper
    assert out["WEIRD"].asset_type == "equity" and out["WEIRD"].currency == "EUR"


def test_nasdaq_daily_list_translation(spark):
    from marketpipe_spark.sources.symbols import nasdaq_daily_list_symbols

    lines = [
        "Symbol|Security Name|Market Category|Test Issue|Financial Status|Round Lot Size|ETF|NextShares",
        "AAPL|Apple Inc. - Common Stock|Q|N|N|100|N|N",
        "QQQ|Invesco QQQ Trust|G|N|N|100|Y|N",
        "ZTST|Test Security|Q|Y|N|100|N|N",
        "NYCO|NY Co|N|N|N|100|N|N",
        "BLNK|Blank Category Co||N|N|100|N|N",
        "File Creation Time: 20240215",
    ]
    out = {r.ticker: r for r in nasdaq_daily_list_symbols(spark, lines).collect()}
    assert set(out) == {"AAPL", "QQQ", "NYCO", "BLNK"}  # test issue dropped
    assert out["AAPL"].exchange_mic == "XNAS" and out["AAPL"].asset_type == "equity"
    assert out["QQQ"].asset_type == "etf"
    assert out["NYCO"].exchange_mic == "XNYS"
    assert out["BLNK"].exchange_mic == "XNAS"  # blank category default
    assert out["AAPL"].as_of == dt.date(2024, 2, 15)  # footer date parsed

    no_etf = nasdaq_daily_list_symbols(spark, lines, include_etfs=False).collect()
    assert {r.ticker for r in no_etf} == {"AAPL", "NYCO", "BLNK"}


def test_polygon_payload_feeds_scd_pipeline(spark, tmp_path):
    from marketpipe_spark.sources.symbols import polygon_symbols

    payload = [
        {"ticker": "AAPL", "name": "Apple Inc.", "primary_exchange": "XNAS", "type": "CS",
         "active": True, "currency_name": "usd", "locale": "us", "figi": "BBG000B9XRY4"},
        {"ticker": "MSFT", "name": "Microsoft", "primary_exchange": "XNAS", "type": "CS",
         "active": True, "currency_name": "usd", "locale": "us", "figi": None},
    ]
    root = str(tmp_path / "master")
    out = run_symbol_pipeline(
        spark, polygon_symbols(spark, payload, dt.date(2024, 3, 1)), root, dt.date(2024, 3, 1)
    )
    latest = {r.symbol: r for r in out["latest"].collect()}
    assert set(latest) == {"AAPL", "MSFT"}
    assert latest["AAPL"].natural_key == "BBG000B9XRY4"  # figi preferred
    assert latest["MSFT"].natural_key == "MSFT|XNAS"
