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
