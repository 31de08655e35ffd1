"""Symbol directory providers (S9) + the end-to-end symbol pipeline.

Reference: ingestion/symbol_providers/{polygon,nasdaq_dl,dummy}.py fetch a
symbol directory into ``SymbolRecord`` rows; symbol_pipeline.py:176-235 then
runs fetch → stage → normalize (W1/W2) → diff (J2) → SCD-2 apply (J1/K4) →
refresh views (W3). Live providers need network/credentials (absent here);
the deterministic ``dummy`` provider is fully functional — mirroring the
reference, whose dummy provider doubles as the test source.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Matches tests' stage shape and normalize_stage's expectations.
STAGE_SCHEMA = (
    "provider string, ticker string, figi string, exchange_mic string, as_of date, "
    "company_name string, asset_type string, status string, market_cap long, "
    "sector string, industry string, country string, currency string"
)

_SECTORS = ["tech", "energy", "health", "finance", "retail"]


def dummy_symbols(spark: SparkSession, n: int = 100, as_of: dt.date | None = None) -> DataFrame:
    """Deterministic symbol directory: ticker SYM0000..SYM{n-1}, figi for
    every third symbol, round-robin sector/exchange. Generated with
    ``spark.range`` — no driver-side row building, scales to any n."""
    as_of = as_of or dt.date(2024, 1, 1)
    i = F.col("id")
    return spark.range(n).select(
        F.lit("dummy").alias("provider"),
        F.concat(F.lit("SYM"), F.lpad(i.cast("string"), 4, "0")).alias("ticker"),
        F.when(i % 3 == 0, F.concat(F.lit("BBG"), F.lpad(i.cast("string"), 6, "0"))).alias("figi"),
        F.when(i % 2 == 0, F.lit("XNAS")).otherwise(F.lit("XNYS")).alias("exchange_mic"),
        F.lit(as_of).alias("as_of"),
        F.concat(F.lit("Company "), i.cast("string")).alias("company_name"),
        F.lit("equity").alias("asset_type"),
        F.lit("active").alias("status"),
        ((i + 1) * 1_000_000).alias("market_cap"),
        F.element_at(F.array(*[F.lit(s) for s in _SECTORS]), (i % 5 + 1).cast("int")).alias("sector"),
        F.lit("sw").alias("industry"),
        F.lit("US").alias("country"),
        F.lit("USD").alias("currency"),
    )


def run_symbol_pipeline(
    spark: SparkSession,
    snapshot: DataFrame,
    master_root: str,
    snapshot_date: dt.date,
) -> dict[str, DataFrame]:
    """§3.4 pipeline: stage → normalize → diff → SCD-2 apply → persist →
    views. Returns {master, latest, history, null_ratios}."""
    import os

    from ..operators.scd import apply_scd2, history_view, latest_view, null_ratios, write_master

    master = None
    if os.path.exists(master_root):
        master = spark.read.parquet(master_root).drop("year", "month")

    nxt = apply_scd2(master, snapshot, snapshot_date, spark)
    # master feeds apply_scd2's plan AND is overwritten below — pin first
    nxt = nxt.localCheckpoint(eager=True)
    write_master(nxt, master_root)
    persisted = spark.read.parquet(master_root)
    return {
        "master": persisted,
        "latest": latest_view(persisted),
        "history": history_view(persisted),
        "null_ratios": null_ratios(snapshot),
    }
