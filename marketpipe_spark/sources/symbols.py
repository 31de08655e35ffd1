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


# ---------------------------------------------------------------------------
# provider translations (S9) — field-map semantics of the reference's live
# providers, runnable on canned payloads (no network; same approach as
# sources/providers.py for bars). Reference:
# ingestion/symbol_providers/polygon.py:53-73,140-217 and nasdaq_dl.py:52-259.

#: Polygon exchange code → MIC (polygon.py:53-59); unknown codes fall back to
#: the first 4 chars upper-cased (polygon.py:161).
POLYGON_MIC_MAP = {"XNYS": "XNYS", "XNAS": "XNAS", "ARCX": "ARCX", "BATS": "BATS", "IEX": "IEXG"}

#: Polygon asset type code → asset class (polygon.py:60-73); default equity.
POLYGON_ASSET_MAP = {
    "CS": "equity", "ADRC": "adr", "ETF": "etf", "REIT": "reit", "PFD": "equity",
    "FUND": "etf", "RIGHT": "equity", "BOND": "equity", "WARRANT": "equity",
}

#: Nasdaq Daily List market category → MIC (nasdaq_dl.py:52-58); blank or
#: unknown → XNAS (nasdaq_dl.py:219-224).
NASDAQ_MIC_BY_CAT = {"Q": "XNAS", "N": "XNYS", "A": "ARCX", "G": "XNAS", "S": "XNAS", "P": "ARCX"}

_POLYGON_RAW_SCHEMA = (
    "ticker string, name string, primary_exchange string, type string, "
    "active boolean, currency_name string, locale string, figi string"
)


def _map_expr(mapping: dict[str, str], key, default):
    """Literal-map lookup with fallback — stays JVM-side (no UDF)."""
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*pairs), key), default)


def polygon_symbols(spark: SparkSession, payload: list[dict], as_of: dt.date) -> DataFrame:
    """Polygon v3 reference-tickers payload → stage rows (polygon.py:140-217):
    MIC/asset maps with documented fallbacks, active→status, currency/locale
    normalization. Rows without a ticker are dropped (safe_create skip)."""
    raw = spark.createDataFrame(
        [{k: r.get(k) for k in ("ticker", "name", "primary_exchange", "type",
                                "active", "currency_name", "locale", "figi")} for r in payload] or [],
        _POLYGON_RAW_SCHEMA,
    )
    return raw.filter(F.col("ticker").isNotNull() & (F.trim("ticker") != "")).select(
        F.lit("polygon").alias("provider"),
        F.upper(F.trim("ticker")).alias("ticker"),
        F.col("figi"),
        _map_expr(
            POLYGON_MIC_MAP, F.col("primary_exchange"),
            F.upper(F.substring(F.coalesce("primary_exchange", F.lit("")), 1, 4)),
        ).alias("exchange_mic"),
        F.lit(as_of).alias("as_of"),
        F.col("name").alias("company_name"),
        _map_expr(POLYGON_ASSET_MAP, F.coalesce("type", F.lit("CS")), F.lit("equity")).alias("asset_type"),
        F.when(F.coalesce("active", F.lit(True)), F.lit("active")).otherwise(F.lit("delisted")).alias("status"),
        F.lit(None).cast("long").alias("market_cap"),
        F.lit(None).cast("string").alias("sector"),
        F.lit(None).cast("string").alias("industry"),
        F.upper(F.substring(F.col("locale"), 1, 2)).alias("country"),
        F.coalesce(F.upper(F.substring(F.col("currency_name"), 1, 3)), F.lit("USD")).alias("currency"),
    )


def nasdaq_daily_list_symbols(
    spark: SparkSession,
    lines: list[str],
    as_of: dt.date | None = None,
    include_etfs: bool = True,
    skip_test_issues: bool = True,
) -> DataFrame:
    """Nasdaq Daily List pipe-delimited text → stage rows (nasdaq_dl.py:
    107-259): header-driven parse, test-issue/ETF filters, market-category →
    MIC, footer 'File Creation Time: YYYYMMDD' as the as_of fallback."""
    if not lines:
        return spark.createDataFrame([], STAGE_SCHEMA)
    header = [h.strip() for h in lines[0].split("|")]
    if as_of is None:  # footer precedence (nasdaq_dl.py:159-179)
        as_of = dt.date.today()
        footer = lines[-1].strip()
        if footer.startswith("File Creation Time"):
            date_str = footer.split(":")[-1].strip()
            try:
                as_of = dt.datetime.strptime(date_str, "%Y%m%d").date()
            except ValueError:
                pass
    data = [
        dict(zip(header, row.split("|")))
        for row in lines[1:]
        if row and not row.startswith("File Creation Time") and len(row.split("|")) == len(header)
    ]
    raw = spark.createDataFrame(
        [{"symbol": d.get("Symbol"), "security_name": d.get("Security Name"),
          "market_category": d.get("Market Category"), "test_issue": d.get("Test Issue"),
          "etf": d.get("ETF")} for d in data] or [],
        "symbol string, security_name string, market_category string, test_issue string, etf string",
    )
    out = raw.filter(F.trim(F.coalesce("symbol", F.lit(""))) != "")
    if skip_test_issues:
        out = out.filter(F.upper(F.trim(F.coalesce("test_issue", F.lit("")))) != "Y")
    etf_flag = F.upper(F.trim(F.coalesce("etf", F.lit(""))))
    if not include_etfs:
        out = out.filter(etf_flag != "Y")
    cat = F.upper(F.trim(F.coalesce("market_category", F.lit(""))))
    return out.select(
        F.lit("nasdaq_dl").alias("provider"),
        F.upper(F.trim("symbol")).alias("ticker"),
        F.lit(None).cast("string").alias("figi"),
        F.when(cat == "", F.lit("XNAS")).otherwise(
            _map_expr(NASDAQ_MIC_BY_CAT, cat, F.lit("XNAS"))
        ).alias("exchange_mic"),
        F.lit(as_of).alias("as_of"),
        F.when(F.trim(F.coalesce("security_name", F.lit(""))) != "", F.trim("security_name")).alias("company_name"),
        F.when(etf_flag == "Y", F.lit("etf")).otherwise(F.lit("equity")).alias("asset_type"),
        F.lit("active").alias("status"),
        F.lit(None).cast("long").alias("market_cap"),
        F.lit(None).cast("string").alias("sector"),
        F.lit(None).cast("string").alias("industry"),
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
