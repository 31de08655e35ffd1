"""Market-data provider adapters (S6/S7) — driver-side I/O scaffolding.

The reference ships async REST clients for Alpaca/IEX/Polygon/Finnhub
(ingestion/infrastructure/{alpaca_client,iex_adapter,polygon_adapter,
finnhub_adapter}.py) behind an anti-corruption layer that maps provider JSON
to domain bars (adapters.py:193-256). Rate-limited HTTP fetch is inherently
driver-side work (SURVEY §7.4): the cluster parallelizes the transform/write
legs, not the API calls.

``fetch_bars`` runs the full client protocol (``sources.httpclient``: token
bucket, retry/backoff, Retry-After, pagination) over an injectable
transport; network/credentials are unavailable in this environment, so the
protocol is exercised end-to-end against ``FakeTransport``
(tests/test_httpclient.py), the same way the reference tests its stack
(tests/fakes/adapters.py). The ``fake`` provider (sources/fake.py) is fully
functional and registered under the same interface, mirroring the reference
where the fake provider doubles as the test data source
(fake_adapter.py:24-215).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: provider name → column mapping from raw JSON fields to the canonical bar
#: schema (reference anti-corruption translations, adapters.py:193-256 and
#: per-provider clients).
PROVIDER_FIELD_MAPS: dict[str, dict[str, str]] = {
    # Alpaca v2 bars: t (RFC3339), o/h/l/c, v
    "alpaca": {"ts": "t", "open": "o", "high": "h", "low": "l", "close": "c", "volume": "v"},
    # IEX intraday: date+minute, open/high/low/close, volume
    "iex": {"ts": "ts", "open": "open", "high": "high", "low": "low", "close": "close", "volume": "volume"},
    # Polygon aggregates: t (ms epoch), o/h/l/c, v
    "polygon": {"ts": "t", "open": "o", "high": "h", "low": "l", "close": "c", "volume": "v"},
    # Finnhub candles: t (s epoch), o/h/l/c, v
    "finnhub": {"ts": "t", "open": "o", "high": "h", "low": "l", "close": "c", "volume": "v"},
}

#: ts field unit per provider → multiplier to ns.
_TS_UNIT_NS = {"alpaca": None, "iex": None, "polygon": 1_000_000, "finnhub": 1_000_000_000}


def normalize_provider_rows(
    spark: SparkSession, provider: str, rows: list[dict], symbol: str
) -> DataFrame:
    """S7 — anti-corruption translation: raw provider dicts → canonical bars.

    Invalid rows (missing fields, non-numeric) are dropped, mirroring the
    reference's skip-and-log behavior (adapters.py:224-256).
    """
    if provider not in PROVIDER_FIELD_MAPS:
        raise ValueError(f"unknown provider {provider!r}; expected one of {sorted(PROVIDER_FIELD_MAPS)}")
    m = PROVIDER_FIELD_MAPS[provider]
    unit = _TS_UNIT_NS[provider]
    raw = spark.createDataFrame(
        [
            {k: r.get(f) for k, f in m.items()}
            for r in rows
            if all(f in r for f in m.values())
        ]
        or [],
        "ts string, open string, high string, low string, close string, volume string",
    )
    # try_* variants: malformed provider values become NULL and are dropped
    # below (ANSI-mode cast would abort the whole batch on one bad row).
    if unit is None:  # RFC3339 / ISO timestamps
        ts_ns = (F.unix_micros(F.try_to_timestamp("ts")) * 1000).cast("long")
    else:
        ts_ns = F.try_multiply(F.expr("try_cast(ts AS LONG)"), F.lit(unit))
    out = raw.select(
        F.lit(symbol.upper()).alias("symbol"),
        ts_ns.alias("ts_ns"),
        F.expr("try_cast(open AS DOUBLE)").alias("open"),
        F.expr("try_cast(high AS DOUBLE)").alias("high"),
        F.expr("try_cast(low AS DOUBLE)").alias("low"),
        F.expr("try_cast(close AS DOUBLE)").alias("close"),
        F.expr("try_cast(try_cast(volume AS DOUBLE) AS LONG)").alias("volume"),
    ).filter(
        F.col("ts_ns").isNotNull()
        & F.col("open").isNotNull()
        & F.col("high").isNotNull()
        & F.col("low").isNotNull()
        & F.col("close").isNotNull()
    )
    return out


def fetch_bars(
    provider: str,
    symbol: str,
    start_ns: int,
    end_ns: int,
    *,
    config=None,
    auth=None,
    transport=None,
    rate_limiter=None,
) -> list[dict]:
    """S6 — provider HTTP fetch through the full client protocol
    (``sources.httpclient``): token-bucket rate limit, retry/backoff with
    Retry-After, cursor pagination (reference base_api_client.py:16-177 and
    per-vendor clients). ``transport`` is injectable — tests use
    ``FakeTransport``; live use takes the default ``UrllibTransport`` plus
    real credentials via ``auth``."""
    if provider == "fake":
        raise ValueError("use sources.fake.fake_bars for the fake provider")
    from .httpclient import CLIENT_REGISTRY, ClientConfig

    cls = CLIENT_REGISTRY.get(provider)
    if cls is None:
        raise ValueError(f"unknown provider {provider!r}; expected one of {sorted(CLIENT_REGISTRY)}")
    client = cls(
        config or ClientConfig(),
        auth=auth,
        transport=transport,
        rate_limiter=rate_limiter,
    )
    return client.fetch_batch(symbol, start_ns, end_ns)


def bars_from_json(spark: SparkSession, path: str) -> DataFrame:
    """S11 — load schema_v1-shaped JSON bar records (the reference's golden
    resource format, tests/resources/sample_ohlcv_data.json: a JSON array of
    canonical bars with int-ns ``timestamp``) into the minimal bar schema.
    Malformed rows are dropped via the same try_cast discipline as the
    provider translations above."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(
        F.upper(F.col("symbol").cast("string")).alias("symbol"),
        F.expr("try_cast(timestamp AS LONG)").alias("ts_ns"),
        F.expr("try_cast(open AS DOUBLE)").alias("open"),
        F.expr("try_cast(high AS DOUBLE)").alias("high"),
        F.expr("try_cast(low AS DOUBLE)").alias("low"),
        F.expr("try_cast(close AS DOUBLE)").alias("close"),
        F.expr("try_cast(try_cast(volume AS DOUBLE) AS LONG)").alias("volume"),
    ).filter(
        F.col("symbol").isNotNull()
        & F.col("ts_ns").isNotNull()
        & F.col("open").isNotNull()
        & F.col("high").isNotNull()
        & F.col("low").isNotNull()
        & F.col("close").isNotNull()
    )


@dataclass(frozen=True)
class ProviderAdapter:
    """One registered provider: the fetch stub + the real translation,
    bundled the way the reference's provider registry hands out adapters
    (ingestion/infrastructure/provider_loader.py)."""

    name: str

    def fetch(self, symbol: str, start_ns: int, end_ns: int, **client_kw) -> list[dict]:
        return fetch_bars(self.name, symbol, start_ns, end_ns, **client_kw)

    def normalize(self, spark: SparkSession, rows: list[dict], symbol: str) -> DataFrame:
        return normalize_provider_rows(spark, self.name, rows, symbol)


@dataclass(frozen=True)
class FakeProviderAdapter(ProviderAdapter):
    """The reference registers ``fake`` as a first-class provider
    (ingestion/infrastructure/provider_registry.py:21, fake_adapter.py).
    Its data is generated cluster-side (``sources.fake.fake_bars``), so
    there is no row-list fetch; ``bars`` is the real entry point."""

    def fetch(self, symbol: str, start_ns: int, end_ns: int) -> list[dict]:
        raise ValueError("fake provider generates cluster-side: use .bars()/sources.fake.fake_bars")

    def bars(self, spark: SparkSession, symbols: list[str], start_ns: int,
             n_bars: int, **kw) -> DataFrame:
        from .fake import fake_bars

        return fake_bars(spark, symbols, start_ns, n_bars, **kw)


PROVIDER_REGISTRY: dict[str, ProviderAdapter] = {
    **{name: ProviderAdapter(name) for name in PROVIDER_FIELD_MAPS},
    "fake": FakeProviderAdapter("fake"),
}
