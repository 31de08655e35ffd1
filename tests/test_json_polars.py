"""S11 golden-JSON round-trip and the optional polars return
(reference: tests/resources/sample_ohlcv_data.json fixture shape,
loader.py:137-139 as_polars)."""

from __future__ import annotations

import os

import pytest

from marketpipe_spark.lake import read_bars, write_bars
from marketpipe_spark.loader import load_ohlcv
from marketpipe_spark.sources.providers import PROVIDER_REGISTRY, bars_from_json

RESOURCE = os.path.join(os.path.dirname(__file__), "resources", "sample_ohlcv_bars.json")


def test_json_resource_roundtrip(spark, tmp_path):
    bars = bars_from_json(spark, RESOURCE)
    rows = {r.symbol: r for r in bars.collect()}
    # malformed BAD row (string timestamp) dropped; symbols upper-cased
    assert set(rows) == {"AAPL", "MSFT"}
    assert rows["AAPL"].ts_ns == 1704153600000000000
    assert rows["AAPL"].close == 185.64
    assert rows["MSFT"].volume == 25258600

    root = str(tmp_path / "lake")
    write_bars(bars, root, "1d")
    back = read_bars(spark, root, frame="1d").select(
        "symbol", "ts_ns", "open", "high", "low", "close", "volume"
    )
    orig = sorted(tuple(r) for r in bars.collect())
    rt = sorted(tuple(r) for r in back.collect())
    assert rt == orig  # lossless round trip through the partitioned lake


def test_provider_registry_adapters(spark):
    adapter = PROVIDER_REGISTRY["polygon"]
    out = adapter.normalize(
        spark, [{"t": 1704153600000, "o": "1", "h": "2", "l": "0.5", "c": "1.5", "v": "100"}], "tsla"
    ).collect()
    assert len(out) == 1 and out[0].symbol == "TSLA"
    assert out[0].ts_ns == 1704153600000 * 1_000_000
    # fetch now runs the real client protocol (sources/httpclient.py); with
    # an injected transport it round-trips without network
    from marketpipe_spark.sources.httpclient import FakeTransport

    tr = FakeTransport([(200, {"results": [{"t": 1704153600000, "o": 1, "h": 2, "l": 0.5, "c": 1.5, "v": 9}]}, {})])
    rows = adapter.fetch("TSLA", 0, 10**9, transport=tr)
    assert len(rows) == 1 and rows[0]["c"] == 1.5


def test_as_polars_flag(spark, tmp_path):
    root = str(tmp_path / "lake")
    write_bars(bars_from_json(spark, RESOURCE), root, "1d")
    try:
        import polars as pl  # noqa: F401

        out = load_ohlcv(spark, root, ["AAPL", "MSFT"], "1d", as_polars=True)
        assert out.__class__.__module__.startswith("polars")
        assert out.height == 2
    except ImportError:
        with pytest.raises(ImportError, match="polars"):
            load_ohlcv(spark, root, ["AAPL", "MSFT"], "1d", as_polars=True)
