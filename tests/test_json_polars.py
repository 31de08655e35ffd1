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


# ---------------------------------------------------------------------------
# JSONL corpus source/sink (sources/corpus.py)


def test_jsonl_corpus_roundtrip_matches_parquet(spark, tmp_path):
    from marketpipe_spark.sources.corpus import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus_jsonl")
    write_documents_jsonl(src, out)
    back = read_documents_jsonl(spark, out)
    a = sorted(map(tuple, src.select("doc_id", "text", "lang", "source", "n_chars").collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_corpus_drops_and_counts_malformed(spark, tmp_path):
    from marketpipe_spark.sources.corpus import (
        corrupt_line_count,
        read_documents_jsonl,
    )

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good one", "lang": "en", "source": "a"}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "lang": "en", "source": "a"}\n'  # missing text
        '{"doc_id": 3, "text": "another good", "lang": null, "source": null}\n'
    )
    df = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["n_chars"] == len("good one")  # recomputed, not trusted
    assert rows[3]["lang"] is None
    assert corrupt_line_count(spark, str(p)) == 2


def test_jsonl_corpus_synthesized_ids_are_content_hashes(spark, tmp_path):
    from pyspark.sql import functions as F

    from marketpipe_spark.sources.corpus import read_documents_jsonl

    p = tmp_path / "noid.jsonl"
    p.write_text(
        '{"text": "alpha"}\n{"text": "beta"}\n{"text": "alpha"}\n'
    )
    df = read_documents_jsonl(spark, str(p), synthesize_ids=True)
    rows = df.collect()
    assert len(rows) == 3
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add(r["doc_id"])
    # pure content hash: same text -> same id, regardless of layout
    assert len(by_text["alpha"]) == 1 and len(by_text["beta"]) == 1
    ref = {r["text"]: r["doc_id"] for r in rows}
    exp = {t: spark.range(1).select(F.xxhash64(F.lit(t))).first()[0] for t in ref}
    assert ref == exp
