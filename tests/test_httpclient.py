"""Provider HTTP client protocol (S6): rate limit, retry/backoff,
Retry-After, pagination, and e2e fetch→normalize — all through the
injectable FakeTransport with a fake clock, mirroring how the reference
tests its client stack against fakes (reference: tests/fakes/adapters.py,
base_api_client.py:16-177)."""

from __future__ import annotations

import pytest

from marketpipe_spark.sources.httpclient import (
    AlpacaClient,
    ClientConfig,
    FakeTransport,
    FinnhubClient,
    HeaderTokenAuth,
    PolygonClient,
    ProviderHttpError,
    QueryParamAuth,
    RetryLimitExceeded,
    TokenBucketRateLimiter,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def __call__(self):
        return self.t

    def sleep(self, secs):
        self.sleeps.append(secs)
        self.t += secs


def make_limiter(capacity=2, rate=1.0):
    clk = FakeClock()
    return TokenBucketRateLimiter(capacity, rate, clock=clk, sleeper=clk.sleep), clk


# ---------------------------------------------------------------------------
# rate limiter

def test_rate_limiter_allows_burst_then_throttles():
    rl, clk = make_limiter(capacity=2, rate=1.0)
    rl.acquire()
    rl.acquire()  # burst of 2: no wait
    assert clk.sleeps == []
    rl.acquire()  # bucket empty → must wait 1s for a token
    assert clk.sleeps == [pytest.approx(1.0)]
    assert rl.n_waits == 1


def test_rate_limiter_refills_over_time():
    rl, clk = make_limiter(capacity=2, rate=2.0)
    rl.acquire(2)
    clk.t += 1.0  # 2 tokens refilled
    rl.acquire(2)
    assert clk.sleeps == []


def test_rate_limiter_retry_after_parks_bucket():
    rl, clk = make_limiter()
    rl.notify_retry_after(5.0)
    rl.acquire()
    assert clk.sleeps == [pytest.approx(5.0)]


def test_rate_limiter_rejects_impossible_acquire():
    rl, _ = make_limiter(capacity=2)
    with pytest.raises(ValueError):
        rl.acquire(3)


# ---------------------------------------------------------------------------
# retry / backoff / errors

def _client(cls, script, **cfg_kw):
    cfg = ClientConfig(base_url="https://x.test", max_retries=3, **cfg_kw)
    transport = FakeTransport(script)
    rl, clk = make_limiter(capacity=100, rate=100.0)
    c = cls(cfg, transport=transport, rate_limiter=rl, sleeper=clk.sleep, rng=lambda: 1.0)
    return c, transport, clk


def test_retry_on_500_then_success():
    ok = {"s": "ok", "t": [1], "o": [1.0], "h": [1.0], "l": [1.0], "c": [1.0], "v": [10]}
    c, tr, clk = _client(FinnhubClient, [(500, {}, {}), (502, {}, {}), (200, ok, {})])
    rows = c.fetch_batch("AAPL", 0, 10**9)
    assert len(rows) == 1 and rows[0]["c"] == 1.0
    assert len(tr.requests) == 3
    # exponential backoff: 0.5, 1.0 (full-jitter rng pinned to 1.0)
    assert clk.sleeps == [pytest.approx(0.5), pytest.approx(1.0)]


def test_retry_limit_exceeded():
    c, tr, _ = _client(FinnhubClient, [(500, {}, {})])
    with pytest.raises(RetryLimitExceeded):
        c.fetch_batch("AAPL", 0, 10**9)
    assert len(tr.requests) == 4  # initial + 3 retries


def test_non_retryable_4xx_raises_immediately():
    c, tr, _ = _client(FinnhubClient, [(403, {"error": "bad key"}, {})])
    with pytest.raises(ProviderHttpError):
        c.fetch_batch("AAPL", 0, 10**9)
    assert len(tr.requests) == 1


def test_429_retry_after_forever_is_bounded():
    """A server that always answers 429 + Retry-After must not trap the
    client in an unbounded sleep loop (ADVICE r3): free honors are capped at
    max_retries, after which 429s consume regular attempts and the client
    gives up with RetryLimitExceeded."""
    c, tr, clk = _client(FinnhubClient, [(429, {}, {"Retry-After": "1"})])
    with pytest.raises(RetryLimitExceeded):
        c.fetch_batch("AAPL", 0, 10**9)
    # max_retries free honors + (max_retries + 1) attempt-consuming requests
    assert len(tr.requests) == 3 + 4
    assert clk.sleeps  # it did park, then bailed


def test_iex_multiday_range_requests_each_day():
    """fetch_batch over a multi-day range must issue one exactDate request
    per UTC day — deriving only the first day silently drops the rest
    (ADVICE r3; reference iex_adapter iterates chart dates per day)."""
    from marketpipe_spark.sources.httpclient import IexClient

    c, tr, _ = _client(IexClient, [(200, {"data": []}, {})])
    day_ns = 86_400 * 10**9
    c.fetch_batch("AAPL", 0, 3 * day_ns - 1)
    dates = [r["params"]["exactDate"] for r in tr.requests]
    assert dates == ["1970-01-01", "1970-01-02", "1970-01-03"]


def test_429_retry_after_honored_without_consuming_retries():
    ok = {"s": "ok", "t": [1], "o": [1.0], "h": [1.0], "l": [1.0], "c": [1.0], "v": [1]}
    c, tr, clk = _client(
        FinnhubClient, [(429, {}, {"Retry-After": "7"}), (200, ok, {})]
    )
    rows = c.fetch_batch("AAPL", 0, 10**9)
    assert len(rows) == 1
    # the 7s park came from Retry-After, not exponential backoff
    assert pytest.approx(7.0) in clk.sleeps


# ---------------------------------------------------------------------------
# pagination + auth

def test_alpaca_pagination_follows_page_token():
    bar = {"t": "2024-01-02T15:30:00Z", "o": 1, "h": 2, "l": 0.5, "c": 1.5, "v": 100}
    pages = [
        (200, {"bars": {"AAPL": [bar, bar]}, "next_page_token": "tok1"}, {}),
        (200, {"bars": {"AAPL": [bar]}, "next_page_token": "tok2"}, {}),
        (200, {"bars": {"AAPL": [bar]}, "next_page_token": None}, {}),
    ]
    c, tr, _ = _client(AlpacaClient, pages)
    rows = c.fetch_batch("AAPL", 0, 86_400 * 10**9)
    assert len(rows) == 4
    assert len(tr.requests) == 3
    assert "page_token" not in tr.requests[0]["params"]
    assert tr.requests[1]["params"]["page_token"] == "tok1"
    assert tr.requests[2]["params"]["page_token"] == "tok2"


def test_polygon_next_url_cursor_and_query_auth():
    res = {"t": 1_704_202_200_000, "o": 1, "h": 2, "l": 0.5, "c": 1.5, "v": 100}
    pages = [
        (200, {"results": [res], "next_url": "https://x.test/v2/aggs?cursor=abc"}, {}),
        (200, {"results": [res]}, {}),
    ]
    cfg = ClientConfig(base_url="https://x.test")
    tr = FakeTransport(pages)
    rl, clk = make_limiter(capacity=100, rate=100.0)
    c = PolygonClient(cfg, auth=QueryParamAuth("sekrit"), transport=tr, rate_limiter=rl, sleeper=clk.sleep)
    rows = c.fetch_batch("AAPL", 0, 10**9)
    assert len(rows) == 2
    assert tr.requests[0]["params"]["apiKey"] == "sekrit"
    assert tr.requests[1]["params"]["cursor"] == "abc"


def test_header_auth_applied():
    ok = {"s": "no_data"}
    cfg = ClientConfig(base_url="https://x.test")
    tr = FakeTransport([(200, ok, {})])
    rl, clk = make_limiter(capacity=10, rate=10.0)
    c = FinnhubClient(cfg, auth=HeaderTokenAuth("tok", header="X-Finnhub-Token", prefix=""),
                      transport=tr, rate_limiter=rl, sleeper=clk.sleep)
    assert c.fetch_batch("AAPL", 0, 10**9) == []
    assert tr.requests[0]["headers"]["X-Finnhub-Token"] == "tok"


def test_fetch_many_shares_rate_limiter():
    ok = {"s": "ok", "t": [1], "o": [1.0], "h": [1.0], "l": [1.0], "c": [1.0], "v": [1]}
    cfg = ClientConfig(base_url="https://x.test")
    tr = FakeTransport([(200, ok, {})])
    clk = FakeClock()
    rl = TokenBucketRateLimiter(1, 1.0, clock=clk, sleeper=clk.sleep)
    c = FinnhubClient(cfg, transport=tr, rate_limiter=rl, sleeper=clk.sleep)
    out = c.fetch_many(["AAPL", "MSFT", "GOOG"], 0, 10**9)
    assert {k: len(v) for k, v in out.items()} == {"AAPL": 1, "MSFT": 1, "GOOG": 1}
    # capacity 1 @ 1/s: the 2nd and 3rd fetches each waited ~1s on the bucket
    assert rl.n_waits == 2


# ---------------------------------------------------------------------------
# e2e: fetch through fake transport → Spark translation (S6 → S7)

def test_fetch_bars_df_e2e(spark):
    bar = {"t": "2024-01-02T15:30:00Z", "o": "1.0", "h": "2.0", "l": "0.5", "c": "1.5", "v": "100"}
    bad = {"t": "not-a-time", "o": "1.0", "h": "2.0", "l": "0.5", "c": "1.5", "v": "100"}
    pages = [
        (200, {"bars": {"AAPL": [bar, bad]}, "next_page_token": "n"}, {}),
        (200, {"bars": {"AAPL": [bar]}}, {}),
    ]
    c, _, _ = _client(AlpacaClient, pages)
    df = c.fetch_bars_df(spark, "aapl", 0, 86_400 * 10**9)
    rows = df.collect()
    assert len(rows) == 2  # the malformed row is dropped by try_cast discipline
    assert all(r.symbol == "AAPL" for r in rows)
    assert rows[0].ts_ns == 1_704_209_400_000_000_000


def test_iex_intraday_date_minute_combine():
    data = [
        {"date": "2023-12-15", "minute": "09:30", "open": 195.89, "close": 195.95,
         "high": 196.05, "low": 195.85, "volume": 125847},
        {"date": "2023-12-15", "minute": "09:31", "open": 195.95, "close": 196.00,
         "high": 196.10, "low": 195.90, "volume": 90000},
        {"label": "junk row"},
    ]
    from marketpipe_spark.sources.httpclient import IexClient

    c, tr, _ = _client(IexClient, [(200, {"data": data}, {})])
    rows = c.fetch_batch("AAPL", 1_702_598_400 * 10**9, 1_702_684_800 * 10**9)
    assert [r["ts"] for r in rows] == ["2023-12-15T09:30:00Z", "2023-12-15T09:31:00Z"]
    assert tr.requests[0]["params"]["exactDate"] == "2023-12-15"


def test_provider_adapter_fetch_through_registry(spark):
    """S6 via the provider registry: adapter.fetch with an injected transport
    feeds adapter.normalize — the reference's registry→client→translation
    path (provider_loader.py → alpaca_client.py → adapters.py)."""
    from marketpipe_spark.sources.providers import PROVIDER_REGISTRY

    bar = {"t": "2024-01-02T15:30:00Z", "o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5, "v": 100}
    tr = FakeTransport([(200, {"bars": {"AAPL": [bar]}}, {})])
    ad = PROVIDER_REGISTRY["alpaca"]
    rows = ad.fetch("AAPL", 0, 86_400 * 10**9, transport=tr)
    df = ad.normalize(spark, rows, "AAPL")
    got = df.collect()
    assert len(got) == 1 and got[0].close == 1.5


def test_unknown_provider_rejected():
    from marketpipe_spark.sources.providers import fetch_bars

    with pytest.raises(ValueError):
        fetch_bars("bloomberg", "AAPL", 0, 1)


def test_secrets_masked_in_error_messages():
    """Reference masks API keys in retry-exceeded errors
    (alpaca_client.py:104-139 via security/mask.safe_for_log)."""
    c, _, _ = _client(FinnhubClient, [(403, {"error": "bad key SEKRET9999KEY"}, {})],
                      api_key="SEKRET9999KEY")
    with pytest.raises(ProviderHttpError) as ei:
        c.fetch_batch("AAPL", 0, 10**9)
    assert "SEKRET9999KEY" not in str(ei.value)
    assert "9KEY" in str(ei.value)  # last-4 visible


def test_mask_and_safe_for_log():
    from marketpipe_spark.security import mask, safe_for_log

    assert mask("ABCD1234EFGH") == "********EFGH"
    assert mask("short") == "***"
    assert mask(None) == "***"
    assert mask("ABCDEFGH", show=0) == "********"
    out = safe_for_log("k1: ABCD1234EFGH k2: WXYZ5678IJKL", "ABCD1234EFGH", "WXYZ5678IJKL")
    assert out == "k1: ********EFGH k2: ********IJKL"
